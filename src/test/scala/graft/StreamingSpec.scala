package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  import SparkSuite._

  test("streaming windowed agg matches the batch plan") {
    val streamed = EventStreams.runToMemory(spark, sf)
      .collect().map(_.toString).sorted
    val batch = EventStreams.batchEquivalent(spark, sf)
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch),
      s"stream/batch divergence: ${streamed.take(2).mkString} vs ${batch.take(2).mkString}")
  }
}
