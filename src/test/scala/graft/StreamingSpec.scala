package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  import SparkSuite._

  test("streaming dedup by id preserves the distinct event set") {
    val deduped = EventStreams.runDedupToMemory(spark, sf)
    val batch = graft.sources.Tables.events(spark, sf)
    assert(deduped.count() == batch.dropDuplicates("event_id").count())
    assert(deduped.select("event_id").distinct().count() == deduped.count())
  }

  test("stateful sessionization matches the batch sessionizer") {
    val streamed = EventStreams.runStatefulToMemory(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Relational.qSessionize(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_sessions"),
        org.apache.spark.sql.functions.sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"divergence: stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
  }

  test("stream-stream interval join matches the batch join") {
    val streamed = EventStreams.runIntervalJoinToMemory(spark, sf)
      .collect().map(_.toString).sorted
    val batch = EventStreams.intervalJoinBatch(
        graft.sources.Tables.events(spark, sf))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty, "interval join produced no rows")
    assert(streamed.sameElements(batch),
      s"stream/batch divergence: ${streamed.length} vs ${batch.length} rows")
  }

  test("streaming warehouse sink upserts idempotently by event id") {
    import graft.extract.Warehouse
    val root = java.nio.file.Files.createTempDirectory("graft-stream-wh").toString
    val wh = new Warehouse(root, spark)
    val ref = Warehouse.DatasetRef.fromString("proj.stream")
    wh.createDataset(ref, Warehouse.DatasetMeta())
    EventStreams.runStreamToWarehouse(spark, sf, wh, ref, "events")
    val distinct = graft.sources.Tables.events(spark, sf)
      .dropDuplicates("event_id").count()
    assert(wh.readTable(ref, "events").count() == distinct)
    // replay the same source: the keyed merge keeps the table
    // exactly-once under at-least-once delivery
    EventStreams.runStreamToWarehouse(spark, sf, wh, ref, "events")
    assert(wh.readTable(ref, "events").count() == distinct)
  }

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
