package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Relational}

/** Graph rank + event-analytics invariants (value-level parity is
  * the DuckDB oracle gate; these pin the structural laws).
  */
class GraphSpec extends AnyFunSuite {
  import SparkSuite._

  test("pagerank: teleport floor, bounded mass, deterministic") {
    val rows = Graph.qPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length
    val teleport = 15L * (1000000000L / n) / 100L
    assert(rows.forall(_._2 >= teleport), "every node keeps the teleport mass")
    val total = rows.map(_._2).sum
    assert(total <= 1000000000L,
      s"integer rank mass can only shrink (rounding), got $total")
    assert(total >= 900000000L, s"mass lost to rounding too aggressively: $total")
    val again = Graph.qPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.sorted.sameElements(again.sorted), "pagerank must be deterministic")
    // the fixture contains dangling (sink) nodes, and their mass is
    // redistributed rather than destroyed: without redistribution the
    // total mass after 5 damped iterations would shed ~15% per hop of
    // the sink share (n/17 of the graph) — the >= 0.9e9 floor above
    // plus an explicit sink-count pin keep the dangling path honest
    val sinks = rows.count(_._1 % Graph.SinkMod == 0)
    assert(sinks > 0, "fixture must contain sink nodes")
  }

  test("funnel steps only shrink; step 1 converts at 100%") {
    val byStep = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byStep(1)._2 == 1000000L)
    assert(byStep(1)._1 >= byStep(2)._1 && byStep(2)._1 >= byStep(3)._1)
    assert(byStep(3)._1 > 0)
  }

  test("stateful streaming funnel matches the batch stepwise-min funnel") {
    val streamed = graft.streaming.EventStreams.runFunnelToMemory(spark, sf)
      .groupBy(col("user_id")).agg(max(col("step_reached")).as("step"))
      .collect().map(r => r.getInt(1))
    val batch = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (1 to 3).foreach { k =>
      assert(streamed.count(_ >= k).toLong == batch(k),
        s"step $k: streamed ${streamed.count(_ >= k)} vs batch ${batch(k)}")
    }
  }

  test("stateful streaming cohorts rebuild the batch retention matrix") {
    val streamed = graft.streaming.EventStreams.runCohortsToMemory(spark, sf)
      .select(col("user_id"), col("cohort_day"), col("day_offset")).distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val batch = Relational.qCohort(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(streamed == batch,
      s"stream-only=${(streamed.toSet -- batch.toSet).take(3)} " +
        s"batch-only=${(batch.toSet -- streamed.toSet).take(3)}")
  }

  test("cohort offsets are non-negative and offset-0 rows partition the users") {
    val rows = Relational.qCohort(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.forall(_._2 >= 0))
    val day0Users = rows.filter(_._2 == 0).map(_._3).sum
    val distinctUsers = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(day0Users == distinctUsers,
      "every user appears exactly once at their cohort's offset 0")
  }
}
