package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Co-located joins via bucketing: both sides bucketed on the join
  * key with the same bucket count join with NO exchange — the
  * pre-partitioning strategy for repeated fact⋈fact joins at 100 TB
  * (pay the shuffle once at write time, never again).
  */
class BucketingSpec extends AnyFunSuite {
  import SparkSuite._

  test("bucketed tables join with no shuffle or broadcast exchange") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("g_orders")
      Tables.lineitem(spark, sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("g_lineitem")
      val j = spark.table("g_lineitem")
        .join(spark.table("g_orders"), col("l_orderkey") === col("o_orderkey"))
      assert(j.count() == Tables.lineitem(spark, sf).count())
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    }
  }
}
