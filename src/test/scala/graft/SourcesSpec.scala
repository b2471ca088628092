package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source/sink format coverage beyond the json.gz extract contract:
  * csv and orc round-trips preserve rows and schema.
  */
class SourcesSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-src").toString

  test("csv round-trip (header + explicit schema)") {
    val dir = tmp()
    val src = Tables.customer(spark, sf)
    src.write.option("header", "true").csv(s"$dir/customer_csv")
    val back = spark.read.option("header", "true").schema(src.schema)
      .csv(s"$dir/customer_csv")
    assert(back.count() == src.count())
    assert(back.columns.sameElements(src.columns))
    val total = back.agg(sum(col("c_acctbal"))).collect()(0).getDouble(0)
    val expected = src.agg(sum(col("c_acctbal"))).collect()(0).getDouble(0)
    assert(math.abs(total - expected) < 1e-6)
  }

  test("orc round-trip preserves types exactly") {
    val dir = tmp()
    val src = Tables.lineitem(spark, sf)
    src.write.orc(s"$dir/lineitem_orc")
    val back = spark.read.orc(s"$dir/lineitem_orc")
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
  }

  test("partitioned-by write prunes directories on read") {
    val dir = tmp()
    Tables.orders(spark, sf).write
      .partitionBy("o_orderstatus").parquet(s"$dir/orders_part")
    val pruned = spark.read.parquet(s"$dir/orders_part")
      .filter(col("o_orderstatus") === "F")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == expected)
  }
}
