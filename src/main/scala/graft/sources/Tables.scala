package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the TPC-H-ish test tables (see TESTDATA.md).
  *
  * Single parquet file per table. Filters/projections applied by
  * callers are pushed into the scan by Catalyst (verified in
  * PlanSpec); at cluster scale the same code path handles a
  * directory of thousands of row-group-sized files.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns have shipped as two parquet flavors across
    * testdata generations: TIMESTAMP(NANOS) (readable only via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in every graft
    * session — convert events.ts to micros here, matching the
    * truncation other engines apply to nanos) and naive micros (read
    * as TIMESTAMP_NTZ by Spark 4 — cast EVERY such column, any
    * table, to the session-zone TIMESTAMP; the session zone is
    * pinned to UTC, so the instant equals the oracle's naive
    * reading). Downstream operators always see TIMESTAMP, never a
    * flavor-dependent type — r6 advice: the NTZ cast was events-only
    * while orders.o_orderdate had flipped flavor too, leaving a
    * session-zone-sensitive type to leak downstream.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val legacyNanos =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    legacyNanos.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(legacyNanos) { (d, f) =>
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
