package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table introspection: the stats dumpty gathers per table before
  * choosing a partition strategy (reference pipeline.py:267-380).
  *
  * One single-pass aggregate per table (count/min/max/distinct all
  * partial-aggregated map-side); at 100 TB this is one narrow scan,
  * no shuffle beyond |partitions| partial rows.
  */
object Introspector {

  /** Density test from reference pipeline.py:355: a numeric,
    * sequential PK with no gaps can use Spark range partitioning.
    */
  def denseCheck(rows: Column, minK: Column, maxK: Column): Column =
    (rows === maxK) || (rows === maxK - 1) || (abs(rows - (maxK - minK)) <= 1)

  /** Stats for one table keyed by `key` (must be numeric/castable). */
  def stats(df: DataFrame, tableName: String, key: String): DataFrame =
    df.agg(
        count(lit(1)).as("row_cnt"),
        min(col(key)).cast("long").as("min_key"),
        max(col(key)).cast("long").as("max_key"),
        countDistinct(col(key)).as("distinct_keys"))
      .select(
        lit(tableName).as("table_name"),
        col("row_cnt"), col("min_key"), col("max_key"), col("distinct_keys"),
        denseCheck(col("row_cnt"), col("min_key"), col("max_key")).as("dense"))

  /** Stats for several (table, df, key) triples, unioned. */
  def statsAll(tables: Seq[(String, DataFrame, String)]): DataFrame =
    tables.map { case (n, df, k) => stats(df, n, k) }.reduce(_ unionAll _)
}
