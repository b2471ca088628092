package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Z-order (Morton curve) data layout for multi-dimensional data
  * skipping: interleaving the low bits of two keys makes rows that
  * are close in EITHER dimension land in the same parquet files, so
  * min/max row-group stats prune scans for predicates on either
  * column — the standard layout trick for a 100 TB table queried by
  * more than one key. The z-value itself is pure integer bit math
  * (codegen'd, oracle-checkable); the layout step is just
  * repartitionByRange + sortWithinPartitions on it.
  */
object Layout {

  val Bits = 16

  /** Interleave the low `Bits` bits: a in even positions, b in odd. */
  def zValue(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Rows laid out along the z-curve of (a, b): range-partitioned and
    * sorted by z, ready for a stats-pruned parquet write.
    */
  def zOrdered(df: DataFrame, a: Column, b: Column, partitions: Int): DataFrame =
    df.withColumn("__z", zValue(a, b))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Rank-bucket a column into 2^`bits` equi-depth buckets via an
    * approxQuantile sketch (one scan, driver-side bounds, then a
    * narrow comparison against the broadcast bound array) — the
    * normalization z-order needs so both dims contribute comparable
    * bit widths to the curve; raw values with mismatched ranges put
    * all high curve bits on one dimension.
    */
  def rankBucket(df: DataFrame, c: Column, bits: Int): Column = {
    val n = 1 << bits
    val bounds = df.select(c.cast("double").as("__rb")).stat
      .approxQuantile("__rb", (1 until n).map(_.toDouble / n).toArray, 0.001)
      .distinct.sorted
    aggregate(typedlit(bounds.toSeq), lit(0L),
      (acc, bound) => acc + when(c.cast("double") > bound, 1L).otherwise(0L))
  }

  /** zOrdered with both dims rank-normalized to `bits` each. */
  def zOrderedRanked(df: DataFrame, a: Column, b: Column,
                     partitions: Int, bits: Int = 8): DataFrame =
    zOrdered(df, rankBucket(df, a, bits), rankBucket(df, b, bits), partitions)

  /** events keyed by (user_id, hour-of-epoch), both masked to 16
    * bits — the z-values a layout job would range-partition on.
    */
  def qZorder(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(col("event_id"),
      zValue(
        col("user_id").bitwiseAND(lit(65535L)),
        expr("unix_micros(ts) div 3600000000").bitwiseAND(lit(65535L)))
        .as("z_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> qZorder _)

  private val zSql = {
    val terms = (0 until Bits).map { i =>
      s"((((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" + ")
    s"($terms)"
  }

  val oracles: Map[String, String] = Map(
    "q_zorder" ->
      s"""SELECT event_id, $zSql AS z_value FROM (
        |  SELECT event_id, user_id & 65535 AS a,
        |    (epoch_us(ts) // 3600000000) & 65535 AS b
        |  FROM events)""".stripMargin)
}
