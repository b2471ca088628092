package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.sources.Tables

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Random sampling is the wrong tool at 100 TB: reruns must produce
  * the same split (reproducible evals), late-arriving data must land
  * in the same bucket, and no coordination/seed-broadcast should be
  * needed. Hashing a stable id into 100 buckets gives all three —
  * a narrow, shuffle-free transform whose assignment is a pure
  * function of the row. The md5-prefix hash keeps the DuckDB oracle
  * bit-identical.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from any id column. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    tokenHash(id.cast("string")) % buckets

  /** train/val/test assignment: 80/10/10 by default. */
  def split(df: DataFrame, id: Column,
            trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(id)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Keep a pct% deterministic sample per stratum. */
  def stratifiedSampleCounts(df: DataFrame, id: Column, stratum: Column,
                             pct: Int = 20): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(hashBucket(id) < pct, 1L).otherwise(0L)).as("n_sampled"))

  // --- queries --------------------------------------------------------

  def qSplit(s: SparkSession, dir: String): DataFrame =
    split(Tables.documents(s, dir).select(col("doc_id"), col("lang")), col("doc_id"))

  def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    stratifiedSampleCounts(Tables.documents(s, dir), col("doc_id"), col("lang"))

  def qWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(graft.functions.WeightedMean)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
        count(lit(1)).as("cnt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split" -> qSplit _,
    "q_sample_stratified" -> qSampleStratified _,
    "q_weighted_avg" -> qWeightedAvg _)

  private val bucketSql =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 100"

  val oracles: Map[String, String] = Map(
    "q_split" ->
      s"""SELECT doc_id, lang, $bucketSql AS bucket,
        |  CASE WHEN $bucketSql < 80 THEN 'train'
        |       WHEN $bucketSql < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q_sample_stratified" ->
      s"""SELECT lang AS stratum, count(*) AS n_total,
        |  sum(CASE WHEN $bucketSql < 20 THEN 1 ELSE 0 END)::BIGINT AS n_sampled
        |FROM documents GROUP BY lang""".stripMargin,
    "q_weighted_avg" ->
      """SELECT l_returnflag,
        |  sum((l_extendedprice * l_quantity)::DECIMAL(18,6))::DOUBLE
        |    / sum(l_quantity::DECIMAL(18,6))::DOUBLE AS wavg_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
