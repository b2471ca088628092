package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.extract.{Merge, Warehouse}
import graft.operators.Curation

/** Streaming corpus curation (SURVEY §7 r4): documents arrive as
  * files, every micro-batch is scrubbed (PII/URL redaction) and run
  * through the quality-rule cascade, and the results land in the
  * warehouse via foreachBatch — kept docs in a corpus table, every
  * doc's verdict in an audit table whose drop-reason counts are a
  * derived aggregate.
  *
  * Idempotence: both writes are keyed upserts by doc_id, so an
  * at-least-once replay of a micro-batch converges to the same
  * tables (the EventStreams.runStreamToWarehouse property, composed
  * with curation). Counting drops per REASON as its own state would
  * double-count on replay; deriving counts from the keyed audit
  * table makes the aggregate replay-proof by construction.
  */
object DocStreams {

  /** Schema of the raw documents parquet. */
  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File stream over a staged directory (one parquet per table in
    * the test data; production is a directory of arriving files).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val staged = java.nio.file.Files.createTempDirectory("graft-docstream")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    spark.readStream.schema(rawSchema).parquet(staged.toString)
  }

  /** Batch curation core: scrub text, apply the rule cascade to the
    * SCRUBBED text, return one row per input doc with the verdict.
    */
  def curateBatch(docs: DataFrame): DataFrame =
    Curation.ruleFilter(
      docs.withColumn("text", Curation.scrub(col("text"))))
      .join(docs.select(col("doc_id"), col("source"), col("lang")), "doc_id")
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("drop_reason"), col("keep"))

  /** Runs the curation stream into warehouse tables `corpusTable`
    * (kept docs) and `auditTable` (per-doc verdicts). */
  def runCurationToWarehouse(spark: SparkSession, dir: String,
                             wh: Warehouse, ref: Warehouse.DatasetRef,
                             corpusTable: String, auditTable: String): Unit = {
    val q = readStream(spark, dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val curated = curateBatch(batch.toDF()).localCheckpoint()
        def upsert(rows: DataFrame, table: String): Unit = {
          val merged =
            if (wh.tableExists(ref, table))
              Merge.upsert(wh.readTable(ref, table), rows, "doc_id")
            else rows.dropDuplicates("doc_id")
          wh.writeTable(merged, ref, table)
        }
        upsert(curated.filter(col("keep"))
          .select(col("doc_id"), col("source"), col("lang"), col("n_tokens")),
          corpusTable)
        upsert(curated
          .select(col("doc_id"), coalesce(col("drop_reason"), lit("kept")).as("verdict")),
          auditTable)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Drop-reason counts derived from the audit table — replay-proof
    * because the audit rows are keyed by doc. */
  def dropCounts(wh: Warehouse, ref: Warehouse.DatasetRef, auditTable: String): DataFrame =
    wh.readTable(ref, auditTable)
      .groupBy(col("verdict")).agg(count(lit(1)).as("n_docs"))

  /** Streaming mixture application: factors PLANNED ONCE on a
    * reference corpus snapshot (Curation.mixtureFactors — the
    * realistic shape: plan on yesterday's corpus, apply to arriving
    * docs) are applied to every micro-batch, and sampled copies land
    * in the warehouse keyed by (doc_id, copy_idx) — so replays
    * converge and a doc's copies never duplicate. The factor table
    * is O(sources) and broadcasts inside applyMixture.
    */
  def runMixtureToWarehouse(spark: SparkSession, dir: String, factors: DataFrame,
                            wh: Warehouse, ref: Warehouse.DatasetRef,
                            table: String): Unit = {
    val local = factors.localCheckpoint() // pin the plan across batches
    val q = readStream(spark, dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sampled = graft.operators.Curation.applyMixture(batch.toDF(), local)
          .withColumn("sample_id",
            concat(col("doc_id").cast("string"), lit("#"), col("copy_idx").cast("string")))
          .localCheckpoint()
        val merged =
          if (wh.tableExists(ref, table))
            Merge.upsert(wh.readTable(ref, table), sampled, "sample_id")
          else sampled.dropDuplicates("sample_id")
        wh.writeTable(merged, ref, table)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
