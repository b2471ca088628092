package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions._

/** Structured Streaming over the events table: watermarked tumbling-
  * window aggregation — the streaming twin of
  * Relational.qEventsWindow (same grouping keys and aggregates, so
  * batch output cross-checks the streaming run in StreamingSpec).
  *
  * At cluster scale this is the standard incremental-state plan:
  * watermark bounds state, partial aggregation happens before the
  * keyed state-store shuffle.
  */
object EventStreams {

  /** Schema of the raw events parquet (ts arrives as nanos int64
    * under nanosAsLong).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** FileStreamSource requires a directory; the test data ships one
    * parquet file per table, so stage a symlink in a temp dir (the
    * production shape is a directory of arriving files anyway).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val staged = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    spark.readStream.schema(rawSchema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** 1-hour tumbling windows with a 1-hour watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), msum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Runs the streaming query to completion against the (bounded)
    * file source via a memory sink; returns the result table.
    * Complete output mode so end-of-stream windows (which an append-
    * mode watermark would still be holding) are emitted.
    */
  def runToMemory(spark: SparkSession, dir: String, name: String = "events_stream"): DataFrame = {
    val q = windowedAgg(readStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Batch equivalent of windowedAgg for cross-checking. Uses the
    * same window() bucketing on the converted events table.
    */
  def batchEquivalent(spark: SparkSession, dir: String): DataFrame =
    windowedAggBatch(graft.sources.Tables.events(spark, dir))

  def windowedAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), msum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
}
