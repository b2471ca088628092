package graft.extract

import org.apache.spark.sql.{DataFrame, SaveMode}
import java.nio.file.{Files, Paths}

import graft.functions.GraftFunctions.normalizeStr

/** Extract sinks: compressed-JSON table dumps with a BigQuery
  * `schema.json` sidecar — the reference's output contract
  * (pipeline.py:455-468 writes json+gzip with a fixed
  * timestampFormat; _save_schema pipeline.py:517-526).
  *
  * The writer itself is just Spark's distributed JSON sink: each
  * partition streams one `part-*.json.gz`; partition count (and so
  * output file size) is governed upstream by PartitionPlanner /
  * AdaptiveSizer, matching dumpty's target_partition_size_bytes
  * feedback loop.
  */
object Sinks {

  val TimestampFormat = "yyyy-MM-dd HH:mm:ss"

  /** Writes `df` as gzip JSON under `uri`/`table` (normalized name),
    * plus schema.json; returns the data glob like the reference's
    * final_uri.
    */
  def writeJsonGz(df: DataFrame, uri: String, table: String,
                  partitions: Option[Int] = None,
                  normalizeNames: Boolean = true): String = {
    val name = normalizeStr(table)
    val out = if (normalizeNames) SchemaNormalizer(df) else df
    val sized = partitions.map(out.repartition(_)).getOrElse(out)
    sized.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TimestampFormat)
      .option("compression", "gzip")
      .json(s"$uri/$name")
    Files.writeString(Paths.get(s"$uri/$name/schema.json"),
      BqSchema.toJson(df.schema))
    s"$uri/$name/part-*.json.gz"
  }

  /** Format-dispatching sink (reference config `spark.format` +
    * gcp.py source_format switch): json (gzip), csv (gzip, header),
    * or parquet — always with the schema.json sidecar, returning the
    * part glob.
    */
  def write(df: DataFrame, uri: String, table: String, format: String,
            partitions: Option[Int] = None,
            normalizeNames: Boolean = true): String = format match {
    case "json" => writeJsonGz(df, uri, table, partitions, normalizeNames)
    case "parquet" =>
      val glob = writeParquet(df, uri, table, partitions)
      Files.writeString(Paths.get(s"$uri/${normalizeStr(table)}/schema.json"),
        BqSchema.toJson(df.schema))
      glob
    case "csv" =>
      val name = normalizeStr(table)
      val out = if (normalizeNames) SchemaNormalizer(df) else df
      val sized = partitions.map(out.repartition(_)).getOrElse(out)
      sized.write.mode(SaveMode.Overwrite)
        .option("header", "true")
        .option("timestampFormat", TimestampFormat)
        .option("compression", "gzip")
        .csv(s"$uri/$name")
      Files.writeString(Paths.get(s"$uri/$name/schema.json"),
        BqSchema.toJson(df.schema))
      s"$uri/$name/part-*.csv.gz"
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  /** Reader for data this sink wrote (used by load-stage reconcile). */
  def read(spark: org.apache.spark.sql.SparkSession, uri: String, format: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame = format match {
    case "json" => spark.read.schema(schema).json(uri)
    case "parquet" => spark.read.parquet(uri)
    case "csv" => spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TimestampFormat)
      .csv(uri)
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  /** Parquet sink (the cluster-native format; same naming contract). */
  def writeParquet(df: DataFrame, uri: String, table: String,
                   partitions: Option[Int] = None): String = {
    val name = normalizeStr(table)
    val sized = partitions.map(df.repartition(_)).getOrElse(df)
    sized.write.mode(SaveMode.Overwrite).parquet(s"$uri/$name")
    s"$uri/$name/part-*.parquet"
  }

  /** Hive-partitioned parquet sink — the 100 TB LAYOUT primitive:
    * `partitionBy` writes one directory per partition-column value,
    * so any later read filtered on those columns prunes whole
    * directories at PLANNING time (PartitionFilters in the scan, zero
    * I/O for pruned values) instead of relying on row-group stats.
    * Partition columns should be low-cardinality (source, date,
    * lang); high-cardinality keys belong in z-order or bucketing.
    * The sidecar-free contract matches writeParquet; SinksSpec pins
    * the pruning (selected partitions < total) on read-back.
    */
  def writePartitioned(df: DataFrame, uri: String, table: String,
                       partitionCols: Seq[String]): String = {
    val name = normalizeStr(table)
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(s"$uri/$name")
    s"$uri/$name"
  }

  /** Total bytes of an extract's output files (drives AdaptiveSizer,
    * reference gcp.get_size_bytes).
    */
  def sizeBytes(uri: String, table: String): Long = {
    val dir = Paths.get(uri, normalizeStr(table))
    if (!Files.exists(dir)) 0L
    else {
      val s = Files.list(dir)
      try s.filter(p => p.getFileName.toString.startsWith("part-"))
        .mapToLong(Files.size).sum
      finally s.close()
    }
  }
}
