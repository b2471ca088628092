package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Parallel JDBC extraction — the reference's core read path
  * (pipeline.py:402-454 `_extract`), Spark-native.
  *
  * Three modes, chosen by PartitionPlanner from introspected stats:
  *  - Range:      Spark's (partitionColumn, lowerBound, upperBound,
  *                numPartitions) — one task per key stride.
  *  - Predicates: one task per julienne WHERE clause (equal-row
  *                slices even under key skew).
  *  - Single:     one connection for small tables.
  *
  * JdbcLiveSpec drives all three modes end-to-end against an
  * embedded Derby database (a real JDBC URL), including the
  * introspection aggregate pushed into the source engine.
  */
object JdbcPartitionedSource {

  sealed trait Mode
  final case class Range(column: String, lower: Long, upper: Long, numPartitions: Int) extends Mode
  final case class Predicates(predicates: Seq[String]) extends Mode
  case object Single extends Mode

  final case class JdbcTable(url: String, table: String,
                             properties: Map[String, String] = Map.empty,
                             fetchSize: Int = 10000)

  /** Reader options for the range/single modes (predicates mode uses
    * the dedicated jdbc(predicates) entry point instead).
    */
  def options(t: JdbcTable, mode: Mode): Map[String, String] = {
    val base = Map(
      "url" -> t.url,
      "dbtable" -> t.table,
      "fetchsize" -> t.fetchSize.toString) ++ t.properties
    mode match {
      case Range(c, lo, hi, n) => base ++ Map(
        "partitionColumn" -> c,
        "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString,
        "numPartitions" -> n.toString)
      case Predicates(_) | Single => base
    }
  }

  def configure(reader: DataFrameReader, t: JdbcTable, mode: Mode): DataFrameReader =
    options(t, mode).foldLeft(reader.format("jdbc")) {
      case (r, (k, v)) => r.option(k, v)
    }

  /** Source-dialect dispatch for introspection SQL. The reference
    * ships an MSSQL count_big helper (util.py:25-52) because SQL
    * Server's COUNT(*) returns INT and overflows past 2^31 rows —
    * exactly the table size where partitioned extraction matters;
    * other engines' COUNT(*) is already 64-bit. Dispatch is by JDBC
    * URL subprotocol so a caller pointing at SQL Server gets the
    * overflow-safe aggregate without configuration.
    */
  sealed trait Dialect { def countExpr: String = "COUNT(*)" }
  case object MsSqlDialect extends Dialect {
    override def countExpr: String = "COUNT_BIG(*)"
  }
  case object GenericDialect extends Dialect

  def dialectOf(url: String): Dialect =
    if (url.startsWith("jdbc:sqlserver")) MsSqlDialect else GenericDialect

  /** The introspection statement pushed to the source engine —
    * exposed as a pure function so specs can pin the per-dialect SQL
    * without a live server of each flavor.
    */
  def introspectSql(t: JdbcTable, key: String): String = {
    val d = dialectOf(t.url)
    // aliases quoted: unquoted identifiers fold to upper case
    s"""SELECT ${d.countExpr} AS "row_cnt", MIN($key) AS "min_key",
       |  MAX($key) AS "max_key", COUNT(DISTINCT $key) AS "distinct_keys"
       |FROM ${t.table}""".stripMargin
  }

  /** Introspection pushed into the source DB (the reference runs the
    * same aggregate server-side, pipeline.py:269-330): one row
    * travels over JDBC, never the table.
    */
  def introspect(spark: SparkSession, t: JdbcTable, key: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", t.url)
      .option("query", introspectSql(t, key))
      .options(t.properties)
      .load()

  /** Human-readable mode summary for failure reports: names the
    * partition bounds an operator needs to reproduce the failing
    * slice (reference TODO.md "more detail on Spark exceptions").
    */
  def describe(mode: Mode): String = mode match {
    case Range(c, lo, hi, n) => s"range(column=$c, bounds=[$lo,$hi], partitions=$n)"
    case Predicates(p) => s"predicates(${p.size} slices, first=${p.headOption.getOrElse("-")})"
    case Single => "single"
  }

  /** JDBC read failure carrying the table and the extraction mode
    * (with its partition bounds); the driver/SQLState detail stays in
    * the cause chain, which ExtractPipeline.StageFailed renders.
    */
  final case class JdbcReadFailed(table: String, mode: Mode, failure: Throwable)
    extends RuntimeException(
      s"jdbc read of $table failed in mode ${describe(mode)}", failure)

  def read(spark: SparkSession, t: JdbcTable, mode: Mode): DataFrame =
    try mode match {
      case Predicates(preds) =>
        val props = new java.util.Properties()
        t.properties.foreach { case (k, v) => props.setProperty(k, v) }
        props.setProperty("fetchsize", t.fetchSize.toString)
        spark.read.jdbc(t.url, t.table, preds.toArray, props)
      case m => configure(spark.read, t, m).load()
    } catch {
      // the JDBC reader resolves schema eagerly, so connection/auth/
      // missing-table failures surface here, not at action time
      case scala.util.control.NonFatal(e) => throw JdbcReadFailed(t.table, mode, e)
    }
}
