package graft.extract

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.JdbcPartitionedSource

/** The reference's two "would-be-awesome" TODO.md features, closed
  * from this side:
  *
  *  - BENCHMARK MODE: "dumps a single table and adjusts threads /
  *    fetch row size to determine optimal settings" — `tune` dumps
  *    one table across a (numPartitions × fetchSize) grid, times
  *    each full read, and reports rows/sec per config plus the
  *    winner. Driver-side orchestration; each probe is a real
  *    distributed `spark.read.jdbc` range scan.
  *
  *  - NON-SPARK EXTRACT for very tiny tables ("eg. zc_ under 100
  *    rows"): `tinyExtract` pulls the rows over ONE plain JDBC
  *    connection on the driver and wraps them with createDataFrame —
  *    no job, no task scheduling, no executor round-trip, which for
  *    a 50-row lookup table is the difference between ~5 ms and a
  *    full Spark stage. The partition planner's Single mode still
  *    pays Spark's scan machinery; this path doesn't.
  */
object TuneJob {

  final case class Config(numPartitions: Int, fetchSize: Int)
  final case class Sample(config: Config, rows: Long, elapsedMs: Long) {
    def rowsPerSec: Double =
      if (elapsedMs <= 0) rows.toDouble * 1000.0 else rows.toDouble * 1000.0 / elapsedMs
  }
  final case class TuneResult(samples: Seq[Sample], best: Config)

  val DefaultGrid: Seq[Config] = for {
    parts <- Seq(1, 4, 8)
    fetch <- Seq(1000, 10000)
  } yield Config(parts, fetch)

  /** Times one full ranged read of `t` per grid config. The winner
    * maximizes rows/sec; ties break toward fewer partitions then
    * smaller fetch (cheapest footprint on the source DB).
    */
  def tune(spark: SparkSession, t: JdbcPartitionedSource.JdbcTable, key: String,
           grid: Seq[Config] = DefaultGrid): TuneResult = {
    val stats = JdbcPartitionedSource.introspect(spark, t, key).collect()(0)
    val lo = stats.getAs[Number]("min_key").longValue()
    val hi = stats.getAs[Number]("max_key").longValue()
    val samples = grid.map { c =>
      val reader = t.copy(fetchSize = c.fetchSize)
      val t0 = System.nanoTime()
      val rows = JdbcPartitionedSource
        .read(spark, reader, JdbcPartitionedSource.Range(key, lo, hi, c.numPartitions))
        .count()
      Sample(c, rows, (System.nanoTime() - t0) / 1000000)
    }
    val best = samples
      .maxBy(s => (s.rowsPerSec, -s.config.numPartitions, -s.config.fetchSize))
      .config
    TuneResult(samples, best)
  }

  /** JDBC→Spark type mapping for the driver-side path. Must agree
    * with what `spark.read.jdbc` infers for the same table, or a
    * table extracted tiny gets different column types than the same
    * table extracted distributed: DECIMAL/NUMERIC keep their
    * metadata precision/scale as DecimalType and DATE maps to
    * DateType (not string). Anything outside the extract surface
    * lands as string.
    */
  private def fieldType(md: java.sql.ResultSetMetaData, i: Int): DataType =
    md.getColumnType(i) match {
      case java.sql.Types.BIGINT => LongType
      case java.sql.Types.INTEGER | java.sql.Types.SMALLINT => IntegerType
      case java.sql.Types.DOUBLE | java.sql.Types.FLOAT => DoubleType
      case java.sql.Types.DECIMAL | java.sql.Types.NUMERIC =>
        // precision 0 = driver reports "unknown": Spark's JDBC reader
        // falls back to the maximum system default the same way
        val p = md.getPrecision(i)
        if (p > 0 && p <= DecimalType.MAX_PRECISION)
          DecimalType(p, math.max(0, math.min(md.getScale(i), p)))
        else DecimalType.SYSTEM_DEFAULT
      case java.sql.Types.DATE => DateType
      case java.sql.Types.TIMESTAMP => TimestampType
      case java.sql.Types.BOOLEAN => BooleanType
      case _ => StringType
    }

  /** One-connection driver-side extract. `maxRows` is a guard rail:
    * exceeding it throws rather than silently materializing a big
    * table on the driver — the caller asked for the tiny path.
    */
  def tinyExtract(spark: SparkSession, t: JdbcPartitionedSource.JdbcTable,
                  maxRows: Int = 10000): DataFrame = {
    // same credentials/driver options the distributed spark.read.jdbc
    // path passes — url-only getConnection fails on any authenticated
    // source (it only ever worked against credential-less Derby)
    val props = new java.util.Properties()
    t.properties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = DriverManager.getConnection(t.url, props)
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery(s"SELECT * FROM ${t.table}")
      val md = rs.getMetaData
      val n = md.getColumnCount
      val schema = StructType((1 to n).map(i =>
        StructField(md.getColumnLabel(i).toLowerCase, fieldType(md, i))))
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (rs.next()) {
        if (buf.length >= maxRows)
          throw new IllegalStateException(
            s"${t.table} exceeds tinyExtract maxRows=$maxRows; use the Spark path")
        buf += Row.fromSeq((1 to n).map { i =>
          val v = schema(i - 1).dataType match {
            case LongType => rs.getLong(i)
            case IntegerType => rs.getInt(i)
            case DoubleType => rs.getDouble(i)
            case _: DecimalType => rs.getBigDecimal(i)
            case DateType => rs.getDate(i)
            case TimestampType => rs.getTimestamp(i)
            case BooleanType => rs.getBoolean(i)
            case _ => rs.getString(i)
          }
          if (rs.wasNull()) null else v
        })
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(buf.toSeq).asJava),
        schema)
    } finally conn.close()
  }
}
