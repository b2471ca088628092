package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.PartitionPlanner
import graft.sources.{JdbcPartitionedSource => J, Tables}

/** The reference's actual read path (pipeline.py:402-468) against a
  * LIVE JDBC database: an embedded Derby instance loaded with the
  * orders table, driven through introspect → strategy → all three
  * `spark.read.jdbc` partition modes, with count + content
  * reconciliation against the parquet source of truth.
  *
  * Identifiers are created UNQUOTED (Derby folds to upper-case and
  * matches case-insensitively), matching a DBA-managed source schema
  * where predicate strings like `o_orderkey > 5` resolve naturally.
  */
class JdbcLiveSpec extends AnyFunSuite {
  import SparkSuite._

  private lazy val dbPath =
    java.nio.file.Files.createTempDirectory("graft-derby").resolve("db").toString
  private lazy val url = s"jdbc:derby:$dbPath;create=true"
  private lazy val table = J.JdbcTable(url, "orders")

  /** Populate Derby from the parquet table over plain JDBC. */
  private lazy val loaded: Long = {
    val rows = Tables.orders(spark, sf).collect()
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute("DROP TABLE orders")
      catch { case _: java.sql.SQLException => () } // first run: no table yet
      conn.createStatement().execute(
        """CREATE TABLE orders (
          |  o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR(1),
          |  o_totalprice DOUBLE, o_orderdate TIMESTAMP,
          |  o_orderpriority VARCHAR(20))""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO orders VALUES (?,?,?,?,?,?)")
      rows.foreach { r =>
        ps.setLong(1, r.getAs[Long]("o_orderkey"))
        ps.setLong(2, r.getAs[Long]("o_custkey"))
        ps.setString(3, r.getAs[String]("o_orderstatus"))
        ps.setDouble(4, r.getAs[Double]("o_totalprice"))
        ps.setTimestamp(5, r.getAs[Any]("o_orderdate") match {
          case t: java.sql.Timestamp => t
          case t: java.time.LocalDateTime => java.sql.Timestamp.valueOf(t)
          case t: java.time.Instant => java.sql.Timestamp.from(t)
        })
        ps.setString(6, r.getAs[String]("o_orderpriority"))
        ps.addBatch()
      }
      ps.executeBatch()
      rows.length.toLong
    } finally conn.close()
  }

  test("introspection aggregate runs inside the source DB") {
    assert(loaded == 1500L)
    val row = J.introspect(spark, table, "o_orderkey").collect()(0)
    assert(row.getAs[Number]("row_cnt").longValue() == loaded)
    assert(row.getAs[Number]("min_key").longValue() == 0L)
    assert(row.getAs[Number]("max_key").longValue() == loaded - 1)
    assert(row.getAs[Number]("distinct_keys").longValue() == loaded)
  }

  test("introspection SQL dispatches by dialect (MSSQL gets COUNT_BIG)") {
    val mssql = J.JdbcTable("jdbc:sqlserver://host;databaseName=db", "dbo.orders")
    assert(J.dialectOf(mssql.url) == J.MsSqlDialect)
    assert(J.introspectSql(mssql, "o_orderkey").contains("COUNT_BIG(*)"),
      "SQL Server COUNT(*) returns INT and overflows past 2^31 rows")
    // generic engines keep the standard 64-bit COUNT(*)
    assert(J.dialectOf(table.url) == J.GenericDialect)
    val derby = J.introspectSql(table, "o_orderkey")
    assert(derby.contains("COUNT(*)") && !derby.contains("COUNT_BIG"))
    // and the generic statement is exactly what the live test runs
    assert(J.introspect(spark, table, "o_orderkey")
      .collect()(0).getAs[Number]("row_cnt").longValue() == loaded)
  }

  test("range mode extracts with one task per key stride") {
    assert(loaded == 1500L)
    val df = J.read(spark, table, J.Range("o_orderkey", 0L, 1499L, 4))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == loaded)
  }

  test("predicates mode extracts julienne slices that reconcile") {
    assert(loaded == 1500L)
    // plan boundaries from a single-connection read of the live DB
    val whole = J.read(spark, table, J.Single)
    val preds = PartitionPlanner.juliennePredicates(
        PartitionPlanner.julienneBoundaries(whole, "o_orderkey", 400L), "o_orderkey")
      .orderBy(col("pred_id")).collect().map(_.getAs[String]("predicate"))
    assert(preds.length >= 3, preds.toSeq)
    val df = J.read(spark, table, J.Predicates(preds.toIndexedSeq))
    assert(df.rdd.getNumPartitions == preds.length)
    assert(df.count() == loaded)
    // content reconcile, not just counts
    val viaJdbc = df.agg(
      sum(col("o_orderkey")).as("ks"),
      round(sum(col("o_totalprice").cast("decimal(18,6)")), 4).as("ps")).collect()(0)
    val viaParquet = Tables.orders(spark, sf).agg(
      sum(col("o_orderkey")).as("ks"),
      round(sum(col("o_totalprice").cast("decimal(18,6)")), 4).as("ps")).collect()(0)
    assert(viaJdbc == viaParquet)
  }

  test("single mode reads whole table over one connection") {
    assert(loaded == 1500L)
    assert(J.read(spark, table, J.Single).count() == loaded)
  }

  test("tune mode times the config grid and picks a winner from it") {
    import graft.extract.TuneJob
    assert(loaded == 1500L)
    val grid = Seq(TuneJob.Config(1, 1000), TuneJob.Config(2, 1000),
      TuneJob.Config(1, 500), TuneJob.Config(2, 500))
    val res = TuneJob.tune(spark, table, "o_orderkey", grid)
    assert(res.samples.length == grid.length)
    assert(res.samples.forall(_.rows == loaded),
      "every probe must dump the full table")
    assert(res.samples.forall(_.rowsPerSec > 0))
    assert(grid.contains(res.best))
  }

  test("tiny tables extract driver-side without a Spark job") {
    import graft.extract.TuneJob
    assert(loaded == 1500L)
    val df = TuneJob.tinyExtract(spark, table)
    assert(df.rdd.getNumPartitions <= spark.sparkContext.defaultParallelism)
    assert(df.count() == loaded)
    assert(df.columns.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    // content reconcile against the distributed read
    val viaJdbc = df.agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
    val distributed = J.read(spark, table, J.Single)
    val viaSpark = distributed
      .agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
    assert(viaJdbc == viaSpark)
    // SCHEMA parity with the distributed path: DECIMAL keeps its
    // precision/scale and DATE stays a date — a table extracted tiny
    // must type exactly like the same table extracted via spark.read
    val tinyTypes = df.schema.map(f => f.name -> f.dataType).toMap
    val sparkTypes = distributed.schema
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(tinyTypes("o_totalprice") == sparkTypes("o_totalprice"),
      s"decimal diverged: tiny=${tinyTypes("o_totalprice")} spark=${sparkTypes("o_totalprice")}")
    assert(tinyTypes("o_orderdate") == sparkTypes("o_orderdate"),
      s"date diverged: tiny=${tinyTypes("o_orderdate")} spark=${sparkTypes("o_orderdate")}")
    // the guard rail refuses to materialize big tables on the driver
    intercept[IllegalStateException] {
      TuneJob.tinyExtract(spark, table, maxRows = 100)
    }
  }

  test("spark jdbc write round-trips") {
    assert(loaded == 1500L)
    val src = Tables.nation(spark, sf)
    src.write.format("jdbc")
      .option("url", url).option("dbtable", "nation_rt").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation_rt").load()
    assert(back.count() == src.count())
    assert(back.columns.toSet == src.columns.toSet)
  }
}
