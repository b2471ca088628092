package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.extract._
import graft.functions.GraftFunctions.normalizeStr
import graft.sources.JdbcPartitionedSource
import graft.sources.JdbcPartitionedSource.{JdbcTable, Range, Predicates, Single}

class ExtractSpec extends AnyFunSuite {

  test("normalizeStr matches reference behavior") {
    assert(normalizeStr("Foo Bar-Baz.qux") == "foo_bar_baz_qux")
    assert(normalizeStr("ALready_fine9") == "already_fine9")
  }

  test("BqSchema maps Spark types per reference rules") {
    def ty(dt: DataType) = BqSchema.mapType(dt)._1
    assert(ty(LongType) == "INT64" && ty(IntegerType) == "INT64")
    assert(ty(DoubleType) == "FLOAT64" && ty(FloatType) == "FLOAT64")
    assert(ty(StringType) == "STRING" && ty(BooleanType) == "BOOL")
    assert(ty(BinaryType) == "BYTES" && ty(DateType) == "DATE")
    assert(ty(TimestampType) == "DATETIME" && ty(TimestampNTZType) == "DATETIME")
    assert(ty(DecimalType(18, 0)) == "INT64")
    assert(BqSchema.mapType(DecimalType(20, 4)) == ("NUMERIC", Some(20), Some(4)))
    assert(BqSchema.mapType(DecimalType(38, 20)) == ("BIGNUMERIC", Some(38), Some(20)))
  }

  test("BqSchema marks arrays Repeated and normalizes names") {
    val s = StructType(Seq(
      StructField("Vec Col", ArrayType(FloatType), nullable = true),
      StructField("id", LongType, nullable = false)))
    val fs = BqSchema.fields(s)
    assert(fs(0) == BqSchema.BqField("vec_col", "FLOAT64", "Repeated"))
    assert(fs(1) == BqSchema.BqField("id", "INT64", "Required"))
    assert(BqSchema.toJson(s).contains("\"mode\": \"Repeated\""))
  }

  test("StateStore round-trips and tracks expiry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state")
    val path = dir.resolve("state.json").toString
    val store = new StateStore(path)
    val st = ExtractState("orders", rows = Some(15000), minKey = Some(0),
      maxKey = Some(14999), partitionColumn = Some("o_orderkey"),
      partitions = Some(15), predicates = Seq("o_orderkey <= 10", "o_orderkey > 10"),
      introspectEpochS = Some(1000L), rowsLoaded = Some(15000))
    store.put(st)
    val re = new StateStore(path)
    assert(re.get("orders") == st)
    assert(re.get("missing") == ExtractState("missing"))
    assert(st.consistent)
    assert(!st.introspectionExpired(expireS = 0, nowEpochS = 999999))
    assert(st.introspectionExpired(expireS = 10, nowEpochS = 2000))
    assert(ExtractState("new").introspectionExpired(expireS = 0))
  }

  test("StateStore round-trips backslashes, quotes, and control chars") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state-esc")
    val path = dir.resolve("state.json").toString
    val nasty = ExtractState("t", predicates = Seq(
      """path\nliteral""", "tab\there", "quote\"inside", """back\\slash""", "nl\nreal"))
    new StateStore(path).put(nasty)
    assert(new StateStore(path).get("t") == nasty)
  }

  test("JdbcPartitionedSource builds mode-correct options") {
    val t = JdbcTable("jdbc:sqlserver://host;db=x", "dbo.REPORTING",
      Map("user" -> "u"), fetchSize = 5000)
    val r = JdbcPartitionedSource.options(t, Range("id", 0, 14999, 15))
    assert(r("partitionColumn") == "id" && r("lowerBound") == "0"
      && r("upperBound") == "14999" && r("numPartitions") == "15"
      && r("fetchsize") == "5000" && r("user") == "u")
    val s = JdbcPartitionedSource.options(t, Single)
    assert(!s.contains("partitionColumn"))
    val p = JdbcPartitionedSource.options(t, Predicates(Seq("id <= 5")))
    assert(!p.contains("partitionColumn"))
  }

  test("seeded table shuffle is a reproducible permutation; run honors it") {
    val tables = (1 to 20).map(i => s"t$i")
    val once = ExtractPipeline.shuffleTables(tables, seed = 42L)
    assert(once.sorted == tables.sorted, "shuffle must be a permutation")
    assert(once != tables, "seed 42 should actually reorder 20 tables")
    assert(once == ExtractPipeline.shuffleTables(tables, 42L), "same seed, same order")
    assert(once != ExtractPipeline.shuffleTables(tables, 43L), "different seed, different order")
    val stages = ExtractPipeline.Stages[String, String, String](
      identity, identity, identity)
    val res = ExtractPipeline.run(tables, stages,
      introspectWorkers = 1, extractWorkers = 1, loadWorkers = 1,
      shuffleSeed = Some(42L))
    assert(res.map(_.name) == once, "pipeline must process in shuffled order")
  }

  test("ExtractPipeline overlaps stages, captures failures, retries") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    val stages = ExtractPipeline.Stages[String, String, String](
      introspect = t => s"$t:i",
      extract = {
        case "flaky:i" if attempts.incrementAndGet() < 2 =>
          sys.error("transient")
        case a => s"$a:e"
      },
      load = {
        case "bad:i:e" => sys.error("boom")
        case b => s"$b:l"
      })
    val res = ExtractPipeline.run(Seq("t1", "t2", "bad", "flaky"), stages,
      retry = ExtractPipeline.RetryPolicy(attempts = 3, backoffMs = 1))
    val byName = res.map(r => r.name -> r.result).toMap
    assert(byName("t1") == Right("t1:i:e:l"))
    assert(byName("flaky") == Right("flaky:i:e:l"), "retry should recover the transient failure")
    assert(byName("bad").isLeft)
  }

  test("failed stage Result names the table, stage, attempts, and SQLState") {
    // the failure shape of a real JDBC extract: Spark wrapper around
    // a driver SQLException with SQLState + vendor code
    val stages = ExtractPipeline.Stages[String, String, String](
      introspect = t => t,
      extract = {
        case "bad" => throw new RuntimeException("spark jdbc wrapper",
          new java.sql.SQLException("Table/View 'LINEITEM' does not exist.", "42X05", 30000))
        case a => a
      },
      load = b => s"$b:done")
    val res = ExtractPipeline.run(Seq("ok", "bad"), stages,
      retry = ExtractPipeline.RetryPolicy(attempts = 2, backoffMs = 1))
    val byName = res.map(r => r.name -> r.result).toMap
    assert(byName("ok") == Right("ok:done"))
    byName("bad") match {
      case Left(e: ExtractPipeline.StageFailed) =>
        assert(e.table == "bad" && e.stage == "extract" && e.attempts == 2)
        assert(ExtractPipeline.sqlState(e).contains(("42X05", 30000)))
        // the rendered message alone must be enough at 2 a.m.
        assert(e.getMessage.contains("bad") && e.getMessage.contains("extract")
          && e.getMessage.contains("42X05") && e.getMessage.contains("does not exist"))
      case other => fail(s"expected StageFailed, got $other")
    }
  }

  test("shutdown exceptions are not retried; JDBC read failures carry mode+bounds") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val stages = ExtractPipeline.Stages[String, String, String](
      introspect = t => t,
      extract = { _ =>
        calls.incrementAndGet()
        throw new IllegalStateException("Cannot call methods on a stopped SparkContext: SparkContext was shut down")
      },
      load = identity)
    val res = ExtractPipeline.run(Seq("t"), stages,
      retry = ExtractPipeline.RetryPolicy(attempts = 5, backoffMs = 1))
    assert(calls.get() == 1, s"shutdown failure was retried ${calls.get()} times")
    res.head.result match {
      case Left(e: ExtractPipeline.StageFailed) => assert(e.attempts == 1)
      case other => fail(s"expected StageFailed, got $other")
    }
    // mode + partition bounds in the failure report (JdbcReadFailed
    // joins the cause chain under StageFailed in a real extract)
    import graft.sources.JdbcPartitionedSource._
    val bad = JdbcTable("jdbc:derby:memory:nosuchdb", "lineitem")
    val mode = Range("l_orderkey", 1L, 60000L, 8)
    val e = intercept[JdbcReadFailed] { read(SparkSuite.spark, bad, mode) }
    assert(e.table == "lineitem")
    assert(e.getMessage.contains("bounds=[1,60000]")
      && e.getMessage.contains("partitions=8"))
  }

  test("ExtractPipeline deadline fails stragglers, keeps finished results") {
    val stages = ExtractPipeline.Stages[String, String, String](
      introspect = t => t,
      extract = {
        case "slow" => Thread.sleep(60000); "slow"
        case a => a
      },
      load = b => s"$b:done")
    val res = ExtractPipeline.run(Seq("fast1", "fast2", "slow"), stages,
      retry = ExtractPipeline.RetryPolicy(attempts = 1),
      deadlineMs = Some(2000))
    val byName = res.map(r => r.name -> r.result).toMap
    assert(byName("fast1") == Right("fast1:done"))
    assert(byName("fast2") == Right("fast2:done"))
    byName("slow") match {
      case Left(e: ExtractPipeline.DeadlineExceeded) =>
        assert(e.table == "slow")
      case other => fail(s"expected DeadlineExceeded, got $other")
    }
  }
}
