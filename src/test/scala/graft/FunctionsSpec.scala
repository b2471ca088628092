package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Canary tests pinning the cross-engine contract to literal values
  * (independently computed with python hashlib / DuckDB). If a Spark
  * upgrade changes md5/conv/round/split semantics, these fire before
  * the oracle gate does.
  */
class FunctionsSpec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(Tuple1(1)).toDF("x").select(c).collect()(0).getAs[T](0)

  private def oneSeq(c: org.apache.spark.sql.Column): Seq[Long] =
    Seq(Tuple1(1)).toDF("x").select(c).collect()(0).getSeq[Long](0).toList

  test("tokenHash matches ('0x'||substr(md5(x),1,12))::BIGINT") {
    assert(one[Long](tokenHash(lit("hello"))) == 102534830799947L)
    assert(one[Long](tokenHash(lit("tablesmallsort"))) == 202465505150053L)
    // leading-zero md5 prefix (keygroupdup -> 059a...)
    assert(one[Long](tokenHash(lit("keygroupdup"))) == 6160773590808L)
  }

  test("shingleHashes equals per-shingle tokenHash of concatenated tokens") {
    val toks = typedlit(Seq("table", "small", "sort", "order"))
    assert(oneSeq(shingleHashes(toks, 3)) ==
      Seq(202465505150053L, one[Long](tokenHash(lit("smallsortorder")))))
    assert(oneSeq(shingleHashes(typedlit(Seq("a", "b")), 3)).isEmpty)
  }

  test("money decimal path makes double sums exact") {
    val df = Seq(0.1, 0.2, 0.3, 0.05, 0.07).toDF("v")
    val total = df.agg(msum(col("v"))).collect()(0).getDouble(0)
    assert(total == 0.72, s"got $total") // plain double sum gives 0.7200000000000001
  }

  test("quantize is exact for representable fractions") {
    val q = oneSeq(quantize(typedlit(Seq(0.5f, -0.25f, 1.0f))))
    assert(q == Seq(500000L, -250000L, 1000000L))
  }

  test("normalizeStr matches the SQL normalization expression") {
    val s = "Foo Bar-9.z"
    assert(normalizeStr(s) == one[String](normalize(lit(s))))
  }

  test("round is half-away-from-zero on doubles (DuckDB parity)") {
    assert(one[Double](round(lit(2.5), 0)) == 3.0)
    assert(one[Double](round(lit(-2.5), 0)) == -3.0)
  }

  test("native bloomMightContainLong == sketch mightContainLong, codegen and interpreted") {
    import spark.implicits._
    import graft.functions.BloomExpressions
    // sketch trained on 5k longs; probe 20k (half members, half not)
    val members = (0L until 5000L).map(i => i * 2654435761L % 1000003L)
    val bf = members.toDF("h").stat.bloomFilter("h", 5000L, 0.01)
    val probes = (0L until 20000L).map(i => i * 1099511628211L % 2000003L)
    val got = probes.toDF("h")
      .select(col("h"), BloomExpressions.bloomMightContainLong(col("h"), bf).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      assert(got(p) == bf.mightContainLong(p),
        s"probe $p: expr=${got(p)} sketch=${bf.mightContainLong(p)}")
    }
    // interpreted path (no codegen) must agree bit-for-bit too
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = probes.toDF("h")
        .select(col("h"), BloomExpressions.bloomMightContainLong(col("h"), bf).as("m"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(interp == got)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
