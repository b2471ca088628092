package graft.core

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LongArrayDot, ShingleHash48}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - `GraftExtensions` for new sessions:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.core.GraftExtensions`.
  *  - `registerFunctions(spark)` for an existing session (temp
  *    functions in its registry).
  *
  * Both expose:
  *   long_array_dot(array<bigint>, array<bigint>) → bigint
  *   shingle_hash48(array<string>, n) → array<bigint>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("long_array_dot"),
      info("long_array_dot", "exact int64 dot product of two bigint arrays"),
      (exprs: Seq[Expression]) => LongArrayDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("shingle_hash48"),
      info("shingle_hash48", "48-bit md5-prefix hashes of word n-gram shingles"),
      (exprs: Seq[Expression]) => mkShingleHash(exprs)))
    e.injectOptimizerRule(_ => graft.plans.DimBroadcastRule)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def mkShingleHash(exprs: Seq[Expression]): ShingleHash48 = {
    require(exprs.length == 2, "shingle_hash48(tokens, n)")
    val n = exprs(1) match {
      case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException("shingle width must be a literal")
    }
    ShingleHash48(exprs(0), n)
  }

  /** Temp-function registration on an existing session. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("long_array_dot",
      (exprs: Seq[Expression]) => LongArrayDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("shingle_hash48",
      (exprs: Seq[Expression]) => mkShingleHash(exprs), "built-in")
  }
}
