package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit across every SparkEntry query: one summary
  * line per query with the plan facts that matter at 100 TB — join
  * strategies chosen, exchange count, scan pushdown, codegen, and
  * any cartesian products (which should never appear).
  *
  * Usage: runMain graft.PlanAudit [sfDir] — prints a table; exits
  * nonzero if a cartesian product sneaks into any plan.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var cartesian = List.empty[String]
    println(f"${"query"}%-22s exch  bhj  smj  bnlj  pushed  codegen  cartesian")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.count() // finalize AQE so the audited plan is the executed one
        val p = df.queryExecution.executedPlan.toString
        def n(s: String) = p.sliding(s.length).count(_ == s)
        val hasCart = p.contains("CartesianProduct")
        if (hasCart) cartesian ::= name
        println(f"$name%-22s ${n("Exchange")}%4d ${n("BroadcastHashJoin")}%4d " +
          f"${n("SortMergeJoin")}%4d ${n("BroadcastNestedLoopJoin")}%5d " +
          f"${p.contains("PushedFilters: [")}%7s ${p.contains("*(")}%8s $hasCart%9s")
      } catch {
        case e: Throwable => println(f"$name%-22s FAILED: ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
    if (cartesian.nonEmpty) {
      System.err.println(s"Cartesian products in: ${cartesian.mkString(", ")}")
      sys.exit(1)
    }
  }
}
