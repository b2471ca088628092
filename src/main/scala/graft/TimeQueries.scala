package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid: time a NAMED SUBSET of
  * SparkEntry.queries with the Bench protocol (same session conf,
  * same warm sweep + pointwise-min-of-3), without paying a full
  * 236-query sweep per iteration. The committed evidence epochs stay
  * graft.Bench runs; this is the inner-loop stopwatch only.
  *
  * Usage: runMain graft.TimeQueries <sfDir> <names-csv> [sweeps]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val sweeps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = names.map(n => n -> SparkEntry.queries(n))
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    qs.foreach { case (_, fn) => time(fn) } // warm sweep, discarded
    val samples = (1 to sweeps).map(_ => qs.map { case (_, fn) => time(fn) })
    qs.zipWithIndex.foreach { case ((n, _), i) =>
      val v = samples.map(_(i)).filter(_ >= 0)
      val best = if (v.isEmpty) -1.0 else v.min
      println(f"[time] $n%-28s $best%8.3f  (${v.map(x => f"$x%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
