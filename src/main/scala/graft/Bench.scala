package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query timed at
  * SPARK_GRAFT_SF_DIR.
  *
  * Protocol (interference-proof, per r4 verdict): instead of running
  * all n repetitions of one query back-to-back — which lets a
  * sustained external-load window poison a whole contiguous stretch
  * of queries — we run n COMPLETE SWEEPS over all queries (sorted by
  * name for cross-round stability) and take the POINTWISE MIN across
  * sweeps. A noisy window now inflates at most one sweep's sample of
  * each query, and the min across sweeps discards it.
  *
  * Output: the full per-query JSON (min + per-sweep samples) goes to
  * BENCH_LAST.json; stdout's FINAL line is a compact summary (total +
  * file pointer) small enough for a 2 KB tail parse.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm codegen/JIT per query plan at the smallest SF so timed
    // runs measure steady-state execution, not compiler startup.
    queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // Environment fingerprint (r6 verdict #7): loadavg + cpu count +
    // a ~1 s spin-calibration constant, recorded per epoch so a
    // uniformly-inflated epoch (external load, a slower machine) is
    // machine-attributable from the JSON instead of inferred from
    // untouched-query drift. spin1s = iterations of a fixed integer
    // LCG loop in one second — a relative machine-speed constant
    // under the same protocol every epoch.
    def fingerprint(): String = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val deadline = System.nanoTime() + 1000000000L
      var it = 0L
      var x = 123456789L
      while (System.nanoTime() < deadline) {
        var i = 0
        while (i < 10000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
        it += 1
      }
      // fold x in so the spin loop cannot be optimized away
      s"""{"loadavg":${os.getSystemLoadAverage},"cpus":${Runtime.getRuntime.availableProcessors},"spin1s":${it ^ (x & 1L)}}"""
    }
    val envFp = fingerprint()
    // n interleaved sweeps: sweep s times every query once, in name
    // order, before any query gets its (s+1)-th sample. One extra
    // UNTIMED sweep runs first at the TARGET scale and is discarded:
    // back-to-back repetition (the old protocol) measured best-HOT
    // times, and without this the interleaved sweeps would bill every
    // query a cold-cache premium the old numbers never paid —
    // cross-round comparability requires warm-state samples either way.
    val sweepTimes: Seq[Seq[Double]] =
      (0 to sweeps).map(_ => queries.map { case (_, fn) => time(fn) }).drop(1)
    val samples: Seq[(String, Seq[Double])] = queries.zipWithIndex.map {
      case ((name, _), i) => name -> sweepTimes.map(_(i))
    }
    // Pointwise min across sweeps — the noise-robust estimator; a
    // contaminated sweep cannot poison a query that ran clean in any
    // other sweep. Failed runs (-1) are excluded unless all failed.
    def best(v: Seq[Double]): Double = {
      val ok = v.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    val results = samples.map { case (k, v) => k -> best(v) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val raw = samples.map { case (k, v) => "\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","sweeps":$sweeps,"protocol":"interleaved-pointwise-min","env":$envFp,"queries":$qs,"samples":$raw,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full)
    // Compact FINAL stdout line (~120 bytes): fits the driver's 2 KB
    // tail even with log prefixes; full per-query detail is in the file.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","sweeps":$sweeps,"nqueries":${results.size},"env":$envFp,"sf":"$sfDir","file":"$outPath"}""")
    spark.stop()
  }
}
