package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-mass probe for the blocked-join families (r12 verdict
  * #7: exponent notes need measured candidate masses, not just time
  * ratios — the edit-join 3-point study discipline). Prints, for a
  * given sf dir, the intermediate cardinalities that drive each
  * family's scale exponent. Run at sf0.01 / sf0.1 / sf1 and compare
  * growth per decade.
  *
  * Usage: runMain graft.MassProbe <sfDir> [family,...]
  */
object MassProbe {

  def main(args: Array[String]): Unit = {
    val Array(dir, rest @ _*) = args
    val only: Option[Set[String]] = rest.headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def p(name: String, v: Long): Unit = println(f"[mass] $name%-28s $v%12d")

    if (only.forall(_.contains("wj"))) {
      val docs = graft.operators.Dedup.corpus(spark, dir)
      val stats = graft.operators.Dedup.wjMassStats(docs)
      stats.foreach { case (k, v) => p(s"wj.$k", v) }
    }
    if (only.exists(_.contains("knn"))) {
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val stats = graft.operators.Similarity.knnMassStats(emb)
      stats.foreach { case (k, v) => p(s"knn.$k", v) }
    }
    spark.stop()
  }
}
