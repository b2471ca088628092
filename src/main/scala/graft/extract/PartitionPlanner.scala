package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Partition-strategy planning, re-expressed as Spark plans.
  *
  * dumpty picks one of three strategies per table (reference
  * README "Features", pipeline.py:355-400):
  *  - range:    numeric dense PK → Spark JDBC (col, lower, upper, n)
  *  - julienne: skewed / non-numeric PK → equal-row slices from
  *              ROW_NUMBER() boundaries → WHERE predicates
  *  - single:   too few rows to be worth partitioning
  *
  * Two julienne flavors, both cluster-safe:
  *  - `julienneBoundaries` — exact equal-row slices (what the
  *    reference computes by pushing ROW_NUMBER into the source DB,
  *    pipeline.py:236-265), via distributed rank (range buckets +
  *    partitioned windows), never a single global sort;
  *  - `julienneBoundariesApprox` — sketch-only boundary discovery
  *    (ExtractJob's default): slice sizes need only be roughly
  *    equi-depth, coverage is what matters, and one approxQuantile
  *    pass beats a full shuffle for planning a 100 TB extract.
  */
object PartitionPlanner {

  /** Strategy decision given introspected stats.
    * `partitions` = round(rows / rowsPerPartition), reference
    * pipeline.py:358 (default_rows_per_partition).
    */
  def strategy(stats: DataFrame, rowsPerPartition: Long): DataFrame = {
    val raw = round(col("row_cnt") / lit(rowsPerPartition.toDouble), 0).cast("long")
    stats.select(
      col("table_name"), col("row_cnt"),
      greatest(lit(1L), raw).as("partitions"),
      when(raw <= 1, "single")
        .when(col("dense"), "range")
        .otherwise("julienne").as("strategy"))
  }

  /** Equal-row slice boundaries: rows ranked by `key`, boundary at
    * every rank ≡ 0 (mod width), width = ceil(rows / partitions).
    * Returns (slice_id, boundary_key).
    *
    * The global rank is computed DISTRIBUTED-exact: sketch range
    * buckets (approxQuantile — only balance depends on them, never
    * the result), a row_number window partitioned per bucket, and
    * per-bucket offsets added back. Rank-r key = multiset order
    * statistic, so the output is identical to a single global sort
    * — without ever moving the table through one task (the r1 plan
    * was a "No Partition Defined" WindowExec: a 100 TB scale-killer).
    */
  def julienneBoundaries(df: DataFrame, key: String, rowsPerPartition: Long,
                         rangeBuckets: Int = 32): DataFrame = {
    val cnt = df.agg(count(lit(1)).as("c"))
      .select(col("c"),
        greatest(lit(1L), round(col("c") / lit(rowsPerPartition.toDouble), 0).cast("long")).as("p"))
      .select(col("c"), col("p"), ceil(col("c") / col("p").cast("double")).cast("long").as("w"))
    val keyed = df.select(col(key).cast("long").as("k"))
    // Sketch bounds need only be monotone: bucket(k) = #bounds < k.
    val bounds = keyed.stat
      .approxQuantile("k", (1 until rangeBuckets).map(_.toDouble / rangeBuckets).toArray, 0.001)
      .map(_.toLong).distinct.sorted
    val bucketed = keyed.withColumn("b",
      aggregate(typedlit(bounds.toSeq), lit(0),
        (acc, bound) => acc + when(col("k") > bound, 1).otherwise(0)))
    val localW = Window.partitionBy(col("b")).orderBy(col("k"))
    val ranked = bucketed.withColumn("lrn", row_number().over(localW).cast("long"))
    // Per-bucket prefix sums over O(rangeBuckets) rows: a triangular
    // broadcast join, NOT a window — an unpartitioned window (even
    // over 32 rows) plans as a single-partition WindowExec, and a
    // constant partition key just gets folded away.
    val counts = bucketed.groupBy(col("b")).agg(count(lit(1)).as("bc"))
    val prior = counts.toDF("b2", "bc2")
    val offsets = counts.join(broadcast(prior), col("b2") < col("b"), "left")
      .groupBy(col("b")).agg(coalesce(sum(col("bc2")), lit(0L)).as("off"))
    ranked.join(broadcast(offsets), "b")
      .withColumn("rn", col("lrn") + col("off"))
      .crossJoin(broadcast(cnt))
      .filter(col("rn") % col("w") === 0)
      .select(expr("rn div w").as("slice_id"), col("k").as("boundary_key"))
  }

  /** WHERE-clause predicates from julienne boundaries (reference
    * pipeline.py:383-398): first slice takes NULLs, last is open.
    * Returns (pred_id, predicate).
    */
  def juliennePredicates(boundaries: DataFrame, key: String): DataFrame = {
    // slice_ids are consecutive by construction, so "previous
    // boundary" is an equi-join on slice_id - 1 over the O(partitions)
    // boundary set — a broadcast join, not an unpartitioned lag window.
    val prior = boundaries.toDF("prev_id", "prev")
    val mid = boundaries
      .join(broadcast(prior), col("prev_id") === col("slice_id") - 1, "left")
      .select(
        (col("slice_id") - 1).as("pred_id"),
        when(col("prev").isNull,
          concat(lit(s"$key <= "), col("boundary_key"), lit(s" OR $key IS NULL")))
          .otherwise(concat(lit(s"$key > "), col("prev"),
            lit(s" AND $key <= "), col("boundary_key"))).as("predicate"))
    val last = boundaries
      .agg(max(col("slice_id")).as("n"), max(col("boundary_key")).as("b"))
      .select(col("n").as("pred_id"),
        concat(lit(s"$key > "), col("b")).as("predicate"))
    mid.unionAll(last)
  }

  /** Sketch-based julienne for cluster scale: the exact version's
    * global row_number sort is what dumpty pushes into the source DB
    * and is fine there, but on a 100 TB table a full sort for
    * boundary discovery is wasteful — approxQuantile reads once,
    * merges per-partition sketches on the driver, and equal-ROW
    * slicing only needs boundaries to be roughly equi-depth (slice
    * size variance just shifts a few rows between tasks).
    * Returns (slice_id, boundary_key) like the exact planner.
    */
  def julienneBoundariesApprox(df: DataFrame, key: String, rowsPerPartition: Long,
                               gridSize: Int = 512): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE pass: row count and a fine quantile grid come from the same
    // aggregate (partition count depends on the count, so per-p probs
    // would force a second scan); boundaries are then picked from the
    // grid driver-side. Grid error ≤ 1/gridSize of the row count only
    // nudges slice balance — coverage never depends on it.
    val gridProbs = (1 until gridSize).map(_.toDouble / gridSize)
    val row = df.select(col(key).cast("double").as("k"))
      .agg(count(lit(1)).as("c"),
        expr(s"percentile_approx(k, array(${gridProbs.mkString(",")}), 1000)").as("g"))
      .collect()(0)
    val rows = row.getAs[Long]("c")
    val grid = row.getSeq[Double](1)
    val p = math.max(1L, math.round(rows.toDouble / rowsPerPartition))
    if (p <= 1) return Seq.empty[(Long, Long)].toDF("slice_id", "boundary_key")
    (1L until p).map { i =>
      val gi = math.min(grid.size - 1, math.max(0,
        math.round(i.toDouble * gridSize / p).toInt - 1))
      (i, grid(gi).toLong)
    }.toDF("slice_id", "boundary_key")
  }

  /** Range partition bounds exactly as Spark's JDBC source computes
    * them (JDBCRelation.columnPartition): stride = max/n - min/n in
    * integer arithmetic; first partition absorbs NULLs.
    * Returns (partition_id, where_clause).
    */
  def rangeBounds(spark: SparkSession, stats: DataFrame, key: String,
                  rowsPerPartition: Long): DataFrame = {
    val base = stats
      .select(col("row_cnt"), col("min_key"), col("max_key"),
        greatest(lit(1L), round(col("row_cnt") / lit(rowsPerPartition.toDouble), 0).cast("long")).as("p"))
      .select(col("min_key"), col("p"),
        (expr("max_key div p") - expr("min_key div p")).as("stride"))
    base
      .select(col("min_key"), col("p"), col("stride"),
        explode(sequence(lit(0L), col("p") - 1)).as("partition_id"))
      .select(col("partition_id"),
        when(col("p") === 1, lit(s"1=1"))
          .when(col("partition_id") === 0,
            concat(lit(s"$key < "), col("min_key") + col("stride"),
                   lit(s" OR $key IS NULL")))
          .when(col("partition_id") === col("p") - 1,
            concat(lit(s"$key >= "), col("min_key") + col("partition_id") * col("stride")))
          .otherwise(concat(
            lit(s"$key >= "), col("min_key") + col("partition_id") * col("stride"),
            lit(s" AND $key < "), col("min_key") + (col("partition_id") + 1) * col("stride")))
          .as("where_clause"))
  }
}
