package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row (by time)
  * at or before it, per key — the operator Spark lacks natively.
  *
  * Composed Spark-first (preference (a) from the design rules): the
  * two sides are unioned with a side marker and a single per-key
  * window carries the right side's values forward with
  * last(ignoreNulls). One shuffle on the key, one sort — exactly a
  * sort-merge as-of, and AQE still handles key skew. No custom
  * physical operator needed because the union expresses the
  * interleave declaratively.
  *
  * Ordering inside equal timestamps: right rows sort before left
  * rows ("at or before" includes equality) and `tiebreak` makes the
  * carried value deterministic among equal right timestamps.
  */
object AsOfJoin {

  /** `tiebreak` must be a column of BOTH sides (null tiebreaks would
    * order differently across engines: Spark sorts nulls first,
    * DuckDB last).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightVals: Seq[String], tiebreak: String): DataFrame = {
    val lCols = left.columns.filterNot(_ == key)
    val l = left.select(
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__m"), col(tiebreak).as("__tb")) ++
        lCols.map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val r = right.select(
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__m"), col(tiebreak).as("__tb")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"asof_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__m"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionAll(r)
      .select(Seq(col(key), col("__ts"), col("__m")) ++ lCols.map(col) ++
        rightVals.map(c => last(col(s"asof_$c"), ignoreNulls = true).over(w).as(s"asof_$c")) :+
        sum(when(col("__m") === 0, 1L).otherwise(0L)).over(w).as("n_right_before"): _*)
    carried.filter(col("__m") === 1).drop("__m")
  }
}
