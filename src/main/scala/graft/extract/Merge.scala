package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SCD-1 upsert: merge an updates batch into a base table by key,
  * updates winning on conflicts — the incremental-load step the
  * reference sidesteps by re-extracting whole tables (its
  * "incremental" mode only *selects* changed tables, main.py:214).
  *
  * Union + per-key rank: one shuffle on the key, no join — and at
  * cluster scale the window beats a full-outer join because the
  * base side's payload never round-trips through two exchanges.
  */
object Merge {
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      "base and updates schemas must align")
    val w = Window.partitionBy(col(key)).orderBy(col("__prio"))
    base.withColumn("__prio", lit(1))
      .unionByName(updates.withColumn("__prio", lit(0)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }

  /** SCD-2 history merge (CDC-style): versions carry a `validFrom`
    * timestamp column; each key's rows are chained so `valid_to` is
    * the next version's start (NULL = current row). One shuffle on
    * the key, lead window inside — the standard dimensional-history
    * rebuild, no join.
    */
  def scd2(versions: DataFrame, key: String, validFrom: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(validFrom))
    versions
      .withColumn("valid_to", lead(col(validFrom), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
