package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.GraftFunctions.normalizeStr

/** Column-name normalization (reference pipeline.py:167-169
  * `normalize_df`): every column aliased through normalize_str.
  * A pure projection — zero-cost in the physical plan.
  */
object SchemaNormalizer {
  def apply(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(normalizeStr(c))).toIndexedSeq: _*)
}
