package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate: exact weighted mean over 2-decimal values
  * and weights (the test data's money/quantity domain).
  *
  * Buffers are scaled int64 (value·weight has ≤ 4 true decimals →
  * ×1e4 is exact; weights ≤ 2 decimals → ×1e2), so partial-aggregate
  * merge order cannot perturb the result — the property a plain
  * double-sum Aggregator would lose under repartitioning, and the
  * reason the DuckDB oracle matches bit-for-bit. Demonstrates the
  * `Aggregator[IN, BUF, OUT]` API registered both as a Column
  * function and a SQL UDAF (see OperatorsSpec / qWeightedAvg).
  */
object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
    (b._1 + math.round(a._1 * a._2 * 10000.0), b._2 + math.round(a._2 * 100.0))

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) Double.NaN
    else (b._1.toDouble / 10000.0) / (b._2.toDouble / 100.0)

  override def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)

  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
