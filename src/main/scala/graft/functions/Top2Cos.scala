package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Best / second-best selection over (score, id) pairs in ONE
  * map-side-combinable partial aggregation — the replacement for the
  * `row_number().over(Window.partitionBy(key))` top-2 idiom, which
  * shuffles and per-key-sorts the FULL expansion (n×C rows for the
  * silhouette audit; SCALE_r10 measured that window at 16.2× for 10×
  * rows). This buffer keeps exactly two (score, id) slots, so the
  * n×C expansion collapses map-side and only n tiny buffers cross
  * the exchange.
  *
  * Ordering matches the window it replaces: higher score wins; score
  * ties break toward the SMALLER id (the window ordered
  * `score desc, id asc`). Merge is associative and commutative —
  * top-2 of a union depends only on the set, not arrival order — so
  * partial-aggregate scheduling cannot perturb the result.
  */
object Top2Cos extends Aggregator[(Double, Long), (Double, Long, Double, Long, Int), (Long, Double, Double, Int)] {
  private val NoScore = Double.NegativeInfinity

  override def zero: (Double, Long, Double, Long, Int) = (NoScore, 0L, NoScore, 0L, 0)

  private def beats(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 > s2 || (s1 == s2 && id1 < id2)

  private def push(b: (Double, Long, Double, Long, Int), s: Double, id: Long) = {
    val (c1, i1, c2, i2, n) = b
    if (n == 0) (s, id, NoScore, 0L, 1)
    else if (beats(s, id, c1, i1)) (s, id, c1, i1, math.min(n + 1, 2))
    else if (n == 1 || beats(s, id, c2, i2)) (c1, i1, s, id, math.min(n + 1, 2))
    else b
  }

  override def reduce(b: (Double, Long, Double, Long, Int), a: (Double, Long)): (Double, Long, Double, Long, Int) =
    push(b, a._1, a._2)

  override def merge(x: (Double, Long, Double, Long, Int), y: (Double, Long, Double, Long, Int)): (Double, Long, Double, Long, Int) = {
    var b = x
    if (y._5 >= 1) b = push(b, y._1, y._2)
    if (y._5 >= 2) b = push(b, y._3, y._4)
    b
  }

  /** (best_id, best_score, second_score, n_seen∈{0,1,2}) — callers
    * must treat second_score as absent when the count field < 2 (a
    * nullable Option output would need an ExpressionEncoder with an
    * Option field; the count flag keeps the encoder a flat tuple).
    */
  override def finish(b: (Double, Long, Double, Long, Int)): (Long, Double, Double, Int) =
    (b._2, b._1, b._3, b._5)

  override def bufferEncoder: Encoder[(Double, Long, Double, Long, Int)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong,
      Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaInt)

  override def outputEncoder: Encoder[(Long, Double, Double, Int)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
      Encoders.scalaDouble, Encoders.scalaInt)
}
