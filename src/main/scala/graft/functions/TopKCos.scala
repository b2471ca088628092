package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k selection over (score, id) pairs in ONE map-side-
  * combinable partial aggregation — the k-slot generalization of
  * [[Top2Cos]], replacing the
  * `row_number().over(Window.partitionBy(query))` top-k idiom whose
  * plan SORTS the full candidate expansion before the partial
  * WindowGroupLimit (for the corpus×corpus brute rungs that is an
  * n²-row local sort — the dominant stage of q_knn_graph's plan at
  * every scale). State is two k-slot arrays ordered (score desc, id
  * asc), so the expansion collapses map-side and only per-query
  * buffers cross the exchange.
  *
  * Ordering matches the window it replaces bit-for-bit: scores
  * compare via java.lang.Double.compare — the same total order
  * (NaN greatest, -0.0 < 0.0) Spark's DESC NULLS LAST sort uses —
  * and score ties break toward the SMALLER id. Insertion and merge
  * depend only on the multiset of inputs, so partial-aggregate
  * scheduling cannot perturb the result.
  */
class TopKCos(k: Int)
    extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Seq[(Double, Long)]] {
  require(k >= 1)

  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  override def zero: (Array[Double], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray)

  private def push(b: (Array[Double], Array[Long]), s: Double,
                   id: Long): (Array[Double], Array[Long]) = {
    val (cs, ids) = b
    val n = cs.length
    if (n == k && !beats(s, id, cs(n - 1), ids(n - 1))) b
    else {
      var pos = 0
      while (pos < n && beats(cs(pos), ids(pos), s, id)) pos += 1
      val m = math.min(n + 1, k)
      val ncs = new Array[Double](m)
      val nids = new Array[Long](m)
      var i = 0
      while (i < pos) { ncs(i) = cs(i); nids(i) = ids(i); i += 1 }
      ncs(pos) = s; nids(pos) = id
      i = pos
      while (i + 1 < m) { ncs(i + 1) = cs(i); nids(i + 1) = ids(i); i += 1 }
      (ncs, nids)
    }
  }

  override def reduce(b: (Array[Double], Array[Long]),
                      a: (Double, Long)): (Array[Double], Array[Long]) =
    push(b, a._1, a._2)

  override def merge(x: (Array[Double], Array[Long]),
                     y: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    var b = x
    var i = 0
    while (i < y._1.length) { b = push(b, y._1(i), y._2(i)); i += 1 }
    b
  }

  /** Best-first (score, id) pairs, ≤ k of them. */
  override def finish(b: (Array[Double], Array[Long])): Seq[(Double, Long)] =
    b._1.toSeq.zip(b._2.toSeq)

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
}
