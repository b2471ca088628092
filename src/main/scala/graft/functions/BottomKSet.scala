package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded bottom-k DISTINCT-value aggregator — the KMV synopsis
  * builder (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07). State is
  * a sorted, duplicate-free array of at most k longs, so the partial
  * aggregate is O(k) per task regardless of group cardinality — the
  * map-side-combinable replacement for both
  * `row_number().over(Window.partitionBy(g))` (shuffles + per-key
  * sorts the FULL distinct mass; skew-prone when one group owns
  * billions of distinct values) and `collect_set` (unbounded state).
  *
  * Correctness of the trim under partial aggregation is the KMV
  * merge law: keep-k-smallest-distinct commutes with multiset union
  * (min-k of A ∪ B depends only on min-k of A and min-k of B), so
  * partial-aggregate scheduling cannot perturb the result, and the
  * same array merges across shards/days with no coordination —
  * exactly the HLL-register posture, but yielding an estimator for
  * INTERSECTION cardinality too (ρ·D̂ over the unioned synopsis),
  * which HLL alone cannot give.
  */
class BottomKSet(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 1)

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert one value: binary-search for the slot; drop duplicates
    * and values past a full buffer's max. O(log k) search + O(k)
    * shift only when the value actually lands.
    */
  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, v)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (ins >= k) b // larger than a full buffer's max
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Sorted-merge two synopses, dropping duplicates, keeping the k
    * smallest — one O(|x|+|y|) pass.
    */
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
        else { val t = y(j); j += 1; t }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
