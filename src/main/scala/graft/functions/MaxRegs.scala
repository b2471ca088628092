package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Elementwise max over fixed-width packed HLL register arrays — the
  * fold that lets HyperBall keep ONE 64-byte binary row per node
  * instead of 64 (v, bucket, rank) rows (the r11 verdict's named
  * fix: at 1e10-node graphs the 64× row count is the constant
  * factor that hurts first). Registers are trailing-zero ranks
  * (≤ 59 < 127), so signed-byte comparison is exact. max is
  * idempotent, commutative and associative, so partial-aggregate
  * scheduling cannot perturb the result and the packed iteration
  * stays bit-equal to the long-format registers (GraphSpec pins it).
  *
  * Empty array = identity (the aggregator zero); all real inputs
  * share one width. The buffer is mutated in place on the hot path;
  * the first non-empty input is cloned so an input row's backing
  * bytes are never aliased into the buffer.
  */
object MaxRegs extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Array.emptyByteArray

  private def mx(into: Array[Byte], from: Array[Byte]): Array[Byte] =
    if (from == null || from.isEmpty) into
    else if (into.isEmpty) from.clone()
    else {
      var i = 0
      while (i < into.length) {
        if (from(i) > into(i)) into(i) = from(i)
        i += 1
      }
      into
    }

  override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = mx(b, a)
  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = mx(x, y)
  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
