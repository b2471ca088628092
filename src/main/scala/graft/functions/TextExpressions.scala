package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native word-n-gram shingle hashing: array<string> tokens →
  * array<bigint> of 48-bit md5-prefix hashes of each n-token
  * shingle (concatenated with no separator).
  *
  * Bit-equal to the composable form
  *   transform(tokens, window) |> md5 |> conv(hex[0:12], 16, 10)
  * and to the DuckDB oracle's
  *   ('0x' || substr(md5(s), 1, 12))::BIGINT
  * — md5 over the concatenated UTF-8 bytes, first 6 digest bytes
  * big-endian — but runs as one tight per-row loop with a reused
  * MessageDigest instead of an interpreted lambda chain per shingle
  * (HOF lambdas are CodegenFallback and were the dominant cost of
  * the dedup pipeline), and sidesteps the Spark 4.1 lambda-rebinding
  * corruption documented on GraftFunctions.shingleHashes.
  */
case class ShingleHash48(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash48 expects array<string>, got $other")
  }

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < n) {
        val t = arr.getUTF8String(i + j)
        if (t != null) md.update(t.getBytes)
        j += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 48-bit SimHash of a token array in one narrow pass: per token,
  * the md5-prefix hash votes ±1 on each bit; bits with positive
  * totals are set. Bit-equal to the explode-tokens + per-bit-sum
  * formulation (the DuckDB oracle) but requires NO shuffle at all —
  * the signature is a pure function of the row.
  */
case class SimHash48(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash48 expects array<string>, got $other")
  }

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](48)
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        md.reset()
        md.update(t.getBytes)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
        var b = 0
        while (b < 48) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode NFC normalization (java.text.Normalizer — in the JDK):
  * the canonical-composition pass a text pipeline runs before any
  * hashing/dedup, because byte-distinct encodings of the same
  * rendered text ("e"+U+0301 vs U+00E9) would otherwise defeat
  * exact dedup and split token statistics. Spark has no builtin;
  * a native expression keeps it codegen'd (the UDF alternative
  * would break the whole-stage span of the cleaning pipeline).
  * Cross-engine: DuckDB's nfc_normalize (utf8proc) produces the
  * same canonical composition — the oracle compares md5s of the
  * normalized bytes.
  */
case class UnicodeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"unicode_nfc expects string, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    UnicodeNfc.nfc(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                         ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeNfc.nfc($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnicodeNfc {
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    // fast path: already composed (the overwhelmingly common case)
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TextExpressions {
  import org.apache.spark.sql.GraftColumnBridge

  def shingleHash48(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHash48(GraftColumnBridge.expression(tokens), n))

  def unicodeNfc(c: Column): Column =
    GraftColumnBridge.column(UnicodeNfc(GraftColumnBridge.expression(c)))

  def simHash48(tokens: Column): Column =
    GraftColumnBridge.column(SimHash48(GraftColumnBridge.expression(tokens)))
}
