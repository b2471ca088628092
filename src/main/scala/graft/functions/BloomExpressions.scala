package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst form of `BloomFilter.mightContainLong` (r6 verdict
  * #4): the membership test over the broadcast bit array as a
  * whole-stage-codegen expression instead of a boxed Scala UDF. The
  * bloom prefilter sits on the FULL-corpus-scan side of the
  * decontamination screen — exactly where per-row boxing (Long →
  * java.lang.Long → lambda call) costs the most — and this was the
  * one remaining hot-path UDF in the codebase.
  *
  * The bit array, hash count and seed are lifted out of the sketch's
  * V2 serialized form once at plan time; eval and codegen replicate
  * `BloomFilterImplV2.scatterHashAndGetAllBits` exactly: h1/h2 =
  * chained Murmur3_x86_32 long hashes, combined = h1·(2³¹−1) then
  * +h2 per probe in LONG arithmetic, sign-flip, index mod bitSize
  * into the word array. Bit-identical to the sketch — FunctionsSpec
  * pins it point-for-point against `mightContainLong` on both the
  * codegen and interpreted paths, and CurationSpec pins the screen's
  * output ≡ the exact screen at every fpp.
  */
case class BloomMightContainLong(child: Expression, words: Array[Long],
                                 numHash: Int, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if words.nonEmpty && numHash > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long expects bigint with a non-empty filter, got $other")
  }

  private def bitSize: Long = words.length.toLong * 64L

  override def nullSafeEval(input: Any): Any = {
    val item = input.asInstanceOf[Long]
    val h1 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(item, seed)
    val h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(item, h1)
    var combined = h1.toLong * Int.MaxValue.toLong
    var i = 0
    while (i < numHash) {
      combined += h2.toLong
      val idx = (if (combined < 0) ~combined else combined) % bitSize
      if ((words((idx >>> 6).toInt) & (1L << idx)) == 0L) return false
      i += 1
    }
    true
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, item => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val comb = ctx.freshName("comb")
      val idx = ctx.freshName("idx")
      s"""
         |int $h1 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong($item, $seed);
         |int $h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong($item, $h1);
         |long $comb = ((long) $h1) * 2147483647L;
         |${ev.value} = true;
         |for (int $i = 0; $i < $numHash; $i++) {
         |  $comb += (long) $h2;
         |  long $idx = ($comb < 0 ? ~$comb : $comb) % ${bitSize}L;
         |  if (($w[(int) ($idx >>> 6)] & (1L << $idx)) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  import org.apache.spark.sql.GraftColumnBridge

  /** (bit words, hash count, seed) lifted from the sketch's V2
    * serialized form — the only public, version-pinned view of its
    * internals. Spark 4 writes V2 (seeded long-arithmetic scatter);
    * anything else is rejected loudly rather than mis-hashed.
    */
  def bloomParts(bf: BloomFilter): (Array[Long], Int, Int) = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
    val version = in.readInt()
    require(version == 2, s"unsupported bloom sketch version $version (expected V2)")
    val numHash = in.readInt()
    val seed = in.readInt()
    val numWords = in.readInt()
    val words = Array.fill(numWords)(in.readLong())
    (words, numHash, seed)
  }

  def bloomMightContainLong(h: Column, bf: BloomFilter): Column = {
    val (words, numHash, seed) = bloomParts(bf)
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(h), words, numHash, seed))
  }
}
