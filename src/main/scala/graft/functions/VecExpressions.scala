package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the quantized-vector dot product.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * allocates an intermediate array per row and evaluates interpreted
  * (higher-order functions are CodegenFallback), which dominates the
  * runtime of the pairwise-similarity joins. This expression emits a
  * tight primitive loop inside whole-stage codegen instead; the
  * interpreted path (nullSafeEval) computes the identical left-to-
  * right int64 sum, so results are bit-equal either way.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_array_dot expects two array<bigint>, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Asymmetric-distance (ADC) lookup sum for product quantization:
  * given a vector's PQ codes (array<bigint>, one code per subspace)
  * and a query's flattened distance lookup table (array<bigint>,
  * laid out [subspace][code] with `k` codes per subspace), returns
  * sum over subspaces m of lut[m*k + codes[m]] — the classic PQ
  * search inner loop. A native expression for the same reason as
  * LongArrayDot: the HOF spelling (indexed transform + element_at +
  * aggregate) is interpreted, allocates per row, and chained-HOF
  * forms are corruption-prone on Spark 4.1; this emits one tight
  * primitive loop inside whole-stage codegen, and the interpreted
  * eval computes the identical sum.
  */
case class PqAdcSum(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_sum expects two array<bigint> and k > 0, got ${left.dataType} / ${right.dataType} / k=$k")
    }
  }

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    var s = 0L
    var m = 0
    val n = codes.numElements()
    while (m < n) { s += lut.getLong(m * k + codes.getLong(m).toInt); m += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      s"""
         |int $n = $codes.numElements();
         |${ev.value} = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  ${ev.value} += $lut.getLong($m * $k + (int) $codes.getLong($m));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Map-side nearest-centroid assignment: given a quantized vector
  * (array<bigint>), its squared norm, and the FULL centroid table as
  * one array<struct<cid:bigint, cq:array<bigint>, cnq:bigint>>
  * column (a 1-row collect_list broadcast — the same O(C·Dim) bytes
  * the broadcast hash join shipped), returns
  * struct<cid:bigint, ccos:double> of the argmax-cosine centroid
  * with the (ccos desc, cid asc) tie-break.
  *
  * This replaces the explode-to-n×C-rows + groupBy(vec_id) argmax:
  * that plan's agg exchange hash-partitioned the corpus by vec_id
  * carrying q/nq ARRAYS in the max_by buffer — the `arrexch` rows
  * the r10 plan audit flagged on the IVF build path. Here the argmax
  * is one codegen'd loop per corpus row: ZERO exchanges, no row
  * expansion, vectors never shuffle. The comparison order is
  * value-independent of centroid array order (strict better-than
  * with the cid tie-break), so collect_list nondeterminism cannot
  * perturb the result; the interpreted eval computes the identical
  * doubles left-to-right.
  */
case class NearestCentroid(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cid", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ccos",
      org.apache.spark.sql.types.DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), LongType) => third.dataType match {
        case ArrayType(org.apache.spark.sql.types.StructType(fs), _) =>
          fs.length == 3 && fs(0).dataType == LongType &&
            fs(1).dataType.isInstanceOf[ArrayType] && fs(2).dataType == LongType
        case _ => false
      }
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects (array<bigint>, bigint, array<struct<bigint,array<bigint>,bigint>>), " +
        s"got ${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  override def nullSafeEval(qAny: Any, nqAny: Any, centsAny: Any): Any = {
    val q = qAny.asInstanceOf[ArrayData]
    val nq = nqAny.asInstanceOf[Long]
    val cents = centsAny.asInstanceOf[ArrayData]
    var bestCid = -1L
    var bestCos = Double.NegativeInfinity
    val sqrtNq = math.sqrt(nq.toDouble)
    var ci = 0
    val nc = cents.numElements()
    while (ci < nc) {
      val c = cents.getStruct(ci, 3)
      val cid = c.getLong(0)
      val cq = c.getArray(1)
      val cnq = c.getLong(2)
      var dot = 0L
      var i = 0
      val n = math.min(q.numElements(), cq.numElements())
      while (i < n) { dot += q.getLong(i) * cq.getLong(i); i += 1 }
      val ccos = dot.toDouble / (sqrtNq * math.sqrt(cnq.toDouble))
      if (ccos > bestCos || (ccos == bestCos && cid < bestCid)) {
        bestCos = ccos; bestCid = cid
      }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCid, bestCos))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, nq, cents) => {
      val ci = ctx.freshName("ci"); val nc = ctx.freshName("nc")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val ccos = ctx.freshName("ccos")
      val bestCid = ctx.freshName("bestCid"); val bestCos = ctx.freshName("bestCos")
      val sqrtNq = ctx.freshName("sqrtNq")
      val c = ctx.freshName("c"); val cq = ctx.freshName("cq")
      val cid = ctx.freshName("cid"); val cnq = ctx.freshName("cnq")
      s"""
         |long $bestCid = -1L;
         |double $bestCos = Double.NEGATIVE_INFINITY;
         |double $sqrtNq = java.lang.Math.sqrt((double) $nq);
         |int $nc = $cents.numElements();
         |for (int $ci = 0; $ci < $nc; $ci++) {
         |  InternalRow $c = $cents.getStruct($ci, 3);
         |  long $cid = $c.getLong(0);
         |  ArrayData $cq = $c.getArray(1);
         |  long $cnq = $c.getLong(2);
         |  long $dot = 0L;
         |  int $n = java.lang.Math.min($q.numElements(), $cq.numElements());
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $q.getLong($i) * $cq.getLong($i);
         |  }
         |  double $ccos = (double) $dot / ($sqrtNq * java.lang.Math.sqrt((double) $cnq));
         |  if ($ccos > $bestCos || ($ccos == $bestCos && $cid < $bestCid)) {
         |    $bestCos = $ccos; $bestCid = $cid;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestCid, $bestCos});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Top-k nearest centroids, map-side — the probe-list twin of
  * [[NearestCentroid]]: returns the k best (ccos desc, cid asc)
  * centroids as array<struct<cid, ccos>>, best first. Replaces the
  * per-query `row_number().over(partitionBy(query))` top-nprobe
  * window, whose exchange shipped query×C rows WITH the query
  * vectors (the probe-side `arrexch` residue when the query set is
  * corpus-sized). Insertion into k slots is order-independent under
  * the strict comparator, so centroid array order cannot perturb the
  * result. k is bounded by nprobe (≤ C by clamping).
  */
case class NearestCentroidsK(first: Expression, second: Expression,
                             third: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val elem = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cid", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ccos",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def dataType: DataType = ArrayType(elem, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    NearestCentroid(first, second, third).checkInputDataTypes() match {
      case r if !r.isSuccess => r
      case r if k <= 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids_k expects k > 0, got $k")
      case r => r
    }

  override def nullSafeEval(qAny: Any, nqAny: Any, centsAny: Any): Any = {
    val q = qAny.asInstanceOf[ArrayData]
    val nq = nqAny.asInstanceOf[Long]
    val cents = centsAny.asInstanceOf[ArrayData]
    val nc = cents.numElements()
    val kk = math.min(k, nc)
    val bc = new Array[Double](kk); val bi = new Array[Long](kk)
    var filled = 0
    val sqrtNq = math.sqrt(nq.toDouble)
    var ci = 0
    while (ci < nc) {
      val c = cents.getStruct(ci, 3)
      val cid = c.getLong(0)
      val cq = c.getArray(1)
      val cnq = c.getLong(2)
      var dot = 0L
      var i = 0
      val n = math.min(q.numElements(), cq.numElements())
      while (i < n) { dot += q.getLong(i) * cq.getLong(i); i += 1 }
      val ccos = dot.toDouble / (sqrtNq * math.sqrt(cnq.toDouble))
      // insertion: find slot where (ccos, cid) beats the incumbent
      var pos = filled
      while (pos > 0 && (ccos > bc(pos - 1) ||
          (ccos == bc(pos - 1) && cid < bi(pos - 1)))) pos -= 1
      if (pos < kk) {
        val last = math.min(filled, kk - 1)
        var j = last
        while (j > pos) { bc(j) = bc(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bc(pos) = ccos; bi(pos) = cid
        if (filled < kk) filled += 1
      }
      ci += 1
    }
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bi(j), bc(j)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Pack a quantized vector (array<bigint>, every component known to
  * fit int32 — the 1e6-scale quantization of unit-ish embeddings
  * stays under ±2.1e9 by three orders of magnitude) into a
  * big-endian 4-byte-per-component binary blob. HALVES the bytes a
  * vector-carrying shuffle ships versus array<bigint> (and drops the
  * per-element array header), for exchanges whose downstream only
  * ever needs dot products ([[PackedIntDot]]) — the semDedup
  * within-cluster pair join. Throws on a component outside int32
  * rather than corrupting silently.
  */
case class PackLongsToInts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_longs_to_ints expects array<bigint>, got $t")
    }

  override def nullSafeEval(aAny: Any): Any =
    PackLongsToInts.pack(aAny.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.PackLongsToInts.pack($a)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PackLongsToInts {
  def pack(x: ArrayData): Array[Byte] = {
    val n = x.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      if (v > Int.MaxValue || v < Int.MinValue)
        throw new IllegalArgumentException(
          s"pack_longs_to_ints: component $v exceeds int32 (quantization contract)")
      val w = v.toInt
      out(i * 4) = (w >>> 24).toByte
      out(i * 4 + 1) = (w >>> 16).toByte
      out(i * 4 + 2) = (w >>> 8).toByte
      out(i * 4 + 3) = w.toByte
      i += 1
    }
    out
  }

  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length) / 4
    var s = 0L
    var i = 0
    while (i < n) {
      val x = ((a(i * 4) & 0xff) << 24) | ((a(i * 4 + 1) & 0xff) << 16) |
        ((a(i * 4 + 2) & 0xff) << 8) | (a(i * 4 + 3) & 0xff)
      val y = ((b(i * 4) & 0xff) << 24) | ((b(i * 4 + 1) & 0xff) << 16) |
        ((b(i * 4 + 2) & 0xff) << 8) | (b(i * 4 + 3) & 0xff)
      s += x.toLong * y.toLong
      i += 1
    }
    s
  }
}

/** Exact int64 dot product over two [[PackLongsToInts]]-packed
  * vectors — bit-identical to [[LongArrayDot]] over the unpacked
  * arrays (same left-to-right int64 sum on the same components).
  */
case class PackedIntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType, org.apache.spark.sql.types.BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"packed_int_dot expects two binary, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PackLongsToInts.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PackLongsToInts.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-row julienne-predicate match count: given a (possibly null)
  * long key and the parsed (lo, hi] interval bounds of the rendered
  * predicates (null lo = the first slice's open lower end, whose
  * predicate also admits NULL keys; null hi = the open last slice),
  * counts how many predicates the row satisfies — the coverage audit
  * of q_julienne_approx.
  *
  * A native expression for the same reason as [[LongArrayDot]]: the
  * composable forms are pathological at this predicate count — one
  * when(expr(p)).sum per predicate generates O(N) Java source per
  * FRESH plan (~2.9 s of Janino per bench sample at N≈150, measured),
  * and the `aggregate(typedlit(...))` fold is a CodegenFallback
  * higher-order function (~3.4 s interpreted at 150k rows × 150
  * intervals, measured). This loop is ~40 lines of generated code
  * regardless of N and runs inside whole-stage codegen; the
  * interpreted eval computes the identical count.
  */
case class IntervalMatchCount(first: Expression, second: Expression,
                              third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"interval_match_count expects (bigint, array<bigint>, array<bigint>), " +
            s"got ${first.dataType} / ${second.dataType} / ${third.dataType}")
    }

  // custom eval (not nullSafeEval): a NULL key is legitimate input —
  // it matches exactly the predicates carrying the IS NULL clause
  // (the null-lo slices), like the rendered SQL text does.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val los = second.eval(input).asInstanceOf[ArrayData]
    val his = third.eval(input).asInstanceOf[ArrayData]
    val kAny = first.eval(input)
    val n = los.numElements()
    var c = 0
    var i = 0
    if (kAny == null) {
      while (i < n) { if (los.isNullAt(i)) c += 1; i += 1 }
    } else {
      val k = kAny.asInstanceOf[Long]
      while (i < n) {
        val loN = los.isNullAt(i)
        val hiN = his.isNullAt(i)
        val m =
          if (loN) hiN || k <= his.getLong(i)
          else if (hiN) k > los.getLong(i)
          else k > los.getLong(i) && k <= his.getLong(i)
        if (m) c += 1
        i += 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kGen = first.genCode(ctx)
    val loGen = second.genCode(ctx)
    val hiGen = third.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val loN = ctx.freshName("loN")
    val hiN = ctx.freshName("hiN")
    val m = ctx.freshName("m")
    val kv = ctx.freshName("kv")
    val body =
      s"""
         |${kGen.code}
         |${loGen.code}
         |${hiGen.code}
         |int ${ev.value} = 0;
         |int $n = ${loGen.value}.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $loN = ${loGen.value}.isNullAt($i);
         |  boolean $hiN = ${hiGen.value}.isNullAt($i);
         |  if (${kGen.isNull}) {
         |    if ($loN) ${ev.value}++;
         |  } else {
         |    long $kv = ${kGen.value};
         |    boolean $m = $loN
         |      ? ($hiN || $kv <= ${hiGen.value}.getLong($i))
         |      : ($hiN ? $kv > ${loGen.value}.getLong($i)
         |              : ($kv > ${loGen.value}.getLong($i)
         |                 && $kv <= ${hiGen.value}.getLong($i)));
         |    if ($m) ${ev.value}++;
         |  }
         |}
       """.stripMargin
    ev.copy(code = code"$body",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object VecExpressions {
  import org.apache.spark.sql.GraftColumnBridge

  def longArrayDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LongArrayDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def nearestCentroid(q: Column, nq: Column, cents: Column): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(q),
        GraftColumnBridge.expression(nq), GraftColumnBridge.expression(cents)))

  def nearestCentroidsK(q: Column, nq: Column, cents: Column, k: Int): Column =
    GraftColumnBridge.column(
      NearestCentroidsK(GraftColumnBridge.expression(q),
        GraftColumnBridge.expression(nq), GraftColumnBridge.expression(cents), k))

  def packQ(q: Column): Column =
    GraftColumnBridge.column(PackLongsToInts(GraftColumnBridge.expression(q)))

  def packedDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      PackedIntDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def pqAdcSum(codes: Column, lut: Column, k: Int): Column =
    GraftColumnBridge.column(
      PqAdcSum(GraftColumnBridge.expression(codes), GraftColumnBridge.expression(lut), k))

  def intervalMatchCount(key: Column, los: Column, his: Column): Column =
    GraftColumnBridge.column(
      IntervalMatchCount(GraftColumnBridge.expression(key),
        GraftColumnBridge.expression(los), GraftColumnBridge.expression(his)))
}
