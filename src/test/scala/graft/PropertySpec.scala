package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Pure-function properties (no Spark session): the deterministic
  * primitives the oracle parity rests on, checked over generated
  * inputs rather than fixtures.
  */
object GraftProps extends Properties("graft") {

  // --- z-curve ---------------------------------------------------------

  private def interleave(a: Long, b: Long): Long =
    (0 until 16).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  private def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L
    (0 until 16).foreach { i =>
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (a, b)
  }

  private val dim16 = Gen.choose(0L, 65535L)

  property("zValue is a bijection on 16-bit pairs") =
    forAll(dim16, dim16) { (a, b) => deinterleave(interleave(a, b)) == ((a, b)) }

  property("zValue is monotone per dimension within an octant") =
    forAll(Gen.choose(0L, 65534L), dim16) { (a, b) =>
      // raising a by 1 inside the same power-of-two block raises z
      interleave(a + 1, b) != interleave(a, b)
    }

  // --- normalization ---------------------------------------------------

  private val anyString = Gen.asciiPrintableStr

  property("normalizeStr is idempotent") = forAll(anyString) { s =>
    val once = graft.functions.GraftFunctions.normalizeStr(s)
    graft.functions.GraftFunctions.normalizeStr(once) == once
  }

  property("normalizeStr output is lowercase [a-z0-9_]") = forAll(anyString) { s =>
    graft.functions.GraftFunctions.normalizeStr(s)
      .forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_')
  }

  // --- 48-bit md5 token hash ------------------------------------------

  property("tokenHashLong stays within 48 bits and matches md5 prefix") =
    forAll(anyString) { s =>
      val h = graft.functions.GraftFunctions.tokenHashLong(s)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val ref = java.lang.Long.parseLong(
        d.take(6).map("%02x".format(_)).mkString, 16)
      h == ref && h >= 0L && h < (1L << 48)
    }

  // --- winnowing selection rule ---------------------------------------

  /** Textbook winnowing (Schleimer et al.): from every full window
    * of w consecutive hashes select the minimum, rightmost on ties;
    * fewer than w hashes → the global minimum.
    */
  private def winnowRef(hs: Seq[Long], w: Int): Set[(Int, Long)] =
    if (hs.isEmpty) Set.empty
    else if (hs.length < w) {
      val (h, i) = hs.zipWithIndex.minBy { case (h, i) => (h, -i) }
      Set((i, h))
    } else hs.zipWithIndex.sliding(w)
      .map(_.minBy { case (h, i) => (h, -i) })
      .map { case (h, i) => (i, h) }.toSet

  /** The relational encoding TextAnalysis.winnowFingerprints runs:
    * one window-min over the composite key h·2¹⁵ + (2¹⁵−1−pos),
    * decoded back to (pos, h).
    */
  private def winnowKeyed(hs: Seq[Long], w: Int): Set[(Int, Long)] = {
    val P = 32768L
    val keys = hs.zipWithIndex.map { case (h, i) => h * P + (P - 1 - i) }
    val picks =
      if (hs.isEmpty) Seq.empty
      else if (hs.length < w) Seq(keys.min)
      else (w - 1 until hs.length).map(p => keys.slice(p - w + 1, p + 1).min)
    picks.map(k => ((P - 1 - k % P).toInt, k / P)).toSet
  }

  private val hashes = Gen.listOf(Gen.choose(0L, 15L)) // tie-heavy
  private val hashesWide = Gen.listOf(Gen.choose(0L, (1L << 40) - 1))

  property("composite-key winnowing == textbook winnowing (tie-heavy)") =
    forAll(hashes, Gen.choose(2, 6)) { (hs, w) =>
      winnowKeyed(hs, w) == winnowRef(hs, w)
    }

  property("composite-key winnowing == textbook winnowing (wide hashes)") =
    forAll(hashesWide, Gen.choose(2, 6)) { (hs, w) =>
      winnowKeyed(hs, w) == winnowRef(hs, w)
    }

  property("winnowing density: selected positions at most w apart") =
    forAll(hashesWide, Gen.choose(2, 6)) { (hs, w) =>
      val ps = winnowKeyed(hs, w).map(_._1).toSeq.sorted
      Prop(ps.size < 2 || ps.sliding(2).forall { case Seq(a, b) => b - a <= w })
    }

  // --- winnow chunk-and-rekey segment arithmetic ----------------------

  /** TextAnalysis.winnowFingerprints segments long docs at stride
    * F − (W−1) with a W−1 overlap; the correctness of chunked ==
    * unbounded winnowing rests on two laws checked here over the
    * whole (F, W, S) space: every global window of W consecutive
    * positions lies wholly inside EXACTLY ONE segment (ownership is
    * a partition of the window set), and the primary+overlap
    * duplication rule places exactly the rows each segment's windows
    * need.
    */
  /** F ≥ 2W−1 ⇔ stride ≥ W−1: the single-neighbor duplication rule
    * is only sound when a segment overlaps at most its immediate
    * successor (the generator found the violation below 2W−1 — the
    * production constants sit at F = 32768 ≫ 2W−1 = 7, and the
    * operator docstring states the precondition).
    */
  private val fws = for {
    w <- Gen.choose(2, 6)
    f <- Gen.choose(2 * w - 1, 64)
    s <- Gen.choose(1, 400)
  } yield (f.toLong, w, s)

  property("winnow segmentation: every window owned by exactly one segment") =
    forAll(fws) { case (f, w, nPos) =>
      val stride = f - (w - 1)
      val owners = (w - 1 until nPos).map { p =>
        // segments whose range [i*stride, i*stride+f) contains the
        // whole window [p-w+1, p]
        (0 to nPos / stride.toInt + 1).count(i =>
          i * stride <= p - w + 1 && p < i * stride + f)
      }
      Prop(owners.forall(_ == 1))
    }

  property("winnow segmentation: duplication rule == segment row needs") =
    forAll(fws) { case (f, w, nPos) =>
      val stride = f - (w - 1)
      (0 until nPos).forall { p =>
        val primary = Set(p / stride.toInt)
        val overlap =
          if (p % stride < w - 1 && p >= stride) Set(p / stride.toInt - 1)
          else Set.empty[Int]
        val needed = (0 to nPos / stride.toInt + 1)
          .filter(i => i * stride <= p && p < i * stride + f).toSet
        (primary ++ overlap) == needed
      }
    }

  // --- integer bit-length log (NB classifier) --------------------------

  // the classifier's L(x) = strlen(bin(x²)): check the encoding law
  // the operator's cross-engine exactness rests on — L is the bit
  // length of x² (2^(L-1) <= x² < 2^L, i.e. floor(2·log2 x)+1) and
  // monotone, over the full domain the docstring bounds (x² < 2^63)
  private val posLong = Gen.choose(1L, 3000000000L)

  property("bit-length log is the exact bit count of x^2 and monotone") =
    forAll(posLong, posLong) { (x, y) =>
      def bl(v: Long) = java.lang.Long.toBinaryString(v * v).length
      val exactBits = 64 - java.lang.Long.numberOfLeadingZeros(x * x)
      (bl(x) == exactBits) && (x > (1L << 31) ||
        (BigInt(2).pow(bl(x) - 1) <= BigInt(x) * x && BigInt(x) * x < BigInt(2).pow(bl(x)))) &&
        (x > y || bl(x) <= bl(y))
    }

  // --- minhash sketch algebra ------------------------------------------

  private val hpList = Gen.nonEmptyListOf(Gen.choose(0L, 1000000006L))

  property("minhash sketch of a union is the componentwise min of part sketches") =
    forAll(hpList, hpList) { (a, b) =>
      import graft.operators.Dedup.{A, B, NumPerm}
      val p = graft.functions.GraftFunctions.HashP
      def sig(hs: List[Long]): Seq[Long] =
        (0 until NumPerm).map(k => hs.map(h => (h * A(k) + B(k)) % p).min)
      sig(a ++ b) == sig(a).lazyZip(sig(b)).map(math.min)
    }

  // --- Misra-Gries heavy-hitter sketch --------------------------------

  // Skewed streams over a small alphabet with k << alphabet, so the
  // eviction path (the part the fixture corpus never exercises at
  // MgK = 2048) runs on every generated case.
  private val mgStream: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.const("hot"),
      4 -> Gen.oneOf("warm1", "warm2"),
      1 -> Gen.choose(0, 200).map(i => s"cold$i")))

  property("misra-gries estimates undercount by at most n/k") =
    forAll(mgStream, Gen.choose(2, 8)) { (xs, k) =>
      val est = graft.operators.CorpusOps.misraGries(xs.iterator, k)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      Prop(est.size <= k) :| "at most k counters" &&
        Prop(est.forall { case (t, e) =>
          val c = exact.getOrElse(t, 0L)
          e <= c && c - e <= xs.size.toLong / k
        }) :| "each estimate in [exact - n/k, exact]"
    }

  property("misra-gries keeps every item with count > n/k") =
    forAll(mgStream, Gen.choose(2, 8)) { (xs, k) =>
      val est = graft.operators.CorpusOps.misraGries(xs.iterator, k)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (t, c) => c * k <= xs.size || est.contains(t) }
    }

  property("merged partition sketches cover the global frequent set") =
    forAll(mgStream, mgStream, mgStream, Gen.choose(2, 8)) { (a, b, c, k) =>
      // union-sum of per-partition sketches: summed estimate >=
      // C - N/k, so any item with global count > N/k survives — the
      // exact superset guarantee qHeavyHitters' confirm pass rests on
      val parts = List(a, b, c)
      val n = parts.map(_.size.toLong).sum
      val merged = parts.map(p => graft.operators.CorpusOps.misraGries(p.iterator, k))
        .flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      val exact = parts.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (t, cnt) => cnt * k <= n || merged.getOrElse(t, 0L) > 0L }
    }

  property("compressMg keeps <= k items, underestimates, bounded loss") =
    forAll(mgStream, Gen.choose(2, 8)) { (xs, k) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      val z = graft.operators.CorpusOps.compressMg(exact, k)
      Prop(z.size <= k) :| "at most k" &&
        Prop(z.forall { case (t, e) => e <= exact(t) }) :| "underestimates" &&
        Prop(exact.forall { case (t, c) =>
          c * (k + 1) <= n || z.contains(t)
        }) :| "items with count > n/(k+1) survive compression"
    }

  property("candidateBound: threshold covers the frequent set across any partition split") =
    forAll(mgStream, mgStream, mgStream) { (a, b, c) =>
      // with the PRODUCTION constants (MgK, HhShare): merged est >=
      // exact - n/MgK, so est >= candidateBound(n) for every term with
      // exact count >= n/HhShare — the filter qHeavyHitters broadcasts
      // behind never drops a frequent term, at any partition count
      import graft.operators.CorpusOps
      val parts = List(a, b, c)
      val n = parts.map(_.size.toLong).sum
      val merged = parts.map(p => CorpusOps.misraGries(p.iterator, CorpusOps.MgK))
        .flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      val exact = parts.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      val bound = CorpusOps.candidateBound(n)
      Prop(exact.forall { case (t, cnt) =>
        cnt * CorpusOps.HhShare < n || merged.getOrElse(t, 0L) >= bound
      }) :| "every frequent term reaches the broadcast threshold" &&
        Prop(merged.values.sum <= n) :| "merged estimates sum <= n (the survivor-count law's premise)"
    }

  // --- julienne predicate coverage ------------------------------------

  // --- packed-register elementwise max (HyperBall production fold) -----

  private val regArray: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](64, Gen.choose[Byte](0, 59))

  property("MaxRegs merge is commutative, associative, idempotent, identity at zero") =
    forAll(regArray, regArray, regArray) { (a, b, c) =>
      import graft.functions.MaxRegs
      def m(x: Array[Byte], y: Array[Byte]) = MaxRegs.merge(x.clone(), y.clone())
      val comm = m(a, b).sameElements(m(b, a))
      val assoc = m(m(a, b), c).sameElements(m(a, m(b, c)))
      val idem = m(a, a).sameElements(a)
      val ident = m(MaxRegs.zero, a).sameElements(a) &&
        m(a, MaxRegs.zero).sameElements(a)
      // and it IS the register law: elementwise max of the HLL
      // registers of two sets equals the registers of their union
      val law = m(a, b).zip(a.zip(b)).forall { case (g, (x, y)) =>
        g == math.max(x, y).toByte }
      Prop(comm && assoc && idem && ident && law)
    }

  property("MaxRegs never aliases an input array into its buffer") =
    forAll(regArray) { a =>
      import graft.functions.MaxRegs
      val buf = MaxRegs.merge(MaxRegs.zero, a) // first non-empty input
      buf(0) = (buf(0) + 1).toByte             // mutate the buffer
      Prop(buf ne a) :| "buffer must be a copy, not the input"
    }

  property("julienne-style predicates partition any boundary list") = {
    val boundaries = Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))
      .map(_.distinct.sorted)
    forAll(boundaries, Gen.choose(-1100L, 1100L)) { (bs, k) =>
      // first slice: k <= b0; middle: prev < k <= b; last: k > bMax —
      // every key must land in exactly one slice
      val hits = (bs.indices.map { i =>
        if (i == 0) k <= bs(0) else k > bs(i - 1) && k <= bs(i)
      } :+ (k > bs.last)).count(identity)
      Prop(hits == 1) :| s"k=$k boundaries=$bs hits=$hits"
    }
  }
}
