package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Relational, Sampling, Similarity, TextAnalysis}
import graft.sources.Tables

/** Round-3 surface: curation ops (scrub / chunk dedup / mixture),
  * trained IVF + rerank, and the new relational ops (binned range
  * join, gap-fill, set ops).
  */
class CurationSpec extends AnyFunSuite {
  import SparkSuite._

  test("html strip removes chrome, decodes entities, preserves the body text") {
    import spark.implicits._
    val rows = Curation.qHtmlStrip(spark, sf).collect()
    assert(rows.nonEmpty)
    // the injected chrome is exactly 18 tags per doc (word-soup text
    // carries no '<'), and the body must survive extraction verbatim
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tags") == 18L, s"tag count at ${r.getLong(0)}")
      assert(r.getAs[Long]("body_ok") == 1L, s"body lost at ${r.getLong(0)}")
    }
    // end-to-end on a crafted page: entities decode exactly once,
    // script/style bodies vanish, whitespace collapses
    val crafted = Seq((1L, "alpha beta", "src1"))
      .toDF("doc_id", "text", "source")
    val clean = crafted
      .select(Curation.htmlStrip(concat(
        lit("<div>Home &amp;amp; x</div><script>var a=1;</script>"),
        lit("<style>b{}</style>\n<p>alpha   beta</p>"))).as("c"))
      .head.getString(0)
    assert(clean == "Home &amp; x alpha beta",
      s"literal &amp;lt; must not double-decode: '$clean'")
  }

  test("source drift equals a driver-side exact replay") {
    import graft.functions.GraftFunctions.tokenHashLong
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (src, t) =>
      t.trim.toLowerCase.split("\\s+").map(w => (src, tokenHashLong(w)))
    }
    val nTot = toks.length.toLong
    val cc = toks.groupBy(_._2).map { case (h, xs) => h -> xs.length.toLong }
    val totalPc = cc.values.map(c => c * 1000000000L / nTot).sum
    val bySrc = toks.groupBy(_._1)
    val expect = bySrc.map { case (src, xs) =>
      val nS = xs.length.toLong
      val sc = xs.groupBy(_._2).map { case (h, ys) => h -> ys.length.toLong }
      val rows = sc.map { case (h, cSh) =>
        val psPpb = cSh * 1000000000L / nS
        val pcPpb = cc(h) * 1000000000L / nTot
        val bldiff = java.lang.Long.toBinaryString(cSh * nTot).length -
          java.lang.Long.toBinaryString(cc(h) * nS).length
        (psPpb, pcPpb, psPpb * bldiff)
      }
      src -> (nS, sc.size.toLong, rows.map(_._3).sum,
        rows.map(r => math.abs(r._1 - r._2)).sum + totalPc - rows.map(_._2).sum)
    }
    val got = TextAnalysis.qSourceDrift(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nS, nTerms, kl, l1) = expect(r.getString(0))
      assert(r.getAs[Long]("n_tokens") == nS)
      assert(r.getAs[Long]("n_terms") == nTerms)
      assert(r.getAs[Long]("kl_log2_ppb") == kl, s"kl at ${r.getString(0)}")
      assert(r.getAs[Long]("l1_ppb") == l1, s"l1 at ${r.getString(0)}")
    }
  }

  test("source containment equals a driver-side replay, diagonal saturates") {
    import graft.functions.GraftFunctions.tokenHashLong
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val db: Map[String, Set[Long]] = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap { case (_, t) =>
        t.trim.toLowerCase.split("\\s+").toSeq.sliding(2)
          .filter(_.length == 2).map(p => tokenHashLong(p(0) + p(1)))
      }.toSet
    }
    val got = TextAnalysis.qSourceContainment(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (a <- db.keys; b <- db.keys) {
      val shared = (db(a) & db(b)).size.toLong
      if (shared == 0) assert(!got.contains((a, b)), s"phantom row $a->$b")
      else {
        val (nA, nS, ppm) = got((a, b))
        assert(nA == db(a).size.toLong && nS == shared, s"counts at $a->$b")
        assert(ppm == shared * 1000000L / db(a).size, s"containment at $a->$b")
      }
    }
    db.keys.foreach(a =>
      assert(got((a, a))._3 == 1000000L, "diagonal containment is exactly 1e6"))
    got.keys.filter(k => k._1 != k._2).foreach { case (a, b) =>
      got.get((b, a)).foreach(rev =>
        assert(got((a, b))._2 == rev._2, "shared counts are symmetric"))
    }
    assert(db.size > 1 && got.exists { case ((a, b), _) => a != b },
      "fixture must produce cross-source overlap")
  }

  test("json extract parses valid sidecars, flags truncated ones, fields match") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    val rows = Curation.qJsonExtract(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % Curation.JsonCorruptMod == 0) {
        assert(r.getLong(1) == 0L, s"truncated $id must be invalid")
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      } else {
        val (src, lang, n) = docs(id)
        assert(r.getLong(1) == 1L && r.getLong(2) == id)
        assert(r.getString(3) == src && r.getString(4) == lang)
        assert(r.getLong(5) == n)
      }
    }
  }

  test("preference pairs pick the group arg-max/arg-min with min-id ties") {
    val q = TextAnalysis.qQuality(spark, sf).collect()
      .map(r => r.getLong(0) ->
        math.round(r.getDouble(5) * 1000000.0)).toSeq
    val expect = q.groupBy(t => t._1 / Sampling.PrefGroup).map {
      case (pid, xs) =>
        val chosen = xs.minBy { case (id, s) => (-s, id) }
        val rej = xs.minBy { case (id, s) => (s, id) }
        (pid, xs.size.toLong, chosen._1, chosen._2, rej._1, rej._2,
          chosen._2 - rej._2, if (chosen._2 > rej._2) 1L else 0L)
    }.toSet
    val got = Sampling.qPreferencePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expect,
      s"mismatch: missing=${(expect -- got).take(2)} extra=${(got -- expect).take(2)}")
  }

  test("quality calibration equals a driver-side strictly-below replay") {
    val rows = TextAnalysis.qQualityCalibrate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val n = rows.length.toLong
    val bySrc = rows.groupBy(_._2)
    rows.foreach { case (id, src, q, pSrc, pGlob) =>
      val inSrc = bySrc(src)
      val belowS = inSrc.count(_._3 < q).toLong
      assert(pSrc == belowS * 1000000L / inSrc.length,
        s"src pct at $id")
      val belowG = rows.count(_._3 < q).toLong
      assert(pGlob == belowG * 1000000L / n, s"global pct at $id")
    }
    // calibration effect: every source's floor doc sits at pct 0
    bySrc.values.foreach { xs =>
      assert(xs.filter(t => t._3 == xs.map(_._3).min).forall(_._4 == 0L))
    }
  }

  test("scrub redacts emails, urls and digit runs; idempotent") {
    import spark.implicits._
    val df = Seq(
      ("mail bob.smith@corp.example.com end",
        "see https://a.example.com/x?q=1 now",
        "call +1-555-0199 or 4085551234")).toDF("a", "b", "c")
    val r = df.select(
      Curation.scrub(col("a")).as("a"),
      Curation.scrub(col("b")).as("b"),
      Curation.scrub(col("c")).as("c")).head()
    assert(r.getString(0) == "mail <EMAIL> end")
    assert(r.getString(1) == "see <URL> now")
    assert(r.getString(2) == "call <NUM> or <NUM>")
    val twice = df.select(Curation.scrub(Curation.scrub(col("a")))).head().getString(0)
    assert(twice == "mail <EMAIL> end", "scrub must be idempotent")
  }

  test("qScrub leaves no unredacted pattern and counts each seeded fact") {
    val out = Curation.qScrub(spark, sf)
    assert(out.filter(col("n_emails") < 1 || col("n_urls") < 1 || col("n_nums") < 1)
      .count() == 0, "every doc is seeded with at least one of each")
    // scrubbed text must be shorter than raw (placeholders < payloads)
    assert(out.filter(col("n_chars_scrubbed") >= col("n_chars_raw")).count() == 0)
  }

  test("chunk dedup flags exactly the shared passages") {
    import spark.implicits._
    val shared = (1 to Curation.ChunkWords).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " unique one two three four five six seven eight nine"),
      (2L, shared + " other alpha beta gamma delta eps zeta eta theta iota"),
      (3L, "totally distinct words here that no other document carries x")
    ).toDF("doc_id", "text")
    val out = Curation.qChunkDedup(spark, sf).limit(0) // schema smoke at sf
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_chunks", "n_unique_chunks", "n_dup_chunks", "dup_frac"))
    val exploded = docs.select(col("doc_id"),
      explode(Curation.chunkHashes("text")).as("ch"))
    val counts = exploded.groupBy("ch").agg(count(lit(1)).as("n"))
    val dups = exploded.join(counts, "ch").filter(col("n") > 1)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(dups == Set(1L, 2L), "only the docs sharing the 10-word chunk")
  }

  test("CDC chunk boundaries re-sync after an insertion; fixed chunks never do") {
    import spark.implicits._
    // 200 distinct tokens → 8 content-defined boundaries (9 chunks);
    // prepending one token shifts every FIXED window but only the
    // CDC head chunk — the entire point of content-defined chunking
    val toks = (1 to 200).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, toks), (2L, "zzz " + toks)).toDF("doc_id", "text")
    val ch = Curation.cdcChunks(docs)
    val a = ch.filter($"doc_id" === 1L).select("ch").as[Long].collect().toSet
    val b = ch.filter($"doc_id" === 2L).select("ch").as[Long].collect().toSet
    assert(a.size >= 5, "fixture must produce several chunks")
    assert((a & b).size >= a.size - 1, "all but the head chunk must re-sync")
    val fixed = docs.select($"doc_id", explode(Curation.chunkHashes("text")).as("ch"))
    val fa = fixed.filter($"doc_id" === 1L).select("ch").as[Long].collect().toSet
    val fb = fixed.filter($"doc_id" === 2L).select("ch").as[Long].collect().toSet
    assert((fa & fb).isEmpty, "fixed windows all shift under a 1-token insert")
  }

  test("bloom-prefiltered decontamination equals the exact broadcast screen") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val exact = TextAnalysis.qDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bloom false positives must be removed by the confirm join at
    // ANY fpp — screen with a deliberately sloppy 20% filter too
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 100 === 0)
    for (fpp <- Seq(0.01, 0.2)) {
      val bloom = TextAnalysis.bloomDecontaminate(docs, bench, 100000L, fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bloom == exact, s"fpp=$fpp must not change the screen's output")
    }
  }

  test("lm typicality separates common-token prose from rare-token noise") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "the the the the"),
      (3L, "qq ww ee rr")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.lmScore(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // corpus: 'the' count 8, four singletons; total 12 occurrences
    assert(r(1L).getAs[Long]("sum_freq") == 32L)
    assert(r(3L).getAs[Long]("sum_freq") == 4L)
    assert(r(1L).getAs[Double]("typicality_ppm")
      > r(3L).getAs[Double]("typicality_ppm"))
    assert(r(3L).getAs[Double]("rare_token_frac") == 1.0)
    assert(r(1L).getAs[Double]("rare_token_frac") == 0.0)
  }

  test("winnowing guarantees: every full window covered, shared runs detected") {
    import spark.implicits._
    import graft.operators.TextAnalysis._
    // detection guarantee: two docs sharing a k+w-1 = 6-token run
    // must share a fingerprint, even at different offsets
    val run = "m1 m2 m3 m4 m5 m6"
    val docs = Seq(
      (1L, run + " x1 x2 x3 x4 x5 x6 x7 x8"),
      (2L, "y1 y2 y3 y4 y5 " + run),
      (3L, "z1 z2 z3 z4")).toDF("doc_id", "text")
    val sel = winnowFingerprints(docs).collect()
    val byDoc = sel.groupBy(_.getLong(0))
    val shared = byDoc(1L).map(_.getAs[Long]("sel_h")).toSet
      .intersect(byDoc(2L).map(_.getAs[Long]("sel_h")).toSet)
    assert(shared.nonEmpty, "a shared 6-token run must yield a shared fingerprint")
    // short-doc fallback: doc 3 (2 shingles < w) has no full window
    // but still gets exactly one fingerprint; docs under K tokens
    // have no shingles at all and carry none — both engines agree
    assert(byDoc(3L).length == 1)
    // coverage guarantee on real data: in every doc, consecutive
    // selected positions are at most w apart (each full window holds
    // a selected fingerprint)
    val real = winnowFingerprints(Tables.documents(spark, sf)).collect()
    real.groupBy(_.getLong(0)).foreach { case (d, rows) =>
      val ps = rows.map(_.getAs[Long]("sel_pos")).sorted
      val gaps = ps.sliding(2).collect { case Array(a, b) => b - a }
      assert(gaps.forall(_ <= WinnowW),
        s"doc $d: selected-position gap exceeds the window width")
    }
  }

  test("chunked winnowing equals unbounded winnowing on >2^15-shingle docs (r6 verdict #3)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.TextAnalysis._
    import graft.functions.GraftFunctions._
    // a doc with > PosField shingles: chunk-and-rekey must select
    // EXACTLY what a budget-free winnow of the whole doc selects —
    // including fingerprints past the old truncation cliff
    val nTok = PosField.toInt + 200
    val long = (0 until nTok).map(i => s"w${i % 4999}").mkString(" ")
    val docs = Seq((1L, long)).toDF("doc_id", "text")
    val sel = winnowFingerprints(docs).collect()
      .map(r => (r.getAs[Long]("sel_pos"), r.getAs[Long]("sel_h"))).toSet
    // budget-free reference: the same argmin-with-tie-break as a
    // lexicographic struct over global positions (no key packing,
    // no segmentation — only viable because this is one small doc)
    val keyed = docs.select(col("doc_id"),
        posexplode(shingleHashes(tokens(col("text")), WinnowK)).as(Seq("pos", "h")))
      .withColumn("k", struct(col("h"), (lit(Int.MaxValue) - col("pos")).as("rp")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(WinnowW - 1), 0)
    val ref = keyed
      .withColumn("mk", min(col("k")).over(w))
      .withColumn("wsz", count(lit(1)).over(w))
      .filter(col("wsz") === WinnowW)
      .select((lit(Int.MaxValue) - col("mk.rp")).cast("long").as("sel_pos"),
        col("mk.h").as("sel_h"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("sel_pos"), r.getAs[Long]("sel_h"))).toSet
    assert(sel == ref,
      s"chunked-only=${(sel -- ref).take(3)} ref-only=${(ref -- sel).take(3)}")
    // tail coverage: fingerprints ARE selected past the old budget
    assert(sel.exists(_._1 >= PosField),
      "no fingerprint selected past the old 2^15 truncation cliff")
  }

  test("winnow overlap report: shared runs pair up, hot hashes are capped out") {
    import spark.implicits._
    import graft.operators.TextAnalysis._
    // a long shared run (>= 2 windows) so the pair clears WinnowMinShared
    val run = (1 to 16).map(i => s"m$i").mkString(" ")
    val boiler = "the quick brown fox"
    val docs = Seq(
      (1L, run + " a1 a2 a3 a4 a5 a6"),
      (2L, "b1 b2 b3 b4 b5 " + run)).toDF("doc_id", "text")
      // boilerplate shingle in > WinnowHashCap docs: its hash must be
      // dropped before pairing, so the clones yield NO pairs among
      // themselves despite identical text
      .unionByName((10L until (12L + WinnowHashCap))
        .map(i => (i, boiler)).toDF("doc_id", "text"))
    val pairs = winnowOverlapPairs(docs).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys == Set((1L, 2L)),
      s"expected only the true-overlap pair, got ${keys.mkString(", ")}")
    assert(pairs.head.getAs[Long]("n_shared") >= WinnowMinShared)
  }

  test("semantic dedup drops the clone, keeps the original and the distinct vector") {
    import spark.implicits._
    // ids chosen so only vec 0 seeds a centroid (vec_id % SeedMod):
    // all three land in its cluster; 0 and 1 are identical (cos 1),
    // 2 is orthogonal. Rank: 0 (tie-break on id), 1, 2 — so 1 is
    // dominated by 0 and dropped; 2 survives. No fixture injection:
    // semDedup must see only genuine input rows.
    val dim = Similarity.Dim
    val e1 = Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(dim)(i => if (i == 1) 1.0f else 0.0f)
    val emb = Seq((0L, e1, "a"), (1L, e1, "a"), (2L, e2, "a"))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.semDedup(emb).collect()
      .map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(r == Map(0L -> true, 1L -> false, 2L -> true))
  }

  test("source overlap pairs only sources sharing shingles, with exact jaccard") {
    import spark.implicits._
    // A and B share one 5-token run (1 shared 5-gram shingle each
    // side after distinct); C shares nothing
    val run = "s1 s2 s3 s4 s5"
    val docs = Seq(
      (1L, run + " a1 a2 a3 a4 a5", "srcA"),
      (2L, "b1 b2 b3 b4 b5 " + run, "srcB"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "srcC"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.sourceOverlap(docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "srcA" && r.getString(1) == "srcB")
    // each doc has 6 distinct shingles; 1 shared -> jaccard 1/11
    assert(r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - math.round(1.0 / 11.0 * 1e6) / 1e6) < 1e-9)
  }

  test("semantic dedup invariants on real data: τ-separated keepers, justified drops") {
    import graft.operators.Similarity
    val emb = Similarity.corpus(Tables.embeddings(spark, sf))
    val all = Similarity.quantized(emb)
    val res = Similarity.semDedup(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val vecs = all.collect().map(r => r.getLong(0) ->
      r.getSeq[Long](2).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble)
        * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    res.groupBy(_._2).foreach { case (_, members) =>
      val keep = members.filter(_._3).map(_._1)
      // P1: no two keepers within the threshold — dedup actually
      // deduplicated (in particular each clone pair lost a member)
      for (i <- keep.indices; j <- i + 1 until keep.length)
        assert(cos(vecs(keep(i)), vecs(keep(j))) < Similarity.SemDedupThreshold,
          s"keepers ${keep(i)} and ${keep(j)} are still near-duplicates")
      // P2: every drop is justified by a cluster mate within τ
      members.filterNot(_._3).foreach { case (d, _, _) =>
        assert(members.exists { case (o, _, _) =>
          o != d && cos(vecs(d), vecs(o)) >= Similarity.SemDedupThreshold },
          s"vector $d dropped with no near-duplicate in its cluster")
      }
    }
    assert(res.count(!_._3) == res.length / 2,
      "the clone fixture must drop exactly half the corpus")
  }

  test("cluster-balanced sample caps every cluster and accounts every vector") {
    val r = Similarity.clusterBalancedSample(Tables.embeddings(spark, sf), 3)
      .collect()
    val byCluster = r.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      val kept = rows.count(_.getBoolean(3))
      assert(kept == math.min(3, rows.length),
        s"cluster $cid kept $kept of ${rows.length} at cap 3")
      // ranks are a 1..size permutation within the cluster
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    assert(r.length == Tables.embeddings(spark, sf).count())
  }

  test("dsir scores rank marker-bearing target docs above background") {
    import spark.implicits._
    // doc 1 (target) has 3 background tokens + 1 marker; doc 2 is
    // all background. share(x) = (3+1)*1e6 // (7+1) = 500000;
    // share(m) = (1+1)*1e6 // (1+1) = 1000000; expected =
    // (4+1)*1e6 // (8+1) = 555555. Hand-checked integer scores.
    val docs = Seq((1L, "x x x m"), (2L, "x x x x")).toDF("doc_id", "text")
    val r = Curation.dsirScores(docs, col("doc_id") === 1L).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(1L) == ((2500000L, true)))
    assert(r(2L) == ((2000000L, false)))
  }

  test("curation run verdicts follow stage priority: dup, then rules, then contamination") {
    import spark.implicits._
    val benchRun = "b1 b2 b3 b4 b5"
    val clean = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, benchRun + " x1"),            // too short AND contaminated -> rule wins
      (20L, benchRun + " x1"),            // exact copy of 10 -> dup wins over everything
      (30L, benchRun + " " + (1 to 11).map(i => s"y$i").mkString(" ")), // long, contaminated
      (40L, clean))                       // long, clean -> kept
      .toDF("doc_id", "text")
    val bench = Seq((0L, benchRun)).toDF("doc_id", "text")
    val v = Curation.curationRun(docs, bench).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v(10L) == "too_few_tokens")
    assert(v(20L) == "exact_dup")
    assert(v(30L) == "contaminated")
    assert(v(40L) == "kept")
  }

  test("mixture weights are a distribution and flatten shares (alpha=1/2)") {
    val rows = Curation.qMixture(spark, sf).collect()
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    // temperature sampling: below-average sources get factor > 1,
    // above-average get < 1 (sqrt flattens)
    val n = rows.length.toDouble
    rows.foreach { r =>
      val share = r.getAs[Double]("token_share")
      val factor = r.getAs[Double]("sample_factor")
      if (share < 1.0 / n * 0.9) assert(factor > 1.0, s"small source upsampled: $r")
      if (share > 1.0 / n * 1.1) assert(factor < 1.0, s"big source downsampled: $r")
    }
  }

  test("mixture sampling realizes the planned per-source factors") {
    val plan = Curation.qMixture(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(5))).toMap
    val realized = Curation.qMixtureSample(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("copies"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(realized.keySet.subsetOf(plan.keySet))
    plan.foreach { case (src, (nDocs, factor)) =>
      val want = nDocs * factor
      val got = realized.getOrElse(src, 0L).toDouble
      // hash-threshold rounding deviates by at most a few docs per source
      assert(math.abs(got - want) <= math.max(4.0, 0.08 * want),
        s"$src: planned $want copies, realized $got")
    }
    // determinism: a rerun reproduces the identical sample
    val again = Curation.qMixtureSample(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("copies"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == realized)
  }

  test("mixture drift sums to zero across sources and reacts to biased arrivals") {
    val rows = Curation.qMixtureDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    // weights are distributions before and after: drifts cancel
    assert(math.abs(rows.map(_.getDouble(5)).sum) < 1e-4)
    // the doc_id%3 arrival bias must move at least one source
    assert(rows.exists(r => math.abs(r.getDouble(5)) > 0.0))
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      "arrivals cannot shrink a source"))
  }

  test("binned range join equals the naive theta join") {
    val fast = Relational.qRangeJoin(spark, sf)
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("event_type"), unix_micros(col("ts")).as("et"),
      col("value"))
    val nb = ev.toDF("n_event_id", "n_event_type", "n_et", "n_value")
    val naive = ev.join(nb,
        col("event_type") === col("n_event_type")
          && col("event_id") =!= col("n_event_id")
          && abs(col("et") - col("n_et")) <= Relational.RangeJoinWindowUs, "left")
      .groupBy(col("event_id"))
      .agg(count(col("n_event_id")).as("n_nbrs"))
    val diff = fast.select("event_id", "n_nbrs")
      .exceptAll(naive.select("event_id", "n_nbrs"))
    assert(diff.isEmpty, s"bin rewrite diverges: ${diff.take(3).mkString}")
  }

  test("gap-fill covers the full calendar with zero-filled days") {
    val out = Relational.qGapfill(spark, sf).cache()
    val days = out.select("day").distinct().count()
    val types = out.select("event_type").distinct().count()
    assert(out.count() == days * types, "grid must be complete")
    val total = out.groupBy().agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count(), "counts conserve")
    // cumulative is monotone per type
    val bad = out.selectExpr("event_type", "day", "cum_events",
        "lag(cum_events) over (partition by event_type order by day) as prev")
      .filter(col("prev").isNotNull && col("cum_events") < col("prev"))
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("set ops follow distinct INTERSECT/EXCEPT semantics") {
    val out = Relational.qSetops(spark, sf).collect().map(_.getLong(0)).toSet
    val o = Tables.orders(spark, sf)
    def keys(st: String) = o.filter(col("o_orderstatus") === st)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(out == (keys("F") & keys("O")) -- keys("P"))
  }

  test("trained IVF recall does not collapse and matches brute reasonably") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.bruteTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = Similarity.ivfTrainedTopK(emb).collect()
    val tSet = trained.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & tSet).size.toDouble / brute.size
    assert(recall >= 0.2, s"trained-IVF recall $recall collapsed")
    val perQuery = trained.groupBy(_.getLong(0))
    assert(perQuery.forall(_._2.map(_.getInt(2)).sorted.sameElements(
      1 to perQuery.head._2.length)), "ranks are 1..k per query")
  }

  test("rule filter drops the crafted offenders for the right reasons") {
    import spark.implicits._
    // route crafted docs through the same physical op by writing a
    // tiny parquet dir shaped like the documents table
    val dir = java.nio.file.Files.createTempDirectory("graft-rules").toString
    Seq(
      (1L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen ok", "en", "s", 1L),
      (2L, "short doc", "en", "s", 1L),
      (3L, ("spam " * 30).trim + " filler word list that runs long enough to pass the token floor", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.qFilterRules(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(5), Option(r.getString(4)))).toMap
    assert(out(1L) == ((true, None)))
    assert(out(2L) == ((false, Some("too_few_tokens"))))
    assert(out(3L) == ((false, Some("repetitive_top_word"))))
  }

  test("sign projection is deterministic and respects vector identity") {
    val p = Similarity.projectTopDims(
      graft.sources.Tables.embeddings(spark, sf)).collect()
    assert(p.nonEmpty)
    // same input vector -> same projection (pure function of q)
    val again = Similarity.projectTopDims(
      graft.sources.Tables.embeddings(spark, sf)).collect()
    assert(p.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // projections are not degenerate: every output dim varies
    (2 until 2 + Similarity.ProjDims).foreach { i =>
      assert(p.map(_.getLong(i)).distinct.length > 1, s"dim $i constant")
    }
  }

  test("leakage-safe split keeps every near-dup cluster on one side") {
    val out = operators.Sampling.qSplitSafe(spark, sf).cache()
    // one split value per cluster — the property a plain hash split lacks
    val mixed = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(mixed.isEmpty, s"clusters straddle splits: ${mixed.take(3).mkString}")
    // the corpus guarantees (i, i+Shift) near-dup pairs: same split
    val byDoc = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val n = graft.sources.Tables.documents(spark, sf).count()
    (0L until n).foreach { i =>
      assert(byDoc(i) == byDoc(i + operators.Dedup.Shift),
        s"dup pair $i split across sides")
    }
    out.unpersist()
  }

  test("length batches respect capacity and account every document") {
    val out = operators.Sampling.qLengthBatches(spark, sf).collect()
    assert(out.forall(_.getAs[Long]("n_docs") <= operators.Sampling.BatchDocs))
    assert(out.forall { r =>
      val f = r.getAs[Double]("pad_frac"); f >= 0.0 && f < 1.0 })
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.sources.Tables.documents(spark, sf).count())
    // only the LAST batch of a (bucket, sub-bucket) may be partial
    out.groupBy(r => (r.getAs[Long]("len_bucket"), r.getAs[Long]("sub")))
      .values.foreach { batches =>
        val partial = batches.count(_.getAs[Long]("n_docs") < operators.Sampling.BatchDocs)
        assert(partial <= 1, "non-terminal partial batch")
      }
  }

  test("ppl buckets: cutoffs are the exact n/3-th and 2n/3-th largest scores") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.pplBuckets(docs).collect()
    val n = out.length
    assert(n > 0)
    val ts = out.map(_.getAs[Double]("typicality_ppm")).sorted(Ordering[Double].reverse)
    val (k1, k2) = (n / 3, 2 * n / 3)
    val (headCut, tailCut) =
      (out.head.getAs[Double]("head_cut"), out.head.getAs[Double]("tail_cut"))
    assert(headCut == ts(k1 - 1), "head cut = value at sorted position n/3")
    assert(tailCut == ts(k2 - 1), "tail cut = value at sorted position 2n/3")
    // value-threshold semantics: bucket follows the cuts exactly
    out.foreach { r =>
      val t = r.getAs[Double]("typicality_ppm")
      val expect = if (t >= headCut) "head" else if (t >= tailCut) "middle" else "tail"
      assert(r.getAs[String]("bucket") == expect)
    }
    // each bucket holds at least its third up to ties at the cut
    assert(out.count(_.getAs[String]("bucket") == "head") >= k1)
    assert(out.count(_.getAs[String]("bucket") != "tail") >= k2)
  }

  test("soft dedup weights: each content cluster keeps total mass one") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "solo text"), (2L, "pair text"), (3L, "pair text"),
      (4L, "triple text"), (5L, "triple text"), (6L, "triple text"))
      .toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 6, "every doc gets a weight row")
    assert(out(1L).getAs[Long]("weight_ppm") == 1000000L)
    assert(out(2L).getAs[Long]("weight_ppm") == 500000L)
    assert(out(4L).getAs[Long]("weight_ppm") == 333333L)
    // exactly one canonical member per cluster, the min doc_id
    val canon = out.values.filter(_.getAs[Long]("is_canonical") == 1L)
      .map(_.getLong(0)).toSet
    assert(canon == Set(1L, 2L, 4L))
    assert(out.values.map(_.getAs[Long]("dup_count")).toSeq.sorted ==
      Seq(1L, 2L, 2L, 3L, 3L, 3L))
  }

  test("decontamination verdict: leaked benchmark docs flagged, evidence matches") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.qDecontaminateVerdict(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(out.length == docs, "left join keeps a row per document")
    out.foreach { r =>
      val ppm = r.getAs[Long]("overlap_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[String]("verdict") ==
        (if (ppm >= TextAnalysis.ContamTauPpm) "contaminated" else "clean"))
    }
    // the seeded leak: every 100th doc IS the benchmark -> 100% overlap
    out.filter(_.getLong(0) % 100 == 0).foreach { r =>
      assert(r.getAs[Long]("overlap_ppm") == 1000000L)
      assert(r.getAs[String]("verdict") == "contaminated")
    }
    // shared-shingle evidence agrees with the inner-join screen
    val evidence = TextAnalysis.qDecontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_shared") == evidence.getOrElse(r.getLong(0), 0L))
    }
  }

  test("tiered mixture: shares sum to one, boost tracks the tier multiplier") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.qTieredMixture(spark, sf).collect()
    assert(out.nonEmpty)
    val cells = out.length
    // floor-quantized shares: sum within #cells ulps of 1e6
    val tgt = out.map(_.getAs[Long]("target_ppm")).sum
    val nat = out.map(_.getAs[Long]("natural_ppm")).sum
    assert(tgt <= 1000000L && tgt > 1000000L - cells, s"target sum $tgt")
    assert(nat <= 1000000L && nat > 1000000L - cells, s"natural sum $nat")
    // boost is the tier multiplier rescaled by one global constant:
    // within every source, head >= middle >= tail
    out.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      val byTier = rows.map(r => r.getAs[String]("bucket") -> r.getAs[Long]("boost_ppm")).toMap
      for (hi <- byTier.get("head"); mid <- byTier.get("middle")) assert(hi >= mid)
      for (mid <- byTier.get("middle"); lo <- byTier.get("tail")) assert(mid >= lo)
    }
    out.foreach { r =>
      assert(Set("head", "middle", "tail")(r.getAs[String]("bucket")))
      assert(r.getAs[Long]("mult") ==
        TextAnalysis.TierMult(r.getAs[String]("bucket")))
    }
  }

  test("bigram typicality: hand-checked MLE transitions, integer-exact") {
    import spark.implicits._
    // corpus bigrams: ctx(a)=3 {ab,ab,ac}, ctx(b)=2 {ba,ba}
    // ratios ppm: ab = 2e6 div 3 = 666666, ba = 1e6, ac = 333333
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.lmBigramScore(docs).head()
    assert(r.getAs[Long]("n_bigrams") == 5L)
    // sum = 666666*2 + 1000000*2 + 333333 = 3666665; div 5 = 733333
    assert(r.getAs[Long]("bigram_typicality_ppm") == 733333L)
    assert(r.getAs[Long]("min_transition_ppm") == 333333L)
  }

  test("Kneser-Ney bigram: hand-computed integer smoothing, discount mass reserved") {
    import spark.implicits._
    // bi: (a,b):2 (b,a):2 (a,c):1; ctx a: ca=3 n1a=2; b: ca=2 n1a=1
    // cont: n1b(a)=n1b(b)=n1b(c)=1; ndistinct=3 → pcont = 333333 each
    // p(a,b) = (5e6 div 12) + (1999998 div 12) = 416666 + 166666 = 583332
    // p(b,a) = (5e6 div 8)  + (999999 div 8)   = 625000 + 124999 = 749999
    // p(a,c) = (1e6 div 12) + (1999998 div 12) = 83333  + 166666 = 249999
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "b a")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.lmKneserNeyScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 638887L, 583332L))) // (583332+749999+583332) div 3
    assert(out(2L) == ((1L, 249999L, 249999L)))
    assert(out(3L) == ((1L, 749999L, 749999L)))
    // seen-context mass stays BELOW 1e6: the discount reserved mass
    // for unseen continuations (a's seen sum 583332+249999 = 833331)
    assert(583332L + 249999L <= 1000000L)
    // corpus sanity at sf: scores are ppm-bounded and positive
    val corpus = graft.operators.TextAnalysis.qLmKneserNey(spark, sf).collect()
    assert(corpus.nonEmpty && corpus.forall(r =>
      r.getLong(2) > 0 && r.getLong(2) <= 1000000L))
  }

  test("rep chars: duplicated and top n-gram character fractions, hand-checked") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "aa bb aa bb cc")).toDF("doc_id", "text")
    val r = TextAnalysis.qRepChars(spark, sf).limit(0) // schema smoke at sf
    assert(r.columns.toSeq == Seq("doc_id", "doc_chars", "top2_frac_ppm",
      "dup2_frac_ppm", "top3_frac_ppm", "dup3_frac_ppm"))
    // doc_chars 10; 2-grams: "aa bb"x2 (clen 4), "bb aa", "bb cc" ->
    // top2 = dup2 = 2*4 = 8 chars = 800000 ppm; 3-grams all unique:
    // dup3 = 0, top3 = 6 chars = 600000 ppm
    val docChars = docs
      .select(col("doc_id"), explode(graft.functions.GraftFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id")).agg(sum(length(col("t")).cast("long")).as("doc_chars"))
    assert(docChars.head().getLong(1) == 10L)
    val out = TextAnalysis.qRepCharsOf(docs).head()
    assert(out.getAs[Long]("doc_chars") == 10L)
    assert(out.getAs[Long]("top2_frac_ppm") == 800000L)
    assert(out.getAs[Long]("dup2_frac_ppm") == 800000L)
    assert(out.getAs[Long]("top3_frac_ppm") == 600000L)
    assert(out.getAs[Long]("dup3_frac_ppm") == 0L)
  }

  test("nb quality classifier: seeds classify to their own side, scores integer") {
    val out = Curation.qQualityClassifier(spark, sf).collect()
    val hq = out.filter(_.getAs[String]("role") == "hq")
    val lq = out.filter(_.getAs[String]("role") == "lq")
    val un = out.filter(_.getAs[String]("role") == "unlabeled")
    assert(hq.nonEmpty && lq.nonEmpty && un.nonEmpty)
    // marker vocabulary dominates the per-token noise: seeds must
    // land on their own side of the boundary
    assert(hq.count(_.getAs[Boolean]("keep")).toDouble / hq.length >= 0.9,
      "hq seeds score curated-like")
    assert(lq.count(!_.getAs[Boolean]("keep")).toDouble / lq.length >= 0.9,
      "lq seeds score spam-like")
    // the unlabeled pool splits — the gate is not degenerate
    assert(un.exists(_.getAs[Boolean]("keep")) || un.exists(!_.getAs[Boolean]("keep")))
    // decision rule consistency: keep ⇔ nb_score > 0
    out.foreach(r => assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("nb_score") > 0)))
  }

  test("classifier sample: soft boundary accepts strong scorers, thresholds bounded") {
    val out = Curation.qClassifierSample(spark, sf).collect()
    out.foreach { r =>
      val t = r.getAs[Long]("t_doc")
      assert(t >= -Curation.SampleSpread && t <= Curation.SampleSpread)
      assert(r.getAs[Boolean]("accepted") == (r.getAs[Long]("nb_score") > t))
    }
    // scores beyond the noise spread are deterministic verdicts
    assert(out.filter(_.getAs[Long]("nb_score") > Curation.SampleSpread)
      .forall(_.getAs[Boolean]("accepted")), "strong scorers always accepted")
    assert(out.filter(_.getAs[Long]("nb_score") < -Curation.SampleSpread)
      .forall(!_.getAs[Boolean]("accepted")), "weak scorers always dropped")
    // the soft boundary actually softens: acceptance differs from the
    // hard keep verdict for at least one doc inside the spread
    val hard = Curation.qQualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(out.exists(r => r.getAs[Boolean]("accepted") != hard(r.getLong(0))),
      "noisy threshold must flip some near-boundary doc")
  }

  test("domain cap: at most Cap kept per domain, selection is hash-deterministic") {
    val out = Curation.qDomainCap(spark, sf).collect()
    val byDomain = out.groupBy(_.getAs[String]("domain"))
    byDomain.values.foreach { rows =>
      val kept = rows.filter(_.getAs[Boolean]("kept"))
      assert(kept.length == math.min(Curation.DomainCap, rows.length),
        "kept count is min(cap, domain size)")
      // ranks are a permutation 1..n within the domain
      assert(rows.map(_.getAs[Long]("rn")).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
    // deterministic under re-evaluation
    val again = Curation.qDomainCap(spark, sf).collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Boolean]("kept"))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getAs[Boolean]("kept"))).sortBy(_._1).toSeq)
  }

  test("semantic decontamination: planted benchmark copies flagged, natural corpus clean") {
    val out = Similarity.qDeconSemantic(spark, sf).collect()
    val planted = out.filter(_.getLong(0) >= Similarity.Shift)
    val natural = out.filter(_.getLong(0) < Similarity.Shift)
    assert(planted.nonEmpty && natural.nonEmpty)
    // every planted copy is an exact benchmark duplicate: cos = 1
    planted.foreach { r =>
      assert(r.getAs[Boolean]("contaminated"))
      assert(math.abs(r.getAs[Double]("max_cos") - 1.0) < 1e-6)
    }
    // the synthetic corpus has no natural paraphrases of the bench
    natural.foreach(r => assert(!r.getAs[Boolean]("contaminated")))
    // verdict consistency with the match count
    out.foreach(r =>
      assert(r.getAs[Boolean]("contaminated") == (r.getAs[Long]("n_matches") > 0)))
  }

  test("fertility: symbols per word >= 1, chars per symbol >= 1, every source rated") {
    val out = TextAnalysis.qFertility(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(out.length == nSources, "one fertility row per source")
    out.foreach { r =>
      // a word is at least one symbol; merges never exceed chars
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L)
      assert(r.getAs[Long]("chars_per_symbol_ppm") >= 1000000L)
      assert(r.getAs[Long]("n_symbols") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("n_symbols") >= r.getAs[Long]("n_words"))
    }
  }

  test("tokenizer race equals the three family tables; oracle projection drops unigram") {
    type K = (String, String)
    type V = (Long, Long, Long, Long, Long)
    def keyed(rows: Array[org.apache.spark.sql.Row], fam: String): Map[K, V] =
      rows.map(r => (fam, r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
    val want =
      keyed(TextAnalysis.qFertility(spark, sf).collect(), "bpe") ++
        keyed(TextAnalysis.qWordpiece(spark, sf).collect(), "wordpiece") ++
        keyed(TextAnalysis.unigramLmFertility(
          Tables.documents(spark, sf)).collect(), "unigram_lm")
    val race = TextAnalysis.tokenizerRace(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(race == want,
      s"diff=${want.collect { case (k, v) if race.get(k) != Some(v) =>
        (k, v, race.get(k)) }.take(2)}")
    // all three families rate every source — the decision table is
    // complete, not a partial union
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    Seq("bpe", "wordpiece", "unigram_lm").foreach { fam =>
      assert(race.keys.count(_._1 == fam) == nSources, s"$fam incomplete")
    }
    // the oracle-checked projection is exactly the race minus the
    // unigram rows (37ae spec-only posture)
    val proj = TextAnalysis.qTokenizerRace(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(proj == race.filter(_._1._1 != "unigram_lm"))
  }

  test("wordpiece: per-source stats equal a driver greedy-MaxMatch replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // independent replay of vocab training + greedy longest-match
    val words = docs.flatMap { case (_, t) =>
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(_.take(TextAnalysis.WpMaxWordLen)) }
    val wc = words.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val chars = wc.keySet.flatMap(_.toSeq.map(_.toString))
    val gramCnt = scala.collection.mutable.Map[String, Long]()
    wc.foreach { case (w, n) =>
      for (l <- 2 to TextAnalysis.WpMaxPiece; i <- 0 to w.length - l)
        gramCnt.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + n))
    }
    val top = gramCnt.toSeq.sortBy { case (g, c) => (-c, g) }
      .take(TextAnalysis.WpVocabN).map(_._1)
    val vocab = chars ++ top
    def encode(w: String): Long = {
      var pos = 0; var np = 0L
      while (pos < w.length) {
        val l = (math.min(TextAnalysis.WpMaxPiece, w.length - pos) to 1 by -1)
          .find(l => vocab(w.substring(pos, pos + l))).getOrElse(1)
        pos += l; np += 1
      }
      np
    }
    val enc = wc.keys.map(w => w -> encode(w)).toMap
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val ws = ds.flatMap { case (_, t) =>
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(_.take(TextAnalysis.WpMaxWordLen)) }
      val (nw, npc, nch) =
        (ws.length.toLong, ws.map(enc).sum, ws.map(_.length.toLong).sum)
      src -> ((nw, npc, nch, npc * 1000000L / nw, nch * 1000000L / npc))
    }
    val got = TextAnalysis.qWordpiece(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want,
      s"diff=${want.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, v, got.get(k)) }.take(2)}")
    // sanity: greedy matching compresses below one-piece-per-char
    got.values.foreach { v =>
      assert(v._5 > 1000000L, "chars per piece must beat the char baseline")
      assert(v._4 >= 1000000L, "a word is at least one piece")
    }
  }

  test("wp train: rules equal a driver likelihood replay; trained beats frequency at budget 64") {
    val docsDf = Tables.documents(spark, sf)
    // driver replay of the 8-rule likelihood training: exact integer
    // score cnt·1e12 / (cl·cr) in BigInt, ties by (lhs, rhs)
    val words0 = docsDf.select(col("text")).collect().flatMap(r =>
      r.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val wc = words0.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    var seg = wc.map { case (w, n) => (w.map(_.toString).toVector, n) }.toSeq
    val wantRules = (1 to TextAnalysis.WpTrainSteps).map { _ =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      val sc = scala.collection.mutable.Map[String, Long]()
      seg.foreach { case (syms, n) =>
        syms.foreach(c => sc.updateWith(c)(v => Some(v.getOrElse(0L) + n)))
        syms.sliding(2).filter(_.size == 2).foreach(p =>
          pc.updateWith((p(0), p(1)))(v => Some(v.getOrElse(0L) + n)))
      }
      val scored = pc.toSeq
        .filter(_._2 >= TextAnalysis.WpMinPairCnt)
        .map { case ((l, r), c) =>
          val score = (BigInt(c) * BigInt("1000000000000") /
            (BigInt(sc(l)) * BigInt(sc(r)))).toLong
          (score, l, r, c)
        }
      val (score, l, r, c) = scored.minBy { case (sp, l, r, _) => (-sp, l, r) }
      // apply the merge leftmost non-overlapping
      seg = seg.map { case (syms, n) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toVector, n)
      }
      (l, r, c, score)
    }
    val got = TextAnalysis.qWpTrain(spark, sf).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == wantRules,
      s"rules diverge: got=${got.take(3).toSeq} want=${wantRules.take(3)}")
    // the race (r12 verdict #5): at a 64-piece budget the
    // likelihood-trained vocab BEATS the frequency-top-gram picker on
    // HELD-OUT fertility — compounded merges build whole high-mass
    // words while frequency pieces cap at WpMaxPiece chars. (At tiny
    // budgets the ranking honestly flips: 8 frequency 2..4-grams
    // carry more raw mass than 8 merges — measured 3.79 vs 4.15
    // pieces/word — which is why the pin sits at the production-ish
    // budget, not the oracle's 8-rule unroll.)
    val train = docsDf.filter(col("doc_id") % 4 =!= 3)
    val held = docsDf.filter(col("doc_id") % 4 === 3)
      .select(explode(graft.functions.GraftFunctions.tokens(col("text"))).as("w"))
      .select(expr(s"substring(w, 1, ${TextAnalysis.WpMaxWordLen})").as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val trainWords = train
      .select(explode(graft.functions.GraftFunctions.tokens(col("text"))).as("w"))
      .select(expr(s"substring(w, 1, ${TextAnalysis.WpMaxWordLen})").as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val budget = 64
    val rules64 = TextAnalysis.wpTrainRules(train, budget)
    val vTrained = TextAnalysis.wpTrainedVocab(held, rules64)
    val maxLen = vTrained.agg(max(length(col("piece")))).head.getInt(0)
    val vFreq = TextAnalysis.wordpieceVocab(trainWords, budget)
      .unionAll(TextAnalysis.wpTrainedVocab(held, rules64.limit(0)))
      .distinct()
    val fTrained = TextAnalysis.wpFertilityOf(held, vTrained, maxLen)
    val fFreq = TextAnalysis.wpFertilityOf(held, vFreq, TextAnalysis.WpMaxPiece)
    assert(fTrained < fFreq,
      s"trained vocab must beat frequency on held-out fertility: " +
        s"$fTrained vs $fFreq ppm")
  }

  test("unigram LM: equals a full driver EM replay; Viterbi beats greedy under trained costs") {
    val docsDf = Tables.documents(spark, sf)
    val docs = docsDf.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def wordsOf(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(_.take(TextAnalysis.WpMaxWordLen)).toSeq
    val occs = docs.flatMap { case (src, t) => wordsOf(t).map(src -> _) }
    val wc = occs.groupBy(_._2).map { case (w, o) => w -> o.length.toLong }
    val maxP = TextAnalysis.WpMaxPiece
    // mirrors TextAnalysis.biLogScalar including the ≥3e9 headroom
    // auto-switch to 2·bits(x)
    def biLog(x: Long): Long =
      if (x < 3000000000L) java.lang.Long.toBinaryString(x * x).length.toLong
      else 2L * java.lang.Long.toBinaryString(x).length
    // seed inventory: char masses + top-UlmSeedN grams by (cnt, piece)
    def seedInv(): Map[String, Long] = {
      val cnt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val gram = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      wc.foreach { case (w, n) =>
        w.foreach(c => cnt(c.toString) += n)
        for (l <- 2 to maxP; i <- 0 to w.length - l) gram(w.substring(i, i + l)) += n
      }
      val kept = gram.toSeq.sortBy { case (p, c) => (-c, p) }
        .take(TextAnalysis.UlmSeedN)
      (cnt.toSeq ++ kept).toMap
    }
    def costsOf(inv: Map[String, Long]): Map[String, Long] = {
      val tot = inv.values.map(_ + 1).sum
      inv.map { case (p, c) => p -> (biLog(tot) - biLog(c + 1)) }
    }
    // straight DP == the operator's Bellman-Ford fixpoint (ties
    // prefer the longer final piece)
    def viterbi(w: String, cost: Map[String, Long]): (Long, Seq[String]) = {
      val dp = Array.fill(w.length + 1)((Long.MaxValue, 0))
      dp(0) = (0L, 0)
      for (pos <- 1 to w.length) {
        for (l <- 1 to math.min(maxP, pos)) {
          val piece = w.substring(pos - l, pos)
          cost.get(piece).foreach { pc =>
            if (dp(pos - l)._1 != Long.MaxValue) {
              val c = dp(pos - l)._1 + pc
              if (c < dp(pos)._1 || (c == dp(pos)._1 && l > dp(pos)._2))
                dp(pos) = (c, l)
            }
          }
        }
      }
      var cur = w.length
      val pieces = scala.collection.mutable.ArrayBuffer[String]()
      while (cur > 0) { val l = dp(cur)._2; pieces += w.substring(cur - l, cur); cur -= l }
      (dp(w.length)._1, pieces.toSeq)
    }
    var inv = seedInv()
    for (_ <- 1 to TextAnalysis.UlmIters) {
      val cost = costsOf(inv)
      val usage = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      wc.foreach { case (w, n) =>
        viterbi(w, cost)._2.foreach(p => usage(p) += n) }
      val chars = wc.keySet.flatMap(_.map(_.toString))
        .map(c => c -> usage(c)).toMap
      val kept = usage.toSeq.filter(_._1.length >= 2)
        .sortBy { case (p, c) => (-c, p) }.take(TextAnalysis.UlmKeepN)
      inv = chars ++ kept
    }
    val finalCost = costsOf(inv)
    val dec = wc.keys.map(w => w -> viterbi(w, finalCost)).toMap
    val want = occs.groupBy(_._1).map { case (src, os) =>
      val ws = os.map(_._2)
      val np = ws.map(w => dec(w)._2.length.toLong).sum
      val nc = ws.map(_.length.toLong).sum
      src -> ((ws.length.toLong, np, nc, np * 1000000L / ws.length,
        nc * 1000000L / np))
    }
    val got = TextAnalysis.unigramLmFertility(docsDf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want,
      s"diff=${want.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, v, got.get(k)) }.take(2)}")
    // Viterbi optimality: the decode's cost never exceeds greedy
    // MaxMatch under the SAME trained costs (the property that
    // separates this family from WordPiece inference)
    val (costsDf, endDf) = TextAnalysis.ulmTrainedDecode(docsDf)
    val gotCost = endDf.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val costM = costsDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def greedyCost(w: String): Long = {
      var pos = 0; var c = 0L
      while (pos < w.length) {
        val l = (math.min(maxP, w.length - pos) to 1 by -1)
          .find(l => costM.contains(w.substring(pos, pos + l))).get
        c += costM(w.substring(pos, pos + l)); pos += l
      }
      c
    }
    var strict = 0
    gotCost.foreach { case (w, c) =>
      val g = greedyCost(w)
      assert(c <= g, s"Viterbi cost $c exceeds greedy $g for '$w'")
      if (c < g) strict += 1
    }
    assert(strict > 0, "fixture must contain words where Viterbi strictly wins")
  }

  test("decon by bench: self-leaked benchmarks report full coverage") {
    val out = TextAnalysis.qDeconByBench(spark, sf).collect()
    val nBench = Tables.documents(spark, sf)
      .filter(col("doc_id") % 100 === 0).count()
    assert(out.length == nBench, "one report row per benchmark doc")
    out.foreach { r =>
      // the benchmark is a corpus subset, so its own copy hits every
      // shingle: full coverage and at least one leaking doc
      assert(r.getAs[Long]("hit_frac_ppm") == 1000000L)
      assert(r.getAs[Long]("n_leaking_docs") >= 1L)
      assert(r.getAs[Long]("n_hit_shingles") == r.getAs[Long]("n_bench_shingles"))
    }
  }

  test("ngram novelty: shared trigrams flagged common, unique docs score zero") {
    import spark.implicits._
    val docs = ((1L to 5L).map(i => (i, s"x y z only$i a$i b$i")) :+ ((6L, "p q r s t u")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // docs 1-5: 6 tokens -> 4 shingles; only "x y z" has df 5 > CommonDf
    (1L to 5L).foreach { i =>
      assert(out(i).getAs[Long]("n_shingles") == 4L)
      assert(out(i).getAs[Long]("n_common") == 1L)
      assert(out(i).getAs[Long]("common_frac_ppm") == 250000L)
    }
    assert(out(6L).getAs[Long]("common_frac_ppm") == 0L)
    val real = TextAnalysis.qNgramNovelty(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Long]("n_common") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("common_frac_ppm") <= 1000000L)
    }
  }

  test("diversity: ratios bounded by construction, every source audited") {
    val out = TextAnalysis.qDiversity(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(out.length == nSources)
    out.foreach { r =>
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_bigram_types") <= r.getAs[Long]("n_bigrams"))
      assert(r.getAs[Long]("ttr_ppm") <= 1000000L)
      assert(r.getAs[Long]("bigram_ttr_ppm") <= 1000000L)
      // bigrams of an n-token doc stream: one fewer than tokens per doc
      assert(r.getAs[Long]("n_bigrams") < r.getAs[Long]("n_tokens"))
    }
  }

  test("simpson: concentration bounds, uniform-doc identity, repetition ordering") {
    val out = TextAnalysis.qSimpson(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val t = r.getAs[Long]("n_types")
      val simp = r.getAs[Long]("simpson_ppm")
      assert(t <= n)
      // Simpson is bounded below by 1/n (all-distinct) and above by 1 (all-same)
      assert(simp >= 1000000L / n - 1 && simp <= 1000000L)
      assert(r.getAs[Long]("gini_ppm") == 1000000L - simp)
      // inverse Simpson (effective vocab) never exceeds the type count
      assert(r.getAs[Long]("inv_simpson_ppm") <= t * 1000000L)
    }
    // identity: an all-distinct doc has simpson == floor(1e6/n); an
    // all-same doc has simpson == 1e6 (pinned on synthetic frames)
    import spark.implicits._
    val synth = Seq((1L, "a b c d"), (2L, "x x x x")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("simpson").toString
    synth.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sOut = TextAnalysis.qSimpson(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("simpson_ppm")).toMap
    assert(sOut(1L) == 250000L)
    assert(sOut(2L) == 1000000L)
  }

  test("rerank output stays inside the retrieval pool and reranks by score") {
    val out = Similarity.rerankTopK(Tables.embeddings(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(3) <= Similarity.RerankPool, "neighbor from the pool")
      assert(r.getInt(2) <= Similarity.TopK)
    }
    // scores non-increasing in rerank rank per query
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRnk = rows.sortBy(_.getInt(2)).map(_.getAs[Double]("rerank_score"))
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a >= b })
    }
  }

  test("release manifest: verdicts agree with the full run, kept rows fully released") {
    import graft.operators.Curation
    val rows = Curation.qReleaseManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    val verdicts = Curation.qCurationRunFull(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == verdicts.size, "one ledger row per arriving doc")
    rows.foreach { case (doc, verdict, keep, split, shard, pos) =>
      assert(verdict == verdicts(doc), s"doc $doc verdict drift")
      assert(keep == (verdict == "kept"))
      if (keep) {
        assert(split.exists(Set("train", "val", "test")), s"doc $doc split $split")
        assert(shard.exists(sh => sh >= 0 && sh < graft.operators.CorpusOps.NShards))
        assert(pos.isDefined, s"kept doc $doc missing a training position")
      } else {
        assert(split.isEmpty && shard.isEmpty && pos.isEmpty,
          s"dropped doc $doc carries release columns")
      }
    }
    // training positions are a dense permutation over exactly the kept set
    val positions = rows.flatMap(_._6).sorted
    assert(positions.toSeq == (0L until positions.length).toSeq)
    assert(positions.length == rows.count(_._3))
  }

  test("source interleave: global permutation, strict round-robin until a source exhausts") {
    val rows = graft.operators.Sampling.qSourceInterleave(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(rows.map(_._4).sorted.toSeq == (0L until n).toSeq,
      "positions must be a complete global permutation")
    val cnts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sources = cnts.keys.toSeq.sorted
    val minCnt = cnts.values.min
    val byPos = rows.sortBy(_._4)
    // while every source still has docs, position p's source is the
    // (p mod S)-th source in sorted order — exact round-robin
    byPos.take((sources.length * minCnt).toInt).zipWithIndex.foreach {
      case ((_, src, _, _), p) =>
        assert(src == sources(p % sources.length),
          s"position $p expected ${sources(p % sources.length)}, got $src")
    }
    // per-source ranks are dense and in position order
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq)
      assert(g.sortBy(_._4).map(_._3).toSeq == g.map(_._3).sorted.toSeq,
        "source ranks must be position-monotone")
    }
  }

  test("token-budget sample: kept set is the budget prefix per source") {
    import graft.operators.Sampling
    val rows = Sampling.qTokenBudgetSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "budget must bite: some kept, some dropped")
    rows.groupBy(_._2).foreach { case (src, g) =>
      val inOrder = g.sortBy(_._4)
      // cum_before is the exact running sum in the sample order
      var run = 0L
      inOrder.foreach { case (_, _, nt, cum, kept) =>
        assert(cum == run, s"$src: cum_before $cum != running $run")
        assert(kept == (cum < Sampling.SourceTokenBudget))
        run += nt
      }
      // the kept token total stops within one doc of the budget
      val keptTok = g.filter(_._5).map(_._3).sum
      val maxDoc = g.map(_._3).max
      assert(keptTok >= math.min(Sampling.SourceTokenBudget, run))
      assert(keptTok < Sampling.SourceTokenBudget + maxDoc,
        s"$src kept $keptTok overshoots budget by a full doc")
    }
  }

  test("k-anonymity gate: groups partition the table, verdict is n >= k") {
    val rows = Curation.qKanon(spark, sf).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Boolean]("released")))
    assert(rows.map(_._1).sum == Tables.customer(spark, sf).count(),
      "quasi-identifier groups must partition the table")
    rows.foreach { case (n, released) =>
      assert(released == (n >= Curation.KAnonK))
    }
    // tighter k releases nothing the looser k suppressed
    val loose = Curation.kAnonGroups(Tables.customer(spark, sf),
      Seq("c_nationkey", "c_mktsegment"), 2).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getAs[Boolean]("released"))
      .toMap
    Curation.kAnonGroups(Tables.customer(spark, sf),
      Seq("c_nationkey", "c_mktsegment"), Curation.KAnonK).collect()
      .foreach { r =>
        val key = (r.getInt(0), r.getString(1))
        if (r.getAs[Boolean]("released")) assert(loose(key),
          s"$key released at k=${Curation.KAnonK} but not at k=2")
      }
  }

  test("rater kappa: exact fraction matches a driver-side replay") {
    val row = Curation.qRaterKappa(spark, sf).collect()(0)
    val docs = Tables.documents(spark, sf)
      .select(col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0) >= Curation.KappaMinChars,
        r.getString(1).trim.toLowerCase.split("\\s+")
          .length >= Curation.KappaMinTokens))
    val n = docs.length.toLong
    val aPos = docs.count(_._1).toLong
    val bPos = docs.count(_._2).toLong
    val bothPos = docs.count(d => d._1 && d._2).toLong
    val bothNeg = docs.count(d => !d._1 && !d._2).toLong
    val pe = aPos * bPos + (n - aPos) * (n - bPos)
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("a_pos") == aPos)
    assert(row.getAs[Long]("b_pos") == bPos)
    assert(row.getAs[Long]("both_pos") == bothPos)
    assert(row.getAs[Long]("both_neg") == bothNeg)
    assert(row.getAs[Long]("kappa_num") == (bothPos + bothNeg) * n - pe)
    assert(row.getAs[Long]("kappa_den") == n * n - pe)
    // kappa ∈ [-1, 1]: |num| <= den (den > 0 unless a rater is constant)
    if (row.getAs[Long]("kappa_den") > 0)
      assert(math.abs(row.getAs[Long]("kappa_num")) <= row.getAs[Long]("kappa_den"))
  }

  test("skew diag: descending heavy keys, salt factor law replayed") {
    val rows = Relational.qSkewDiag(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      "top-10 must be descending by cnt")
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val nKeys = counts.size.toLong
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      assert(cnt == counts(r.getAs[Long]("key")))
      assert(r.getAs[Long]("share_ppm") == cnt * 1000000L / total)
      assert(r.getAs[Long]("salt_factor") ==
        (cnt * nKeys + total - 1) / total)
      assert(r.getAs[Long]("salt_factor") >= 1L)
    }
  }

  test("join estimate equals the materialized self-join row count") {
    val est = Relational.qJoinEstimate(spark, sf).collect()(0)
    val ev = Tables.events(spark, sf).select(col("user_id"))
    val actual = ev.join(ev.withColumnRenamed("user_id", "u2"),
      col("user_id") === col("u2")).count()
    assert(est.getAs[Long]("est_pairs") == actual,
      "sum of c(u)^2 must equal the self-join cardinality")
    assert(est.getAs[Long]("est_pairs") >= est.getAs[Long]("n_rows"))
    assert(est.getAs[Long]("max_cnt") * est.getAs[Long]("max_cnt")
      <= est.getAs[Long]("est_pairs"))
  }

  test("compression ratio: exact driver replay, repetition sinks the ratio") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val extra = Seq(
      (800001L, "spam " * 400),                       // pure repetition
      (800002L, ""),                                  // empty edge
      (800003L, (0 until 400).map(i =>
        graft.functions.GraftFunctions.tokenHashLong(s"x$i").toHexString)
        .mkString(" "))                               // high-entropy hex
    ).toDF("doc_id", "text")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).unionAll(extra)
    val got = graft.operators.TextAnalysis.compressionRatio(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // exact replay: same JDK Deflater, driver-side
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val raw = t.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      val ratio = if (raw.length == 0) 1000000L else n * 1000000L / raw.length
      assert(got(id) == (raw.length.toLong, n, ratio,
        ratio < graft.operators.TextAnalysis.CompressRatioFloorPpm),
        s"replay mismatch at $id")
    }
    assert(got(800001L)._4, "pure repetition must flag")
    assert(!got(800003L)._4, "high-entropy text must not flag")
    assert(got(800002L)._3 == 1000000L, "empty doc ratio defined as 1e6")
    assert(got(800001L)._3 < got(800003L)._3 / 4,
      "repetition must compress far better than entropy")
  }

  test("langid NB beats the stopword heuristic on the held-out fixture") {
    import graft.operators.TextAnalysis
    val aug = TextAnalysis.langAugment(
      graft.sources.Tables.documents(spark, sf))
    val truth = aug.select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // held-out = non-seed docs; the heuristic only knows 4 languages,
    // so compare on the docs whose true label it could even emit
    val heldOut = truth.keys.filter(_ % TextAnalysis.LangIdSeedMod != 0)
      .filter(v => truth(v) != "zh").toSeq
    val nb = TextAnalysis.langIdNb(aug).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val heur = TextAnalysis.langidHeuristic(aug).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    def acc(pred: Map[Long, String]): Double =
      heldOut.count(v => pred(v) == truth(v)).toDouble / heldOut.size
    val accNb = acc(nb)
    val accHeur = acc(heur)
    assert(accNb > accHeur,
      f"NB must beat the stopword heuristic: $accNb%.3f vs $accHeur%.3f")
    // and not by luck: the trained model should be near-perfect on the
    // marker fixture while the heuristic is stuck guessing the base
    // text's shared (English-ish) token pool
    assert(accNb >= 0.95, f"NB held-out accuracy too low: $accNb%.3f")
    assert(accHeur <= 0.70,
      f"fixture sanity: heuristic should struggle, got $accHeur%.3f")
    // seeds score as sanity anchors too
    val seeds = truth.keys.filter(_ % TextAnalysis.LangIdSeedMod == 0).toSeq
    val seedAcc = seeds.count(v => nb(v) == truth(v)).toDouble / seeds.size
    assert(seedAcc >= 0.95, f"seed (train) accuracy must be high: $seedAcc%.3f")
  }

  test("corpus laws: planted Zipf recovered, Heaps sublinear, exact integer fit") {
    import spark.implicits._
    import graft.functions.GraftFunctions.tokenHashLong
    // planted corpus: position p draws term k by the inverse-CDF of a
    // Zipf(s=2)-ish law, k = min(V, 1 + floor(u/(1-u))) with u the
    // md5-uniform of p - cnt(k) ~ 1/k^2 (steep rank-frequency line)
    // and vocabulary growth sublinear in tokens (rare terms surface
    // late) - the regime the natural template fixture cannot exercise
    // (its vocab is ~20 terms and saturates in the first doc; the
    // oracle run covers that degenerate shape)
    val N = 20000
    val V = 4000
    val D = 128
    val terms = (0 until N).map { p =>
      val u = (tokenHashLong(s"cl_$p") % 1048576L).toDouble / 1048576.0
      val k = 1 + math.floor(u / (1.0 - u)).toLong
      s"t${math.min(V.toLong, k)}"
    }
    val docs = terms.zipWithIndex.groupBy(_._2 / (N / D)).toSeq
      .map { case (d, ws) => (d.toLong, ws.map(_._1).mkString(" ")) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.corpusLaws(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // full driver replay of the integer pipeline
    def biLog(x: Long): Long =
      if (x < 3000000000L) java.lang.Long.toBinaryString(x * x).length.toLong
      else 2L * java.lang.Long.toBinaryString(x).length
    def lsq(pts: Seq[(Long, Long)]): Long = {
      val n = BigInt(pts.size)
      val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
      val sxy = BigInt(pts.map(q => q._1 * q._2).sum)
      val sxx = BigInt(pts.map(q => q._1 * q._1).sum)
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      (if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)).toLong
    }
    val cnt = terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    // zipf replay: spectrum intervals in descending-cnt order
    val spectrum = cnt.values.groupBy(identity)
      .map { case (c, xs) => c -> xs.size.toLong }.toSeq.sortBy(-_._1)
    val zPts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var prefix = 0L
    val anchors = (0 until 63).map(b => (b.toLong, 1L << b))
      .filter(_._2 <= cnt.size)
    for ((c, nt) <- spectrum) {
      val lo = prefix; val hi = prefix + nt
      anchors.foreach { case (b, a) =>
        if (lo < a && a <= hi) zPts += ((b, 2 * b + 1, biLog(c)))
      }
      prefix = hi
    }
    // heaps replay
    val docOf = terms.zipWithIndex.map { case (t, p) => (t, p / (N / D)) }
    val firstSeen = docOf.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).min }
    val docTok = docOf.groupBy(_._2).map { case (d, xs) => d -> xs.size.toLong }
    val hAnchors = (0 until 63).map(j => (j.toLong, 1L << j)).filter(_._2 <= D)
    val hPts = hAnchors.map { case (j, a) =>
      val v = firstSeen.values.count(_ < a).toLong
      val nt = docTok.filter(_._1 < a).values.sum
      (j, biLog(nt), biLog(v))
    }.filter(p => p._2 > 0 && p._3 > 0)
    val zSlope = lsq(zPts.toSeq.map(p => (p._2, p._3)))
    val hSlope = lsq(hPts.map(p => (p._2, p._3)))
    val wantRows =
      (zPts.map { case (b, x, y) => ("zipf", b, 1L << b, x, y, zSlope) } ++
        hPts.map { case (j, x, y) => ("heaps", j, 1L << j, x, y, hSlope) }).toSet
    assert(got.toSet == wantRows,
      s"missing=${(wantRows -- got.toSet).take(3)} extra=${(got.toSet -- wantRows).take(3)}")
    // recovery: the planted rank-frequency line is steep (s ~ 2 on
    // the matched biLog grids) and vocab growth is genuinely
    // sublinear yet real - the two qualitative laws a healthy corpus
    // must show and a collapsed one breaks
    assert(zSlope < -1200000L, s"zipf slope not steep: $zSlope")
    assert(hSlope > 250000L && hSlope < 900000L, s"heaps slope: $hSlope")
    // natural-fixture run: end-to-end, one row per (law, anchor),
    // one slope per law (the degenerate template-vocab shape is the
    // oracle's business; here just the partition laws)
    val nat = TextAnalysis.qCorpusLaws(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
    assert(nat.map(t => (t._1, t._2)).distinct.length == nat.length)
    assert(nat.groupBy(_._1).forall(_._2.map(_._3).distinct.length == 1))
  }

  test("doremi domain weights: exact driver replay, MW direction and smoothing floor") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val all = docs.flatMap { case (src, t) => toks(t).map(src -> _) }
    val tf = all.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val per = all.groupBy(_._1).map { case (src, xs) =>
      src -> ((xs.size.toLong, xs.map(x => tf(x._2)).sum))
    }
    val totTok = per.values.map(_._1).sum
    val totFreq = per.values.map(_._2).sum
    def fdiv(a: BigInt, b: BigInt): BigInt = a / b // operands non-negative
    val corp = fdiv(BigInt(totFreq) * 1000000000L, BigInt(totTok) * totTok)
    val sc = per.map { case (src, (nt, sfq)) =>
      val typ = fdiv(BigInt(sfq) * 1000000000L, BigInt(nt) * totTok)
      src -> ((nt, typ.toLong, (typ - corp).toLong))
    }
    val mx = sc.values.map(v => math.abs(v._3)).max
    val gained = sc.map { case (src, (nt, typ, ex)) =>
      val g = if (mx == 0) 0L
        else if (ex >= 0) ex * 1000000L / mx
        else -((-ex) * 1000000L / mx)
      val step = if (g >= 0) Curation.DwEtaPpm * g / 1000000L
        else -(Curation.DwEtaPpm * (-g) / 1000000L)
      val f = BigInt(1000000L + step)
      src -> ((nt, typ, ex, g, f.pow(Curation.DwRounds)))
    }
    val wtot = gained.values.map(_._5).sum
    val k = gained.size.toLong
    val want = gained.map { case (src, (nt, typ, ex, g, wraw)) =>
      val wn = (wraw * 1000000L / wtot).toLong
      val w = ((1000000L - Curation.DwSmoothPpm) * wn +
        Curation.DwSmoothPpm * (1000000L / k)) / 1000000L
      src -> ((nt, typ, ex, g, w))
    }
    val got = Curation.qDomainWeights(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    assert(got == want,
      s"diff=${want.collect { case (s2, v) if got.get(s2) != Some(v) =>
        (s2, v, got.get(s2)) }.take(2)}")
    // laws: weights are a (floored) distribution; the smoothing
    // floor keeps every domain alive (DoReMi's epsilon-uniform mix);
    // gain carries the excess sign; the max-|excess| domain is the
    // (saturated) +/-1e6 gain
    val ws = got.values.map(_._5)
    assert(ws.sum <= 1000000L && ws.sum >= 1000000L - 2 * k)
    val floor = Curation.DwSmoothPpm * (1000000L / k) / 1000000L
    assert(ws.forall(_ >= floor), s"a domain starved below the smoothing floor")
    assert(got.values.forall(v => v._3.sign == v._4.sign || v._4 == 0))
    assert(got.values.map(_._4).max == 1000000L ||
      got.values.map(_._4).min == -1000000L)
    // the sampler materializes base/base+1 copies per doc, per source
    val fac = Curation.doremiFactors(Tables.documents(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sampled = Curation.qDoremiSample(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    sampled.foreach { case (src, nc) =>
      val (base, _) = fac(src)
      assert(nc == base || nc == base + 1, s"$src copies $nc vs base $base")
    }
  }
}
