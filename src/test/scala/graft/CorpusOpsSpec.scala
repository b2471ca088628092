package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.operators.{CorpusOps, Sampling}
import graft.sources.Tables

/** Corpus-stats operators: sketch-confirm heavy hitters vs brute
  * force, BM25 retrieval invariants, URL canonicalization law, and
  * the PCA power-iteration eigenpair over the exact covariance.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkSuite._

  test("delta release reconciles: old manifest XOR tombstones XOR ships = new manifest") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hash(t: String) = tokenHashLong(t)
    val old = docs.filter(_._1 % 10 != 0).map { case (id, t) => id -> hash(t) }.toMap
    val neu = docs.filter(_._1 % 10 != 1).map { case (id, t) =>
      id -> hash(if (id % 7 == 0) t + " edited" else t)
    }.toMap
    def manifest(m: Map[Long, Long]): Map[Long, (Long, Long)] =
      m.values.groupBy(_ % CorpusOps.NShards).map { case (s, hs) =>
        s -> (hs.size.toLong, hs.foldLeft(0L)(_ ^ _))
      }
    val mo = manifest(old).withDefaultValue((0L, 0L))
    val mn = manifest(neu).withDefaultValue((0L, 0L))
    val got = CorpusOps.qDeltaRelease(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap.withDefaultValue((0L, 0L, 0L, 0L, 0L))
    (0L until CorpusOps.NShards.toLong).foreach { s =>
      val (nShip, shipXor, nTomb, tombXor, nRes) = got(s)
      // doc-count law: old population − tombstones + ships = new population
      assert(mo(s)._1 - nTomb + nShip == mn(s)._1,
        s"shard $s doc-count reconciliation")
      // resident law: residents + ships = new population
      assert(nRes + nShip == mn(s)._1, s"shard $s resident count")
      // fingerprint law: applying the delta to the old shard
      // fingerprint reproduces the new shard fingerprint exactly
      assert((mo(s)._2 ^ tombXor ^ shipXor) == mn(s)._2,
        s"shard $s xor reconciliation")
    }
    assert(got.values.map(_._1).sum > 0 && got.values.map(_._3).sum > 0,
      "fixture must ship and tombstone something")
  }

  test("heavy hitters == brute-force exact frequent set") {
    val got = CorpusOps.qHeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val terms = Tables.documents(spark, sf)
      .select(tokens(col("text")).as("toks"))
      .select(explode(CorpusOps.bigrams(col("toks"))).as("term"))
    val n = terms.count()
    val want = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * CorpusOps.HhShare >= n)
      .select(col("term"), col("cnt"), expr(s"cnt * 1000000 div ${n}L"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("heavy hitters confirm pass broadcasts the candidate set") {
    val plan = CorpusOps.qHeavyHitters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast confirm join, got:\n$plan")
  }

  test("bm25: hits contain a query term, ranks dense, scores ordered") {
    val hits = CorpusOps.qBm25Search(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(hits.nonEmpty)
    val docTerms = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet)
    val qterms = CorpusOps.Bm25Queries.toMap.view
      .mapValues(_.split(" ").toSet)
    hits.foreach { case (qid, doc, _, _) =>
      assert(docTerms(doc).intersect(qterms(qid)).nonEmpty,
        s"doc $doc hit for query $qid without any query term")
    }
    hits.groupBy(_._1).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length).toSeq,
        s"ranks not dense for qid $qid")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq,
        s"scores not non-increasing for qid $qid")
    }
  }

  test("url canonicalization strips tracking, port, www, fragment") {
    val rows = CorpusOps.qUrlNormalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (canon, host, domain, blocked) =
        (r.getString(2), r.getString(3), r.getString(4), r.getBoolean(5))
      assert(canon.startsWith("https://"), canon)
      Seq("utm_", "?ref=", "&ref=", "#", ":443", "WwW", "ExAmple").foreach(bad =>
        assert(!canon.contains(bad), s"$bad survived in $canon"))
      assert(canon.contains("pref=k"), s"anchoring ate pref= in $canon")
      assert(host == host.toLowerCase && !host.startsWith("www."), host)
      assert(domain == "example.com", domain)
      assert(blocked == CorpusOps.HostBlocklist.contains(host))
    }
    // mirror fetches exist and rank deterministically within a group
    val groups = rows.groupBy(_.getString(2))
    assert(groups.exists(_._2.length > 1), "no canonical-URL dup groups")
    groups.values.foreach { g =>
      val byDoc = g.sortBy(_.getLong(0))
      assert(byDoc.map(_.getInt(6)).toSeq == (1 to g.length).toSeq)
    }
  }

  test("url canonicalization is idempotent over generated messy urls") {
    // the canonical form must be a fixed point: re-running the same
    // regexp pipeline over canon_url changes nothing (otherwise two
    // pipeline passes would disagree on the dedup key)
    import spark.implicits._
    val messy = (0 until 64).map { i =>
      val scheme = Seq("http", "HTTP", "HttpS", "https")(i % 4)
      val www = Seq("", "www.", "WWW.", "WwW.")(i % 4)
      val port = Seq("", ":443", ":8080", "")(i % 4)
      val params = Seq("", "?utm_source=a&page=1", "?ref=r2&pref=keep",
        "?utm_a=b&href=/x&ref=x&id=9")(i % 4)
      val frag = if (i % 3 == 0) "#frag" else ""
      (i.toLong, s"$scheme://${www}Host$i.Example.COM$port/p$i$params$frag")
    }.toDF("doc_id", "url")
    def canonize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val hostport = lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1))
      val host = regexp_replace(regexp_replace(hostport, ":443$", ""), "^www\\.", "")
      val pathq = regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^#]*)", 1)
      val cleanPathq = regexp_replace(regexp_replace(
        regexp_replace(pathq, "([?&])(?:utm_[a-z_]+|ref)=[^&#]*", "$1"),
        "([?&])&+", "$1"), "[?&]$", "")
      df.select(col("doc_id"),
        concat(lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1)),
          lit("://"), host, cleanPathq).as("url"))
    }
    val once = canonize(messy).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val twice = canonize(canonize(messy)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(once == twice, "canonicalization must be a fixed point")
    once.values.foreach { u =>
      Seq("utm_", "?ref=", "&ref=", "#", ":443", "WwW", "Example").foreach(bad =>
        assert(!u.contains(bad), s"$bad survived in $u"))
      assert(!u.contains("?&") && !u.contains("&&"),
        s"delimiter run survived in $u")
    }
    // boundary anchoring: params whose names merely END in "ref" keep
    // their full values (the unanchored regex chewed their tails off)
    assert(once(2L).contains("pref=keep"), once(2L))
    assert(once(3L).contains("href=/x") && once(3L).contains("id=9"), once(3L))
  }

  test("heavy hitters: thresholded candidate set is bounded by MgK and covers the frequent set") {
    import spark.implicits._
    // skewed stream: a few hot terms + a long uniform tail, spread
    // over many partitions so every partition contributes sketch rows
    val hot = (0 until 5).flatMap(h => Seq.fill(3000)(s"hot $h"))
    val tail = (0 until 30000).map(i => s"tail ${i % 9973}")
    val terms = spark.createDataset(hot ++ tail).repartition(64).toDF("term")
    val sketches = terms.as[String].mapPartitions { it =>
      var np = 0L
      val m = CorpusOps.misraGries(it.map { t => np += 1; t }, CorpusOps.MgK)
      m.iterator ++ Iterator("" -> np)
    }.toDF("term", "est").groupBy("term").agg(sum("est").as("est"))
    val n = sketches.where(col("term") === "").select("est").as[Long].head()
    val cand = sketches
      .where(col("term") =!= "" && col("est") >= CorpusOps.candidateBound(n))
      .select("term").as[String].collect().toSet
    // the PROVABLE cap is n / candidateBound(n) (merged estimates sum
    // to <= n, each survivor holds >= the bound) — MgK only up to a
    // floor-rounding epsilon of O(MgK²/n), so a bare `<= MgK` would
    // pass on this fixture only because the sketch is sparse (r8
    // advice: brittle to fixture changes). Assert the real bound, and
    // that it stays the right ORDER (a small multiple of MgK — the
    // broadcast is bounded by sketch math, not by fixture luck).
    val cap = n / CorpusOps.candidateBound(n)
    assert(cand.size <= cap,
      s"candidate set ${cand.size} exceeds provable cap $cap — broadcast unbounded")
    assert(cap <= 3L * CorpusOps.MgK,
      s"provable cap $cap not O(MgK) at n=$n — bound derivation broken")
    val exact = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * CorpusOps.HhShare >= n)
      .select("term").as[String].collect().toSet
    assert(exact.nonEmpty && exact.subsetOf(cand),
      s"frequent set not covered: missing ${exact.diff(cand)}")
  }

  test("curriculum order: complete permutation, quality deciles in strict blocks") {
    val rows = Sampling.qCurriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length.toLong
    assert(rows.map(_._4).sorted.toSeq == (0L until n).toSeq,
      "positions not a complete permutation")
    // decile blocks are contiguous and ascending: every position in a
    // lower-quality bucket precedes every position in a higher one —
    // the anneal contract (best data last)
    val byBucket = rows.groupBy(_._2).toSeq.sortBy(_._1)
    byBucket.sliding(2).foreach {
      case Seq((bLo, lo), (bHi, hi)) =>
        assert(lo.map(_._4).max < hi.map(_._4).min,
          s"quality buckets $bLo and $bHi interleave positions")
      case _ =>
    }
    assert(byBucket.size >= 2, "fixture collapsed to one quality decile — no ordering signal")
    // within-bucket ranks are a 0-based permutation of the bucket
    byBucket.foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.size).toSeq)
    }
  }

  test("epoch shuffle: complete permutation at two explicit bucket counts") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    Seq(7L, 256L).foreach { b =>
      val rows = CorpusOps.epochShuffle(docs, Some(b)).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      rows.groupBy(_._1).values.foreach { ep =>
        assert(ep.map(_._3).sorted.toSeq == (0L until n).toSeq,
          s"positions not a complete permutation at buckets=$b")
      }
    }
  }

  test("epoch shuffle: each epoch is a complete permutation, epochs differ") {
    val rows = CorpusOps.qEpochShuffle(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val n = rows.length / CorpusOps.ShuffleEpochs
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == (0 until CorpusOps.ShuffleEpochs).toSet)
    byEpoch.values.foreach { ep =>
      assert(ep.map(_._3).sorted.toSeq == (0L until n).toSeq,
        "positions must be exactly 0..n-1 within an epoch")
    }
    val order0 = byEpoch(0).sortBy(_._3).map(_._2).toSeq
    val order1 = byEpoch(1).sortBy(_._3).map(_._2).toSeq
    assert(order0 != order1, "epochs must shuffle differently")
    assert(order0 != order0.sorted, "an epoch order must not be doc_id order")
  }

  test("c4 lines: one kept first occurrence per surviving line, rules precede dedup") {
    import spark.implicits._
    val rows = CorpusOps.qC4Lines(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val verdicts = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(Set("kept", "dup", "short", "banned").subsetOf(verdicts.keySet),
      s"fixture must exercise all verdicts, got $verdicts")
    // recompute the line text the operator windows over
    val lines = Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          expr(s"(size(toks) + ${CorpusOps.LineWords - 1}) div ${CorpusOps.LineWords} - 1")))
          .as("line_no"), col("toks"))
      .select(col("doc_id"), col("line_no").cast("long").as("line_no"),
        concat_ws(" ", slice(col("toks"),
          col("line_no") * CorpusOps.LineWords + 1, lit(CorpusOps.LineWords))).as("line"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(rows.length == lines.size, "one verdict row per line")
    val byText = rows.map { case (d, l, nw, v) => (lines((d, l)), d, l, nw, v) }
      .groupBy(_._1)
    byText.values.foreach { g =>
      val surviving = g.filter(x => x._5 == "kept" || x._5 == "dup")
      if (surviving.nonEmpty) {
        // exactly one kept, and it is the (doc_id, line_no) minimum
        val kept = surviving.filter(_._5 == "kept")
        assert(kept.length == 1, s"line '${g.head._1}' kept ${kept.length} times")
        val first = surviving.map(x => (x._2, x._3)).min
        assert((kept.head._2, kept.head._3) == first, "kept is not the first occurrence")
      }
      // rules fire before dedup: short/banned lines never count as dup
      g.filter(_._5 == "short").foreach(x => assert(x._4 < CorpusOps.LineMinWords))
      g.filter(x => x._5 == "kept" || x._5 == "dup")
        .foreach(x => assert(x._4 >= CorpusOps.LineMinWords))
    }
  }

  test("chunk windows: full coverage, fixed stride, short-tail law") {
    val chunks = CorpusOps.qChunkWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until cs.length).toSeq, "chunk ids dense")
      sorted.foreach { case (_, cid, start, len) =>
        assert(start == cid * CorpusOps.ChunkS, "fixed stride")
        assert(len >= 1 && len <= CorpusOps.ChunkW)
        assert(start + len <= n)
      }
      // last chunk reaches the final token; chunks cover every token
      val last = sorted.last
      assert(last._3 + last._4 == n, s"doc $doc tail uncovered")
      val covered = sorted.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (0L until n).toSet, s"doc $doc has coverage holes")
      // every non-last chunk is full-width (the tail is the only short one)
      sorted.dropRight(1).foreach(c => assert(c._4 == CorpusOps.ChunkW))
    }
  }

  test("boilerplate: flagged lines really cross the df threshold, ratios consistent") {
    val rows = CorpusOps.qBoilerplate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.exists(_._3 > 0), "fixture must contain boilerplate lines")
    rows.foreach { case (_, nl, nb, ppm) =>
      assert(nb <= nl)
      assert(ppm == nb * 1000000L / nl)
    }
    // recompute the line df by hand and cross-check the totals
    val lines = CorpusOps.docLines(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val dfreq = lines.distinct.groupBy(_._2).view.mapValues(_.length).toMap
    val wantBoiler = lines.count { case (_, l) => dfreq(l) > CorpusOps.BoilerDf }
    assert(rows.map(_._3).sum == wantBoiler,
      s"operator counted ${rows.map(_._3).sum} boiler lines, brute force $wantBoiler")
    assert(rows.map(_._2).sum == lines.length)
  }

  test("shard manifest: shards partition the corpus, xor fingerprint reconciles") {
    val rows = CorpusOps.qShardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => r._1 >= 0 && r._1 < CorpusOps.NShards))
    val docs = Tables.documents(spark, sf)
      .select(tokenHash(col("text")).as("h"),
        size(tokens(col("text"))).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == docs.length, "shards must partition the docs")
    assert(rows.map(_._3).sum == docs.map(_._2).sum, "token counts must reconcile")
    // xor of shard fingerprints == xor over all docs (associativity:
    // any engine can re-derive a shard's fingerprint order-free)
    assert(rows.map(_._4).reduce(_ ^ _) == docs.map(_._1).reduce(_ ^ _))
  }

  test("domain flags: rollup equals a per-host replay, verdict and kept laws hold") {
    val url = CorpusOps.qUrlNormalize(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getBoolean(5), r.getInt(6)))
      .toMap
    val q = graft.operators.TextAnalysis.qQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        math.round(r.getAs[Double]("quality_score") * 1000000))
      .toMap
    val byHost = url.toSeq.groupBy(_._2._1)
    val rollup = byHost.map { case (host, docs) =>
      val n = docs.size.toLong
      val sumQ = docs.map(d => q(d._1)).sum
      val dups = docs.count(_._2._3 > 1).toLong
      host -> (n, sumQ / n, dups * 1000000L / n)
    }
    val got = CorpusOps.qDomainFlags(spark, sf).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
    assert(got.length == url.size, "one verdict row per document")
    got.foreach { case (id, host, qPpm, nDocs, meanQ, dupPpm, flagged, kept) =>
      val (expN, expMean, expDup) = rollup(host)
      assert(host == url(id)._1 && qPpm == q(id))
      assert(nDocs == expN && meanQ == expMean && dupPpm == expDup,
        s"rollup mismatch for $host")
      assert(flagged == (meanQ < CorpusOps.DomainQFloor ||
        dupPpm > CorpusOps.DomainDupCap), "verdict law")
      assert(kept == (!flagged && !url(id)._2), "kept composes verdict+blocklist")
    }
    assert(rollup.size > 1, "fixture must span several hosts")
    assert(got.exists(r => url(r._1)._2), "blocklisted hosts must appear")
  }

  test("priority sample: exact DLT replay, heavy-item certainty, estimator accounting") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pri = docs.map { case (id, t) =>
      val w = math.max(t.trim.toLowerCase.split("\\s+").length, 1).toLong
      val h = tokenHashLong(id.toString) + 1
      (id, w, (BigInt(w) * BigInt(281474976710656L) / BigInt(h)).toLong)
    }
    val ordered = pri.sortBy { case (id, _, p) => (-p, id) }
    val expTau =
      if (ordered.length > Sampling.PriorityK) ordered(Sampling.PriorityK)._3 else 0L
    val expSet = ordered.take(Sampling.PriorityK).map(_._1).toSet
    val got = Sampling.qPrioritySample(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == math.min(Sampling.PriorityK, docs.length))
    assert(got.map(_._1).toSet == expSet, "sampled set must equal the replay")
    got.foreach { case (id, w, p, tau, wHat, pPpm) =>
      assert(tau == expTau, s"threshold mismatch at $id")
      assert(p >= tau, "every kept priority clears the threshold")
      assert(wHat == math.max(w, tau), "DLT estimator is max(w, tau)")
      val expP = if (tau == 0) 1000000L else math.min(1000000L, w * 1000000L / tau)
      assert(pPpm == expP)
    }
    // certainty region: w > tau forces priority > tau (u <= 1), and at
    // most k priorities exceed the (k+1)-th, so every heavy item is kept
    val heavy = pri.filter(_._2 > expTau).map(_._1).toSet
    assert(heavy.subsetOf(expSet), "items heavier than tau are kept with certainty")
    assert(expTau > 0, "fixture is larger than k, so the threshold is real")
    // the unbiased subset-sum estimator should land near the exact
    // total on the fixture (deterministic draw; ~1/sqrt(k) error class)
    val exact = pri.map(_._2).sum.toDouble
    val est = got.map(_._5).sum.toDouble
    assert(math.abs(est - exact) / exact < 0.5,
      s"estimator total $est too far from exact $exact")
  }

  test("power iteration finds the top eigenpair of the covariance") {
    val cov = CorpusOps.covMatrix(spark, sf)
    assert(cov.indices.forall(i => cov.indices.forall(j =>
      math.abs(cov(i)(j) - cov(j)(i)) < 1e-12)), "covariance not symmetric")
    val v = CorpusOps.powerIteration(cov)
    val lambda = CorpusOps.rayleigh(cov, v)
    val maxDiag = cov.indices.map(i => cov(i)(i)).max
    assert(lambda >= maxDiag - 1e-9,
      s"top eigenvalue $lambda below max variance $maxDiag")
    val cv = cov.indices.map(i => cov(i).indices.map(j => cov(i)(j) * v(j)).sum)
    val residual = math.sqrt(
      cov.indices.map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
    assert(residual <= 5e-3 * math.abs(lambda),
      s"eigen residual $residual vs lambda $lambda")
    // projecting the corpus onto v reproduces the eigenvalue as the
    // population variance of the projection (quantization-tolerant)
    val vLit = array(v.map(lit): _*)
    val proj = Tables.embeddings(spark, sf)
      .select(aggregate(
        zip_with(col("embedding").cast("array<double>"), vLit, _ * _),
        lit(0.0), _ + _).as("p"))
    val variance = proj.agg(var_pop(col("p"))).head.getDouble(0)
    assert(math.abs(variance - lambda) <= 0.01 * math.abs(lambda) + 1e-9,
      s"projection variance $variance vs eigenvalue $lambda")
  }

  test("shard balance: partition laws and the sorted-round-robin spread bound") {
    val docs = Tables.documents(spark, sf)
    val out = CorpusOps.qShardBalance(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("tokens"), r.getAs[Long]("balance_ppm")))
    assert(out.length == CorpusOps.NShards)
    val nts = docs.select(size(tokens(col("text"))).cast("long")).collect()
      .map(_.getLong(0))
    assert(out.map(_._2).sum == nts.length)
    assert(out.map(_._3).sum == nts.sum)
    // LPT round-robin: the telescoping bound caps the shard spread
    // at one maximum document
    assert(out.map(_._3).max - out.map(_._3).min <= nts.max,
      s"spread ${out.map(_._3).max - out.map(_._3).min} > max doc ${nts.max}")
    out.foreach { case (_, _, tk, ppm) =>
      assert(ppm == tk * CorpusOps.NShards * 1000000L / nts.sum)
    }
  }

  test("retrieval eval: one row per gold query, rank/rr law") {
    val rows = CorpusOps.qRetrievalEval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("gold_rank"), r.getAs[Long]("rr_ppm")))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == math.min(CorpusOps.EvalGoldK.toLong, nDocs))
    rows.foreach { case (qid, rank, rr) =>
      assert(rank >= 0 && rank <= CorpusOps.Bm25TopK)
      assert(rr == (if (rank > 0) 1000000L / rank else 0L), s"rr law at $qid")
    }
    // the self-prefix gold must be findable for at least one query —
    // a ranking bug that never surfaces gold would otherwise pass
    assert(rows.exists(_._2 > 0), "no gold doc reached the top-k")
    // the ∝n exhaustive rung (documented exact baseline) obeys the
    // same laws over its every-Mod-th gold set
    val ex = CorpusOps.retrievalEvalExhaustive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("gold_rank"), r.getAs[Long]("rr_ppm")))
    val nGold = Tables.documents(spark, sf)
      .filter(col("doc_id") % CorpusOps.EvalQueryMod === 0).count()
    assert(ex.length == nGold)
    ex.foreach { case (qid, rank, rr) =>
      assert(qid % CorpusOps.EvalQueryMod == 0)
      assert(rr == (if (rank > 0) 1000000L / rank else 0L), s"rr law at $qid")
    }
  }

  test("group quantiles match a driver-side sorted replay") {
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = CorpusOps.qGroupQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("p50"), r.getAs[Long]("p90"),
          r.getAs[Long]("p99"))).toMap
    rows.groupBy(_._1).foreach { case (src, g) =>
      val vs = g.map(_._2).sorted
      def q(p: Int): Long = vs(((p.toLong * vs.length + 99) / 100).toInt - 1)
      val (n, p50, p90, p99) = got(src)
      assert(n == vs.length)
      assert(p50 == q(50), s"$src p50")
      assert(p90 == q(90), s"$src p90")
      assert(p99 == q(99), s"$src p99")
    }
  }

  test("MAD outliers match a driver-side robust-fence replay") {
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = CorpusOps.qMadOutliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Long]("n_outliers"), r.getAs[Long]("outlier_ppm"))).toMap
    rows.groupBy(_._1).foreach { case (src, g) =>
      def med(xs: Seq[Long]): Long = {
        val s = xs.sorted
        s(((50L * s.length + 99) / 100).toInt - 1)
      }
      val m = med(g.map(_._2).toSeq)
      val devs = g.map(x => math.abs(x._2 - m)).toSeq
      val mad = med(devs)
      val out = devs.count(_ > CorpusOps.MadK * mad).toLong
      val (n, gm, gmad, gout, ppm) = got(src)
      assert(n == g.length && gm == m && gmad == mad && gout == out,
        s"$src: got ($n,$gm,$gmad,$gout) want (${g.length},$m,$mad,$out)")
      assert(ppm == out * 1000000L / g.length)
    }
  }

  test("rrf fusion: driver replay of the two lists, emitted set is the top-k") {
    import org.apache.spark.sql.functions._
    import graft.operators.CorpusOps
    import spark.implicits._
    val qterms = CorpusOps.Bm25Queries.toDF("qid", "qtext")
      .select(col("qid"),
        explode(graft.functions.GraftFunctions.tokens(col("qtext"))).as("term"))
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    val bm = ranks(CorpusOps.bm25TopKFor(spark, sf, qterms))
    val ov = ranks(CorpusOps.overlapTopKFor(spark, sf, qterms))
    def rr(r: Option[Long]): Long =
      r.map(x => 1000000L / (CorpusOps.RrfK + x)).getOrElse(0L)
    val want = (bm.keySet ++ ov.keySet).map { k =>
      k -> (rr(bm.get(k)) + rr(ov.get(k)))
    }.toMap
    val got = CorpusOps.qRrfFusion(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("rrf_ppm")).toMap
    got.foreach { case (k, s) => assert(want(k) == s, s"score mismatch at $k") }
    val qids = got.keys.map(_._1).toSet
    qids.foreach { q =>
      val topWant = want.filter(_._1._1 == q).toSeq
        .sortBy { case ((_, d), s) => (-s, d) }.take(CorpusOps.Bm25TopK)
        .map(_._1).toSet
      val topGot = got.keys.filter(_._1 == q).toSet
      assert(topGot == topWant, s"fused top-k set mismatch for qid $q")
    }
    // the two rankings must actually disagree somewhere, or the
    // fusion tests nothing; and at least one doc must sit in both
    val both = got.keys.filter(k => bm.contains(k) && ov.contains(k))
    assert(both.nonEmpty, "fixture must fuse at least one overlapping doc")
    assert(both.exists(k => bm(k) != ov(k)),
      "the two scorers must rank at least one shared doc differently")
  }
}
