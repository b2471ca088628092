package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Relational}

/** Graph rank + event-analytics invariants (value-level parity is
  * the DuckDB oracle gate; these pin the structural laws).
  */
class GraphSpec extends AnyFunSuite {
  import SparkSuite._

  test("pagerank: teleport floor, bounded mass, deterministic") {
    val rows = Graph.qPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length
    val teleport = 15L * (1000000000L / n) / 100L
    assert(rows.forall(_._2 >= teleport), "every node keeps the teleport mass")
    val total = rows.map(_._2).sum
    assert(total <= 1000000000L,
      s"integer rank mass can only shrink (rounding), got $total")
    assert(total >= 900000000L, s"mass lost to rounding too aggressively: $total")
    val again = Graph.qPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.sorted.sameElements(again.sorted), "pagerank must be deterministic")
    // the fixture contains dangling (sink) nodes, and their mass is
    // redistributed rather than destroyed: without redistribution the
    // total mass after 5 damped iterations would shed ~15% per hop of
    // the sink share (n/17 of the graph) — the >= 0.9e9 floor above
    // plus an explicit sink-count pin keep the dangling path honest
    val sinks = rows.count(_._1 % Graph.SinkMod == 0)
    assert(sinks > 0, "fixture must contain sink nodes")
  }

  test("triangles: per-node counts equal an adjacency-set brute force") {
    val out = Graph.qTriangles(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent brute force: rebuild the undirected fixture in
    // plain Scala and count each node's triangles via common
    // neighbors (a different algorithm than the degree-ordered join)
    val n = out.size.toLong
    val ids = 0L until n
    val dirEdges = ids.flatMap(u =>
      Seq(u -> (u + 1) % n, u -> (u + 2) % n, u -> (u * 7 + 3) % n))
    val und = dirEdges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }.distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    ids.foreach { v =>
      val nb = adj.getOrElse(v, Set.empty)
      val triBrute = nb.toSeq.map(w => (nb & adj(w)).size).sum / 2
      val (deg, tri, clust) = out(v)
      assert(deg == nb.size.toLong, s"degree mismatch at $v")
      assert(tri == triBrute.toLong, s"triangle count mismatch at $v")
      val expClust =
        if (deg >= 2) 2L * tri * 1000000L / (deg * (deg - 1)) else 0L
      assert(clust == expClust && clust <= 1000000L)
    }
    assert(out.values.map(_._2).sum % 3 == 0, "each triangle has 3 corners")
    assert(out.values.map(_._2).sum > 0, "fixture must contain triangles")
  }

  test("label propagation equals a synchronous driver-side replay") {
    import graft.sources.Tables
    val n = Tables.documents(spark, sf).count()
    val ids = (0L until n).toArray
    // undirected closure of the triEdges fixture, self-loops dropped
    val und = ids.flatMap { u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n)
        .filter(_ != u).flatMap(d => Seq((u, d), (d, u)))
    }.toSet
    val nbrs = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    var lab = ids.map(i => i -> i).toMap
    for (_ <- 1 to Graph.LpIters) {
      lab = ids.map { v =>
        val counts = nbrs.getOrElse(v, Set.empty[Long]).toSeq
          .map(lab).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        v -> (if (counts.isEmpty) lab(v)
              else counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    val sizes = lab.values.toSeq.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
    val got = Graph.qLabelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (v, community, commSize) =>
      assert(community == lab(v), s"community mismatch at $v")
      assert(commSize == sizes(lab(v)), s"size mismatch at $v")
    }
  }

  test("modularity: contributions equal an exact BigInt replay; partition + sign laws") {
    import graft.sources.Tables
    val n = Tables.documents(spark, sf).count()
    val ids = (0L until n).toArray
    val und = ids.flatMap { u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n)
        .filter(_ != u).flatMap(d => Seq((u, d), (d, u)))
    }.toSet
    val nbrs = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    var lab = ids.map(i => i -> i).toMap
    for (_ <- 1 to Graph.LpIters) {
      lab = ids.map { v =>
        val counts = nbrs.getOrElse(v, Set.empty[Long]).toSeq
          .map(lab).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        v -> (if (counts.isEmpty) lab(v)
              else counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    val m2 = BigInt(und.size)
    val deg = und.toSeq.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val want = lab.groupBy(_._2).map { case (c, members) =>
      val vs = members.keys.toSet
      val degSum = vs.toSeq.map(deg(_)).sum
      val intra = und.count { case (a, b) => vs(a) && lab(b) == c }
      val num = BigInt(intra) * m2 - BigInt(degSum) * BigInt(degSum)
      val den = m2 * m2
      val ppm =
        if (num >= 0) (num * 1000000 / den).toLong
        else -((-num) * 1000000 / den).toLong
      c -> ((vs.size.toLong, degSum, intra.toLong, ppm))
    }
    val got = Graph.qModularity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == want,
      s"diff=${want.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, v, got.get(k)) }.take(2)}")
    // laws: communities partition the nodes; intra mass is bounded by
    // the edge mass; the total modularity lands in [-1e6, 1e6]; and
    // LPA on this fixture finds REAL structure (positive total)
    assert(got.values.map(_._1).sum == n)
    assert(got.values.map(_._3).sum <= und.size)
    val totalNum = lab.groupBy(_._2).map { case (c, members) =>
      val vs = members.keys.toSet
      val degSum = vs.toSeq.map(deg(_)).sum
      BigInt(und.count { case (a, b) => vs(a) && lab(b) == c }) * m2 -
        BigInt(degSum) * BigInt(degSum)
    }.sum
    val qPpm = (totalNum * 1000000 / (m2 * m2)).toLong
    assert(qPpm >= -1000000L && qPpm <= 1000000L)
    assert(qPpm > 0, s"LPA must find real structure on the fixture: Q=$qPpm")
  }

  test("louvain: moves equal a BigInt dQ replay; beats LPA's modularity on the fixture") {
    import graft.sources.Tables
    val n = Tables.documents(spark, sf).count()
    val ids = (0L until n).toArray
    val und = ids.flatMap { u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n)
        .filter(_ != u).flatMap(d => Seq((u, d), (d, u)))
    }.toSet
    val nbrs = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val deg = und.toSeq.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val m2 = BigInt(und.size)
    // full BigInt replay of the synchronous dQ local-move rule:
    // score(v, c) = m2*k(v,c) - d_v*d_c^{not v}, argmax, min-c ties
    var lab = ids.map(i => i -> i).toMap
    for (_ <- 1 to Graph.LouvainIters) {
      val cur = lab
      val dc = cur.toSeq.groupBy(_._2)
        .map { case (c, ms) => c -> ms.map(m => deg(m._1)).sum }
      lab = ids.map { v =>
        val k = nbrs.getOrElse(v, Set.empty[Long]).toSeq.map(cur)
          .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
        val scored = (k.keySet + cur(v)).toSeq.map { c =>
          val dcAdj = BigInt(dc(c)) -
            (if (c == cur(v)) BigInt(deg(v)) else BigInt(0))
          c -> (BigInt(k.getOrElse(c, 0L)) * m2 - BigInt(deg(v)) * dcAdj)
        }
        v -> scored.minBy { case (c, s) => (-s, c) }._1
      }.toMap
    }
    val sizes = lab.values.toSeq.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
    val got = Graph.qLouvain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (v, community, commSize) =>
      assert(community == lab(v), s"community mismatch at $v")
      assert(commSize == sizes(lab(v)), s"size mismatch at $v")
    }
    // the point of the operator: modularity ASCENT — Q(louvain) must
    // beat Q(LPA) on the ring-chord fixture (both exact BigInt)
    def qOf(part: Map[Long, Long]): BigInt = part.groupBy(_._2)
      .map { case (c, members) =>
        val vs = members.keys.toSet
        val degSum = vs.toSeq.map(deg(_)).sum
        BigInt(und.count { case (a, b) => vs(a) && part(b) == c }) * m2 -
          BigInt(degSum) * BigInt(degSum)
      }.sum
    var lpa = ids.map(i => i -> i).toMap
    for (_ <- 1 to Graph.LpIters) {
      lpa = ids.map { v =>
        val counts = nbrs.getOrElse(v, Set.empty[Long]).toSeq
          .map(lpa).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        v -> (if (counts.isEmpty) lpa(v)
              else counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    val (qLouvain, qLpa) = (qOf(lab), qOf(lpa))
    assert(qLouvain > 0, s"louvain must find real structure: $qLouvain")
    assert(qLouvain >= qLpa,
      s"modularity ascent must not lose to LPA: $qLouvain < $qLpa")
    // MULTILEVEL: aggregate to the weighted community graph, replay
    // the coarse moves in BigInt, project back — must equal the
    // operator and ascend further
    val s2 = lab.toSeq.groupBy(_._2)
      .map { case (c, ms) => c -> ms.map(m => deg(m._1)).sum }
    val cw = und.toSeq.map { case (a, b) => (lab(a), lab(b)) }
      .filter { case (a, b) => a != b }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val cwAdj = cw.keys.groupBy(_._1)
      .map { case (a, ps) => a -> ps.map(_._2).toSeq }
    var l2 = s2.keys.map(c => c -> c).toMap
    for (_ <- 1 to Graph.LouvainL2Iters) {
      val cur = l2
      val sS = cur.toSeq.groupBy(_._2)
        .map { case (cc, ms) => cc -> ms.map(m => s2(m._1)).sum }
      l2 = s2.keys.map { c =>
        val k = cwAdj.getOrElse(c, Seq.empty)
          .groupBy(cur).map { case (cc, c2s) =>
            cc -> c2s.map(c2 => cw((c, c2))).sum }
        val scored = (k.keySet + cur(c)).toSeq.map { cc =>
          val sAdj = BigInt(sS(cc)) -
            (if (cc == cur(c)) BigInt(s2(c)) else BigInt(0))
          cc -> (BigInt(k.getOrElse(cc, 0L)) * m2 - BigInt(s2(c)) * sAdj)
        }
        c -> scored.minBy { case (cc, sc) => (-sc, cc) }._1
      }.toMap
    }
    val finLab = lab.map { case (v, c) => v -> l2(c) }
    val finSizes = finLab.values.toSeq.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
    val gotMl = Graph.qLouvainMultilevel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotMl.length == n)
    gotMl.foreach { case (v, community, commSize) =>
      assert(community == finLab(v), s"multilevel community mismatch at $v")
      assert(commSize == finSizes(finLab(v)), s"multilevel size mismatch at $v")
    }
    val qMl = qOf(finLab)
    assert(qMl >= qLouvain,
      s"level-2 aggregation must not lose to level 1: $qMl < $qLouvain")
    // CONNECTIVITY audit (the Leiden-motivating statistic): per
    // community, internal components via a driver BFS replay over
    // intra-community edges; totals partition the nodes
    val gotConn = Graph.qLouvainConnectivity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val wantConn = lab.groupBy(_._2).map { case (c, members) =>
      val vs = members.keys.toSet
      val adj = vs.map(v =>
        v -> nbrs.getOrElse(v, Set.empty[Long]).filter(u =>
          vs(u) && lab(u) == c)).toMap
      var unseen = vs
      var comps = 0
      while (unseen.nonEmpty) {
        comps += 1
        var frontier = Set(unseen.head)
        unseen -= unseen.head
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj).intersect(unseen)
          unseen --= frontier
        }
      }
      c -> ((vs.size.toLong, comps.toLong, if (comps == 1) 1L else 0L))
    }
    assert(gotConn == wantConn,
      s"diff=${wantConn.collect { case (k, v) if gotConn.get(k) != Some(v) =>
        (k, v, gotConn.get(k)) }.take(2)}")
    assert(gotConn.values.map(_._1).sum == n)
    assert(gotConn.values.forall(_._2 >= 1))
    // REFINEMENT (the Leiden split): each member relabels to its
    // internal component's min id — Q must improve EXACTLY (theorem:
    // intra rows unchanged, degree penalty strictly better on any
    // split), every refined community must be connected, and the
    // operator must equal the replay relabel
    val compOf = lab.groupBy(_._2).flatMap { case (c, members) =>
      val vs = members.keys.toSet
      val adj = vs.map(v =>
        v -> nbrs.getOrElse(v, Set.empty[Long]).filter(u =>
          vs(u) && lab(u) == c)).toMap
      val out = scala.collection.mutable.Map[Long, Long]()
      var unseen = vs
      while (unseen.nonEmpty) {
        var comp = Set(unseen.head)
        var frontier = comp
        unseen -= unseen.head
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj).intersect(unseen)
          unseen --= frontier
          comp ++= frontier
        }
        val m = comp.min
        comp.foreach(v => out(v) = m)
      }
      out
    }
    val refLab = compOf.toMap
    val refSizes = refLab.values.toSeq.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
    val gotRef = Graph.qLouvainRefined(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotRef.length == n)
    gotRef.foreach { case (v, community, commSize) =>
      assert(community == refLab(v), s"refined community mismatch at $v")
      assert(commSize == refSizes(refLab(v)), s"refined size mismatch at $v")
    }
    val qRef = qOf(refLab)
    assert(qRef >= qLouvain,
      s"connectivity split must not lower Q (theorem): $qRef < $qLouvain")
    // every refined community is connected by construction
    refLab.groupBy(_._2).foreach { case (c, members) =>
      val vs = members.keys.toSet
      var seen = Set(vs.head)
      var frontier = seen
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(v => nbrs.getOrElse(v, Set.empty[Long]))
          .intersect(vs) -- seen
        seen ++= frontier
      }
      assert(seen == vs, s"refined community $c is disconnected")
    }
    // the audit applied to the ascent output (q_modularity_louvain)
    // equals the exact BigInt per-community contributions
    val gotMod = Graph.qModularityLouvain(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val wantMod = lab.groupBy(_._2).map { case (c, members) =>
      val vs = members.keys.toSet
      val degSum = vs.toSeq.map(deg(_)).sum
      val intra = und.count { case (a, b) => vs(a) && lab(b) == c }
      val num = BigInt(intra) * m2 - BigInt(degSum) * BigInt(degSum)
      val den = m2 * m2
      val ppm =
        if (num >= 0) (num * 1000000 / den).toLong
        else -((-num) * 1000000 / den).toLong
      c -> ((vs.size.toLong, degSum, intra.toLong, ppm))
    }
    assert(gotMod == wantMod,
      s"diff=${wantMod.collect { case (k, v) if gotMod.get(k) != Some(v) =>
        (k, v, gotMod.get(k)) }.take(2)}")
  }

  test("leiden: refined aggregation equals a BigInt replay; Q beats multilevel; communities connected") {
    import graft.sources.Tables
    val n = Tables.documents(spark, sf).count()
    val ids = (0L until n).toArray
    val und = ids.flatMap { u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n)
        .filter(_ != u).flatMap(d => Seq((u, d), (d, u)))
    }.toSet
    val nbrs = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val deg = und.toSeq.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val m2 = BigInt(und.size)
    def qOf(part: Map[Long, Long]): BigInt = part.groupBy(_._2)
      .map { case (c, members) =>
        val vs = members.keys.toSet
        val degSum = vs.toSeq.map(deg(_)).sum
        BigInt(und.count { case (a, b) => vs(a) && part(b) == c }) * m2 -
          BigInt(degSum) * BigInt(degSum)
      }.sum
    // level-1 ascent replay (identical to the louvain test)
    var lab = ids.map(i => i -> i).toMap
    for (_ <- 1 to Graph.LouvainIters) {
      val cur = lab
      val dc = cur.toSeq.groupBy(_._2)
        .map { case (c, ms) => c -> ms.map(m => deg(m._1)).sum }
      lab = ids.map { v =>
        val k = nbrs.getOrElse(v, Set.empty[Long]).toSeq.map(cur)
          .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
        val scored = (k.keySet + cur(v)).toSeq.map { c =>
          val dcAdj = BigInt(dc(c)) -
            (if (c == cur(v)) BigInt(deg(v)) else BigInt(0))
          c -> (BigInt(k.getOrElse(c, 0L)) * m2 - BigInt(deg(v)) * dcAdj)
        }
        v -> scored.minBy { case (c, s) => (-s, c) }._1
      }.toMap
    }
    // component-min refinement of a partition (BFS replay)
    def refine(part: Map[Long, Long]): Map[Long, Long] =
      part.groupBy(_._2).flatMap { case (c, members) =>
        val vs = members.keys.toSet
        val adj = vs.map(v =>
          v -> nbrs.getOrElse(v, Set.empty[Long]).filter(u =>
            vs(u) && part(u) == c)).toMap
        val out = scala.collection.mutable.Map[Long, Long]()
        var unseen = vs
        while (unseen.nonEmpty) {
          var comp = Set(unseen.head)
          var frontier = comp
          unseen -= unseen.head
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(adj).intersect(unseen)
            unseen --= frontier
            comp ++= frontier
          }
          val m = comp.min
          comp.foreach(v => out(v) = m)
        }
        out
      }.toMap
    val r1 = refine(lab)
    // coarse move rounds over SUPER-NODES `sup` with strengths sS,
    // weighted edges cwS, starting from `init` labels — shared by
    // the multilevel replay (sup = l1 communities, init = identity)
    // and the leiden replay (sup = refined communities, init =
    // parent l1 label)
    def coarseMoves(sup: Map[Long, Long], // node -> super-node id
                    init: Map[Long, Long]): Map[Long, Long] = {
      val s2 = sup.toSeq.groupBy(_._2)
        .map { case (c, ms) => c -> ms.map(m => deg(m._1)).sum }
      val cw = und.toSeq.map { case (a, b) => (sup(a), sup(b)) }
        .filter { case (a, b) => a != b }
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val cwAdj = cw.keys.groupBy(_._1)
        .map { case (a, ps) => a -> ps.map(_._2).toSeq }
      var l2 = init
      for (_ <- 1 to Graph.LouvainL2Iters) {
        val cur = l2
        val sS = cur.toSeq.groupBy(_._2)
          .map { case (cc, ms) => cc -> ms.map(m => s2(m._1)).sum }
        l2 = init.keys.map { c =>
          val k = cwAdj.getOrElse(c, Seq.empty)
            .groupBy(cur).map { case (cc, c2s) =>
              cc -> c2s.map(c2 => cw((c, c2))).sum }
          val scored = (k.keySet + cur(c)).toSeq.map { cc =>
            val sAdj = BigInt(sS(cc)) -
              (if (cc == cur(c)) BigInt(s2(c)) else BigInt(0))
            cc -> (BigInt(k.getOrElse(cc, 0L)) * m2 - BigInt(s2(c)) * sAdj)
          }
          c -> scored.minBy { case (cc, sc) => (-sc, cc) }._1
        }.toMap
      }
      l2
    }
    // leiden: aggregate the REFINED partition, init = parent label
    val parentOf = r1.toSeq.map { case (v, rc) => rc -> lab(v) }.toMap
    val lei2 = coarseMoves(r1, parentOf)
    val projected = r1.map { case (v, rc) => v -> lei2(rc) }
    val finLab = refine(projected)
    val finSizes = finLab.values.toSeq.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
    val got = Graph.qLeiden(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (v, community, commSize) =>
      assert(community == finLab(v), s"leiden community mismatch at $v")
      assert(commSize == finSizes(finLab(v)), s"leiden size mismatch at $v")
    }
    // quality pins, all exact BigInt: the refined-aggregation path
    // must not lose to the raw multilevel aggregation on the
    // fixture, and both final refinements only gain (theorem)
    val ml = coarseMoves(lab, lab.values.toSet.map((c: Long) => c -> c).toMap)
    val mlLab = lab.map { case (v, c) => v -> ml(c) }
    val qLei = qOf(finLab)
    val qMl = qOf(mlLab)
    assert(qLei > 0, s"leiden must find real structure: $qLei")
    assert(qLei >= qMl,
      s"leiden must not lose to multilevel on the fixture: $qLei < $qMl")
    assert(qLei >= qOf(projected),
      "final refinement must not lower Q (theorem)")
    assert(qOf(r1) >= qOf(lab),
      "level-1 refinement must not lower Q (theorem)")
    // connectivity at every level: the refined level-1 partition and
    // the final output are both connected by construction
    Seq(r1, finLab).foreach { part =>
      part.groupBy(_._2).foreach { case (c, members) =>
        val vs = members.keys.toSet
        var seen = Set(vs.head)
        var frontier = seen
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(v => nbrs.getOrElse(v, Set.empty[Long]))
            .intersect(vs) -- seen
          seen ++= frontier
        }
        assert(seen == vs, s"community $c is disconnected")
      }
    }
    // output sizes partition the corpus: one (community, size) per
    // community, sizes summing to n
    assert(got.map(r => (r._2, r._3)).distinct.map(_._2).sum == n)
  }

  test("k-core equals a synchronous driver-side peel and converges inside the bound") {
    import graft.sources.Tables
    val n = Tables.documents(spark, sf).count()
    val ids = (0L until n).toArray
    // undirected closure of the PageRank fixture (sinks get no outlinks)
    val und = ids.filter(_ % Graph.SinkMod != 0).flatMap { u =>
      Seq((u * 7 + 3) % n, (u * 13 + 5) % n)
        .filter(_ != u).flatMap(d => Seq((u, d), (d, u)))
    }.toSet
    val nbrs = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    var alive = ids.toSet
    val peeled = scala.collection.mutable.Map.empty[Long, Long]
    for (r <- 1 to Graph.KcoreRounds) {
      val drop = alive.filter(v =>
        nbrs.getOrElse(v, Set.empty[Long]).count(alive) < Graph.KcoreK)
      drop.foreach(v => peeled(v) = r.toLong)
      alive --= drop
    }
    val got = Graph.qKcore(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == n)
    ids.foreach { v =>
      val (round, inCore, coreDeg) = got(v)
      assert(round == peeled.getOrElse(v, 0L), s"peel round mismatch at $v")
      assert(inCore == (if (alive(v)) 1L else 0L))
      val expDeg =
        if (alive(v)) nbrs.getOrElse(v, Set.empty[Long]).count(alive).toLong
        else 0L
      assert(coreDeg == expDeg, s"core degree mismatch at $v")
    }
    // non-trivial cascade that CONVERGES strictly inside the bound:
    // a later round peels nothing, so one more round is a no-op
    assert(alive.nonEmpty, "core must be non-empty on the fixture")
    assert(peeled.nonEmpty, "fixture must peel someone")
    assert(peeled.values.toSet.size >= 3, "cascade should span several rounds")
    assert(peeled.values.max < Graph.KcoreRounds,
      "cascade must end strictly before the round bound (fixpoint reached)")
    assert(got.values.forall { case (r, in, d) =>
      (in == 1L && d >= Graph.KcoreK) || (in == 0L && d == 0L && r >= 1L) })
  }

  test("random walks equal a driver-side replay; sinks end walks early") {
    import graft.functions.GraftFunctions.tokenHashLong
    import graft.sources.Tables
    val n = Tables.documents(spark, sf).count()
    val ids = (0L until n).toArray
    val adj = ids.filter(_ % Graph.SinkMod != 0)
      .flatMap(u => Seq((u, (u * 7 + 3) % n), (u, (u * 13 + 5) % n)))
      .distinct.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val expect = scala.collection.mutable.Set[(Long, Long, Long)]()
    ids.foreach { w =>
      var cur = w
      expect += ((w, 0L, w))
      var k = 1
      var alive = true
      while (k <= Graph.WalkSteps && alive) {
        adj.get(cur) match {
          case Some(outs) =>
            cur = outs.minBy(d => (tokenHashLong(s"$w:$k:$d"), d))
            expect += ((w, k.toLong, cur)); k += 1
          case None => alive = false
        }
      }
    }
    val got = Graph.qRandomWalks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect.toSet,
      s"walk mismatch: missing=${(expect.toSet -- got).take(3)} " +
        s"extra=${(got -- expect).take(3)}")
    // sink starts emit only step 0; some walk must end early
    assert(got.count(_._2 == 0L) == n)
    assert(got.count(t => t._2 == Graph.WalkSteps.toLong) < n,
      "some walk should hit a sink before the last step")
  }

  test("node2vec walks equal a driver replay; the 2nd-order bias is real") {
    import graft.functions.GraftFunctions.tokenHashLong
    val n = graft.sources.Tables.documents(spark, sf).count()
    // the ring-chord fixture (see the operator's fixture note: the
    // sink fixture's linear maps never produce a return/common
    // candidate, so the bias would never engage there)
    val edges = (0L until n)
      .flatMap(u => Seq(u -> (u + 1) % n, u -> (u + 2) % n,
        u -> (u * 7 + 3) % n))
      .filter { case (a, b) => a != b }.distinct
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val eset = edges.toSet
    // full driver replay of the weighted integer race
    val want = scala.collection.mutable.Map[(Long, Long), Long]()
    for (w <- 0L until n) {
      var prev = w
      var cur = w
      want((w, 0L)) = w
      var k = 1
      var alive = adj.contains(cur)
      while (k <= Graph.WalkSteps && alive) {
        val cands = adj(cur)
        val pick =
          if (k == 1) cands.map(d =>
            (tokenHashLong(s"$w:$k:$d"), d)).min._2
          else cands.map { d =>
            val wt = if (d == prev) Graph.N2vWReturn
              else if (eset((prev, d))) Graph.N2vWMid
              else Graph.N2vWOut
            (tokenHashLong(s"$w:$k:$d") / wt, d)
          }.min._2
        prev = cur
        cur = pick
        want((w, k.toLong)) = cur
        alive = adj.contains(cur)
        k += 1
      }
    }
    val got = Graph.qNode2vecWalks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want.toMap,
      s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)} " +
        s"diff=${want.collect { case (k, v) if got.get(k) != Some(v) =>
          (k, v, got.get(k)) }.take(3)}")
    // every transition follows an edge of the fixture
    got.toSeq.groupBy(_._1._1).foreach { case (w, steps) =>
      val path = steps.sortBy(_._1._2).map(_._2)
      path.sliding(2).foreach {
        case Seq(a, b) => assert(eset((a, b)), s"walk $w jumped $a -> $b")
        case _ =>
      }
    }
    // the bias is REAL: the biased corpus must diverge from the
    // UNBIASED pick rule replayed on the SAME graph
    val uniform = scala.collection.mutable.Map[(Long, Long), Long]()
    for (w <- 0L until n) {
      var cur = w
      uniform((w, 0L)) = w
      for (k <- 1 to Graph.WalkSteps if adj.contains(cur)) {
        cur = adj(cur).map(d => (tokenHashLong(s"$w:$k:$d"), d)).min._2
        uniform((w, k.toLong)) = cur
      }
    }
    assert(got != uniform.toMap, "node2vec bias never changed a pick")
    // and the classes genuinely occur: some step's winner was a
    // common-neighbor (mid) or return candidate
    val biasedSteps = got.toSeq.groupBy(_._1._1).flatMap { case (w, steps) =>
      val path = steps.sortBy(_._1._2).map(_._2)
      path.sliding(3).collect {
        case Seq(p, _, d) if d == p || eset((p, d)) => 1
      }
    }
    assert(biasedSteps.nonEmpty, "no return/mid transition ever won")
  }

  test("walk pairs equal the window expansion of the walk corpus") {
    val w = Graph.walks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs: Seq[(Long, Long)] = w.groupBy(_._1).values.toSeq.flatMap {
      steps =>
        for {
          a <- steps.toSeq; b <- steps.toSeq
          if a._2 != b._2 && math.abs(a._2 - b._2) <= Graph.WalkWindow
        } yield (a._3, b._3)
    }
    val expect = pairs.groupBy(identity)
      .map { case ((c, x), xs) => (c, x, xs.size.toLong) }.toSet
    val got = Graph.qWalkPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // the window is symmetric: (a,b) and (b,a) counts match
    val m = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(got.forall(t => m((t._2, t._1)) == t._3))
  }

  test("n2v walk pairs equal the window expansion; the bias reaches the pair table") {
    import graft.functions.GraftFunctions.tokenHashLong
    def expand(w: Seq[(Long, Long, Long)]): Map[(Long, Long), Long] =
      w.groupBy(_._1).values.toSeq.flatMap { steps =>
        for {
          a <- steps.toSeq; b <- steps.toSeq
          if a._2 != b._2 && math.abs(a._2 - b._2) <= Graph.WalkWindow
        } yield (a._3, b._3)
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val w = Graph.qNode2vecWalks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = expand(w.toSeq)
    val got = Graph.qWalkPairsN2v(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect,
      s"diff=${expect.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, v, got.get(k)) }.take(3)}")
    // the 2nd-order bias reaches the TRAINING DATA: expand the
    // unbiased pick rule's corpus on the SAME ring-chord graph and
    // pin the pair tables apart (walks diverging is necessary but
    // not sufficient — a window expansion can wash differences out)
    val n = graft.sources.Tables.documents(spark, sf).count()
    val edges = (0L until n)
      .flatMap(u => Seq(u -> (u + 1) % n, u -> (u + 2) % n,
        u -> (u * 7 + 3) % n))
      .filter { case (a, b) => a != b }.distinct
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val uniform = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    for (wid <- 0L until n) {
      var cur = wid
      uniform += ((wid, 0L, wid))
      for (k <- 1 to Graph.WalkSteps if adj.contains(cur)) {
        cur = adj(cur).map(d => (tokenHashLong(s"$wid:$k:$d"), d)).min._2
        uniform += ((wid, k.toLong, cur))
      }
    }
    assert(got != expand(uniform.toSeq),
      "biased pair table equals the unbiased one — the bias washed out")
  }

  test("funnel steps only shrink; step 1 converts at 100%") {
    val byStep = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byStep(1)._2 == 1000000L)
    assert(byStep(1)._1 >= byStep(2)._1 && byStep(2)._1 >= byStep(3)._1)
    assert(byStep(3)._1 > 0)
  }

  test("stateful streaming funnel matches the batch stepwise-min funnel") {
    val streamed = graft.streaming.EventStreams.runFunnelToMemory(spark, sf)
      .groupBy(col("user_id")).agg(max(col("step_reached")).as("step"))
      .collect().map(r => r.getInt(1))
    val batch = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (1 to 3).foreach { k =>
      assert(streamed.count(_ >= k).toLong == batch(k),
        s"step $k: streamed ${streamed.count(_ >= k)} vs batch ${batch(k)}")
    }
  }

  test("stateful streaming cohorts rebuild the batch retention matrix") {
    val streamed = graft.streaming.EventStreams.runCohortsToMemory(spark, sf)
      .select(col("user_id"), col("cohort_day"), col("day_offset")).distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val batch = Relational.qCohort(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(streamed == batch,
      s"stream-only=${(streamed.toSet -- batch.toSet).take(3)} " +
        s"batch-only=${(batch.toSet -- streamed.toSet).take(3)}")
  }

  test("watermark-buffered funnel and cohorts equal batch under shuffled arrival inside the watermark") {
    import scala.jdk.CollectionConverters._
    val events = graft.sources.Tables.events(spark, sf)
    val schema = graft.streaming.EventStreams.rawSchema(
      org.apache.spark.sql.types.TimestampType)
    val ordered = events.select(schema.fieldNames.map(col): _*)
    // delivery key = event time jittered by up to ±3 hours (derived
    // from event_id — deterministic); delivering in jittered order
    // bounds the disorder any event sees at 6 hours, well inside the
    // 12-hour watermark the operators are told to expect
    val jittered = ordered.withColumn("dk",
        unix_micros(col("ts")) + (col("event_id") % 7 - lit(3)) * lit(3600000000L))
      .orderBy("dk").drop("dk").collect()
    val maxTs = events.agg(max(col("ts"))).head
      .getTimestamp(0).getTime
    val staged = java.nio.file.Files.createTempDirectory("graft-evbuf")
    var mtime = System.currentTimeMillis()
    def writeChunk(rows: Seq[org.apache.spark.sql.Row], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-evbuf-tmp")
      spark.createDataFrame(rows.asJava, schema)
        .coalesce(1).write.parquet(tmp.resolve("d").toString)
      val part = java.nio.file.Files.list(tmp.resolve("d")).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      val dst = staged.resolve(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
      mtime += 2000
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    for ((chunk, i) <- jittered.grouped(2000).zipWithIndex)
      writeChunk(chunk.toSeq, f"chunk$i%03d")
    // two watermark-advancing sentinels (the packStreamOrdered
    // harness shape): the first pushes the watermark past every real
    // event, the second's micro-batch fires the event-time timeouts
    // that flush remaining buffers; the sentinel user is filtered out
    for (j <- 0 until 2)
      writeChunk(Seq(org.apache.spark.sql.Row(10000000L + j,
        new java.sql.Timestamp(maxTs + (30L + j) * 86400000L),
        -1L, "noop", 0.0, "{}")), s"sentinel$j")
    val streamedFunnel = graft.streaming.EventStreams
      .runFunnelBufferedToMemory(spark, staged.toString, "12 hours")
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id")).agg(max(col("step_reached")).as("step"))
      .collect().map(r => r.getInt(1))
    val batchFunnel = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (1 to 3).foreach { k =>
      assert(streamedFunnel.count(_ >= k).toLong == batchFunnel(k),
        s"buffered funnel step $k: ${streamedFunnel.count(_ >= k)} vs ${batchFunnel(k)}")
    }
    val streamedCohorts = graft.streaming.EventStreams
      .runCohortsBufferedToMemory(spark, staged.toString, "12 hours")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("cohort_day"), col("day_offset")).distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val batchCohorts = Relational.qCohort(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(streamedCohorts == batchCohorts,
      s"stream-only=${(streamedCohorts.toSet -- batchCohorts.toSet).take(3)} " +
        s"batch-only=${(batchCohorts.toSet -- streamedCohorts.toSet).take(3)}")
  }

  test("rate anomaly equals a driver-side trailing-baseline replay") {
    import graft.sources.Tables
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay))
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    val types = ev.map(_._1).distinct
    val cnt = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = (for (t <- types; d <- d0 to d1) yield {
      val n = cnt.getOrElse((t, d), 0L)
      val win = (math.max(d0, d - 7) until d).map(pd => cnt.getOrElse((t, pd), 0L))
      val baseSum = win.sum
      val baseN = win.length.toLong
      val ratio = n * baseN * 1000000L / math.max(baseSum, 1L)
      (t, d) -> (n, baseSum, baseN, ratio,
        baseN >= Relational.RateMinBaseDays &&
          (ratio > Relational.RateSpikePpm || ratio < Relational.RateCollapsePpm))
    }).toMap
    val got = Relational.qRateAnomaly(spark, sf).collect().map(r =>
      (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.length == exp.size, "every (type, day) grid cell reports")
    got.foreach { case (k, v) =>
      assert(v == exp(k), s"cell mismatch at $k: got $v want ${exp(k)}")
    }
    // warm-up cells (thin baseline) never flag; at this SF the daily
    // counts are small enough that real Poisson noise crosses the band
    assert(got.forall { case (_, v) => !(v._5 && v._3 < Relational.RateMinBaseDays) })
    assert(got.exists(_._2._5), "small-count fixture should show anomalies")
    assert(got.exists(!_._2._5), "not everything is anomalous")
  }

  test("streaming rate anomaly equals batch on every watermark-finalized day") {
    import scala.jdk.CollectionConverters._
    import graft.sources.Tables
    val events = Tables.events(spark, sf)
    val schema = graft.streaming.EventStreams.rawSchema(
      org.apache.spark.sql.types.TimestampType)
    val ordered = events.select(schema.fieldNames.map(col): _*)
    // same jittered-delivery harness as the buffered funnel test:
    // disorder bounded at 6h, watermark told to expect 12h
    val jittered = ordered.withColumn("dk",
        unix_micros(col("ts")) + (col("event_id") % 7 - lit(3)) * lit(3600000000L))
      .orderBy("dk").drop("dk").collect()
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0).getTime
    val staged = java.nio.file.Files.createTempDirectory("graft-evrate")
    var mtime = System.currentTimeMillis()
    def writeChunk(rows: Seq[org.apache.spark.sql.Row], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-evrate-tmp")
      spark.createDataFrame(rows.asJava, schema)
        .coalesce(1).write.parquet(tmp.resolve("d").toString)
      val part = java.nio.file.Files.list(tmp.resolve("d")).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      val dst = staged.resolve(s"$name.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
      mtime += 2000
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    for ((chunk, i) <- jittered.grouped(2000).zipWithIndex)
      writeChunk(chunk.toSeq, f"chunk$i%03d")
    // sentinels push the watermark a month past the data so every
    // real day finalizes; their type is screened out of the compare
    for (j <- 0 until 2)
      writeChunk(Seq(org.apache.spark.sql.Row(10000000L + j,
        new java.sql.Timestamp(maxTs + (30L + j) * 86400000L),
        -1L, "noop", 0.0, "{}")), s"sentinel$j")
    val d0 = events.agg(min(to_date(col("ts")))).head.getDate(0)
      .toLocalDate
    val batch = Relational.qRateAnomaly(spark, sf).collect().map { r =>
      val idx = (r.getDate(1).toLocalDate.toEpochDay - d0.toEpochDay).toInt
      (r.getString(0), idx) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))
    }.toMap
    val maxIdx = batch.keys.map(_._2).max
    val streamed = graft.streaming.EventStreams
      .runRateAnomalyToMemory(spark, staged.toString, "12 hours", d0.toString)
      .filter(col("event_type") =!= "noop")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6))).toMap
    // every batch-grid cell was finalized (sentinels ran the
    // watermark out) and matches the streaming emission exactly
    batch.foreach { case (k, v) =>
      assert(streamed.get(k).contains(v),
        s"cell $k: streamed ${streamed.get(k)} vs batch $v")
    }
    // zero-count tail days past the data (finalized by the sentinel
    // watermark) are the monitor continuing over silence — all flagged
    // collapses once the baseline drains, none inside the batch range
    val tail = streamed.keys.filter(_._2 > maxIdx)
    assert(tail.nonEmpty, "sentinels must have finalized tail days")
    assert(streamed.exists(_._2._5), "fixture anomalies must surface")
  }

  test("linear attribution: per-purchase shares sum to ~1e6, clicks stay windowed") {
    import graft.sources.Tables
    val rows = Relational.qAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // recompute the pair table to check the share algebra: per
    // purchase, its touches' shares are each 1e6 div n — the total
    // attributed mass per purchase is 1e6 minus the floor loss (< n)
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val purch = ev.filter(_._3 == "purchase")
    val touches = purch.map { case (pid, pu, _, pts) =>
      pid -> clicks.count { case (_, cu, _, cts) =>
        cu == pu && cts >= pts - Relational.AttributionWindowUs && cts <= pts }
    }.filter(_._2 > 0).toMap
    val totalShare = rows.map(_._4).sum
    val expected = touches.values.map(n => (1000000L / n) * n).sum
    assert(totalShare == expected,
      s"attributed mass $totalShare != per-purchase floor sums $expected")
    touches.values.foreach(n =>
      assert(1000000L - (1000000L / n) * n < n, "floor loss exceeds n"))
  }

  test("grouping sets emits exactly the two marginals plus the grand total") {
    val rows = Relational.qGroupingSets(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)))
    val byShape = rows.groupBy { case (a, b, _) => (a.isDefined, b.isDefined) }
    assert(!byShape.contains((true, true)), "cube-style cross cells must be absent")
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(byShape((false, false)).map(_._3).sum == total)
    assert(byShape((true, false)).map(_._3).sum == total)
    assert(byShape((false, true)).map(_._3).sum == total)
  }

  test("cohort offsets are non-negative and offset-0 rows partition the users") {
    val rows = Relational.qCohort(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.forall(_._2 >= 0))
    val day0Users = rows.filter(_._2 == 0).map(_._3).sum
    val distinctUsers = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(day0Users == distinctUsers,
      "every user appears exactly once at their cohort's offset 0")
  }

  test("link prediction matches a driver-side common-neighbor replay") {
    val n = graft.sources.Tables.documents(spark, sf).count()
    // undirected closure of the triEdges fixture, adjacency sets
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    def add(a: Long, b: Long): Unit = if (a != b) {
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    (0L until n).foreach { u =>
      add(u, (u + 1) % n); add(u, (u + 2) % n); add(u, (u * 7 + 3) % n)
    }
    val got = Graph.qLinkPredict(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("common"), r.getAs[Long]("jaccard_ppm"))).toMap
    // brute force: all non-adjacent pairs with >= MinCommon shared
    // neighbors whose shared neighbors pass the hub cap (none is
    // capped on this fixture — assert that so the cap stays honest)
    assert(adj.values.forall(_.size <= Graph.LinkHubCap),
      "fixture must not hide the cap branch")
    val want = for {
      a <- adj.keys.toSeq; b <- adj.keys.toSeq
      if a < b && !adj(a).contains(b)
      cn = (adj(a) & adj(b)).size.toLong
      if cn >= Graph.LinkMinCommon
    } yield (a, b) -> cn
    assert(got.keySet == want.map(_._1).toSet, "candidate pair set")
    want.foreach { case (k, cn) =>
      assert(got(k)._1 == cn, s"common count at $k")
      val (da, db) = (adj(k._1).size.toLong, adj(k._2).size.toLong)
      assert(got(k)._2 == cn * 1000000L / (da + db - cn), s"jaccard at $k")
    }
  }

  test("hyperball: iterated registers EQUAL registers of the exact balls") {
    import graft.functions.GraftFunctions.tokenHash
    import graft.operators.Sketches
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val e = Graph.edges(docs, n)
    val iterated = Graph.hyperBallRegisters(docs, e, Graph.HopT).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // ground truth: HLL registers computed DIRECTLY from the exact
    // ball membership — propagation must lose nothing (max-union law)
    val h = tokenHash(col("u").cast("string"))
    val direct = Graph.reachPairs(docs, e, Graph.HopT)
      .select(col("v"), (h % Sketches.HllM).as("bucket"),
        Sketches.hllRank(h).as("rank"))
      .groupBy(col("v"), col("bucket")).agg(max(col("rank")).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(iterated == direct,
      "HyperBall register propagation must be bit-identical to the " +
        "registers of the exact reachability sets")
  }

  test("hyperball: packed binary iteration is bit-equal to the long format") {
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val e = Graph.edges(docs, n)
    val long = Graph.hyperBallRegisters(docs, e, Graph.HopT).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val packed = Graph.unpackRegs(Graph.hyperBallPacked(docs, e, Graph.HopT))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(packed == long,
      "packed 64-byte register rows must unpack to exactly the " +
        "long-format (v, bucket, rank) table at every node")
    // and the shuffle-free packed estimate matches the agg-based one
    val estL = Graph.hyperBallEstimate(
        Graph.hyperBallRegisters(docs, e, Graph.HopT)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val estP = Graph.hyperBallEstimatePacked(
        Graph.hyperBallPacked(docs, e, Graph.HopT)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(estP.keySet == estL.keySet)
    estL.foreach { case (v, el) =>
      assert(math.abs(estP(v) - el) <= 1e-9 * math.max(1.0, el),
        s"packed estimate diverges at $v: ${estP(v)} vs $el")
    }
  }

  test("hyperball: estimates track exact ball sizes; hop plot is monotone") {
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val e = Graph.edges(docs, n)
    val est = Graph.hyperBallEstimate(
        Graph.hyperBallRegisters(docs, e, Graph.HopT)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = Graph.reachPairs(docs, e, Graph.HopT)
      .groupBy(col("v")).agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    // balls are small (<= ~2^t+... members) so the m=64 sketch sits in
    // its linear-counting regime: per-node error is tight, and the
    // aggregate N(t) estimate must land within a few percent
    val nHat = est.values.sum
    val nTrue = exact.values.sum.toDouble
    assert(math.abs(nHat - nTrue) / nTrue < 0.10,
      s"aggregate neighborhood estimate off: $nHat vs $nTrue")
    val perNodeOk = exact.count { case (v, c) =>
      math.abs(est(v) - c) <= math.max(2.0, 0.35 * c) }
    assert(perNodeOk >= (exact.size * 95) / 100,
      s"per-node estimates outside band: ${exact.size - perNodeOk}")
    // hop plot: N(t) non-decreasing in t, N(0) = n
    val hp = Graph.qHopPlot(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(hp.head == (0L, n), "N(0) is one pair per node")
    assert(hp.sliding(2).forall(w => w(1)._2 >= w(0)._2), "monotone growth")
    assert(hp.last._2 > n, "the fixture graph must actually expand")
    // effective diameter: minimal t reaching 90% of N(HopT)
    val ed = Graph.qEffDiameter(spark, sf).head
    val need = (Graph.EffDiamPct * hp.last._2 + 99) / 100
    val tEff = ed.getAs[Long]("t_eff")
    assert(hp.find(_._2 >= need).get._1 == tEff, "minimal-t law")
    assert(ed.getAs[Long]("coverage_ppm") >= Graph.EffDiamPct * 10000L)
  }

  test("label spreading: seeds dominate, mass bounded, only link-reachable score") {
    val rows = Graph.qLabelSpread(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.size.toLong
    val seeds = rows.keys.filter(_ % Graph.SpreadSeedMod == 0L)
    // every seed keeps at least its (100−α)% floor; nothing exceeds 1e6
    assert(seeds.forall(v => rows(v) >=
      (100 - Graph.SpreadAlphaPct) * 1000000L / 100), "seed floor")
    assert(rows.values.forall(y => y >= 0 && y <= 1000000L), "ppm bounds")
    // non-seeds score iff within SpreadIters hops of a seed along edges
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val e = Graph.edges(docs, n).collect().map(r => (r.getLong(0), r.getLong(1)))
    var reach = seeds.toSet
    for (_ <- 1 to Graph.SpreadIters)
      reach = reach ++ e.filter(p => reach(p._1)).map(_._2)
    rows.foreach { case (v, y) =>
      if (!reach(v)) assert(y == 0L, s"unreachable node $v scored $y")
    }
    assert(rows.count { case (v, y) =>
      y > 0 && v % Graph.SpreadSeedMod != 0L } > 0,
      "labels must actually spread to non-seeds")
  }

  /** Driver-side Tarjan (iterative, explicit stack — no JVM stack
    * risk on chain graphs), relabeled to the min-member convention
    * the distributed rungs use.
    */
  private def tarjanScc(verts: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val index = scala.collection.mutable.Map[Long, Int]()
    val lowlink = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.ArrayBuffer[Long]()
    val comp = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    for (root <- verts if !index.contains(root)) {
      // iterative DFS: frames of (vertex, next child offset)
      val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
      while (work.nonEmpty) {
        val (v, ci) = work.last
        if (ci == 0) {
          index(v) = counter; lowlink(v) = counter; counter += 1
          stack += v; onStack += v
        }
        val kids = adj.getOrElse(v, Seq.empty)
        if (ci < kids.length) {
          work(work.length - 1) = (v, ci + 1)
          val w = kids(ci)
          if (!index.contains(w)) work += ((w, 0))
          else if (onStack(w)) lowlink(v) = math.min(lowlink(v), index(w))
        } else {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val (p, _) = work.last
            lowlink(p) = math.min(lowlink(p), lowlink(v))
          }
          if (lowlink(v) == index(v)) {
            val members = scala.collection.mutable.ArrayBuffer[Long]()
            var w = -1L
            while ({ w = stack.remove(stack.length - 1); onStack -= w
                     members += w; w != v }) ()
            val id = members.min
            members.foreach(m => comp(m) = id)
          }
        }
      }
    }
    comp.toMap
  }

  test("scc: closure rung and coloring rung both equal a Tarjan replay") {
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val e = Graph.sccEdges(docs, n)
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val verts = (0L until n).toSeq
    val want = tarjanScc(verts, edges)
    val sizes = want.values.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val closure = Graph.qScc(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(closure.keySet == verts.toSet)
    verts.foreach { v =>
      assert(closure(v) == ((want(v), sizes(want(v)))),
        s"closure scc at $v: ${closure(v)} vs Tarjan ${(want(v), sizes(want(v)))}")
    }
    // the production FW-BW-MIN peel must produce the identical labeling
    val colored = Graph.sccColoring(docs, e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(colored == closure, "coloring rung must equal the closure rung")
    // fixture sanity: both multi-node SCCs and singletons exist
    val nontrivial = closure.values.map(_._1).toSeq.distinct
      .count(id => closure(id)._2 > 1)
    assert(nontrivial > 1, "fixture must contain multi-node SCCs")
    assert(closure.values.exists(_._2 == 1L), "and singleton SCCs")
    // bow-tie decomposition over the same fixture: classes partition
    // the nodes and agree with a driver-side reachability replay
    val bt = Graph.qBowtie(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(bt.keySet == verts.toSet)
    val adjF = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val adjB = edges.groupBy(_._2).map { case (k, vs) => k -> vs.map(_._1) }
    def reachFrom(seed: Set[Long], adj: Map[Long, Seq[Long]]): Set[Long] = {
      val seen = scala.collection.mutable.Set(seed.toSeq: _*)
      val q = scala.collection.mutable.Queue(seed.toSeq: _*)
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj.getOrElse(u, Seq.empty).foreach { w =>
          if (!seen(w)) { seen += w; q += w }
        }
      }
      seen.toSet
    }
    val sccSizes = want.values.groupBy(identity)
      .map { case (k, vs) => k -> vs.size }
    val coreId = sccSizes.toSeq.maxBy { case (id, s) => (s, -id) }._1
    val coreSet = want.filter(_._2 == coreId).keySet
    val canReachCore = reachFrom(coreSet, adjB)
    val fromCoreSet = reachFrom(coreSet, adjF)
    verts.foreach { v =>
      val wantCls =
        if (want(v) == coreId) "core"
        else if (canReachCore(v)) "in"
        else if (fromCoreSet(v)) "out"
        else "other"
      assert(bt(v)._2 == wantCls, s"bowtie class at $v: ${bt(v)._2} vs $wantCls")
    }
    assert(Set("core", "in", "out", "other").subsetOf(bt.values.map(_._2).toSet),
      "fixture must exercise all four bow-tie classes")
  }

  test("degree distribution: node mass and edge mass conserved on both sides") {
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val nEdges = Graph.edges(docs, n).count()
    val rows = Graph.qDegreeDist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sum == n, "in-degree histogram must cover every node")
    assert(rows.map(_._3).sum == n, "out-degree histogram must cover every node")
    assert(rows.map(t => t._1 * t._2).sum == nEdges, "Σ deg·n_in = |E|")
    assert(rows.map(t => t._1 * t._3).sum == nEdges, "Σ deg·n_out = |E|")
    // the fixture's sinks show up as out-degree-0 mass
    assert(rows.find(_._1 == 0L).exists(_._3 >= n / Graph.SinkMod),
      "sink nodes must appear at out-degree 0")
  }

  test("scc coloring: pure cycle and pure chain edge cases") {
    import spark.implicits._
    val n = 17L
    val docs = (0L until n).toDF("doc_id")
    // one n-cycle: a single SCC, id 0, size n — the worst case for
    // label-propagation round counts (diameter = n; trim removes
    // nothing, the fixpoint must do the work)
    val cyc = (0L until n).map(u => (u, (u + 1) % n)).toDF("src", "dst")
    val c1 = Graph.sccColoring(docs, cyc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c1.length == n && c1.forall(t => t._2 == 0L && t._3 == n))
    // one n-chain: all singletons
    val chain = (0L until n - 1).map(u => (u, u + 1)).toDF("src", "dst")
    val c2 = Graph.sccColoring(docs, chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c2.length == n && c2.forall(t => t._2 == t._1 && t._3 == 1L))
  }

  test("harmonic centrality: HyperBall estimate tracks the exact ppm rung") {
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val e = Graph.edges(docs, n)
    val exact = Graph.qHarmonic(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) / 1e6)).toMap
    val est = Graph.hyperBallHarmonic(docs, e, Graph.HopT).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet)
    // sinks have hc = 0 exactly (no outlinks ⇒ the ball never grows)
    // and the estimator must agree exactly: identical registers ⇒
    // telescoping terms cancel to 0.0
    val sinks = exact.keys.filter(_ % Graph.SinkMod == 0L)
    assert(sinks.nonEmpty && sinks.forall(v => exact(v) == 0.0 && est(v) == 0.0),
      "sink nodes must score exactly zero in both rungs")
    val totErr = exact.keys.map(v => math.abs(est(v) - exact(v))).sum /
      math.max(1.0, exact.values.sum)
    assert(totErr < 0.10, s"aggregate harmonic error $totErr")
  }

  test("trustrank: trust reaches exactly the seed-reachable set, mass bounded") {
    val rows = Graph.qTrustrank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = rows.size.toLong
    val seeds = rows.keys.filter(_ % Graph.TrustSeedMod == 0).toSet
    assert(seeds.nonEmpty)
    // driver-side forward reachability from the seeds
    val adj = (0L until n).filter(_ % Graph.SinkMod != 0)
      .flatMap(u => Seq(u -> (u * 7 + 3) % n, u -> (u * 13 + 5) % n))
      .filter { case (a, b) => a != b }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val reach = scala.collection.mutable.Set(seeds.toSeq: _*)
    val q = scala.collection.mutable.Queue(seeds.toSeq: _*)
    while (q.nonEmpty) {
      adj.getOrElse(q.dequeue(), Seq.empty).foreach { w =>
        if (!reach(w)) { reach += w; q += w }
      }
    }
    rows.foreach { case (v, t) =>
      if (!reach(v)) assert(t == 0L, s"unreachable $v scored $t")
    }
    assert(rows.count { case (v, t) => t > 0 && !seeds(v) } > 0,
      "trust must flow beyond the seeds")
    val teleport = 15L * (1000000000L / seeds.size) / 100L
    seeds.foreach(v => assert(rows(v) >= teleport, s"seed $v below teleport"))
    val total = rows.values.sum
    assert(total <= 1000000000L, s"trust mass can only shrink, got $total")
    // spam-demotion contract: a non-seed page's trust is bounded by
    // what its in-links deliver — and the fixture has pages with
    // in-links only from unreachable nodes, which score exactly 0
    assert(rows.values.exists(_ == 0L), "fixture has untrusted pages")
  }

  test("hits: equals a driver replay; sinks are pure authorities") {
    val rows = Graph.qHits(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val n = rows.size.toLong
    val edges = (0L until n).filter(_ % Graph.SinkMod != 0)
      .flatMap(u => Seq(u -> (u * 7 + 3) % n, u -> (u * 13 + 5) % n))
      .distinct.filter { case (a, b) => a != b }
    // driver replay of the exact integer iteration (BigInt totals —
    // the decimal(38,0) lane)
    var h = (0L until n).map(_ -> 1000000L).toMap
    var a = (0L until n).map(_ -> 0L).toMap
    for (_ <- 1 to Graph.HitsIters) {
      val aRaw = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => h(e._1)).sum }
      val aTot = BigInt(aRaw.values.sum).max(1)
      a = (0L until n).map(v =>
        v -> (BigInt(aRaw.getOrElse(v, 0L)) * 1000000 / aTot).toLong).toMap
      val hRaw = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => a(e._2)).sum }
      val hTot = BigInt(hRaw.values.sum).max(1)
      h = (0L until n).map(v =>
        v -> (BigInt(hRaw.getOrElse(v, 0L)) * 1000000 / hTot).toLong).toMap
    }
    (0L until n).foreach { v =>
      assert(rows(v) == ((h(v), a(v))), s"node $v: ${rows(v)} vs driver")
    }
    // the fixture's sinks have no outlinks: hub score exactly 0
    val sinks = (0L until n).filter(_ % Graph.SinkMod == 0)
    assert(sinks.nonEmpty && sinks.forall(v => rows(v)._1 == 0L))
    // and authority flows: some sink is a genuine authority
    assert(sinks.exists(v => rows(v)._2 > 0L), "no sink earned authority")
    // hubs exist (non-sink nodes pointing at good authorities)
    assert(rows.values.exists(_._1 > 0L))
  }

  test("ppr: equals a driver replay; mass stays in the seed's out-neighborhood") {
    val got = Graph.qPpr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val n = graft.sources.Tables.documents(spark, sf).count()
    val edges = (0L until n).filter(_ % Graph.SinkMod != 0)
      .flatMap(u => Seq(u -> (u * 7 + 3) % n, u -> (u * 13 + 5) % n))
      .distinct.filter { case (a, b) => a != b }
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = adj.map { case (k, vs) => k -> vs.size.toLong }
    val seeds = (0L until n).filter(_ % Graph.PprSeedMod == 0)
    val want = scala.collection.mutable.Map[(Long, Long), Long]()
    for (s <- seeds) {
      var x = Map(s -> 1000000000L)
      for (_ <- 1 to Graph.PprIters) {
        val dang = x.collect {
          case (v, m) if !deg.contains(v) => m }.sum
        val inflow = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        x.foreach { case (v, m) =>
          adj.getOrElse(v, Seq.empty).foreach { w =>
            inflow(w) += m / deg(v) } }
        val cand = inflow.keySet + s
        x = cand.map { v =>
          val tele = if (v == s) Graph.PprTeleport else 0L
          val dmass = if (v == s) dang else 0L
          v -> (tele + 85L * (inflow(v) + dmass) / 100L)
        }.toMap
      }
      x.foreach { case (v, m) => want((s, v)) = m }
    }
    assert(got == want.toMap,
      s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)}")
    // locality: every scored node is in the seed's PprIters-hop
    // out-neighborhood (the sparse-state contract)
    val reach = seeds.map { s =>
      var b = Set(s)
      for (_ <- 1 to Graph.PprIters)
        b = b ++ b.flatMap(v => adj.getOrElse(v, Seq.empty))
      s -> b
    }.toMap
    got.keys.foreach { case (s, v) =>
      assert(reach(s)(v), s"($s, $v) outside the seed's ball") }
    // every seed keeps at least its teleport mass
    seeds.foreach(s => assert(got((s, s)) >= Graph.PprTeleport))
  }

  test("ppr push: equals a replay; eps=0 telescopes to power; residual certifies eps") {
    val n = graft.sources.Tables.documents(spark, sf).count()
    val edges = (0L until n).filter(_ % Graph.SinkMod != 0)
      .flatMap(u => Seq(u -> (u * 7 + 3) % n, u -> (u * 13 + 5) % n))
      .distinct.filter { case (a, b) => a != b }
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = adj.map { case (k, vs) => k -> vs.size.toLong }
    val seeds = (0L until n).filter(_ % Graph.PprSeedMod == 0)
    // exact driver replay of the thresholded push (sparse maps)
    def pushReplay(epsPpb: Long, rounds: Int): Map[(Long, Long), (Long, Long)] = {
      val thr = math.max(1L, epsPpb)
      val out = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
      for (s <- seeds) {
        var p = Map[Long, Long]().withDefaultValue(0L)
        var r = Map(s -> 1000000000L).withDefaultValue(0L)
        var round = 0
        var conv = false
        while (round < rounds && !conv) {
          round += 1
          val pushed = r.filter(_._2 >= thr)
          if (pushed.isEmpty) conv = true
          else {
            val dang = pushed.collect {
              case (v, m) if !deg.contains(v) => m }.sum
            val inflow = scala.collection.mutable.Map[Long, Long]()
              .withDefaultValue(0L)
            pushed.foreach { case (v, m) =>
              adj.getOrElse(v, Seq.empty).foreach(w => inflow(w) += m / deg(v)) }
            val held = r.filter(kv => kv._2 > 0 && kv._2 < thr)
            val newP = (p.keySet ++ pushed.keySet).map(v =>
              v -> (p(v) + (if (r(v) >= thr) 15L * r(v) / 100L else 0L))).toMap
            val cand = inflow.keySet ++ held.keySet ++
              (if (dang > 0) Set(s) else Set.empty[Long])
            val newR = cand.map(v => v -> (held.getOrElse(v, 0L) +
              85L * (inflow(v) + (if (v == s) dang else 0L)) / 100L)).toMap
            p = newP.withDefaultValue(0L)
            r = newR.withDefaultValue(0L)
          }
        }
        (p.keySet ++ r.keySet).foreach { v =>
          if (p(v) != 0 || r(v) != 0) out((s, v)) = (p(v), r(v)) }
      }
      out.toMap
    }
    // 1) bit-exact vs the replay, both at eps=0 and the production eps
    val push0 = Graph.pprPush(spark, sf, epsPpb = 0L,
        rounds = Graph.PprIters).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(push0 == pushReplay(0L, Graph.PprIters), "eps=0 replay mismatch")
    val pushE = Graph.pprPush(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(pushE == pushReplay(Graph.PprPushEpsPpb, Graph.PprPushRounds),
      "eps replay mismatch")
    // 2) telescoping: at eps=0 and the SAME round count, p + r is the
    // power iterate's series (exact in real arithmetic; the integer
    // floors land on different subterms, so the pin is a small
    // measured drift bound, not equality)
    val power = Graph.qPpr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val keys = power.keySet ++ push0.keySet
    val maxDiff = keys.map { k =>
      val x = power.getOrElse(k, 0L)
      val (p, r) = push0.getOrElse(k, (0L, 0L))
      math.abs(x - (p + r))
    }.max
    assert(maxDiff <= 100L * Graph.PprIters,
      s"eps=0 push drifted $maxDiff ppb from the power iterate")
    // 3) ACL certificate on the production rung: for every node,
    // |p_eps - power| <= the seed's REMAINING residual mass (+ the
    // same floor-drift allowance) — the bound a consumer reads off
    // residual_ppb without ever running the power form
    val resTotal = pushE.toSeq.groupBy(_._1._1)
      .map { case (s, rows) => s -> rows.map(_._2._2).sum }
      .withDefaultValue(0L)
    (power.keySet ++ pushE.keySet).foreach { case (s, v) =>
      val x = power.getOrElse((s, v), 0L)
      val p = pushE.getOrElse((s, v), (0L, 0L))._1
      assert(math.abs(x - p) <= resTotal(s) + 100L * Graph.PprPushRounds,
        s"ACL bound violated at ($s, $v): |$x - $p| > ${resTotal(s)}")
    }
    // 4) run-to-convergence: with enough rounds the push FIXPOINT is
    // observable from the output alone — every residual sits below ε
    // (the loop's empty-frontier exit), which is exactly the ACL
    // termination state whose total remaining error is ≤ |state|·ε.
    // (The bounded-round production default stops at PprPushRounds
    // with the residual certificate carrying whatever mass remains —
    // pin 3 above is the contract that makes that honest.)
    val eps = 50000000L
    val pushC = Graph.pprPush(spark, sf, epsPpb = eps, rounds = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(pushC == pushReplay(eps, 32), "converged replay mismatch")
    pushC.foreach { case ((s, v), (_, r)) =>
      assert(r < eps, s"unconverged residual $r at ($s, $v)") }
  }

  test("betweenness: equals a driver-side hop-bounded Brandes replay") {
    val got = Graph.qBetweenness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = got.size.toLong
    val adj = (0L until n).filter(_ % Graph.SinkMod != 0)
      .flatMap(u => Seq(u -> (u * 7 + 3) % n, u -> (u * 13 + 5) % n))
      .distinct.filter { case (a, b) => a != b }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val want = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (s <- 0L until n if s % Graph.BetwSrcMod == 0) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      for (d <- 1 to Graph.BetwHops) {
        val nextSig = scala.collection.mutable.Map[Long, Long]()
        frontier.foreach(v => adj.getOrElse(v, Seq.empty).foreach { w =>
          if (!dist.contains(w)) nextSig(w) = nextSig.getOrElse(w, 0L) + sigma(v)
        })
        nextSig.foreach { case (w, sg) => dist(w) = d; sigma(w) = sg }
        frontier = nextSig.keys.toSeq
      }
      val delta = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (d <- (Graph.BetwHops - 1) to 0 by -1;
           v <- dist.collect { case (v, dv) if dv == d => v }) {
        delta(v) = adj.getOrElse(v, Seq.empty)
          .filter(w => dist.get(w).contains(d + 1))
          .map(w => sigma(v) * (1000000L + delta(w)) / sigma(w)).sum
      }
      dist.keys.filter(_ != s).foreach(v => want(v) += delta(v))
    }
    got.foreach { case (v, b) =>
      assert(b == want(v), s"betweenness at $v: $b vs replay ${want(v)}")
    }
    assert(got.values.exists(_ > 0L), "some node must carry dependency mass")
    assert(got.values.forall(_ >= 0L))
  }

  test("ktruss: synchronous peel equals a driver replay; clique blocks survive") {
    val docs = sources.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val canon = Graph.trussEdges(docs, n).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent replay: NAIVE common-neighbor support (a different
    // algorithm than the degree-ordered enumeration) + synchronous peel
    def support(alive: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = alive.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      alive.iterator.map { case (u, v) =>
        (u, v) -> adj(u).intersect(adj(v)).size
      }.toMap
    }
    val peel = scala.collection.mutable.Map[(Long, Long), Long]()
    var alive = canon
    for (r <- 1 to Graph.TrussRounds) {
      val supp = support(alive)
      val dead = alive.filter(e => supp(e) < Graph.TrussK - 2)
      dead.foreach(e => peel(e) = r.toLong)
      alive = alive -- dead
    }
    val finalSupp = support(alive)
    val got = Graph.qKtruss(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == canon, "one output row per fixture edge")
    canon.foreach { e =>
      val want =
        if (alive(e)) (0L, 1L, finalSupp(e).toLong)
        else (peel(e), 0L, 0L)
      assert(got(e) == want, s"edge $e: ${got(e)} vs replay $want")
    }
    // the cascade converges strictly before the round bound, the
    // truss is non-empty, and every survivor honors the invariant
    assert(alive.nonEmpty, "fixture must leave a surviving truss")
    assert(peel.values.max < Graph.TrussRounds,
      "peel must converge strictly before the bound")
    assert(alive.forall(e => finalSupp(e) >= Graph.TrussK - 2),
      "every surviving edge has support >= k-2")
    // and the cascade is real: at least two distinct peel rounds
    assert(peel.values.toSet.size >= 2, "multi-round cascade expected")
  }

  test("assortativity + reciprocity: exact rational replay") {
    val rows = Graph.qAssortativity(spark, sf).collect()
    assert(rows.length == 1)
    val n = sources.Tables.documents(spark, sf).count()
    val dirE = (0L until n).filter(_ % Graph.SinkMod != 0)
      .flatMap(u => Seq(u -> (u * 7 + 3) % n, u -> (u * 13 + 5) % n))
      .distinct.filter { case (a, b) => a != b }
    val und = dirE.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val deg = und.groupBy(_._1).map { case (k, vs) => k -> vs.size.toLong }
    val ends = und.map { case (u, v) => (deg(u), deg(v)) }
    val m = BigInt(ends.size)
    val sx = ends.map(e => BigInt(e._1)).sum
    val sxy = ends.map(e => BigInt(e._1) * e._2).sum
    val sx2 = ends.map(e => BigInt(e._1) * e._1).sum
    val num = m * sxy - sx * sx
    val den = m * sx2 - sx * sx
    val rppm =
      if (den == 0) BigInt(0)
      else if (num >= 0) (num * 1000000) / den
      else -((-num * 1000000) / den)
    val r0 = rows(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getLong(3),
      r0.getLong(4)) ==
      ((m.toLong, sx.toLong, sxy.toLong, sx2.toLong, rppm.toLong)))
    assert(math.abs(rppm.toLong) <= 1000000L, "r is a correlation")
    val rec = Graph.qReciprocity(spark, sf).collect()
    assert(rec.length == 1)
    val eset = dirE.toSet
    val nRecip = dirE.count { case (a, b) => eset((b, a)) }.toLong
    assert((rec(0).getLong(0), rec(0).getLong(1), rec(0).getLong(2)) ==
      ((dirE.size.toLong, nRecip, 1000000L * nRecip / dirE.size)))
  }
}
