package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Physical-plan assertions: the scale-critical properties — filters
  * and projections reach the parquet scan, dim joins broadcast,
  * aggregates partial-aggregate — must hold, not just correctness.
  */
class PlanSpec extends AnyFunSuite {
  import SparkSuite._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter+projection push down to the parquet scan") {
    val p = plan(Relational.qFilterPushdown(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // projection pruning: scan must not read the unused join keys
    assert(p.contains("ReadSchema"))
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("l_orderkey"),
      "scan reads columns the query never uses")
  }

  test("dim-side joins use broadcast hash join") {
    val p = plan(Relational.qBroadcastJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q1 aggregate is partially aggregated (map-side combine)") {
    val p = plan(Relational.q1Agg(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), "no partial aggregation before the exchange")
  }

  test("top-k uses TakeOrderedAndProject, not a global window") {
    val p = plan(Relational.qUnionSort(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), "top-k fell back to a single-partition window")
  }

  test("per-group top-k windows get the WindowGroupLimit pushdown") {
    // rank<=k filters: Spark 3.5+ inserts a WindowGroupLimit below
    // the shuffle so each map task keeps only k rows per group — the
    // difference between shuffling the whole fact table and k*groups
    // rows at 100 TB. (q_window deliberately can't get it: its
    // running_rev needs every preceding row, so only pure-rank
    // windows qualify.)
    val tfidf = plan(operators.TextAnalysis.qTfidf(spark, sf))
    assert(tfidf.contains("WindowGroupLimit"),
      "tfidf rank<=3 did not push a group-limit below the window")
    // The brute ANN top-k no longer windows at all (r15): TopKCos is
    // a k-slot partial AGGREGATE, so the plan must show a partial
    // ObjectHashAggregate below the exchange and NO sort of the
    // queries×corpus expansion (the window plan local-sorted the
    // full n²-row expansion before its WindowGroupLimit).
    val ann = plan(operators.Similarity.qAnnBrute(spark, sf))
    assert(ann.contains("partial_topkcos"),
      "brute ANN top-k lost its map-side partial top-k aggregation")
    assert(!ann.contains("Window"),
      "brute ANN top-k regressed to a window plan")
    assert(!ann.contains("Sort "),
      "brute ANN top-k sorts the full query-corpus expansion")
  }

  test("IVF ANN: centroid set broadcasts, posting-list join is equi") {
    val p = plan(operators.Similarity.ivfTopK(
      graft.sources.Tables.embeddings(spark, sf)))
    assert(!p.contains("CartesianProduct"), "IVF degenerated to a cross join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(500))
  }

  test("minhash LSH candidate join is an equi-join, not cartesian") {
    val p = plan(operators.Dedup.minhashPairs(operators.Dedup.corpus(spark, sf)))
    assert(!p.contains("CartesianProduct"), "LSH banding degenerated to a cross join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString("\n"))
  }

  test("DimBroadcastRule broadcasts dim scans without hints or thresholds") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.DimBroadcastRule
    try {
      import org.apache.spark.sql.functions.col
      val j = graft.sources.Tables.lineitem(spark, sf)
        .join(graft.sources.Tables.supplier(spark, sf),
          col("l_suppkey") === col("s_suppkey"))
      j.collect()
      val p = plan(j)
      assert(p.contains("BroadcastHashJoin"),
        s"dim table was not auto-broadcast:\n$p")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.DimBroadcastRule)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    }
  }

  test("as-of join and sessionize stay within two shuffle boundaries") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      val p = plan(df)
      p.sliding("Exchange".length).count(_ == "Exchange")
    }
    // as-of: one Exchange per union branch feeding the single keyed
    // window; sessionize: window shuffle + final session aggregate
    assert(exchanges(Relational.qAsofJoin(spark, sf)) <= 2)
    assert(exchanges(Relational.qSessionize(spark, sf)) <= 2)
  }

  test("dedup/similarity shuffle counts stay pinned") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      def flatten(pl: SparkPlan): Seq[SparkPlan] = pl match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec => q +: flatten(q.plan)
        case _ => pl +: pl.children.flatMap(flatten)
      }
      flatten(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeExec])
    }
    // ceilings from the current audited plans (PlanAudit): a refactor
    // that re-computes the signature pipeline per branch or loses a
    // broadcast shows up here as extra shuffles
    assert(shuffles(operators.Dedup.simhashPairs(
      operators.Dedup.corpus(spark, sf))) <= 4, "simhash pairs plan grew")
    assert(shuffles(operators.Similarity.ivfTopK(
      graft.sources.Tables.embeddings(spark, sf))) <= 3, "IVF plan grew")
    assert(shuffles(operators.Similarity.lshTopK(
      graft.sources.Tables.embeddings(spark, sf))) <= 2, "LSH ANN plan grew")
    // r3 additions: chunk dedup = hash agg + hash join + doc agg;
    // range join = (type, bin) equi-join + per-event agg + left join
    // back; rerank = LSH retrieval + two windows over the pool
    assert(shuffles(operators.Curation.qChunkDedup(spark, sf)) <= 4,
      "chunk-dedup plan grew")
    assert(shuffles(Relational.qRangeJoin(spark, sf)) <= 4,
      "range-join plan grew")
    assert(shuffles(operators.Similarity.rerankTopK(
      graft.sources.Tables.embeddings(spark, sf))) <= 2, "rerank plan grew")
    // r5: PQ = encode argmin + code rebuild + lut build + top-k
    // window (the ADC scan joins against a broadcast, no shuffle);
    // QC = one percentile aggregate broadcast back over a narrow pass
    assert(shuffles(operators.Similarity.pqTopK(
      graft.sources.Tables.embeddings(spark, sf))) <= 5, "PQ plan grew")
    assert(shuffles(operators.Similarity.embedQc(
      graft.sources.Tables.embeddings(spark, sf))) <= 2, "embed QC plan grew")
  }

  test("external-query ANN never broadcasts the corpus side") {
    // corpus-sized query set + broadcastQueries=false + auto-broadcast
    // off: the plan must contain NO broadcast exchange at all (so in
    // particular the corpus cannot be the build side) and no
    // quadratic join — the shape that lets query batches grow
    // unboundedly at 100 TB
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lsh = operators.Similarity.lshTopKFor(emb, emb, broadcastQueries = false)
      lsh.collect()
      val lp = plan(lsh)
      // LSH has no centroid set: nothing may broadcast at all
      assert(!lp.contains("BroadcastExchange"),
        "external-query LSH ANN still hard-broadcasts a side")
      assert(lp.contains("SortMergeJoin") || lp.contains("ShuffledHashJoin"),
        "bucket join is not a shuffled equi-join")
      assert(!lp.contains("CartesianProduct") && !lp.contains("BroadcastNestedLoopJoin"),
        "external-query LSH ANN degenerated to a quadratic join")
      val ivf = operators.Similarity.ivfTopKFor(emb, emb, broadcastQueries = false)
      ivf.collect()
      val ip = plan(ivf)
      // IVF broadcasts ONLY the tiny centroid set (its corpus×C and
      // query×C scoring joins are deliberate broadcast cross joins);
      // the posting-list join must shuffle both sides on cid
      assert(ip.contains("SortMergeJoin") || ip.contains("ShuffledHashJoin"),
        "posting-list join did not shuffle both sides")
      assert(!ip.contains("CartesianProduct"),
        "external-query IVF ANN degenerated to an unhinted cross join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    // the default harness path must be unchanged by the refactor
    // (harness queries ARE corpus rows, so self-exclusion is on)
    val harness = operators.Similarity.lshTopK(emb).collect().toSet
    val external = operators.Similarity
      .lshTopKFor(emb, operators.Similarity.defaultQueries(emb),
        excludeSelf = true).collect().toSet
    assert(harness == external)
    // an EXTERNAL id space must NOT lose the corpus vector whose id
    // collides with a query id (excludeSelf defaults false): every
    // query's top-1 is its own corpus twin at cos 1.0
    val coincident = operators.Similarity
      .lshTopKFor(emb, operators.Similarity.defaultQueries(emb)).collect()
    assert(coincident.filter(_.getInt(2) == 1)
      .forall(r => r.getLong(1) == r.getLong(0) && r.getDouble(3) == 1.0),
      "external-query path silently dropped id-coincident corpus vectors")
    // brute force broadcasts the QUERY side by contract (BuildRight =
    // the queries argument), never the corpus
    val brute = operators.Similarity.bruteTopKFor(
      emb, operators.Similarity.defaultQueries(emb))
    brute.collect()
    assert(plan(brute).contains("BuildRight"),
      "brute-force broadcast side is not the query side")
  }

  test("retrieval eval: gold set is bounded and broadcasts; corpus never does") {
    // r10 verdict #2: the default gold set must be a FIXED size
    // (TakeOrdered hash-pick), not a corpus share, so the query-side
    // broadcast in bm25TopKFor cannot grow with the corpus
    val gold = operators.CorpusOps.defaultEvalGold(spark, sf)
    val gp = plan(gold)
    assert(gp.contains("TakeOrderedAndProject"),
      "gold pick is not a TakeOrdered (O(n) scan, O(K) state):\n" + gp.take(400))
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(gold.count() == math.min(operators.CorpusOps.EvalGoldK.toLong, nDocs))
    val eval = operators.CorpusOps.qRetrievalEval(spark, sf)
    eval.collect()
    val p = plan(eval)
    // the qterms/dfreq sides broadcast; the corpus tf side shuffles
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct"), p.take(500))
    // the ONLY nested-loop joins allowed are the deliberate 1-row
    // scalar-stats broadcast crosses (n_docs × tot_dl, scored ×
    // stats): every BNLJ must be a BuildRight Cross — a shape whose
    // fan-out is 1 when the build side is a scalar aggregate
    assert(p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .forall(_.contains("BuildRight, Cross")), p.take(500))
    // an external gold frame rides the same plan (production API)
    import spark.implicits._
    val ext = Seq((900001L, Seq("customer", "table"), 3L))
      .toDF("qid", "qtoks", "gold_doc")
    val out = operators.CorpusOps.retrievalEvalFor(spark, sf, ext).collect()
    assert(out.length == 1 && out.head.getLong(0) == 900001L)
  }

  test("ANN dedup/window exchanges carry no vector payload") {
    // r4 verdict #8: candidate dedup used to shuffle the ~0.5 KB
    // quantized vectors per candidate row. cos is now computed
    // map-side in the join output (vectors already co-located), so
    // every exchange AFTER candidate generation carries only
    // (query_id, vec_id, cos)-shaped scalars. Count the exchanges
    // whose output schema still contains an array: LSH with broadcast
    // queries must have NONE (bucketing is narrow, the bucket join is
    // a broadcast join); near-dup and IVF keep only the inherent ones
    // (the bucket/assignment joins that must co-locate vectors).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    def arrayExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      def flatten(pl: SparkPlan): Seq[SparkPlan] = pl match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec => q +: flatten(q.plan)
        case _ => pl +: pl.children.flatMap(flatten)
      }
      flatten(df.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
        .count(_.output.exists(_.dataType.isInstanceOf[ArrayType]))
    }
    val emb = graft.sources.Tables.embeddings(spark, sf)
    assert(arrayExchanges(operators.Similarity.lshTopK(emb)) == 0,
      "LSH ANN shuffles quantized vectors after candidate generation")
    assert(arrayExchanges(operators.Similarity.rerankTopK(emb)) == 0,
      "rerank shuffles quantized vectors after retrieval")
    assert(arrayExchanges(operators.Similarity.qEmbedNearDup(spark, sf)) <= 2,
      "near-dup pair dedup shuffles vectors beyond the bucket join sides")
    assert(arrayExchanges(operators.Similarity.ivfTopK(emb)) <= 2,
      "IVF shuffles vectors beyond the assignment join")
    // semDedup: the assignment agg and the cluster pair join carry
    // vectors (inherent — cosine needs both sides co-located); the
    // dropped-id distinct and the keep-flag join must not
    assert(arrayExchanges(operators.Similarity.semDedup(
      operators.Similarity.corpus(emb))) <= 3,
      "semDedup shuffles vectors beyond assignment + the cluster pair join")
    // cluster-balanced sampling never needs a vector past assignment
    assert(arrayExchanges(operators.Similarity.clusterBalancedSample(emb)) <= 1,
      "cluster sampling shuffles vectors beyond the assignment agg")
  }

  test("semDedup ranks inside cid partitions, never a global window") {
    val df = operators.Similarity.semDedup(operators.Similarity.corpus(
      graft.sources.Tables.embeddings(spark, sf)))
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"),
      "semDedup degenerated to a cartesian pair join")
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(l => !l.contains("SinglePartition")),
      s"semDedup rank window is unpartitioned:\n${winLines.mkString("\n")}")
  }

  test("embedding near-dup blocks on (label, tbl, bucket), not label alone") {
    // label-only blocking is O((n/L)^2) at scale; the LSH bucket must
    // be part of the equi-join key so candidate counts stay
    // data-dependent (r3 verdict's one scale-killer)
    val df = operators.Similarity.approxNearDupPairs(operators.Similarity.corpus(
      graft.sources.Tables.embeddings(spark, sf)))
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "near-dup degenerated to a quadratic join")
    val joinLine = p.linesIterator.find(l =>
      l.contains("Join") && l.contains("label_a")).getOrElse("")
    assert(joinLine.contains("bucket_a") && joinLine.contains("tbl_a"),
      s"near-dup join key lost the LSH bucket:\n$joinLine")
  }

  test("range join is an equi-join on (type, bin), never nested-loop") {
    val df = Relational.qRangeJoin(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join fell back to a quadratic plan")
  }

  test("q1 stays inside whole-stage codegen") {
    // AQE hides stage plans until execution finalizes them
    val df = Relational.q1Agg(spark, sf)
    df.collect()
    val p = plan(df)
    // AQE's finalized plan renders codegen stages as "*(n) Op"
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
  }
}
