package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.sources.Tables

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Random sampling is the wrong tool at 100 TB: reruns must produce
  * the same split (reproducible evals), late-arriving data must land
  * in the same bucket, and no coordination/seed-broadcast should be
  * needed. Hashing a stable id into 100 buckets gives all three —
  * a narrow, shuffle-free transform whose assignment is a pure
  * function of the row. The md5-prefix hash keeps the DuckDB oracle
  * bit-identical.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from any id column. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    tokenHash(id.cast("string")) % buckets

  /** train/val/test assignment: 80/10/10 by default. */
  def split(df: DataFrame, id: Column,
            trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(id)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Keep a pct% deterministic sample per stratum. */
  def stratifiedSampleCounts(df: DataFrame, id: Column, stratum: Column,
                             pct: Int = 20): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(hashBucket(id) < pct, 1L).otherwise(0L)).as("n_sampled"))

  /** Leakage-safe split: bucket by the NEAR-DUP CLUSTER root, not the
    * document id, so two near-identical documents can never land on
    * opposite sides of a train/test boundary (the classic eval-
    * contamination hole a plain hash split leaves open). Docs outside
    * any cluster fall back to their own id. Costs one left join
    * against the (small) components table on top of the narrow split.
    */
  def splitSafe(docs: DataFrame, comps: DataFrame,
                trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs.join(comps, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component_id"), col("doc_id")))
      .withColumn("bucket", hashBucket(col("cluster_id")))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("bucket"), col("split"))

  /** Length-bucketed batch packing for training: group docs into
    * token-length buckets (width LenBucketWidth), fill fixed-size
    * batches within each (bucket, sub-bucket) in stable doc order,
    * and report the padding waste per batch (1 - sum/(max·n)) — the
    * metric length bucketing exists to minimize. The deterministic
    * hash SUB-bucket matters at scale: a window partitioned by
    * len_bucket alone sends every doc of a popular length range
    * through ONE reducer; the sub-bucket multiplies parallelism by
    * SubBuckets while keeping assignment a pure function of the row
    * (same padding properties — batches just interleave).
    */
  val BatchDocs = 8
  val LenBucketWidth = 32
  val SubBuckets = 4
  def qLengthBatches(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("len_bucket"), col("sub")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("len_bucket", expr(s"n_tok div $LenBucketWidth"))
      .withColumn("sub", hashBucket(col("doc_id"), SubBuckets))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr(s"cast(rn - 1 as bigint) div $BatchDocs"))
      .groupBy(col("len_bucket"), col("sub"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("max_len"),
        sum(col("n_tok")).as("sum_len"))
      .withColumn("pad_frac", round(lit(1.0)
        - col("sum_len").cast("double")
          / (col("max_len") * col("n_docs")).cast("double"), 6))
  }

  /** Sequence packing (concat-and-chunk): training examples are
    * fixed token-budget windows over a deterministic concatenation of
    * documents — the GPT-style packing step that turns a curated
    * corpus into equal-length training sequences with no padding.
    *
    * Scalable formulation: packing is inherently sequential WITHIN a
    * concatenation order (each chunk boundary depends on every
    * earlier length), so parallelism comes from sharding the corpus
    * into PackStreams independent streams by doc-id hash — a pure
    * function of the row, so reruns and late arrivals land in the
    * same stream. Within a stream, docs concatenate in doc_id order;
    * a window-function running sum assigns each doc the sequence
    * (window of `budget` tokens) its FIRST token lands in. One
    * shuffle on the stream key; the per-stream window is the only
    * sequential section, and streams × reducers is the parallelism
    * dial (set it to O(cluster cores) in production; docs of one
    * stream never co-shuffle with another's).
    *
    * Output per (stream, seq_id): docs starting in the window, their
    * token sum, and the doc-id range — the manifest a training-data
    * writer consumes. A sequence's tokens can exceed `budget` when
    * its last doc spans the boundary (the spilled tail opens the
    * next window — concat-and-chunk, not drop-at-boundary).
    */
  val SeqBudget = 256L
  val PackStreams = 8
  def packSequences(docs: DataFrame, budget: Long = SeqBudget,
                    streams: Int = PackStreams): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stream")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("stream", hashBucket(col("doc_id"), streams))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"start_off div $budget"))
      .groupBy(col("stream"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Shared two-level rank plumbing (the epoch-shuffle julienne
    * discipline): a data-driven bucket count as a broadcast scalar,
    * hash key, bucket column — so no within-group rank window ever
    * sorts more than ~ShuffleTargetRows rows in one task.
    */
  private def bucketKeyed(docs: DataFrame): DataFrame = {
    val bucketsDf = broadcast(docs.agg(
      greatest(lit(graft.operators.CorpusOps.ShuffleMinBuckets),
        expr(s"(count(1) + ${graft.operators.CorpusOps.ShuffleTargetRows - 1}) " +
          s"div ${graft.operators.CorpusOps.ShuffleTargetRows}")).as("buckets")))
    docs.crossJoin(bucketsDf)
      .withColumn("k", tokenHash(col("doc_id").cast("string")))
      .withColumn("bkt", col("k") % col("buckets"))
  }

  /** Source-interleaved training order — the long-context mixing
    * discipline: consecutive global positions cycle through the
    * sources (round-robin until a source exhausts), with per-source
    * order a reproducible content-hash shuffle. NO global sort
    * anywhere: within-source ranks come from the epoch-shuffle
    * two-level rank ((source, bucket) windows + prefix-sum offsets,
    * buckets data-driven), and the GLOBAL position is computed
    * per-row against the broadcast per-source count table —
    * pos(r, s) = Σ_{s'} min(cnt_{s'}, r) + |{s' < s : cnt_{s'} > r}|,
    * i.e. the rank of (r, s) in (rank, source) order. The position
    * pass is a sources-sized broadcast cross + partial agg.
    *
    * CARDINALITY CONTRACT (r8 verdict #5): "source" must be a
    * corpus-level source tag (tens-to-hundreds of values — the
    * broadcast cross expands rows × sources before the partial agg).
    * A per-domain or per-URL-host key (millions of values) would
    * blow that cross up quadratically; bucket such keys into a
    * bounded source taxonomy first.
    */
  def qSourceInterleave(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val keyed = bucketKeyed(docs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("bkt")).orderBy(col("k"), col("doc_id"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("source"), col("bkt"), col("off"))
    val withR = keyed.withColumn("rnk", row_number().over(w))
      .join(broadcast(offs), Seq("source", "bkt"))
      .select(col("doc_id"), col("source"), (col("off") + col("rnk") - 1).as("r"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .select(col("source").as("s2"), col("cnt"))
    withR.crossJoin(broadcast(counts))
      .groupBy(col("doc_id"), col("source"), col("r"))
      .agg(sum(least(col("cnt"), col("r"))
        + when(col("s2") < col("source") && col("cnt") > col("r"), 1L)
          .otherwise(0L)).as("position"))
      .select(col("doc_id"), col("source"), col("r").as("src_rank"),
        col("position"))
  }

  /** Per-source TOKEN-budget sampling — real corpus targets are token
    * budgets, not doc counts: docs take a reproducible per-source
    * shuffle order (the two-level (bucket, key) order — no
    * single-task source-wide sort; prefix tokens = earlier-bucket
    * sums via the tiny offsets table + a within-bucket running sum),
    * and a doc is kept iff the tokens before it are under the budget
    * (so the crossing doc is kept — fill then stop). Emits the audit
    * columns (cum_before, kept), the shape a budget report needs.
    */
  val SourceTokenBudget = 600L

  def qTokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
    val keyed = bucketKeyed(docs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("bkt")).orderBy(col("k"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_tok")).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("source"), col("bkt"), col("off"))
    keyed
      .withColumn("cum_in_bkt", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .join(broadcast(offs), Seq("source", "bkt"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        (col("off") + col("cum_in_bkt")).as("cum_before"))
      .withColumn("kept", col("cum_before") < SourceTokenBudget)
  }

  /** Quality-annealed curriculum order (the data-ordering recipe:
    * train on the corpus ordered by ascending quality so the
    * HIGHEST-quality documents land at the END of the epoch — the
    * anneal phase). Deciles of the oracle-gated quality_score are the
    * curriculum granularity (fixed-width integer buckets — exact in
    * both engines; curriculum consumers read batches, not single
    * docs, so decile granularity is the honest contract); within a
    * decile the order is the reproducible content-hash shuffle.
    * NO global sort anywhere: within-decile ranks ride the two-level
    * ((qbucket, bkt) windows + prefix offsets) epoch-shuffle
    * discipline, and the global position adds a ≤10-row broadcast
    * decile-offset table — computed by a broadcast self-join, not a
    * global window (the constant-partition WindowExec trap).
    */
  def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qQuality(s, dir).select(col("doc_id"),
      least(lit(9L), floor(col("quality_score") * 10).cast("long")).as("qbucket"))
    val keyed = bucketKeyed(scored)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qbucket"), col("bkt")).orderBy(col("k"), col("doc_id"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qbucket")).orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(col("qbucket"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("qbucket"), col("bkt"), col("off"))
    val ranked = keyed.withColumn("rnk", row_number().over(w))
      .join(broadcast(offs), Seq("qbucket", "bkt"))
      .select(col("doc_id"), col("qbucket"),
        (col("off") + col("rnk") - 1).as("bucket_rank"))
    // decile offsets (≤10 rows): broadcast self-join prefix sum
    val qc = keyed.groupBy(col("qbucket")).agg(count(lit(1)).as("qc"))
    val qoffs = qc.select(col("qbucket"))
      .join(broadcast(qc.select(col("qbucket").as("qb2"), col("qc").as("qc2"))),
        col("qb2") < col("qbucket"), "left")
      .groupBy(col("qbucket")).agg(coalesce(sum(col("qc2")), lit(0L)).as("qoff"))
    ranked.join(broadcast(qoffs), Seq("qbucket"))
      .select(col("doc_id"), col("qbucket"), col("bucket_rank"),
        (col("qoff") + col("bucket_rank")).as("position"))
  }

  // --- queries --------------------------------------------------------

  def qSplit(s: SparkSession, dir: String): DataFrame =
    split(Tables.documents(s, dir).select(col("doc_id"), col("lang")), col("doc_id"))

  def qSplitSafe(s: SparkSession, dir: String): DataFrame =
    splitSafe(Dedup.corpus(s, dir).select(col("doc_id")),
      Dedup.qDedupComponents(s, dir))

  def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    stratifiedSampleCounts(Tables.documents(s, dir), col("doc_id"), col("lang"))

  def qWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(graft.functions.WeightedMean)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
        count(lit(1)).as("cnt"))
  }

  def qPackSequences(s: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(s, dir))

  /** Candidate group size for the preference-pair harness (each
    * block of PrefGroup consecutive doc ids plays the candidate
    * responses to one synthetic prompt).
    */
  val PrefGroup = 5L

  /** Preference-pair construction — the DPO/RLHF-style rejection-
    * sampling stage of a synthetic-data pipeline: within each
    * candidate group, chosen = arg-max of the shared quality
    * composite (ties → smallest id), rejected = arg-min (ties →
    * smallest id), with the score margin on the ppm grid and a
    * usable flag (margin > 0 — an all-tied group carries no
    * preference signal, standard practice drops it downstream, but
    * the row ships for audit). ONE groupBy with two struct folds —
    * the established argmax idiom, map-side combinable, no window,
    * no sort; at 100 TB the only shuffle keys on prompt_id.
    */
  def qPreferencePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qQuality(s, dir)
      .select(col("doc_id"), expr(s"doc_id div $PrefGroup").as("prompt_id"),
        round(col("quality_score") * 1000000).cast("long").as("q_ppm"))
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_cands"),
        min(struct((-col("q_ppm")).as("nq"), col("doc_id").as("id"))).as("c"),
        min(struct(col("q_ppm").as("q"), col("doc_id").as("id"))).as("r"))
      .select(col("prompt_id"), col("n_cands"),
        col("c.id").as("chosen_id"), (-col("c.nq")).as("chosen_ppm"),
        col("r.id").as("rejected_id"), col("r.q").as("rejected_ppm"),
        (-col("c.nq") - col("r.q")).as("margin_ppm"),
        (-col("c.nq") > col("r.q")).cast("long").as("usable"))

  /** Priority-sample size (the k of the top-k-by-priority pass). */
  val PriorityK = 64

  /** Weighted sampling WITHOUT replacement with an unbiased subset-sum
    * estimator — priority sampling (Duffield, Lund & Thorup, JACM
    * 2007): item i with weight w_i draws uniform u_i ∈ (0,1] and gets
    * priority q_i = w_i / u_i; keep the k highest priorities, set the
    * threshold τ to the (k+1)-th priority, and estimate every kept
    * item's weight as ŵ_i = max(w_i, τ). Subset sums of ŵ are
    * unbiased for the true sums, with zero covariance between items —
    * the estimator a "sample 64 docs but still report per-source
    * token totals" curation audit needs. Heavy items are kept with
    * certainty (w_i ≥ τ ⇒ q_i ≥ τ), so the sample is the weighted
    * analogue of heavy hitters.
    *
    * Determinism discipline: u_i is the md5 hash of the doc id
    * ((h+1)/2^48 ∈ (0,1]), and the priority is the integer floor of
    * w·2^48/(h+1) computed in DECIMAL(38,0) — both engines agree
    * bit-for-bit, reruns and late-arriving shards keep their draws.
    * Floored priorities can tie; doc_id breaks every tie, so the
    * sampled SET is a pure function of the corpus. Integer headroom:
    * the floored priority tops out at w·2^48, so weights below 2^15
    * stay inside int64 even at u's floor — token counts per DOCUMENT
    * satisfy that by orders of magnitude; for heavier weight columns
    * shrink the hash range (the documented dial).
    *
    * Scale shape: one narrow pass computes priorities, and the top
    * k+1 ride a TakeOrdered (per-partition size-(k+1) heaps, driver
    * merges partitions·(k+1) rows) — no shuffle anywhere, O(k)
    * driver state. The boundary row (rank k+1, which only defines τ
    * and leaves the sample) is isolated with ONE struct-min
    * aggregate over the k+1 frame instead of a rank window, so no
    * WindowExec — let alone an unpartitioned one — enters the plan.
    * The corpus is scanned twice (once per TakeOrdered consumer);
    * both scans are narrow.
    */
  def qPrioritySample(s: SparkSession, dir: String): DataFrame =
    prioritySampleFrom(prioritized(Tables.documents(s, dir)))

  /** The deterministic priority assignment — a PURE function of
    * (doc_id, weight), which is what makes the streaming twin
    * replay-safe by algebra (a redelivered doc re-derives the same
    * draw).
    */
  private[graft] def prioritized(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        greatest(size(tokens(col("text"))).cast("long"), lit(1L)).as("weight"))
      .withColumn("h", tokenHash(col("doc_id").cast("string")) + lit(1L))
      .withColumn("priority",
        expr("CAST(weight AS DECIMAL(38,0)) * 281474976710656 div h"))
      .select(col("doc_id"), col("weight"), col("priority"))

  /** Sample + τ-estimator from a (doc_id, weight, priority)
    * candidate frame — shared by the batch operator and the
    * streaming state server, so both emit identical rows. The input
    * may be any SUPERSET of the global top-(k+1) (the bottom-k merge
    * law: top-(k+1) of a union is inside the union of per-shard
    * top-(k+1)s).
    */
  private[graft] def prioritySampleFrom(d: DataFrame): DataFrame = {
    val top = d.orderBy(col("priority").desc, col("doc_id").asc)
      .limit(PriorityK + 1)
    // the minimum of (priority, -doc_id) over the k+1 frame IS the
    // boundary row (last in the priority-desc, doc_id-asc order);
    // when the corpus has ≤ k rows there is no boundary and τ = 0
    // (every item kept, exact weights — the DLT small-n case)
    val bound = top
      .agg(count(lit(1)).as("n_top"),
        min(struct(col("priority"), (-col("doc_id")).as("negid"))).as("b"))
      .select(col("n_top"), col("b.priority").as("bpr"), col("b.negid").as("bneg"))
    top.crossJoin(broadcast(bound))
      .withColumn("tau",
        when(col("n_top") === PriorityK + 1, col("bpr")).otherwise(lit(0L)))
      .filter(col("n_top") =!= PriorityK + 1 ||
        !(col("priority") === col("bpr") && col("doc_id") === -col("bneg")))
      .select(col("doc_id"), col("weight"), col("priority"), col("tau"),
        greatest(col("weight"), col("tau")).as("w_hat"),
        when(col("tau") === 0L, lit(1000000L))
          .otherwise(least(lit(1000000L), expr("weight * 1000000 div tau")))
          .as("p_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_priority_sample" -> qPrioritySample _,
    "q_preference_pairs" -> qPreferencePairs _,
    "q_split" -> qSplit _,
    "q_split_safe" -> qSplitSafe _,
    "q_length_batches" -> qLengthBatches _,
    "q_pack_sequences" -> qPackSequences _,
    "q_sample_stratified" -> qSampleStratified _,
    "q_source_interleave" -> qSourceInterleave _,
    "q_token_budget_sample" -> qTokenBudgetSample _,
    "q_curriculum" -> qCurriculum _,
    "q_weighted_avg" -> qWeightedAvg _)

  private val dataBucketsSql: String =
    s"(SELECT greatest(${graft.operators.CorpusOps.ShuffleMinBuckets}, " +
      s"(count(*) + ${graft.operators.CorpusOps.ShuffleTargetRows - 1}) " +
      s"// ${graft.operators.CorpusOps.ShuffleTargetRows}) AS buckets FROM documents)"

  private val bucketSql =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 100"

  private val clusterBucketSql =
    "('0x' || substr(md5(coalesce(m.component_id, c.doc_id)::VARCHAR), 1, 12))::BIGINT % 100"

  val oracles: Map[String, String] = Map(
    "q_priority_sample" ->
      s"""WITH d AS (SELECT doc_id,
        |    greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1)::BIGINT
        |      AS weight,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT + 1 AS h
        |  FROM documents),
        |p AS (SELECT doc_id, weight,
        |    (weight::HUGEINT * 281474976710656 // h)::BIGINT AS priority FROM d),
        |r AS (SELECT *, row_number()
        |    OVER (ORDER BY priority DESC, doc_id) AS rnk FROM p),
        |t AS (SELECT coalesce(min(CASE WHEN rnk = ${PriorityK + 1}
        |    THEN priority END), 0)::BIGINT AS tau FROM r)
        |SELECT r.doc_id, r.weight, r.priority, t.tau,
        |  greatest(r.weight, t.tau)::BIGINT AS w_hat,
        |  (CASE WHEN t.tau = 0 THEN 1000000
        |    ELSE least(1000000, r.weight * 1000000 // t.tau) END)::BIGINT AS p_ppm
        |FROM r CROSS JOIN t WHERE r.rnk <= $PriorityK""".stripMargin,
    "q_preference_pairs" ->
      s"""WITH qs AS (${TextAnalysis.qualityScoreSql}),
        |g AS (SELECT doc_id, doc_id // $PrefGroup AS prompt_id,
        |    round(quality_score * 1000000)::BIGINT AS q_ppm FROM qs),
        |ch AS (SELECT prompt_id, doc_id AS chosen_id, q_ppm AS chosen_ppm
        |  FROM (SELECT prompt_id, doc_id, q_ppm, row_number() OVER (
        |      PARTITION BY prompt_id ORDER BY q_ppm DESC, doc_id) AS rn
        |    FROM g) WHERE rn = 1),
        |rj AS (SELECT prompt_id, doc_id AS rejected_id, q_ppm AS rejected_ppm
        |  FROM (SELECT prompt_id, doc_id, q_ppm, row_number() OVER (
        |      PARTITION BY prompt_id ORDER BY q_ppm ASC, doc_id) AS rn
        |    FROM g) WHERE rn = 1),
        |nc AS (SELECT prompt_id, count(*)::BIGINT AS n_cands FROM g GROUP BY 1)
        |SELECT nc.prompt_id, nc.n_cands, ch.chosen_id, ch.chosen_ppm,
        |  rj.rejected_id, rj.rejected_ppm,
        |  (ch.chosen_ppm - rj.rejected_ppm)::BIGINT AS margin_ppm,
        |  (CASE WHEN ch.chosen_ppm > rj.rejected_ppm THEN 1 ELSE 0 END)::BIGINT
        |    AS usable
        |FROM nc JOIN ch USING (prompt_id) JOIN rj USING (prompt_id)""".stripMargin,
    "q_split" ->
      s"""SELECT doc_id, lang, $bucketSql AS bucket,
        |  CASE WHEN $bucketSql < 80 THEN 'train'
        |       WHEN $bucketSql < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q_split_safe" ->
      s"""${Dedup.componentsCtes}
        |SELECT c.doc_id,
        |  coalesce(m.component_id, c.doc_id) AS cluster_id,
        |  $clusterBucketSql AS bucket,
        |  CASE WHEN $clusterBucketSql < 80 THEN 'train'
        |       WHEN $clusterBucketSql < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (${Dedup.corpusSql}) c
        |LEFT JOIN comps m ON m.v = c.doc_id""".stripMargin,
    "q_length_batches" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(trim(text)), '\\s+'))::BIGINT AS n_tok
        |  FROM documents),
        |b AS (SELECT doc_id, n_tok, n_tok // $LenBucketWidth AS len_bucket,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % $SubBuckets AS sub
        |  FROM d),
        |r AS (SELECT *,
        |  (row_number() OVER (PARTITION BY len_bucket, sub ORDER BY doc_id) - 1)
        |    // $BatchDocs AS batch_id
        |  FROM b)
        |SELECT len_bucket, sub, batch_id, count(*) AS n_docs,
        |  max(n_tok) AS max_len, sum(n_tok)::BIGINT AS sum_len,
        |  round(1.0 - sum(n_tok)::BIGINT::DOUBLE
        |    / (max(n_tok) * count(*))::DOUBLE, 6) AS pad_frac
        |FROM r GROUP BY 1, 2, 3""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(trim(text)), '\\s+'))::BIGINT AS n_tok,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % $PackStreams AS stream
        |  FROM documents),
        |o AS (SELECT *,
        |  coalesce(sum(n_tok) OVER (PARTITION BY stream ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
        |  FROM d)
        |SELECT stream, start_off // $SeqBudget AS seq_id, count(*) AS n_docs,
        |  sum(n_tok)::BIGINT AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM o GROUP BY 1, 2""".stripMargin,
    "q_sample_stratified" ->
      s"""SELECT lang AS stratum, count(*) AS n_total,
        |  sum(CASE WHEN $bucketSql < 20 THEN 1 ELSE 0 END)::BIGINT AS n_sampled
        |FROM documents GROUP BY lang""".stripMargin,
    "q_curriculum" ->
      s"""WITH b AS $dataBucketsSql,
        |qs AS (${TextAnalysis.qualityScoreSql}),
        |k AS (SELECT doc_id,
        |    least(9, floor(quality_score * 10)::BIGINT) AS qbucket, buckets,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS k
        |  FROM qs CROSS JOIN b)
        |SELECT doc_id, qbucket,
        |  (row_number() OVER (PARTITION BY qbucket
        |    ORDER BY k % buckets, k, doc_id) - 1)::BIGINT AS bucket_rank,
        |  (row_number() OVER (
        |    ORDER BY qbucket, k % buckets, k, doc_id) - 1)::BIGINT AS position
        |FROM k""".stripMargin,
    "q_source_interleave" ->
      s"""WITH b AS $dataBucketsSql,
        |k AS (SELECT doc_id, source, buckets,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS k
        |  FROM documents CROSS JOIN b),
        |r AS (SELECT doc_id, source,
        |    (row_number() OVER (PARTITION BY source
        |      ORDER BY k % buckets, k, doc_id) - 1)::BIGINT AS r
        |  FROM k)
        |SELECT doc_id, source, r AS src_rank,
        |  (row_number() OVER (ORDER BY r, source) - 1)::BIGINT AS position
        |FROM r""".stripMargin,
    "q_token_budget_sample" ->
      s"""WITH b AS $dataBucketsSql,
        |k AS (SELECT doc_id, source,
        |    len(string_split_regex(lower(trim(text)), '\\s+'))::BIGINT AS n_tok,
        |    buckets,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS k
        |  FROM documents CROSS JOIN b),
        |o AS (SELECT doc_id, source, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY k % buckets, k, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS cum_before
        |  FROM k)
        |SELECT doc_id, source, n_tok, cum_before,
        |  cum_before < $SourceTokenBudget AS kept
        |FROM o""".stripMargin,
    "q_weighted_avg" ->
      """SELECT l_returnflag,
        |  sum((l_extendedprice * l_quantity)::DECIMAL(18,6))::DOUBLE
        |    / sum(l_quantity::DECIMAL(18,6))::DOUBLE AS wavg_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
