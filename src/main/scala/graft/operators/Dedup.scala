package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.sources.Tables

/** Document deduplication: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard. All shuffles are keyed on content-derived buckets
  * (content hash, LSH band, simhash chunk, min-shingle block), so
  * every variant scales horizontally with no O(n²) stage.
  *
  * Queries run over `documents ∪ (documents shifted by +100000)` so
  * the near-dup joins provably fire (the test corpus has no natural
  * exact dups); the DuckDB oracle builds the identical corpus.
  */
object Dedup {

  val Shift = 100000L
  /** MinHash permutation constants: h_k = (A(k)·h + B(k)) mod P.
    * Multipliers must be LARGE (≈P): with small ones the per-perm
    * minima stay correlated (min h_k ≈ A(k)·min(h)+B(k) whenever the
    * product rarely wraps P), every doc pair sharing its min token
    * collides in all bands, and LSH degenerates to near-quadratic
    * candidate generation. A(k)·h < P² ≈ 1e18 stays inside int64.
    */
  val A = Seq(968665207L, 725327549L, 858830963L, 506002657L,
    918257911L, 659337277L, 426059413L, 795028219L)
  val B = Seq(102931L, 405179L, 763957L, 111119L,
    509203L, 903739L, 160481L, 644843L)
  val NumPerm = 8
  val Bands = 4 // rows-per-band = 2
  /** Hot-bucket threshold: LSH / simhash buckets larger than this
    * emit star edges (to the bucket min) instead of all pairs.
    */
  val BucketCap = 32

  /** documents plus an id-shifted copy (guaranteed dup pairs). */
  def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionAll(d.select((col("doc_id") + Shift).as("doc_id"), col("text")))
  }

  /** Exact dedup: one hash-aggregate on md5(text); keeper = min id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signatures over word-3-gram shingles (Broder): the
    * shingle space is ~|vocab|³, so unrelated docs share few set
    * elements and LSH candidates stay near-linear (unigram minhash
    * on a small-vocab corpus degenerates to all-pairs). One explode,
    * partial-aggregated mins for all K permutations, single shuffle
    * on doc_id.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    // hash INSIDE the shingle transform (shingleHashes): consuming
    // HOF-built strings from any later expression reads corrupted
    // UTF8String buffers on Spark 4.1 — see GraftFunctions note
    val tok = docs.select(col("doc_id"),
      explode(shingleHashes(tokens(col("text")), 3)).as("h"))
      .select(col("doc_id"), (col("h") % HashP).as("hp"))
    val sigs = (0 until NumPerm).map(k =>
      min((col("hp") * A(k) + B(k)) % HashP).as(s"h$k"))
    tok.groupBy(col("doc_id")).agg(sigs.head, sigs.tail: _*)
  }

  /** LSH bands: (doc_id, band_id, band_hash) — md5 of the band's
    * signature slice. Join key for candidate generation. One
    * explode pass rather than a Bands-way union (each union branch
    * would re-execute the whole signature pipeline).
    */
  def minhashBands(sig: DataFrame): DataFrame =
    minhashBandsWith(sig, Bands, NumPerm / Bands)

  /** Parameterized banding over a signature frame (h0..h{b·r−1}):
    * band i hashes rows i·r .. i·r+r−1. The default (Bands, 2)
    * banding the oracle pins is the (4, 2) instance; the measured
    * band/row dial ([[minhashSweep]]/[[autoConfigMinhash]]) walks
    * the other (bands, rows) splits of the same NumPerm signature.
    */
  def minhashBandsWith(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    require(bands * rows <= NumPerm, s"bands*rows ${bands * rows} > $NumPerm")
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws(",",
          (0 until rows).map(j => col(s"h${b * rows + j}")): _*)).as("band_hash"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
  }

  /** Mergeable per-source MinHash sketch — the sketch-algebra
    * property that makes MinHash a 100 TB primitive: a signature
    * component is an elementwise MIN, so doc → shard → source
    * sketches fold associatively inside partial aggregation. One
    * narrow shingle explode + ONE partial-agg shuffle keyed by
    * source; no doc-level signature ever materializes on the way to
    * the source roll-up.
    */
  def minhashSourceSketch(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
        explode(shingleHashes(tokens(col("text")), 3)).as("h"))
      .select(col("source"), (col("h") % HashP).as("hp"))
    val sigs = (0 until NumPerm).map(k =>
      min((col("hp") * A(k) + B(k)) % HashP).as(s"h$k"))
    tok.groupBy(col("source")).agg(sigs.head, sigs.tail: _*)
  }

  /** Pairwise source similarity from the sketches: the component
    * agreement rate is the classic unbiased estimate of the
    * SOURCE-level shingle-set Jaccard — the sketch twin of the
    * exact `q_source_overlap` matrix at a fraction of its cost
    * (sources² pairs over a sources-sized sketch table; both sides
    * broadcast-trivial).
    */
  def sourceSketchOverlap(docs: DataFrame): DataFrame = {
    val sk = minhashSourceSketch(docs)
    val aCols = sk.columns.map(c => col(c).as(if (c == "source") "src_a" else s"a_$c"))
    val bCols = sk.columns.map(c => col(c).as(if (c == "source") "src_b" else s"b_$c"))
    val agree = (0 until NumPerm).map(k =>
      when(col(s"a_h$k") === col(s"b_h$k"), 1L).otherwise(0L)).reduce(_ + _)
    sk.select(aCols.toSeq: _*)
      .join(broadcast(sk.select(bCols.toSeq: _*)), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), agree.as("n_agree"),
        // multiply-then-divide (the fuzzy-dedup idiom below): exact
        // for ANY NumPerm, not just divisors of 1e6 (r6 advice)
        ((agree * lit(1000000L)) / lit(NumPerm.toLong)).cast("long")
          .as("est_jaccard_ppm"))
  }

  def qSketchOverlap(s: SparkSession, dir: String): DataFrame =
    sourceSketchOverlap(graft.sources.Tables.documents(s, dir))

  /** Candidate near-dup pairs: equi-join on (band_id, band_hash) —
    * the Broder LSH scheme; shuffle is keyed on band hash, never n².
    *
    * Skew guard: a hot bucket (boilerplate text hashing a whole
    * corpus slice into one band) would pay O(|bucket|²) in a single
    * reducer. Buckets larger than `bucketCap` switch to a STAR
    * pattern — every member pairs with the bucket's minimum doc_id
    * only — which preserves cluster connectivity for downstream
    * connected components at O(|bucket|) cost. The cap never fires
    * on ordinary buckets (the oracle output is unchanged); it bounds
    * the worst case.
    */
  def minhashPairs(docs: DataFrame, bucketCap: Int = BucketCap): DataFrame =
    minhashPairsWith(docs, Bands, NumPerm / Bands, bucketCap)

  /** [[minhashPairs]] under an arbitrary (bands, rows) split of the
    * NumPerm signature — the config surface [[minhashSweep]]
    * measures; identical hot-bucket star discipline.
    */
  def minhashPairsWith(docs: DataFrame, nBands: Int, rows: Int,
                       bucketCap: Int = BucketCap): DataFrame =
    pairsFromBands(minhashBandsWith(minhashSignatures(docs), nBands, rows),
      bucketCap)

  /** Candidate pairs from a band frame — factored so the measured
    * banding dial ([[minhashSweep]]) runs the PRODUCTION pair plan,
    * not a re-derivation (the lshSweep discipline).
    */
  private[graft] def pairsFromBands(bands: DataFrame,
                                    bucketCap: Int = BucketCap): DataFrame = {
    // Hot buckets found with a partial-aggregated groupBy (the
    // shuffle carries one row per DISTINCT bucket, not per member —
    // a per-bucket window would total-sort the whole band set) and
    // broadcast back: hot buckets are rare by construction.
    val hot = bands.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("bsz"), min(col("doc_id")).as("bmin"))
      .filter(col("bsz") > bucketCap)
    val marked = bands.join(broadcast(hot), Seq("band_id", "band_hash"), "left")
    val small = marked.filter(col("bsz").isNull)
      .select(col("doc_id"), col("band_id"), col("band_hash"))
    val a = small.toDF("doc_a", "band_a", "hash_a")
    val b = small.toDF("doc_b", "band_b", "hash_b")
    val allPairs = a.join(b,
      col("band_a") === col("band_b") && col("hash_a") === col("hash_b")
        && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val starPairs = marked.filter(col("bsz").isNotNull && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("doc_a"), col("doc_id").as("doc_b"))
    allPairs.unionAll(starPairs).distinct()
  }

  /** 48-bit SimHash per doc: sign of per-bit ±1 vote sums, computed
    * in one narrow pass by the native SimHash48 expression — no
    * shuffle at all for the signature (earlier formulations pushed a
    * tokens×bits explode or 48 vote columns through an exchange).
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextExpressions.simHash48(tokens(col("text"))).as("simhash"))

  /** Near-dup pairs with hamming ≤ 3 via pigeonhole blocking: 4
    * 12-bit chunks — any pair within distance 3 shares ≥ 1 chunk, so
    * an equi-join on (chunk_id, chunk_value) finds all of them.
    */
  def simhashPairs(docs: DataFrame, bucketCap: Int = BucketCap): DataFrame = {
    // same skew guard as minhashPairs: oversized (chunk, value)
    // buckets — found via partial-aggregated groupBy, broadcast back
    // — emit star edges against the bucket minimum (hamming still
    // verified), capping reducer work at O(|bucket|)
    val chunks = simhash(docs).select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("cv", expr("shiftright(simhash, 12 * c) & 4095"))
    val hot = chunks.groupBy(col("c"), col("cv"))
      .agg(count(lit(1)).as("bsz"), min(col("doc_id")).as("bmin"),
        min_by(col("simhash"), col("doc_id")).as("bminsh"))
      .filter(col("bsz") > bucketCap)
    val marked = chunks.join(broadcast(hot), Seq("c", "cv"), "left")
    val small = marked.filter(col("bsz").isNull)
      .select(col("doc_id"), col("simhash"), col("c"), col("cv"))
    val a = small.toDF("doc_a", "sh_a", "c_a", "cv_a")
    val b = small.toDF("doc_b", "sh_b", "c_b", "cv_b")
    val allPairs = a.join(b, col("c_a") === col("c_b") && col("cv_a") === col("cv_b")
      && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").cast("long").as("hamming"))
    val starPairs = marked.filter(col("bsz").isNotNull && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("doc_a"), col("doc_id").as("doc_b"),
        expr("bit_count(bminsh ^ simhash)").cast("long").as("hamming"))
    allPairs.unionAll(starPairs)
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** Word-3-gram Jaccard near-dup: candidates from the df-rarest
    * 5-gram prefix blocking ([[shingleMinBlock]] — r13: the same
    * re-blocking that flattened the weighted family's exponent; the
    * old two-min-hash keys concentrated on globally-minimal hashes
    * and squared on shared-vocab corpora), then exact |∩|/|∪|
    * verification on distinct 3-gram shingle-hash arrays (the
    * VERIFY domain is unchanged — 3-gram set Jaccard is what the
    * operator measures; only candidate generation moved to the
    * sparser 5-gram domain).
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // explode + aggregate so the shingle-hash HOF runs once per doc
    // (projection collapse re-evaluates it per consumer otherwise);
    // hashing stays INSIDE the transform (see GraftFunctions note)
    val sh = docs.select(col("doc_id"),
      explode(shingleHashes(tokens(col("text")), 3)).as("h"))
    val d = sh.groupBy(col("doc_id")).agg(collect_set(col("h")).as("hs"))
    ngramJaccardVerify(shingleMinBlock(docs), d, threshold)
  }

  /** Exact set-Jaccard verify of a candidate pair frame against the
    * per-doc distinct shingle arrays.
    */
  private def ngramJaccardVerify(cand: DataFrame, d: DataFrame,
                                 threshold: Double): DataFrame =
    cand.join(d.toDF("doc_a", "hs_a"), Seq("doc_a"))
      .join(d.toDF("doc_b", "hs_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jac", col("inter") /
        (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))

  /** Prefix length of the df-rarest blocking below: each doc keys on
    * its [[WjPrefix]] rarest shingles.
    */
  val WjPrefix = 2

  /** Distinct word-5-gram shingle postings (doc_id, h) — the blocking
    * domain of the weighted-Jaccard family, and (with the token
    * counts) the persistable half of its incremental index. Width 5
    * is the 29m lesson re-learned by measurement (r13): on a Zipf
    * vocab the 3-gram domain SATURATES as the corpus grows — at 10×
    * rows the rarest 3-gram df of a typical doc was ~140, so
    * df-rarest blocks tracked df and pair mass went n² (7.3M at sf1);
    * the 5-gram domain keeps per-doc minimum dfs at fixture scale
    * 2-6, measured pair mass 1.1k → 11k → 101k over three decades —
    * linear.
    *
    * Short-doc floor (r13 ADVICE): a doc with fewer than 5 tokens has
    * no 5-gram and would emit ZERO blocking keys — exact copies of
    * 3-4-token docs (where 3-gram verify is defined and J = 1.0)
    * would silently never pair. Such docs key on ONE synthetic
    * whole-token-sequence posting instead ("wjshort:" prefix keeps
    * it out of the genuine-shingle hash space), so identical/
    * same-sequence short docs share a block. The residual, documented
    * floor: a <5-token doc never blocks with a ≥5-token doc (their
    * key domains are disjoint) — near-dups straddling the shingle
    * width stay out of candidates, like any blocked family's
    * below-width pairs. Blocking only; verify domains are unchanged.
    */
  private[graft] def wjPostings(docs: DataFrame): DataFrame = {
    // ONE scan + ONE conditional explode, with the token array
    // MATERIALIZED in a projection BELOW the Generate: the generator
    // expression references the array three times (size guard,
    // shingle branch, fallback branch) and Generate gets no
    // subexpression elimination, so inlining tokens() there ran the
    // regex split 3× per row (bench-gate-measured 3×; the first cut
    // — two filtered UNION branches — re-scanned and re-tokenized
    // the corpus instead, ~1.6×). Projections don't collapse across
    // a Generate node, so `ts` is computed exactly once per row.
    docs.select(col("doc_id"), tokens(col("text")).as("ts"))
      .select(col("doc_id"),
        explode(when(size(col("ts")) >= 5, shingleHashes(col("ts"), 5))
          .otherwise(array(tokenHash(
            concat(lit("wjshort:"), concat_ws(" ", col("ts"))))))).as("h"))
      .distinct()
  }

  /** Rarest-shingle prefix keys (the 29m df-ordering discipline,
    * r12-verdict #1): each doc emits its [[WjPrefix]] rarest shingles
    * by ascending (corpus df, h). Shingles with df = 1 are excluded
    * BEFORE ranking — a shingle only one doc contains can never
    * produce a cross-doc candidate, but (boundary shingles of a
    * repeated page, crawl noise) it would otherwise hijack the
    * prefix slots of exactly the docs this family exists to catch.
    * Block sizes are bounded by the df of the picked shingle, and
    * rarest-first ranking concentrates picks on low-df shingles, so
    * candidate mass stays near-linear where the old two-min-hash
    * blocking squared on shared-vocab corpora (P(pick) concentrated
    * on the few globally-minimal hashes). Degenerate corpora whose
    * every shingle is common remain the documented dial (raise
    * [[WjPrefix]] granularity / shingle width).
    */
  private def wjPrefixKeys(sh: DataFrame): DataFrame = {
    val dfc = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    sh.join(dfc, Seq("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= WjPrefix)
      .select(col("doc_id"), col("h"))
  }

  /** Candidate-mass instrumentation for the weighted-Jaccard family
    * (the edit-join 3-point-study discipline): stage cardinalities
    * that drive the scale exponent, for graft.MassProbe.
    */
  def wjMassStats(docs: DataFrame): Seq[(String, Long)] = {
    val post = wjPostings(docs)
    val pf = wjPrefixKeys(post)
    val cand = shingleMinBlock(docs)
    val tc = wjCounts(docs)
    val verifyRows = cand.join(tc.toDF("doc_a", "h", "c_a"), Seq("doc_a"))
      .join(tc.toDF("doc_b", "h", "c_b"), Seq("doc_b", "h"))
    Seq(
      "docs" -> docs.count(),
      "postings" -> post.count(),
      "prefix_rows" -> pf.count(),
      "candidates" -> cand.count(),
      "verify_rows" -> verifyRows.count())
  }

  /** df-rarest-prefix blocking: candidate pairs share at least one of
    * their [[WjPrefix]] rarest (by corpus df) shingles — one pure
    * equi-join on the shingle hash over the prefix postings.
    */
  private def shingleMinBlock(docs: DataFrame): DataFrame = {
    val pf = wjPrefixKeys(wjPostings(docs))
    pf.toDF("doc_a", "h")
      .join(pf.toDF("doc_b", "h"), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Shared-term Σmin frame for the weighted-Jaccard family: per
    * candidate pair, sum_min = Σ_t min(c_a, c_b) from ONE inner
    * equi-join on (pair, term-hash) — never a full outer join per
    * pair — and sum_max = tot_a + tot_b − sum_min by the multiset
    * identity, so unshared terms are never materialized.
    */
  private def wjSums(cand: DataFrame, tc: DataFrame): DataFrame = {
    val tot = tc.groupBy(col("doc_id")).agg(sum(col("c")).as("tot"))
    cand.join(tc.toDF("doc_a", "h", "c_a"), Seq("doc_a"))
      .join(tc.toDF("doc_b", "h", "c_b"), Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(least(col("c_a"), col("c_b"))).as("sum_min"))
      .join(tot.toDF("doc_a", "tot_a"), Seq("doc_a"))
      .join(tot.toDF("doc_b", "tot_b"), Seq("doc_b"))
      .withColumn("sum_max", col("tot_a") + col("tot_b") - col("sum_min"))
  }

  /** Weighted (multiset) Jaccard near-dup — J_W(A,B) =
    * Σ_t min(a_t, b_t) / Σ_t max(a_t, b_t) over word-COUNT vectors
    * (the quantity of Ioffe 2010 / Haveliwala et al.): the set
    * Jaccard of 31 ignores how often a term repeats, so a page that
    * loops one paragraph 50× scores identical to a single copy —
    * the weighted form is what template/boilerplate near-dup
    * actually measures. Candidates ride [[shingleMinBlock]]'s
    * df-rarest prefix postings (pure equi-join, blocks bounded by
    * the picked shingle's df); the verify stage is exact integer
    * Σmin/Σmax via [[wjSums]]. Scale shape: one token-count agg, one
    * df agg + doc-partitioned rank, one prefix equi-join, one
    * (pair, term) inner equi-join with per-doc-sized fan-out — no
    * quadratic stage anywhere.
    */
  def weightedJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    weightedJaccardPairsFrom(wjPostings(docs), wjCounts(docs), threshold)

  /** [[weightedJaccardPairs]] over PRECOMPUTED index frames (shingle
    * postings + token counts) — the serving form the streaming wj
    * index reads: blocking keys recompute from the persisted postings
    * (df-rarest prefixes are corpus-df-dependent, so serving at the
    * CURRENT corpus df is what makes the served pairs equal the batch
    * operator over everything delivered), verify reads only the
    * persisted counts; no text pass anywhere.
    */
  def weightedJaccardPairsFrom(postings: DataFrame, counts: DataFrame,
                               threshold: Double = 0.5): DataFrame = {
    val pf = wjPrefixKeys(postings)
    val cand = pf.toDF("doc_a", "h")
      .join(pf.toDF("doc_b", "h"), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    weightedJaccardVerify(cand, counts, threshold)
  }

  /** The exact Σmin/Σmax verify stage over a PRECOMPUTED candidate
    * frame — factored so the shared-candidate path ([[qWeightedJaccard]]
    * over [[wjCandBase]]) runs the identical verify plan.
    */
  private[graft] def weightedJaccardVerify(cand: DataFrame, counts: DataFrame,
                                           threshold: Double): DataFrame =
    wjSums(cand, counts)
      .withColumn("wjaccard", col("sum_min") / col("sum_max"))
      .filter(col("wjaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sum_min"), col("sum_max"),
        round(col("wjaccard"), 6).as("wjaccard"))

  /** Per-doc token counts (doc_id, h, c) — the verify-stage half of
    * the weighted-Jaccard incremental index.
    */
  private[graft] def wjCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), tokenHash(col("t")).as("h"))
      .agg(count(lit(1)).as("c"))

  /** Incremental weighted-Jaccard probe over PRECOMPUTED index frames
    * (the r12 ADVICE fix): which docs of a NEW batch are
    * weighted-near-dups of the EXISTING corpus (or of each other).
    * The existing side contributes only its persisted shingle
    * postings ([[wjPostings]]) and token counts ([[wjCounts]]) —
    * computed once at index build, appended per batch, NEVER
    * re-tokenized here; only the incoming batch touches text.
    * Blocking is the batch operator's df-rarest prefix over the
    * UNION's df (one integer agg + rank over the posting frames — no
    * text pass), so the emitted pairs are exactly the batch
    * operator's restricted to batch-touching pairs (spec-pinned).
    * Output (new_doc, matched_doc, wjaccard).
    */
  def weightedJaccardIncrementalFrom(oldPostings: DataFrame,
                                     oldCounts: DataFrame,
                                     incoming: DataFrame,
                                     threshold: Double = 0.5): DataFrame =
    weightedJaccardIncrementalIndexed(oldPostings, oldCounts,
      wjPostings(incoming), wjCounts(incoming), threshold)

  /** [[weightedJaccardIncrementalFrom]] with the INCOMING side's index
    * frames also precomputed — the fully-indexed serving form (and the
    * shared-stage path: q_wj_incremental's existing/incoming split is
    * the corpus split at [[Shift]], so both sides' postings and counts
    * are doc_id-range slices of the memoized corpus index).
    */
  private[graft] def weightedJaccardIncrementalIndexed(
      oldPostings: DataFrame, oldCounts: DataFrame,
      newPost: DataFrame, newCounts: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val isNew = newPost.select(col("doc_id")).distinct()
      .withColumn("is_new", lit(1))
    val pf = wjPrefixKeys(oldPostings.unionAll(newPost))
      .join(isNew, Seq("doc_id"), "left")
      .withColumn("is_new", coalesce(col("is_new"), lit(0)))
    val pfNew = pf.filter(col("is_new") === 1).select(col("doc_id"), col("h"))
    val pfOld = pf.filter(col("is_new") === 0).select(col("doc_id"), col("h"))
    val vsOld = pfNew.toDF("new_doc", "h")
      .join(pfOld.toDF("old_doc", "h"), Seq("h"))
      .filter(col("new_doc") =!= col("old_doc"))
      .select(col("new_doc"), col("old_doc").as("matched_doc"))
    val vsNew = pfNew.toDF("doc_a", "h")
      .join(pfNew.toDF("doc_b", "h"), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_b").as("new_doc"), col("doc_a").as("matched_doc"))
    val cand = vsOld.unionAll(vsNew)
      .select(col("new_doc").as("doc_a"), col("matched_doc").as("doc_b"))
      .distinct()
    val tc = oldCounts.unionByName(newCounts)
    wjSums(cand, tc)
      .withColumn("wjaccard", col("sum_min") / col("sum_max"))
      .filter(col("wjaccard") >= threshold)
      .select(col("doc_a").as("new_doc"), col("doc_b").as("matched_doc"),
        round(col("wjaccard"), 6).as("wjaccard"))
  }

  /** Convenience form of [[weightedJaccardIncrementalFrom]] that
    * builds the existing side's index frames from text in-line (the
    * oracle/spec entry point; production persists the frames and
    * calls the `From` variant so the corpus is tokenized once).
    */
  def weightedJaccardIncremental(existing: DataFrame, incoming: DataFrame,
                                 threshold: Double = 0.5): DataFrame =
    weightedJaccardIncrementalFrom(
      wjPostings(existing), wjCounts(existing), incoming, threshold)

  /** Repetition-index cap for the weighted-MinHash expansion
    * (fan-out bound: ≤ WmCap virtual elements per distinct term).
    */
  val WmCap = 8L

  /** Weighted-MinHash estimator quality — the [[minhashEstimates]]
    * audit for the WEIGHTED form: integer weights reduce weighted
    * Jaccard to SET Jaccard over virtual elements (t, 1..c_t) (the
    * classic reduction Ioffe 2010 §1 starts from), so plain MinHash
    * over the expanded multiset estimates J_W with the standard
    * NumPerm-component agreement. Counts are CAPPED at [[WmCap]]
    * before expansion, so both the estimate AND the exact ppm
    * reported beside it are J_W of the capped count vectors —
    * apples to apples by construction. Output per blocked candidate
    * pair: (n_agree, est_ppm, wj_ppm).
    */
  def weightedMinhashEstimates(docs: DataFrame): DataFrame = {
    val tc = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), tokenHash(col("t")).as("h"))
      .agg(least(count(lit(1)), lit(WmCap)).as("c"))
    weightedMinhashEstimatesFrom(shingleMinBlock(docs), tc)
  }

  /** [[weightedMinhashEstimates]] over a PRECOMPUTED candidate frame
    * and CAPPED count frame (doc_id, h, c ≤ WmCap) — the shared-stage
    * path ([[qWminhash]] derives both from the wj family's memoized
    * index frames; `least(count, cap)` ≡ `least(c, cap)` on the
    * uncapped counts, so the inputs are identical by construction).
    */
  private[graft] def weightedMinhashEstimatesFrom(cand: DataFrame,
                                                  tc: DataFrame): DataFrame = {
    val elems = tc
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(1L), col("c"))).as("r"))
      .select(col("doc_id"),
        (((col("h") % HashP) * 131L + col("r")) % HashP).as("ep"))
    val sigCols = (0 until NumPerm).map(k =>
      min((col("ep") * A(k) + B(k)) % HashP).as(s"h$k"))
    val sig = elems.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val sa = sig.toDF("doc_a" +: (0 until NumPerm).map(k => s"a$k"): _*)
    val sb = sig.toDF("doc_b" +: (0 until NumPerm).map(k => s"b$k"): _*)
    val matches = (0 until NumPerm)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    wjSums(cand, tc)
      .join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("n_agree", matches)
      .select(col("doc_a"), col("doc_b"), col("n_agree"),
        expr(s"(n_agree * 1000000) div $NumPerm").as("est_ppm"),
        expr("(1000000 * sum_min) div sum_max").as("wj_ppm"))
  }

  /** Dedup resolution: near-dup pairs → connected components, so
    * each duplicate cluster keeps one canonical doc (the minimum
    * id). Iterative min-label propagation — converges in
    * O(log(diameter)) joins, the standard Spark formulation;
    * localCheckpoint truncates the loop's lineage. Matches the
    * transitive closure (oracle: recursive CTE).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    // Lineage cut per iteration: RELIABLE checkpoints (HDFS-durable,
    // executor-loss-safe — what a 100 TB run needs) whenever a
    // checkpoint dir is configured; executor-memory localCheckpoint
    // as the single-box fallback.
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    def labelSum(df: DataFrame): BigDecimal = BigDecimal(
      df.agg(coalesce(sum(col("component_id").cast("decimal(38,0)")), lit(0))
        .cast("decimal(38,0)")).collect()(0).getDecimal(0))
    val edges = cut(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct())
    var labels = cut(edges.select(col("src").as("v")).distinct()
      .withColumn("component_id", col("v")))
    // Min-label propagation only ever lowers labels, so the label sum
    // strictly decreases until the fixed point — convergence is one
    // scalar aggregate per iteration, not a join + isEmpty job.
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = cut(edges.join(labels, col("src") === col("v"))
        .select(col("dst").as("v"), col("component_id"))
        .unionAll(labels)
        .groupBy(col("v")).agg(min(col("component_id")).as("component_id")))
      val curSum = labelSum(prop)
      converged = curSum == prevSum
      prevSum = curSum
      labels = prop
      iter += 1
    }
    labels.select(col("v").as("doc_id"), col("component_id"))
  }

  /** Connected components via LARGE-STAR / SMALL-STAR alternation
    * (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log n)-round alternative to
    * [[connectedComponents]]' min-label propagation, which needs
    * O(diameter) rounds and makes chain-shaped dup clusters (URL
    * redirect chains, boilerplate gradients) the tail risk of a
    * 100 TB web graph. Same signature, same output, spec-pinned
    * equal to [[connectedComponents]] on the fixtures.
    *
    * Each round is two edge-keyed partial-agg + equi-join passes
    * over an edge set that only ever SHRINKS toward the star graph
    * (every node pointing at its component min); convergence is an
    * order-independent xxhash64 edge-set checksum — one scalar agg
    * per round, the [[connectedComponents]] label-sum discipline.
    */
  def connectedComponentsLS(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsLSRounds(pairs, maxIter)._1

  /** [[connectedComponentsLS]] + the measured round count (the spec
    * asserts rounds ≪ diameter on a chain fixture).
    */
  private[graft] def connectedComponentsLSRounds(pairs: DataFrame,
                                                 maxIter: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    def checksum(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(0)).cast("decimal(38,0)")).collect()(0)
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }
    // large-star: every node u links its STRICTLY LARGER neighbors
    // to min(Γ(u) ∪ {u}) — output edges all point high → low
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      sym.join(mins, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }
    // small-star: every node u (over its smaller neighborhood — all
    // edges point high → low here) links those neighbors AND itself
    // to the neighborhood min
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val j = e.join(mins, Seq("src"))
      j.select(col("dst").as("v"), col("m"))
        .unionAll(mins.select(col("src").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("src"), col("m").as("dst"))
        .distinct()
    }
    // Cut the raw pair projection ONCE: it is consumed twice — the
    // initial edge set here and the vertex set after the loop — and
    // without the cut the caller's pair GENERATION (the LSH banding /
    // blocking join, far more expensive than the pair list itself)
    // re-executes for the second consumer (r15 optimization; output
    // unchanged).
    val p = cut(pairs.select(col("doc_a"), col("doc_b")))
    var edges = cut(p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    var (prevN, prevSum) = checksum(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = cut(smallStar(largeStar(edges)))
      val (curN, curSum) = checksum(next)
      converged = curN == prevN && curSum == prevSum
      prevN = curN; prevSum = curSum
      edges = next
      rounds += 1
    }
    // fixpoint = star graph: every non-min node has exactly the edge
    // (v, component min); min nodes label themselves. Degenerate
    // self-pair vertices (filtered from the edge set) label
    // themselves via the coalesce, matching [[connectedComponents]].
    val labels = edges.select(col("src").as("doc_id"), col("dst").as("component_id"))
      .unionAll(edges.select(col("dst").as("doc_id"), col("dst").as("component_id")))
      .distinct()
    val verts = p.select(col("doc_a").as("doc_id"))
      .unionAll(p.select(col("doc_b").as("doc_id"))).distinct()
    val out = verts.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component_id"), col("doc_id")).as("component_id"))
    (out, rounds)
  }

  /** Estimator quality for MinHash: per candidate pair, the
    * signature-agreement estimate (matching components / K) next to
    * the exact shingle-set Jaccard — the number you watch when
    * tuning K/bands on a real corpus. Joins are all keyed on doc
    * ids; the pair set is already candidate-bounded.
    */
  def minhashEstimates(docs: DataFrame): DataFrame =
    minhashEstimatesFrom(docs, minhashPairs(docs))

  /** [[minhashEstimates]] over a PRECOMPUTED candidate pair frame —
    * the shared-stage path (q_minhash_est rides [[minhashPairsBase]]).
    */
  private[graft] def minhashEstimatesFrom(docs: DataFrame,
                                          pairs: DataFrame): DataFrame = {
    val sig = minhashSignatures(docs)
    val sa = sig.toDF("doc_a" +: (0 until NumPerm).map(k => s"a$k"): _*)
    val sb = sig.toDF("doc_b" +: (0 until NumPerm).map(k => s"b$k"): _*)
    val matches = (0 until NumPerm)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    val d = docs.select(col("doc_id"),
      explode(shingleHashes(tokens(col("text")), 3)).as("h"))
      .groupBy(col("doc_id")).agg(collect_set(col("h")).as("hs"))
    pairs
      .join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("est_jaccard", round(matches / lit(NumPerm.toDouble), 6))
      .join(d.toDF("doc_a", "hs_a"), "doc_a")
      .join(d.toDF("doc_b", "hs_b"), "doc_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard", round(
        col("inter") / (size(col("hs_a")) + size(col("hs_b")) - col("inter")), 6))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"))
  }

  /** Incremental dedup: which docs of a NEW batch duplicate the
    * EXISTING corpus, or each other. The existing side's bands are
    * the "index" (in production: computed once, stored, and only
    * the incoming batch is hashed per run — the cost scales with the
    * batch, not the corpus); incoming bands equi-join the index plus
    * themselves. Output (new_doc, matched_doc).
    */
  def incrementalDupes(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val idx = minhashBands(minhashSignatures(existing))
    val inc = minhashBands(minhashSignatures(incoming))
    val vsOld = inc.toDF("new_doc", "band_n", "hash_n")
      .join(idx.toDF("old_doc", "band_o", "hash_o"),
        col("band_n") === col("band_o") && col("hash_n") === col("hash_o"))
      .select(col("new_doc"), col("old_doc").as("matched_doc"))
    val a = inc.toDF("doc_a", "band_a", "hash_a")
    val b = inc.toDF("doc_b", "band_b", "hash_b")
    val vsNew = a.join(b,
        col("band_a") === col("band_b") && col("hash_a") === col("hash_b")
          && col("doc_a") < col("doc_b"))
      .select(col("doc_b").as("new_doc"), col("doc_a").as("matched_doc"))
    vsOld.unionAll(vsNew).distinct()
  }

  /** Exact repeated-substring spans (the suffix-array-style dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", re-expressed relationally): a token position is
    * "repeated" when the SpanShingle-token shingle starting there
    * occurs more than once ANYWHERE in the corpus; maximal runs of
    * consecutive repeated positions are the spans a pipeline would
    * excise. Where the paper builds one giant suffix array, the
    * relational form is two content-keyed shuffles — positions
    * explode once, occurrence counts partial-aggregate on the 48-bit
    * shingle hash (uniform, no hot keys), and span merging is the
    * classic pos − row_number() island trick inside per-document
    * windows (bounded by doc length, never corpus-wide). Every stage
    * is linear in corpus tokens: the 100 TB shape.
    */
  val SpanShingle = 5

  def repeatedSpans(docs: DataFrame): DataFrame = {
    val positions = docs.select(col("doc_id"),
      posexplode(shingleHashes(tokens(col("text")), SpanShingle)).as(Seq("pos", "h")))
    val repeated = positions.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ")).filter(col("n_occ") > 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    positions.join(repeated, "h")
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + SpanShingle - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_shingles"),
        (max(col("pos")) - min(col("pos")) + SpanShingle).cast("long")
          .as("span_len_tokens"),
        max(col("n_occ")).as("max_occ"))
      .drop("grp")
  }

  /** The APPLY step of repeated-substring dedup: drop every token
    * covered by a repeated shingle and return per-document removal
    * accounting plus a hash of the surviving text. A token t is
    * covered iff some repeated shingle starts in [t−SpanShingle+1, t]
    * — computed as a sliding-window max of the per-position repeat
    * flag (ROWS BETWEEN SpanShingle−1 PRECEDING AND CURRENT ROW),
    * so the apply costs one extra per-document window over
    * [[repeatedSpans]]' detection pass; no span materialization, no
    * range join. Surviving text is reassembled order-exactly inside
    * the final aggregate (collect_list skips the nulled covered
    * positions).
    */
  def exciseRepeatedSpans(docs: DataFrame): DataFrame = {
    val sh = spanShingles(docs)
    val rep = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ")).filter(col("n_occ") > 1).select(col("h"))
    val flags = sh.join(rep, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(1L).as("f"))
    coverAndAccount(docs, flags)
  }

  /** Keep-first variant of [[exciseRepeatedSpans]] — what most
    * published pipelines actually do: retain ONE copy of each
    * duplicated span (the globally first occurrence in
    * (doc_id, pos) order) and excise every later one. The first
    * occurrence per shingle hash is a partial-aggregatable
    * lexicographic `min(struct(doc_id, pos))`, so a pathologically
    * hot shingle ("the the the…") costs one combiner cell — never a
    * skewed per-hash window partition. NO position budget (r6
    * verdict #3): the struct min orders (doc_id, pos) natively at
    * any document length, so million-token docs' tails claim
    * first-occurrence and get excised like any other span — the
    * pre-r7 bit-packed key (doc_id·2^20 + pos) truncated them
    * (oracle twin: DuckDB `min(ROW(doc_id, pos))`, the same
    * lexicographic semantics; `q_span_long` pins it past 2^20).
    */
  def exciseRepeatedSpansKeepFirst(docs: DataFrame): DataFrame = {
    val sh = spanShingles(docs)
    val occ = struct(col("doc_id"), col("pos"))
    val firstOcc = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"), min(occ).as("fk"))
      .filter(col("n_occ") > 1)
      .select(col("h"), col("fk"))
    val flags = sh.join(firstOcc, Seq("h"))
      .filter(occ =!= col("fk"))
      .select(col("doc_id"), col("pos"), lit(1L).as("f"))
    coverAndAccount(docs, flags)
  }

  private def spanShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(shingleHashes(tokens(col("text")), SpanShingle)).as(Seq("pos", "h")))

  /** Shared excise tail: widen position flags to covered tokens via
    * the per-document sliding-window max, and account removals plus
    * a hash of the surviving text.
    */
  private def coverAndAccount(docs: DataFrame, flags: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "t")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(SpanShingle - 1), 0)
    tok.join(flags, Seq("doc_id", "pos"), "left")
      .withColumn("covered", max(coalesce(col("f"), lit(0L))).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("covered")).as("n_removed"),
        tokenHash(concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("covered") === 0L, struct(col("pos"), col("t"))))),
            x => x.getField("t")))).as("survivor_hash"))
  }

  /** The APPLY step of dedup: resolve near-dup pairs to clusters,
    * keep each cluster's minimum doc_id, and return the surviving
    * corpus — what a curation pipeline actually materializes.
    * Structure: pairs → components (iterative) → semi/anti joins
    * against the corpus; docs in no cluster survive untouched.
    */
  def applyDedup(docs: DataFrame, pairs: DataFrame): DataFrame =
    applyDedupFrom(docs, connectedComponents(pairs))

  /** [[applyDedup]] over a PRECOMPUTED components frame — the serving
    * form (production resolves pairs to components once and feeds
    * every apply policy from the same table).
    */
  private[graft] def applyDedupFrom(docs: DataFrame, comp: DataFrame): DataFrame = {
    // survivors: docs not in any cluster, plus each cluster's min id
    val losers = comp.filter(col("doc_id") =!= col("component_id"))
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Soft dedup: DOWNWEIGHT duplicates instead of dropping them —
    * the published alternative to hard removal (duplicate-aware
    * sampling; e.g. SoftDeDup, arXiv 2024). Each exact-content
    * cluster keeps total sampling mass 1: every member gets
    * weight = 1/dup_count, held INTEGER as ppm (`div`) so the
    * manifest is bit-reproducible. One content-hash aggregate plus
    * one equi-join back on the hash — two content-keyed shuffles,
    * linear at any corpus size, and the training loader consumes
    * the weights without a second dedup pass.
    */
  def softDedupWeights(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .join(exact(docs), "content_hash")
      .select(col("doc_id"), col("dup_count"),
        expr("1000000 div dup_count").as("weight_ppm"),
        when(col("doc_id") === col("keep_id"), 1L).otherwise(0L)
          .as("is_canonical"))

  /** MinHash FUZZY decontamination — the GPT-3-style fuzzy benchmark
    * dedup: flag training docs whose estimated Jaccard similarity to
    * any benchmark doc reaches FuzzyTauPpm, catching paraphrased /
    * lightly-edited leaks the exact-shingle screen misses. Candidates
    * come from the same banded LSH equi-join as near-dup detection
    * (never n²); the benchmark side BANDS and SIGNATURES broadcast
    * (benchmarks are small by definition), so the training corpus
    * shuffles only to build its own signatures. The similarity
    * estimate is the signature agreement fraction held INTEGER
    * (matching perms · 1e6 div NumPerm) — bit-reproducible. Output is
    * every candidate pair with its estimate and flag; the caller
    * anti-joins flagged train ids to scrub.
    */
  val FuzzyTauPpm = 800000L

  def fuzzyDecontaminate(train: DataFrame, bench: DataFrame): DataFrame =
    fuzzyDecontaminateAgainst(train, minhashSignatures(bench))

  /** [[fuzzyDecontaminate]] against PRE-COMPUTED benchmark
    * signatures — the streaming twin pins these once and screens
    * every micro-batch against them.
    */
  def fuzzyDecontaminateAgainst(train: DataFrame, bSig: DataFrame): DataFrame = {
    val tSig = minhashSignatures(train)
    val tBands = minhashBands(tSig)
      .toDF("train_doc_id", "band_id", "band_hash")
    val bBands = minhashBands(bSig)
      .toDF("bench_doc_id", "band_id", "band_hash")
    val cand = tBands.join(broadcast(bBands), Seq("band_id", "band_hash"))
      .filter(col("train_doc_id") =!= col("bench_doc_id"))
      .select(col("train_doc_id"), col("bench_doc_id")).distinct()
    val tS = tSig.toDF(("train_doc_id" +: (0 until NumPerm).map(k => s"t$k")): _*)
    val bS = bSig.toDF(("bench_doc_id" +: (0 until NumPerm).map(k => s"b$k")): _*)
    val agree = (0 until NumPerm)
      .map(k => when(col(s"t$k") === col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(tS, "train_doc_id").join(broadcast(bS), "bench_doc_id")
      .withColumn("n_matching_perms", agree)
      .select(col("train_doc_id"), col("bench_doc_id"), col("n_matching_perms"),
        expr(s"(1000000 * n_matching_perms) div $NumPerm").as("est_jaccard_ppm"))
      .withColumn("flagged",
        when(col("est_jaccard_ppm") >= FuzzyTauPpm, 1L).otherwise(0L))
  }

  /** Analytic LSH parameter tuning (the datasketch `_optimal_param`
    * rule): among all (bands, rows) with bands·rows ≤ numPerm, pick
    * the one minimizing weighted false-positive + false-negative
    * AREA under the S-curve P(match | s) = 1 − (1 − s^rows)^bands —
    * fp = ∫₀^τ P ds, fn = ∫τ^1 (1 − P) ds — so the banding is chosen
    * for the caller's Jaccard threshold BEFORE any data is read
    * (the measured complement is autoConfig's recall ladder). Pure
    * driver-side arithmetic over a fixed 1e-3 Riemann grid:
    * deterministic, data-free, O(numPerm² · grid).
    */
  def optimalBands(threshold: Double, numPerm: Int = NumPerm,
                   fpWeight: Double = 0.5): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    val step = 0.001
    val configs = for {
      b <- 1 to numPerm; r <- 1 to numPerm; if b * r <= numPerm
    } yield (b, r)
    configs.minBy { case (b, r) =>
      def p(s: Double) = 1.0 - math.pow(1.0 - math.pow(s, r), b)
      val fp = Iterator.iterate(step / 2)(_ + step).takeWhile(_ < threshold)
        .map(p).sum * step
      val fn = Iterator.iterate(threshold + step / 2)(_ + step).takeWhile(_ < 1.0)
        .map(s => 1.0 - p(s)).sum * step
      fpWeight * fp + (1.0 - fpWeight) * fn
    }
  }

  /** One MinHash banding configuration: a (bands, rows) split of the
    * NumPerm signature. `key` is the stable quality-gate identifier.
    */
  final case class MinhashConfig(bands: Int, rows: Int) {
    def key: String = s"b${bands}r$rows"
  }

  final case class MinhashSweepPoint(config: MinhashConfig,
                                     nCandidates: Long, recall: Double)

  /** Cheapest-first banding ladder: fewer bands of more rows =
    * strictest buckets = fewest candidates; (8,1) collides on ANY
    * agreeing permutation — the recall ceiling of an 8-perm
    * signature.
    */
  val DefaultMinhashLadder: Seq[MinhashConfig] = Seq(
    MinhashConfig(1, 8), MinhashConfig(2, 4), MinhashConfig(4, 2),
    MinhashConfig(8, 1))

  /** Audit threshold for the banding ladder: admits the J ≈ 1/3
    * subset mutant, the rung where band configs actually separate
    * (clone pairs at J = 1 collide in every config — no signal).
    */
  val MinhashAuditThreshold = 0.25

  /** MEASURED recall of the MinHash-LSH candidate generator per
    * (bands, rows) config — the datasketch-style analytic curve
    * ([[optimalBands]]) finally gets its measured complement (its
    * own docstring promised one). Ground truth is CONSTRUCTED, not
    * searched: the corpus's shingle streams plus deterministic
    * subset mutants under shifted ids — keep-every-k and
    * drop-every-k shingle-position filters, so each mutant's
    * distinct-shingle set is a SUBSET of its original's and the
    * exact Jaccard is |mutant| / |original| by arithmetic (no
    * blocked pair search whose own recall would contaminate the
    * audit). The mutant spectrum {J ≈ 1/3, 1/2, 2/3, 4/5} straddles
    * every config's S-curve knee. Candidates ride the PRODUCTION
    * [[pairsFromBands]] plan (hot-bucket stars included);
    * signatures/planes are md5/A·h+B-derived constants, so every
    * number is deterministic and the cross-round gate is exact.
    */
  def minhashSweep(docs: DataFrame, configs: Seq[MinhashConfig],
                   threshold: Double = MinhashAuditThreshold): Seq[MinhashSweepPoint] = {
    // shingle streams computed ONCE (HOF runs once; mutants are pure
    // row filters over the checkpointed frame)
    val base = docs.select(col("doc_id"),
        posexplode(shingleHashes(tokens(col("text")), 3)).as(Seq("pos", "h")))
      .select(col("doc_id"), col("pos"), (col("h") % HashP).as("hp"))
      .localCheckpoint()
    val variants: Seq[(Long, org.apache.spark.sql.Column)] = Seq(
      1L -> (col("pos") % 2 =!= 0), // keep 1/2  → J ≈ 0.5
      2L -> (col("pos") % 3 =!= 0), // keep 2/3  → J ≈ 0.67
      3L -> (col("pos") % 3 === 0), // keep 1/3  → J ≈ 0.33
      4L -> (col("pos") % 5 =!= 0)) // keep 4/5  → J ≈ 0.8
    val mutants = variants.map { case (m, pred) =>
      base.filter(pred)
        .select((col("doc_id") + lit(m * Shift)).as("doc_id"),
          col("pos"), col("hp"))
    }.reduce(_ unionAll _)
    val fixture = base.unionAll(mutants).localCheckpoint()
    // exact Jaccard per constructed pair: mutant hp-set ⊆ original
    // hp-set, so |∩| = |mutant|, |∪| = |original|
    val sizes = fixture.groupBy(col("doc_id"))
      .agg(count_distinct(col("hp")).as("nset"))
    val truth = sizes.filter(col("doc_id") < Shift)
      .select(col("doc_id").as("doc_a"), col("nset").as("n_orig"))
      .join(sizes.filter(col("doc_id") >= Shift)
        .select(col("doc_id").as("doc_b"),
          (col("doc_id") % Shift).as("doc_a"), col("nset").as("n_mut")),
        "doc_a")
      .filter(col("n_mut") >= col("n_orig") * threshold)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val nTrue = truth.count().toDouble
    // An empty truth set means the fixture is degenerate (e.g. empty
    // corpus): recall against no evidence must fail loudly, or the
    // auto-config walk would certify its floor on the cheapest rung.
    require(nTrue > 0,
      s"minhashSweep: constructed truth set is empty at threshold $threshold")
    val sigs = (0 until NumPerm).map(k =>
      min((col("hp") * A(k) + B(k)) % HashP).as(s"h$k"))
    val sig = fixture.groupBy(col("doc_id")).agg(sigs.head, sigs.tail: _*)
      .localCheckpoint()
    configs.map { cfg =>
      val cand = pairsFromBands(minhashBandsWith(sig, cfg.bands, cfg.rows))
        .localCheckpoint()
      val hit = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi").count()
      MinhashSweepPoint(cfg, cand.count(), hit / nTrue)
    }
  }

  /** Recall-targeted banding auto-configuration — the
    * [[graft.operators.Similarity.autoConfigLsh]] discipline on the
    * MinHash dedup family: walk the ladder cheapest-first, measure
    * each rung LAZILY, return the first config whose measured
    * candidate recall at the audit threshold meets the floor.
    * Complements [[optimalBands]] (analytic, data-free): the
    * analytic pick minimizes S-curve area, this one certifies a
    * floor on the actual corpus's shingle statistics.
    */
  def autoConfigMinhash(docs: DataFrame, targetRecall: Double,
                        ladder: Seq[MinhashConfig] = DefaultMinhashLadder,
                        threshold: Double = MinhashAuditThreshold): Option[MinhashSweepPoint] =
    ladder.iterator.map(c => minhashSweep(docs, Seq(c), threshold).head)
      .find(_.recall >= targetRecall)

  // --- exact set-similarity join via prefix filtering ----------------

  /** Jaccard threshold for the prefix-filter join, integer ppm. */
  val PrefixTauPpm = 600000L

  /** EXACT set-similarity self-join via document-frequency-ordered
    * prefix filtering (SSJoin/AllPairs, Chaudhuri et al. ICDE'06 /
    * Bayardo et al. WWW'07) — the no-false-negative complement of
    * MinHash-LSH: every pair with token-set Jaccard ≥ τ is returned,
    * with its EXACT similarity, no probabilistic recall dial needed.
    *
    * Element domain: distinct word-5-gram SHINGLE hashes (the
    * repeated-spans granularity, [[SpanShingle]]). Shingle width is
    * the exactness-preserving scale lever: unigram sets over a small
    * shared vocabulary make every pair similar (the module-doc
    * degeneracy), and even 3-gram dfs inflate enough on a Zipf vocab
    * to swamp the prefix postings — measured at sf1: candidate-pair
    * mass 168M for 3-grams vs 1.0M for 5-grams at τ=0.6 (160×,
    * hottest posting 184 → 4), because a shared 5-gram is evidence,
    * not coincidence. τ-Jaccard over 5-gram sets is the operator's
    * similarity definition — finer than the MinHash family's 3-gram
    * candidates, and exact.
    *
    * Discipline: order each doc's distinct shingle set by ascending
    * corpus document frequency (rarest first, hash tie-break) and
    * emit only the first |d| − ⌈τ·|d|⌉ + 1 shingles as join keys. Any
    * pair with J ≥ τ has overlap ≥ τ·|a∪b| ≥ ⌈τ·|x|⌉ for BOTH sides,
    * so by pigeonhole each side's prefix contains a shared token and
    * the pair survives (candidates additionally size-filtered:
    * τ·max(|a|,|b|) ≤ min(|a|,|b|), a Jaccard necessity). Exact
    * intersection counts then verify candidates — floor-division ppm
    * so the τ gate is integer-exact cross-engine.
    *
    * Scale: the df-ASCENDING order is what bounds the candidate set —
    * a hot token lands in a doc's prefix only when the doc's entire
    * vocabulary is even hotter, so prefix posting lists stay short
    * exactly where postings are long (the AllPairs insight); the
    * verify join fans out by candidate count × doc vocab, all
    * equi-joins keyed on doc ids. The per-doc rank window partitions
    * by doc_id (per-doc vocab ≤ doc length — never a global sort).
    * Worst case remains an all-identical corpus, where the OUTPUT
    * itself is quadratic — the same caveat every exact pairwise
    * operator carries; τ and the size filter prune everything else.
    */
  def prefixJoinPairs(docs: DataFrame, tauPpm: Long = PrefixTauPpm): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col("doc_id"),
        explode(shingleHashes(tokens(col("text")), SpanShingle)).as("h"))
      .distinct()
    val dfreq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = tok.join(dfreq, Seq("h"))
      .select(col("doc_id"), col("h"),
        row_number().over(byDoc.orderBy(col("df"), col("h"))).as("pos"),
        count(lit(1)).over(byDoc).as("sz"))
    val prefix = ranked
      .filter(col("pos") <=
        col("sz") - expr(s"($tauPpm * sz + 999999) div 1000000") + 1)
      .select(col("doc_id"), col("h"), col("pos"), col("sz"))
    // Candidate stage with the PPJoin positional overlap bound,
    // fused into the pair shuffle a bare distinct would pay anyway:
    // J ≥ τ ⟺ inter ≥ α = ⌈τ/(1+τ)·(sza+szb)⌉, and because every
    // doc's set is ranked by the SAME global (df, h) order, any
    // intersection element ordered before the LAST shared prefix
    // element t sits inside BOTH prefixes at positions < t's (so it
    // is already counted in `shared`), while elements after t number
    // at most min(sz_a − lpa, sz_b − lpb) where lpa/lpb are t's
    // positions. Hence inter ≤ shared + min(sz_a − lpa, sz_b − lpb)
    // — an exact upper bound; pairs that cannot reach α are pruned
    // BEFORE the verify join fans out by doc length.
    val cand = prefix.toDF("doc_a", "h", "pos_a", "sz_a")
      .join(prefix.toDF("doc_b", "hb", "pos_b", "sz_b"),
        col("h") === col("hb") && col("doc_a") < col("doc_b") &&
          lit(tauPpm) * greatest(col("sz_a"), col("sz_b")) <=
            lit(1000000L) * least(col("sz_a"), col("sz_b")))
      .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("shared"),
        max(col("pos_a")).as("lpa"), max(col("pos_b")).as("lpb"))
      .filter(col("shared") +
        least(col("sz_a") - col("lpa"), col("sz_b") - col("lpb")) >=
        expr(s"($tauPpm * (sz_a + sz_b) + ${1000000L + tauPpm - 1}) div ${1000000L + tauPpm}"))
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
    val inter = cand.select(col("doc_a"), col("doc_b"))
      .join(tok.select(col("doc_id").as("doc_a"), col("h")), Seq("doc_a"))
      .join(tok.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    cand.join(inter, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        expr("n_common * 1000000 div (sz_a + sz_b - n_common)")
          .as("jaccard_ppm"))
      .filter(col("jaccard_ppm") >= tauPpm)
  }

  def qPrefixJoin(s: SparkSession, dir: String): DataFrame =
    prefixJoinPairs(corpus(s, dir))

  /** INCREMENTAL exact similarity probe — the batch-vs-corpus form
    * of [[prefixJoinPairs]] (the q_dedup_incremental shape, exact
    * instead of banded): find every (batch doc, corpus doc) pair at
    * Jaccard ≥ τ over 5-gram shingle sets, probing only the BATCH
    * side's prefixes against the corpus's FULL posting lists.
    *
    * One-sided prefix filtering is sound under ANY consistent
    * ordering of the batch doc's own set (pigeonhole: if all
    * ≥ ⌈τ·|a|⌉ intersection elements sat outside a's first
    * |a|−⌈τ·|a|⌉+1 positions they would overflow the remaining
    * slots) — so the batch orders by the CORPUS df (unseen shingles
    * df 0, i.e. rarest-first), and the corpus side needs no prefix
    * at all. The one-sided suffix bound is likewise order-free:
    * an intersection element unmatched by the prefix probe lies in
    * a's suffix, so inter ≤ shared + ⌈τ·|a|⌉ − 1 — pairs that
    * cannot reach α prune before verification.
    *
    * Scale: cost rides the BATCH (prefix keys × matched corpus
    * postings), not the corpus — the incremental-dedup contract; at
    * 100 TB the posting join keys on the 48-bit shingle hash and
    * the verify joins key on candidate doc ids.
    */
  def prefixIncrementalPairs(existing: DataFrame, incoming: DataFrame,
                             tauPpm: Long = PrefixTauPpm): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def sets(docs: DataFrame) = docs
      .select(col("doc_id"),
        explode(shingleHashes(tokens(col("text")), SpanShingle)).as("h"))
      .distinct()
    val corp = sets(existing)
    val corpSz = corp.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfreq = corp.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val inc = sets(incoming)
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = inc.join(dfreq, Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        row_number().over(byDoc.orderBy(
          coalesce(col("df"), lit(0L)), col("h"))).as("pos"),
        count(lit(1)).over(byDoc).as("sz"))
    val prefix = ranked
      .filter(col("pos") <=
        col("sz") - expr(s"($tauPpm * sz + 999999) div 1000000") + 1)
      .select(col("doc_id"), col("h"), col("sz"))
    val cand = prefix.toDF("new_doc", "h", "sz_n")
      .join(corp.toDF("old_doc", "h"), Seq("h"))
      .join(corpSz.toDF("old_doc", "sz_o"), Seq("old_doc"))
      .filter(lit(tauPpm) * greatest(col("sz_n"), col("sz_o")) <=
        lit(1000000L) * least(col("sz_n"), col("sz_o")))
      .groupBy(col("new_doc"), col("old_doc"), col("sz_n"), col("sz_o"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") + expr(s"($tauPpm * sz_n + 999999) div 1000000") - 1 >=
        expr(s"($tauPpm * (sz_n + sz_o) + ${1000000L + tauPpm - 1}) div ${1000000L + tauPpm}"))
      .select(col("new_doc"), col("old_doc"), col("sz_n"), col("sz_o"))
    val inter = cand.select(col("new_doc"), col("old_doc"))
      .join(inc.toDF("new_doc", "h"), Seq("new_doc"))
      .join(corp.toDF("old_doc", "h"), Seq("old_doc", "h"))
      .groupBy(col("new_doc"), col("old_doc")).agg(count(lit(1)).as("n_common"))
    cand.join(inter, Seq("new_doc", "old_doc"))
      .select(col("new_doc"), col("old_doc"), col("n_common"),
        expr("n_common * 1000000 div (sz_n + sz_o - n_common)")
          .as("jaccard_ppm"))
      .filter(col("jaccard_ppm") >= tauPpm)
  }

  def qPrefixIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    prefixIncrementalPairs(docs,
      docs.select((col("doc_id") + Shift).as("doc_id"), col("text")))
  }

  // --- queries --------------------------------------------------------

  /** Lineage cut with the reliable-checkpoint discipline of
    * [[connectedComponents]] — the memoized shared stages below use it.
    */
  private def memoCut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Memoized shared stages per (session, dir) — the louvainBase
    * discipline applied to the dedup family (r15 optimization).
    * qDedupMinhash, qDedupComponents, qDedupComponentsLs, qDedupApply,
    * qDedupBest, qMinhashEst and qSplitSafe all consume the SAME
    * minhashPairs(corpus) banding join (and four of them the SAME
    * min-label components of it); the weighted-Jaccard family
    * (qNgramJaccard, qWeightedJaccard, qWminhash, q_wj_incremental)
    * all consume the SAME 5-gram postings / token counts / df-rarest
    * candidate table. Each query was re-running the signature passes,
    * the banding join and the iterative CC loop from scratch — exactly
    * what a production dedup run never does (pairs are generated once;
    * every resolution policy consumes them — guide §1.2 "don't compute
    * things you throw away"). Every process invocation still computes
    * from the parquet inputs; all consumer oracle outputs are
    * byte-identical.
    */
  private val pairsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def minhashPairsBase(s: SparkSession, dir: String): DataFrame =
    pairsMemo.getOrElseUpdate((s, dir), memoCut(minhashPairs(corpus(s, dir))))

  private val compsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Min-label components of [[minhashPairsBase]] — the loop output is
    * already lineage-cut per iteration, so no extra cut is needed.
    */
  private[graft] def componentsBase(s: SparkSession, dir: String): DataFrame =
    compsMemo.getOrElseUpdate((s, dir),
      connectedComponents(minhashPairsBase(s, dir)))

  private val wjPostMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def wjPostingsBase(s: SparkSession, dir: String): DataFrame =
    wjPostMemo.getOrElseUpdate((s, dir), memoCut(wjPostings(corpus(s, dir))))

  private val wjCntMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def wjCountsBase(s: SparkSession, dir: String): DataFrame =
    wjCntMemo.getOrElseUpdate((s, dir), memoCut(wjCounts(corpus(s, dir))))

  private val wjCandMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The df-rarest-prefix candidate pairs over [[wjPostingsBase]] —
    * [[shingleMinBlock]] on the shared postings.
    */
  private[graft] def wjCandBase(s: SparkSession, dir: String): DataFrame =
    wjCandMemo.getOrElseUpdate((s, dir), {
      val pf = wjPrefixKeys(wjPostingsBase(s, dir))
      memoCut(pf.toDF("doc_a", "h")
        .join(pf.toDF("doc_b", "h"), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .distinct())
    })

  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(s, dir))

  def qDedupFuzzyDecon(s: SparkSession, dir: String): DataFrame =
    fuzzyDecontaminate(corpus(s, dir),
      Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"), col("text")))

  def qDedupWeights(s: SparkSession, dir: String): DataFrame =
    softDedupWeights(corpus(s, dir))

  def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    minhashPairsBase(s, dir)

  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(corpus(s, dir))

  def qNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = corpus(s, dir)
    val sh = docs.select(col("doc_id"),
      explode(shingleHashes(tokens(col("text")), 3)).as("h"))
    val d = sh.groupBy(col("doc_id")).agg(collect_set(col("h")).as("hs"))
    ngramJaccardVerify(wjCandBase(s, dir), d, 0.5)
  }

  def qWeightedJaccard(s: SparkSession, dir: String): DataFrame =
    weightedJaccardVerify(wjCandBase(s, dir), wjCountsBase(s, dir), 0.5)

  def qWminhash(s: SparkSession, dir: String): DataFrame =
    weightedMinhashEstimatesFrom(wjCandBase(s, dir),
      wjCountsBase(s, dir).select(col("doc_id"), col("h"),
        least(col("c"), lit(WmCap)).as("c")))

  def qDedupComponents(s: SparkSession, dir: String): DataFrame =
    componentsBase(s, dir)

  /** The large-star/small-star alternation on the SAME pair graph —
    * identical output by construction (one oracle serves both), but
    * O(log n) rounds instead of O(diameter).
    */
  def qDedupComponentsLs(s: SparkSession, dir: String): DataFrame =
    connectedComponentsLS(minhashPairsBase(s, dir))

  def qDedupApply(s: SparkSession, dir: String): DataFrame =
    applyDedupFrom(corpus(s, dir), componentsBase(s, dir))
      .select(col("doc_id"), md5(col("text")).as("content_hash"))

  /** Quality-aware survivor selection: within each near-dup cluster
    * keep the LONGEST member (ties to the smallest id) instead of
    * [[applyDedup]]'s min-id policy — the "keep the best copy"
    * resolution every production dedup actually wants (the longest
    * crawl of a page usually carries the least truncation). Same
    * scale shape as applyDedup: components + one equi-join on
    * doc_id; the rank window partitions on component_id
    * (cardinality ∝ corpus, never a single-task window).
    */
  def dedupBest(docs: DataFrame, pairs: DataFrame): DataFrame =
    dedupBestFrom(docs, connectedComponents(pairs))

  /** [[dedupBest]] over a PRECOMPUTED components frame (the
    * [[applyDedupFrom]] serving seam).
    */
  private[graft] def dedupBestFrom(docs: DataFrame, comps: DataFrame): DataFrame = {
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component_id"))
      .orderBy(col("len").desc, col("doc_id"))
    comps.join(lens, Seq("doc_id"))
      .select(col("doc_id"), col("component_id"), col("len"),
        (row_number().over(w) === 1).as("is_survivor"))
  }

  def qDedupBest(s: SparkSession, dir: String): DataFrame =
    dedupBestFrom(corpus(s, dir), componentsBase(s, dir))

  def qRepeatedSpans(s: SparkSession, dir: String): DataFrame =
    repeatedSpans(Tables.documents(s, dir))

  def qSpanExcise(s: SparkSession, dir: String): DataFrame =
    exciseRepeatedSpans(Tables.documents(s, dir))

  def qSpanExciseKeepFirst(s: SparkSession, dir: String): DataFrame =
    exciseRepeatedSpansKeepFirst(Tables.documents(s, dir))

  /** Long-doc keep-first fixture (r6 verdict #3): doc A repeats a
    * 9-token run at position 0 AND again after 40k unique filler
    * tokens; doc B shares the run. Under the budget-free struct-min
    * key BOTH later copies excise against A's pos-0 first, and the
    * oracle's `min(ROW(doc_id, pos))` pins the lexicographic
    * semantics cross-engine — a property with no scale dependence,
    * which is why the gate fixture sits at 40k tokens (cheap enough
    * for every bench sweep) while the literal 2^20-budget crossing
    * runs once per suite in OperatorsSpec ("keep-first span excision
    * covers giant docs past 2^20 positions") on the identical
    * operator path.
    */
  val SpanLongFillerN = 40000
  private val spanLongRun = (1 to 9).map(i => s"r$i").mkString(" ")

  def qSpanLong(s: SparkSession, dir: String): DataFrame = {
    val filler = concat_ws(" ",
      transform(sequence(lit(0), lit(SpanLongFillerN - 1)),
        i => concat(lit("f"), i.cast("string"))))
    val longDoc = s.range(1).select(lit(5000001L).as("doc_id"),
      concat_ws(" ", lit(spanLongRun), filler, lit(spanLongRun)).as("text"))
    val shortDoc = s.range(1).select(lit(5000002L).as("doc_id"),
      lit("xx yy zz " + spanLongRun).as("text"))
    exciseRepeatedSpansKeepFirst(longDoc.unionAll(shortDoc))
  }

  private val spanLongFixtureSql =
    s"""SELECT 5000001 AS doc_id,
      |      '$spanLongRun ' || (SELECT string_agg('f' || i, ' ' ORDER BY i)
      |        FROM range(0, $SpanLongFillerN) t(i)) || ' $spanLongRun' AS text
      |    UNION ALL SELECT 5000002, 'xx yy zz $spanLongRun'""".stripMargin

  // --- edit-distance similarity join (PassJoin) ------------------------

  /** Edit-distance threshold for the join (≤ 2 single-char edits). */
  val EditMaxK = 2
  /** Normalized join-key prefix length (chars). Sized so each of the
    * k+1 segments is ~21 chars — segment SELECTIVITY is the family's
    * scale dial, and the r12 3-point candidate-mass measurement
    * (500/5k/50k docs) pinned it: at segment length ~11 (key 32)
    * candidates grew ~quadratically (610 → 45k → 4.4M — collision
    * groups square while TRUE pairs stayed O(100), so cost tracked
    * collisions, not pair mass); at ~16 (key 48) 175 → 3.6k → 224k;
    * at ~21 (key 64) 145 → 1.6k → 12.7k — near-linear (11×, 7.9× per
    * 10× rows). Longer segments cost nothing but key bytes: the
    * probe fan-out stays the same ≤(2k+1)²(k+1) rows/key.
    */
  val EditKeyLen = 64
  /** Shortest key the k+1-segment scheme partitions (k+1 non-empty
    * segments need at least k+1 chars).
    */
  val EditMinLen: Int = EditMaxK + 1

  /** ASCII-normalized fixed-length join key: strip every char outside
    * [A-Za-z0-9 ] BEFORE lowercasing (ASCII-only lower is identical
    * in every engine; Unicode lower is not — and DuckDB's
    * `levenshtein` counts BYTES, so the key must be ASCII for the
    * oracle to measure the same distance Spark does), then take the
    * first [[EditKeyLen]] chars. A narrow codegen'd projection.
    */
  def editKeys(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      substring(lower(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")),
        1, EditKeyLen).as("key"))
      .filter(length(col("key")) >= EditMinLen)

  /** Even k+1-way partition of a length-L key (PassJoin, Li et al.,
    * VLDB'11): with q = L div (k+1) and r = L mod (k+1), the first
    * k+1−r segments have length q and the last r have q+1; returns
    * (i, start, len) columns for segment index column `i` (1-based
    * start, matching SQL substring).
    */
  private def segGeom(lenCol: Column, i: Column): (Column, Column) = {
    val kp1 = lit(EditMaxK + 1)
    val q = floor(lenCol / kp1).cast("int")
    val r = lenCol % kp1
    val li = q + when(i >= kp1 - r, 1).otherwise(0)
    val st = lit(1) + i * q + greatest(lit(0), i - (kp1 - r))
    (st, li)
  }

  /** All-pairs edit-distance join: every unordered (doc_a, doc_b)
    * pair whose normalized keys are within [[EditMaxK]] Levenshtein
    * edits, with the exact distance. PassJoin candidate generation:
    * each key is evenly cut into k+1 segments (index side); by
    * pigeonhole an optimal ≤ k-edit alignment leaves at least one
    * segment of `a` untouched, and that segment appears VERBATIM in
    * `b` shifted by at most k (the net insertions/deletions before
    * it). The probe side therefore enumerates, for each key `b`,
    * every candidate partner length lr ∈ [len(b)−k, len(b)+k], each
    * segment's geometry AT THAT LENGTH, and the ≤ 2k+1 substrings of
    * `b` inside the shift window — a pure EQUI-join on
    * (partner_len, segment_index, substring), never a cartesian.
    * Fan-out is constant per row ((2k+1)·(k+1)·(2k+1) ≈ 75 probe
    * rows at k=2); candidates dedup on the pair key before the
    * O(len²) verify, so the only data-dependent cost is the true
    * near-pair mass plus segment-collision noise. Hot segment values
    * (boilerplate prefixes) bound fan-out by the segment's
    * selectivity — at web scale, salt the key with one extra context
    * char or raise [[EditKeyLen]] rather than capping, since the
    * family's contract is EXACT (no false negatives).
    *
    * Reference has no edit-distance tier (dumpty dedups on content
    * hash only); this implements the standard PassJoin scheme on the
    * [[prefixJoinPairs]] discipline: bucketed candidates + exact
    * verify, zero O(n²) stages.
    */
  private def withLen(docs: DataFrame): DataFrame =
    editKeys(docs).withColumn("ls", length(col("key")))

  /** Index side: the k+1 segments of every key — 3 narrow rows per
    * key, the persistable PassJoin index.
    */
  private def editSegments(keys: DataFrame): DataFrame = {
    val idx = keys.select(col("doc_id"), col("key"), col("ls"),
      explode(sequence(lit(0), lit(EditMaxK))).as("i"))
    val (ist, ili) = segGeom(col("ls"), col("i"))
    idx.select(col("doc_id"), col("key"), col("ls").as("len"), col("i"),
      col("key").substr(ist, ili).as("seg"))
  }

  /** Probe side: for each key, every candidate partner length's
    * segment geometry and the substrings inside the ±k shift window
    * — constant ≤(2k+1)²(k+1) rows per key.
    */
  private[graft] def editProbes(keys: DataFrame): DataFrame = {
    val k = lit(EditMaxK)
    val p0 = keys.select(col("doc_id"), col("key"), col("ls"),
        explode(sequence(col("ls") - k, col("ls") + k)).as("lr"))
      .filter(col("lr") >= EditMinLen && col("lr") <= EditKeyLen)
      .select(col("doc_id"), col("key"), col("ls"), col("lr"),
        explode(sequence(lit(0), k)).as("i"))
    val (pst, pli) = segGeom(col("lr"), col("i"))
    p0.withColumn("st", pst).withColumn("li", pli)
      .select(col("doc_id"), col("key"), col("ls"), col("lr"), col("i"),
        col("li"),
        explode(sequence(col("st") - k, col("st") + k)).as("p"))
      .filter(col("p") >= 1 && col("p") <= col("ls") - col("li") + 1)
      .select(col("doc_id"), col("key"), col("lr"), col("i"),
        col("key").substr(col("p"), col("li")).as("sub"))
  }

  def editJoinPairs(docs: DataFrame, maxK: Int = EditMaxK): DataFrame = {
    require(maxK == EditMaxK,
      s"segment scheme is sized for k=$EditMaxK (k+1 segments)")
    val keys = withLen(docs)
    val segs = editSegments(keys).toDF("doc_a", "key_a", "len_a", "i", "seg")
    val probe = editProbes(keys).toDF("doc_b", "key_b", "lr", "i", "sub")
    // verify BEFORE the dedup exchange: the banded levenshtein
    // (O(len·k), early-exit past the threshold) runs map-side on
    // every candidate occurrence, so the only rows that ever cross a
    // shuffle are TRUE pairs (plus their ≤(2k+1)(k+1) positional
    // duplicates) — shuffling the raw segment-collision mass through
    // a distinct was the sf1 rehearsal's 39× superlinear step; with
    // collision mass ≫ pair mass, redundant ≤75-op verifies are the
    // cheaper side of the trade by orders of magnitude
    segs.join(probe,
        col("len_a") === col("lr") && segs("i") === probe("i") &&
          col("seg") === col("sub") && col("doc_a") =!= col("doc_b"))
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b"), maxK).cast("long"))
      .filter(col("dist") >= 0)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("dist"))
      .distinct()
  }

  /** Incremental PassJoin: every (old, new) pair within
    * [[EditMaxK]] edits between the standing corpus and an incoming
    * batch. The corpus contributes only its 3-rows-per-key SEGMENT
    * index (persistable, appendable — the 29f posting discipline);
    * the constant ~75× probe fan-out rides the BATCH, so the
    * per-batch cost is batch keys × matched segment postings, never
    * corpus-proportional. Same verify-before-exchange discipline as
    * [[editJoinPairs]].
    */
  def editIncrementalPairs(existing: DataFrame, incoming: DataFrame): DataFrame =
    editProbePairs(editSegmentIndex(existing), incoming)

  /** The persistable PassJoin segment index of a corpus: columns
    * (doc_id, key, len, i, seg) — 3 narrow rows per key, appendable,
    * and exactly what [[editProbePairs]] probes (the streaming twin
    * persists this frame in the warehouse).
    */
  def editSegmentIndex(docs: DataFrame): DataFrame =
    editSegments(withLen(docs))

  /** Probe an incoming batch against a prebuilt segment index. */
  def editProbePairs(segIndex: DataFrame, incoming: DataFrame): DataFrame = {
    val segs = segIndex.toDF("old_doc", "key_a", "len_a", "i", "seg")
    val probe = editProbes(withLen(incoming))
      .toDF("new_doc", "key_b", "lr", "i", "sub")
    segs.join(probe,
        col("len_a") === col("lr") && segs("i") === probe("i") &&
          col("seg") === col("sub"))
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b"), EditMaxK).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("old_doc"), col("new_doc"), col("dist"))
      .distinct()
  }

  def qEditJoin(s: SparkSession, dir: String): DataFrame =
    editJoinPairs(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  def qEditIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    editIncrementalPairs(docs,
      docs.select((col("doc_id") + Shift).as("doc_id"), col("text")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edit_join" -> qEditJoin _,
    "q_edit_incremental" -> qEditIncremental _,
    "q_prefix_join" -> qPrefixJoin _,
    "q_prefix_incremental" -> qPrefixIncremental _,
    "q_span_long" -> qSpanLong _,
    "q_sketch_overlap" -> qSketchOverlap _,
    "q_repeated_spans" -> qRepeatedSpans _,
    "q_span_excise" -> qSpanExcise _,
    "q_span_excise_keepfirst" -> qSpanExciseKeepFirst _,
    "q_dedup_exact" -> qDedupExact _,
    "q_dedup_weights" -> qDedupWeights _,
    "q_dedup_fuzzy_decon" -> qDedupFuzzyDecon _,
    "q_dedup_minhash" -> qDedupMinhash _,
    "q_dedup_simhash" -> qDedupSimhash _,
    "q_ngram_jaccard" -> qNgramJaccard _,
    "q_weighted_jaccard" -> qWeightedJaccard _,
    "q_wj_incremental" -> ((s: SparkSession, dir: String) => {
      // existing = documents, incoming = the Shift-ed copy — exactly
      // the corpus split at Shift, so both sides' index frames are
      // doc_id-range slices of the memoized corpus index (identical
      // rows to wjPostings/wjCounts of each side by the id-disjoint
      // union; the doubling already requires original ids < Shift).
      val post = wjPostingsBase(s, dir)
      val cnt = wjCountsBase(s, dir)
      weightedJaccardIncrementalIndexed(
        post.filter(col("doc_id") < Shift), cnt.filter(col("doc_id") < Shift),
        post.filter(col("doc_id") >= Shift), cnt.filter(col("doc_id") >= Shift))
    }),
    "q_wminhash" -> qWminhash _,
    "q_dedup_components" -> qDedupComponents _,
    "q_dedup_components_ls" -> qDedupComponentsLs _,
    "q_dedup_best" -> qDedupBest _,
    "q_dedup_apply" -> qDedupApply _,
    "q_minhash_est" -> ((s: SparkSession, dir: String) =>
      minhashEstimatesFrom(corpus(s, dir), minhashPairsBase(s, dir))),
    "q_dedup_incremental" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      incrementalDupes(docs,
        docs.select((col("doc_id") + Shift).as("doc_id"), col("text")))
    }))

  private[operators] val corpusSql =
    s"""SELECT doc_id, text FROM documents
      |    UNION ALL SELECT doc_id + $Shift, text FROM documents""".stripMargin

  private val tokSql =
    s"""SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h
       |    FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
       |          FROM ($corpusSql))""".stripMargin

  private def shingleTokSqlFor(src: String) =
    s"""SELECT doc_id, unnest(hs) AS h FROM (
       |      SELECT doc_id,
       |        list_transform(range(1, greatest(len(toks) - 1, 1)),
       |          i -> ('0x' || substr(md5(concat_ws('', toks[i], toks[i+1], toks[i+2])), 1, 12))::BIGINT)
       |          AS hs
       |      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
       |            FROM ($src)))""".stripMargin

  private val shingleTokSql = shingleTokSqlFor(corpusSql)

  private def sigSqlFor(src: String) = {
    val mins = (0 until NumPerm)
      .map(k => s"min((${A(k)} * hp + ${B(k)}) % 1000000007) AS h$k").mkString(",\n      ")
    s"""SELECT doc_id,
       |      $mins
       |    FROM (SELECT doc_id, h % 1000000007 AS hp FROM (${shingleTokSqlFor(src)}))
       |    GROUP BY doc_id""".stripMargin
  }

  private val sigSql = sigSqlFor(corpusSql)

  private def bandsSqlFor(sigTable: String) = (0 until Bands).map { b =>
    s"SELECT doc_id, $b AS band_id, md5(concat_ws(',', h${2 * b}, h${2 * b + 1})) AS bh FROM $sigTable"
  }.mkString("\n    UNION ALL ")

  private val bandsSql = bandsSqlFor("sig")

  /** Capped candidate pairs over `bands`: all-pairs within buckets
    * up to BucketCap, star edges (bucket min → member) beyond —
    * mirrors minhashPairs exactly.
    */
  private val cappedPairsSql =
    s"""sized AS (SELECT doc_id, band_id, bh,
      |    count(*) OVER (PARTITION BY band_id, bh) AS bsz,
      |    min(doc_id) OVER (PARTITION BY band_id, bh) AS bmin
      |  FROM bands),
      |small AS (SELECT doc_id, band_id, bh FROM sized WHERE bsz <= $BucketCap),
      |pairs AS (
      |  SELECT DISTINCT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |    FROM small a JOIN small b
      |      ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
      |    UNION ALL
      |    SELECT bmin, doc_id FROM sized WHERE bsz > $BucketCap AND doc_id <> bmin))""".stripMargin

  /** Shared CTE chain: signatures → bands → capped pairs → edges →
    * transitive closure; ends with `comps(v, component_id)`.
    * Parameterized on the (doc_id, text) source so composed oracles
    * (the full curation run) can run the SAME chain over a filtered
    * corpus — the source must be self-contained SQL (no CTE refs).
    */
  private[operators] def componentsCtesFor(src: String): String =
    s"""WITH RECURSIVE
      |sig AS (${sigSqlFor(src)}),
      |bands AS ($bandsSql),
      |$cappedPairsSql,
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |verts AS (SELECT DISTINCT src AS v FROM edges),
      |reach(v, r) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT e.dst, r.r FROM edges e JOIN reach r ON e.src = r.v),
      |comps AS (SELECT v, min(r) AS component_id FROM reach GROUP BY v)""".stripMargin

  private[operators] val componentsCtes = componentsCtesFor(corpusSql)

  /** Keep-first excise pipeline over an arbitrary (doc_id, text)
    * source — mirrors exciseRepeatedSpansKeepFirst exactly,
    * including the budget-free lexicographic ROW(doc_id, pos) first
    * occurrence (DuckDB orders ROWs lexicographically, the struct-
    * min twin).
    */
  private def keepFirstSqlFor(src: String): String =
    s"""WITH t AS (SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\\s+') AS toks FROM ($src)),
      |tt AS (SELECT doc_id, unnest(toks) AS tk,
      |    unnest(range(1, len(toks) + 1)) - 1 AS pos FROM t),
      |shl AS (SELECT doc_id, list_transform(
      |    range(1, greatest(len(toks) - ${SpanShingle - 2}, 1)),
      |    i -> ('0x' || substr(md5(concat_ws('', toks[i], toks[i+1], toks[i+2],
      |      toks[i+3], toks[i+4])), 1, 12))::BIGINT) AS hs FROM t),
      |sh AS (SELECT doc_id, unnest(hs) AS h,
      |    unnest(range(1, len(hs) + 1)) - 1 AS pos FROM shl),
      |rep AS (SELECT h, min(ROW(doc_id, pos)) AS fk
      |  FROM sh GROUP BY h HAVING count(*) > 1),
      |fl AS (SELECT s.doc_id, s.pos, 1 AS f FROM sh s JOIN rep r USING (h)
      |  WHERE ROW(s.doc_id, s.pos) <> r.fk),
      |c AS (SELECT tt.doc_id, tt.pos, tt.tk,
      |    max(coalesce(fl.f, 0)) OVER (PARTITION BY tt.doc_id ORDER BY tt.pos
      |      ROWS BETWEEN ${SpanShingle - 1} PRECEDING AND CURRENT ROW) AS covered
      |  FROM tt LEFT JOIN fl ON tt.doc_id = fl.doc_id AND tt.pos = fl.pos)
      |SELECT doc_id, count(*) AS n_tokens, sum(covered)::BIGINT AS n_removed,
      |  ('0x' || substr(md5(coalesce(
      |    string_agg(CASE WHEN covered = 0 THEN tk END, ' ' ORDER BY pos),
      |    '')), 1, 12))::BIGINT AS survivor_hash
      |FROM c GROUP BY doc_id""".stripMargin

  /** 5-gram twin of shingleTokSql (the SpanShingle width the prefix
    * join measures τ on), parameterized on the (doc_id, text) source.
    */
  private def shingle5TokSqlFor(src: String) =
    s"""SELECT doc_id, unnest(hs) AS h FROM (
       |      SELECT doc_id,
       |        list_transform(range(1, greatest(len(toks) - ${SpanShingle - 2}, 1)),
       |          i -> ('0x' || substr(md5(concat_ws('', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])), 1, 12))::BIGINT)
       |          AS hs
       |      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
       |            FROM ($src)))""".stripMargin

  private val shingle5TokSql = shingle5TokSqlFor(corpusSql)

  /** [[wjPostings]]'s SQL twin — 5-gram shingles UNION the short-doc
    * whole-token-sequence fallback key (docs with fewer than
    * [[SpanShingle]] tokens emit no 5-gram; see the wjPostings
    * short-doc floor note). Blocking domain only — the PPJoin
    * oracles keep the plain [[shingle5TokSqlFor]] because there the
    * 5-gram SET is the similarity measure itself.
    */
  private def wjPostingsSqlFor(src: String) =
    s"""SELECT doc_id, h FROM (${shingle5TokSqlFor(src)})
       |    UNION ALL
       |    SELECT doc_id,
       |      ('0x' || substr(md5('wjshort:' || array_to_string(toks, ' ')), 1, 12))::BIGINT AS h
       |    FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
       |          FROM ($src))
       |    WHERE len(toks) < $SpanShingle""".stripMargin

  private val wjPostingsSql = wjPostingsSqlFor(corpusSql)

  private val prefixJoinSql =
    s"""WITH tok AS (
      |  SELECT DISTINCT doc_id, h FROM ($shingle5TokSql)),
      |dfreq AS (SELECT h, count(*)::BIGINT AS df FROM tok GROUP BY 1),
      |ranked AS (SELECT doc_id, h,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS pos,
      |    count(*) OVER (PARTITION BY doc_id) AS sz
      |  FROM tok JOIN dfreq USING (h)),
      |pre AS (SELECT doc_id, h, sz FROM ranked
      |  WHERE pos <= sz - ($PrefixTauPpm * sz + 999999) // 1000000 + 1),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.sz AS sz_a, b.sz AS sz_b
      |  FROM pre a JOIN pre b ON a.h = b.h AND a.doc_id < b.doc_id
      |  WHERE $PrefixTauPpm * greatest(a.sz, b.sz)
      |          <= 1000000 * least(a.sz, b.sz)),
      |inter AS (SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_common
      |  FROM (SELECT DISTINCT doc_a, doc_b FROM cand) c
      |  JOIN tok ta ON ta.doc_id = c.doc_a
      |  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.h = ta.h
      |  GROUP BY 1, 2)
      |SELECT c.doc_a, c.doc_b, i.n_common,
      |  ((i.n_common * 1000000) // (c.sz_a + c.sz_b - i.n_common))::BIGINT
      |    AS jaccard_ppm
      |FROM cand c JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
      |WHERE (i.n_common * 1000000) // (c.sz_a + c.sz_b - i.n_common)
      |        >= $PrefixTauPpm""".stripMargin

  private val prefixIncrementalSql =
    s"""WITH corp AS (SELECT DISTINCT doc_id, h FROM (
      |    ${shingle5TokSqlFor("SELECT doc_id, text FROM documents")})),
      |inc AS (SELECT DISTINCT doc_id, h FROM (
      |    ${shingle5TokSqlFor(s"SELECT doc_id + $Shift AS doc_id, text FROM documents")})),
      |corpsz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM corp GROUP BY 1),
      |dfreq AS (SELECT h, count(*)::BIGINT AS df FROM corp GROUP BY 1),
      |ranked AS (SELECT i.doc_id, i.h,
      |    row_number() OVER (PARTITION BY i.doc_id
      |      ORDER BY coalesce(d.df, 0), i.h) AS pos,
      |    count(*) OVER (PARTITION BY i.doc_id) AS sz
      |  FROM inc i LEFT JOIN dfreq d USING (h)),
      |pre AS (SELECT doc_id, h, sz FROM ranked
      |  WHERE pos <= sz - ($PrefixTauPpm * sz + 999999) // 1000000 + 1),
      |cand AS (SELECT p.doc_id AS new_doc, c.doc_id AS old_doc,
      |    p.sz AS sz_n, cs.sz AS sz_o, count(*)::BIGINT AS shared
      |  FROM pre p JOIN corp c USING (h) JOIN corpsz cs ON cs.doc_id = c.doc_id
      |  WHERE $PrefixTauPpm * greatest(p.sz, cs.sz)
      |          <= 1000000 * least(p.sz, cs.sz)
      |  GROUP BY 1, 2, 3, 4
      |  HAVING count(*) + ($PrefixTauPpm * p.sz + 999999) // 1000000 - 1
      |    >= ($PrefixTauPpm * (p.sz + cs.sz) + ${1000000L + PrefixTauPpm - 1})
      |       // ${1000000L + PrefixTauPpm}),
      |inter AS (SELECT c.new_doc, c.old_doc, count(*)::BIGINT AS n_common
      |  FROM (SELECT DISTINCT new_doc, old_doc FROM cand) c
      |  JOIN inc i ON i.doc_id = c.new_doc
      |  JOIN corp o ON o.doc_id = c.old_doc AND o.h = i.h
      |  GROUP BY 1, 2)
      |SELECT c.new_doc, c.old_doc, i.n_common,
      |  ((i.n_common * 1000000) // (c.sz_n + c.sz_o - i.n_common))::BIGINT
      |    AS jaccard_ppm
      |FROM cand c JOIN inter i
      |  ON c.new_doc = i.new_doc AND c.old_doc = i.old_doc
      |WHERE (i.n_common * 1000000) // (c.sz_n + c.sz_o - i.n_common)
      |        >= $PrefixTauPpm""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_edit_join" ->
      s"""WITH s AS (SELECT doc_id,
        |    substring(lower(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')),
        |      1, $EditKeyLen) AS key FROM documents),
        |f AS (SELECT * FROM s WHERE length(key) >= $EditMinLen)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.key, b.key)::BIGINT AS dist
        |FROM f a JOIN f b ON a.doc_id < b.doc_id
        |  AND abs(length(a.key) - length(b.key)) <= $EditMaxK
        |WHERE levenshtein(a.key, b.key) <= $EditMaxK""".stripMargin,
    "q_edit_incremental" ->
      s"""WITH s AS (SELECT doc_id,
        |    substring(lower(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')),
        |      1, $EditKeyLen) AS key FROM documents),
        |f AS (SELECT * FROM s WHERE length(key) >= $EditMinLen)
        |SELECT a.doc_id AS old_doc, b.doc_id + $Shift AS new_doc,
        |  levenshtein(a.key, b.key)::BIGINT AS dist
        |FROM f a JOIN f b
        |  ON abs(length(a.key) - length(b.key)) <= $EditMaxK
        |WHERE levenshtein(a.key, b.key) <= $EditMaxK""".stripMargin,
    "q_prefix_incremental" -> prefixIncrementalSql,
    "q_prefix_join" -> prefixJoinSql,
    "q_sketch_overlap" -> {
      val mins = (0 until NumPerm)
        .map(k => s"min((${A(k)} * hp + ${B(k)}) % 1000000007) AS h$k").mkString(", ")
      val agree = (0 until NumPerm)
        .map(k => s"(CASE WHEN a.h$k = b.h$k THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (
        |  SELECT source, h % 1000000007 AS hp FROM (
        |    SELECT source, unnest(hs) AS h FROM (
        |      SELECT source,
        |        list_transform(range(1, greatest(len(toks) - 1, 1)),
        |          i -> ('0x' || substr(md5(concat_ws('', toks[i], toks[i+1], toks[i+2])), 1, 12))::BIGINT)
        |          AS hs
        |      FROM (SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS toks
        |            FROM documents)))),
        |sig AS (SELECT source, $mins FROM tok GROUP BY source)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  ($agree)::BIGINT AS n_agree,
        |  ((($agree) * 1000000) // $NumPerm)::BIGINT AS est_jaccard_ppm
        |FROM sig a JOIN sig b ON a.source < b.source""".stripMargin
    },
    "q_repeated_spans" ->
      s"""WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
        |ex AS (SELECT doc_id,
        |    unnest(range(1, greatest(len(toks) - ${SpanShingle - 2}, 1))) AS i, toks
        |  FROM t),
        |sh AS (SELECT doc_id, i - 1 AS pos,
        |    ('0x' || substr(md5(concat_ws('', toks[i], toks[i+1], toks[i+2],
        |      toks[i+3], toks[i+4])), 1, 12))::BIGINT AS h
        |  FROM ex),
        |rep AS (SELECT h, count(*) AS n_occ FROM sh GROUP BY h
        |  HAVING count(*) > 1),
        |j AS (SELECT s.doc_id, s.pos, r.n_occ FROM sh s JOIN rep r USING (h)),
        |g AS (SELECT doc_id, pos, n_occ,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM j)
        |SELECT doc_id, min(pos)::BIGINT AS span_start,
        |  (max(pos) + ${SpanShingle - 1})::BIGINT AS span_end,
        |  count(*)::BIGINT AS n_shingles,
        |  (max(pos) - min(pos) + $SpanShingle)::BIGINT AS span_len_tokens,
        |  max(n_occ)::BIGINT AS max_occ
        |FROM g GROUP BY doc_id, grp""".stripMargin,
    "q_span_excise" ->
      s"""WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, toks FROM t),
        |tt AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tk FROM tok),
        |ex AS (SELECT doc_id,
        |    unnest(range(1, greatest(len(toks) - ${SpanShingle - 2}, 1))) AS i, toks
        |  FROM t),
        |sh AS (SELECT doc_id, i - 1 AS pos,
        |    ('0x' || substr(md5(concat_ws('', toks[i], toks[i+1], toks[i+2],
        |      toks[i+3], toks[i+4])), 1, 12))::BIGINT AS h
        |  FROM ex),
        |rep AS (SELECT h FROM sh GROUP BY h HAVING count(*) > 1),
        |fl AS (SELECT s.doc_id, s.pos, 1 AS f FROM sh s JOIN rep USING (h)),
        |c AS (SELECT tt.doc_id, tt.pos, tt.tk,
        |    max(coalesce(fl.f, 0)) OVER (PARTITION BY tt.doc_id ORDER BY tt.pos
        |      ROWS BETWEEN ${SpanShingle - 1} PRECEDING AND CURRENT ROW) AS covered
        |  FROM tt LEFT JOIN fl ON tt.doc_id = fl.doc_id AND tt.pos = fl.pos)
        |SELECT doc_id, count(*) AS n_tokens, sum(covered)::BIGINT AS n_removed,
        |  ('0x' || substr(md5(coalesce(
        |    string_agg(CASE WHEN covered = 0 THEN tk END, ' ' ORDER BY pos),
        |    '')), 1, 12))::BIGINT AS survivor_hash
        |FROM c GROUP BY doc_id""".stripMargin,
    "q_span_excise_keepfirst" ->
      keepFirstSqlFor("SELECT doc_id, text FROM documents"),
    "q_span_long" -> keepFirstSqlFor(spanLongFixtureSql),
    "q_dedup_components" ->
      s"""$componentsCtes
        |SELECT v AS doc_id, component_id FROM comps""".stripMargin,
    "q_dedup_components_ls" ->
      s"""$componentsCtes
        |SELECT v AS doc_id, component_id FROM comps""".stripMargin,
    "q_dedup_best" ->
      s"""$componentsCtes
        |SELECT c.v AS doc_id, c.component_id,
        |  length(d.text)::BIGINT AS len,
        |  row_number() OVER (PARTITION BY c.component_id
        |    ORDER BY length(d.text) DESC, c.v) = 1 AS is_survivor
        |FROM comps c JOIN ($corpusSql) d ON d.doc_id = c.v""".stripMargin,
    "q_dedup_apply" ->
      s"""$componentsCtes
        |SELECT c.doc_id, md5(c.text) AS content_hash
        |FROM ($corpusSql) c
        |WHERE NOT EXISTS (SELECT 1 FROM comps
        |  WHERE comps.v = c.doc_id AND comps.component_id <> c.doc_id)""".stripMargin,
    "q_dedup_incremental" ->
      s"""WITH sig_old AS (${sigSqlFor("SELECT doc_id, text FROM documents")}),
        |sig_new AS (${sigSqlFor(s"SELECT doc_id + $Shift AS doc_id, text FROM documents")}),
        |bands_old AS (${bandsSqlFor("sig_old")}),
        |bands_new AS (${bandsSqlFor("sig_new")})
        |SELECT DISTINCT new_doc, matched_doc FROM (
        |  SELECT n.doc_id AS new_doc, o.doc_id AS matched_doc
        |  FROM bands_new n JOIN bands_old o
        |    ON n.band_id = o.band_id AND n.bh = o.bh
        |  UNION ALL
        |  SELECT b.doc_id, a.doc_id
        |  FROM bands_new a JOIN bands_new b
        |    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin,
    "q_minhash_est" -> {
      val est = (0 until NumPerm)
        .map(k => s"CASE WHEN sa.h$k = sb.h$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH sig AS ($sigSql),
        |bands AS ($bandsSql),
        |$cappedPairsSql,
        |d AS (SELECT doc_id, list_distinct(list(h)) AS hs
        |  FROM ($shingleTokSql) GROUP BY doc_id)
        |SELECT p.doc_a, p.doc_b,
        |  round(($est) / ${NumPerm.toDouble}, 6) AS est_jaccard,
        |  round(len(list_intersect(da.hs, db.hs)) /
        |    (len(da.hs) + len(db.hs) - len(list_intersect(da.hs, db.hs))), 6)
        |    AS jaccard
        |FROM pairs p
        |JOIN sig sa ON sa.doc_id = p.doc_a
        |JOIN sig sb ON sb.doc_id = p.doc_b
        |JOIN d da ON da.doc_id = p.doc_a
        |JOIN d db ON db.doc_id = p.doc_b""".stripMargin
    },
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_weights" ->
      s"""WITH g AS (
        |  SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |    count(*) AS dup_count
        |  FROM ($corpusSql) GROUP BY 1)
        |SELECT c.doc_id, g.dup_count,
        |  1000000 // g.dup_count AS weight_ppm,
        |  (CASE WHEN c.doc_id = g.keep_id THEN 1 ELSE 0 END)::BIGINT
        |    AS is_canonical
        |FROM ($corpusSql) c JOIN g ON md5(c.text) = g.content_hash""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH sig AS ($sigSql),
        |bands AS ($bandsSql),
        |$cappedPairsSql
        |SELECT doc_a, doc_b FROM pairs""".stripMargin,
    "q_dedup_fuzzy_decon" ->
      s"""WITH tsig AS (${sigSqlFor(corpusSql)}),
        |bsig AS (${sigSqlFor("SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0")}),
        |tb AS (${bandsSqlFor("tsig")}),
        |bb AS (${bandsSqlFor("bsig")}),
        |cand AS (SELECT DISTINCT t.doc_id AS train_doc_id, b.doc_id AS bench_doc_id
        |  FROM tb t JOIN bb b ON t.band_id = b.band_id AND t.bh = b.bh
        |    AND t.doc_id <> b.doc_id),
        |ag AS (SELECT c.train_doc_id, c.bench_doc_id,
        |    (${(0 until NumPerm).map(k => s"CASE WHEN ts.h$k = bs.h$k THEN 1 ELSE 0 END").mkString(" + ")})::BIGINT
        |      AS n_matching_perms
        |  FROM cand c JOIN tsig ts ON ts.doc_id = c.train_doc_id
        |    JOIN bsig bs ON bs.doc_id = c.bench_doc_id)
        |SELECT train_doc_id, bench_doc_id, n_matching_perms,
        |  (1000000 * n_matching_perms) // $NumPerm AS est_jaccard_ppm,
        |  (CASE WHEN (1000000 * n_matching_perms) // $NumPerm >= $FuzzyTauPpm
        |    THEN 1 ELSE 0 END)::BIGINT AS flagged
        |FROM ag""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH tok AS ($tokSql),
        |bt AS (SELECT doc_id, b,
        |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS b)
        |  GROUP BY doc_id, b),
        |sh AS (SELECT doc_id,
        |    sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
        |  FROM bt GROUP BY doc_id),
        |chunks AS (SELECT doc_id, simhash, c, (simhash >> (12 * c)) & 4095 AS cv
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c)),
        |sized AS (SELECT doc_id, simhash, c, cv,
        |    count(*) OVER (PARTITION BY c, cv) AS bsz,
        |    min(doc_id) OVER (PARTITION BY c, cv) AS bmin,
        |    arg_min(simhash, doc_id) OVER (PARTITION BY c, cv) AS bminsh
        |  FROM chunks),
        |small AS (SELECT doc_id, simhash, c, cv FROM sized WHERE bsz <= $BucketCap)
        |SELECT DISTINCT doc_a, doc_b, hamming FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |  FROM small a JOIN small b
        |    ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT bmin, doc_id, bit_count(xor(bminsh, simhash))::BIGINT
        |  FROM sized WHERE bsz > $BucketCap AND doc_id <> bmin)
        |WHERE hamming <= 3""".stripMargin,
    "q_weighted_jaccard" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id, h FROM ($wjPostingsSql)),
        |dfc AS (SELECT h, count(*) AS df FROM sh GROUP BY 1 HAVING count(*) >= 2),
        |pf AS (SELECT doc_id, h FROM (
        |    SELECT s.doc_id, s.h, row_number() OVER (
        |      PARTITION BY s.doc_id ORDER BY d.df, s.h) AS rn
        |    FROM sh s JOIN dfc d ON d.h = s.h)
        |  WHERE rn <= $WjPrefix),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pf a JOIN pf b
        |    ON a.h = b.h AND a.doc_id < b.doc_id),
        |tc AS (SELECT doc_id, h, count(*)::BIGINT AS c FROM ($tokSql)
        |  GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c)::BIGINT AS tot FROM tc GROUP BY 1),
        |sm AS (SELECT cd.doc_a, cd.doc_b,
        |    sum(least(a.c, b.c))::BIGINT AS sum_min
        |  FROM cand cd JOIN tc a ON a.doc_id = cd.doc_a
        |  JOIN tc b ON b.doc_id = cd.doc_b AND b.h = a.h
        |  GROUP BY 1, 2)
        |SELECT sm.doc_a, sm.doc_b, sum_min,
        |  (ta.tot + tb.tot - sum_min)::BIGINT AS sum_max,
        |  round(sum_min / (ta.tot + tb.tot - sum_min), 6) AS wjaccard
        |FROM sm JOIN tot ta ON ta.doc_id = sm.doc_a
        |JOIN tot tb ON tb.doc_id = sm.doc_b
        |WHERE sum_min / (ta.tot + tb.tot - sum_min) >= 0.5""".stripMargin,
    "q_wj_incremental" ->
      s"""WITH oldd AS (SELECT doc_id, text FROM documents),
        |newd AS (SELECT doc_id + $Shift AS doc_id, text FROM documents),
        |sho AS (SELECT DISTINCT doc_id, h
        |  FROM (${wjPostingsSqlFor("SELECT doc_id, text FROM oldd")})),
        |shn AS (SELECT DISTINCT doc_id, h
        |  FROM (${wjPostingsSqlFor("SELECT doc_id, text FROM newd")})),
        |shu AS (SELECT doc_id, h, 0 AS is_new FROM sho
        |  UNION ALL SELECT doc_id, h, 1 AS is_new FROM shn),
        |dfc AS (SELECT h, count(*) AS df FROM shu GROUP BY 1 HAVING count(*) >= 2),
        |pf AS (SELECT doc_id, h, is_new FROM (
        |    SELECT s.doc_id, s.h, s.is_new, row_number() OVER (
        |      PARTITION BY s.doc_id ORDER BY d.df, s.h) AS rn
        |    FROM shu s JOIN dfc d ON d.h = s.h)
        |  WHERE rn <= $WjPrefix),
        |cand AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT n.doc_id AS doc_a, o.doc_id AS doc_b FROM pf n
        |  JOIN pf o ON n.h = o.h AND n.is_new = 1 AND o.is_new = 0
        |  UNION ALL
        |  SELECT b.doc_id, a.doc_id FROM pf a
        |  JOIN pf b ON a.h = b.h AND a.is_new = 1 AND b.is_new = 1
        |    AND a.doc_id < b.doc_id)),
        |tc AS (SELECT doc_id, h, count(*)::BIGINT AS c FROM ($tokSql)
        |  GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c)::BIGINT AS tot FROM tc GROUP BY 1),
        |sm AS (SELECT cd.doc_a, cd.doc_b,
        |    sum(least(a.c, b.c))::BIGINT AS sum_min
        |  FROM cand cd JOIN tc a ON a.doc_id = cd.doc_a
        |  JOIN tc b ON b.doc_id = cd.doc_b AND b.h = a.h
        |  GROUP BY 1, 2)
        |SELECT sm.doc_a AS new_doc, sm.doc_b AS matched_doc,
        |  round(sum_min / (ta.tot + tb.tot - sum_min), 6) AS wjaccard
        |FROM sm JOIN tot ta ON ta.doc_id = sm.doc_a
        |JOIN tot tb ON tb.doc_id = sm.doc_b
        |WHERE sum_min / (ta.tot + tb.tot - sum_min) >= 0.5""".stripMargin,
    "q_wminhash" -> {
      val sigMins = (0 until NumPerm)
        .map(k => s"min((ep * ${A(k)} + ${B(k)}) % 1000000007) AS h$k")
        .mkString(", ")
      val agree = (0 until NumPerm)
        .map(k => s"(CASE WHEN sa.h$k = sb.h$k THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH sh AS (SELECT DISTINCT doc_id, h FROM ($wjPostingsSql)),
        |dfc AS (SELECT h, count(*) AS df FROM sh GROUP BY 1 HAVING count(*) >= 2),
        |pf AS (SELECT doc_id, h FROM (
        |    SELECT s.doc_id, s.h, row_number() OVER (
        |      PARTITION BY s.doc_id ORDER BY d.df, s.h) AS rn
        |    FROM sh s JOIN dfc d ON d.h = s.h)
        |  WHERE rn <= $WjPrefix),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pf a JOIN pf b
        |    ON a.h = b.h AND a.doc_id < b.doc_id),
        |tc AS (SELECT doc_id, h, least(count(*), $WmCap)::BIGINT AS c
        |  FROM ($tokSql) GROUP BY 1, 2),
        |el AS (SELECT doc_id,
        |    ((h % 1000000007) * 131 + unnest(generate_series(1, c)))
        |      % 1000000007 AS ep
        |  FROM tc),
        |sig AS (SELECT doc_id, $sigMins FROM el GROUP BY doc_id),
        |tot AS (SELECT doc_id, sum(c)::BIGINT AS tot FROM tc GROUP BY 1),
        |sm AS (SELECT cd.doc_a, cd.doc_b,
        |    sum(least(a.c, b.c))::BIGINT AS sum_min
        |  FROM cand cd JOIN tc a ON a.doc_id = cd.doc_a
        |  JOIN tc b ON b.doc_id = cd.doc_b AND b.h = a.h
        |  GROUP BY 1, 2)
        |SELECT sm.doc_a, sm.doc_b, ($agree)::BIGINT AS n_agree,
        |  ((($agree) * 1000000) // $NumPerm)::BIGINT AS est_ppm,
        |  ((1000000 * sum_min) // (ta.tot + tb.tot - sum_min))::BIGINT
        |    AS wj_ppm
        |FROM sm JOIN tot ta ON ta.doc_id = sm.doc_a
        |JOIN tot tb ON tb.doc_id = sm.doc_b
        |JOIN sig sa ON sa.doc_id = sm.doc_a
        |JOIN sig sb ON sb.doc_id = sm.doc_b""".stripMargin
    },
    "q_ngram_jaccard" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(sh,
        |      s -> ('0x' || substr(md5(s), 1, 12))::BIGINT)) AS hs
        |  FROM (
        |    SELECT doc_id,
        |      list_transform(range(1, greatest(len(toks) - 1, 1)),
        |        i -> concat_ws('', toks[i], toks[i+1], toks[i+2])) AS sh
        |    FROM (SELECT doc_id,
        |            string_split_regex(lower(trim(text)), '\\s+') AS toks
        |          FROM ($corpusSql)))),
        |sh5 AS (SELECT DISTINCT doc_id, h FROM ($wjPostingsSql)),
        |dfc AS (SELECT h, count(*) AS df FROM sh5 GROUP BY 1 HAVING count(*) >= 2),
        |pf AS (SELECT doc_id, h FROM (
        |    SELECT s.doc_id, s.h, row_number() OVER (
        |      PARTITION BY s.doc_id ORDER BY d2.df, s.h) AS rn
        |    FROM sh5 s JOIN dfc d2 ON d2.h = s.h)
        |  WHERE rn <= $WjPrefix),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pf a JOIN pf b ON a.h = b.h AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM (
        |  SELECT c.doc_a, c.doc_b,
        |    len(list_intersect(a.hs, b.hs)) /
        |      (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jac
        |  FROM cand c JOIN d a ON a.doc_id = c.doc_a
        |  JOIN d b ON b.doc_id = c.doc_b)
        |WHERE jac >= 0.5""".stripMargin)
}
