package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over the document corpus (link-graph shape:
  * connected components live in Dedup; this adds iterative rank).
  *
  * PageRank is the canonical iterate-until-stable Spark workload:
  * each iteration is one edge⋈score equi-join + one partial-agg sum
  * keyed by destination — O(E) shuffled per iteration, no global
  * state, the same plan at 100 TB with edges pre-partitioned on src.
  *
  * Determinism discipline: scores are integer PARTS-PER-BILLION and
  * every per-iteration operation is integer arithmetic (div for
  * share splitting, *85 div 100 for damping) — the distributed sum
  * is order-independent and the DuckDB oracle (the same five
  * iterations unrolled as CTEs) agrees bit-for-bit, the established
  * quantize-before-aggregate idiom.
  */
object Graph {

  val PrIters = 5

  /** Deterministic synthetic link graph over doc ids 0..n-1 (the
    * documents fixture carries no links): u → (7u+3) mod n and
    * u → (13u+5) mod n, deduplicated — out-degree 2 (1 when the two
    * coincide), every node has outlinks so there are no dangling-
    * mass corrections to model. Replicated arithmetically by the
    * oracle.
    */
  def edges(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 3) % n).as("dst"))
      .unionAll(docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 13 + 5) % n).as("dst")))
      .distinct()

  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, Seq("src")).persist()
    val teleport = 15L * (1000000000L / n) / 100L
    var x = docs.select(col("doc_id"), lit(1000000000L / n).as("x"))
    for (_ <- 1 to PrIters) {
      val inflow = ed.join(x, ed("src") === x("doc_id"))
        .select(col("dst"), expr("x div deg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inflow"))
      x = docs.join(inflow, docs("doc_id") === inflow("dst"), "left")
        .select(col("doc_id"),
          (lit(teleport) + expr("85 * coalesce(inflow, 0L) div 100")).as("x"))
        .localCheckpoint()
    }
    x.select(col("doc_id"), col("x").as("pr_ppb"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank _)

  private def oracleSql: String = {
    val edgeCte =
      """nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        |e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst
        |    FROM documents CROSS JOIN nn
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 13 + 5) % nn.n FROM documents CROSS JOIN nn)),
        |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
        |x0 AS (SELECT doc_id, (1000000000 // nn.n)::BIGINT AS x
        |  FROM documents CROSS JOIN nn)""".stripMargin
    val iters = (1 to PrIters).map { k =>
      s"""x$k AS (
        |  SELECT d.doc_id,
        |    ((15 * (1000000000 // (SELECT n FROM nn)) // 100)
        |      + 85 * coalesce(i.inflow, 0) // 100)::BIGINT AS x
        |  FROM documents d LEFT JOIN (
        |    SELECT e.dst, sum(p.x // dg.deg)::BIGINT AS inflow
        |    FROM e JOIN x${k - 1} p ON e.src = p.doc_id
        |    JOIN deg dg ON e.src = dg.src
        |    GROUP BY e.dst) i ON d.doc_id = i.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCte,
      |$iters
      |SELECT doc_id, x AS pr_ppb FROM x$PrIters""".stripMargin
  }

  val oracles: Map[String, String] = Map("q_pagerank" -> oracleSql)
}
