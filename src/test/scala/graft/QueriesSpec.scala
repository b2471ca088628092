package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for every SparkEntry query at sf0.001: runs, yields rows,
  * has stable column names (value-level correctness is the driver's
  * DuckDB oracle gate, replicated locally by tools/check.py).
  */
class QueriesSpec extends AnyFunSuite {
  import SparkSuite._

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("no registry key collides across operator modules") {
    // Map ++ silently keeps the right-hand entry, so a reused query
    // name SHADOWS the earlier operator and its SURVEY row becomes a
    // phantom (it happened twice in r10: q_source_overlap, then
    // q_json_extract/24e) — assert the merged size equals the sum of
    // the parts so any future collision fails loudly with the names
    import graft.operators._
    val parts: Seq[(String, Set[String])] = Seq(
      "Relational" -> Relational.queries.keySet,
      "ExtractQueries" -> extract.ExtractQueries.queries.keySet,
      "Graph" -> Graph.queries.keySet,
      "Dedup" -> Dedup.queries.keySet,
      "Similarity" -> Similarity.queries.keySet,
      "TextAnalysis" -> TextAnalysis.queries.keySet,
      "Sampling" -> Sampling.queries.keySet,
      "Layout" -> Layout.queries.keySet,
      "Curation" -> Curation.queries.keySet,
      "Multimodal" -> Multimodal.queries.keySet,
      "CorpusOps" -> CorpusOps.queries.keySet,
      "Sketches" -> Sketches.queries.keySet)
    val dups = parts.combinations(2).flatMap { case Seq((na, a), (nb, b)) =>
      (a & b).map(k => s"$k ($na vs $nb)")
    }.toSeq
    assert(dups.isEmpty, s"colliding query keys: ${dups.mkString(", ")}")
    assert(parts.map(_._2.size).sum == SparkEntry.queries.size)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
