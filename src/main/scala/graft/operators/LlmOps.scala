package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregator for the §2c LLM-training-data operator queries. */
object LlmOps {
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Sampling.queries ++ Layout.queries ++ Curation.queries ++
      Multimodal.queries ++ CorpusOps.queries ++ Sketches.queries

  val oracles: Map[String, String] =
    Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++
      Sampling.oracles ++ Layout.oracles ++ Curation.oracles ++
      Multimodal.oracles ++ CorpusOps.oracles ++ Sketches.oracles
}
