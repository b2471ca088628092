package graft.extract

/** Expected BigQuery schema mapping for the five mapped test tables
  * — the DuckDB oracle for q_bq_schema. The Spark side derives this
  * from live parquet schemas through BqSchema.fields; the oracle
  * pins the expected mapping as literals so a regression in the type
  * mapper is caught.
  */
object BqSchemaOracle {
  private val rows: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "INT64", "Nullable"),
    ("lineitem", "l_partkey", "INT64", "Nullable"),
    ("lineitem", "l_suppkey", "INT64", "Nullable"),
    ("lineitem", "l_linenumber", "INT64", "Nullable"),
    ("lineitem", "l_quantity", "FLOAT64", "Nullable"),
    ("lineitem", "l_extendedprice", "FLOAT64", "Nullable"),
    ("lineitem", "l_discount", "FLOAT64", "Nullable"),
    ("lineitem", "l_tax", "FLOAT64", "Nullable"),
    ("lineitem", "l_returnflag", "STRING", "Nullable"),
    ("lineitem", "l_linestatus", "STRING", "Nullable"),
    ("lineitem", "l_shipdate", "DATETIME", "Nullable"),
    ("orders", "o_orderkey", "INT64", "Nullable"),
    ("orders", "o_custkey", "INT64", "Nullable"),
    ("orders", "o_orderstatus", "STRING", "Nullable"),
    ("orders", "o_totalprice", "FLOAT64", "Nullable"),
    ("orders", "o_orderdate", "DATETIME", "Nullable"),
    ("orders", "o_orderpriority", "STRING", "Nullable"),
    ("events", "event_id", "INT64", "Nullable"),
    ("events", "ts", "DATETIME", "Nullable"),
    ("events", "user_id", "INT64", "Nullable"),
    ("events", "event_type", "STRING", "Nullable"),
    ("events", "value", "FLOAT64", "Nullable"),
    ("events", "props", "STRING", "Nullable"),
    ("documents", "doc_id", "INT64", "Nullable"),
    ("documents", "text", "STRING", "Nullable"),
    ("documents", "lang", "STRING", "Nullable"),
    ("documents", "source", "STRING", "Nullable"),
    ("documents", "n_chars", "INT64", "Nullable"),
    ("embeddings", "vec_id", "INT64", "Nullable"),
    ("embeddings", "embedding", "FLOAT64", "Repeated"),
    ("embeddings", "label", "INT64", "Nullable"))

  val sql: String = rows
    .map { case (t, c, ty, m) => s"('$t', '$c', '$ty', '$m')" }
    .mkString(
      "SELECT * FROM (VALUES\n  ",
      ",\n  ",
      "\n) AS v(table_name, column_name, bq_type, mode)")
}
