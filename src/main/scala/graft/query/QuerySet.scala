package graft.query

/** F3 — the fixed reference query set (FIXTURES.md): 20 multi-term queries
  * over the corpus vocabulary, each mixing one low-df term with high-df
  * terms where possible (exercises WAND skipping). Deterministic literals
  * so the DuckDB oracle can embed them as a VALUES CTE.
  */
object QuerySet {

  /** (query_id, terms-with-multiplicity). */
  val queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("dup", "join", "hash"),
    2 -> Seq("spark", "window", "stream", "batch"),
    3 -> Seq("dup", "merge", "sort", "key"),
    4 -> Seq("fast", "scan", "table"),
    5 -> Seq("customer", "order", "line", "part"),
    6 -> Seq("group", "agg", "sum", "value"),
    7 -> Seq("dup", "vector", "column"),
    8 -> Seq("query", "filter", "row", "data"),
    9 -> Seq("slow", "big", "small"),
    10 -> Seq("hash", "join", "merge", "sort", "scan"),
    11 -> Seq("the", "a", "dup"),
    12 -> Seq("stream", "batch", "window", "key", "value"),
    13 -> Seq("spark", "data", "table", "column"),
    14 -> Seq("order", "sort", "key", "fast"),
    15 -> Seq("line", "part", "customer"),
    16 -> Seq("filter", "scan", "query", "slow"),
    17 -> Seq("dup", "batch", "stream"),
    18 -> Seq("vector", "row", "column", "value"),
    19 -> Seq("merge", "group", "agg"),
    20 -> Seq("big", "small", "fast", "slow", "dup"))

  /** The flagship single query (also used by SparkEntry.entry). */
  val flagship: Seq[String] = queries.head._2

  /** Flattened (query_id, term, qtf) triples — distinct terms per query
    * with multiplicity folded into qtf.
    */
  def triples(qs: Seq[(Int, Seq[String])] = queries): Seq[(Int, String, Int)] =
    qs.flatMap { case (qid, terms) =>
      terms.groupBy(identity).toSeq.sortBy(_._1).map { case (t, occ) =>
        (qid, t, occ.size)
      }
    }

  /** DuckDB VALUES CTE `q(query_id, term, qtf)` for a query subset. */
  def sqlValuesCte(qs: Seq[(Int, Seq[String])] = queries): String =
    triples(qs)
      // doubled-quote escape — terms are tokenizer output ([a-z0-9_])
      // for every internal caller, but the CTE must stay valid SQL for
      // any input
      .map { case (qid, t, qtf) => s"($qid, '${t.replace("'", "''")}', $qtf)" }
      .mkString("q(query_id, term, qtf) AS (VALUES ", ", ", ")")
}
