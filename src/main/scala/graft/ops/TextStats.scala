package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Text-analysis operators for the training-data pipeline: language-ID
  * (stopword-ratio heuristic), quality scoring (length / diversity /
  * stopword mix), per-language token stats. All declarative
  * `functions._` with DuckDB oracle twins sharing the same constants.
  */
object TextStats {

  /** Stopword sets per language for the n-gram-free langid heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "to", "and", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"))

  val QualityStopwords: Seq[String] = Stopwords.head._2

  private def tokensC = Tokenizer.tokensCol(col("content"))

  private def ratioFor(words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    round(size(filter(tokensC, t => array_contains(set, t)))
      .cast("double") / greatest(size(tokensC), lit(1)), 4)
  }

  private def sqlRatioFor(words: Seq[String]): String = {
    val toks = Tokenizer.sqlTokensExpr("content")
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"round(CAST(len(list_filter($toks, t -> list_contains($lst, t))) AS DOUBLE)" +
      s" / greatest(len($toks), 1), 4)"
  }

  /** Language-ID heuristic: per-language stopword ratios + argmax
    * (ties → lexicographically LAST language code: array_max over
    * (ratio, lang) structs — the DuckDB oracle twin ties the same way).
    */
  def langId(docs: DataFrame): DataFrame = {
    val withRatios = Stopwords.foldLeft(docs.select(col("doc_id"), col("content"))) {
      case (df, (lang, words)) => df.withColumn(s"${lang}_ratio", ratioFor(words))
    }
    val best = Stopwords.map(_._1).sorted
      .map(l => struct(col(s"${l}_ratio").as("r"), lit(l).as("l")))
    withRatios
      .withColumn("predicted",
        when(greatest(Stopwords.map(s => col(s"${s._1}_ratio")): _*) === 0, lit("und"))
          .otherwise(array_max(array(best: _*)).getField("l")))
      .select((Seq(col("doc_id")) ++
        Stopwords.map(s => col(s"${s._1}_ratio")) :+ col("predicted")): _*)
      .orderBy("doc_id")
  }

  def langIdOracleSql: String = {
    val ratios = Stopwords
      .map { case (l, ws) => s"${sqlRatioFor(ws)} AS ${l}_ratio" }
      .mkString(",\n       ")
    val langs = Stopwords.map(_._1).sorted
    val structs = langs
      .map(l => s"{'r': ${l}_ratio, 'l': '$l'}").mkString(", ")
    val greatestExpr = Stopwords.map(s => s"${s._1}_ratio").mkString(", ")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |r AS (
       |  SELECT doc_id, content, $ratios
       |  FROM docs)
       |SELECT doc_id, ${Stopwords.map(s => s"${s._1}_ratio").mkString(", ")},
       |       CASE WHEN greatest($greatestExpr) = 0 THEN 'und'
       |            ELSE list_max([$structs]).l END AS predicted
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Per-doc quality features + composite score. */
  def quality(docs: DataFrame): DataFrame = {
    val n = greatest(size(tokensC), lit(1))
    docs.select(
      col("doc_id"),
      size(tokensC).as("n_tokens"),
      round(size(array_distinct(tokensC)).cast("double") / n, 4).as("uniq_ratio"),
      round(length(array_join(tokensC, "")).cast("double") / n, 4)
        .as("mean_token_len"),
      ratioFor(QualityStopwords).as("stopword_ratio"))
      .withColumn("quality_score",
        round(lit(0.4) * least(lit(1.0), col("n_tokens") / 100.0) +
          lit(0.3) * col("uniq_ratio") +
          lit(0.3) * (lit(1.0) - col("stopword_ratio")), 5))
      .orderBy("doc_id")
  }

  def qualityOracleSql: String = {
    val toks = Tokenizer.sqlTokensExpr("content")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |f AS (
       |  SELECT doc_id,
       |         CAST(len($toks) AS INTEGER) AS n_tokens,
       |         round(CAST(len(list_distinct($toks)) AS DOUBLE)
       |           / greatest(len($toks), 1), 4) AS uniq_ratio,
       |         round(CAST(len(array_to_string($toks, '')) AS DOUBLE)
       |           / greatest(len($toks), 1), 4) AS mean_token_len,
       |         ${sqlRatioFor(QualityStopwords)} AS stopword_ratio
       |  FROM docs)
       |SELECT doc_id, n_tokens, uniq_ratio, mean_token_len, stopword_ratio,
       |       -- literals cast to DOUBLE (DuckDB would otherwise use exact
       |       -- DECIMAL arithmetic); rounded to 5 decimals because the
       |       -- weighted sum of 4-decimal inputs is an exact multiple of
       |       -- 1e-5 — rounding THERE is unambiguous, while rounding to 4
       |       -- hits .00005 half-way points where engines disagree
       |       round(0.4::DOUBLE * least(1.0::DOUBLE,
       |           CAST(n_tokens AS DOUBLE) / 100.0::DOUBLE)
       |         + 0.3::DOUBLE * uniq_ratio
       |         + 0.3::DOUBLE * (1.0::DOUBLE - stopword_ratio), 5) AS quality_score
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Gopher-style repetition signals (Rae et al. 2021, §A1.1): the
    * fraction of tokens occupied by the single most frequent token,
    * plus duplicate bigram/trigram fractions — the quality filters
    * that catch boilerplate and keyboard-mash documents exact dedup
    * misses. Everything is per-row (one array sort + one fold + n-gram
    * distinct counts inside codegen higher-order functions): a
    * doc-level statistic needs ZERO exchange at any corpus size, which
    * is what makes this the 100-TB-safe formulation — the obvious
    * explode → groupBy(doc, term) alternative shuffles every token.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val withToks = docs.select(col("doc_id"), tokensC.as("toks"))
    val toks = col("toks")
    val n = size(toks)
    // max term frequency == longest equal run in the sorted array:
    // O(n log n) per row, no per-distinct-term rescan
    val topCnt = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    // n-grams as space-joined strings; tokens never contain spaces
    // (Tokenizer splits on non-[a-z0-9_]), so the join is injective
    def grams(width: Int): Column =
      transform(slice(toks, lit(1), greatest(n - (width - 1), lit(0))),
        (x, i) => concat_ws(" ",
          Seq(x) ++ (1 until width).map(o => element_at(toks, i + o + 1)): _*))
    def dupRatio(g: Column): Column = {
      val m = size(g)
      round((m - size(array_distinct(g))).cast("double") / greatest(m, lit(1)), 4)
    }
    withToks.select(
      col("doc_id"),
      n.as("n_tokens"),
      round(topCnt.cast("double") / greatest(n, lit(1)), 4)
        .as("top_token_ratio"),
      dupRatio(grams(2)).as("dup_bigram_ratio"),
      dupRatio(grams(3)).as("dup_trigram_ratio"))
      .orderBy("doc_id")
  }

  def repetitionOracleSql: String = {
    val toks = Tokenizer.sqlTokensExpr("content")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |t AS (SELECT doc_id, $toks AS toks FROM docs),
       |g AS (
       |  SELECT doc_id, toks,
       |         [toks[i] || ' ' || toks[i+1]
       |            FOR i IN range(1, len(toks))] AS bg,
       |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |            FOR i IN range(1, len(toks) - 1)] AS tg,
       |         coalesce(list_max([len(list_filter(toks, x -> x = u))
       |            FOR u IN list_distinct(toks)]), 0) AS top_cnt
       |  FROM t)
       |SELECT doc_id,
       |       CAST(len(toks) AS INTEGER) AS n_tokens,
       |       round(CAST(top_cnt AS DOUBLE) / greatest(len(toks), 1), 4)
       |         AS top_token_ratio,
       |       round(CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
       |         / greatest(len(bg), 1), 4) AS dup_bigram_ratio,
       |       round(CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
       |         / greatest(len(tg), 1), 4) AS dup_trigram_ratio
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** Corpus token stats per language: docs, token totals, vocab.
    *
    * r7: aggregates the SHARED per-(term, doc) frequency frame (which
    * carries lang) instead of re-tokenizing and exploding the corpus —
    * the countDistinct expand runs over one row per (term, doc) rather
    * than one per token instance. tokens = Σ tf == the exploded count;
    * docs/vocab distinct-counts are over identical key sets (a doc or
    * term appears in the tf frame iff it appears in the exploded form).
    */
  def tokenStats(docs: DataFrame): DataFrame =
    graft.query.Bm25SqlPath.termFreqs(docs)
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("docs"),
        sum(col("tf")).as("tokens"),
        countDistinct(col("term")).as("vocab"))
      .orderBy("lang")

  def tokenStatsOracleSql: String = {
    val toks = Tokenizer.sqlTokensExpr("content")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |tok AS (SELECT lang, doc_id, unnest($toks) AS term FROM docs)
       |SELECT lang, count(DISTINCT doc_id) AS docs, count(*) AS tokens,
       |       count(DISTINCT term) AS vocab
       |FROM tok GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Winnowing k-gram size / window — MOSS-style document
    * fingerprinting (Schleimer, Wilkerson & Aiken 2003): hash every
    * k-token gram, keep the MINIMUM hash of each sliding window of
    * FingerprintW grams. Any shared substring of length >= k + w - 1
    * tokens is guaranteed to share a fingerprint — the copy-detection
    * selectivity/coverage tradeoff, as a declarative window-function
    * pipeline (tail windows shorter than w are included; same rule in
    * the oracle twin).
    */
  val FingerprintK = 5
  val FingerprintW = 4

  /** (doc_id, fingerprint) — the doc's distinct winnowed fingerprints.
    *
    * Entirely per-row (same rewrite as Dedup.shingles): k-gram hashes
    * and their rolling-window minima come off the token array with
    * `transform`/`slice`/`array_min` — all codegen, zero exchange —
    * where the r2 form posexploded to (pos, term) rows and ran k-1
    * `lead()`s plus a rolling-min window over a full doc_id-partitioned
    * shuffle. Identical values (gram i = tokens i..i+k-1; fingerprint i
    * = min of hashes i..i+w-1, tails shortened — the same
    * rows-between-current-and-w-1 rule the oracle twin keeps).
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val k = FingerprintK
    val gram = (0 until k).map(j => s"toks[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col("doc_id"), tokensC.as("toks"))
      .withColumn("hs",
        when(size(col("toks")) >= k,
          expr(s"transform(sequence(0, size(toks) - $k), " +
            s"i -> CAST(conv(substring(md5($gram), 1, 15), 16, 10) AS BIGINT)" +
            s" % ${Dedup.P})"))
          .otherwise(expr("CAST(array() AS array<bigint>)")))
      // r7: dedup is per-ROW — the distinct key (doc_id, fingerprint)
      // contains doc_id and every fingerprint row comes from one doc's
      // array, so array_distinct inside the row is exactly the global
      // distinct() it replaces, minus that full hash-aggregation
      // exchange (zero-shuffle at any corpus size; only the output
      // ordering exchange remains)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          s"transform(hs, (x, i) -> array_min(slice(hs, i + 1, $FingerprintW)))")))
          .as("fingerprint"))
      .orderBy("doc_id", "fingerprint")
  }

  def fingerprintsOracleSql: String = {
    val toks = Tokenizer.sqlTokensExpr("content")
    val leads = (1 until FingerprintK)
      .map(i => s"lead(term, $i) OVER (PARTITION BY doc_id ORDER BY pos)")
    val gram = ("term" +: leads).mkString(" || ' ' || ")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |tok AS (
       |  SELECT doc_id, unnest($toks) AS term,
       |         generate_subscripts($toks, 1) AS pos
       |  FROM docs),
       |grams AS (
       |  SELECT doc_id, pos, $gram AS gram,
       |         ${leads.last} IS NOT NULL AS isfull
       |  FROM tok),
       |hashed AS (
       |  SELECT doc_id, pos,
       |         ${Dedup.sqlHash60("gram")} % ${Dedup.P} AS h
       |  FROM grams WHERE isfull),
       |winnowed AS (
       |  SELECT doc_id,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN CURRENT ROW AND ${FingerprintW - 1} FOLLOWING)
       |           AS fingerprint
       |  FROM hashed)
       |SELECT DISTINCT doc_id, fingerprint FROM winnowed
       |ORDER BY doc_id, fingerprint""".stripMargin
  }
}
