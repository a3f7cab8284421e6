package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Deduplication operators for the training-data pipeline: exact
  * (content hash), MinHash+LSH (shingle → signature → band bucket →
  * candidate join → exact Jaccard verify), SimHash (bitwise fingerprint
  * + Hamming pairs). Every path is declarative `functions._` (codegen,
  * no UDF) with a DuckDB oracle twin sharing the same constants.
  *
  * Scale notes: the MinHash pipeline's shuffles are keyed by shingle
  * hash / (band, key) — high-cardinality, skew-free; the candidate
  * self-join explodes only within LSH buckets (the whole point of LSH);
  * the verify join touches only candidate pairs. Exact dedup is one
  * hash aggregation. SimHash pair generation here is the O(n²)
  * small-corpus form; at scale, band the fingerprint bytes like LSH.
  */
object Dedup {

  /** Mersenne prime 2^31-1 — the universal-hash modulus. */
  val P = 2147483647L

  /** 12 seeded (a, b) universal-hash params → 4 bands × 3 rows. */
  val HashParams: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1588635695L, 54321L), (1117695901L, 98765L),
    (784588716L, 13579L), (1447165056L, 24680L), (1860794827L, 11223L),
    (946117987L, 44556L), (1548233367L, 77889L), (1033864602L, 99001L),
    (1573595047L, 22334L), (651288536L, 55667L), (1173221038L, 88990L))

  val BandRows = 3
  val NumBands: Int = HashParams.size / BandRows

  /** Word n-gram size for shingling. */
  val ShingleN = 3

  /** 60-bit positive hash of a string, identical in Spark and DuckDB:
    * first 15 hex chars of md5.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def sqlHash60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  // ------------------------------------------------------------------
  // exact dedup
  // ------------------------------------------------------------------

  /** Exact duplicate groups by content sha over docs (doc_id,
    * content_sha): groups with >1 member.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(col("content_sha"))
      .agg(count(lit(1)).as("cnt"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("cnt") > 1)
      .orderBy(col("content_sha"))

  // ------------------------------------------------------------------
  // shingles + minhash
  // ------------------------------------------------------------------

  /** (doc_id, shingle) distinct word-ShingleN-grams. */
  def shingles(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"),
        posexplode(Tokenizer.tokensCol(col("content"))).as(Seq("pos", "term")))
      .withColumn("t1", lead(col("term"), 1).over(w))
      .withColumn("t2", lead(col("term"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("term"), col("t1"), col("t2")).as("shingle"))
      .distinct()
  }

  /** MinHash signatures: (doc_id, i, mh) for i in 0..H-1. */
  def minhash(spark: SparkSession, sh: DataFrame): DataFrame = {
    import spark.implicits._
    val params = HashParams.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
    sh.withColumn("h", hash60(col("shingle")) % P)
      .crossJoin(broadcast(params))
      .groupBy(col("doc_id"), col("i"))
      .agg(min((col("a") * col("h") + col("b")) % P).as("mh"))
  }

  /** LSH candidate pairs (doc_a < doc_b) from banded signatures. */
  def lshCandidates(sig: DataFrame): DataFrame = {
    val banded = sig
      .withColumn("band", (col("i") / BandRows).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("i"), col("mh")))),
        x => x.getField("mh").cast("string")), ",").as("key"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against shingle sets;
    * keeps pairs with jaccard >= threshold.
    */
  def verifyJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Full MinHash-LSH near-dup pipeline over docs. */
  def minhashNearDups(spark: SparkSession, docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(docs).cache()
    val cands = lshCandidates(minhash(spark, sh))
    verifyJaccard(cands, sh, threshold)
  }

  /** DuckDB oracle for [[minhashNearDups]] over the derived docs CTEs. */
  def minhashOracleSql(threshold: Double): String = {
    val paramRows = HashParams.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |params(i, a, b) AS (VALUES $paramRows),
       |tok AS (
       |  SELECT doc_id, unnest(${Tokenizer.sqlTokensExpr("content")}) AS term,
       |         generate_subscripts(${Tokenizer.sqlTokensExpr("content")}, 1) AS pos
       |  FROM docs),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         term || ' ' || t1 || ' ' || t2 AS shingle
       |  FROM (
       |    SELECT doc_id, pos, term,
       |           lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
       |           lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
       |    FROM tok)
       |  WHERE t2 IS NOT NULL),
       |sig AS (
       |  SELECT doc_id, i, min((a * (${sqlHash60("shingle")} % $P) + b) % $P) AS mh
       |  FROM sh CROSS JOIN params GROUP BY 1, 2),
       |banded AS (
       |  SELECT doc_id, CAST(i / $BandRows AS INTEGER) AS band,
       |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS key
       |  FROM sig GROUP BY 1, 2),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b,
       |       round(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 4) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE round(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 4) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ------------------------------------------------------------------
  // simhash
  // ------------------------------------------------------------------

  /** 60-bit SimHash per doc: bit i set iff Σ_terms tf·(±1 by bit i of
    * hash60(term)) > 0.
    */
  def simhash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val bits = (0 until 60).toDF("bit")
    val tf = docs
      .select(col("doc_id"),
        explode(Tokenizer.tokensCol(col("content"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", hash60(col("term")))
    tf.crossJoin(broadcast(bits))
      .withColumn("v",
        when(expr("shiftright(h, bit)").bitwiseAND(1) === 1,
          col("tf")).otherwise(-col("tf")))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("v")).as("s"))
      .withColumn("contrib",
        when(col("s") > 0, expr("shiftleft(1L, bit)"))
          .otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("fingerprint"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming
    * (O(n²) small-corpus form; band the fingerprint at scale).
    */
  def simhashNearDups(spark: SparkSession, docs: DataFrame, maxHamming: Int): DataFrame = {
    val fp = simhash(spark, docs).cache()
    val x = fp.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    x.as("x").join(broadcast(fp).as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming",
        bit_count(col("x.fingerprint").bitwiseXOR(col("y.fingerprint"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  def simhashOracleSql(maxHamming: Int): String =
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |bits(bit) AS (SELECT unnest(range(60))),
       |tok AS (
       |  SELECT doc_id, unnest(${Tokenizer.sqlTokensExpr("content")}) AS term
       |  FROM docs),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf,
       |         ${sqlHash60("term")} AS h
       |  FROM tok GROUP BY 1, 2),
       |bitsum AS (
       |  SELECT doc_id, bit,
       |         sum(CASE WHEN (h >> CAST(bit AS INTEGER)) & 1 = 1
       |             THEN tf ELSE -tf END) AS s
       |  FROM tf CROSS JOIN bits GROUP BY 1, 2),
       |fp AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN s > 0
       |           THEN (1::BIGINT << CAST(bit AS INTEGER)) ELSE 0 END) AS BIGINT)
       |           AS fingerprint
       |  FROM bitsum GROUP BY 1)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       CAST(bit_count(xor(x.fingerprint, y.fingerprint)) AS INTEGER) AS hamming
       |FROM fp x JOIN fp y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.fingerprint, y.fingerprint)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------------
  // embedding-cosine near-dup
  // ------------------------------------------------------------------

  /** Embedding near-dup pairs: cosine similarity >= threshold.
    *
    * Norms are precomputed in one pass; the pairwise dot product runs as
    * a tight-loop Scala UDF — Catalyst's higher-order functions
    * (zip_with/aggregate) are interpreted per element and ~50× slower on
    * the O(n²) pair join. (At real scale, LSH-bucket the vectors first —
    * see the IVF path — so the pair join never goes quadratic.)
    */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    val norm = udf { (v: Seq[Double]) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val dot = udf { (a: Seq[Double], b: Seq[Double]) =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val spark = embeddings.sparkSession
    val e = embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("n", norm(col("e")))
    // the pair join is a broadcast nested-loop: its parallelism equals
    // the STREAM side's partition count (a single small parquet file =
    // one task); spread it explicitly
    val x = e.repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    x.as("x").join(broadcast(e).as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos",
        round(dot(col("x.e"), col("y.e")) / (col("x.n") * col("y.n")), 4))
      .filter(col("cos") >= threshold)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"), col("cos"))
      .orderBy("vec_a", "vec_b")
  }

  def embeddingOracleSql(threshold: Double): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |       round(list_cosine_similarity(x.e, y.e), 4) AS cos
       |FROM e x JOIN e y ON x.vec_id < y.vec_id
       |WHERE round(list_cosine_similarity(x.e, y.e), 4) >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin
}
