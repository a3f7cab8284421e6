package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  /** (doc_id, shingle) distinct word-ShingleN-grams.
    *
    * Sliding windows are per-ROW (consecutive tokens of one doc), so
    * they are built directly from the token array with `transform` —
    * all codegen, zero exchange. The r1-r3 form posexploded to 13M+
    * (pos, term) rows and ran two `lead()` windows over a FULL shuffle
    * partitioned by doc_id just to see each token's two successors;
    * identical output (tokens i,i+1,i+2 for i in [0, n-3], then
    * distinct — the only remaining shuffle).
    */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Tokenizer.tokensCol(col("content")).as("toks"))
      // r7: the distinct key is (doc_id, shingle) and every shingle row
      // comes from ONE doc's array, so array_distinct within the row is
      // exactly the global distinct() it replaces — the derivation is
      // now ZERO-exchange end to end at any corpus size (the former
      // .distinct() re-shuffled every (doc, shingle) row only to drop
      // within-doc repeats)
      .select(col("doc_id"),
        explode(array_distinct(when(size(col("toks")) >= ShingleN,
          expr("transform(sequence(0, size(toks) - " + ShingleN + "), " +
            "i -> concat_ws(' ', " +
            (0 until ShingleN).map(j => s"toks[i+$j]").mkString(", ") + "))"))
          .otherwise(array().cast("array<string>")))).as("shingle"))

  // one shingle cache PER DOCS FRAME, shared by the minhash and exact
  // n-gram pipelines: each used to persist its own copy, and in a
  // many-query session the duplicate 260k-row caches (plus their
  // rederivation — tokenize + window + distinct — on any miss) dominated
  // the wall clock [BENCH r3: q_dedup_ngram 2.6s standalone vs 11.8s
  // mid-bench]. The bounded structure itself now lives in
  // [[DerivedFrameCache]] (r5) so the BM25 SQL path's term-frequency
  // frame shares the same bound and eviction.
  private def cachedFrame(docs: DataFrame, tag: String)
      (build: => DataFrame): DataFrame =
    DerivedFrameCache(docs, tag)(build)

  def shinglesCached(docs: DataFrame): DataFrame =
    cachedFrame(docs, "shingles")(shingles(docs))

  /** (vec_id, e double[], n = ‖e‖) per embeddings identity — codegen
    * norm (no UDF boxing on the full-table pass): aggregate() folds
    * left in element order — bit-identical doubles to the sequential
    * loop it replaces [VERDICT r3 observation #5]. Through the BOUNDED
    * frame cache (r5): the bare per-call .cache() leaked one
    * MEMORY_AND_DISK entry per invocation (the r3 shingle leak, same
    * shape [ADVICE r3]) and re-derived the norm pass on every call;
    * SparkEntry's stable per-sfDir embeddings frame hits one shared
    * entry, evicted with the rest of the dedup caches. Public since r7:
    * the brute-force ANN baseline reads the SAME double-cast vectors
    * (one derivation serves both operators); there must be exactly one
    * builder for the tag or first-build-wins would change the schema.
    */
  def embedNorm(embeddings: DataFrame): DataFrame =
    cachedFrame(embeddings, "embed-norm")(embeddings
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("n",
        sqrt(aggregate(col("e"), lit(0.0), (acc, x) => acc + x * x))))

  /** MinHash signatures: (doc_id, i, mh) for i in 0..H-1.
    *
    * ONE wide aggregation with H min-columns instead of a crossJoin
    * row-blowup ×H: map-side partial aggregation collapses each doc's
    * shingles before the shuffle, so the exchange carries one row per
    * (doc, partial) instead of H× the shingle count. Values identical
    * (same hash arithmetic), same oracle.
    */
  def minhash(spark: SparkSession, sh: DataFrame): DataFrame = {
    val aggs = HashParams.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"mh$i")
    }
    val unpivot = (0 until HashParams.size).map(i =>
      struct(lit(i).as("i"), col(s"mh$i").as("mh")))
    sh.withColumn("h", hash60(col("shingle")) % P)
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), explode(array(unpivot: _*)).as("im"))
      .select(col("doc_id"), col("im.i").as("i"), col("im.mh").as("mh"))
  }

  /** LSH candidate pairs (doc_a < doc_b) from banded signatures.
    * `cacheOn`: a STABLE frame to key the banded materialization on
    * (minhashNearDups passes the shared shingle frame) — the self-join's
    * sides would otherwise EACH re-execute the signature pipeline (wide
    * agg + explode + band groupBy): the ngram-prefix lesson, same shape
    * (r5). Without a key the banded frame is built uncached (tests).
    */
  def lshCandidates(sig: DataFrame, cacheOn: Option[DataFrame] = None): DataFrame = {
    def build = sig
      .withColumn("band", (col("i") / BandRows).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("i"), col("mh")))),
        x => x.getField("mh").cast("string")), ",").as("key"))
    val banded = cacheOn
      .map(k => cachedFrame(k, "lsh-banded")(build))
      .getOrElse(build)
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

  /** [[verifyJaccard]] with the per-pair intersection FUSED into the
    * candidate join [ROUND_NOTES r3 #2]: each doc's full sorted shingle
    * set rides the join once as an array column and the intersection is
    * one codegen `array_intersect` per candidate row — no pair×shingle
    * row blowup, no per-pair aggregation shuffle, and the sizes join
    * disappears (sz = size(set)). Identical output to [[verifyJaccard]]
    * (same rounding, same filter; Round3Spec asserts equality): shuffle
    * bytes trade pair-overlap rows for whole-doc arrays, a wash at
    * near-dup thresholds (overlap ≈ doc size) in exchange for 3 fewer
    * shuffles on the verify path.
    */
  def verifyJaccardFused(cands: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    // per-doc sorted shingle sets: joined on BOTH candidate sides (a
    // self-join re-executes each side) and shared verbatim by the
    // minhash and exact-ngram verifies — one materialization per
    // shingle frame (r5), keyed on the shingle frame itself so callers
    // with uncached shingles still converge
    val sets = cachedFrame(sh, "jaccard-sets")(
      sh.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("shingle"))).as("set")))
    cands
      .join(sets.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sets.as("zb"), col("doc_b") === col("zb.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("za.set"), col("zb.set"))).cast("long"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("za.set")) + size(col("zb.set")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Full MinHash-LSH near-dup pipeline over docs. */
  def minhashNearDups(spark: SparkSession, docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shinglesCached(docs)
    val cands = lshCandidates(minhash(spark, sh), cacheOn = Some(sh))
    verifyJaccardFused(cands, sh, threshold)
  }

  /** EXACT n-gram Jaccard near-dup (the minhash pipeline's exact twin),
    * with PPJoin-style PREFIX FILTERING (Xiao/Wang/Lin/Yu WWW'08;
    * Bayardo/Ma/Srikant WWW'07) [VERDICT r2 #4]:
    *
    * Order each doc's shingles by GLOBAL rarity (df asc, shingle asc —
    * any total order works; rarity-first makes prefixes cheap to join).
    * If J(a,b) >= t then |a∩b| >= ceil(t·max(|a|,|b|)), and by the
    * prefix-filter lemma the (|x| − ceil(t·|x|) + 1)-prefixes of BOTH
    * docs must share a shingle — so the candidate join touches only
    * prefixes, which hold each doc's RAREST shingles. Exact: provably
    * complete (the r2 full inverted-index self-join was df²-quadratic
    * on stop-shingles; prefixes kill exactly that blowup), and the
    * verify is unchanged.
    */
  def ngramJaccardNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shinglesCached(docs)
    val t = threshold
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("shingle"))
    // sz uses the SAME partition+order spec as r (explicit unbounded
    // frame): Catalyst then evaluates both in ONE WindowExec over one
    // sort, instead of two Window nodes with separate per-doc sorts.
    // MATERIALIZED once (bounded cache): the self-join's two sides
    // otherwise EACH re-execute the dfreq join + window sort — the r4
    // plan audit showed 38 exchanges with zero reuse. PPJoin's own
    // algorithm materializes the prefix index before joining; at scale
    // the window sort is the expensive part, so computing it once is
    // the right plan there too.
    val prefix = cachedFrame(docs, s"ppjoin-prefix@$t")(
      sh.join(dfreq, "shingle")
        .withColumn("r", row_number().over(byRarity))
        .withColumn("sz", count(lit(1)).over(byRarity.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("r") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
        .select(col("doc_id"), col("shingle"), col("r"), col("sz")))
    // candidate pruning inside the prefix join, all exact (classic
    // PPJoin filters):
    //  - length: J >= t needs min(|a|,|b|) >= t·max(|a|,|b|);
    //  - positional (per row): for a shared shingle at ranks (ra, rb),
    //    overlap <= min(|a|-ra, |b|-rb) + 1 and J >= t ⟺
    //    o >= t(|a|+|b|)/(1+t), so a qualifying pair passes the test on
    //    at least its first shared shingle — per-row filtering stays
    //    complete while pruning ~70% of join output rows (measured r7).
    // The r3-r6 PAIR-level positional upper bound (a 5-function groupBy
    // over the join output feeding a tighter pre-verify filter) was
    // REMOVED in r7 on measurement: it pruned 0 of 124,979 candidate
    // pairs at every tested corpus/threshold while costing the largest
    // single chunk of the query's wall (0.46 s of 0.84 — the agg
    // carried max/first buffers per pair), and the verify it guarded
    // became cheap once the sorted shingle sets were materialized once
    // and the intersection fused (r5). Dropping a pure pruning step
    // cannot change results — verify recomputes the exact Jaccard for
    // every pair either way; the dedup the groupBy provided is now a
    // bare distinct(). If a future corpus makes the verify dominate
    // (huge docs, verify >> candidate count), the bound's math above
    // still holds and it can return as a measured trade.
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")) >=
            lit(t) * greatest(col("a.sz"), col("b.sz")) &&
          (least(col("a.sz") - col("a.r"), col("b.sz") - col("b.r")) + 1) >=
            lit(t) / (1 + t) * (col("a.sz") + col("b.sz")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccardFused(cands, sh, threshold)
  }

  /** Oracle-side shingle CTE body, generated from [[ShingleN]] exactly
    * like the Spark side's transform body — changing the constant moves
    * both twins together instead of silently diverging them.
    */
  private def sqlShingleSelect: String = {
    require(ShingleN >= 2,
      s"sqlShingleSelect emits a lead()-based window; ShingleN=$ShingleN < 2 would produce malformed SQL")
    val leads = (1 until ShingleN).map(j =>
      s"lead(term, $j) OVER (PARTITION BY doc_id ORDER BY pos) AS t$j")
      .mkString(",\n           ")
    val gram = ("term" +: (1 until ShingleN).map(j => s"t$j"))
      .mkString(" || ' ' || ")
    s"""SELECT DISTINCT doc_id,
       |         $gram AS shingle
       |  FROM (
       |    SELECT doc_id, pos, term,
       |           $leads
       |    FROM tok)
       |  WHERE t${ShingleN - 1} IS NOT NULL""".stripMargin
  }

  /** DuckDB oracle for [[ngramJaccardNearDups]]. */
  def ngramJaccardOracleSql(threshold: Double): String =
    s"""WITH ${graft.sources.Corpus.sqlDocsCtes},
       |tok AS (
       |  SELECT doc_id, unnest(${Tokenizer.sqlTokensExpr("content")}) AS term,
       |         generate_subscripts(${Tokenizer.sqlTokensExpr("content")}, 1) AS pos
       |  FROM docs),
       |sh AS (
       |  $sqlShingleSelect),
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
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
       |  $sqlShingleSelect),
       |sig AS (
       |  SELECT doc_id, i, min((a * (${sqlHash60("shingle")} % $P) + b) % $P) AS mh
       |  FROM sh CROSS JOIN params GROUP BY 1, 2),
       |banded AS (
       |  -- i // band_rows: DuckDB's CAST(i / n AS INTEGER) ROUNDS the
       |  -- float quotient (i=5 -> band 2) while Spark's cast truncates
       |  -- (band 1); floor division matches the Spark banding exactly
       |  SELECT doc_id, (i // $BandRows) AS band,
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
    // ONE wide aggregation with 60 signed-sum columns instead of a
    // crossJoin row-blowup ×60 + a second shuffle: partial aggregation
    // collapses per-doc terms map-side; the fingerprint assembles from
    // the 60 sums in a single projection. Identical values, same oracle.
    val tf = docs
      .select(col("doc_id"),
        explode(Tokenizer.tokensCol(col("content"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", hash60(col("term")))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"s$b")
    }
    val fingerprint = (0 until 60).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    tf.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fingerprint.as("fingerprint"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, by
    * EXACT pigeonhole banding: the 60-bit fingerprint splits into
    * maxHamming+1 disjoint bands, and any pair within maxHamming must
    * agree exactly on >= 1 band — so candidates come from an EQUI-join
    * on (band, band_bits) and only candidates pay the Hamming verify.
    * Identical output to the all-pairs form (same oracle), but the plan
    * is shuffle-joins keyed by band bits instead of an O(n²) broadcast
    * nested loop [VERDICT r1 #2]. At 100 TB the band join explodes only
    * within equal-band buckets, which is the point of the banding.
    */
  def simhashNearDups(spark: SparkSession, docs: DataFrame, maxHamming: Int): DataFrame = {
    // bounded frame cache, not a bare per-call .cache(): the self-join
    // reads fp from both sides (materialize once) and repeat calls on
    // the same docs frame must not each leak a persisted copy (r5 —
    // the r3 shingle-leak shape)
    val fp = cachedFrame(docs, "simhash-fp")(simhash(spark, docs))
    val nBands = maxHamming + 1
    val width = (60 + nBands - 1) / nBands // disjoint cover of all 60 bits
    val bandCols = (0 until nBands).map { b =>
      val lo = b * width
      val hi = math.min(60, lo + width)
      struct(lit(b).as("band"),
        shiftright(col("fingerprint"), lo)
          .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bits"))
    }
    // fingerprints ride along on the banded rows, so the Hamming verify
    // runs INLINE in the band join's codegen filter — within-bucket
    // candidates are streamed, never materialized/deduped/re-joined.
    // r7: materialized once per docs identity (like lsh-banded) — the
    // self-join's two sides each re-ran the band explode per call, and
    // the per-call plan carried the band-struct expression tree twice.
    val banded = cachedFrame(docs, s"simhash-banded@$maxHamming")(
      fp.select(col("doc_id"), col("fingerprint"),
        explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("fingerprint"),
          col("bk.band").as("band"), col("bk.bits").as("bits")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
          col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming",
        bit_count(col("x.fingerprint").bitwiseXOR(col("y.fingerprint"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("hamming").cast("int").as("hamming"))
      .distinct() // a close pair can agree on several bands
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

  /** Vectors per kernel chunk — each join row carries at most two
    * chunks' worth of primitive arrays.
    */
  val EmbedChunk = 1024

  /** Kmeans cells for the embedding near-dup geometry (a fixed sandbox
    * setting; at production scale cells ≈ corpus / target-bucket-size).
    */
  val EmbedCells = 16

  /** Cap on the driver-side kmeans sample (rows), independent of corpus
    * size — a partitioning signal does not improve past ~10k points.
    */
  val EmbedSampleCap = 8192

  /** Embedding near-dup pairs: cosine similarity >= threshold — EXACT,
    * with no all-pairs nested loop [VERDICT r1 #3].
    *
    * Geometry: on unit vectors, cos(x,y) >= t  ⟺  ‖x̂−ŷ‖ <= r with
    * r = sqrt(2−2t). Vectors are kmeans-bucketed (driver-local
    * deterministic fit on a strided sample); a pair of CELLS can contain
    * a qualifying pair only if d(ca,cb) <= rad_a + rad_b + r (triangle
    * inequality, exact superset), and within a surviving cell pair each
    * vector pair is pre-filtered by d(ca,cb) − d(x,ca) − d(y,cb) <= r
    * before the dot product. Real near-dup corpora cluster tightly, so
    * the cell-pair cut removes most of the quadratic surface; in the
    * adversarial all-orthogonal case the algorithm degrades to exact
    * blocked all-pairs — which is what exact similarity search costs —
    * but runs as chunked primitive-array kernels (GEMM shape), not a
    * per-row UDF nested loop.
    *
    * The reported cosine uses the EXACT same arithmetic as the oracle
    * twin (dot(e)/ (‖a‖·‖b‖), rounded to 4): normalization feeds only
    * the pruning geometry, never the output value.
    */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val r = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold))

    val e = embedNorm(embeddings)

    // fused codegen normalize→argmin (no udf boxing on the pre-kernel
    // full-table pass; bit-identical geometry — see EmbedCellAssignExpr).
    // Cell assignment is threshold-independent (the threshold enters
    // only through radii/cell-pair pruning below), so the cached frame
    // is shared across thresholds; keyed on the embeddings frame like
    // the norm pass — no per-call cache leak.
    def assignedFrame(centroids: Array[Array[Double]]): DataFrame =
      cachedFrame(embeddings, "embed-assigned")(e
        .withColumn("cd",
          graft.functions.EmbedCellAssignExpr.col(col("e"), col("n"), centroids))
        .select(col("vec_id"), col("e"), col("n"),
          col("cd").getItem(0).cast("int").as("cell"),
          col("cd").getItem(1).as("dist")))

    // Threshold-independent pruning geometry (fitted centroids +
    // per-cell radii), derived ONCE per embeddings identity through the
    // bounded value cache (r7): the count job, the strided sample
    // collect, the driver fit, and the radii collect are all
    // deterministic functions of the frame — repeat calls used to pay
    // 3 driver-sync jobs per call to recompute bit-identical values
    // (the cached `embed-assigned` frame already froze these centroids
    // in, so the recompute was provably redundant).
    val (centroids, radii) = DerivedValueCache(embeddings, "embed-geometry") {
      // driver-local deterministic kmeans on a BOUNDED strided sample of
      // the NORMALIZED vectors — the index build's capped-stride pattern
      // (IndexBuilder fitStep = n/10k): the collect is provably ≤ ~2·cap
      // rows at any corpus size, not a fixed fraction of it [VERDICT r2
      // #2]. Centroids only steer the (provably exact) pruning geometry,
      // never the output values, so the sample choice can't change
      // results.
      val nRows = e.count()
      val stride = math.max(1L, nRows / EmbedSampleCap)
      def collectNorm(df: DataFrame) = df
        .select("vec_id", "e", "n")
        .limit(2 * EmbedSampleCap) // hard bound even under adversarial ids
        .collect()
        .map { r0 =>
          val v = r0.getSeq[Double](1).toArray
          val nn = r0.getDouble(2)
          (r0.getLong(0), v.map(_ / math.max(nn, 1e-300)))
        }
        .sortBy(_._1)
      val strided = collectNorm(e.filter(pmod(col("vec_id"), lit(stride)) === 0))
      // sparse / non-zero-based ids can leave the stride empty — fall
      // back to the first rows by id instead of throwing [ADVICE r2]
      val sample =
        if (strided.nonEmpty) strided
        else collectNorm(e.orderBy("vec_id"))
      val ctr = graft.cluster.CoarseClusterer
        .fitLocalDouble(sample, EmbedCells)
      // per-cell radii (exact max over the assigned frame)
      val rad = assignedFrame(ctr)
        .groupBy("cell").agg(max(col("dist")).as("rad"))
        .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
      (ctr, rad)
    }
    val assigned = assignedFrame(centroids)

    // candidate cell pairs (a <= b) from the cached geometry — exact
    // superset; the threshold enters ONLY here (driver CPU over kc²)
    val cellDist = Array.tabulate(centroids.length, centroids.length) {
      (a, b) =>
        math.sqrt(graft.cluster.CoarseClusterer
          .distances(centroids(a), Array(centroids(b))).head)
    }
    val cellPairs = for {
      a <- radii.keys.toSeq.sorted
      b <- radii.keys.toSeq.sorted
      if a <= b
      if cellDist(a)(b) <= radii(a) + radii(b) + r
    } yield (a, b, cellDist(a)(b))
    val pairsDf = spark.createDataFrame(cellPairs).toDF("ca", "cb", "cdist")

    // chunked members per cell: each kernel row carries two primitive
    // matrices — the blocked exact-GEMM shape, never row-pair explosion.
    // Chunking is threshold-independent (cells and chunk membership
    // never read r), so the windowed collect_list — the heaviest
    // pre-kernel stage — is derived once per embeddings frame (r5).
    val win = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
    val chunks = cachedFrame(embeddings, "embed-chunks")(assigned
      .withColumn("chunk",
        ((row_number().over(win) - 1) / EmbedChunk).cast("int"))
      .groupBy(col("cell"), col("chunk"))
      .agg(collect_list(struct(col("vec_id"), col("e"), col("n"),
        col("dist"))).as("members")))

    val kernel = udf { (ma: Seq[Row], mb: Seq[Row], cdist: Double,
        sameChunk: Boolean) =>
      def unpack(m: Seq[Row]) = {
        val s = m.sortBy(_.getLong(0))
        (s.map(_.getLong(0)).toArray,
          s.map(_.getSeq[Double](1).toArray).toArray,
          s.map(_.getDouble(2)).toArray,
          s.map(_.getDouble(3)).toArray)
      }
      val (ia, va, na, da) = unpack(ma)
      val (ib, vb, nb, db) = unpack(mb)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < ia.length) {
        var j = if (sameChunk) i + 1 else 0
        while (j < ib.length) {
          // exact triangle pre-filter in normalized space
          if (cdist - da(i) - db(j) <= r) {
            val x = va(i); val y = vb(j)
            var s = 0.0; var k = 0
            while (k < x.length) { s += x(k) * y(k); k += 1 }
            val cos = BigDecimal(s / (na(i) * nb(j)))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (cos >= threshold) {
              val (lo, hi) =
                if (ia(i) < ib(j)) (ia(i), ib(j)) else (ib(j), ia(i))
              out += ((lo, hi, cos))
            }
          }
          j += 1
        }
        i += 1
      }
      out.toSeq
    }

    val paired = chunks.as("x")
      .join(broadcast(pairsDf), col("x.cell") === col("ca"))
      .join(chunks.as("y"),
        col("y.cell") === col("cb") &&
          (col("ca") =!= col("cb") || col("x.chunk") <= col("y.chunk")))
    paired
      .select(explode(kernel(col("x.members"), col("y.members"),
        col("cdist"),
        col("ca") === col("cb") && col("x.chunk") === col("y.chunk")))
        .as("p"))
      .select(col("p._1").as("vec_a"), col("p._2").as("vec_b"),
        col("p._3").as("cos"))
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
