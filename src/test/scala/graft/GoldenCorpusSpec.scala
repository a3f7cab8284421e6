package graft

import java.nio.file.Files

import graft.build.IndexBuilder
import graft.query.{Bm25SqlPath, IndexSearcher}
import graft.sources.Corpus

/** F2 — golden BM25 corpus (FIXTURES.md; analog of the reference's
  * handcrafted 13-point / 3-cluster search oracle,
  * /root/reference/test/search.jl:26-49): 12 tiny source files in 3
  * disjoint topic clusters; expected top-5 docIDs AND scores are frozen
  * literals (hand-derived from the BM25 formula), asserted
  * rank-identical at full probe width; w=1 results must be an exact
  * subset (same scores) — the reference's w<kc semantics.
  */
class GoldenCorpusSpec extends SparkSpec {

  val corpus = Seq(
    ("repo-a", "src/p/lex.c", "c", "parse token lexer grammar ast token lexer"),
    ("repo-a", "src/p/ast.c", "c", "ast node tree parse grammar visitor"),
    ("repo-a", "src/p/tok.c", "c", "token stream lexer peek next token"),
    ("repo-a", "src/p/err.c", "c", "parse error recover grammar token"),
    ("repo-b", "src/m/mat.c", "c", "matrix vector multiply add scalar matrix"),
    ("repo-b", "src/m/vec.c", "c", "vector add scale dot vector norm"),
    ("repo-b", "src/m/inv.c", "c", "matrix inverse determinant solve pivot"),
    ("repo-b", "src/m/fft.c", "c", "fourier transform vector complex twiddle"),
    ("repo-c", "src/io/file.c", "c", "file read write buffer close open"),
    ("repo-c", "src/io/sock.c", "c", "socket read write accept listen buffer"),
    ("repo-c", "src/io/mmap.c", "c", "mmap page buffer flush file sync"),
    ("repo-c", "src/io/log.c", "c", "log write append file rotate buffer"))

  val queries = Seq(
    101 -> Seq("lexer", "grammar"),
    102 -> Seq("matrix", "vector", "file"),
    103 -> Seq("buffer", "write", "token"))

  /** Frozen expectations: (query, rank, doc_id, score), docIDs dense in
    * (repo, path) order — ast=0, err=1, lex=2, tok=3, fft=4, inv=5,
    * mat=6, vec=7, file=8, log=9, mmap=10, sock=11. q103 has a
    * three-way score tie broken by doc_id asc (8 < 9 < 11).
    */
  val golden: Seq[(Int, Int, Long, Double)] = Seq(
    (101, 1, 2L, 3.3591), (101, 2, 3L, 1.6296), (101, 3, 1L, 1.3936),
    (101, 4, 0L, 1.297),
    (102, 1, 6L, 3.5459), (102, 2, 7L, 1.7899), (102, 3, 5L, 1.751),
    (102, 4, 4L, 1.3936), (102, 5, 8L, 1.297),
    (103, 1, 8L, 2.3456), (103, 2, 9L, 2.3456), (103, 3, 11L, 2.3456),
    (103, 4, 3L, 1.7899), (103, 5, 2L, 1.7082))

  lazy val indexDir: String = {
    import spark.implicits._
    val src = corpus.toDF("repo", "path", "lang", "content")
      .withColumn("commit", org.apache.spark.sql.functions.lit("deadbeef0000"))
      .select("repo", "path", "commit", "lang", "content")
    val dir = Files.createTempDirectory("graft-golden").toString
    IndexBuilder.buildFromSource(spark, src, dir,
      IndexBuilder.BuildConfig(kc = 3, resume = false))
    dir
  }

  test("golden: WAND index path reproduces frozen ids AND scores (w=kc)") {
    val got = IndexSearcher.topK(spark, indexDir, queries, 5)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == golden)
  }

  test("golden: declarative SQL path agrees with the same literals") {
    import spark.implicits._
    val src = corpus.toDF("repo", "path", "lang", "content")
      .withColumn("commit", org.apache.spark.sql.functions.lit("deadbeef0000"))
      .select("repo", "path", "commit", "lang", "content")
    val docs = Corpus.docsFrom(src)
    val got = Bm25SqlPath.topK(spark, docs, queries, 5)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == golden)
  }

  test("golden: w=1 probes one cluster — exact subset with exact scores") {
    val w1 = IndexSearcher.topK(spark, indexDir, queries, 5, w = 1)
      .collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    assert(w1.nonEmpty)
    // every w=1 hit carries its EXACT score (validated against the full
    // exhaustive scoring, not just the top-5 golden cutoff)
    val full = IndexSearcher.topK(spark, indexDir, queries, 12)
      .collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3))).toSet
    w1.foreach(h => assert(full.contains(h), s"w=1 hit $h has wrong score"))
    // and w=1 must NOT see everything (clusters genuinely prune)
    assert(w1.length < full.size)
  }
}
