package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.query.{Bm25, Wand}
import graft.query.Wand.TermList

/** Property: WAND top-k == brute-force top-k under the final total order
  * (rounded score desc, docId asc) — the upgrade of the reference's
  * heap-vs-set test (/root/reference/test/search.jl:39) to rank-identity.
  */
class WandSpec extends AnyFunSuite {

  def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  /** Build a TermList from (doc, contrib) pairs with a given block size. */
  def mkList(postings: Seq[(Long, Double)], blockSize: Int): TermList = {
    val sorted = postings.sortBy(_._1)
    val docs = sorted.map(_._1).toArray
    val contribs = sorted.map(_._2).toArray
    val starts = docs.indices.by(blockSize).toArray
    val maxes = starts.map { s =>
      contribs.slice(s, math.min(s + blockSize, contribs.length)).max
    }
    new TermList(docs, contribs, starts, maxes)
  }

  val listsGen: Gen[(List[List[(Long, Double)]], Int, Int)] = for {
    nLists <- Gen.chooseNum(1, 5)
    k <- Gen.chooseNum(1, 12)
    blockSize <- Gen.oneOf(1, 2, 4, 16)
    lists <- Gen.listOfN(nLists, for {
      docs <- Gen.listOf(Gen.chooseNum(0L, 60L)).map(_.distinct.sorted)
      scores <- Gen.listOfN(docs.size,
        Gen.chooseNum(1, 40000).map(_ / 10000.0)) // 4-decimal-ish scores, many ties
    } yield docs.zip(scores))
  } yield (lists, k, blockSize)

  test("property: WAND == brute force (ids AND scores, rank order)") {
    check(Prop.forAll(listsGen) { case (lists, k, blockSize) =>
      // sanitize: shrinking can violate generator invariants (dup docs)
      val tls = lists.map(_.distinctBy(_._1)).filter(_.nonEmpty)
        .map(mkList(_, blockSize)).toArray
      val got = Wand.topK(tls, k).toList
      val exp = Wand.bruteForceTopK(tls, k).toList
      got == exp
    })
  }

  test("ties broken by docId asc, scores rounded HALF_UP") {
    val l = mkList(Seq(5L -> 1.00005, 3L -> 1.00005, 9L -> 1.5), 2)
    val got = Wand.topK(Array(l), 2).toList
    assert(got == List(Wand.Hit(9, 1.5), Wand.Hit(3, 1.0001)))
  }

  test("k larger than corpus returns everything ranked") {
    val l = mkList(Seq(1L -> 0.5, 2L -> 0.7), 128)
    val got = Wand.topK(Array(l), 10).toList
    assert(got == List(Wand.Hit(2, 0.7), Wand.Hit(1, 0.5)))
  }

  test("empty lists") {
    assert(Wand.topK(Array.empty[TermList], 5).isEmpty)
  }

  /** Lazy block cursor over real encoded blocks == eager cursor. */
  test("property: LazyBlockList == eager TermList results; skipping saves decodes") {
    import graft.codec.{PostingCodec, PostingEntry}
    val gen = for {
      docs <- Gen.listOf(Gen.chooseNum(0L, 5000L)).map(_.distinct.sorted)
        .suchThat(_.nonEmpty)
      k <- Gen.chooseNum(1, 8)
    } yield (docs, k)
    check(Prop.forAll(gen) { case (docs, k) =>
      val entries = docs.zipWithIndex.map { case (d, i) =>
        PostingEntry(d, (i % 7) + 1, (i % 40) + 5, Array.empty[Int])
      }
      val avgdl = 20.0
      val idf = 1.7
      val blocks = PostingCodec
        .encodeTerm("t", 0, 0, entries, (tf, dl) => Bm25.g(tf, dl, avgdl))
        .map(b => graft.model.ScorerBlock(b.term, b.cluster_id, b.first_doc,
          b.last_doc, b.count, b.block_max, b.doc_gaps, b.tfs, b.dls))
        .toArray
      val lazyList = new Wand.LazyBlockList(blocks, 1.0, idf, avgdl)
      val eager = {
        val ds = entries.map(_.doc).toArray
        val cs = entries.map(e =>
          Bm25.contrib(idf, e.tf.toLong, e.dl.toLong, avgdl)).toArray
        val starts = ds.indices.by(PostingCodec.BlockSize).toArray
        val maxes = blocks.map(_.block_max * idf)
        new TermList(ds, cs, starts, maxes)
      }
      Wand.topK(Array(lazyList), k).toList ==
        Wand.topK(Array[Wand.PostingCursor](eager), k).toList
    })
  }

  test("lazy cursor: seek over block metadata skips decoding") {
    import graft.codec.{PostingCodec, PostingEntry}
    // 10 blocks of 128 postings
    val entries = (0L until 1280L).map(d => PostingEntry(d, 1, 10, Array.empty[Int]))
    val blocks = PostingCodec
      .encodeTerm("t", 0, 0, entries, (tf, dl) => Bm25.g(tf, dl, 10.0))
      .map(b => graft.model.ScorerBlock(b.term, b.cluster_id, b.first_doc,
        b.last_doc, b.count, b.block_max, b.doc_gaps, b.tfs, b.dls))
      .toArray
    assert(blocks.length == 10)
    val c = new Wand.LazyBlockList(blocks, 1.0, 1.0, 10.0)
    // seek deep into the list: only the landing block decodes
    val i = c.seek(0, 1275L)
    assert(c.doc(i) == 1275L)
    assert(c.decodedBlocks <= 1, s"decoded ${c.decodedBlocks} blocks")
  }
}
