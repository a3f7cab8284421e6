package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{PostingCodec, PostingEntry, VarInt}

/** F5 codec property fixtures (FIXTURES.md): roundtrip == identity for
  * sorted distinct docID lists incl. adversarial gaps, and block-max
  * header == max of block contributions.
  */
class PostingCodecSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge
    * in the offline cache).
    */
  def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("varint roundtrip for representative longs") {
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 1L << 28, (1L << 62) + 17)
    vals.foreach { v =>
      val out = new java.io.ByteArrayOutputStream()
      VarInt.write(out, v)
      val (got, n) = VarInt.read(out.toByteArray, 0)
      assert(got == v && n == out.size)
    }
  }

  val sortedDocsGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 1L << 29)).map(_.distinct.sorted)

  private def mkEntries(docs: List[Long]): List[PostingEntry] =
    docs.zipWithIndex.map { case (d, i) =>
      PostingEntry(d, (i % 100) + 1, (i % 500) + 1,
        Array.tabulate(i % 4)(j => j * 3 + (i % 7)))
    }

  test("property: decode(encode(postings)) == postings") {
    check(Prop.forAll(sortedDocsGen) { docs =>
      docs.isEmpty || {
        val entries = mkEntries(docs)
        val blocks = PostingCodec.encodeTerm(
          "t", 0, 0, entries, (tf, dl) => tf.toDouble / dl)
        val decoded = blocks.flatMap(PostingCodec.decodeEntries)
        decoded.map(e => (e.doc, e.tf, e.dl, e.positions.toList)) ==
          entries.map(e => (e.doc, e.tf, e.dl, e.positions.toList))
      }
    })
  }

  test("property: block_max equals max contribution; block invariants") {
    check(Prop.forAll(sortedDocsGen.suchThat(_.nonEmpty)) { docs =>
      val entries = mkEntries(docs)
      def contrib(tf: Int, dl: Int): Double = tf * 0.25 + (dl % 7) * 0.01
      val blocks = PostingCodec.encodeTerm("t", 3, 1, entries, contrib)
      blocks.zipWithIndex.forall { case (b, i) =>
        val grp = entries.slice(i * PostingCodec.BlockSize,
          (i + 1) * PostingCodec.BlockSize)
        b.block_id == i &&
          b.count == grp.size &&
          b.first_doc == grp.head.doc &&
          b.last_doc == grp.last.doc &&
          b.block_max == grp.map(e => contrib(e.tf, e.dl)).max
      }
    })
  }

  test("adversarial gaps >= 2^28 roundtrip") {
    val docs = Seq(0L, 1L, (1L << 28) + 1, (1L << 40), (1L << 40) + 1)
    val entries = docs.map(d => PostingEntry(d, 1, 10, Array(0, 5)))
    val blocks = PostingCodec.encodeTerm("t", 0, 0, entries, (_, _) => 1.0)
    val (ds, _, _) = PostingCodec.decodeDocsTfsDls(blocks.head)
    assert(ds.toSeq == docs)
  }

  test("adversarial: near-max-Long delta, single-posting blocks, " +
      "2^31-boundary ids, extreme tf/dl/positions") {
    def roundtrip(entries: Seq[PostingEntry]): Unit = {
      val blocks = PostingCodec.encodeTerm("t", 0, 0, entries, (_, _) => 1.0)
      val decoded = blocks.flatMap(PostingCodec.decodeEntries)
      assert(decoded.map(e => (e.doc, e.tf, e.dl, e.positions.toList)) ==
        entries.map(e => (e.doc, e.tf, e.dl, e.positions.toList)))
      // block shape invariants hold at every boundary
      val expectBlocks =
        (entries.size + PostingCodec.BlockSize - 1) / PostingCodec.BlockSize
      assert(blocks.size == expectBlocks)
      assert(blocks.last.count ==
        entries.size - (expectBlocks - 1) * PostingCodec.BlockSize)
    }
    // (a) a delta of nearly Long.MaxValue survives the varint gap coding
    roundtrip(Seq(0L, Long.MaxValue - 1)
      .map(d => PostingEntry(d, 1, 10, Array.empty)))
    // (b) single-posting term, exact BlockSize, and BlockSize+1 (forces
    // a trailing single-posting block)
    Seq(1, PostingCodec.BlockSize, PostingCodec.BlockSize + 1).foreach { n =>
      roundtrip((0L until n.toLong)
        .map(d => PostingEntry(d * 7 + 3, 2, 20, Array(1, 4))))
    }
    // (c) docIDs straddling the 2^31 int boundary with extreme tf/dl and
    // a near-max positions jump — no silent int truncation anywhere
    roundtrip(Seq((1L << 31) - 1, 1L << 31, (1L << 31) + 1).map(d =>
      PostingEntry(d, Int.MaxValue, Int.MaxValue,
        Array(0, Int.MaxValue - 1))))
  }

  test("compression: dense docIDs cost ~1 byte of gap each") {
    val entries = (0L until 1000L).map(d => PostingEntry(d, 1, 10, Array.empty))
    val blocks = PostingCodec.encodeTerm("t", 0, 0, entries, (_, _) => 1.0)
    val gapBytes = blocks.map(_.doc_gaps.length).sum
    assert(gapBytes <= 1008, s"expected ~1000 gap bytes, got $gapBytes")
  }
}
