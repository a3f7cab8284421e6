package graft.codec

import java.io.ByteArrayOutputStream

import graft.model.PostingBlock

/** Delta + varint (LEB128) posting-block codec — the graft analog of the
  * reference's compact PQ code payload (`m·sizeof(U)+sizeof(I)` bytes per
  * point, /root/reference/src/index.jl:74): docID gaps, tfs, and doc
  * lengths are packed into a few bytes per posting, and each block
  * carries its block-max query-independent BM25 contribution for WAND
  * skipping.
  *
  * Pure Scala, no Spark dependency — runs inside `mapPartitions` on the
  * build side and inside the scorer on the read side. Property-tested
  * (roundtrip == identity) in PostingCodecSpec.
  */
object VarInt {

  /** Unsigned LEB128. Values must be >= 0. */
  def write(out: ByteArrayOutputStream, value: Long): Unit = {
    require(value >= 0, s"varint requires non-negative, got $value")
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Reads one varint starting at `pos`; returns (value, nextPos). */
  def read(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    var b = 0
    do {
      b = bytes(p) & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  /** Decode exactly `n` varints starting at 0. */
  def readN(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var p = 0
    var i = 0
    while (i < n) {
      val (v, np) = read(bytes, p)
      out(i) = v
      p = np
      i += 1
    }
    out
  }
}

/** One decoded posting entry (build-side input / read-side output). */
final case class PostingEntry(doc: Long, tf: Int, dl: Int, positions: Array[Int])

object PostingCodec {

  /** Max postings per block. 128 keeps blocks cache-friendly and gives
    * WAND fine-grained skip granularity (Ding & Suel 2011 use 64–128).
    */
  val BlockSize = 128

  /** Encode one block. `entries` must be sorted by doc ascending with
    * distinct docs. `contrib(tf, dl)` is the idf-free BM25 factor
    * g(tf, dl) — used only for the block-max header (the query side
    * scales it by idf × qtf).
    */
  def encodeBlock(
      term: String,
      clusterId: Int,
      segmentId: Int,
      blockId: Int,
      entries: Seq[PostingEntry],
      contrib: (Int, Int) => Double): PostingBlock = {
    require(entries.nonEmpty, "empty block")
    val docs = entries.map(_.doc)
    require(docs.zip(docs.tail).forall { case (a, b) => a < b },
      s"block docIds must be strictly ascending for term=$term")
    val first = docs.head
    val gapsOut = new ByteArrayOutputStream()
    var prev = first
    docs.foreach { d => VarInt.write(gapsOut, d - prev); prev = d }
    val tfsOut = new ByteArrayOutputStream()
    entries.foreach(e => VarInt.write(tfsOut, e.tf.toLong))
    val dlsOut = new ByteArrayOutputStream()
    entries.foreach(e => VarInt.write(dlsOut, e.dl.toLong))
    val posOut = new ByteArrayOutputStream()
    entries.foreach { e =>
      VarInt.write(posOut, e.positions.length.toLong)
      var pp = 0L
      e.positions.foreach { p => VarInt.write(posOut, p - pp); pp = p.toLong }
    }
    PostingBlock(
      term = term,
      cluster_id = clusterId,
      segment_id = segmentId,
      block_id = blockId,
      first_doc = first,
      last_doc = docs.last,
      count = entries.size,
      tf_sum = entries.iterator.map(_.tf.toLong).sum,
      block_max = entries.map(e => contrib(e.tf, e.dl)).max,
      doc_gaps = gapsOut.toByteArray,
      tfs = tfsOut.toByteArray,
      dls = dlsOut.toByteArray,
      positions = posOut.toByteArray)
  }

  /** Split a term's posting run into blocks of [[BlockSize]]. */
  def encodeTerm(
      term: String,
      clusterId: Int,
      segmentId: Int,
      entries: Seq[PostingEntry],
      contrib: (Int, Int) => Double): Seq[PostingBlock] =
    entries.grouped(BlockSize).zipWithIndex.map { case (grp, i) =>
      encodeBlock(term, clusterId, segmentId, i, grp, contrib)
    }.toSeq

  /** Decode a docID column from its gap bytes. */
  def decodeDocs(n: Int, firstDoc: Long, gaps: Array[Byte]): Array[Long] = {
    val gs = VarInt.readN(gaps, n)
    val docs = new Array[Long](n)
    var prev = firstDoc
    var i = 0
    while (i < n) { prev += gs(i); docs(i) = prev; i += 1 }
    docs
  }

  /** Decode docIds + tfs + dls (the scorer's hot path — positions
    * untouched).
    */
  def decodeDocsTfsDls(n: Int, firstDoc: Long, gaps: Array[Byte],
      tfs: Array[Byte], dls: Array[Byte]): (Array[Long], Array[Int], Array[Int]) =
    (decodeDocs(n, firstDoc, gaps),
      VarInt.readN(tfs, n).map(_.toInt),
      VarInt.readN(dls, n).map(_.toInt))

  def decodeDocsTfsDls(block: PostingBlock): (Array[Long], Array[Int], Array[Int]) =
    decodeDocsTfsDls(block.count, block.first_doc, block.doc_gaps,
      block.tfs, block.dls)

  /** Decode per-posting position arrays (phrase-query path). */
  def decodePositions(block: PostingBlock): Array[Array[Int]] =
    decodePositionsRaw(block.count, block.positions)

  def decodePositionsRaw(count: Int, positions: Array[Byte]): Array[Array[Int]] = {
    val out = new Array[Array[Int]](count)
    var p = 0
    var i = 0
    while (i < count) {
      val (n, np) = VarInt.read(positions, p)
      p = np
      val ps = new Array[Int](n.toInt)
      var prev = 0L
      var j = 0
      while (j < n) {
        val (gap, np2) = VarInt.read(positions, p)
        prev += gap
        ps(j) = prev.toInt
        p = np2
        j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Full decode (roundtrip testing / compaction). */
  def decodeEntries(block: PostingBlock): Seq[PostingEntry] = {
    val (docs, tfs, dls) = decodeDocsTfsDls(block)
    val pos = decodePositions(block)
    docs.indices.map(i => PostingEntry(docs(i), tfs(i), dls(i), pos(i)))
  }

  /** Stored bytes of one block (bytes/posting metric, north_rule). */
  def storedBytes(b: PostingBlock): Long =
    b.doc_gaps.length.toLong + b.tfs.length + b.dls.length + b.positions.length
}
