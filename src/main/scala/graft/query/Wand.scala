package graft.query

import graft.codec.PostingCodec
import graft.model.ScorerBlock

/** Document-at-a-time WAND top-k with block-max skipping (Broder et al.
  * 2003; Ding & Suel 2011) — the graft analog of the reference's
  * inverted-list scan + bounded top-k heap
  * (/root/reference/src/index.jl:240-254). Pure Scala; runs inside the
  * query-side `mapPartitions` scorer over one cluster's lists.
  *
  * RANK-IDENTITY CONTRACT (SURVEY.md §7.4): the final ranking order is
  * (score rounded to Bm25.Scale DESC, doc_id ASC) — identical to the SQL
  * path and the DuckDB oracle. The skip threshold is therefore derived
  * from the ROUNDED k-th score: a doc may only be skipped when its upper
  * bound is strictly below the smallest raw score that could still round
  * into (or tie) the current top-k. This keeps skipping safe even for
  * rounded-score ties that are later broken by doc_id.
  *
  * Postings are consumed through [[PostingCursor]]: the production
  * implementation ([[LazyBlockList]]) decodes blocks ON DEMAND, so WAND
  * skipping saves decompression work, not just score arithmetic — the
  * property that matters when a stop-word list is gigabytes long.
  */
object Wand {

  /** Random-access view of one query term's posting list in one cluster. */
  trait PostingCursor {
    def length: Int
    def doc(i: Int): Long
    def contrib(i: Int): Double

    /** index of the block containing posting index i */
    def blockOf(i: Int): Int

    /** weighted (idf × qtf) block-max of block b */
    def blockMax(b: Int): Double

    /** weighted upper bound over the whole list */
    def termUB: Double

    /** first index >= pos whose doc >= target (== length if none) */
    def seek(pos: Int, target: Long): Int
  }

  /** Fully-decoded cursor (tests / tiny lists). */
  final class TermList(
      val docs: Array[Long],
      val contribs: Array[Double],
      val blockStarts: Array[Int],
      val blockMaxes: Array[Double]) extends PostingCursor {
    require(docs.length == contribs.length)
    override val termUB: Double =
      if (blockMaxes.isEmpty) 0.0 else blockMaxes.max
    override def length: Int = docs.length
    override def doc(i: Int): Long = docs(i)
    override def contrib(i: Int): Double = contribs(i)
    override def blockOf(i: Int): Int = {
      var b = java.util.Arrays.binarySearch(blockStarts, i)
      if (b < 0) b = -b - 2
      b
    }
    override def blockMax(b: Int): Double = blockMaxes(b)
    override def seek(pos: Int, target: Long): Int = {
      var l = pos
      if (l >= docs.length || docs(l) >= target) return l
      var step = 1
      var h = l + 1
      while (h < docs.length && docs(h) < target) { l = h; h = l + step; step <<= 1 }
      if (h > docs.length) h = docs.length
      while (l < h) {
        val m = (l + h) >>> 1
        if (docs(m) < target) l = m + 1 else h = m
      }
      l
    }
  }

  /** Lazily-decoded cursor over compressed blocks (sorted by first_doc,
    * disjoint doc ranges — guaranteed by the build's range
    * partitioning). A block is decompressed the first time a posting
    * inside it is touched; `seek` navigates block METADATA
    * (first_doc/last_doc) without decoding skipped blocks.
    *
    * @param weight idf × qtf — applied to contribs and block maxes
    */
  final class LazyBlockList(
      blocks: Array[ScorerBlock],
      weight: Double,
      idf: Double,
      avgdl: Double) extends PostingCursor {
    private val starts: Array[Int] = {
      val s = new Array[Int](blocks.length)
      var acc = 0
      var i = 0
      while (i < blocks.length) { s(i) = acc; acc += blocks(i).count; i += 1 }
      s
    }
    override val length: Int =
      if (blocks.isEmpty) 0 else starts(blocks.length - 1) + blocks.last.count
    private val maxes: Array[Double] = blocks.map(_.block_max * idf * weight)
    override val termUB: Double = if (maxes.isEmpty) 0.0 else maxes.max

    private val docsDec = new Array[Array[Long]](blocks.length)
    private val contribsDec = new Array[Array[Double]](blocks.length)

    /** number of blocks actually decompressed (observability + tests) */
    var decodedBlocks: Int = 0

    private def ensure(b: Int): Unit = if (docsDec(b) == null) {
      val blk = blocks(b)
      val (ds, tfs, dls) = PostingCodec.decodeDocsTfsDls(
        blk.count, blk.first_doc, blk.doc_gaps, blk.tfs, blk.dls)
      val cs = new Array[Double](ds.length)
      var i = 0
      while (i < ds.length) {
        cs(i) = weight * Bm25.contrib(idf, tfs(i).toLong, dls(i).toLong, avgdl)
        i += 1
      }
      docsDec(b) = ds
      contribsDec(b) = cs
      decodedBlocks += 1
    }

    override def blockOf(i: Int): Int = {
      var b = java.util.Arrays.binarySearch(starts, i)
      if (b < 0) b = -b - 2
      b
    }
    override def blockMax(b: Int): Double = maxes(b)
    override def doc(i: Int): Long = {
      val b = blockOf(i)
      ensure(b)
      docsDec(b)(i - starts(b))
    }
    override def contrib(i: Int): Double = {
      val b = blockOf(i)
      ensure(b)
      contribsDec(b)(i - starts(b))
    }
    override def seek(pos: Int, target: Long): Int = {
      if (pos >= length) return length
      // block-level navigation on metadata only
      var b = blockOf(pos)
      if (blocks(b).last_doc < target) {
        b += 1
        while (b < blocks.length && blocks(b).last_doc < target) b += 1
        if (b >= blocks.length) return length
        if (blocks(b).first_doc >= target) return starts(b)
      }
      // in-block binary search (decodes exactly this block)
      ensure(b)
      val ds = docsDec(b)
      var l = math.max(pos - starts(b), 0)
      var h = ds.length
      while (l < h) {
        val m = (l + h) >>> 1
        if (ds(m) < target) l = m + 1 else h = m
      }
      if (l >= ds.length) {
        // target beyond this block but <= last_doc cannot happen
        // (last_doc < target was handled); defensive
        starts(b) + ds.length
      } else starts(b) + l
    }
  }

  /** qtf > 1 view over a shared cursor (decode cache stays shared). */
  final class WeightedCursor(base: PostingCursor, w: Double) extends PostingCursor {
    override def length: Int = base.length
    override def doc(i: Int): Long = base.doc(i)
    override def contrib(i: Int): Double = base.contrib(i) * w
    override def blockOf(i: Int): Int = base.blockOf(i)
    override def blockMax(b: Int): Double = base.blockMax(b) * w
    override val termUB: Double = base.termUB * w
    override def seek(pos: Int, target: Long): Int = base.seek(pos, target)
  }

  final case class Hit(docId: Long, score: Double) // score already rounded

  def round(raw: Double): Double =
    BigDecimal(raw).setScale(Bm25.Scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** raw scores >= this could still round into a top-k slot currently
    * bounded by `worstRounded` (HALF_UP); guard epsilon keeps borderline
    * floats safe.
    */
  private def skipThreshold(worstRounded: Double): Double =
    worstRounded - 0.5 * math.pow(10, -Bm25.Scale) - 1e-9

  /** Exhaustive reference scorer (term-at-a-time accumulation) — used by
    * tests to validate WAND and by callers who want no skipping.
    */
  def bruteForceTopK(lists: Array[_ <: PostingCursor], k: Int,
      excluded: Long => Boolean = _ => false): Array[Hit] = {
    val acc = new java.util.HashMap[java.lang.Long, java.lang.Double]()
    lists.foreach { l =>
      var i = 0
      while (i < l.length) {
        val key = java.lang.Long.valueOf(l.doc(i))
        val prev = acc.get(key)
        acc.put(key,
          if (prev == null) l.contrib(i) else prev.doubleValue + l.contrib(i))
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    acc.asScala.toArray
      .collect { case (d, s) if !excluded(d.longValue) =>
        Hit(d.longValue, round(s.doubleValue))
      }
      .sortBy(h => (-h.score, h.docId))
      .take(k)
  }

  /** Block-max WAND top-k over one cluster's term lists. `excluded`
    * filters tombstoned docs BEFORE they can occupy a top-k slot.
    */
  def topK(listsIn: Array[_ <: PostingCursor], k: Int,
      excluded: Long => Boolean = _ => false): Array[Hit] = {
    val lists: Array[PostingCursor] =
      listsIn.filter(_.length > 0).toArray
    if (lists.isEmpty || k <= 0) return Array.empty

    // bounded heap ordered worst-first: (rounded asc, docId desc) — the
    // analog of the reference's SortedMultiDict top-k
    // (/root/reference/src/index.jl:247-254) under the graft total order.
    val heap = new java.util.PriorityQueue[Hit](k,
      (a: Hit, b: Hit) => {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
      })
    def offer(docId: Long, raw: Double): Unit = {
      val h = Hit(docId, round(raw))
      if (heap.size < k) heap.offer(h)
      else {
        val w = heap.peek()
        if (h.score > w.score || (h.score == w.score && h.docId < w.docId)) {
          heap.poll(); heap.offer(h)
        }
      }
    }
    def theta: Double =
      if (heap.size < k) Double.NegativeInfinity
      else skipThreshold(heap.peek().score)

    val n = lists.length
    val pos = new Array[Int](n) // cursor per list
    val order = Array.tabulate(n)(identity)
    def doc(li: Int): Long =
      if (pos(li) >= lists(li).length) Long.MaxValue
      else lists(li).doc(pos(li))
    def sortOrder(): Unit = {
      var i = 1
      while (i < n) {
        val v = order(i)
        val dv = doc(v)
        var j = i - 1
        while (j >= 0 && doc(order(j)) > dv) { order(j + 1) = order(j); j -= 1 }
        order(j + 1) = v
        i += 1
      }
    }

    var continue = true
    while (continue) {
      sortOrder()
      val th = theta
      var acc = 0.0
      var pivot = -1
      var i = 0
      while (i < n && pivot == -1) {
        val li = order(i)
        if (doc(li) == Long.MaxValue) { i = n }
        else {
          acc += lists(li).termUB
          // (acc >= th already holds for every finite acc when th is
          // -Infinity — no special case needed)
          if (acc >= th) pivot = i
          else i += 1
        }
      }
      if (pivot == -1) continue = false
      else {
        val pivotDoc = doc(order(pivot))
        if (pivotDoc == Long.MaxValue) continue = false
        else if (doc(order(0)) == pivotDoc) {
          // block-max check over ALL lists sitting on pivotDoc (lists
          // after the pivot can share the doc and add contribution)
          var bmSum = 0.0
          var j = 0
          while (j < n) {
            val li = order(j)
            if (doc(li) == pivotDoc) {
              val l = lists(li)
              bmSum += l.blockMax(l.blockOf(pos(li)))
            }
            j += 1
          }
          if (bmSum < th) {
            var j2 = 0
            while (j2 < n) {
              val li = order(j2)
              if (doc(li) == pivotDoc) pos(li) += 1
              j2 += 1
            }
          } else {
            var s = 0.0
            var j2 = 0
            while (j2 < n) {
              val li = order(j2)
              if (doc(li) == pivotDoc) { s += lists(li).contrib(pos(li)); pos(li) += 1 }
              j2 += 1
            }
            if (!excluded(pivotDoc)) offer(pivotDoc, s)
          }
        } else {
          // advance the highest-UB list before the pivot up to pivotDoc
          var bestLi = -1
          var bestUB = -1.0
          var j = 0
          while (j < pivot) {
            val li = order(j)
            if (doc(li) < pivotDoc && lists(li).termUB > bestUB) {
              bestUB = lists(li).termUB; bestLi = li
            }
            j += 1
          }
          if (bestLi == -1) continue = false
          else pos(bestLi) = lists(bestLi).seek(pos(bestLi), pivotDoc)
        }
      }
    }

    val out = new Array[Hit](heap.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 }
    out
  }
}
