package graft.query

/** Document-at-a-time WAND top-k with block-max skipping (Broder et al.
  * 2003; Ding & Suel 2011) — the graft analog of the reference's
  * inverted-list scan + bounded top-k heap
  * (/root/reference/src/index.jl:240-254). Pure Scala; runs inside the
  * query-side `mapPartitions` scorer over one cluster's decoded lists.
  *
  * RANK-IDENTITY CONTRACT (SURVEY.md §7.4): the final ranking order is
  * (score rounded to Bm25.Scale DESC, doc_id ASC) — identical to the SQL
  * path and the DuckDB oracle. The skip threshold is therefore derived
  * from the ROUNDED k-th score: a doc may only be skipped when its upper
  * bound is strictly below the smallest raw score that could still round
  * into (or tie) the current top-k. This keeps skipping safe even for
  * rounded-score ties that are later broken by doc_id.
  */
object Wand {

  /** One query term's decoded posting list within one cluster.
    *
    * @param contribs  qtf-weighted exact BM25 contribution per posting
    * @param blockStarts index of the first posting of each block
    * @param blockMaxes  qtf-weighted block-max contribution per block
    */
  final class TermList(
      val docs: Array[Long],
      val contribs: Array[Double],
      val blockStarts: Array[Int],
      val blockMaxes: Array[Double]) {
    require(docs.length == contribs.length)
    val termUB: Double = if (blockMaxes.isEmpty) 0.0 else blockMaxes.max

    /** Index of the block containing posting index `i`. */
    def blockOf(i: Int): Int = {
      var b = java.util.Arrays.binarySearch(blockStarts, i)
      if (b < 0) b = -b - 2
      b
    }
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
  def bruteForceTopK(lists: Array[TermList], k: Int,
      excluded: Long => Boolean = _ => false): Array[Hit] = {
    val acc = new java.util.HashMap[java.lang.Long, java.lang.Double]()
    lists.foreach { l =>
      var i = 0
      while (i < l.docs.length) {
        val key = java.lang.Long.valueOf(l.docs(i))
        val prev = acc.get(key)
        acc.put(key,
          if (prev == null) l.contribs(i) else prev.doubleValue + l.contribs(i))
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
  def topK(listsIn: Array[TermList], k: Int,
      excluded: Long => Boolean = _ => false): Array[Hit] = {
    val lists = listsIn.filter(_.docs.nonEmpty)
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
    // `order` holds list indices sorted by current doc; exhausted at end
    val order = Array.tabulate(n)(identity)
    def doc(li: Int): Long =
      if (pos(li) >= lists(li).docs.length) Long.MaxValue
      else lists(li).docs(pos(li))
    def sortOrder(): Unit = {
      // n is tiny (#query terms); insertion sort by current doc
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
    /** advance list li to first doc >= target (gallop + binary search) */
    def seek(li: Int, target: Long): Unit = {
      val ds = lists(li).docs
      var l = pos(li)
      if (l >= ds.length || ds(l) >= target) return
      var step = 1
      var h = l + 1
      while (h < ds.length && ds(h) < target) { l = h; h = l + step; step <<= 1 }
      if (h > ds.length) h = ds.length
      while (l < h) {
        val m = (l + h) >>> 1
        if (ds(m) < target) l = m + 1 else h = m
      }
      pos(li) = l
    }

    var continue = true
    while (continue) {
      sortOrder()
      val th = theta
      // pivot: first prefix whose term-UB sum could reach the threshold
      var acc = 0.0
      var pivot = -1
      var i = 0
      while (i < n && pivot == -1) {
        val li = order(i)
        if (doc(li) == Long.MaxValue) { i = n } // all remaining exhausted
        else {
          acc += lists(li).termUB
          if (acc >= th || th == Double.NegativeInfinity) pivot = i
          else i += 1
        }
      }
      if (pivot == -1) continue = false
      else {
        val pivotDoc = doc(order(pivot))
        if (pivotDoc == Long.MaxValue) continue = false
        else if (doc(order(0)) == pivotDoc) {
          // block-max check: exact UB of pivotDoc from current blocks.
          // MUST scan ALL lists (not just 0..pivot): lists after the
          // pivot can sit on the same doc and add contribution.
          var bmSum = 0.0
          var j = 0
          while (j < n) {
            val li = order(j)
            if (doc(li) == pivotDoc) {
              val l = lists(li)
              bmSum += l.blockMaxes(l.blockOf(pos(li)))
            }
            j += 1
          }
          if (bmSum < th) {
            // cannot qualify: advance all cursors sitting on pivotDoc
            var j2 = 0
            while (j2 < n) {
              val li = order(j2)
              if (doc(li) == pivotDoc) pos(li) += 1
              j2 += 1
            }
          } else {
            // full score
            var s = 0.0
            var j2 = 0
            while (j2 < n) {
              val li = order(j2)
              if (doc(li) == pivotDoc) { s += lists(li).contribs(pos(li)); pos(li) += 1 }
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
          if (bestLi == -1) continue = false // defensive; shouldn't happen
          else seek(bestLi, pivotDoc)
        }
      }
    }

    val out = new Array[Hit](heap.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 }
    out
  }
}
