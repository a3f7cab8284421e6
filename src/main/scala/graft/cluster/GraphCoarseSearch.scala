package graft.cluster

/** Graph-based coarse search — the Q3 graft
  * (/root/reference/src/coarsequantizers.jl:58-89, HNSWQuantizer): a
  * deterministic navigable-small-world graph over the centroids with
  * greedy best-first probing. Like the reference's HNSW option it is
  * APPROXIMATE and only pays off when kc is large (the reference docs
  * call naive "simple" and hnsw "fast!"); at sandbox kc the naive
  * argsort in IndexSearcher stays the default. Driver-local (centroids
  * are always driver-held), no Spark.
  *
  * Determinism: exact kNN edges (ties toward lower id), fixed entry
  * point (node 0), visited-set order fixed by a sorted candidate heap.
  */
final class GraphCoarseSearch(
    centroids: Array[Array[Double]],
    val edges: Array[Array[Int]]) {

  def this(centroids: Array[Array[Double]], numNeighbors: Int = 8) =
    this(centroids, GraphCoarseSearch.buildEdges(centroids, numNeighbors))

  private val n = centroids.length

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Greedy best-first search: returns up to w cluster ids ordered by
    * (distance, id) among the ef-visited frontier. ef >= w controls
    * recall (ef = kc degenerates to exact).
    */
  def probe(query: Array[Double], w: Int, ef: Int = 16): Seq[Int] = {
    if (n == 0) return Seq.empty
    val visited = new java.util.HashSet[Integer]()
    // candidate min-heap by (dist, id); results kept as a bounded set
    implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2
    val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      ord.reverse)
    val results = scala.collection.mutable.TreeSet.empty[(Double, Int)]
    val entry = 0
    val d0 = dist(query, centroids(entry))
    cand.enqueue((d0, entry))
    visited.add(entry)
    results.add((d0, entry))
    val efCap = math.max(ef, w)
    var continue = true
    while (continue && cand.nonEmpty) {
      val (d, node) = cand.dequeue()
      // stop when the best unexpanded candidate is worse than the
      // efCap-th best result (classic NSW termination)
      if (results.size >= efCap && d > results.take(efCap).last._1) {
        continue = false
      } else {
        edges(node).foreach { nb =>
          if (visited.add(nb)) {
            val dn = dist(query, centroids(nb))
            cand.enqueue((dn, nb))
            results.add((dn, nb))
          }
        }
      }
    }
    results.iterator.take(w).map(_._2).toSeq
  }
}

object GraphCoarseSearch {

  /** Exact kNN adjacency (small kc: O(kc²) once at build time). The
    * built graph is PERSISTED in the manifest (the P2 graft of the
    * reference's HNSW save/load,
    * /root/reference/src/persistency.jl:163-241) and reloaded at open —
    * at large kc the rebuild is the expensive part, exactly why the
    * reference serializes its graph.
    */
  def buildEdges(
      centroids: Array[Array[Double]],
      numNeighbors: Int = 8): Array[Array[Int]] = {
    val n = centroids.length
    def dist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0
      var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    Array.tabulate(n) { i =>
      (0 until n).filter(_ != i)
        .map(j => (dist(centroids(i), centroids(j)), j))
        .sortBy { case (d, j) => (d, j) }
        .take(math.min(numNeighbors, n - 1))
        .map(_._2)
        .toArray
    }
  }
}
