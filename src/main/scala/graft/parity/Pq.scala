package graft.parity

import graft.cluster.Distance

/** Deterministic sequential Lloyd's kmeans over double vectors + product
  * quantization — the residual-quantizer analog of the reference
  * (QuantizedArrays.OrthogonalQuantizer, /root/reference/src/index.jl:46):
  * m codebooks of k centroids over orthogonal sub-ranges of the
  * dimension axis. Pure Scala (driver-local training on a sample; codes
  * assigned distributively).
  *
  * Reference-surface parity (r3):
  *  - `Dr` quantization distance (/root/reference/src/index.jl:109,
  *    default SqEuclidean at src/defaults.jl:8) threads through
  *    train / encode / luts as a [[graft.cluster.Distance]], mirroring
  *    round 2's `Dc` work on the coarse side;
  *  - `quantization_method = :pq | :opq` (/root/reference/src/index.jl:
  *    110): `:opq` trains an orthogonal rotation applied to residuals
  *    before sub-quantization (persisted like the reference's rotation
  *    matrix, src/persistency.jl:62-64). The rotation here is
  *    variance-balancing eigenvalue-allocation-style: a permutation
  *    matrix distributing high-variance dims across subspaces
  *    (deterministic; the OPQ paper's parametric baseline).
  */
object Pq {

  /** Squared euclidean over a sub-range [off, off+len). */
  def sqDist(a: Array[Float], b: Array[Double], aOff: Int, len: Int): Double = {
    var d = 0.0
    var i = 0
    while (i < len) {
      val x = a(aOff + i) - b(i)
      d += x * x
      i += 1
    }
    d
  }

  /** Dr over a sub-range: fast path for the default metric, general
    * Distance otherwise (sub-vector copy — driver/LUT paths only).
    */
  def subDist(dist: Distance, a: Array[Float], b: Array[Double],
      aOff: Int, len: Int): Double =
    if (dist eq Distance.SqEuclidean) sqDist(a, b, aOff, len)
    else {
      val sub = new Array[Double](len)
      var i = 0
      while (i < len) { sub(i) = a(aOff + i); i += 1 }
      dist(sub, b)
    }

  def sqDistFull(a: Array[Float], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Deterministic Lloyd's: seeds = first k distinct-ish points in input
    * order (input must arrive in a deterministic order); ties to lower
    * centroid index; empty clusters keep their centroid. Assignment uses
    * `dist` (Dr); the update stays the arithmetic mean (see
    * [[graft.cluster.Distance]] — partitioning signal only).
    */
  def kmeans(data: Array[Array[Double]], k: Int, maxIter: Int,
      dist: Distance = Distance.SqEuclidean): Array[Array[Double]] = {
    require(data.nonEmpty)
    val kk = math.min(k, data.length)
    var centroids = Array.tabulate(kk)(i => data(i * data.length / kk).clone())
    val dim = data(0).length
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      data.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val d = dist(v, centroids(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      iter += 1
    }
    centroids
  }

  /** Trained PQ: m codebooks × k centroids over sub-ranges of length
    * dim/m, under quantization distance `dist` (the reference's Dr),
    * optionally behind an orthogonal `rotation` (the reference's :opq).
    */
  final case class Codebooks(m: Int, k: Int, subLen: Int,
      books: Array[Array[Array[Double]]],
      dist: Distance = Distance.SqEuclidean,
      rotation: Option[Array[Array[Double]]] = None) {

    /** R·v for the persisted rotation (identity when None). */
    def rotate(v: Array[Float]): Array[Float] = rotation match {
      case None => v
      case Some(r) =>
        val out = new Array[Float](r.length)
        var i = 0
        while (i < r.length) {
          var s = 0.0
          var j = 0
          while (j < v.length) { s += r(i)(j) * v(j); j += 1 }
          out(i) = s.toFloat
          i += 1
        }
        out
    }

    /** Encode one residual vector → m sub-codes (rotated first for
      * :opq; nearest codebook entry under Dr).
      */
    def encode(residual: Array[Float]): Array[Byte] = {
      val rv = rotate(residual)
      val codes = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val off = s * subLen
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = subDist(dist, rv, books(s)(c), off, subLen)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(s) = best.toByte
        s += 1
      }
      codes
    }

    /** ADC lookup tables for a query residual: lut(s)(c) = Dr-distance
      * of the query's (rotated) sub-range s to codebook entry c —
      * the reference's difftables (/root/reference/src/index.jl:232-236).
      */
    def luts(qResidual: Array[Float]): Array[Array[Double]] = {
      val rv = rotate(qResidual)
      Array.tabulate(m)(s =>
        Array.tabulate(k)(c =>
          subDist(dist, rv, books(s)(c), s * subLen, subLen)))
    }
  }

  /** Variance-balancing orthogonal rotation for :opq — a permutation
    * matrix from eigenvalue-allocation-style serpentine assignment:
    * dims sorted by residual variance (desc), dealt to subspaces in
    * serpentine order (0..m-1, m-1..0, …) so every subspace receives an
    * even mix of high- and low-variance dims. Deterministic; orthogonal
    * by construction.
    */
  def varianceBalancedRotation(residuals: Array[Array[Float]], m: Int): Array[Array[Double]] = {
    val dim = residuals(0).length
    val n = residuals.length
    val mean = new Array[Double](dim)
    residuals.foreach { r =>
      var i = 0; while (i < dim) { mean(i) += r(i); i += 1 }
    }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }
    val variance = new Array[Double](dim)
    residuals.foreach { r =>
      var j = 0
      while (j < dim) {
        val x = r(j) - mean(j); variance(j) += x * x; j += 1
      }
    }
    // dims by variance desc (ties by index for determinism)
    val order = (0 until dim).sortBy(d => (-variance(d), d))
    val subLen = dim / m
    // serpentine deal: round r sends its m dims to subspaces in
    // forward/backward alternation; each subspace ends with subLen dims
    val bySub = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    order.zipWithIndex.foreach { case (d, pos) =>
      val round = pos / m
      val s = if (round % 2 == 0) pos % m else m - 1 - (pos % m)
      bySub(s) += d
    }
    val perm = bySub.flatMap(_.toSeq) // new index i ← old dim perm(i)
    val rot = Array.fill(dim)(new Array[Double](dim))
    perm.zipWithIndex.foreach { case (old, nw) => rot(nw)(old) = 1.0 }
    rot
  }

  /** Train m sub-quantizers on residuals (deterministic input order)
    * under Dr `dist`; `method = "pq" | "opq"` selects the rotation.
    */
  def train(residuals: Array[Array[Float]], m: Int, k: Int, maxIter: Int,
      dist: Distance = Distance.SqEuclidean,
      method: String = "pq"): Codebooks = {
    require(method == "pq" || method == "opq",
      s"quantization_method must be pq or opq, got $method")
    val dim = residuals(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subLen = dim / m
    val rotation =
      if (method == "opq") Some(varianceBalancedRotation(residuals, m))
      else None
    val pre = Codebooks(m, k, subLen, Array.empty, dist, rotation)
    val rotated = rotation match {
      case None => residuals
      case Some(_) => residuals.map(pre.rotate)
    }
    val books = Array.tabulate(m) { s =>
      val off = s * subLen
      val sub = rotated.map(r =>
        Array.tabulate(subLen)(i => r(off + i).toDouble))
      kmeans(sub, k, maxIter, dist)
    }
    Codebooks(m, k, subLen, books, dist, rotation)
  }
}
