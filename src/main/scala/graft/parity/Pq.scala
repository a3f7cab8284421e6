package graft.parity

/** Deterministic sequential Lloyd's kmeans over double vectors + product
  * quantization — the residual-quantizer analog of the reference
  * (QuantizedArrays.OrthogonalQuantizer, /root/reference/src/index.jl:46):
  * m codebooks of k centroids over orthogonal sub-ranges of the
  * dimension axis. Pure Scala (driver-local training on a sample; codes
  * assigned distributively), no rotation (the reference's :pq method —
  * rotation belongs to :opq only).
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

  def sqDistFull(a: Array[Float], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Deterministic Lloyd's: seeds = first k distinct-ish points in input
    * order (input must arrive in a deterministic order); ties to lower
    * centroid index; empty clusters keep their centroid.
    */
  def kmeans(data: Array[Array[Double]], k: Int, maxIter: Int): Array[Array[Double]] = {
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
          var d = 0.0
          var i = 0
          while (i < dim) { val x = v(i) - centroids(c)(i); d += x * x; i += 1 }
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
    * dim/m.
    */
  final case class Codebooks(m: Int, k: Int, subLen: Int,
      books: Array[Array[Array[Double]]]) {

    /** Encode one residual vector → m sub-codes. */
    def encode(residual: Array[Float]): Array[Byte] = {
      val codes = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val off = s * subLen
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = sqDist(residual, books(s)(c), off, subLen)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(s) = best.toByte
        s += 1
      }
      codes
    }

    /** ADC lookup tables for a query residual: lut(s)(c) = squared
      * distance of the query's sub-range s to codebook entry c —
      * the reference's difftables (/root/reference/src/index.jl:232-236).
      */
    def luts(qResidual: Array[Float]): Array[Array[Double]] =
      Array.tabulate(m)(s =>
        Array.tabulate(k)(c => sqDist(qResidual, books(s)(c), s * subLen, subLen)))
  }

  /** Train m sub-quantizers on residuals (deterministic input order). */
  def train(residuals: Array[Array[Float]], m: Int, k: Int, maxIter: Int): Codebooks = {
    val dim = residuals(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subLen = dim / m
    val books = Array.tabulate(m) { s =>
      val off = s * subLen
      val sub = residuals.map(r =>
        Array.tabulate(subLen)(i => r(off + i).toDouble))
      kmeans(sub, k, maxIter)
    }
    Codebooks(m, k, subLen, books)
  }
}
