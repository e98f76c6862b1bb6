package graft.operators

/** Driver-side k-means kernels shared by [[IvfSearch]] (full-vector
  * centroids) and [[PqSearch]] (per-subspace codebooks). One
  * implementation carries the determinism contract BOTH scaladocs pin —
  * strict-< argmin (ties keep the LOWER centroid id), empty cells keep
  * their previous centroid — so a tie-rule or accumulation-order change
  * cannot silently diverge between the two operators. */
private[operators] object Kmeans {

  def sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** `iters` Lloyd passes over `pts` from `init`. */
  def lloyd(pts: Array[Array[Double]], init: Array[Array[Double]],
            iters: Int): Array[Array[Double]] = {
    val k = init.length
    val dim = init.head.length
    var cents = init
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) { // strict < : ties keep the LOWER centroid id
          val d = sq(p, cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
    }
    cents
  }

  /** Keep only the modal-dimension vectors (ties break to the smaller
    * dimension — any deterministic rule works): malformed wrong-length
    * strays must neither pick the training dimension nor crash the
    * distance kernels. */
  def modalDim[T](raw: Array[Array[T]]): Array[Array[T]] = {
    if (raw.isEmpty) return raw
    val dim = raw.groupBy(_.length).maxBy { case (l, g) => (g.length, -l) }._1
    raw.filter(_.length == dim)
  }
}
