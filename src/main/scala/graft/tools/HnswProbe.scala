package graft.tools
import graft.cluster.GraphCoarseSearch

object HnswProbe {
  def main(args: Array[String]): Unit = {
    val n = 600
    val dim = 8
    val cs = Array.tabulate(n)(i =>
      Array.tabulate(dim)(j => ((i * (j + 3) + j * j) % 101).toDouble / 10.0))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); s += x * x; i += 1 }
      s
    }
    val (edges, upper) = GraphCoarseSearch.buildGraph(cs)
    System.err.println(s"levels=${upper.length + 1} " +
      s"deg0 avg=${edges.map(_.length).sum / n.toDouble} " +
      s"max=${edges.map(_.length).max} min=${edges.map(_.length).min}")
    // connectivity from node 0 via out-edges
    val seen = scala.collection.mutable.BitSet(0)
    var frontier = List(0)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(x => edges(x).filterNot(seen))
        .distinct.map { x => seen += x; x }
    }
    System.err.println(s"reachable from 0 at L0: ${seen.size}/$n")
    val g = new GraphCoarseSearch(cs, edges, upper)
    val queries = (0 until 40).map(q =>
      Array.tabulate(dim)(j => ((q * 7 + j * 13) % 97).toDouble / 9.0))
    var hit = 0
    queries.zipWithIndex.foreach { case (q, qi) =>
      val exactD = cs.map(d2(_, q)).min
      val got = g.probe(q, 5, ef = 64)
      val ok = got.exists(i => d2(cs(i), q) == exactD)
      if (ok) hit += 1
      else System.err.println(f"q$qi miss: exactD=$exactD%.3f got=" +
        got.map(i => f"${d2(cs(i), q)}%.3f").mkString(","))
    }
    System.err.println(s"recall@5 $hit/40")
  }
}
