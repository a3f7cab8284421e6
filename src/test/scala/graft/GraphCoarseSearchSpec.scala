package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.GraphCoarseSearch

class GraphCoarseSearchSpec extends AnyFunSuite {

  def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private def exact(cs: Array[Array[Double]], q: Array[Double], w: Int): Seq[Int] =
    cs.zipWithIndex.map { case (c, i) =>
      (c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, i)
    }.sortBy { case (d, i) => (d, i) }.take(w).map(_._2).toSeq

  val gen = for {
    kc <- Gen.chooseNum(2, 24)
    dim <- Gen.chooseNum(2, 8)
    cs <- Gen.listOfN(kc, Gen.listOfN(dim, Gen.chooseNum(-50, 50).map(_.toDouble)))
    q <- Gen.listOfN(dim, Gen.chooseNum(-50, 50).map(_.toDouble))
    w <- Gen.chooseNum(1, 4)
  } yield (cs.map(_.toArray).toArray, q.toArray, w)

  test("property: complete-graph probing at ef=kc is exact (brute argsort)") {
    // a kNN out-edge digraph is not guaranteed strongly connected, so
    // greedy search is only PROVABLY exact on the complete graph — the
    // honest claim for an approximate structure (the reference's HNSW
    // is approximate too)
    check(Prop.forAll(gen) { case (cs, q, w) =>
      val g = new GraphCoarseSearch(cs, numNeighbors = cs.length)
      g.probe(q, w, ef = cs.length) == exact(cs, q, w)
    })
  }

  test("property: sparse-graph probe returns valid, distance-ordered ids") {
    check(Prop.forAll(gen) { case (cs, q, w) =>
      val got = new GraphCoarseSearch(cs).probe(q, w, ef = 8)
      got.nonEmpty && got.size <= w && got.distinct == got &&
        got.forall(i => i >= 0 && i < cs.length)
    })
  }

  test("greedy probing at small ef finds the nearest cell on clustered data") {
    // 3 tight clusters of centroids, query near one of them
    val cs = (0 until 24).map { i =>
      val base = Array(100.0 * (i % 3), 50.0 * (i % 3))
      Array(base(0) + i * 0.1, base(1) - i * 0.1)
    }.toArray
    val g = new GraphCoarseSearch(cs)
    val q = Array(200.0, 100.0) // near cluster base 2
    val got = g.probe(q, 1, ef = 4)
    assert(got == exact(cs, q, 1))
  }

  test("deterministic: repeated probes identical") {
    val cs = (0 until 16).map(i => Array(i * 1.0, (i * 7 % 5) * 1.0)).toArray
    val g = new GraphCoarseSearch(cs)
    val q = Array(3.3, 2.2)
    val a = g.probe(q, 3)
    assert((1 to 10).forall(_ => new GraphCoarseSearch(cs).probe(q, 3) == a))
  }
}
