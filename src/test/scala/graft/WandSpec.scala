package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.query.Wand
import graft.query.Wand.TermList

/** Property: WAND top-k == brute-force top-k under the final total order
  * (rounded score desc, docId asc) — the upgrade of the reference's
  * heap-vs-set test (/root/reference/test/search.jl:39) to rank-identity.
  */
class WandSpec extends AnyFunSuite {

  def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  /** Build a TermList from (doc, contrib) pairs with a given block size. */
  def mkList(postings: Seq[(Long, Double)], blockSize: Int): TermList = {
    val sorted = postings.sortBy(_._1)
    val docs = sorted.map(_._1).toArray
    val contribs = sorted.map(_._2).toArray
    val starts = docs.indices.by(blockSize).toArray
    val maxes = starts.map { s =>
      contribs.slice(s, math.min(s + blockSize, contribs.length)).max
    }
    new TermList(docs, contribs, starts, maxes)
  }

  val listsGen: Gen[(List[List[(Long, Double)]], Int, Int)] = for {
    nLists <- Gen.chooseNum(1, 5)
    k <- Gen.chooseNum(1, 12)
    blockSize <- Gen.oneOf(1, 2, 4, 16)
    lists <- Gen.listOfN(nLists, for {
      docs <- Gen.listOf(Gen.chooseNum(0L, 60L)).map(_.distinct.sorted)
      scores <- Gen.listOfN(docs.size,
        Gen.chooseNum(1, 40000).map(_ / 10000.0)) // 4-decimal-ish scores, many ties
    } yield docs.zip(scores))
  } yield (lists, k, blockSize)

  test("property: WAND == brute force (ids AND scores, rank order)") {
    check(Prop.forAll(listsGen) { case (lists, k, blockSize) =>
      // sanitize: shrinking can violate generator invariants (dup docs)
      val tls = lists.map(_.distinctBy(_._1)).filter(_.nonEmpty)
        .map(mkList(_, blockSize)).toArray
      val got = Wand.topK(tls, k).toList
      val exp = Wand.bruteForceTopK(tls, k).toList
      got == exp
    })
  }

  test("ties broken by docId asc, scores rounded HALF_UP") {
    val l = mkList(Seq(5L -> 1.00005, 3L -> 1.00005, 9L -> 1.5), 2)
    val got = Wand.topK(Array(l), 2).toList
    assert(got == List(Wand.Hit(9, 1.5), Wand.Hit(3, 1.0001)))
  }

  test("k larger than corpus returns everything ranked") {
    val l = mkList(Seq(1L -> 0.5, 2L -> 0.7), 128)
    val got = Wand.topK(Array(l), 10).toList
    assert(got == List(Wand.Hit(2, 0.7), Wand.Hit(1, 0.5)))
  }

  test("empty lists") {
    assert(Wand.topK(Array.empty, 5).isEmpty)
  }
}
