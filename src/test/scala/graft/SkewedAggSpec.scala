package graft

import graft.ops.SkewedAgg
import graft.sources.Corpus

class SkewedAggSpec extends SparkSpec {

  test("salted posting-list assembly is salt-invariant and df-correct") {
    val docs = Corpus.docs(spark, sf0001).cache()
    val b16 = SkewedAgg.termPostingLists(docs, 16).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val b1 = SkewedAgg.termPostingLists(docs, 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val b64 = SkewedAgg.termPostingLists(docs, 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // bucket count must not change the result (deterministic merge)
    assert(b16.toSeq == b1.toSeq)
    assert(b16.toSeq == b64.toSeq)
    // df agrees with the dictionary query's df
    val dict = SparkEntry.queries("q_dictionary")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    b16.foreach { case (term, df, _) => assert(dict(term) == df, term) }
  }
}
