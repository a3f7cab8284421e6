package graft

import org.apache.spark.sql.functions._

import graft.sources.Corpus
import graft.tokenize.Tokenizer

class CorpusSpec extends SparkSpec {

  test("tokenizer: pure Scala and Column forms agree") {
    import spark.implicits._
    val samples = Seq(
      "the Fast KEY_order; sort(table)//scan",
      "",
      "  ",
      "a",
      "x1_y2 x1_y2,x1_y2",
      "ünïcode stays-out 123_abc")
    val viaCol = samples.toDF("c")
      .select(Tokenizer.tokensCol(col("c")).as("t"))
      .collect()
      .map(_.getSeq[String](0).toList)
    val viaScala = samples.map(Tokenizer.tokenize(_).toList)
    assert(viaCol.toList == viaScala.toList)
  }

  test("property: fast char-scan tokenizer == regex reference tokenizer") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val asciiGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '_', '.', '(', ')', ';', '\n', '\t', '-', '+'),
      1 -> Gen.choose(0.toChar, 127.toChar),
      1 -> Gen.choose(128.toChar, 0x2000.toChar) // non-ASCII → fallback
    )).map(_.mkString)
    val prop = Prop.forAll(asciiGen) { s =>
      Tokenizer.tokenize(s).toList == Tokenizer.tokenizeRegex(s).toList &&
        Tokenizer.countTokens(s) == Tokenizer.tokenizeRegex(s).length
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: TokenCountExpr == pure countTokens; stays in codegen") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '_', '.', ';', '\n'),
      1 -> Gen.choose(128.toChar, 0x3000.toChar))).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(20, strGen)) { strs =>
      val got = strs.toDF("c")
        .select(graft.functions.TokenCountExpr.tokenCount(col("c")))
        .collect().map(_.getInt(0)).toList
      got == strs.map(Tokenizer.countTokens)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
    // whole-stage codegen over a real scan, no ScalaUDF in the plan.
    // The fixture reader's repartition wraps the plan in AQE, whose
    // codegen markers only appear once the final plan is materialized —
    // run the query first.
    val q = Corpus.documents(spark, sf0001)
      .select(graft.functions.TokenCountExpr.tokenCount(col("text")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" prefixes are the whole-stage-codegen markers
    assert("""\*\(\d+\) Project \[tokencountexpr""".r
      .findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("UDF"), plan)
  }

  test("dense docIDs are 0..n-1 with no gaps, ordered by (repo,path,commit)") {
    val d = Corpus.docs(spark, sf0001).cache()
    val n = d.count()
    val ids = d.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(ids.toSeq == (0L until n))
    // id order == key order
    val byKey = d.orderBy("repo", "path", "commit")
      .select("doc_id").collect().map(_.getLong(0))
    assert(byKey.toSeq == (0L until n))
    d.unpersist()
  }

  test("per-row content sha256 invariant vs source documents (input_hint)") {
    val docs = Corpus.documents(spark, sf0001)
      .select(sha2(col("text"), 256).as("sha"))
    val ours = Corpus.docs(spark, sf0001).select(col("content_sha").as("sha"))
    assert(ours.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(ours).count() == 0)
  }

  test("doc_len equals pure-tokenizer length") {
    val rows = Corpus.docs(spark, sf0001)
      .select("content", "doc_len").collect()
    rows.foreach { r =>
      assert(r.getInt(1) == Tokenizer.tokenize(r.getString(0)).length)
    }
  }
}
