package graft.tools
import org.apache.spark.sql.SparkSession

/** Dumps the executed ngram plan's exchange/reuse structure — diagnostic. */
object NgramPlan {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("nplan")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Corpus.docs(s, "/root/testdata/sf0.1")
    val q = graft.ops.Dedup.ngramJaccardNearDups(docs, 0.5)
    q.count() // materialize so AQE finalizes
    val plan = q.queryExecution.executedPlan.toString
    System.err.println("[nplan] Exchange count: " +
      "Exchange".r.findAllIn(plan).length)
    System.err.println("[nplan] ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(plan).length)
    System.err.println("[nplan] BroadcastHashJoin count: " +
      "BroadcastHashJoin".r.findAllIn(plan).length)
    System.err.println("[nplan] SortMergeJoin count: " +
      "SortMergeJoin".r.findAllIn(plan).length)
    System.err.println("[nplan] AQEShuffleRead: " +
      "AQEShuffleRead".r.findAllIn(plan).length)
    plan.linesIterator.filter(l => l.contains("Exchange") ||
      l.contains("Join") || l.contains("Window") ||
      l.contains("HashAggregate") && l.contains("keys=[doc"))
      .take(40).foreach(l => System.err.println("[nplan] " + l.take(160)))
    s.stop()
  }
}
