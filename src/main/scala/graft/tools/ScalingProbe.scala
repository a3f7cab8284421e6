package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Diagnostic main: isolates the scaling behavior of the tokenize+agg
  * stage (the dictionary step's core) at several thread counts.
  * Not part of the engine; used to calibrate bench parallelism levels.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "256").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32")
      .split(",").map(_.trim.toInt)

    // stage input once
    val prep = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    prep.sparkContext.setLogLevel("WARN")
    val tmp = "/tmp/graft-probe-docs"
    graft.sources.Corpus.docs(prep, sfDir, amplify)
      .select("doc_id", "content")
      .write.mode("overwrite").parquet(tmp)
    prep.stop()

    levels.foreach { n =>
      val s = SparkSession.builder().master(s"local[$n]")
        .appName(s"probe-$n")
        .config("spark.sql.shuffle.partitions", n.toString)
        .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            stages.add(
              f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d " +
                f"wall=${(si.completionTime.get - si.submissionTime.get) / 1e3}%6.2fs " +
                f"cpuSum=${si.taskMetrics.executorCpuTime / 1e9}%7.2fs " +
                f"runSum=${si.taskMetrics.executorRunTime / 1e3}%7.2fs " +
                f"gc=${si.taskMetrics.jvmGCTime / 1e3}%5.1fs " +
                si.name.takeWhile(_ != '\n').take(40))
          }
        })
      val mode = sys.env.getOrElse("SPARK_GRAFT_PROBE", "dict")
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val cnt = mode match {
          case "sha" =>
            // pure CPU per row, no explode/agg: does the stage scale?
            s.read.parquet(tmp)
              .select(sha2(col("content"), 256).as("h"))
              .filter(col("h") > "f")
              .count()
          case "shaheavy" =>
            s.read.parquet(tmp)
              .select(sha2(concat_ws("", Seq.fill(8)(col("content")): _*), 256).as("h"))
              .filter(col("h") > "f")
              .count()
          case "tok" =>
            // char-scan token count, minimal allocation
            import s.implicits._
            s.read.parquet(tmp).select("content").as[String]
              .mapPartitions { it =>
                var tokens = 0L
                it.foreach { c =>
                  var i = 0
                  val len = c.length
                  var inTok = false
                  while (i < len) {
                    val ch = c.charAt(i)
                    val isT = (ch >= 'a' && ch <= 'z') ||
                      (ch >= 'A' && ch <= 'Z') ||
                      (ch >= '0' && ch <= '9') || ch == '_'
                    if (isT && !inTok) { tokens += 1; inTok = true }
                    else if (!isT) inTok = false
                    i += 1
                  }
                }
                Iterator.single(tokens)
              }.reduce(_ + _)
          case "dict2" =>
            // typed per-partition tf maps, tiny shuffle
            import s.implicits._
            s.read.parquet(tmp).select("content").as[String]
              .mapPartitions { it =>
                val m = new java.util.HashMap[String, Long]()
                it.foreach { c =>
                  graft.tokenize.Tokenizer.tokenize(c).foreach { t =>
                    m.merge(t, 1L, (a, b) => a + b)
                  }
                }
                import scala.jdk.CollectionConverters._
                m.asScala.iterator.map { case (t, n) => (t, n) }
              }
              .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
              .count()
          case "build" =>
            val dir = java.nio.file.Files
              .createTempDirectory(s"graft-probe-build-$n").toString
            val res = graft.build.IndexBuilder.build(s, sfDir, dir,
              graft.build.IndexBuilder.BuildConfig(
                resume = false, amplify = amplify))
            res.manifest.num_docs
          case _ =>
            s.read.parquet(tmp)
              .select(col("doc_id"),
                explode(Tokenizer.tokensCol(col("content"))).as("term"))
              .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
              .groupBy("term").agg(count(lit(1)).as("df"))
              .count()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[probe] local[$n%2d] rep$rep $mode $secs%6.2fs (rows=$cnt)")
        if (rep == 2) {
          stages.forEach(l => println(s"[probe]   $l"))
        }
        stages.clear()
      }
      s.stop()
    }
  }
}
