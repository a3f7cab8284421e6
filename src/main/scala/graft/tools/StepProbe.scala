package graft.tools
import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap
object StepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    Seq(4, 1, 4).foreach { n =>
      val s = SparkSession.builder().master(s"local[$n]")
        .appName(s"probe-$n")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", (256*1024).toString)
        .config("spark.sql.files.openCostInBytes", (64*1024).toString)
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), s"probe-$n").toString
      val t0 = System.nanoTime()
      val jobStart = new ConcurrentHashMap[Int, Double]()
      val jobRun = new ConcurrentHashMap[Int, Long]()
      val stageToJob = new ConcurrentHashMap[Int, Int]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStart.put(js.jobId, (System.nanoTime()-t0)/1e9)
          js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
        }
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val j = stageToJob.getOrDefault(te.stageId, -1)
          if (te.taskMetrics != null) jobRun.merge(j, te.taskMetrics.executorRunTime, _ + _)
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStart.getOrDefault(je.jobId, 0.0)
          val now = (System.nanoTime()-t0)/1e9
          val run = jobRun.getOrDefault(je.jobId, 0L)/1000.0
          System.err.println(f"[probe-$n] job ${je.jobId}%2d wall=${now-st}%5.2fs (at $st%5.2f..$now%5.2f) taskRun=$run%6.2f")
        }
      }
      s.sparkContext.addSparkListener(listener)
      val r = graft.build.IndexBuilder.build(s, sfDir, dir,
        graft.build.IndexBuilder.BuildConfig(resume = false, amplify = 52))
      val wall = (System.nanoTime()-t0)/1e9
      System.err.println(f"[probe-$n] total=$wall%.2fs fps=${r.filesPerSec}%.0f")
      s.stop()
    }
  }
}
