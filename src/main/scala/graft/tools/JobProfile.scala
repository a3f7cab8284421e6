package graft.tools
import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap
object JobProfile {
  def main(args: Array[String]): Unit = {
    sys.env.getOrElse("GRAFT_JP_LEVELS", "4,1").split(",").map(_.trim.toInt)
      .toSeq.foreach { n =>
      val s = SparkSession.builder().master(s"local[$n]").appName(s"jp-$n")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", (256*1024).toString)
        .config("spark.sql.files.openCostInBytes", (64*1024).toString)
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      val jobStart = new ConcurrentHashMap[Int, Double]()
      val stageToJob = new ConcurrentHashMap[Int, Int]()
      val jobRun = new ConcurrentHashMap[Int, Long]()
      val jobTasks = new ConcurrentHashMap[Int, Int]()
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStart.put(js.jobId, (System.nanoTime()-t0)/1e9)
          js.stageIds.foreach(st => stageToJob.put(st, js.jobId))
        }
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val j = stageToJob.getOrDefault(te.stageId, -1)
          if (te.taskMetrics != null) { jobRun.merge(j, te.taskMetrics.executorRunTime, _ + _); jobTasks.merge(j, 1, _ + _) }
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStart.getOrDefault(je.jobId, 0.0)
          val now = (System.nanoTime()-t0)/1e9
          System.err.println(f"[jp-$n] job ${je.jobId}%2d wall=${now-st}%5.2f (${st}%6.2f..${now}%6.2f) run=${jobRun.getOrDefault(je.jobId,0L)/1000.0}%6.2f tasks=${jobTasks.getOrDefault(je.jobId,0)}")
        }
      })
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), s"jp-$n").toString
      graft.build.IndexBuilder.build(s, "/root/testdata/sf0.1", dir,
        graft.build.IndexBuilder.BuildConfig(resume = false, amplify = 104,
          postingsBatches = 1))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      s.stop()
    }
  }
}
