package graft

import java.nio.file.Files

import graft.build.{IndexBuilder, ManifestIO}
import graft.query.IndexSearcher
import graft.streaming.StreamingAppend

class StreamingAppendSpec extends SparkSpec {

  test("directory stream appends mini-segments; new docs become searchable") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft-stream-idx").toString
    IndexBuilder.build(spark, sf0001, indexDir,
      IndexBuilder.BuildConfig(resume = false))
    val n0 = ManifestIO.read(s"$indexDir/manifest.json").num_docs

    val watch = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    def land(name: String, rows: Seq[(String, String, String, String, String)]): Unit = {
      // the file stream source watches top-level FILES: stage the batch
      // then move its part file into the watch dir
      val tmp = Files.createTempDirectory("graft-stream-stage").toString
      rows.toDF("repo", "path", "commit", "lang", "content")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(watch, s"$name.parquet"))
    }

    val q = StreamingAppend.start(spark, watch, indexDir, ckpt)
    try {
      land("b1",
        Seq(("repo-s", "src/s/a.c", "aaaa00000001", "c", "xylophone quartz melody")))
      q.processAllAvailable()
      land("b2",
        Seq(("repo-s", "src/s/b.c", "aaaa00000002", "c", "quartz melody xylophone quartz")))
      q.processAllAvailable()
    } finally q.stop()

    val m = ManifestIO.read(s"$indexDir/manifest.json")
    assert(m.num_docs == n0 + 2)
    val hits = IndexSearcher.topK(spark, indexDir, Seq(1 -> Seq("quartz")), 5)
      .collect()
    assert(hits.map(_.getLong(2)).toSet == Set(n0, n0 + 1))
    // higher tf ranks first: batch-2 doc has quartz tf=2
    assert(hits.head.getLong(2) == n0 + 1)
  }
}
