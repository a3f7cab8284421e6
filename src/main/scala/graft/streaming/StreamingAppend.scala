package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.maintain.Maintenance

/** Structured Streaming ingestion: F1-shaped files landing in a
  * directory become index mini-segments, one per micro-batch, via
  * foreachBatch → Maintenance.append.
  *
  * The reference has no streaming at all; its `push!`-as-FIFO usage
  * (/root/reference/docs/src/examples.md:85-92) is the closest analog —
  * the graft expresses it as micro-batch segment appends (SURVEY.md
  * §2.5): each batch gets insertion-order docIDs continuing from the
  * current num_docs, exactly `push!`'s id semantics.
  *
  * foreachBatch is AT-LEAST-once: a crash between a completed append
  * and the checkpoint commit replays the batch. The sink is made
  * idempotent by recording the last applied batchId in a sidecar file
  * inside the index dir and skipping batchId <= lastApplied on replay
  * [ADVICE r1] — together with the stream checkpoint this yields
  * effective exactly-once indexing.
  */
object StreamingAppend {

  private def appliedPath(indexDir: String) =
    java.nio.file.Paths.get(indexDir, "stream_last_batch.json")

  /** Last batchId applied to this index (−1 if none). */
  def lastAppliedBatch(indexDir: String): Long = {
    val p = appliedPath(indexDir)
    if (!java.nio.file.Files.exists(p)) -1L
    else new String(java.nio.file.Files.readAllBytes(p)).trim.toLong
  }

  private def recordApplied(indexDir: String, batchId: Long): Unit = {
    val tmp = java.nio.file.Paths.get(
      appliedPath(indexDir).toString + ".tmp")
    java.nio.file.Files.write(tmp, batchId.toString.getBytes)
    java.nio.file.Files.move(tmp, appliedPath(indexDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Idempotent micro-batch application; returns true iff the batch was
    * newly indexed (false = replay skipped).
    */
  def applyBatch(indexDir: String, batch: DataFrame, batchId: Long): Boolean =
    if (batchId <= lastAppliedBatch(indexDir)) {
      System.err.println(
        s"[stream] batch $batchId already applied - skipping replay")
      false
    } else {
      if (!batch.isEmpty)
        Maintenance.append(batch.sparkSession, indexDir, batch)
      recordApplied(indexDir, batchId)
      System.err.println(s"[stream] batch $batchId applied")
      !batch.isEmpty
    }

  /** The input_hint table shape. */
  val sourceSchema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("content", StringType)))

  /** Starts the ingestion stream; caller stops it (or uses
    * processAllAvailable in tests). Batches are appended sequentially —
    * foreachBatch runs on the driver, and append itself launches the
    * distributed jobs.
    */
  def start(
      spark: SparkSession,
      watchDir: String,
      indexDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(sourceSchema)
      .parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(indexDir, batch, batchId); ()
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
