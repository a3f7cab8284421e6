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
  * current num_docs, exactly `push!`'s id semantics, with exactly-once
  * source tracking from the stream checkpoint.
  */
object StreamingAppend {

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
        if (!batch.isEmpty) {
          Maintenance.append(batch.sparkSession, indexDir, batch)
          System.err.println(
            s"[stream] batch $batchId appended ${batch.count()} docs")
        }
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
