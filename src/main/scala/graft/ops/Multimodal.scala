package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The container has no image/audio codecs, so THE DECODE STEP IS A
  * DETERMINISTIC STUB (byte-histogram "features", fixed-stride "frame"
  * slicing) — clearly marked below. Everything around it is real Spark
  * plumbing: schema, binary payload handling, partitioning, typed
  * mapPartitions batch shape — swap `stubDecode` for a real codec and
  * the pipeline stands.
  *
  * Assets are derived deterministically from the documents corpus
  * (payload bytes = UTF-8 of repeated content sha — reproducible in the
  * DuckDB oracle at the metadata level).
  */
object Multimodal {

  final case class Asset(
      asset_id: Long,
      doc_id: Long,
      kind: String, // image | audio
      width: Int, // image metadata (0 for audio)
      sample_rate: Int, // audio metadata (0 for image)
      payload: Array[Byte])

  final case class AssetFeature(
      asset_id: Long,
      kind: String,
      n_bytes: Int,
      n_frames: Int,
      histogram: Array[Long], // 16-bin byte histogram — STUB "features"
      checksum: Long)

  /** Deterministic asset table: 2 assets per doc (image + audio);
    * payload = UTF-8 bytes of the content sha repeated 4x (128 bytes).
    */
  def assets(spark: SparkSession, sfDir: String): DataFrame =
    assetsFrom(graft.sources.Corpus.docs(spark, sfDir))

  /** [[assets]] over a caller-supplied docs frame — SparkEntry passes
    * its shared cached frame so the corpus derivation (dense-id keys
    * job + per-row sha) is not re-executed per asset query (r7).
    */
  def assetsFrom(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("content_sha"))
    val img = base.select(
      (col("doc_id") * 2).as("asset_id"),
      col("doc_id"),
      lit("image").as("kind"),
      (pmod(col("doc_id"), lit(4)) * 64 + 64).cast("int").as("width"),
      lit(0).as("sample_rate"),
      encode(repeat(col("content_sha"), 4), "UTF-8").as("payload"))
    val aud = base.select(
      (col("doc_id") * 2 + 1).as("asset_id"),
      col("doc_id"),
      lit("audio").as("kind"),
      lit(0).as("width"),
      (pmod(col("doc_id"), lit(3)) * 8000 + 16000).cast("int").as("sample_rate"),
      encode(repeat(col("content_sha"), 4), "UTF-8").as("payload"))
    img.unionAll(aud)
  }

  /** ======== STUB ========
    * Stand-in for a real image/audio decoder (no codec libs in this
    * container): 16-bin byte histogram + rolling checksum. Deterministic
    * pure function of the payload. Replace with a real decode and the
    * surrounding pipeline (schema, partitioning, batch shape) is
    * unchanged.
    */
  def stubDecode(payload: Array[Byte]): (Array[Long], Long) = {
    val hist = new Array[Long](16)
    var sum = 1L
    payload.foreach { b =>
      hist((b & 0xff) % 16) += 1
      sum = sum * 31 + (b & 0xff)
    }
    (hist, sum)
  }

  /** Fixed-stride "frame" sampling of the binary payload — the video
    * frame-sample analog (every `stride` bytes starts a frame of
    * `frameLen`).
    */
  def frameSample(payload: Array[Byte], frameLen: Int, stride: Int): Seq[Array[Byte]] =
    (0 until payload.length by stride)
      .map(off => payload.slice(off, math.min(off + frameLen, payload.length)))
      .filter(_.nonEmpty)

  /** Feature extraction over the asset table: typed mapPartitions in
    * decode-batch shape (one partition = one decode batch).
    */
  def extractFeatures(spark: SparkSession, assetsDf: DataFrame): DataFrame = {
    import spark.implicits._
    assetsDf
      .select("asset_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val (hist, checksum) = stubDecode(payload)
          val frames = frameSample(payload, 32, 16)
          AssetFeature(id, kind, payload.length, frames.size, hist, checksum)
        }
      }
      .toDF()
  }
}
