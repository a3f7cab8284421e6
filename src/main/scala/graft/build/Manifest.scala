package graft.build

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.model.PartitionMeta

/** Per-segment build lineage + metrics (a "segment" = one range-partition
  * build task; it may span cluster boundaries).
  */
case class SegmentMeta(
    segment_id: Int,
    num_postings: Long,
    num_blocks: Long,
    bytes: Long,
    build_millis: Long,
    postings_per_sec: Double,
    bytes_per_posting: Double)

/** Input lineage recorded in the manifest (north_rule: per-partition
  * lineage; resume checks input identity before skipping steps).
  */
case class InputLineage(
    source_dir: String,
    num_source_rows: Long)

/** The index manifest — the graft analog of the reference's persisted
  * header + centroids (/root/reference/src/persistency.jl:22-41): all
  * global stats, BM25 params, the coarse-quantizer centroids, and
  * per-partition/per-segment lineage + metrics. Parquet segments +
  * this JSON manifest emulate an Iceberg snapshot (no Iceberg jar in
  * /opt/spark/jars — documented in SURVEY.md §7.0).
  */
case class IndexManifest(
    version: Int,
    num_docs: Long,
    avgdl: Double,
    vocab_size: Long,
    kc: Int,
    feature_dim: Int,
    k1: Double,
    b: Double,
    round_scale: Int,
    centroids: Array[Array[Double]],
    lineage: InputLineage,
    partitions: Seq[PartitionMeta],
    segments: Seq[SegmentMeta])

object ManifestIO {
  private val mapper = new ObjectMapper()
  mapper.registerModule(DefaultScalaModule)
  mapper.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def write(path: String, m: IndexManifest): Unit = {
    val tmp = Paths.get(path + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(m))
    Files.move(tmp, Paths.get(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(path: String): IndexManifest =
    mapper.readValue(
      new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8),
      classOf[IndexManifest])

  def exists(path: String): Boolean = Files.exists(Paths.get(path))
}
