package graft.build

/** Introspection over a built index — the X1/X2/X3 graft
  * (`length`/`size`/`show`, /root/reference/src/index.jl:56-77): all
  * answers come from the manifest, no Spark job.
  */
object IndexInfo {

  /** X1: total indexed documents. */
  def numDocs(indexDir: String): Long =
    ManifestIO.read(s"$indexDir/manifest.json").num_docs

  /** X2: (vocabulary size, number of documents). */
  def size(indexDir: String): (Long, Long) = {
    val m = ManifestIO.read(s"$indexDir/manifest.json")
    (m.vocab_size, m.num_docs)
  }

  /** X3: human summary incl. bytes/posting — the analog of the
    * reference's `show` with its bytes-per-vector line
    * (/root/reference/src/index.jl:74).
    */
  def describe(indexDir: String): String = {
    val m = ManifestIO.read(s"$indexDir/manifest.json")
    val postings = m.partitions.map(_.num_postings).sum
    val bytes = m.partitions.map(_.bytes).sum
    val bpp = if (postings > 0) bytes.toDouble / postings else 0.0
    f"""GraftIndex[$indexDir]
       |  docs=${m.num_docs} vocab=${m.vocab_size} avgdl=${m.avgdl}%.2f
       |  kc=${m.kc} partitions=${m.partitions.size} segments=${m.segments.size}
       |  postings=$postings blocks=${m.partitions.map(_.num_blocks).sum}
       |  payload=$bytes B ($bpp%.2f B/posting)
       |  bm25(k1=${m.k1}, b=${m.b}) roundScale=${m.round_scale}""".stripMargin
  }
}
