package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload: binary content + typed metadata. The binary
  * column is the multimodal contract — image/audio/video travel through
  * the pipeline as bytes plus metadata, exactly like a real lakehouse
  * media table; here the bytes are UTF-8 document text standing in for an
  * encoded frame (no media testdata ships with the environment).
  */
final case class MediaBlob(doc_id: Long, media_type: String, src: String, content: Array[Byte])

/** Deterministic features the decode stage emits per blob. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    checksum: Long,
    fake_width: Int,
    fake_height: Int,
    head_hex: String)

/** Multimodal-column plumbing (north star): treat media as opaque binary
  * columns with typed metadata, and run decode / feature-extract as a
  * partition-batched typed transformation.
  *
  * The decode step is a clearly-marked STUB (the container has no
  * image/audio codecs): it produces deterministic fake features derived
  * only from the bytes. Everything around it — the binary schema, the
  * Encoder-backed Dataset, the per-partition batch iteration (the Scala
  * analogue of a pandas-batch UDF), the metadata-partitioned layout — is
  * the real Spark plumbing a production decoder would drop into.
  *
  * Scale notes: mapPartitions keeps the decoder call amortized per batch
  * (codec init once per partition, not per row); repartitioning by
  * media_type groups same-codec payloads so a real decoder's state stays
  * hot; nothing is collected to the driver.
  */
object MultimodalQueries extends QueryPack {

  /** STUB decode: a real implementation would decode image/audio bytes
    * here (e.g. JPEG → pixels → resize). The fake is deterministic so
    * tests can assert exact values end-to-end.
    */
  private[queries] def decodeStub(b: MediaBlob): MediaFeatures = {
    val checksum = b.content.foldLeft(0L)((h, c) => (h * 31 + (c & 0xff)) % 1000000007L)
    val headHex = b.content.take(8).map(c => f"${c & 0xff}%02x").mkString
    MediaFeatures(
      doc_id = b.doc_id,
      media_type = b.media_type,
      byte_len = b.content.length.toLong,
      checksum = checksum,
      // fake "decoded dimensions", derived deterministically from content
      fake_width = (16 + (checksum % 64L) * 4L).toInt,
      fake_height = (16 + ((checksum / 64L) % 64L) * 4L).toInt,
      head_hex = headHex)
  }

  /** documents → media table: binary payload + typed metadata columns. */
  private[queries] def blobs(s: SparkSession, dir: String): Dataset[MediaBlob] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        // deterministic round-robin "codec" tag — the metadata axis a real
        // pipeline partitions decode work by
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("source").as("src"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaBlob]
  }

  override def queries: Seq[Q] = Seq(
    // feature extraction over the binary column, batched per partition.
    Q.noOracle("q_multimodal_features") { (s, dir) =>
      import s.implicits._
      blobs(s, dir)
        .repartition(col("media_type")) // same-codec payloads co-located
        .mapPartitions(_.map(decodeStub)) // batch boundary = partition
        .toDF()
        .orderBy("doc_id")
    },
  )
}
