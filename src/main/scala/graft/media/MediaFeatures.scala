package graft.media

import graft.extract.Extractor
import graft.synth.SpanSynth
import graft.textops.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media spans are opaque references (at scale,
  * `binary` payloads or object-store URIs) flowing through a typed batch
  * decode stage. The Spark-side shape is real — schema, partition-parallel
  * `mapPartitions` batching, deterministic output — while the actual
  * image decode is STUBBED (no image libs in this container) with a
  * deterministic md5-derived fake, which keeps the stage DuckDB-oracle
  * verifiable end to end.
  *
  * Swapping in a real decoder = replacing [[decodeOne]]'s body; nothing
  * else moves.
  */
object MediaFeatures {

  case class MediaRef(doc_id: String, media_ref: String, offset: Int)
  case class MediaFeature(doc_id: String, media_ref: String, offset: Int,
      width: Int, height: Int, format: String, byte_size: Long)

  /** STUB decode: deterministic pseudo-metadata from the ref. A real
    * implementation would fetch + decode the payload here, one batch per
    * partition iterator (the mapPartitions shape amortizes decoder init,
    * exactly like an Arrow-batched Python UDF would).
    */
  def decodeOne(r: MediaRef): MediaFeature = {
    import PortableHash.hexint32
    val w = 64 + (hexint32(r.media_ref + "#w") % 1857L).toInt
    val h = 64 + (hexint32(r.media_ref + "#h") % 1017L).toInt
    val f = (hexint32(r.media_ref + "#f") % 3L) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    val bytes = 1024L + hexint32(r.media_ref + "#b") % 4194304L
    MediaFeature(r.doc_id, r.media_ref, r.offset, w, h, f, bytes)
  }

  /** Image spans of the EXTRACTED output → decoded features. */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val extracted = Extractor.extract(SpanSynth.docsInput(spark, sfDir))
    val refs = extracted
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.kind") === "image")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"),
        col("s.offset").as("offset"))
      .as[MediaRef]
    refs.mapPartitions(_.map(decodeOne))
      .toDF()
      .orderBy("doc_id", "offset")
  }
}
