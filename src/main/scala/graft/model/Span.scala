package graft.model

import org.apache.spark.sql.types._

/** The interleaved-span data model (SURVEY.md §1.4, BASELINE.json input_hint).
  *
  * Input table: `(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`
  * where kind ∈ {"text","pdf","ocr","html","image"} on input and
  * {"text","image","error"} on extracted output. `offset` is the 0-based
  * position of the span in the document's sequence.
  *
  * Mirrors the reference's single flattened `extracted_text` column
  * (reference models.py:35) re-structured as an ordered span sequence.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

case class Doc(doc_id: String, spans: Seq[Span])

object Schemas {
  val span: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("media_ref", StringType, nullable = true),
    StructField("offset", IntegerType, nullable = false)
  ))

  val doc: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(span, containsNull = false), nullable = false)
  ))

  /** Input span kinds routed by the dispatch operator (reference utils.py:208-233). */
  val knownKinds: Seq[String] = Seq("text", "pdf", "ocr", "html", "image")
}
