package graft.serve

import graft.extract.Extractor
import graft.synth.SpanSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's relational serving surface re-expressed over the
  * extracted output table (SURVEY.md §2.6). Status is derived from content
  * (stage completion IS the status — SURVEY.md §3.4), replacing the
  * per-row state machine (reference models.py:8-13).
  */
object Queries {

  /** Per-doc status row: doc class, span/image/error counts, chars. */
  def docStatus(spark: SparkSession, sfDir: String): DataFrame = {
    val out = Extractor.extract(SpanSynth.docsInput(spark, sfDir))
    out.select(
      col("doc_id"),
      pmod(substring(col("doc_id"), 5, 8).cast("long"), lit(5L)).as("cls"),
      size(col("spans")).as("n_spans"),
      size(filter(col("spans"), s => s.getField("kind") === "image")).as("n_images"),
      size(filter(col("spans"), s => s.getField("kind") === "error")).as("n_errors"),
      aggregate(col("spans"), lit(0L),
        (acc, s) => acc + coalesce(length(s.getField("text")), lit(0))).as("text_chars"))
  }

  /** Q1 — queue scan + sort (reference main.py:339-382): every doc with a
    * derived status, deterministically ordered. At scale this is a
    * range-partitioned sort on the serving table, pruned by any pushed
    * predicate.
    */
  def queue(spark: SparkSession, sfDir: String): DataFrame =
    docStatus(spark, sfDir)
      .withColumn("status",
        when(col("n_errors") > 0, lit("ERROR")).otherwise(lit("COMPLETED")))
      .orderBy(col("doc_id"))

  /** Q2 — point lookup (reference main.py:397-496): status-dependent
    * projection for one document. The filter pushes down to the bucket
    * partition + row group.
    */
  def lookup(spark: SparkSession, sfDir: String, docId: String): DataFrame = {
    val out = Extractor.extract(SpanSynth.docsInput(spark, sfDir))
      .where(col("doc_id") === docId)
    out.select(
      col("doc_id"),
      size(col("spans")).as("n_spans"),
      // COMPLETED-but-empty consistency rule (reference main.py:433-447)
      when(size(filter(col("spans"), s => s.getField("kind") === "error")) > 0,
        lit("ERROR")).otherwise(lit("COMPLETED")).as("status"),
      array_join(transform(
        filter(col("spans"), s => s.getField("kind") === "text"),
        s => s.getField("text")), "\n").as("extracted_text"))
  }

  /** Per-class aggregate metrics over the extracted output — the VERBOSE
    * counter logs (reference utils.py:62,111,153,197) as one hash
    * aggregate. Partial aggregation (map-side combine) keeps the shuffle
    * at numClasses rows per task.
    */
  def metricsByClass(spark: SparkSession, sfDir: String): DataFrame =
    docStatus(spark, sfDir)
      .groupBy("cls")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_spans").as("n_spans"),
        sum("n_images").as("n_images"),
        sum("n_errors").as("n_errors"),
        sum("text_chars").as("text_chars"))
      .orderBy("cls")

  /** Dead-letter scan (replaces the reference's job-killing ValueError,
    * utils.py:226-228): every unknown-kind input span, with position.
    */
  def deadLetters(spark: SparkSession, sfDir: String): DataFrame =
    SpanSynth.flatSpans(spark, sfDir)
      .where(!col("kind").isin(graft.model.Schemas.knownKinds: _*))
      .select(col("doc_id"), col("kind"), col("offset"))
      .orderBy(col("doc_id"), col("offset"))
}
