package graft.serve

import graft.textops.PortableHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q8 — the reference's one genuine relational pipeline over a model
  * catalog (reference utils.py:583-690): **filter** rows whose
  * supportedGenerationMethods contain 'generateContent' (:604-606),
  * **project** the name minus its 'models/' prefix and the first sentence
  * of the description (:602-616), **sort** by a boolean preference tuple
  * (has '2.5', '2.0', '1.5', 'flash') descending (:619-624).
  *
  * The catalog itself is synthesized deterministically from the documents
  * table (no external service in-sandbox): one model per doc_id < NumModels,
  * version token picked by the portable hash, generation methods cycling
  * with doc_id — so the DuckDB oracle reproduces the same rows and the
  * filter-project-sort semantics are what gets verified.
  */
object Catalog {

  val NumModels = 30

  /** Version tokens carry the markers the preference sort keys on. No '.'
    * outside the version digits would break first-sentence extraction, so
    * descriptions keep tokens out of sentence one.
    */
  val VersionTokens: IndexedSeq[String] = IndexedSeq(
    "2.5-flash", "2.5-pro", "2.0-flash", "2.0-flash-lite",
    "1.5-pro", "1.5-flash", "1.0-pro")

  private def versionOf(did: Column): Column =
    element_at(typedLit(VersionTokens),
      (PortableHash.hexint32(concat(lit("model-"), did.cast("string")))
        % VersionTokens.size).cast("int") + 1)

  /** The synthesized catalog: (name, description, methods). */
  def models(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < NumModels)
    val did = d("doc_id")
    val v = versionOf(did)
    val emptyArr = array().cast("array<string>")
    d.select(
      concat(lit("models/"), d("source"), lit("-"), v).as("name"),
      concat(lit("Serves "), d("lang"), lit(" corpora from "), d("source"),
        lit(" with seed "), did.cast("string"),
        lit(". Suited for extraction pipelines. Snapshot v"), v).as("description"),
      concat(
        array(lit("countTokens")),
        when(did % 3 =!= 0, array(lit("generateContent"))).otherwise(emptyArr),
        when(did % 4 === 0, array(lit("embedContent"))).otherwise(emptyArr)).as("methods"))
  }

  /** The filter-project-sort pipeline (see object scaladoc). Output keeps
    * the preference flags so the sort is externally checkable.
    */
  def generateContentModels(spark: SparkSession, sfDir: String): DataFrame =
    models(spark, sfDir)
      .where(array_contains(col("methods"), "generateContent"))
      .select(
        regexp_replace(col("name"), "^models/", "").as("model"),
        element_at(split(col("description"), "\\."), 1).as("summary"))
      .withColumn("pref_25", col("model").contains("2.5"))
      .withColumn("pref_20", col("model").contains("2.0"))
      .withColumn("pref_15", col("model").contains("1.5"))
      .withColumn("pref_flash", col("model").contains("flash"))
      .orderBy(desc("pref_25"), desc("pref_20"), desc("pref_15"),
        desc("pref_flash"), col("model"), col("summary"))
}
