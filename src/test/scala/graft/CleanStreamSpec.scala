package graft

import graft.streaming.CleanStream
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming clean tail must reproduce the batch repair capstone
  * EXACTLY when the plan is derived from the same input (every global
  * statistic is planned offline, so there is no first-arrival keeper
  * drift to tolerate), and keep applying the static plan unchanged to
  * files arriving in later runs.
  */
class CleanStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-sclean").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_paras", "n_dropped", "clean_text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_paras"),
        r.getAs[Long]("n_dropped"), r.getAs[String]("clean_text"))).toSet

  test("streamed clean tail equals the batch capstone under the same plan") {
    val root = tmp()
    val in = s"$root/in/documents.parquet"
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val base = TextAnalysis.loadDocs(spark, sf)
    // re-id'd copies (higher ids, same text) so cross-doc duplicate lines
    // exist beyond the planted footer; include a null-text poison row —
    // the source filter must drop it, not wedge the stream
    import spark.implicits._
    val dups = base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("source"), col("text"))
    val nulls = Seq((999999L, "web", null: String)).toDF("doc_id", "source", "text")
    base.select("doc_id", "source", "text").unionByName(dups).unionByName(nulls)
      .repartition(4).write.mode("append").parquet(in)

    // offline planning over the stream's own input dir — the deployment
    // recipe, derived from the same audited batch definitions
    val (phs, keepers) = CleanStream.planArrays(
      TextAnalysis.cleanPlanDupLines(spark, s"$root/in"))
    assert(phs.nonEmpty, "fixture must plan duplicate lines")
    assert(phs.toSeq === phs.toSeq.sorted)

    val q = CleanStream.start(spark, in, out, ckpt, phs, keepers,
      availableNow = true)
    q.awaitTermination()
    val streamed = collectRows(spark.read.parquet(out))
    val batch = collectRows(TextAnalysis.cleanPipeline(spark, s"$root/in"))
    assert(batch.nonEmpty)
    assert(streamed === batch) // EXACT parity — the plan carries all globals
    // the planted footer survives in exactly one page
    val withFooter = streamed.toSeq.filter(_._4.contains(TextAnalysis.C4FooterLine))
    assert(withFooter.size === 1, s"footer pages: ${withFooter.map(_._1)}")
  }

  test("a later run applies the static plan to new files unchanged") {
    val root = tmp()
    val in = s"$root/in/documents.parquet"
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val base = TextAnalysis.loadDocs(spark, sf)
    base.select("doc_id", "source", "text").repartition(4)
      .write.mode("append").parquet(in)
    val (phs, keepers) = CleanStream.planArrays(
      TextAnalysis.cleanPlanDupLines(spark, s"$root/in"))
    CleanStream.start(spark, in, out, ckpt, phs, keepers, availableNow = true)
      .awaitTermination()
    val firstIds = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).toSet

    // a NEW doc in a later file: 700007 % 7 == 0 plants the footer, whose
    // hash is in the STATIC plan with an original keeper — the line must
    // be dropped even though this doc was never seen at plan time
    import spark.implicits._
    val words = (1 to 42).map(i => s"fresh$i").mkString(" ")
    Seq((700007L, "web", words)).toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(in)
    CleanStream.start(spark, in, out, ckpt, phs, keepers, availableNow = true)
      .awaitTermination()

    val rows = spark.read.parquet(out).where(col("doc_id") === 700007L).collect()
    assert(rows.length === 1, "the new doc must be processed exactly once")
    val r = rows(0)
    assert(!r.getAs[String]("clean_text").contains(TextAnalysis.C4FooterLine),
      "static plan must strip the footer from the new doc")
    assert(r.getAs[Long]("n_dropped") >= 1L)
    // earlier files are not reprocessed (source commit log)
    val allIds = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0))
    assert(allIds.length === firstIds.size + 1)
  }
}
