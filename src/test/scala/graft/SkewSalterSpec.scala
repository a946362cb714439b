package graft

import graft.extract.{ExtractKernel, Extractor}
import graft.pipeline.{SkewSalter, SpanChunker}
import graft.synth.SpanSynth
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The heavy-document chunked path must be extraction-equivalent to the
  * direct path: run-aligned chunking + concat + sentinel-drop == whole-doc
  * extraction, for any threshold (SURVEY.md §4.2, §7.4).
  */
class SkewSalterSpec extends AnyFunSuite with SparkSpec {

  // --- kernel-level property: chunked == whole, for all chunk targets ---
  private val word = Gen.oneOf("alpha", "beta", "", " ", "fi")
  private val text = Gen.listOf(word).map(_.mkString(" "))
  private val genSpan: Gen[(String, String, String)] = Gen.oneOf(
    text.map(t => ("text", t, null: String)),
    text.map(t => ("ocr", t, null: String)),
    Gen.zip(text, Gen.choose(0, 2), Gen.choose(0, 1))
      .map { case (t, p, x) => ("pdf", t, s"p$p:x${x * 300}:y0") },
    Gen.zip(text, Gen.choose(0, 1)).map { case (t, s) => ("text", t, s"sheet:S$s") },
    Gen.const(("image", null: String, "media://d/0")),
    Gen.const(("wingdings", "???", null: String)))

  private def mergeChunkOutputs(chunks: Seq[Seq[ExtractKernel.S]]): Seq[ExtractKernel.S] = {
    val flat = chunks.flatMap(c => ExtractKernel.extractDoc("d", c))
      .filterNot(_._1 == "error")
    val out = if (flat.isEmpty)
      Seq(("error", Extractor.SentinelPrefix + "d]", null))
    else flat.map { case (k, t, m, _) => (k, t, m) }
    out.zipWithIndex.map { case ((k, t, m), i) => (k, t, m, i) }
  }

  test("run-aligned chunk extraction == whole-doc extraction (property)") {
    (0 until 300).foreach { seed =>
      val doc = Gen.listOf(genSpan)
        .pureApply(Gen.Parameters.default.withSize(1 + seed % 50), Seed(seed.toLong))
        .zipWithIndex.map { case ((k, t, m), i) => (k, t, m, i) }
      (1 to 7).foreach { target =>
        val chunks = SpanChunker.chunk(doc, target)
        assert(chunks.flatten.sortBy(_._4) === doc.sortBy(_._4),
          s"chunking must partition the spans (seed=$seed target=$target)")
        assert(mergeChunkOutputs(chunks) === ExtractKernel.extractDoc("d", doc),
          s"seed=$seed target=$target")
      }
    }
  }

  test("runs are never split across chunks") {
    val doc = Seq[ExtractKernel.S](
      ("text", "a", "sheet:S0", 0), ("text", "b", "sheet:S0", 1),
      ("text", "c", "sheet:S1", 2), ("pdf", "d", "p0:x0:y0", 3),
      ("pdf", "e", "p0:x300:y0", 4))
    // sheet run = 3 spans, pdf run = 2; target 2 forces sheet run alone
    val chunks = SpanChunker.chunk(doc, 2)
    assert(chunks === Seq(doc.take(3), doc.drop(3)))
  }

  // --- Spark-level: SkewSalter path == direct path on synthesized docs ---
  test("SkewSalter.extract == Extractor.extract on synth docs (tiny threshold)") {
    val in = SpanSynth.docsInput(spark, "/root/testdata/sf0.001")
      .where(substring(col("doc_id"), 5, 8).cast("long") < 150)
      .withColumn("bucket", lit(7))
    def flat(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("bucket"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("bucket"), col("s.kind"), col("s.text"),
        col("s.media_ref"), col("s.offset"))
      .orderBy(col("doc_id"), col("offset")).collect().toSeq
    val direct = flat(Extractor.extract(in, Seq("bucket")))
    val salted = flat(SkewSalter.extract(in, heavyThreshold = 3, chunkTarget = 2))
    assert(salted === direct)
  }
}
