package graft

import graft.extract.Extractor
import graft.llm.LlmStage
import graft.streaming.LlmStream
import graft.synth.SpanSynth
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming P2/P3 == the batch pipelineQuery over the same docs, resumes
  * drain only new files, and transport failures surface as dead-letter
  * ROWS in the sink (not stream crashes).
  */
class LlmStreamSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-llmstream").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  test("streamed LLM stage matches the batch chain; resume drains only new files") {
    val root = tmp()
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val docs = SpanSynth.docsInput(spark, "/root/testdata/sf0.001")
      .where(substring(col("doc_id"), 5, 8).cast("long") < 120).cache()
    val batch1 = docs.where(substring(col("doc_id"), 5, 8).cast("long") < 60)
    val batch2 = docs.where(substring(col("doc_id"), 5, 8).cast("long") >= 60)

    // extracted files arrive; stream the LLM stage over them
    Extractor.extract(batch1).write.mode("append").parquet(in)
    // transport pinned explicitly: the default is env-gated
    // (GRAFT_LLM_TRANSPORT) and a test must not inherit ambient config
    LlmStream.start(spark, in, out, ckpt,
      transport = LlmStage.EchoTransport(),
      backoffMs = _ => 0L, availableNow = true).awaitTermination()

    def sinkRows() = spark.read.parquet(out)
      .select("doc_id", "llm_response", "formatted_response", "llm_error")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).sortBy(_._1).toSeq
    def batchRows(d: org.apache.spark.sql.DataFrame) = {
      val prompts = Extractor.extract(d).select(
        col("doc_id"), LlmStage.promptFromSpans(col("spans")).as("full_prompt"))
      LlmStage.generate(prompts, LlmStage.DefaultModel, LlmStage.EchoTransport())
        .withColumn("formatted_response", LlmStage.formattedCol(col("llm_response")))
        .select("doc_id", "llm_response", "formatted_response", "llm_error")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3))).sortBy(_._1).toSeq
    }
    assert(sinkRows() === batchRows(batch1))
    assert(sinkRows().forall(_._4 == null)) // echo transport: no errors

    // new extracted files arrive; a fresh AvailableNow run drains ONLY them
    Extractor.extract(batch2).write.mode("append").parquet(in)
    LlmStream.start(spark, in, out, ckpt,
      transport = LlmStage.EchoTransport(),
      backoffMs = _ => 0L, availableNow = true).awaitTermination()
    assert(sinkRows() === batchRows(docs))
    docs.unpersist()
  }

  test("transport failures dead-letter into the sink; dead transport fails the start") {
    val root = tmp()
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val docs = SpanSynth.docsInput(spark, "/root/testdata/sf0.001")
      .where(substring(col("doc_id"), 5, 8).cast("long") < 20)
    Extractor.extract(docs).write.mode("append").parquet(in)

    LlmStream.start(spark, in, out, ckpt,
      transport = LlmStageSpec.BrokenPromptTransport(),
      backoffMs = _ => 0L, availableNow = true).awaitTermination()
    val rows = spark.read.parquet(out).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("llm_error") != null))
    assert(rows.forall(_.getAs[String]("llm_response") == null))

    intercept[IllegalArgumentException] {
      LlmStream.start(spark, in, out, s"$root/ckpt2",
        transport = LlmStageSpec.DeadTransport(), availableNow = true)
    }
  }
}
