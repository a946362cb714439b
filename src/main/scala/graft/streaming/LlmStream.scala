package graft.streaming

import graft.llm.LlmStage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming form of the P2/P3 stage — the continuous tail of
  * [[graft.pipeline.ExtractPipeline.runLlmStage]]: extracted span docs
  * arrive as files, prompts build over the extracted text (L1), the
  * pluggable transport generates (P2), the L4 formatter runs (P3), and
  * replies land in a parquet sink with exactly-once file semantics via
  * the sink commit log. This IS the reference's deployment shape — its
  * Celery queue is an asynchrony mechanism feeding one doc at a time to
  * the LLM worker (reference workers.py:145-279); micro-batches over a
  * growing directory are the same contract with checkpointed progress.
  *
  * All P2 operational semantics ride along unchanged because they live in
  * [[LlmStage.generate]]: per-partition transport instance, per-row
  * retry-then-dead-letter with the reference backoff, the partition
  * circuit breaker, and the submit-time liveness probe (checked once per
  * stream START, not per batch — a dead endpoint fails the submit).
  * Dead-lettered rows flow to the sink as `llm_error` rows, so the batch
  * dead-letter queries work on the streamed table too.
  */
object LlmStream {

  /** Start the LLM stage over a growing directory of EXTRACTED docs
    * (`doc_id, spans` — the extract stream/pipeline output layout).
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String,
      model: String = LlmStage.DefaultModel,
      // deployment entry point — env-gated like runLlmStage (echo default)
      transport: LlmStage.LlmTransport = LlmStage.transportFromEnv(),
      maxRetries: Int = LlmStage.MaxRetries,
      backoffMs: Int => Long = LlmStage.referenceBackoffMs,
      availableNow: Boolean = false): StreamingQuery = {
    require(transport.live(),
      s"LLM transport for model '$model' failed the liveness probe — " +
        "refusing to start the stream")
    val in = StreamIo.docSource(spark, inDir)
    val prompts = in.select(
      col("doc_id"), LlmStage.promptFromSpans(col("spans")).as("full_prompt"))
    // probeLiveness=false: probed once above at stream start — generate
    // runs per micro-batch and must not re-gate each one
    val replied = LlmStage.generate(prompts, model, transport,
        maxRetries, backoffMs, probeLiveness = false)
      .withColumn("formatted_response", LlmStage.formattedCol(col("llm_response")))
    StreamIo.startParquetSink(replied, outDir, checkpointDir, availableNow)
  }
}
