package graft.llm

import graft.textops.{LlmFormat, PortableHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P2/L2/L3 — the LLM stage as dataflow plumbing (reference
  * workers.py:145-279, utils.py:282-316, utils.py:556-577). The network
  * call is an external side-effecting service and stays OUT of the
  * extraction invariant (SURVEY.md §0); what is real here, like the
  * multimodal decode stub, is the Spark-side shape:
  *
  *  - prompt build (L1) as column ops, empty-context sentinel included;
  *  - `mapPartitions` with ONE transport instance per partition — the
  *    pooled-HTTP-client amortization the reference gets from a long-lived
  *    Celery worker process (workers.py:28-37);
  *  - a submit-time LIVENESS PROBE on the transport (the reference checks
  *    Ollama `/api/tags` before dispatching the stage,
  *    workers.py:205-224) — a dead endpoint fails the submit, not 10^12
  *    rows one timeout at a time;
  *  - per-row RETRY-THEN-DEAD-LETTER (reference workers.py:137-139:
  *    3 retries, 60·2ⁿ s backoff, then status=ERROR+error_message):
  *    transient transport failures retry with the reference's backoff
  *    schedule; deterministic failures ([[DeterministicLlmError]]) and
  *    exhausted retries become a dead-letter ROW (`llm_response` null,
  *    `llm_error` set, attempt count recorded) — one bad row must not
  *    kill the job, and retrying a deterministic error 3x is wasted work
  *    at scale (SURVEY.md §2.5 P4);
  *  - the L4/L5 formatting stage (P3) applied to the raw replies;
  *  - provider validation (V3) at submit time.
  *
  * The transport is pluggable: production would wire an HTTP client with
  * the reference's payload knobs (temperature 0.1, top_p 0.9,
  * repeat_penalty 1.1, 300 s timeout — utils.py:287-298); the in-sandbox
  * default is [[EchoTransport]], a deterministic function of
  * (model, prompt) the DuckDB oracle reproduces (no egress exists here, so
  * the stub is declared, not hidden).
  */
object LlmStage {

  val DefaultModel = "echo-1"

  /** Reference retry policy (workers.py:39,137-139): `max_retries=3`,
    * backoff `60 * 2**retries` seconds. Retries are PER ROW, not per task:
    * a Spark task failure would replay the whole partition against the
    * external service.
    */
  val MaxRetries = 3
  def referenceBackoffMs(retryIdx: Int): Long = 60000L * (1L << retryIdx)

  /** Consecutive terminally-failed rows before a partition's circuit
    * opens (see [[generate]]). The reference retries per-doc
    * (workers.py:137-139) because a Celery worker handles one doc at a
    * time; a Spark partition holds millions of rows, and a DEAD endpoint
    * must not cost `maxRetries` sleeps on every one of them — after
    * [[CircuitBreakerAfter]] rows fail with retries exhausted, later rows
    * are dead-lettered WITHOUT a transport call except a sampled probe
    * every [[CircuitProbeEvery]]-th row (half-open: any probe success
    * closes the circuit again). A refusing endpoint then costs O(K)
    * sleeps per partition, and a BLACKHOLED endpoint — where even a
    * single sleepless attempt eats the full connect timeout — costs
    * O(rows / probeEvery) timeouts instead of O(rows); the skipped rows
    * dead-letter for the resume pass.
    */
  val CircuitBreakerAfter = 5

  /** While the circuit is open, attempt the transport only on every Kth
    * row (the probe); the rows in between dead-letter with no call.
    */
  val CircuitProbeEvery = 100

  /** A transport failure retrying cannot fix (malformed prompt, 4xx-class
    * rejection). Dead-letters immediately — no retry, no backoff.
    */
  class DeterministicLlmError(msg: String) extends RuntimeException(msg)

  trait LlmTransport extends Serializable {
    def generate(model: String, prompt: String): String

    /** Submit-time liveness probe (reference workers.py:205-224 GETs
      * `/api/tags` and aborts the task chain when Ollama is down). Cheap,
      * driver-side, called once per stage submit — not per row.
      */
    def live(): Boolean = true
  }

  /** Deterministic in-sandbox transport: digest of the full prompt plus
    * the ASCII-letters of the context's first word (ASCII-only filter so
    * the DuckDB oracle's `[^A-Za-z]` class agrees exactly — Java
    * `isLetter` would keep Unicode letters the regex class drops).
    */
  case class EchoTransport() extends LlmTransport {
    override def generate(model: String, prompt: String): String = {
      // context starts after "Context: "; first word feeds the reply
      val ctx = prompt.stripPrefix("Context: ")
      val w1raw = ctx.takeWhile(c => c != ' ' && c != '\n')
      val letters = w1raw.filter(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
      val w1 = if (letters.isEmpty) "empty" else letters
      s"name: $w1, ref: ${PortableHash.hexint32(prompt)}"
    }
  }

  /** Config-gated transport selection: `GRAFT_LLM_TRANSPORT` ∈
    * {`echo` (default), `ollama`, `gemini`}. `ollama` reads
    * `OLLAMA_BASE_URL` (the reference's env knob + default,
    * utils.py:19); `gemini` requires `GEMINI_API_KEY` (the reference
    * carries the key per-request, workers.py:188-196 — an env var is the
    * batch-job equivalent). Nothing in-sandbox sets the gate, so every
    * test and driver run gets the deterministic [[EchoTransport]]; a
    * deployment flips ONE env var to go live.
    */
  def transportFromEnv(env: Map[String, String] = sys.env): LlmTransport =
    env.getOrElse("GRAFT_LLM_TRANSPORT", "echo") match {
      case "echo" => EchoTransport()
      case "ollama" =>
        OllamaTransport(env.getOrElse("OLLAMA_BASE_URL", "http://localhost:11434"))
      case "gemini" =>
        GeminiTransport(env.getOrElse("GEMINI_API_KEY",
          throw new IllegalArgumentException(
            "GRAFT_LLM_TRANSPORT=gemini requires GEMINI_API_KEY")))
      case other =>
        throw new IllegalArgumentException(s"unknown GRAFT_LLM_TRANSPORT '$other'")
    }

  /** Run the generate stage: `(doc_id, full_prompt)` in;
    * `(doc_id, full_prompt, llm_response, llm_error, llm_attempts)` out —
    * one transport per partition, per-row retry-then-dead-letter.
    * Rows with `llm_error` non-null ARE the dead-letter view
    * ([[deadLetters]]); successful rows carry a null error.
    *
    * @param backoffMs sleep before retry `i` (0-based); the default is the
    *                  reference schedule — tests inject `_ => 0L`.
    */
  def generate(df: DataFrame, model: String, transport: LlmTransport,
      maxRetries: Int = MaxRetries,
      backoffMs: Int => Long = referenceBackoffMs,
      probeLiveness: Boolean = true,
      breakerAfter: Int = CircuitBreakerAfter,
      probeEvery: Int = CircuitProbeEvery): DataFrame = {
    if (probeLiveness)
      require(transport.live(),
        s"LLM transport for model '$model' failed the liveness probe — " +
          "refusing to dispatch the stage (reference workers.py:205-224)")
    val spark = df.sparkSession
    import spark.implicits._
    // doc_id is the primary key (reference models.py:18, NOT NULL); a
    // null-id row has no home in any table and would kill the typed
    // encoder below, so it is dropped rather than failing the job.
    // Ids ride through as strings so the stage serves both the long-keyed
    // documents table and the pipeline's string-keyed span docs; callers
    // needing the original type cast the output back.
    df.where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("string"), col("full_prompt"))
      .as[(String, String)]
      .mapPartitions { rows =>
        val t = transport // one instance per partition (pooled-client shape)
        // partition-local circuit breaker state (see CircuitBreakerAfter)
        var consecTransientFails = 0
        var skippedSinceProbe = 0 // open-circuit rows dead-lettered callless
        rows.map { case (id, prompt) =>
          // null prompt (null doc text) degrades to a null reply — one bad
          // row must not kill a 10^12-doc job
          if (prompt == null) (id, prompt, null: String, null: String, 0)
          else if (consecTransientFails >= breakerAfter &&
              skippedSinceProbe < probeEvery - 1) {
            // circuit open, not a probe row: dead-letter with NO transport
            // call — a blackholed endpoint would otherwise cost a full
            // connect timeout per row (attempts=0 marks the skip)
            skippedSinceProbe += 1
            (id, prompt, null: String,
              "transient: circuit open (skipped without call)", 0)
          } else {
            val circuitOpen = consecTransientFails >= breakerAfter
            skippedSinceProbe = 0
            val rowRetries = if (circuitOpen) 0 else maxRetries
            var attempt = 0
            var reply: String = null
            var err: String = null
            var done = false
            while (!done) {
              attempt += 1
              try { reply = t.generate(model, prompt); err = null; done = true }
              catch {
                case e: DeterministicLlmError =>
                  err = s"deterministic: ${e.getMessage}"; done = true
                case scala.util.control.NonFatal(e) =>
                  err = s"transient: ${e.getClass.getSimpleName}: ${e.getMessage}" +
                    (if (circuitOpen) " (circuit open)" else "")
                  if (attempt > rowRetries) done = true
                  else Thread.sleep(backoffMs(attempt - 1))
              }
            }
            // deterministic errors say nothing about endpoint health —
            // only transient terminal failures open (and successes close)
            // the circuit
            if (err != null && err.startsWith("transient")) consecTransientFails += 1
            else if (err == null) consecTransientFails = 0
            (id, prompt, reply, err, attempt)
          }
        }
      }
      .toDF("doc_id", "full_prompt", "llm_response", "llm_error", "llm_attempts")
  }

  /** Dead-letter view over [[generate]]'s output: the rows whose transport
    * call failed terminally (the reference's status=ERROR rows,
    * workers.py:273-275).
    */
  def deadLetters(generated: DataFrame): DataFrame =
    generated.where(col("llm_error").isNotNull)
      .select("doc_id", "llm_error", "llm_attempts")

  /** The full P1→P2→P3 chain over the documents table: prompt build (L1),
    * generate (stub transport), format (L4) — the driver query + oracle
    * verify prompt/reply/formatted per doc.
    */
  def stageQuery(spark: SparkSession, sfDir: String,
      transport: LlmTransport = EchoTransport()): DataFrame = {
    graft.serve.Queries.validateProvider("ollama", None) // V3 gate (stub = local provider)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val prompts = d.select(d("doc_id"),
      LlmFormat.promptBuild(d("text"), lit(LlmFormat.Question),
        lit(null).cast("string"), lit(null).cast("string")).as("full_prompt"))
    generate(prompts, DefaultModel, transport)
      .select(col("doc_id").cast("long").as("doc_id"), col("llm_response"),
        formattedCol(col("llm_response")).as("formatted_response"))
      .orderBy("doc_id")
  }

  /** Replies carry extractable key-value text so the downstream L4/L5
    * format stage does real work: `name: {w1}, ref: {h32(prompt)}`.
    */
  val Template = """{"name": "", "ref": ""}"""

  /** L1 prompt built from an extracted span array (text spans joined by
    * newline) — ONE definition shared by the inline [[pipelineQuery]] and
    * the checkpointed [[graft.pipeline.ExtractPipeline.runLlmStage]].
    */
  def promptFromSpans(spans: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    LlmFormat.promptBuild(
      array_join(transform(
        filter(spans, s => s.getField("kind") === "text"),
        s => s.getField("text")), "\n"),
      lit(LlmFormat.Question),
      lit(null).cast("string"), lit(null).cast("string"))

  /** P3 formatted-response column for a raw reply (shared definition). */
  def formattedCol(reply: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    LlmFormat.format_best_effort(reply, lit(Template), lit(null).cast("string"))

  /** The FULL reference chain (workers.py:39-345) as one inline query:
    * extraction (P1) → prompt build over the EXTRACTED text (L1) →
    * generate (P2, echo transport) → format (P3/L4) — the dataflow of
    * [[graft.pipeline.ExtractPipeline.runLlmStage]] minus the storage,
    * so the DuckDB oracle verifies the chained semantics end to end.
    */
  def pipelineQuery(spark: SparkSession, sfDir: String,
      transport: LlmTransport = EchoTransport()): DataFrame = {
    graft.serve.Queries.validateProvider("ollama", None) // V3 gate, like stageQuery
    val extracted = graft.extract.Extractor.extract(
      graft.synth.SpanSynth.docsInput(spark, sfDir))
    val prompts = extracted.select(
      col("doc_id"), promptFromSpans(col("spans")).as("full_prompt"))
    generate(prompts, DefaultModel, transport)
      .select(col("doc_id"), col("llm_response"),
        formattedCol(col("llm_response")).as("formatted_response"))
      .orderBy("doc_id")
  }
}
