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

  /** Replies carry extractable key-value text so the downstream L4/L5
    * format stage does real work: `name: {w1}, ref: {h32(prompt)}`.
    */
  val Template = """{"name": "", "ref": ""}"""

  trait LlmTransport extends Serializable {
    def generate(model: String, prompt: String): String
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

  /** Run the generate stage: `(doc_id, full_prompt)` in,
    * `(doc_id, llm_response)` appended — one transport per partition.
    */
  def generate(df: DataFrame, model: String, transport: LlmTransport): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // doc_id is the primary key (reference models.py:18, NOT NULL); a
    // null-id row has no home in any table and would kill the typed
    // encoder below, so it is dropped rather than failing the job
    df.where(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"), col("full_prompt"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val t = transport // one instance per partition (pooled-client shape)
        rows.map { case (id, prompt) =>
          // null prompt (null doc text) degrades to a null reply — one bad
          // row must not kill a 10^12-doc job
          (id, prompt, if (prompt == null) null else t.generate(model, prompt))
        }
      }
      .toDF("doc_id", "full_prompt", "llm_response")
  }

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
      .select(col("doc_id"), col("llm_response"),
        LlmFormat.format_best_effort(col("llm_response"), lit(Template),
          lit(null).cast("string")).as("formatted_response"))
      .orderBy("doc_id")
  }
}
