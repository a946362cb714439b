package graft

import graft.llm.LlmStage
import org.scalatest.funsuite.AnyFunSuite

/** P2 operational semantics around the pluggable transport (reference
  * workers.py:137-139 retry policy, workers.py:205-224 liveness probe,
  * workers.py:273-275 terminal ERROR rows): a throwing transport must
  * yield dead-letter ROWS, never a failed job.
  */
class LlmStageSpec extends AnyFunSuite with SparkSpec {

  private def prompts(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"Context: doc$i body"))
      .toDF("doc_id", "full_prompt")
  }

  private val noBackoff: Int => Long = _ => 0L

  test("transient failures retry then succeed; attempts recorded") {
    val out = LlmStage.generate(prompts(4), "m", LlmStageSpec.FlakyTransport(2),
      maxRetries = 3, backoffMs = noBackoff).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[String]("llm_response").startsWith("ok: "))
      assert(r.getAs[String]("llm_error") === null)
      assert(r.getAs[Int]("llm_attempts") === 3) // 2 failures + 1 success
    }
  }

  test("exhausted transient retries dead-letter the row, not the job") {
    val out = LlmStage.generate(prompts(3), "m", LlmStageSpec.FlakyTransport(Int.MaxValue),
      maxRetries = 3, backoffMs = noBackoff)
    val rows = out.collect()
    assert(rows.length === 3) // every row survives as a dead letter
    rows.foreach { r =>
      assert(r.getAs[String]("llm_response") === null)
      assert(r.getAs[String]("llm_error").startsWith("transient: IOException"))
      assert(r.getAs[Int]("llm_attempts") === 4) // initial + maxRetries
    }
    val dead = LlmStage.deadLetters(out).collect()
    assert(dead.length === 3)
  }

  test("deterministic errors dead-letter immediately (no retry burn)") {
    val rows = LlmStage.generate(prompts(2), "m", LlmStageSpec.BrokenPromptTransport(),
      maxRetries = 3, backoffMs = noBackoff).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("llm_response") === null)
      assert(r.getAs[String]("llm_error") === "deterministic: prompt rejected: 400")
      assert(r.getAs[Int]("llm_attempts") === 1)
    }
  }

  test("liveness probe fails the submit, not 10^12 rows") {
    val e = intercept[IllegalArgumentException] {
      LlmStage.generate(prompts(1), "m", LlmStageSpec.DeadTransport())
    }
    assert(e.getMessage.contains("liveness"))
  }

  test("null prompts degrade to null replies with no transport call") {
    import spark.implicits._
    val df = Seq((1L, "Context: x"), (2L, null: String))
      .toDF("doc_id", "full_prompt")
    val rows = LlmStage.generate(df, "m", LlmStage.EchoTransport())
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[String]("llm_response") !== null)
    assert(rows(1).getAs[String]("llm_response") === null)
    assert(rows(1).getAs[String]("llm_error") === null) // absent input, not an error
    assert(rows(1).getAs[Int]("llm_attempts") === 0)
  }

  test("circuit breaker: a dead endpoint costs O(K) sleeps, not O(rows)") {
    LlmStageSpec.sleeps.set(0)
    val n = 20
    val out = LlmStage.generate(prompts(n).coalesce(1), "m",
      LlmStageSpec.FlakyTransport(Int.MaxValue),
      maxRetries = 3, backoffMs = LlmStageSpec.countingBackoff,
      breakerAfter = 5).collect().sortBy(_.getAs[String]("doc_id").toLong)
    assert(out.length === n) // every row survives as a dead letter
    assert(out.forall(_.getAs[String]("llm_response") == null))
    // first 5 rows burn full retries; once the circuit opens, one
    // sleepless attempt per row
    assert(out.take(5).forall(_.getAs[Int]("llm_attempts") === 4))
    assert(out.drop(5).forall(_.getAs[Int]("llm_attempts") === 1))
    assert(out.drop(5).forall(_.getAs[String]("llm_error").contains("(circuit open)")))
    assert(LlmStageSpec.sleeps.get() === 5 * 3)
  }

  test("circuit breaker is half-open: one success closes it again") {
    LlmStageSpec.sleeps.set(0)
    // docs 0-7 fail, 8-9 succeed (closing the circuit), 10-14 fail again
    val out = LlmStage.generate(prompts(15).coalesce(1), "m",
      LlmStageSpec.WindowedTransport(okFrom = 8, okTo = 9),
      maxRetries = 3, backoffMs = LlmStageSpec.countingBackoff,
      breakerAfter = 5).collect().sortBy(_.getAs[String]("doc_id").toLong)
    assert(out.slice(8, 10).forall(_.getAs[String]("llm_error") == null))
    // rows 10+ got full retries again — the circuit closed on success
    assert(out.drop(10).forall(_.getAs[Int]("llm_attempts") === 4))
    // 5 breaker-opening rows before 8, 5 after the close: 10 * 3 sleeps
    assert(LlmStageSpec.sleeps.get() === 10 * 3)
  }

  test("deterministic errors do not open the circuit") {
    LlmStageSpec.sleeps.set(0)
    val out = LlmStage.generate(prompts(12).coalesce(1), "m",
      LlmStageSpec.BrokenPromptTransport(),
      maxRetries = 3, backoffMs = LlmStageSpec.countingBackoff,
      breakerAfter = 5).collect()
    // every row still gets its single deterministic attempt; no sleeps at
    // all and no "(circuit open)" marker
    assert(out.forall(_.getAs[Int]("llm_attempts") === 1))
    assert(out.forall(!_.getAs[String]("llm_error").contains("circuit")))
    assert(LlmStageSpec.sleeps.get() === 0)
  }

  test("mixed batch: flaky rows succeed while broken rows dead-letter") {
    val out = LlmStage.generate(prompts(4), "m", LlmStageSpec.MixedTransport(),
      backoffMs = noBackoff).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("llm_error") == null).toSeq ===
      Seq(false, true, false, true))
    assert(out.count(_.getAs[String]("llm_response") != null) === 2)
  }
}

/** Transports live OUTSIDE the suite class: an inner class would capture
  * the non-serializable AnyFunSuite via `$outer` and fail closure cleaning.
  */
object LlmStageSpec {
  import graft.llm.LlmStage.{DeterministicLlmError, LlmTransport}

  /** Fails the first `failures` calls PER PROMPT with an IOException-class
    * transient error, then succeeds. Per-partition instance state is the
    * point: retries land on the same deserialized copy.
    */
  case class FlakyTransport(failures: Int) extends LlmTransport {
    private val seen = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    override def generate(model: String, prompt: String): String = {
      val n = seen.merge(prompt, 1, (a, b) => a + b)
      if (n <= failures) throw new java.io.IOException(s"connection reset (call $n)")
      s"ok: $prompt"
    }
  }

  case class BrokenPromptTransport() extends LlmTransport {
    override def generate(model: String, prompt: String): String =
      throw new DeterministicLlmError("prompt rejected: 400")
  }

  case class DeadTransport() extends LlmTransport {
    override def live(): Boolean = false
    override def generate(model: String, prompt: String): String = "unreachable"
  }

  /** Shared sleep counter for the circuit-breaker specs (local mode: the
    * executor shares the JVM, so the static is visible to assertions).
    */
  val sleeps = new java.util.concurrent.atomic.AtomicInteger(0)
  val countingBackoff: Int => Long = _ => { sleeps.incrementAndGet(); 0L }

  /** Transient-fails every doc except ids in [okFrom, okTo]. */
  case class WindowedTransport(okFrom: Int, okTo: Int) extends LlmTransport {
    override def generate(model: String, prompt: String): String = {
      val id = "doc(\\d+)".r.findFirstMatchIn(prompt).get.group(1).toInt
      if (id >= okFrom && id <= okTo) s"ok: $prompt"
      else throw new java.io.IOException(s"connection reset (doc $id)")
    }
  }

  /** Deterministic-broken for even docs, fine for odd. */
  case class MixedTransport() extends LlmTransport {
    override def generate(model: String, prompt: String): String =
      if (prompt.contains("doc0") || prompt.contains("doc2"))
        throw new DeterministicLlmError("bad row")
      else s"ok: $prompt"
  }
}
