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
      breakerAfter = 5, probeEvery = 5).collect()
      .sortBy(_.getAs[String]("doc_id").toLong)
    assert(out.length === n) // every row survives as a dead letter
    assert(out.forall(_.getAs[String]("llm_response") == null))
    // first 5 rows burn full retries; once the circuit opens, rows skip
    // calllessly except a sleepless probe every 5th (rows 9, 14, 19)
    assert(out.take(5).forall(_.getAs[Int]("llm_attempts") === 4))
    val probed = out.drop(5).filter(_.getAs[Int]("llm_attempts") === 1)
    assert(probed.map(_.getAs[String]("doc_id").toLong).toSeq === Seq(9L, 14L, 19L))
    assert(probed.forall(_.getAs[String]("llm_error").contains("(circuit open)")))
    val skipped = out.drop(5).filter(_.getAs[Int]("llm_attempts") === 0)
    assert(skipped.length === 12)
    assert(skipped.forall(_.getAs[String]("llm_error").contains("skipped without call")))
    assert(LlmStageSpec.sleeps.get() === 5 * 3)
  }

  test("open circuit: a blackholed endpoint costs O(rows/probeEvery) calls") {
    // every call HANGS (sleeps) before failing — the worst case: with
    // per-row single attempts a dead-but-not-refusing endpoint would cost
    // a connect timeout per row; sampled probing bounds it
    val n = 1000
    LlmStageSpec.HangingTransport.calls.set(0)
    val out = LlmStage.generate(prompts(n).coalesce(1), "m",
      LlmStageSpec.HangingTransport(),
      maxRetries = 3, backoffMs = noBackoff, breakerAfter = 5).collect()
    assert(out.length === n)
    assert(out.forall(_.getAs[String]("llm_error") != null)) // all dead-letter
    // 5 opening rows x 4 attempts + ~9 probes across 995 open-circuit rows
    assert(LlmStageSpec.HangingTransport.calls.get() <= 5 * 4 + 12)
    assert(out.count(_.getAs[Int]("llm_attempts") === 0) >= n - 20)
  }

  test("open circuit closes on a probe success") {
    // fails until call 21, then recovers: the opening rows burn 5*1 calls
    // (maxRetries=0), probes every 5th row keep sampling, and the first
    // successful probe closes the circuit for all remaining rows
    val out = LlmStage.generate(prompts(200).coalesce(1), "m",
      LlmStageSpec.RecoveringTransport(failCalls = 21),
      maxRetries = 0, backoffMs = noBackoff,
      breakerAfter = 5, probeEvery = 5).collect()
      .sortBy(_.getAs[String]("doc_id").toLong)
    // calls: rows 0-4 open the circuit (calls 1-5); probes at rows 9, 14,
    // ... fail until the 21st call; once a probe lands past failCalls the
    // circuit closes and EVERY later row succeeds
    val firstOk = out.indexWhere(_.getAs[String]("llm_error") == null)
    assert(firstOk > 4)
    assert(out.drop(firstOk).forall(_.getAs[String]("llm_error") == null))
    assert(out.drop(firstOk).forall(_.getAs[Int]("llm_attempts") === 1))
  }

  test("circuit breaker is half-open: one success closes it again") {
    LlmStageSpec.sleeps.set(0)
    // docs 0-7 fail, 8-9 succeed (closing the circuit), 10-14 fail again
    val out = LlmStage.generate(prompts(15).coalesce(1), "m",
      LlmStageSpec.WindowedTransport(okFrom = 8, okTo = 9),
      maxRetries = 3, backoffMs = LlmStageSpec.countingBackoff,
      breakerAfter = 5, probeEvery = 4).collect()
      .sortBy(_.getAs[String]("doc_id").toLong)
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

  /** Blackholed endpoint: every call hangs briefly, then fails transient —
    * the case where even a sleepless per-row attempt costs a full connect
    * timeout. Shared static call counter (local mode, one JVM).
    */
  case class HangingTransport() extends LlmTransport {
    override def generate(model: String, prompt: String): String = {
      HangingTransport.calls.incrementAndGet()
      Thread.sleep(20) // stand-in for the 10 s connect timeout
      throw new java.io.IOException("connect timed out")
    }
  }
  object HangingTransport {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  /** Fails the first `failCalls` CALLS (not rows), then succeeds — models
    * an endpoint that comes back mid-partition.
    */
  case class RecoveringTransport(failCalls: Int) extends LlmTransport {
    private val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    override def generate(model: String, prompt: String): String =
      if (calls.incrementAndGet() <= failCalls)
        throw new java.io.IOException("connection reset")
      else s"ok: $prompt"
  }

  /** Deterministic-broken for even docs, fine for odd. */
  case class MixedTransport() extends LlmTransport {
    override def generate(model: String, prompt: String): String =
      if (prompt.contains("doc0") || prompt.contains("doc2"))
        throw new DeterministicLlmError("bad row")
      else s"ok: $prompt"
  }
}
