package graft

import graft.textops.LlmFormat
import org.scalatest.funsuite.AnyFunSuite

/** Unit goldens for the L4 best-effort JSON cascade and the L5 key battery
  * (semantics per SURVEY.md §2.4; cascade order frozen in LlmFormat).
  */
class LlmFormatSpec extends AnyFunSuite {

  private def fmt(r: String, t: String = """{"name": "", "total": ""}""",
      e: String = null) = LlmFormat.formatBestEffort(r, t, e)

  test("method 1: whole reply is JSON -> returned trimmed") {
    assert(fmt("""  {"a": 1}  """) === """{"a": 1}""")
    assert(fmt("""[1, 2]""") === "[1, 2]")
  }

  test("method 2: first valid bracketed substring wins") {
    assert(fmt("""noise {"a": 1} tail {"b": 2}""") === """{"a": 1}""")
  }

  test("method 2: invalid first brace pair is skipped for a later valid one") {
    assert(fmt("""{oops} then {"a": 1}""") === """{"a": 1}""")
  }

  test("method 2: array-shaped template prefers array match") {
    assert(fmt("""x {"a": 1} y [2, 3]""", t = """[{"a": ""}]""") === "[2, 3]")
  }

  test("method 3: template keys assembled via regex battery") {
    assert(fmt("name: acme, total: 12.5") === """{"name": "acme", "total": "12.5"}""")
  }

  test("method 3: key= form and trailing punctuation strip") {
    assert(fmt("name = acme;, total: 3.") === """{"name": "acme", "total": "3"}""")
  }

  test("method 4: example keys used when template yields nothing") {
    val out = LlmFormat.formatBestEffort("code: xyz", """{"nothinghere": ""}""",
      """{"code": "abc"}""")
    // 'nothinghere' battery falls through to... no digits/dates in reply, so
    // template assembly fails; example key 'code' matches
    assert(out === """{"code": "xyz"}""")
  }

  test("method 5: cleaned raw reply when nothing extracts") {
    assert(LlmFormat.formatBestEffort("  just   prose\n here ", null, null) ===
      "just prose here")
  }

  test("date and cnpj fallback patterns") {
    assert(fmt("emitted 12/03/2024 ok", t = """{"date": ""}""") ===
      """{"date": "12/03/2024"}""")
    assert(fmt("doc 12.345.678/0001-99 ok", t = """{"cnpj": ""}""") ===
      """{"cnpj": "12.345.678/0001-99"}""")
  }

  test("null reply passes through") {
    assert(LlmFormat.formatBestEffort(null, "{}", null) === null)
  }

  test("battery keys must be plain identifiers (regex-injection guard)") {
    intercept[IllegalArgumentException](LlmFormat.keyPatterns("a.b"))
    intercept[IllegalArgumentException](LlmFormat.keyPatterns("k(1)"))
    assert(LlmFormat.keyPatterns("total_2").nonEmpty)
  }

  test("cascade degrades on non-identifier template keys instead of crashing") {
    // format_best_effort is a public SQL function; caller templates with
    // odd keys must skip the key, never fail the row/job
    val out = LlmFormat.formatBestEffort("name: acme",
      """{"total-due": "", "name": ""}""", null)
    assert(out === """{"name": "acme"}""")
  }

  test("provider validation (V3) accepts known providers, rejects the rest") {
    import graft.serve.Queries.validateProvider
    validateProvider("ollama", None)
    validateProvider("gemini", Some("key-123"))
    intercept[IllegalArgumentException](validateProvider("openai", None))
    intercept[IllegalArgumentException](validateProvider("gemini", None))
    intercept[IllegalArgumentException](validateProvider("gemini", Some("")))
  }
}

/** Corpus-property guard (oracle assumption): the formatResponse oracle
  * derives L4 outputs ANALYTICALLY assuming document first-words trigger no
  * fallback battery pattern (digits/quotes/braces). Holds for the shipped
  * corpora; if testdata is ever regenerated with a richer vocabulary this
  * fails loudly instead of silently diverging from DuckDB.
  */
class FormatOracleCorpusGuardSpec extends AnyFunSuite with SparkSpec {
  test("first words of documents trigger no battery/oracle divergence") {
    import org.apache.spark.sql.functions._
    // digits/quotes/brackets fire the fallback patterns; , } stop the
    // battery's capture early; ; . are stripped as trailing punctuation;
    // : = make free text battery-extractable; \ breaks jsonEscape parity —
    // any of these would silently diverge the analytic formatResponse /
    // serveDebug / llmStage oracles from the real cascade
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val bad = spark.read.parquet(s"$dir/documents.parquet")
        .select(element_at(split(col("text"), " "), 1).as("w1"))
        .where(col("w1").rlike("[\\d\"{}\\[\\],;.:=\\\\]"))
        .count()
      assert(bad === 0L, s"$dir has $bad battery-triggering first words")
    }
  }
}
