package graft

import graft.llm.{GeminiTransport, LlmWire, OllamaTransport}
import graft.llm.LlmStage
import org.scalatest.funsuite.AnyFunSuite

/** The production transports' pure wire layer (payload build + reply
  * parse) and the config gate. No network: the transports' HTTP clients
  * are lazy and never touched here — in-sandbox everything runs the echo
  * transport, and these specs pin that gate.
  */
class LlmWireSpec extends AnyFunSuite {

  test("jsonStr escapes quotes, backslashes, and control chars") {
    val in0 = "a\"b" + "\\" + "c\n\t" + 1.toChar
    assert(LlmWire.jsonStr(in0) ===
      "\"a\\\"b\\\\c\\n\\t\\u0001\"")
    assert(LlmWire.jsonStr("plain") === "\"plain\"")
  }

  test("ollama payload carries the reference knobs and survives parsing") {
    val p = LlmWire.ollamaPayload("llama3.2", "Context: a \"quoted\"\nline")
    assert(p.contains(""""stream": false"""))
    assert(p.contains(""""temperature": 0.1"""))
    assert(p.contains(""""top_p": 0.9"""))
    assert(p.contains(""""repeat_penalty": 1.1"""))
    // round trip: the prompt reads back exactly through the field parser
    assert(LlmWire.stringField(p, "prompt") === Some("Context: a \"quoted\"\nline"))
    assert(LlmWire.stringField(p, "model") === Some("llama3.2"))
  }

  test("gemini payload carries the reference generation config") {
    val p = LlmWire.geminiPayload("q?")
    assert(p.contains(""""temperature": 0.1"""))
    assert(p.contains(""""topP": 0.9"""))
    assert(p.contains(""""maxOutputTokens": 2048"""))
    assert(LlmWire.stringField(p, "text") === Some("q?"))
  }

  test("stringField parses escaped replies and skips non-string matches") {
    val body = """{"model":"m","created_at":"t","response":"line1\nline2 é","done":true}"""
    assert(LlmWire.stringField(body, "response") === Some("line1\nline2 é"))
    assert(LlmWire.stringField(body, "missing") === None)
    // a numeric value under the key is not a string field
    assert(LlmWire.stringField("""{"response": 42}""", "response") === None)
    // nested Gemini shape: first "text" part wins
    val gem = """{"candidates":[{"content":{"parts":[{"text":"ans"}],"role":"model"}}]}"""
    assert(LlmWire.stringField(gem, "text") === Some("ans"))
  }

  test("transport gate defaults to echo; live transports are opt-in") {
    assert(LlmStage.transportFromEnv(Map.empty) === LlmStage.EchoTransport())
    assert(LlmStage.transportFromEnv(Map("GRAFT_LLM_TRANSPORT" -> "echo")) ===
      LlmStage.EchoTransport())
    assert(LlmStage.transportFromEnv(Map("GRAFT_LLM_TRANSPORT" -> "ollama")) ===
      OllamaTransport("http://localhost:11434"))
    assert(LlmStage.transportFromEnv(Map(
      "GRAFT_LLM_TRANSPORT" -> "ollama", "OLLAMA_BASE_URL" -> "http://gpu-box:11434")) ===
      OllamaTransport("http://gpu-box:11434"))
    assert(LlmStage.transportFromEnv(Map(
      "GRAFT_LLM_TRANSPORT" -> "gemini", "GEMINI_API_KEY" -> "k")) ===
      GeminiTransport("k"))
    intercept[IllegalArgumentException] {
      LlmStage.transportFromEnv(Map("GRAFT_LLM_TRANSPORT" -> "gemini"))
    }
    intercept[IllegalArgumentException] {
      LlmStage.transportFromEnv(Map("GRAFT_LLM_TRANSPORT" -> "smoke-signals"))
    }
  }
}
