package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.llm.{GeminiTransport, LlmStage, LlmWire, OllamaTransport}
import graft.llm.LlmStage.DeterministicLlmError
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Integration test of the production HTTP transport against a LOOPBACK
  * server (JDK built-in HttpServer — no egress, nothing leaves the
  * sandbox): real sockets, real status codes, real JSON bodies. The
  * in-sandbox default stays the echo transport (LlmWireSpec pins the
  * gate); this suite proves the wire layer + error taxonomy work when a
  * deployment flips it on.
  */
class TransportLoopbackSpec extends AnyFunSuite with SparkSpec {

  /** Serve `handler` on an ephemeral loopback port for the test's scope. */
  private def withServer(handler: HttpExchange => (Int, String))(body: String => Unit): Unit = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      val (code, resp) = handler(ex)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  test("ollama transport round-trips the reference payload over real HTTP") {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]()
    withServer { ex =>
      ex.getRequestURI.getPath match {
        case "/api/generate" =>
          seen.set(readBody(ex))
          (200, s"""{"model":"m","response":${LlmWire.jsonStr("  the answer\n")},"done":true}""")
        case "/api/tags" => (200, """{"models":[]}""")
        case _ => (404, "{}")
      }
    } { base =>
      val t = OllamaTransport(base)
      assert(t.live())
      // reply is .strip()ped like the reference (utils.py:302)
      assert(t.generate("m", "Context: hello") === "the answer")
      val sent = seen.get()
      assert(LlmWire.stringField(sent, "prompt") === Some("Context: hello"))
      assert(LlmWire.stringField(sent, "model") === Some("m"))
      assert(sent.contains(""""temperature": 0.1"""))
      assert(sent.contains(""""repeat_penalty": 1.1"""))
    }
  }

  test("gemini transport: key rides the x-goog-api-key header, never the URL") {
    val seenUri = new java.util.concurrent.atomic.AtomicReference[String]()
    val seenKey = new java.util.concurrent.atomic.AtomicReference[String]()
    withServer { ex =>
      seenUri.set(ex.getRequestURI.toString)
      seenKey.set(ex.getRequestHeaders.getFirst("x-goog-api-key"))
      if (ex.getRequestURI.getPath.endsWith("/models")) (200, """{"models":[]}""")
      else (200,
        // promptFeedback carries a "text"-bearing structure BEFORE the
        // candidates — the parse must bind the candidate part, not it
        """{"promptFeedback":{"blockReason":{"text":"not this"}},""" +
          """"candidates":[{"content":{"parts":[{"text":"  real answer "}]}}]}""")
    } { base =>
      val t = GeminiTransport("sk-secret-123", base)
      assert(t.live())
      assert(seenKey.get() === "sk-secret-123")
      assert(!seenUri.get().contains("sk-secret-123"))
      assert(t.generate("gemini-pro", "Context: q") === "real answer")
      assert(seenKey.get() === "sk-secret-123")
      assert(!seenUri.get().contains("sk-secret-123")) // request line secret-free
      assert(seenUri.get().endsWith("/models/gemini-pro:generateContent"))
    }
  }

  test("gemini reply without candidates or with malformed escapes is deterministic") {
    withServer { _ => (200, """{"promptFeedback":{"blockReason":"SAFETY"}}""") } { base =>
      val e = intercept[DeterministicLlmError] {
        GeminiTransport("k", base).generate("m", "p")
      }
      assert(e.getMessage.contains("candidates"))
    }
    // a TEXT-LESS candidates array followed by a text-bearing sibling:
    // the search is bounded to the array, so this must dead-letter, not
    // return "BLOCKED" as a fake successful reply
    withServer { _ =>
      (200, """{"candidates":[{"finishReason":"SAFETY"}],""" +
        """"promptFeedback":{"blockReason":{"text":"BLOCKED"}}}""")
    } { base =>
      val e = intercept[DeterministicLlmError] {
        GeminiTransport("k", base).generate("m", "p")
      }
      assert(e.getMessage.contains("no 'text'"))
    }
    // malformed \u escape: deterministic (same bytes re-parse identically),
    // must NOT ride the transient retry path
    // the body contains a literal backslash-u with non-hex digits (built by
    // concat — Scala 2 pre-processes \z unicode escapes even in literals)
    val badEsc = "{\"candidates\":[{\"content\":{\"parts\":[{\"text\":\"bad " +
      "\\" + "uZZZZ esc\"}]}}]}"
    withServer { _ => (200, badEsc) } { base =>
      val e = intercept[DeterministicLlmError] {
        GeminiTransport("k", base).generate("m", "p")
      }
      assert(e.getMessage.contains("malformed"))
    }
  }

  test("4xx rejects are deterministic; 429/5xx are transient; liveness fails on a dead port") {
    withServer { _ => (400, """{"error":"bad request"}""") } { base =>
      intercept[DeterministicLlmError] { OllamaTransport(base).generate("m", "p") }
    }
    withServer { _ => (429, """{"error":"slow down"}""") } { base =>
      val e = intercept[RuntimeException] { OllamaTransport(base).generate("m", "p") }
      assert(!e.isInstanceOf[DeterministicLlmError]) // rides the retry path
    }
    withServer { _ => (500, """{"error":"boom"}""") } { base =>
      val e = intercept[RuntimeException] { OllamaTransport(base).generate("m", "p") }
      assert(!e.isInstanceOf[DeterministicLlmError])
    }
    // unreachable endpoint: the probe reports dead instead of throwing
    assert(!OllamaTransport("http://127.0.0.1:1").live())
  }

  test("transport failures ride generate's retry loop end to end") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      ex.getRequestURI.getPath match {
        case "/api/tags" => (200, "{}")
        case _ =>
          // first two generate calls 503, then succeed — the reference
          // retry schedule (test-injected zero backoff) must recover
          if (calls.incrementAndGet() <= 2) (503, "{}")
          else (200, """{"response":"ok"}""")
      }
    } { base =>
      import spark.implicits._
      val df = Seq(("1", "Context: x")).toDF("doc_id", "full_prompt")
      val rows = LlmStage.generate(df, "m", OllamaTransport(base),
        maxRetries = 3, backoffMs = _ => 0L).collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[String]("llm_response") === "ok")
      assert(rows(0).getAs[String]("llm_error") === null)
      assert(rows(0).getAs[Int]("llm_attempts") === 3)
    }
  }
}
