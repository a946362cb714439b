package graft.llm

import graft.llm.LlmStage.{DeterministicLlmError, LlmTransport}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal JSON wire helpers for the production transports — enough to
  * build the reference's request payloads and pull one string field out of
  * a reply, with full JSON string escaping both ways. Pure functions, so
  * the payload/parse layer is unit-testable with zero network (the
  * transports themselves are config-gated and never constructed in-sandbox
  * — no egress exists here).
  */
object LlmWire {

  /** JSON string literal (escapes quote, backslash, and all control chars). */
  def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** Ollama /api/generate body — the reference's exact knobs
    * (utils.py:286-298: stream=false, temperature 0.1, top_p 0.9,
    * repeat_penalty 1.1, options.verbose).
    */
  def ollamaPayload(model: String, prompt: String): String =
    s"""{"model": ${jsonStr(model)}, "prompt": ${jsonStr(prompt)}, "stream": false, """ +
      """"options": {"verbose": true, "temperature": 0.1, "top_p": 0.9, "repeat_penalty": 1.1}}"""

  /** Gemini generateContent body — the reference's config
    * (utils.py:563-570: temperature 0.1, top_p 0.9, max_output_tokens 2048).
    */
  def geminiPayload(prompt: String): String =
    s"""{"contents": [{"parts": [{"text": ${jsonStr(prompt)}}]}], """ +
      """"generationConfig": {"temperature": 0.1, "topP": 0.9, "maxOutputTokens": 2048}}"""

  /** First occurrence of `"key": "<string>"` in a JSON document, with
    * escape-aware string parsing (\\uXXXX, \\n, …). Enough to read
    * Ollama's `response` field and Gemini's first `text` part without a
    * JSON library (build.sbt is dependency-frozen). Returns None if the
    * key is absent or its value is not a string.
    */
  def stringField(json: String, key: String): Option[String] = {
    val needle = "\"" + key + "\""
    var from = 0
    while (from >= 0 && from < json.length) {
      val k = json.indexOf(needle, from)
      if (k < 0) return None
      var i = k + needle.length
      while (i < json.length && json(i).isWhitespace) i += 1
      if (i < json.length && json(i) == ':') {
        i += 1
        while (i < json.length && json(i).isWhitespace) i += 1
        if (i < json.length && json(i) == '"') return Some(parseString(json, i))
        // key matched a non-string value (or a string VALUE equal to the
        // needle matched) — keep scanning
      }
      from = k + needle.length
    }
    None
  }

  /** The substring covering `key`'s ARRAY value (from its '[' through the
    * matching ']'), bracket-depth scanned with string/escape awareness —
    * so a field search can be bounded to exactly that array instead of
    * "everything after the key" (a trailing sibling structure must not
    * leak into the search). None if the key is absent or its value is not
    * an array.
    */
  def arraySlice(json: String, key: String): Option[String] = {
    val needle = "\"" + key + "\""
    var from = 0
    // keep scanning like stringField: a string VALUE equal to the needle
    // (e.g. {"note":"candidates"}) must not end the search
    while (from >= 0 && from < json.length) {
      val k = json.indexOf(needle, from)
      if (k < 0) return None
      var i = k + needle.length
      while (i < json.length && json(i).isWhitespace) i += 1
      if (i < json.length && json(i) == ':') {
        i += 1
        while (i < json.length && json(i).isWhitespace) i += 1
        if (i < json.length && json(i) == '[') {
          val start = i
          var depth = 0
          var inStr = false
          while (i < json.length) {
            val c = json(i)
            if (inStr) {
              if (c == '\\') i += 1 // skip the escaped char
              else if (c == '"') inStr = false
            } else c match {
              case '"' => inStr = true
              case '[' | '{' => depth += 1
              case ']' | '}' =>
                depth -= 1
                if (depth == 0) return Some(json.substring(start, i + 1))
              case _ =>
            }
            i += 1
          }
          return None // unterminated array
        }
      }
      from = k + needle.length
    }
    None
  }

  /** Parse the JSON string starting at `start` (which must be the opening
    * quote); returns the unescaped value.
    */
  private def parseString(json: String, start: Int): String = {
    val sb = new StringBuilder
    var i = start + 1
    while (i < json.length && json(i) != '"') {
      json(i) match {
        case '\\' if i + 1 < json.length =>
          json(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' if i + 5 < json.length =>
              sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case c => sb.append(c); i += 2 // \" \\ \/ and any other escape
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }
}

/** Shared HTTP shape for the production transports: a JDK HttpClient built
  * lazily PER EXECUTOR-PARTITION instance (the `@transient lazy val` —
  * serialization never ships a live client), the reference's 300 s call
  * timeout (utils.py:282), and the reference's error taxonomy: HTTP 4xx is
  * a [[DeterministicLlmError]] (retrying the same payload cannot fix a
  * rejection), everything else (5xx, connect/read failures) is transient
  * and rides the retry/backoff/circuit-breaker path in
  * [[LlmStage.generate]].
  */
sealed trait HttpLlmTransport extends LlmTransport {
  def callTimeout: Duration = Duration.ofSeconds(300)

  @transient protected lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  protected def post(url: String, body: String,
      headers: Seq[(String, String)] = Nil): String = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(callTimeout)
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val code = resp.statusCode()
    // 429 (rate limit) and 408 (request timeout) are TRANSIENT despite
    // being 4xx: they must ride the retry/backoff path — dead-lettering a
    // quota blip would turn it into permanent data loss, and the backoff
    // is exactly what the rate limiter is asking for. Other 4xx = the
    // payload itself is rejected; retrying cannot fix it.
    if (code >= 400 && code < 500 && code != 429 && code != 408)
      throw new DeterministicLlmError(s"HTTP $code: ${resp.body().take(200)}")
    if (code >= 300)
      throw new RuntimeException(s"HTTP $code: ${resp.body().take(200)}")
    resp.body()
  }

  protected def getOk(url: String, headers: Seq[(String, String)] = Nil): Boolean =
    try {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(10)).GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode() == 200
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Pull a required string field from a reply. A malformed JSON string
    * escape in the body (NumberFormatException from `\\uXXXX` parsing) is a
    * DETERMINISTIC failure — the same bytes re-parse the same way, so it
    * must dead-letter rather than ride the transient retry/backoff path
    * (NonFatal would otherwise classify it transient).
    */
  protected def requiredField(json: String, key: String, what: String): String =
    (try LlmWire.stringField(json, key) catch {
      case e: NumberFormatException =>
        throw new DeterministicLlmError(
          s"malformed JSON string escape in $what reply: ${e.getMessage}")
    }).getOrElse(
      throw new DeterministicLlmError(s"no '$key' field in $what reply"))
      .trim
}

/** L2 — the production Ollama transport (reference utils.py:282-316):
  * POST `{base}/api/generate` with the reference payload, read the
  * `response` field, `.strip()` it; liveness = GET `{base}/api/tags`
  * (workers.py:209). `baseUrl` defaults to the reference's public default
  * endpoint (utils.py:19). Config-gated — [[LlmStage.transportFromEnv]]
  * only builds this when `GRAFT_LLM_TRANSPORT=ollama`; in-sandbox (no
  * egress) the default stays [[LlmStage.EchoTransport]].
  */
case class OllamaTransport(baseUrl: String = "http://localhost:11434")
    extends HttpLlmTransport {
  override def generate(model: String, prompt: String): String = {
    val body = post(s"$baseUrl/api/generate", LlmWire.ollamaPayload(model, prompt))
    requiredField(body, "response", "Ollama")
  }
  override def live(): Boolean = getOk(s"$baseUrl/api/tags")
}

/** L3 — the production Gemini transport (reference utils.py:540-580):
  * POST `models/{model}:generateContent` on the public
  * generativelanguage endpoint with the reference's generation config,
  * read the first candidate part's `text`, `.strip()` it; liveness = the
  * models list the reference probes (utils.py:591). The API key is
  * carried per-request in the reference (workers.py:188-196, a
  * document-level field) — here it is a constructor arg so a deployment
  * chooses its own custody.
  */
case class GeminiTransport(apiKey: String,
    endpoint: String = "https://generativelanguage.googleapis.com/v1beta")
    extends HttpLlmTransport {
  // the key rides in the documented x-goog-api-key HEADER, never the URL:
  // keys in a query string land in proxy/server access logs and any
  // exception message that echoes the request line
  private def keyHeader: Seq[(String, String)] = Seq("x-goog-api-key" -> apiKey)

  override def generate(model: String, prompt: String): String = {
    val body = post(s"$endpoint/models/$model:generateContent",
      LlmWire.geminiPayload(prompt), keyHeader)
    // bound the "text" search to the candidates ARRAY itself: a
    // non-candidate text-bearing structure (promptFeedback, citation
    // metadata) before OR after the array must never bind as the reply
    val cand = LlmWire.arraySlice(body, "candidates")
      .getOrElse(throw new DeterministicLlmError("no 'candidates' in Gemini reply"))
    requiredField(cand, "text", "Gemini")
  }
  override def live(): Boolean = getOk(s"$endpoint/models", keyHeader)
}
