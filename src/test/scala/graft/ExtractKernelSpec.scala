package graft

import graft.extract.ExtractKernel
import org.scalatest.funsuite.AnyFunSuite

/** Golden span-sequence tests for the extraction kernel semantics
  * (SURVEY.md §5.2 item 1/2). Each rule cites the reference behavior it
  * mirrors (file:line into /root/reference).
  */
class ExtractKernelSpec extends AnyFunSuite {

  private def t(text: String, off: Int): ExtractKernel.S = ("text", text, null, off)
  private def run(spans: ExtractKernel.S*): Seq[ExtractKernel.S] =
    ExtractKernel.extractDoc("doc-x", spans)

  // E3 — paragraph join: every paragraph appended + "\n", blanks KEPT,
  // final strip (reference utils.py:147-156)
  test("paragraphs join with \\n, interior blanks kept, ends stripped") {
    assert(run(t("a", 0), t("", 1), t("b", 2)) ===
      Seq(("text", "a\n\nb", null, 0)))
  }

  test("leading/trailing blank paragraphs stripped by final strip") {
    assert(run(t("", 0), t("hello", 1), t("", 2)) ===
      Seq(("text", "hello", null, 0)))
  }

  // E1 — OCR normalization chain (frozen order: ligatures, de-hyphenation,
  // control chars, CRLF, space collapse, strip); reference strips tesseract
  // output (utils.py:61-65)
  test("ocr normalization: ligatures, soft hyphen, whitespace collapse") {
    val got = run(("ocr", "  ﬁne o­ rder\tx ", null, 0))
    assert(got === Seq(("text", "fine order x", null, 0)))
  }

  test("ocr CRLF becomes LF; control chars dropped") {
    val got = run(("ocr", "a\r\nbc", null, 0))
    assert(got === Seq(("text", "a\nb" + "c", null, 0)))
  }

  // E2 — PDF reading order: page ASC, x-cluster(=x/300) ASC, y ASC, offset;
  // page texts concatenated with "\n" then strip (reference utils.py:92-122)
  test("pdf blocks re-ordered into reading order") {
    val got = run(
      ("pdf", "p0-right-top", "p0:x300:y0", 0),
      ("pdf", "p1-left", "p1:x0:y0", 1),
      ("pdf", "p0-left-bottom", "p0:x0:y100", 2),
      ("pdf", "p0-left-top", "p0:x0:y0", 3))
    assert(got === Seq(("text",
      "p0-left-top\np0-left-bottom\np0-right-top\np1-left", null, 0)))
  }

  test("pdf order ties broken by input offset") {
    val got = run(("pdf", "second", "p0:x0:y0", 5), ("pdf", "first", "p0:x0:y0", 2))
    assert(got === Seq(("text", "first\nsecond", null, 0)))
  }

  // E4 — Excel serialization: "Sheet: {name}\n" header, blank rows SKIPPED,
  // "\n" between sheets, final strip (reference utils.py:183-200)
  test("sheet serialization: header, blank-row skip, inter-sheet newline") {
    val got = run(
      ("text", "a\tb", "sheet:S0", 0),
      ("text", "  ", "sheet:S0", 1), // blank row skipped (utils.py:190-192)
      ("text", "c\td", "sheet:S1", 2))
    assert(got === Seq(("text", "Sheet: S0\na\tb\n\nSheet: S1\nc\td", null, 0)))
  }

  test("sheet with all-blank rows keeps its header") {
    val got = run(("text", "", "sheet:S0", 0))
    assert(got === Seq(("text", "Sheet: S0", null, 0)))
  }

  // E8 — media passthrough in position; runs split on kind change
  test("image span splits text runs and is preserved in position") {
    val got = run(t("a", 0), ("image", null, "media://m/1", 1), t("b", 2), t("c", 3))
    assert(got === Seq(
      ("text", "a", null, 0),
      ("image", null, "media://m/1", 1),
      ("text", "b\nc", null, 2)))
  }

  // E6 — empty-extraction sentinel (reference workers.py:70-75)
  test("empty doc yields sentinel error span") {
    assert(ExtractKernel.extractDoc("doc-0", Nil) === Seq(
      ("error", "[ERRO: Não foi possível extrair texto do arquivo doc-0]", null, 0)))
  }

  test("all-blank doc yields sentinel error span") {
    assert(run(t("", 0), t("  ", 1)) === Seq(
      ("error", "[ERRO: Não foi possível extrair texto do arquivo doc-x]", null, 0)))
  }

  // E5 — unknown kinds dead-lettered, not fatal (reference raises
  // ValueError utils.py:226-228; we drop + count)
  test("unknown kind is dropped; rest of doc survives") {
    val got = run(t("keep", 0), ("wingdings", "???", null, 1))
    assert(got === Seq(("text", "keep", null, 0)))
  }

  test("input offset order is restored before segmentation") {
    val got = run(t("b", 1), t("a", 0))
    assert(got === Seq(("text", "a\nb", null, 0)))
  }

  test("output offsets are consecutive and 0-based") {
    val got = run(
      ("image", null, "m0", 0), t("x", 1), ("image", null, "m1", 2), t("y", 3))
    assert(got.map(_._4) === got.indices)
  }
}
