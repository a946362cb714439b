package graft

import graft.extract.HtmlStrip
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the HTML main-content extractor (E7, north_rule):
  * tag-density + link-ratio block scoring. Thresholds are frozen constants
  * (MinBlockChars=3, MaxLinkDensity=0.4) — goldens define the contract.
  */
class HtmlStripSpec extends AnyFunSuite {

  test("boilerplate subtrees dropped entirely") {
    val html = "<html><head><title>T</title></head><body>" +
      "<nav><a href=\"/\">Home</a></nav><p>main content here</p>" +
      "<footer>copyright</footer></body></html>"
    assert(HtmlStrip.strip(html) === Seq(("text", "main content here", null)))
  }

  test("each block tag flushes a separate span") {
    val html = "<p>first para</p><p>second para</p>"
    assert(HtmlStrip.strip(html) ===
      Seq(("text", "first para", null), ("text", "second para", null)))
  }

  test("high link-density blocks dropped") {
    val html = "<p>real sentence with words</p>" +
      "<div><a href=\"/a\">link one</a> <a href=\"/b\">link two</a></div>"
    assert(HtmlStrip.strip(html) === Seq(("text", "real sentence with words", null)))
  }

  test("short blocks below MinBlockChars dropped") {
    assert(HtmlStrip.strip("<p>ab</p><p>long enough</p>") ===
      Seq(("text", "long enough", null)))
  }

  test("img outside boilerplate emits image span in position") {
    val html = "<p>before text</p><img src=\"media://d/0\"><p>after text</p>"
    assert(HtmlStrip.strip(html) === Seq(
      ("text", "before text", null),
      ("image", null, "media://d/0"),
      ("text", "after text", null)))
  }

  test("img inside boilerplate is dropped") {
    assert(HtmlStrip.strip("<nav><img src=\"x.png\"></nav><p>body text</p>") ===
      Seq(("text", "body text", null)))
  }

  test("inline tags are transparent; entities decoded; whitespace collapsed") {
    val html = "<p>a &amp; b\n\t  <b>c</b>&nbsp;d&#39;s</p>"
    assert(HtmlStrip.strip(html) === Seq(("text", "a & b c d's", null)))
  }

  test("anchor text counts toward link density but is kept in low-density blocks") {
    val html = "<p>a perfectly normal paragraph with one <a href=\"/x\">link</a> inside</p>"
    assert(HtmlStrip.strip(html) === Seq(
      ("text", "a perfectly normal paragraph with one link inside", null)))
  }

  test("nested same-name boilerplate handled by depth counting") {
    val html = "<div><form>outer<form>inner</form>still skipped</form>kept text</div>"
    assert(HtmlStrip.strip(html) === Seq(("text", "kept text", null)))
  }

  test("empty input yields no spans") {
    assert(HtmlStrip.strip("") === Seq.empty)
  }

  test("malformed trailing tag dropped without error") {
    assert(HtmlStrip.strip("<p>good text</p><p unclosed") ===
      Seq(("text", "good text", null)))
  }
}
