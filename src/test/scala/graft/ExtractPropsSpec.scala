package graft

import graft.extract.{ExtractKernel, Extractor}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the extraction kernel (SURVEY.md §5.2
  * item 3). Uses bare ScalaCheck generators sampled over fixed seeds
  * (scalatestplus bridge isn't in the offline cache) — 300 deterministic
  * cases per property.
  */
class ExtractPropsSpec extends AnyFunSuite {

  private val word = Gen.oneOf("alpha", "beta", "gamma", "", " ", "x", "fi")
  private val text = Gen.listOf(word).map(_.mkString(" "))

  private val genSpan: Gen[(String, String, String)] = Gen.oneOf(
    text.map(t => ("text", t, null: String)),
    text.map(t => ("ocr", t, null: String)),
    Gen.zip(text, Gen.choose(0, 3), Gen.choose(0, 1), Gen.choose(0, 2))
      .map { case (t, p, x, y) => ("pdf", t, s"p$p:x${x * 300}:y${y * 100}") },
    Gen.zip(text, Gen.choose(0, 1)).map { case (t, s) => ("text", t, s"sheet:S$s") },
    Gen.const(("image", null: String, "media://d/0")))

  private val genDoc: Gen[Seq[ExtractKernel.S]] =
    Gen.listOf(genSpan).map(_.zipWithIndex.map { case ((k, t, m), i) => (k, t, m, i) })

  private def forAllDocs(check: Seq[ExtractKernel.S] => Unit): Unit =
    (0 until 300).foreach { i =>
      val doc = genDoc.pureApply(Gen.Parameters.default.withSize(1 + i % 40), Seed(i.toLong))
      check(doc)
    }

  test("output offsets are always consecutive 0-based") {
    forAllDocs { spans =>
      val out = ExtractKernel.extractDoc("d", spans)
      assert(out.map(_._4) === out.indices)
    }
  }

  test("output is never empty (sentinel fallback)") {
    forAllDocs(spans => assert(ExtractKernel.extractDoc("d", spans).nonEmpty))
  }

  test("image spans preserved in relative order with media_ref intact") {
    forAllDocs { spans =>
      val inImgs = spans.sortBy(_._4).filter(_._1 == "image").map(_._3)
      val outImgs = ExtractKernel.extractDoc("d", spans).filter(_._1 == "image").map(_._3)
      assert(outImgs === inImgs)
    }
  }

  test("extraction is invariant under input span permutation (offset defines order)") {
    forAllDocs { spans =>
      assert(ExtractKernel.extractDoc("d", spans.reverse) ===
        ExtractKernel.extractDoc("d", spans))
    }
  }

  test("re-extraction merges adjacent text spans and changes nothing else") {
    // extraction is not literally idempotent: consecutive text spans in the
    // output (separated by an image that splits a run) re-join with "\n" on
    // a second pass. That merge is the ONLY change a second pass may make.
    forAllDocs { spans =>
      val once = ExtractKernel.extractDoc("d", spans)
      val merged = {
        val kept = once.filterNot(_._1 == "error")
        val out = kept.foldLeft(Vector.empty[(String, String, String)]) {
          case (acc :+ ((kp, tp, mp)), (k, t, _, _)) if kp == "text" && k == "text" =>
            acc :+ (("text", tp + "\n" + t, mp))
          case (acc, (k, t, m, _)) => acc :+ ((k, t, m))
        }
        val withSentinel =
          if (out.isEmpty) Vector(("error", Extractor.SentinelPrefix + "d]", null))
          else out
        withSentinel.zipWithIndex.map { case ((k, t, m), i) => (k, t, m, i) }
      }
      assert(ExtractKernel.extractDoc("d", once) === merged)
    }
  }

  test("output kinds are only text/image/error") {
    forAllDocs { spans =>
      assert(ExtractKernel.extractDoc("d", spans).map(_._1).toSet
        .subsetOf(Set("text", "image", "error")))
    }
  }
}
