package graft

import graft.textops.{TextAnalysis, WordStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 word-stats kernels must agree with the column-op forms
  * the audited queries used through round 5 (the kernels emit raw
  * integer counters; every ratio/rounding stays in unchanged Catalyst
  * expressions — so counter parity IS value parity for the eight
  * consumer queries).
  */
class WordStatsSpec extends AnyFunSuite with SparkSpec {

  // empties, doubled/leading/trailing spaces, stopwords of both
  // languages, punctuation-only words, unicode (including a
  // supplementary char and a combining sequence), digits, the '#'/'...'
  // Gopher symbols, long words
  private val fixtures = Seq(
    "",
    " ",
    "   ",
    "a",
    "the quick brown fox",
    "de a o e que do da em um para",
    "the  double  space case",
    " leading and trailing ",
    "no-letters 123 456 ... ### !!!",
    "the a and of to in is on for with repeated the the the",
    "café niño 😀word á",
    "para o the mix de stopwords in both tongues",
    ("w" * 50) + " " + ("x" * 3),
    "tab\tis one word here",
    "...")

  test("word_stats kernel == columnar reference on every counter") {
    import spark.implicits._
    val df = fixtures.toDF("s")
    val rows = df.select(
      WordStats.stats(col("s")).as("native"),
      WordStats.statsColumnar(col("s")).as("columnar")).collect()
    rows.zip(fixtures).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"input: '$s'")
    }
    // and the Scala twin agrees with both
    fixtures.foreach { s =>
      val idx = fixtures.indexOf(s)
      assert(WordStats.statsScala(s).toSeq === rows(idx).getSeq[Long](0),
        s"scala twin diverged on '$s'")
    }
  }

  test("term_counts kernel == columnar reference (search terms + decoys)") {
    import spark.implicits._
    val terms = TextAnalysis.SearchTerms
    val extra = fixtures ++ Seq(
      "window merge stream",
      "window window window",
      "windows streams merged", // near-misses must NOT count
      "merge the window into the stream and merge again",
      "stream")
    val df = extra.toDF("s")
    val rows = df.select(
      WordStats.termCounts(col("s"), terms).as("native"),
      WordStats.termCountsColumnar(col("s"), terms).as("columnar")).collect()
    rows.zip(extra).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"input: '$s'")
      assert(WordStats.termCountsScala(s, terms.toIndexedSeq).toSeq
        === r.getSeq[Long](0), s"scala twin diverged on '$s'")
    }
  }

  test("stats-derived query columns equal the round-5 word-array forms") {
    import spark.implicits._
    val df = fixtures.toDF("text")
    val ws = TextAnalysis.nonEmptyWords(col("text"))
    val st = WordStats.stats(col("text"))
    val rows = df.select(
      TextAnalysis.langGuessFromWords(ws).as("lg_w"),
      TextAnalysis.langGuessFromStats(st).as("lg_s"),
      TextAnalysis.gopherKeepFromWords(col("text"), ws).as("gk_w"),
      TextAnalysis.gopherKeepFromStats(col("text"), st).as("gk_s")).collect()
    rows.zip(fixtures).foreach { case (r, s) =>
      assert(r.getString(0) === r.getString(1), s"lang guess diverged on '$s'")
      assert(r.getBoolean(2) === r.getBoolean(3), s"gopher keep diverged on '$s'")
    }
  }
}
