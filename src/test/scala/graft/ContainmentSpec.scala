package graft

import graft.textops.{Corpus, Dedup, PortableHash}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of containment dedup, incremental delta-vs-base dedup, and
  * the corpus-stats card against raw-string brute-force references (no
  * hashing on the reference path where the op hashes, so a hash bug
  * cannot cancel out); the DuckDB oracle is the value gate.
  */
class ContainmentSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private lazy val docs: Map[Long, (String, String, String, Long)] =
    spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[String]("lang"),
          r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toMap

  /** Raw-string gram set: word 5-grams, whole text below 5 words (the
    * [[graft.textops.TextAnalysis.gramHashesScala]] contract).
    */
  private def gramSet(text: String): Set[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < 5) Set(text)
    else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" ")).toSet
  }

  test("dedup_containment matches the raw-string brute force") {
    val grams = docs.view.mapValues { case (t, _, _, _) => gramSet(t) }.toMap
    val df = new scala.collection.mutable.HashMap[String, Long]
    grams.values.foreach(_.foreach(g => df(g) = df.getOrElse(g, 0L) + 1))
    val rare = grams.view
      .mapValues(_.filter(g => df(g) <= Dedup.ContainmentGramDfMax)).toMap
    val expected = (for {
      (a, ga) <- rare.toSeq; if ga.size >= Dedup.ContainmentMinGrams
      (b, gb) <- rare.toSeq; if a != b
      inter = (ga & gb).size
      c = BigDecimal(inter.toDouble / ga.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if inter > 0 && c >= Dedup.ContainmentThreshold
    } yield (a, b) -> (ga.size.toLong, inter.toLong, c)).toMap

    val rows = Dedup.containment(spark, sf).collect()
    assert(rows.length === expected.size)
    assert(rows.nonEmpty, "fixture must exercise the op (planted dups)")
    rows.foreach { r =>
      val key = (r.getAs[Long]("id_contained"), r.getAs[Long]("id_container"))
      val (nRare, inter, c) = expected(key)
      assert(r.getAs[Long]("n_rare") === nRare, s"$key")
      assert(r.getAs[Long]("n_shared") === inter, s"$key")
      assert(r.getAs[Double]("containment") === c, s"$key")
    }
  }

  test("containment is asymmetric: quote-inclusion detected one way only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    new java.io.File(dir).deleteOnExit()
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = s"intro words before the quote $small and plenty of trailing " +
      "commentary that makes the union much larger than the quoted article"
    Seq(
      (1L, small, "en", "web", small.length.toLong),
      (2L, big, "en", "web", big.length.toLong),
      (3L, "completely unrelated content about other things entirely here",
        "en", "web", 61L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = Dedup.containment(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_contained"), r.getAs[Long]("id_container")))
    assert(rows.contains((1L, 2L)), "small doc contained in the big one")
    assert(!rows.contains((2L, 1L)), "the container is NOT contained")
    assert(!rows.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedup_incremental matches the brute-force delta-vs-base split") {
    val hash = docs.view.mapValues { case (t, _, _, _) =>
      PortableHash.hexint60(t) }.toMap
    val inBase = docs.keys.map(id =>
      id -> (PortableHash.hexint32(s"incr:$id") % 100 < Dedup.IncrementalBasePct))
      .toMap
    val baseSigs = docs.keys.filter(inBase).map(hash).toSet
    val delta = docs.keys.filterNot(inBase).toSeq.sorted
    assert(delta.nonEmpty && delta.size < docs.size)
    val firstDelta = delta.groupBy(hash).view.mapValues(_.min).toMap

    val rows = Dedup.incremental(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === delta)
    var anyDup = false
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val dupBase = baseSigs.contains(hash(id))
      val dupDelta = firstDelta(hash(id)) != id
      assert(r.getAs[Long]("text_hash") === hash(id), s"doc $id")
      assert(r.getAs[Boolean]("dup_of_base") === dupBase, s"doc $id")
      assert(r.getAs[Boolean]("dup_in_delta") === dupDelta, s"doc $id")
      assert(r.getAs[Boolean]("keep") === (!dupBase && !dupDelta), s"doc $id")
      anyDup ||= dupBase || dupDelta
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "some delta docs survive")
  }

  test("corpus_stats CUBE levels are complete, null-free, and consistent") {
    val rows = Corpus.stats(spark, sf).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L))

    def tokens(t: String) = t.split(" ").count(_.nonEmpty).toLong
    val total = byGid(3L) match { case Array(r) => r }
    assert(total.getAs[String]("lang") === Corpus.StatsAll)
    assert(total.getAs[String]("source") === Corpus.StatsAll)
    assert(total.getAs[Long]("n_docs") === docs.size.toLong)
    assert(total.getAs[Long]("tokens") ===
      docs.values.map(v => tokens(v._1)).sum)
    assert(total.getAs[Long]("chars") === docs.values.map(_._4).sum)

    // per-lang level sums back to the grand total; detail level matches
    // a brute-force group-by
    assert(byGid(1L).map(_.getAs[Long]("n_docs")).sum === docs.size.toLong)
    val detail = docs.values.groupBy(v => (v._2, v._3)).view
      .mapValues(vs => (vs.size.toLong, vs.map(v => tokens(v._1)).sum)).toMap
    assert(byGid(0L).length === detail.size)
    byGid(0L).foreach { r =>
      val (n, tk) = detail((r.getAs[String]("lang"), r.getAs[String]("source")))
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("tokens") === tk)
    }
    rows.foreach { r =>
      assert(r.getAs[String]("lang") != null && r.getAs[String]("source") != null)
    }
  }

  test("corpus_filter_ensemble agrees with every standalone audited signal") {
    import graft.textops.{LmScore, TextAnalysis}
    def keepMap(df: org.apache.spark.sql.DataFrame, col: String = "keep") =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean](col)).toMap
    val gop = keepMap(TextAnalysis.gopherRules(spark, sf))
    val clf = keepMap(TextAnalysis.qualityClassifier(spark, sf))
    val lm = keepMap(LmScore.score(spark, sf))
    val dup = keepMap(Dedup.exact(spark, sf), "is_duplicate")

    val rows = Corpus.filterEnsemble(spark, sf).collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("gopher_keep") === gop(id), s"doc $id gopher")
      assert(r.getAs[Boolean]("clf_keep") === clf(id), s"doc $id clf")
      assert(r.getAs[Boolean]("lm_keep") === lm(id), s"doc $id lm")
      assert(r.getAs[Boolean]("dedup_keep") === !dup(id), s"doc $id dedup")
      assert(r.getAs[Boolean]("keep") ===
        (gop(id) && clf(id) && lm(id) && !dup(id)), s"doc $id")
    }
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("corpus_stats normalizes NULL inputs: own category, zero-token text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    new java.io.File(dir).deleteOnExit()
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "three little words", "en", "web", 18L),
      org.apache.spark.sql.Row(2L, null, null, "web", null),
      org.apache.spark.sql.Row(3L, "more text here", null, null, 14L))
    spark.createDataFrame(rows, schema).write.parquet(s"$dir/documents.parquet")

    val out = Corpus.stats(spark, dir).collect()
    val detail = out.filter(_.getAs[Long]("gid") == 0L)
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r).toMap
    // null dims group as their own <null> category, never as a roll-up
    assert(detail.keySet === Set(
      ("en", "web"), (Corpus.StatsNull, "web"), (Corpus.StatsNull, Corpus.StatsNull)))
    val nullRow = detail((Corpus.StatsNull, "web"))
    // null text counts 0 tokens (Spark's size(null) = -1 must not leak)
    assert(nullRow.getAs[Long]("tokens") === 0L)
    assert(nullRow.getAs[Long]("chars") === 0L)
    val total = out.filter(_.getAs[Long]("gid") == 3L).head
    assert(total.getAs[Long]("n_docs") === 3L)
    assert(total.getAs[Long]("tokens") === 6L)
    assert(total.getAs[String]("lang") === Corpus.StatsAll)
  }
}
