package graft

import graft.textops.{Dsir, LmScore, PortableHash}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the CCNet-style LM scoring / bucketing and the DSIR
  * importance-resampling selector against brute-force Scala references
  * built from RAW STRINGS (no hashing on the reference path, so a hash
  * bug cannot cancel out); the DuckDB oracle is the value gate.
  */
class LmScoreSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def u6(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private lazy val docs: Map[Long, (String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("text"))).toMap

  private def words(t: String): Array[String] = t.split(" ").filter(_.nonEmpty)

  /** Brute-force bigram LM: raw-string counts, micro-quantized terms. */
  private lazy val reference: Map[Long, (Long, Long)] = { // id -> (nBigrams, nllSum)
    val bigrams = docs.view.mapValues { case (_, t) =>
      words(t).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
    }.toMap
    val c12 = new scala.collection.mutable.HashMap[(String, String), Long]
    val c1 = new scala.collection.mutable.HashMap[String, Long]
    bigrams.values.foreach(_.foreach { bg =>
      c12(bg) = c12.getOrElse(bg, 0L) + 1
      c1(bg._1) = c1.getOrElse(bg._1, 0L) + 1
    })
    val v = docs.values.flatMap { case (_, t) => words(t) }.toSet.size.toLong
    bigrams.view.mapValues { bgs =>
      val terms = bgs.map(bg =>
        u6(1e6 * math.log((c1(bg._1) + v).toDouble / (c12(bg) + 1).toDouble)))
      (bgs.length.toLong, terms.sum)
    }.toMap
  }

  test("text_lm_score matches the raw-string brute-force bigram LM") {
    val rows = LmScore.score(spark, sf).collect()
    assert(rows.length === docs.size)
    var kept = 0; var cut = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nBg, nllSum) = reference(id)
      assert(r.getAs[Long]("n_bigrams") === nBg, s"doc $id")
      assert(r.getAs[Long]("nll_micro_sum") === nllSum, s"doc $id")
      val avg = u6(nllSum.toDouble / nBg)
      assert(r.getAs[Long]("avg_nll_micro") === avg, s"doc $id")
      assert(r.getAs[Boolean]("keep") === (avg <= LmScore.LmNllMaxMicro), s"doc $id")
      if (r.getAs[Boolean]("keep")) kept += 1 else cut += 1
    }
    assert(kept > 0 && cut > 0, "threshold must be non-vacuous on the fixture")
  }

  test("text_lm_score_cross trains on the en slice and penalizes unseen grams") {
    val c12 = new scala.collection.mutable.HashMap[(String, String), Long]
    val c1 = new scala.collection.mutable.HashMap[String, Long]
    docs.foreach { case (_, (lang, t)) =>
      if (lang == LmScore.TrainLang)
        words(t).sliding(2).filter(_.length == 2).foreach { a =>
          c12((a(0), a(1))) = c12.getOrElse((a(0), a(1)), 0L) + 1
          c1(a(0)) = c1.getOrElse(a(0), 0L) + 1
        }
    }
    val v = docs.values.collect { case (LmScore.TrainLang, t) => words(t) }
      .flatten.toSet.size.toLong

    val rows = LmScore.scoreCross(spark, sf).collect()
    assert(rows.length === docs.size)
    var enKept = 0; var crossPenalized = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, t) = docs(id)
      val bgs = words(t).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toSeq
      val terms = bgs.map(bg => u6(1e6 * math.log(
        (c1.getOrElse(bg._1, 0L) + v).toDouble /
          (c12.getOrElse(bg, 0L) + 1).toDouble)))
      assert(r.getAs[Long]("n_bigrams") === bgs.length.toLong, s"doc $id")
      assert(r.getAs[Long]("nll_micro_sum") === terms.sum, s"doc $id")
      val avg = u6(terms.sum.toDouble / bgs.length)
      assert(r.getAs[Boolean]("keep") === (avg <= LmScore.LmNllMaxMicro), s"doc $id")
      if (lang == LmScore.TrainLang && r.getAs[Boolean]("keep")) enKept += 1
      // the unseen-gram penalty: at least one out-of-slice doc must carry
      // a bigram absent from the en counts, whose term is exactly ln(V)
      // (c12 = c1 = 0) — the brute force above computed it that way, so
      // value agreement already proves the LEFT-join path; here we just
      // require the case to be exercised non-vacuously
      if (lang != LmScore.TrainLang && bgs.exists(bg => !c12.contains(bg)))
        crossPenalized += 1
    }
    assert(enKept > 0, "in-slice docs must survive the same threshold")
    assert(crossPenalized > 0, "the unseen-gram penalty must be exercised")
  }

  test("corpus_ppl_buckets assigns histogram tertiles per language") {
    val avg = reference.map { case (id, (n, s)) => id -> u6(s.toDouble / n) }
    val bins = avg.view.mapValues(_ / LmScore.BinMicro).toMap
    val cuts = docs.groupBy(_._2._1).map { case (lang, ds) =>
      val bs = ds.keys.toSeq.map(bins).sorted // toSeq FIRST: Set#map dedupes
      val n = bs.size
      def cut(k: Int) = bs.distinct.find(b => bs.count(_ <= b) * 3 >= n * k).get
      lang -> (cut(1), cut(2))
    }
    val rows = LmScore.buckets(spark, sf).collect()
    assert(rows.length === docs.size)
    val seen = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val lang = docs(id)._1
      val (hc, mc) = cuts(lang)
      val b = bins(id)
      val want = if (b <= hc) "head" else if (b <= mc) "middle" else "tail"
      assert(r.getAs[String]("bucket") === want, s"doc $id")
      assert(r.getAs[Boolean]("keep") === (want != "tail"), s"doc $id")
      seen += want
    }
    assert(seen === Set("head", "middle", "tail"))
  }

  test("corpus_dsir matches the brute-force importance weights") {
    val grams = docs.view.mapValues { case (_, t) =>
      val ws = words(t)
      ws.toSeq ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }.toMap
    val b = grams.view.mapValues(_.map(g =>
      PortableHash.hexint32(g) % Dsir.Buckets)).toMap
    val raw = new scala.collection.mutable.HashMap[Long, Long]
    val tgt = new scala.collection.mutable.HashMap[Long, Long]
    b.foreach { case (id, bs) =>
      bs.foreach { bb =>
        raw(bb) = raw.getOrElse(bb, 0L) + 1
        if (docs(id)._1 == Dsir.TargetLang) tgt(bb) = tgt.getOrElse(bb, 0L) + 1
      }
    }
    val tRaw = raw.values.sum; val tTgt = tgt.values.sum
    val lam = (0L until Dsir.Buckets).map { bb =>
      bb -> u6(1e6 * (
        math.log((tgt.getOrElse(bb, 0L) + 1).toDouble / (tTgt + Dsir.Buckets)) -
        math.log((raw.getOrElse(bb, 0L) + 1).toDouble / (tRaw + Dsir.Buckets))))
    }.toMap

    val rows = Dsir.select(spark, sf).collect()
    assert(rows.length === docs.size)
    var kept = 0; var cut = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bs = b(id)
      val wSum = bs.map(lam).sum
      assert(r.getAs[Long]("n_grams") === bs.length.toLong, s"doc $id")
      assert(r.getAs[Long]("w_micro_sum") === wSum, s"doc $id")
      val avgW = u6(wSum.toDouble / bs.length)
      assert(r.getAs[Long]("avg_w_micro") === avgW, s"doc $id")
      val gh = PortableHash.hexint32(s"dsir:$id") % 1000000L
      val gumbel = u6(-1e6 * math.log(-math.log((gh + 0.5) / 1e6)))
      assert(r.getAs[Long]("gumbel_micro") === gumbel, s"doc $id")
      assert(r.getAs[Long]("score_micro") === avgW + gumbel, s"doc $id")
      assert(r.getAs[Boolean]("keep") ===
        (avgW + gumbel >= Dsir.ThresholdMicro), s"doc $id")
      if (r.getAs[Boolean]("keep")) kept += 1 else cut += 1
    }
    assert(kept > 0 && cut > 0, "threshold must be non-vacuous on the fixture")
  }

  test("degenerate docs (empty / one word) score NULL and are never kept") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    new java.io.File(dir).deleteOnExit()
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "one", "en", "web", 3L),
      (3L, "a b a b", "en", "web", 7L),
      (4L, "a b c d", "pt", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val sc = LmScore.score(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(sc(1L).getAs[Long]("n_bigrams") === 0L)
    assert(sc(1L).isNullAt(sc(1L).fieldIndex("avg_nll_micro")))
    assert(!sc(1L).getAs[Boolean]("keep"))
    assert(sc(2L).getAs[Long]("n_bigrams") === 0L)
    assert(!sc(2L).getAs[Boolean]("keep"))
    assert(sc(3L).getAs[Long]("n_bigrams") === 3L)
    assert(sc(4L).getAs[Long]("n_bigrams") === 3L)

    val bk = LmScore.buckets(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(bk(1L).getAs[String]("bucket") === "tail")
    assert(!bk(1L).getAs[Boolean]("keep"))
    // single scored doc in a lang: its bin is both cutoffs -> head
    assert(bk(4L).getAs[String]("bucket") === "head")

    val ds = Dsir.select(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(ds(1L).getAs[Long]("n_grams") === 0L)
    assert(ds(1L).isNullAt(ds(1L).fieldIndex("score_micro")))
    assert(!ds(1L).getAs[Boolean]("keep"))
    assert(ds(2L).getAs[Long]("n_grams") === 1L) // unigram only
  }
}
