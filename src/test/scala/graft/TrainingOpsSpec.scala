package graft

import graft.textops.{Corpus, Dedup, PortableHash, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-5 training-data ops (duplicate-passage
  * detection, domain-mix planning, linear quality classifier) against
  * brute-force Scala references; the DuckDB oracle is the value gate.
  */
class TrainingOpsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private lazy val docs: Map[Long, String] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

  test("dup_passages counts exactly the distinct grams shared with another doc") {
    val rows = Dedup.dupPassages(spark, sf).collect()
    assert(rows.length === docs.size)
    val gramSets = docs.map { case (id, t) =>
      id -> TextAnalysis.gramHashesScala(t).toSet
    }
    val freq = new scala.collection.mutable.HashMap[Long, Int]
    gramSets.values.foreach(_.foreach(g => freq(g) = freq.getOrElse(g, 0) + 1))
    var fullDups = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val grams = gramSets(id)
      val dup = grams.count(g => freq(g) >= 2)
      assert(r.getAs[Int]("n_distinct_grams") === grams.size, s"doc $id")
      assert(r.getAs[Long]("dup_grams") === dup.toLong, s"doc $id")
      val frac = BigDecimal(dup.toDouble / grams.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("dup_frac") === frac, s"doc $id")
      assert(r.getAs[Boolean]("keep") === (frac <= Dedup.DupPassageFracMax), s"doc $id")
      if (frac == 1.0) fullDups += 1
    }
    // the fixture corpus plants exact duplicates: they share EVERY gram,
    // so the query must see full-dup docs (not vacuous)
    assert(fullDups > 0)
  }

  test("unicode fixing matches Normalizer NFC after the control strip") {
    val rows = TextAnalysis.fixUnicode(spark, sf).collect()
    assert(rows.length === docs.size)
    var composed = 0; var untouched = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val planted = (id % 3).toInt match {
        case 0 => docs(id) + " cafe\u0301 menu"
        case 1 => docs(id) + " nin\u0303o\u0007 data"
        case _ => docs(id)
      }
      val clean = java.text.Normalizer.normalize(
        planted.replaceAll(TextAnalysis.ControlCharPattern, ""),
        java.text.Normalizer.Form.NFC)
      assert(r.getAs[String]("clean_text") === clean, s"doc $id")
      assert(r.getAs[Long]("len_before") === planted.length.toLong, s"doc $id")
      assert(r.getAs[Long]("len_after") === clean.length.toLong, s"doc $id")
      assert(r.getAs[Boolean]("changed") === (clean != planted), s"doc $id")
      if (id % 3 == 0) { composed += 1; assert(r.getAs[Boolean]("changed"), s"doc $id") }
      // tilde composes (-1) and the BEL strips (-1)
      if (id % 3 == 1) assert(r.getAs[Long]("len_after") === planted.length - 2L, s"doc $id")
      if (id % 3 == 2) { untouched += 1; assert(!r.getAs[Boolean]("changed"), s"doc $id") }
    }
    assert(composed > 0 && untouched > 0)
  }

  test("paragraph dedup removes exactly the non-keeper copies of shared paragraphs") {
    val rows = Dedup.dedupParagraphs(spark, sf).collect()
    assert(rows.length === docs.size)
    val k = Dedup.ParaChunkWords
    def paras(t: String): Array[String] =
      t.split(" ", -1).filter(_.nonEmpty).grouped(k).map(_.mkString(" ")).toArray
    val perDoc = docs.map { case (id, t) => id -> paras(t) }
    val holders = new scala.collection.mutable.HashMap[String, scala.collection.mutable.Set[Long]]
    perDoc.foreach { case (id, ps) =>
      ps.foreach(p => holders.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += id)
    }
    var edited = 0; var partialEdits = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ps = perDoc(id)
      val kept = ps.filter(p => holders(p).size < 2 || holders(p).min == id)
      assert(r.getAs[Long]("n_paras") === ps.length.toLong, s"doc $id")
      assert(r.getAs[Long]("n_dropped") === (ps.length - kept.length).toLong, s"doc $id")
      assert(r.getAs[String]("clean_text") === kept.mkString("\n"), s"doc $id")
      if (kept.length < ps.length) {
        edited += 1
        if (kept.nonEmpty) partialEdits += 1
      }
    }
    // non-vacuous: the planted exact-dup docs lose all paragraphs, and the
    // template-spam case (boilerplate removed, unique content kept) occurs
    assert(edited > 0, "no doc was edited — fixture is vacuous")
    assert(partialEdits > 0, "no partial edit — the RefinedWeb case is untested")
  }

  test("c4 cleaning matches a brute-force line-rule reference") {
    val rows = TextAnalysis.c4Clean(spark, sf).collect()
    assert(rows.length === docs.size)
    val punct = Set('.', '!', '?', '"')
    var jsDocs = 0; var pageDrops = 0; var raggedDrops = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ws = docs(id).split(" ", -1).filter(_.nonEmpty)
      val k = TextAnalysis.C4PlantLineWords
      var lines = ws.grouped(k).zipWithIndex.map { case (chunk, i) =>
        chunk.mkString(" ") + (((id + i) % 3) match {
          case 0 => " ."; case 1 => " !"; case _ => "" })
      }.toArray
      if (id % 7 == 0) lines :+= TextAnalysis.C4FooterLine
      if (id % 11 == 0) lines :+= "please enable javascript to view this page ."
      if (id % 13 == 0) lines :+= "lorem ipsum dolor sit amet consectetur ."
      if (id % 17 == 0) lines :+= "function main ( ) { return 0 }"
      val kept = lines.filter { l =>
        val lw = l.split(" ", -1).filter(_.nonEmpty)
        punct.contains(l.last) &&
          lw.count(w => !TextAnalysis.C4PunctTokens.contains(w)) >=
            TextAnalysis.C4LineMinWords &&
          !lw.contains("javascript")
      }
      val full = lines.mkString("\n")
      val keep = kept.length >= TextAnalysis.C4PageMinLines &&
        !full.contains("lorem ipsum") && !full.contains("{")
      assert(r.getAs[Long]("n_lines") === lines.length.toLong, s"doc $id")
      assert(r.getAs[Long]("n_kept") === kept.length.toLong, s"doc $id")
      assert(r.getAs[Boolean]("page_keep") === keep, s"doc $id")
      assert(r.getAs[String]("clean_text") === kept.mkString("\n"), s"doc $id")
      if (id % 11 == 0) jsDocs += 1
      if (!keep) pageDrops += 1
      if (lines.exists(l => punct.contains(l.last) &&
        l.split(" ", -1).count(w =>
          w.nonEmpty && !TextAnalysis.C4PunctTokens.contains(w)) <
          TextAnalysis.C4LineMinWords)) raggedDrops += 1
    }
    // every rule must be exercised by the fixture, not vacuous: the
    // javascript word rule (lines that pass punct+length but carry the
    // token), page-level drops, and ragged short lines with punctuation
    assert(jsDocs > 0 && pageDrops > 0 && raggedDrops > 0)
    // the javascript poison line never survives into clean_text
    assert(rows.forall(!_.getAs[String]("clean_text").contains("javascript")))
  }

  test("clean pipeline composes unicode fix -> c4 rules -> line dedup") {
    val rows = TextAnalysis.cleanPipeline(spark, sf).collect()
    val punct = Set('.', '!', '?', '"')
    def plantU(id: Long, t: String): String = (id % 3).toInt match {
      case 0 => t + " café menu"
      case 1 => t + " niño data"
      case _ => t
    }
    def linesOf(id: Long, fixed: String): Array[String] = {
      var ls = fixed.split(" ", -1).filter(_.nonEmpty)
        .grouped(TextAnalysis.C4PlantLineWords).zipWithIndex.map { case (c, i) =>
          c.mkString(" ") + (((id + i) % 3) match {
            case 0 => " ."; case 1 => " !"; case _ => "" })
        }.toArray
      if (id % 7 == 0) ls :+= TextAnalysis.C4FooterLine
      if (id % 11 == 0) ls :+= "please enable javascript to view this page ."
      if (id % 13 == 0) ls :+= "lorem ipsum dolor sit amet consectetur ."
      if (id % 17 == 0) ls :+= "function main ( ) { return 0 }"
      ls
    }
    def keptOf(ls: Array[String]): Array[String] = ls.filter { l =>
      val lw = l.split(" ", -1).filter(_.nonEmpty)
      punct.contains(l.last) &&
        lw.count(w => !TextAnalysis.C4PunctTokens.contains(w)) >=
          TextAnalysis.C4LineMinWords &&
        !lw.contains("javascript")
    }
    val pages = docs.map { case (id, t) =>
      val fixed = java.text.Normalizer.normalize(
        plantU(id, t).replaceAll(TextAnalysis.ControlCharPattern, ""),
        java.text.Normalizer.Form.NFC)
      val ls = linesOf(id, fixed)
      val kept = keptOf(ls)
      (id, ls, kept)
    }.filter { case (_, ls, kept) =>
      val full = ls.mkString("\n")
      kept.length >= TextAnalysis.C4PageMinLines &&
        !full.contains("lorem ipsum") && !full.contains("{")
    }.map { case (id, _, kept) => id -> kept }.toMap
    assert(rows.length === pages.size)
    val holders = new scala.collection.mutable.HashMap[String, scala.collection.mutable.Set[Long]]
    pages.foreach { case (id, ps) =>
      ps.foreach(l => holders.getOrElseUpdate(l, scala.collection.mutable.Set.empty) += id)
    }
    var footerKept = 0L; var footerDropped = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ps = pages(id)
      val expect = ps.filter(l => holders(l).size < 2 || holders(l).min == id)
      assert(r.getAs[Long]("n_paras") === ps.length.toLong, s"doc $id")
      assert(r.getAs[Long]("n_dropped") === (ps.length - expect.length).toLong, s"doc $id")
      assert(r.getAs[String]("clean_text") === expect.mkString("\n"), s"doc $id")
      val hadFooter = ps.contains(TextAnalysis.C4FooterLine)
      val hasFooter = expect.contains(TextAnalysis.C4FooterLine)
      if (hadFooter && hasFooter) footerKept += 1
      if (hadFooter && !hasFooter) footerDropped += 1
    }
    // the RefinedWeb case end to end: the planted boilerplate footer
    // survives in EXACTLY ONE page and is stripped from every other
    assert(footerKept === 1, "footer must survive in exactly the keeper page")
    assert(footerDropped > 0, "footer dedup never fired — fixture vacuous")
  }

  test("mix_plan rates and keeps match the integer temperature-sampling reference") {
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    def tokens(t: String): Long = t.split(" ", -1).count(_.nonEmpty).toLong
    val bySrc = docs.groupBy { case (id, _) => srcOf(id) }
    val srcTokens = bySrc.map { case (s, ds) => s -> ds.values.map(tokens).sum }
    val weight = srcTokens.map { case (s, t) => s -> math.floor(math.sqrt(t.toDouble)).toLong }
    val total = srcTokens.values.sum
    val totalW = weight.values.sum
    def rate(s: String): Long =
      if (srcTokens(s) == 0) 0L
      else math.min(1000L, (total / Corpus.MixBudgetDiv) * weight(s) * 1000 / (totalW * srcTokens(s)))
    val rows = Corpus.mixPlan(spark, sf).collect()
    assert(rows.length === bySrc.size)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("n_docs") === bySrc(s).size.toLong)
      assert(r.getAs[Long]("src_tokens") === srcTokens(s))
      assert(r.getAs[Long]("temp_weight") === weight(s))
      assert(r.getAs[Long]("rate_permille") === rate(s), s"source $s")
      val kept = bySrc(s).keys.filter(id =>
        PortableHash.hexint32(s"mix-$id") % 1000 < rate(s)).toSeq
      assert(r.getAs[Long]("kept_docs") === kept.size.toLong, s"source $s")
      assert(r.getAs[Long]("kept_tokens") === kept.map(id => tokens(docs(id))).sum, s"source $s")
    }
    // sqrt temperature must actually reweight: some source's rate differs
    // from the uniform budget rate (else the op is proportional sampling)
    assert(rows.map(_.getAs[Long]("rate_permille")).distinct.length > 1 ||
      rows.length == 1)
  }

  test("quality classifier score is the exact integer dot product of rounded features") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = TextAnalysis.qualityClassifier(spark, sf).collect()
    assert(rows.length === docs.size)
    var kept = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ws = docs(id).split(" ", -1).filter(_.nonEmpty)
      val nw = ws.length.toDouble
      val fLen = round6(math.min(1.0, nw / 100.0))
      val fStop = round6(if (nw == 0) 0.0 else ws.count(TextAnalysis.EnStop.contains) / nw)
      // codepoints, not UTF-16 units: Spark's length() counts codepoints
      val fAwl = round6(math.min(1.0,
        (if (nw == 0) 0.0
         else ws.map(w => w.codePointCount(0, w.length).toLong).sum / nw) / 8.0))
      // ASCII letters only, like the rlike("[A-Za-z]") column (isLetter
      // would admit unicode letters the regex does not)
      val fAlpha = round6(if (nw == 0) 0.0
        else ws.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) / nw)
      val fRep = TextAnalysis.repetitionScala(docs(id))(0)
      def u6(f: Double): Long = math.round(f * 1000000.0)
      val u8 = TextAnalysis.ClfBiasC * 1000000L +
        TextAnalysis.ClfWLenC * u6(fLen) + TextAnalysis.ClfWStopC * u6(fStop) +
        TextAnalysis.ClfWAwlC * u6(fAwl) + TextAnalysis.ClfWAlphaC * u6(fAlpha) -
        TextAnalysis.ClfWRepC * u6(fRep)
      assert(r.getAs[Double]("f_len") === fLen, s"doc $id")
      assert(r.getAs[Double]("f_stop") === fStop, s"doc $id")
      assert(r.getAs[Double]("f_awl") === fAwl, s"doc $id")
      assert(r.getAs[Double]("f_alpha") === fAlpha, s"doc $id")
      assert(r.getAs[Double]("f_rep") === fRep, s"doc $id")
      assert(r.getAs[Double]("score") === u8.toDouble / 1e8, s"doc $id")
      assert(r.getAs[Boolean]("keep") === (u8 >= TextAnalysis.ClfCutC * 1000000L), s"doc $id")
      if (r.getAs[Boolean]("keep")) kept += 1
    }
    // the cut must separate: both classes present on the fixture corpus
    assert(kept > 0 && kept < rows.length)
  }

  /** UTF-8 byte order — the collation Spark (UTF8String) and DuckDB agree
    * on; the JVM's String compareTo (UTF-16 units) differs for
    * supplementary characters, so the reference must not use it.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  test("tfidf keywords match the brute-force tf-idf reference") {
    val n = docs.size
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
        .map { case (w, a) => w -> a.length.toLong }
    }
    val dfm = new scala.collection.mutable.HashMap[String, Long]
    tf.values.foreach(_.keys.foreach(w => dfm(w) = dfm.getOrElse(w, 0L) + 1))
    def scoreMicro(tfv: Long, dfv: Long): Long =
      BigDecimal(1e6 * tfv.toDouble * math.log((n + 1.0) / (dfv + 1.0)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected: Map[Long, Seq[(String, Long, Long, Long)]] = tf.collect {
      case (id, m) if m.nonEmpty =>
        id -> m.toSeq.map { case (w, c) => (w, c, dfm(w), scoreMicro(c, dfm(w))) }
          .sortWith((p, q) => p._4 > q._4 || (p._4 == q._4 && utf8Lt(p._1, q._1)))
          .take(TextAnalysis.TfidfTopK)
    }
    val rows = TextAnalysis.tfidfKeywords(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === expected.keySet)
    byDoc.foreach { case (id, rs) =>
      val got = rs.sortBy(_.getAs[Long]("kw_rank")).map(r =>
        (r.getAs[String]("word"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Long]("score_micro"))).toSeq
      assert(got === expected(id), s"doc $id")
      assert(rs.map(_.getAs[Long]("kw_rank")).sorted.toSeq ===
        (1L to got.length.toLong), s"doc $id")
    }
    // idf must discriminate: some doc's top keyword is NOT its most
    // frequent word (a corpus-wide-common word outscored by a rarer one)
    val discriminated = expected.exists { case (id, kws) =>
      val maxTf = tf(id).values.max
      kws.head._2 < maxTf
    }
    assert(discriminated, "tf-idf never outranked raw tf — idf is vacuous")
  }

  test("search rank matches the brute-force conjunctive tf-idf reference") {
    val n = docs.size
    val terms = TextAnalysis.SearchTerms.toSet
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.split(" ", -1).filter(w => w.nonEmpty && terms(w)).groupBy(identity)
        .map { case (w, a) => w -> a.length.toLong }
    }
    val dfm: Map[String, Long] = terms.map(w =>
      w -> tf.values.count(_.contains(w)).toLong).toMap
    def scoreMicro(tfv: Long, dfv: Long): Long =
      BigDecimal(1e6 * tfv.toDouble * math.log((n + 1.0) / (dfv + 1.0)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = tf.collect {
      case (id, m) if m.keySet == terms =>
        id -> m.map { case (w, c) => scoreMicro(c, dfm(w)) }.sum
    }.toSeq.sortBy { case (id, s) => (-s, id) }.take(TextAnalysis.SearchTopK)
    val got = TextAnalysis.searchRank(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toSeq
    assert(got === expected)
    // the conjunction must bite: strictly fewer matches than the RAREST
    // single term's posting list (else search degenerates to a term scan)
    assert(expected.nonEmpty)
    val minPosting = TextAnalysis.SearchTerms.map(t => tf.count(_._2.contains(t))).min
    assert(tf.count(_._2.keySet == terms) < minPosting)
  }

  test("bm25 search matches the brute-force bm25 reference") {
    val n = docs.size
    val terms = TextAnalysis.SearchTerms.toSet
    val allWords: Map[Long, Array[String]] =
      docs.map { case (id, t) => id -> t.split(" ", -1).filter(_.nonEmpty) }
    val dl: Map[Long, Long] = allWords.map { case (id, ws) => id -> ws.length.toLong }
    val avgdl = dl.values.sum.toDouble / dl.size
    val tf: Map[Long, Map[String, Long]] = allWords.map { case (id, ws) =>
      id -> ws.filter(terms).groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    }
    val dfm: Map[String, Long] = terms.map(w =>
      w -> tf.values.count(_.contains(w)).toLong).toMap
    // every float expression mirrors the Column operand order exactly
    def termScore(tfv: Long, dfv: Long, dlv: Long): Long = {
      val idf = math.log(
        (n.toDouble - dfv.toDouble + 0.5) / (dfv.toDouble + 0.5) + 1.0)
      val dlNorm = TextAnalysis.Bm25OneMinusB +
        TextAnalysis.Bm25B * (dlv.toDouble / avgdl)
      val tfn = (tfv.toDouble * TextAnalysis.Bm25K1Plus1) /
        (tfv.toDouble + TextAnalysis.Bm25K1 * dlNorm)
      BigDecimal(1e6 * idf * tfn)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = tf.collect {
      case (id, m) if m.keySet == terms =>
        id -> m.map { case (w, c) => termScore(c, dfm(w), dl(id)) }.sum
    }.toSeq.sortBy { case (id, s) => (-s, id) }.take(TextAnalysis.SearchTopK)
    val got = TextAnalysis.bm25Search(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toSeq
    assert(got === expected)
    // the ranking must discriminate (not a degenerate constant score),
    // and length normalization must bite somewhere: the score is not a
    // pure function of the tf vector
    assert(expected.nonEmpty)
    assert(expected.map(_._2).distinct.size > 1, "constant bm25 scores")
    val full = tf.filter(_._2.keySet == terms)
    val scoreOf = full.map { case (id, m) =>
      id -> m.map { case (w, c) => termScore(c, dfm(w), dl(id)) }.sum
    }
    val tfCollision = full.groupBy(_._2).values
      .exists(g => g.keys.map(scoreOf).toSet.size > 1)
    val tfOrderBroken = full.toSeq.combinations(2).exists {
      case Seq((a, ma), (b, mb)) =>
        ma.values.sum == mb.values.sum && scoreOf(a) != scoreOf(b)
      case _ => false
    }
    assert(tfCollision || tfOrderBroken,
      "bm25 behaved as a pure tf function on this fixture")
  }
}
