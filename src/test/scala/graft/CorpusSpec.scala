package graft

import graft.textops.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the corpus-construction ops (value-exactness vs DuckDB
  * is the driver oracle gate's job).
  */
class CorpusSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and respects per-lang thresholds") {
    val a = Corpus.sampleStratified(spark, sf).collect()
    val b = Corpus.sampleStratified(spark, sf).collect()
    assert(a.toSeq === b.toSeq) // hash-based: bit-identical reruns
    val thr = Corpus.SampleThresholds.toMap
    a.foreach { r =>
      val t = thr.getOrElse(r.getAs[String]("lang"), Corpus.SampleDefaultThreshold)
      assert(r.getAs[Long]("h") < t)
    }
    // the mix is actually stratified: higher-threshold classes keep more
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(a.length > 0 && a.length < total)
  }

  test("packing is a contiguous chunking: starts chain, offsets match bins") {
    val rows = Corpus.packSequences(spark, sf).collect()
    val cap = Corpus.PackCapacity
    rows.sliding(2).foreach {
      case Array(p, n) =>
        assert(n.getAs[Long]("start_tok") ===
          p.getAs[Long]("start_tok") + p.getAs[Long]("n_tokens"))
      case _ => ()
    }
    rows.foreach { r =>
      val start = r.getAs[Long]("start_tok")
      assert(r.getAs[Long]("bin_id") === start / cap)
      assert(r.getAs[Long]("offset_in_bin") === start % cap)
    }
    assert(rows.head.getAs[Long]("start_tok") === 0L)
  }

  test("sharded packing chains per shard and is a partition of the corpus") {
    val rows = Corpus.packSequencesSharded(spark, sf).collect()
    val cap = Corpus.PackCapacity
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.size > 1) // the hash actually spreads docs
    byShard.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      assert(sorted.head.getAs[Long]("start_tok") === 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[Long]("start_tok") ===
            p.getAs[Long]("start_tok") + p.getAs[Long]("n_tokens"))
        case _ => ()
      }
      sorted.foreach { r =>
        val start = r.getAs[Long]("start_tok")
        assert(r.getAs[Long]("bin_id") === start / cap)
        assert(r.getAs[Long]("offset_in_bin") === start % cap)
      }
    }
    // every doc appears exactly once with the same token count as the
    // global form — sharding repartitions the stream, never drops/dupes
    val global = Corpus.packSequences(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap === global)
  }

  test("shuffled packing permutes within shards but keeps the chunking exact") {
    val rows = Corpus.packSequencesShuffled(spark, sf).collect()
    val cap = Corpus.PackCapacity
    rows.groupBy(_.getAs[Long]("shard")).values.foreach { rs =>
      // chain in SHUFFLE order, not doc order
      val sorted = rs.sortBy(r => (r.getAs[Long]("shuf_key"), r.getAs[Long]("doc_id")))
      assert(sorted.head.getAs[Long]("start_tok") === 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[Long]("start_tok") ===
            p.getAs[Long]("start_tok") + p.getAs[Long]("n_tokens"))
        case _ => ()
      }
      sorted.foreach { r =>
        assert(r.getAs[Long]("bin_id") === r.getAs[Long]("start_tok") / cap)
      }
      // the permutation is real: shuffle order differs from doc_id order
      if (rs.length > 3)
        assert(sorted.map(_.getAs[Long]("doc_id")).toSeq !==
          sorted.map(_.getAs[Long]("doc_id")).sorted.toSeq)
    }
    // same docs and token counts as unshuffled sharded packing
    val sharded = Corpus.packSequencesSharded(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
      === sharded)
  }

  test("end-to-end corpus build composes the audited single-op semantics") {
    import org.apache.spark.sql.functions.col
    val out = Corpus.buildCorpus(spark, sf).collect()
    assert(out.nonEmpty)
    val kept = out.map(_.getAs[Long]("doc_id")).toSet

    // survivors are exactly: gopher-keep AND dedup-keeper AND sampled —
    // recomputed here through the single-op queries the gate audits
    val gopherKeep = graft.textops.TextAnalysis.gopherRules(spark, sf)
      .where(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val dedupKeeper = graft.textops.Dedup.exact(spark, sf)
      .where(!col("is_duplicate")).select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lang = out
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    val thr = Corpus.SampleThresholds.toMap
    kept.foreach { id =>
      assert(gopherKeep(id), s"doc $id not gopher-keep")
      assert(dedupKeeper(id), s"doc $id is a duplicate")
      val t = thr.getOrElse(lang(id), Corpus.SampleDefaultThreshold)
      val h = graft.textops.PortableHash.hexint32(s"sample-$id") % 1000
      assert(h < t, s"doc $id above its sample threshold")
    }
    // detected language matches the standalone langId verdict
    val langIdView = graft.textops.TextAnalysis.langId(spark, sf)
      .select("doc_id", "lang_guess").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    lang.foreach { case (id, lg) => assert(langIdView(id) === lg) }

    // packing invariants hold per shard on the surviving stream
    val cap = Corpus.PackCapacity
    out.groupBy(_.getAs[Long]("shard")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      assert(sorted.head.getAs[Long]("start_tok") === 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[Long]("start_tok") ===
            p.getAs[Long]("start_tok") + p.getAs[Long]("n_tokens"))
        case _ => ()
      }
      sorted.foreach { r =>
        assert(r.getAs[Long]("bin_id") === r.getAs[Long]("start_tok") / cap)
      }
    }
    assert(docs.count() > out.length) // the filters actually filtered
  }

  test("curated build composes classifier, dedup, decontam, and mix semantics") {
    import org.apache.spark.sql.functions.col
    val out = Corpus.curate(spark, sf).collect()
    assert(out.nonEmpty)
    val kept = out.map(_.getAs[Long]("doc_id")).toSet

    // every survivor passes the standalone classifier, is not a benchmark
    // doc, is its hash group's keeper, and is not contaminated — each
    // recomputed through the oracle-audited single-op query
    val clfKeep = graft.textops.TextAnalysis.qualityClassifier(spark, sf)
      .where(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val dedupKeeper = graft.textops.Dedup.exact(spark, sf)
      .where(!col("is_duplicate")).select("doc_id").collect().map(_.getLong(0)).toSet
    val decontam = graft.textops.Decontam.decontaminate(spark, sf).collect()
    val contaminated = decontam.filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    val benchmark = decontam.filter(_.getAs[Boolean]("is_benchmark"))
      .map(_.getAs[Long]("doc_id")).toSet
    kept.foreach { id =>
      assert(clfKeep(id), s"doc $id fails the quality classifier")
      assert(dedupKeeper(id), s"doc $id is a duplicate")
      assert(!benchmark(id), s"benchmark doc $id leaked into training")
      assert(!contaminated(id), s"contaminated doc $id survived")
    }

    // packing invariants hold per shard on the curated stream
    val cap = Corpus.PackCapacity
    out.groupBy(_.getAs[Long]("shard")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      assert(sorted.head.getAs[Long]("start_tok") === 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[Long]("start_tok") ===
            p.getAs[Long]("start_tok") + p.getAs[Long]("n_tokens"))
        case _ => ()
      }
      sorted.foreach { r =>
        assert(r.getAs[Long]("bin_id") === r.getAs[Long]("start_tok") / cap)
      }
    }

    // hash-decided end to end: a rerun is bit-identical
    val again = Corpus.curate(spark, sf).collect()
    assert(again.toSeq === out.toSeq)
  }

  test("sampling and packing are invariant under input repartitioning") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val key = (r: org.apache.spark.sql.Row) => r.getAs[Long]("doc_id")
    // packSequencesBy on a 7-way repartitioned input must be bit-identical:
    // determinism under retry/resume is the promise that makes hash-based
    // sampling and packing auditable at scale
    val a = Corpus.packSequencesBy(docs, Corpus.packShard(col("doc_id")))
      .collect().sortBy(key)
    val b = Corpus.packSequencesBy(docs.repartition(7), Corpus.packShard(col("doc_id")))
      .collect().sortBy(key)
    assert(a.toSeq === b.toSeq)
    val s1 = Corpus.sampleStratified(spark, sf).collect().sortBy(key)
    // sampleStratified reads its own scan; invariance here is across runs
    val s2 = Corpus.sampleStratified(spark, sf).collect().sortBy(key)
    assert(s1.toSeq === s2.toSeq)
  }
}
