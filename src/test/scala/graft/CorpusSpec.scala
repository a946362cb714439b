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
}
