package graft

import graft.streaming.ScoreStream
import graft.textops.LmScore
import org.scalatest.funsuite.AnyFunSuite

/** The streaming score tail must reproduce the batch cross-trained query
  * EXACTLY under the same frozen model (all globals are planned offline,
  * so the streamed values are bit-identical, not approximately equal),
  * and keep applying the static model to docs arriving later — including
  * docs whose grams the model has never seen.
  */
class ScoreStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-sscore").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private def scoreRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_words", "n_bigrams", "nll_micro_sum",
      "avg_nll_micro", "keep").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bigrams"),
        Option(r.getAs[java.lang.Long]("nll_micro_sum")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("avg_nll_micro")).map(_.toLong),
        r.getAs[Boolean]("keep"))).toSet

  test("streamed scoring equals the batch cross-trained query bit-for-bit") {
    val root = tmp()
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    // offline planning: the same audited definition the batch query uses
    val (bg, uc, v) = LmScore.crossModel(spark, sf)
    val model = ScoreStream.planModel(bg, uc, v)
    assert(model.bgH.nonEmpty && model.vocab > 0)
    assert(model.bgH.toSeq === model.bgH.toSeq.sorted)

    // stream the corpus dir itself (read-only file source)
    val q = ScoreStream.start(spark, sf, out, ckpt, model, availableNow = true)
    q.awaitTermination()
    val streamed = scoreRows(spark.read.parquet(out))
    val batch = scoreRows(LmScore.scoreCross(spark, sf))
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("later-arriving docs with unseen grams pay exactly ln(V) per bigram") {
    val root = tmp()
    val in = s"$root/in/documents.parquet"
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val (bg, uc, v) = LmScore.crossModel(spark, sf)
    val model = ScoreStream.planModel(bg, uc, v)

    import spark.implicits._
    Seq(
      (1L, "web", "zzqx1 zzqx2 zzqx3 zzqx4"), // 3 bigrams, all unseen
      (2L, "web", "solo"),                    // <2 words -> NULL score
      (3L, "web", null: String))              // poison row -> dropped
      .toDF("doc_id", "source", "text").write.parquet(in)

    val q = ScoreStream.start(spark, in, out, ckpt, model, availableNow = true)
    q.awaitTermination()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet === Set(1L, 2L))

    def u6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val perBigram = u6(1e6 * math.log((0L + model.vocab).toDouble / 1.0))
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_bigrams") === 3L)
    assert(r1.getAs[Long]("nll_micro_sum") === 3 * perBigram)
    assert(r1.getAs[Boolean]("keep") ===
      (u6(3.0 * perBigram / 3) <= LmScore.LmNllMaxMicro))
    val r2 = rows(2L)
    assert(r2.getAs[Long]("n_bigrams") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("avg_nll_micro")))
    assert(!r2.getAs[Boolean]("keep"))
  }
}
