package graft.streaming

import graft.textops.{LmScore, PortableHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming SCORE tail — the continuous deployment of cross-trained
  * LM scoring ([[graft.textops.LmScore.scoreCross]]): new documents
  * arrive forever, each scored against the FROZEN reference-slice LM.
  * This is exactly CCNet's production shape — the model trains offline
  * on the clean corpus and ships to the workers that score the crawl.
  *
  * Lambda split (the [[CleanStream]] / [[CurateStream]] contract): the
  * global statistics — bigram counts, context counts, vocabulary size —
  * are planned OFFLINE by batch ([[LmScore.crossModel]], the same
  * audited definition the batch query uses) and broadcast as sorted
  * aligned arrays; scoring is then fully STATELESS, one typed
  * `mapPartitions` hop with two binary searches per bigram and the SAME
  * micro-quantized integer arithmetic as the batch plan (HALF_UP at the
  * same two rounding points), so streamed values equal batch values
  * bit-for-bit. Memory contract: the arrays are bounded by the
  * REFERENCE corpus's distinct bigrams — the model artifact (CCNet's
  * per-language LM is a few GB) — never by the crawl being scored.
  * Exactly-once is the file-source/sink commit logs alone; a restart
  * replays nothing and applies the static model unchanged. New
  * reference data means a new plan cycle — the curate tail's mix-rate
  * cadence tradeoff.
  */
object ScoreStream {

  /** Input row (executor-local typed stage). */
  case class TextDoc(doc_id: Long, text: String)

  /** Scored row — the batch score schema minus the training-only lang
    * column (a stream of new docs carries no trusted lang; the model is
    * already fixed).
    */
  case class Scored(doc_id: Long, n_words: Long, n_bigrams: Long,
      nll_micro_sum: Option[Long], avg_nll_micro: Option[Long], keep: Boolean)

  /** The frozen model as broadcastable sorted aligned arrays + vocab. */
  case class Model(bgH: Array[Long], bgC: Array[Long],
      uH: Array[Long], uC: Array[Long], vocab: Long) {
    require(bgH.length == bgC.length && uH.length == uC.length,
      "model arrays must align")
  }

  /** Collect the planner's count tables into a [[Model]] (offline, once
    * per plan cycle; bounded by the reference corpus — see scaladoc).
    */
  def planModel(bg: DataFrame, uc: DataFrame, v: DataFrame): Model = {
    val bgRows = bg.select("bg_h", "c12").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ucRows = uc.select("u_h", "c1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    Model(bgRows.map(_._1), bgRows.map(_._2),
      ucRows.map(_._1), ucRows.map(_._2), v.head().getLong(0))
  }

  /** Whole transform (testable on streaming or batch relations of text
    * docs): score each doc under the frozen model. Arithmetic mirrors
    * [[LmScore.scoreCore]] term-for-term: per-bigram
    * round6(1e6·ln((c1+V)/(c12+1))) summed as LONGs, then one HALF_UP
    * average — so parity with the batch query is exact, not approximate.
    */
  def scoredStream(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    // null rows are poison pills for the typed encode and score nothing —
    // drop at the source (the CleanStream rationale)
    docs.where(docs("doc_id").isNotNull && docs("text").isNotNull)
      .select(docs("doc_id"), docs("text")).as[TextDoc]
      .mapPartitions { it =>
        val m = bc.value
        def u6(x: Double): Long =
          BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        def lookup(hs: Array[Long], cs: Array[Long], h: Long): Long = {
          val i = java.util.Arrays.binarySearch(hs, h)
          if (i >= 0) cs(i) else 0L
        }
        it.map { d =>
          val ws = d.text.split(" ").filter(_.nonEmpty)
          val n = ws.length
          if (n < 2) Scored(d.doc_id, n.toLong, 0L, None, None, keep = false)
          else {
            var sum = 0L
            var i = 0
            while (i < n - 1) {
              val c12 = lookup(m.bgH, m.bgC,
                PortableHash.hexint60(s"${ws(i)} ${ws(i + 1)}"))
              val c1 = lookup(m.uH, m.uC, PortableHash.hexint60(ws(i)))
              sum += u6(1e6 * math.log(
                (c1 + m.vocab).toDouble / (c12 + LmScore.Smoothing).toDouble))
              i += 1
            }
            val nBg = (n - 1).toLong
            val avg = u6(sum.toDouble / nBg)
            Scored(d.doc_id, n.toLong, nBg, Some(sum), Some(avg),
              keep = avg <= LmScore.LmNllMaxMicro)
          }
        }
      }.toDF()
  }

  /** Start the continuous score tail over a growing parquet directory of
    * text docs; parquet sink + source commit logs give exactly-once
    * scored rows across restarts.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, model: Model,
      availableNow: Boolean = false): StreamingQuery =
    StreamIo.startParquetSink(
      scoredStream(StreamIo.textDocSource(spark, inDir), model),
      outDir, checkpointDir, availableNow)
}
