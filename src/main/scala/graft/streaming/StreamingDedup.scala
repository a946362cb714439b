package graft.streaming

import graft.textops.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming exact dedup with keyed state — the continuous-ingest twin of
  * [[graft.textops.Dedup.exact]]: documents arrive in micro-batches, and a
  * doc whose content hash was EVER seen (this batch or any earlier one) is
  * flagged duplicate. State is one boolean per 60-bit content hash, kept
  * in the streaming state store and recovered from the checkpoint on
  * restart — so dedup survives process death, exactly like the batch
  * pipeline's bucket checkpoints survive a crashed run.
  *
  * `flatMapGroupsWithState` is the right primitive (not
  * `dropDuplicates`): the first-seen doc must still be EMITTED (flagged
  * keeper) and later copies emitted-as-flagged rather than silently
  * dropped — the shape of a quarantine/lineage-preserving dedup at
  * training-data scale.
  *
  * Keeper semantics are STREAMING semantics: first-ARRIVAL wins. Across
  * micro-batches (including >maxFilesPerTrigger file sets inside one
  * run) the earlier batch's doc is the keeper whatever its doc_id — a
  * stream cannot reorder the past. Within one micro-batch, ties break
  * by min doc_id, which is the batch operator's window order; a corpus
  * that fits one trigger therefore reproduces
  * [[graft.textops.Dedup.exact]]'s flags exactly (what
  * StreamingDedupSpec pins).
  *
  * Scale notes: state is hash-partitioned by content hash across
  * executors (the same shuffle key as the batch groupBy); each key holds
  * ONE boolean, so state size is #distinct-docs bits, not text. A
  * production deployment adds a state TTL (`GroupStateTimeout`) matched
  * to its retention window; the sandbox test keeps NoTimeout.
  */
object StreamingDedup {

  case class DocHash(doc_id: String, content_hash: Long)
  case class DedupRow(doc_id: String, content_hash: Long, is_duplicate: Boolean)

  /** 60-bit portable hash of the span texts (text-only, joined on an explicit
    * \\u0001 separator so differing span splits of the same concatenation
    * — ["ab","c"] vs ["a","bc"] — do NOT collide; dedup is about content,
    * not offsets/media refs).
    */
  def contentHash(spans: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PortableHash.hexint60(array_join(
      transform(spans, s => coalesce(s.getField("text"), lit(""))), "\u0001"))

  /** The ONE definition of first-keeper selection for the stateful dedup
    * handlers (here, [[CorpusStream.flagGroup]], and
    * [[CurateStream.flagGroup]] — the three must never drift): pairs
    * every row with its is_duplicate flag. One O(n) min pass, NO sort —
    * a degenerate hash (empty content duplicated across a whole batch)
    * lands its group in one task, and an O(n log n) sort there is pure
    * waste when only the minimum is needed. A re-delivered duplicate id
    * keeps exactly one keeper. Generic in the id's ordering: span docs
    * key on String ids, the curated tail on numeric ids (where string
    * min would pick "10" over "9" and diverge from the batch keeper).
    */
  def keeperFlags[T, K](batch: Array[T], seenBefore: Boolean)(
      id: T => K)(implicit ord: Ordering[K]): Iterator[(T, Boolean)] =
    if (seenBefore || batch.isEmpty) batch.iterator.map((_, true))
    else {
      val minId = batch.iterator.map(id).min
      var keeperEmitted = false
      batch.iterator.map { d =>
        val keeper = !keeperEmitted && ord.equiv(id(d), minId)
        if (keeper) keeperEmitted = true
        (d, !keeper)
      }
    }

  /** Group handler: emits every doc of the group, flagging all but the
    * first-ever-seen (earlier batch wins; within this batch, min doc_id
    * — [[keeperFlags]]).
    */
  def dedupGroup(key: Long, rows: Iterator[DocHash],
      state: GroupState[Boolean]): Iterator[DedupRow] = {
    val seenBefore = state.getOption.getOrElse(false)
    val batch = rows.toArray
    if (!seenBefore && batch.nonEmpty) state.update(true)
    keeperFlags(batch, seenBefore)(_.doc_id).map { case (d, dup) =>
      DedupRow(d.doc_id, d.content_hash, dup)
    }
  }

  /** The streaming transform alone (testable on any streaming or batch
    * relation of span docs).
    */
  def dedupStream(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), contentHash(col("spans")).as("content_hash"))
      .as[DocHash]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(dedupGroup)
      .toDF()
  }

  /** Start the continuous dedup over a growing parquet directory of span
    * docs; parquet sink + state checkpoint give exactly-once flags across
    * restarts.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, availableNow: Boolean = false): StreamingQuery =
    StreamIo.startParquetSink(dedupStream(StreamIo.docSource(spark, inDir)),
      outDir, checkpointDir, availableNow)
}
