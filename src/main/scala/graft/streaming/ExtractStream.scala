package graft.streaming

import graft.extract.Extractor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming wrapper around the extraction kernel. The
  * reference's Celery queue is an asynchrony mechanism, not event-time
  * streaming (SURVEY.md §1.3) — batch + checkpoints is the faithful shape —
  * but the kernel is a stateless per-row projection, so streaming ingest is
  * free: file-source micro-batches → extract → parquet sink, exactly-once
  * via the sink's commit log. No watermark/state needed.
  *
  * At scale this is the "continuous ingest" deployment: the same kernel
  * binary serves the backfill (ExtractPipeline) and the live tail.
  */
object ExtractStream {

  /** Start extraction over a growing parquet directory of span documents.
    * `availableNow = true` drains what exists and stops (used by tests and
    * backfill-catchup); false = continuous micro-batches.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, availableNow: Boolean = false): StreamingQuery =
    StreamIo.startParquetSink(Extractor.extract(StreamIo.docSource(spark, inDir)),
      outDir, checkpointDir, availableNow)
}
