package graft

import graft.extract.Extractor
import graft.streaming.ExtractStream
import graft.synth.SpanSynth
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extraction == batch extraction over the same files, and a
  * resumed stream picks up only new files (sink commit log = exactly-once).
  */
class ExtractStreamSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private def flat(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), explode(col("spans")).as("s"))
    .select(col("doc_id"), col("s.kind"), col("s.text"), col("s.media_ref"), col("s.offset"))
    .orderBy(col("doc_id"), col("offset"))
    .collect().toSeq

  test("streamed extraction matches batch extraction; resume drains only new files") {
    val root = tmp()
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"

    val docs = SpanSynth.docsInput(spark, "/root/testdata/sf0.001")
      .where(substring(col("doc_id"), 5, 8).cast("long") < 120)
      .cache()
    val batch1 = docs.where(substring(col("doc_id"), 5, 8).cast("long") < 60)
    val batch2 = docs.where(substring(col("doc_id"), 5, 8).cast("long") >= 60)

    batch1.write.mode("append").parquet(in)
    val q1 = ExtractStream.start(spark, in, out, ckpt, availableNow = true)
    q1.awaitTermination()
    assert(flat(spark.read.parquet(out)) === flat(Extractor.extract(batch1)))

    // new files arrive; a fresh AvailableNow run drains ONLY them
    batch2.write.mode("append").parquet(in)
    val q2 = ExtractStream.start(spark, in, out, ckpt, availableNow = true)
    q2.awaitTermination()
    assert(flat(spark.read.parquet(out)) === flat(Extractor.extract(docs)))
    docs.unpersist()
  }
}
