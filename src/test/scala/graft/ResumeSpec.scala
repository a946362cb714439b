package graft

import graft.pipeline.ExtractPipeline
import graft.synth.SpanSynth
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint/resume semantics (north_rule; SURVEY.md §3.4, §5.2 item 4):
  * a killed run resumes computing ONLY the missing buckets, re-runs are
  * no-ops, and the invariant checker flags nothing on a healthy store.
  */
class ResumeSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-resume").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private def input = SpanSynth.docsInput(spark, "/root/testdata/sf0.001")
    .where(substring(col("doc_id"), 5, 8).cast("long") < 200)

  test("partial run + resume covers all buckets exactly once") {
    val out = freshDir()
    val B = 8
    // simulate a crashed run: only buckets 0-3 got done
    val partial = input.where(ExtractPipeline.bucketCol(B) < 4)
    val r1 = ExtractPipeline.run(spark, partial,
      ExtractPipeline.Config(out, "run-1", numBuckets = B))
    assert(r1.bucketsDone === 0)

    // resume with the FULL input: only buckets 4-7 must be computed
    val r2 = ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "run-2", numBuckets = B))
    assert(r2.bucketsDone === 4)
    assert(r2.bucketsRun === 4)

    // output covers every input doc exactly once
    val data = spark.read.parquet(s"$out/data")
    assert(data.count() === input.count())
    assert(data.select("doc_id").distinct().count() === input.count())

    // third run is a no-op
    val r3 = ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "run-3", numBuckets = B))
    assert(r3.bucketsDone === 8)
    assert(r3.docsProcessed === 0)

    // invariant checker: healthy store has no violations
    assert(ExtractPipeline.verifyCheckpoints(spark, out).count() === 0)
  }

  test("checkpoint counters match output content") {
    val out = freshDir()
    ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "run-1", numBuckets = 4))
    val ckpt = spark.read.parquet(s"$out/_checkpoints")
    val fromCkpt = ckpt.agg(sum("n_docs"), sum("n_spans"), sum("n_errors")).collect()(0)
    val data = spark.read.parquet(s"$out/data")
    val actual = data.agg(
      count(lit(1)),
      sum(size(col("spans"))),
      sum(size(filter(col("spans"), s => s.getField("kind") === "error")))).collect()(0)
    assert(fromCkpt.getLong(0) === actual.getLong(0))
    assert(fromCkpt.getLong(1) === actual.getLong(1))
    assert(fromCkpt.getLong(2) === actual.getLong(2))
    // lineage row written per run
    assert(spark.read.parquet(s"$out/_lineage").count() === 1)
  }

  test("resumed buckets overwrite idempotently (no duplicate docs)") {
    val out = freshDir()
    val B = 4
    ExtractPipeline.run(spark, input, ExtractPipeline.Config(out, "r1", numBuckets = B))
    // wipe one bucket's checkpoint rows to force recompute of bucket 2
    val ckpt = spark.read.parquet(s"$out/_checkpoints").where(col("bucket") =!= 2).cache()
    ckpt.count()
    ckpt.coalesce(1).write.mode("overwrite").parquet(s"$out/_ckpt_tmp")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_checkpoints"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$out/_ckpt_tmp"),
      new org.apache.hadoop.fs.Path(s"$out/_checkpoints"))

    val r = ExtractPipeline.run(spark, input, ExtractPipeline.Config(out, "r2", numBuckets = B))
    assert(r.bucketsRun === 1)
    val data = spark.read.parquet(s"$out/data")
    assert(data.count() === input.count())
    assert(data.select("doc_id").distinct().count() === input.count())
    assert(ExtractPipeline.verifyCheckpoints(spark, out).count() === 0)
  }

  test("stuck scan (Q6) flags claimed-but-uncommitted buckets only") {
    val out = freshDir()
    val B = 8
    // fresh store: nothing claimed => nothing stuck (and no crash)
    assert(ExtractPipeline.staleCheckpoints(spark, out, 0.0).count() === 0)

    // a partial-coverage input leaves buckets 4-7 claimed but dataless —
    // they terminate as 'empty', NOT stuck (no standing false alarms)
    val partial = input.where(ExtractPipeline.bucketCol(B) < 4)
    ExtractPipeline.run(spark, partial,
      ExtractPipeline.Config(out, "run-1", numBuckets = B))
    assert(ExtractPipeline.staleCheckpoints(spark, out, 0.0).count() === 0)

    // simulate a genuine crash: strip bucket 2's terminal row, leaving its
    // 'running' claim dangling
    val ckpt = spark.read.parquet(s"$out/_checkpoints")
      .where(!(col("bucket") === 2 && col("status") =!= "running")).cache()
    ckpt.count()
    ckpt.coalesce(1).write.mode("overwrite").parquet(s"$out/_ckpt_tmp")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_checkpoints"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$out/_ckpt_tmp"),
      new org.apache.hadoop.fs.Path(s"$out/_checkpoints"))

    val stale = ExtractPipeline.staleCheckpoints(spark, out, 0.0).collect()
    assert(stale.map(_.getAs[Int]("bucket")).toSeq === Seq(2))
    assert(stale.forall(_.getAs[String]("status") === "running"))

    // resume recommits it; nothing is stuck afterwards; empty buckets
    // (4-7) were never marked done, so a fuller input recomputes them
    val r2 = ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "run-2", numBuckets = B))
    assert(r2.bucketsDone === 3) // 0,1,3 done; 2 wiped; 4-7 only 'empty'
    assert(ExtractPipeline.staleCheckpoints(spark, out, 0.0).count() === 0)
  }

  test("crashed cleanup rewrite is recovered from the renamed-aside copy") {
    val out = freshDir()
    ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "r1", numBuckets = 4))
    val n = spark.read.parquet(s"$out/_checkpoints").count()
    // simulate the crash window: store renamed aside, new copy never landed
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$out/_checkpoints"),
      new org.apache.hadoop.fs.Path(s"$out/_checkpoints_old"))
    // any reader recovers the store instead of seeing it empty
    assert(ExtractPipeline.doneBuckets(spark, out, "extract").size === 4)
    assert(spark.read.parquet(s"$out/_checkpoints").count() === n)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_checkpoints_old")))
  }

  test("retention cleanup (P6) keeps young rows, drops expired, crash-safe") {
    val out = freshDir()
    ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "r1", numBuckets = 4))
    val before = spark.read.parquet(s"$out/_checkpoints").count()

    // young rows survive a 24h retention pass; resume stays a no-op
    val kept = ExtractPipeline.cleanupCheckpoints(spark, out, maxAgeHours = 24)
    assert(kept === before)
    assert(spark.read.parquet(s"$out/_lineage").count() === 1)
    val noop = ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "r2", numBuckets = 4))
    assert(noop.docsProcessed === 0)

    // zero retention expires everything; the store rewrites without a
    // delete window (_old/_tmp staging dirs must be gone afterwards)
    val kept0 = ExtractPipeline.cleanupCheckpoints(spark, out, maxAgeHours = 0)
    assert(kept0 === 0)
    assert(spark.read.parquet(s"$out/_checkpoints").count() === 0)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_checkpoints_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_checkpoints_tmp")))
    // expired checkpoints mean the next run recomputes from scratch
    val redo = ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "r3", numBuckets = 4))
    assert(redo.bucketsDone === 0 && redo.docsProcessed === input.count())
  }

  test("serve queries over the STORED table: lookup prunes to one bucket partition") {
    import graft.serve.Queries
    val out = freshDir()
    val B = 8
    ExtractPipeline.run(spark, input, ExtractPipeline.Config(out, "r1", numBuckets = B))

    // queue over data/ covers every stored doc with derived status
    val q = Queries.queueFrom(spark, out)
    assert(q.count() === input.count())
    assert(q.columns.contains("status"))

    // pick a real doc id; driver-side bucket matches the stored partition
    val someId = spark.read.parquet(s"$out/data")
      .select("doc_id", "bucket").limit(1).collect()(0)
    val docId = someId.getString(0)
    assert(Queries.bucketOf(spark, docId, B) === someId.getInt(1))

    // bucket count derives from the store's _lineage record; an explicit
    // mismatching count fails loudly instead of pruning to the wrong
    // partition and returning empty
    assert(Queries.storedNumBuckets(spark, out) === Some(B))
    assert(Queries.lookupFrom(spark, out, docId).count() === 1)
    intercept[IllegalArgumentException] {
      Queries.lookupFrom(spark, out, docId, B + 1)
    }

    val lk = Queries.lookupFrom(spark, out, docId, B)
    val rows = lk.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("doc_id") === docId)
    assert(rows(0).getAs[String]("extracted_text") !== null)

    // the physical scan must carry the bucket PARTITION filter (pruning to
    // one directory) and push the doc_id filter to parquet
    val scan = lk.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("bucket")),
      s"no bucket partition filter in: ${scan.partitionFilters}")
    assert(scan.metadata("PushedFilters").contains("EqualTo(doc_id,"),
      s"doc_id not pushed: ${scan.metadata("PushedFilters")}")
  }

  test("LLM stage (P2/P3) runs checkpointed over extract-done buckets and resumes") {
    val out = freshDir()
    val B = 4
    ExtractPipeline.run(spark, input, ExtractPipeline.Config(out, "r1", numBuckets = B))

    val r1 = ExtractPipeline.runLlmStage(spark,
      ExtractPipeline.Config(out, "llm-1", numBuckets = B),
      transport = graft.llm.LlmStage.EchoTransport(), backoffMs = _ => 0L)
    assert(r1.bucketsDone === 0)
    assert(r1.docsProcessed === input.count())

    // one reply row per extracted doc, formatted, no transport errors
    val llm = spark.read.parquet(s"$out/llm")
    assert(llm.count() === input.count())
    assert(llm.where(col("llm_error").isNotNull).count() === 0)
    assert(llm.where(col("formatted_response").isNull).count() === 0)

    // rerun is a no-op (all buckets llm-done)
    val r2 = ExtractPipeline.runLlmStage(spark,
      ExtractPipeline.Config(out, "llm-2", numBuckets = B), transport = graft.llm.LlmStage.EchoTransport(), backoffMs = _ => 0L)
    assert(r2.docsProcessed === 0L)

    // simulate a crash: drop one bucket's llm checkpoint rows -> resume
    // recomputes exactly that bucket, idempotently
    val kept = spark.read.parquet(s"$out/_checkpoints")
      .where(!(col("stage") === "llm" && col("bucket") === 1)).cache()
    kept.count()
    kept.coalesce(1).write.mode("overwrite").parquet(s"$out/_ckpt_tmp")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    kept.unpersist()
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_checkpoints"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$out/_ckpt_tmp"),
      new org.apache.hadoop.fs.Path(s"$out/_checkpoints"))
    // the stage-aware invariant checker flags the missing llm checkpoint
    // (data exists for bucket 1 but no done row) before the resume...
    assert(ExtractPipeline.verifyCheckpoints(spark, out, "llm")
      .select("bucket").collect().map(_.getInt(0)).toSeq === Seq(1))
    val r3 = ExtractPipeline.runLlmStage(spark,
      ExtractPipeline.Config(out, "llm-3", numBuckets = B), transport = graft.llm.LlmStage.EchoTransport(), backoffMs = _ => 0L)
    assert(r3.bucketsRun === 1)
    // ...and is clean after it; extract-stage view stays healthy too
    assert(ExtractPipeline.verifyCheckpoints(spark, out, "llm").count() === 0)
    assert(ExtractPipeline.verifyCheckpoints(spark, out).count() === 0)
    // llm claim rows are visible to the stage-aware stuck scan
    assert(ExtractPipeline.staleCheckpoints(spark, out, -1.0, "llm").count() === 0)
    assert(spark.read.parquet(s"$out/llm").count() === input.count())
    assert(spark.read.parquet(s"$out/llm")
      .select("doc_id").distinct().count() === input.count())

    // transport failures become dead-letter ROWS with per-bucket counts
    val out2 = freshDir()
    ExtractPipeline.run(spark, input, ExtractPipeline.Config(out2, "r1", numBuckets = B))
    ExtractPipeline.runLlmStage(spark,
      ExtractPipeline.Config(out2, "llm-1", numBuckets = B),
      transport = LlmStageSpec.BrokenPromptTransport(), backoffMs = _ => 0L)
    val dead = spark.read.parquet(s"$out2/llm")
    assert(dead.where(col("llm_error").isNotNull).count() === input.count())
    val ck = spark.read.parquet(s"$out2/_checkpoints")
      .where(col("stage") === "llm" && col("status") === "done")
    assert(ck.agg(sum("n_errors")).collect()(0).getLong(0) === input.count())
  }

  test("LLM bucket yielding zero rows gets a terminal checkpoint, not stuck") {
    val out = freshDir()
    val B = 4
    ExtractPipeline.run(spark, input, ExtractPipeline.Config(out, "r1", numBuckets = B))

    // poison one stored bucket: every row loses its doc_id, so the llm
    // stage drops them all and writes NOTHING for that bucket (the ADVICE
    // scenario: a claimed bucket absent from the written output)
    val data = spark.read.parquet(s"$out/data")
    val poisoned = data.where(col("bucket") === 1)
      .withColumn("doc_id", lit(null).cast("string"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    poisoned.write.mode("overwrite").partitionBy("bucket").parquet(s"$out/data")

    val r1 = ExtractPipeline.runLlmStage(spark,
      ExtractPipeline.Config(out, "llm-1", numBuckets = B), transport = graft.llm.LlmStage.EchoTransport(), backoffMs = _ => 0L)
    assert(r1.bucketsRun === B - 1) // bucket 1 produced no output rows

    // bucket 1 still got a TERMINAL 0-doc done row...
    val ck = spark.read.parquet(s"$out/_checkpoints")
      .where(col("stage") === "llm" && col("bucket") === 1 && col("status") === "done")
      .collect()
    assert(ck.length === 1)
    assert(ck(0).getAs[Long]("n_docs") === 0L)
    // ...so the stuck scan is quiet, the invariant checker accepts the
    // fileless 0-doc bucket (missing data partition == 0 docs), and a
    // rerun is a no-op instead of recomputing the bucket forever
    assert(ExtractPipeline.staleCheckpoints(spark, out, -1.0, "llm").count() === 0)
    assert(ExtractPipeline.verifyCheckpoints(spark, out, "llm").count() === 0)
    val r2 = ExtractPipeline.runLlmStage(spark,
      ExtractPipeline.Config(out, "llm-2", numBuckets = B), transport = graft.llm.LlmStage.EchoTransport(), backoffMs = _ => 0L)
    assert(r2.docsProcessed === 0L)
    assert(r2.bucketsRun === 0)
  }

  test("compaction folds N runs' small files into one, resume semantics intact") {
    val out = freshDir()
    val B = 4
    // several runs against the same store: run 1 does the work, later runs
    // are no-ops but still append claim/lineage files — the small-file
    // accumulation the compactor exists for
    (1 to 4).foreach { i =>
      ExtractPipeline.run(spark, input,
        ExtractPipeline.Config(out, s"run-$i", numBuckets = B))
    }
    def parquetFiles(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$out/_checkpoints") > 1)
    assert(parquetFiles(s"$out/_lineage") > 1)
    val doneBefore = spark.read.parquet(s"$out/_checkpoints")
      .where(col("status") === "done").count()
    val metricsBefore = ExtractPipeline.metrics(spark, out)
      .orderBy("bucket").collect().toSeq

    val kept = ExtractPipeline.compactCheckpoints(spark, out)

    // one file per store, zero rows lost, identical metrics view
    assert(parquetFiles(s"$out/_checkpoints") === 1)
    assert(parquetFiles(s"$out/_lineage") === 1)
    assert(kept === spark.read.parquet(s"$out/_checkpoints").count())
    assert(spark.read.parquet(s"$out/_checkpoints")
      .where(col("status") === "done").count() === doneBefore)
    assert(spark.read.parquet(s"$out/_lineage").count() === 4)
    assert(ExtractPipeline.metrics(spark, out)
      .orderBy("bucket").collect().toSeq === metricsBefore)

    // resume after compaction is still a no-op
    val r = ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "run-post", numBuckets = B))
    assert(r.bucketsDone === B)
    assert(r.docsProcessed === 0)
    assert(ExtractPipeline.verifyCheckpoints(spark, out).count() === 0)
  }

  test("oversize cap (V2) records an error row instead of extracting") {
    val out = freshDir()
    val cap = 400L
    ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "r1", numBuckets = 4,
        oversizeCapChars = Some(cap)))
    val data = spark.read.parquet(s"$out/data")
    // every input doc still has exactly one output row (resume invariant)
    assert(data.count() === input.count())
    val oversize = data.where(
      element_at(col("spans"), 1).getField("text")
        .startsWith(ExtractPipeline.OversizePrefix))
    val expected = input.select(aggregate(col("spans"), lit(0L),
      (acc, s) => acc + coalesce(length(s.getField("text")), lit(0))).as("c"))
      .where(col("c") > cap).count()
    assert(oversize.count() === expected)
    assert(expected > 0)
    assert(oversize.where(size(col("spans")) =!= 1).count() === 0)
    assert(ExtractPipeline.verifyCheckpoints(spark, out).count() === 0)
  }

  test("metrics view exposes latest done counters per bucket") {
    val out = freshDir()
    ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "r1", numBuckets = 4))
    val m = ExtractPipeline.metrics(spark, out)
    assert(m.count() === 4) // one row per bucket, running rows excluded
    assert(m.agg(sum("n_docs")).collect()(0).getLong(0) === input.count())
  }

  test("written output carries per-doc dead-letter counts into checkpoints") {
    val out = freshDir()
    ExtractPipeline.run(spark, input,
      ExtractPipeline.Config(out, "r1", numBuckets = 4))
    val fromCkpt = spark.read.parquet(s"$out/_checkpoints")
      .agg(sum("n_dead_letter")).collect()(0).getLong(0)
    val fromInput = input
      .select(graft.extract.Extractor.deadLetterCount(col("spans")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(fromCkpt === fromInput)
    assert(fromInput > 0) // the synth corpus plants unknown-kind spans
  }
}
