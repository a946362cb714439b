package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The resumable extraction job (north_rule: "resumable from checkpoint
  * with per-partition lineage + metrics"; SURVEY.md §3.4). Re-expresses the
  * reference's per-row status state machine (reference models.py:8-13) and
  * its manual repair script (reference fix_extraction_bug.py:26-70) as
  * bucket-level checkpointing: stage completion IS the status, and resume =
  * anti-join of buckets against done checkpoints.
  *
  * Layout under `outDir` (bucketed Parquet with Iceberg-compatible layout
  * semantics — no Iceberg jar in-sandbox, see SURVEY.md §7.1):
  *   data/bucket=N/            extracted docs, parquet partitioned by bucket
  *   _checkpoints/             (run_id, stage, bucket, status, n_docs,
  *                              n_spans, text_chars, n_images, n_errors,
  *                              n_dead_letter, started_ts, finished_ts)
  *   _lineage/                 (run_id, input_path, code_version,
  *                              params_json, run_ts)
  *   _metrics/                 alias view of checkpoint counters per bucket
  *
  * Buckets come from `pmod(xxhash64(doc_id), numBuckets)` — uniform for any
  * id distribution (monotonic int-derived ids included), and the output
  * directory partitioning lets resume prune scans to missing buckets only.
  */
object ExtractPipeline {

  case class Config(
      outDir: String,
      runId: String,
      numBuckets: Int = 32,
      heavyThreshold: Int = SkewSalter.DefaultHeavyThreshold,
      chunkTarget: Int = SkewSalter.DefaultChunkTarget,
      inputPath: String = "",
      codeVersion: String = BuildInfo.version)

  case class RunReport(bucketsTotal: Int, bucketsDone: Int, bucketsRun: Int,
      docsProcessed: Long)

  object BuildInfo { val version = "0.1.0" }

  def bucketCol(numBuckets: Int) =
    pmod(xxhash64(col("doc_id")), lit(numBuckets.toLong)).cast("int")

  /** Buckets already checkpointed 'done' for this stage (any run). */
  def doneBuckets(spark: SparkSession, outDir: String, stage: String): Set[Int] = {
    val path = s"$outDir/_checkpoints"
    if (!fileExists(spark, path)) Set.empty
    else spark.read.parquet(path)
      .where(col("stage") === stage && col("status") === "done")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
  }

  private def fileExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Run (or resume) the extraction job. Only buckets without a 'done'
    * checkpoint are computed; their output directories are overwritten
    * atomically via dynamic partition overwrite, so a re-run after a crash
    * is idempotent.
    */
  def run(spark: SparkSession, input: DataFrame, cfg: Config): RunReport = {
    val stage = "extract"
    val done = doneBuckets(spark, cfg.outDir, stage)
    val bucketed = input.withColumn("bucket", bucketCol(cfg.numBuckets))
    val todo =
      if (done.isEmpty) bucketed
      else bucketed.where(!col("bucket").isin(done.toSeq: _*))

    val startedTs = java.time.Instant.now().toString

    // dead-letter counts must come from the INPUT side (unknown kinds are
    // dropped by the kernel); count per (bucket) before extraction
    val dead = todo.select(col("bucket"),
      graft.extract.Extractor.deadLetterCount(col("spans")).as("n_dead"))
      .groupBy("bucket").agg(sum("n_dead").as("n_dead_letter"))

    val extracted = SkewSalter.extract(todo, cfg.heavyThreshold, cfg.chunkTarget)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    extracted.write
      .mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"${cfg.outDir}/data")

    // per-bucket metrics from the WRITTEN output (reads back only the new
    // buckets via partition pruning) — verifies the write like the
    // reference's paranoid re-read (reference workers.py:91-109), but as a
    // single scan instead of per-row round-trips
    val written = spark.read.parquet(s"${cfg.outDir}/data")
      .where(if (done.isEmpty) lit(true) else !col("bucket").isin(done.toSeq: _*))
    val perBucket = written
      .select(col("bucket"), col("spans"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("spans"))).as("n_spans"),
        sum(aggregate(col("spans"), lit(0L),
          (acc, s) => acc + coalesce(length(s.getField("text")), lit(0)))).as("text_chars"),
        sum(size(filter(col("spans"), s => s.getField("kind") === "image"))).as("n_images"),
        sum(size(filter(col("spans"), s => s.getField("kind") === "error"))).as("n_errors"))
      .join(dead, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_dead_letter"))

    val finishedTs = java.time.Instant.now().toString
    val ckpt = perBucket.select(
      lit(cfg.runId).as("run_id"),
      lit(stage).as("stage"),
      col("bucket"),
      lit("done").as("status"),
      col("n_docs"), col("n_spans"), col("text_chars"),
      col("n_images"), col("n_errors"), col("n_dead_letter"),
      lit(startedTs).cast("timestamp").as("started_ts"),
      lit(finishedTs).cast("timestamp").as("finished_ts"))
    ckpt.coalesce(1).write.mode(SaveMode.Append).parquet(s"${cfg.outDir}/_checkpoints")

    val lineage = spark.range(1).select(
      lit(cfg.runId).as("run_id"),
      lit(cfg.inputPath).as("input_path"),
      lit(cfg.codeVersion).as("code_version"),
      lit(s"""{"numBuckets":${cfg.numBuckets},"heavyThreshold":${cfg.heavyThreshold},"chunkTarget":${cfg.chunkTarget}}""").as("params_json"),
      lit(finishedTs).cast("timestamp").as("run_ts"))
    lineage.coalesce(1).write.mode(SaveMode.Append).parquet(s"${cfg.outDir}/_lineage")

    val ran = perBucket.agg(
      coalesce(sum("n_docs"), lit(0L)).as("docs"),
      count(lit(1)).as("buckets")).collect()(0)
    RunReport(cfg.numBuckets, done.size, ran.getLong(1).toInt, ran.getLong(0))
  }

  /** Q4/Q5 analog — the invariant checker (reference main.py:1063-1218,
    * fix_extraction_bug.py:26-70): buckets claimed done whose data is
    * missing or doc counts disagree. Empty result = healthy.
    */
  def verifyCheckpoints(spark: SparkSession, outDir: String): DataFrame = {
    val ckpt = spark.read.parquet(s"$outDir/_checkpoints")
      .where(col("stage") === "extract" && col("status") === "done")
      .groupBy("bucket").agg(max("n_docs").as("ckpt_docs"))
    val actual = spark.read.parquet(s"$outDir/data")
      .groupBy("bucket").agg(count(lit(1)).as("data_docs"))
    ckpt.join(actual, Seq("bucket"), "full_outer")
      .where(col("ckpt_docs").isNull || col("data_docs").isNull ||
        col("ckpt_docs") =!= col("data_docs"))
  }

  /** P6 analog — retention cleanup (reference workers.py:347-390,
    * utils.py:476-502): drop checkpoint/lineage rows older than
    * `maxAgeHours` for runs no longer needed. Returns rows kept.
    */
  def cleanupCheckpoints(spark: SparkSession, outDir: String, maxAgeHours: Int): Long = {
    val path = s"$outDir/_checkpoints"
    if (!fileExists(spark, path)) return 0L
    val kept = spark.read.parquet(path)
      .where(col("finished_ts") >= current_timestamp() - expr(s"INTERVAL $maxAgeHours HOURS"))
      .cache()
    val n = kept.count()
    kept.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/_checkpoints_tmp")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$outDir/_checkpoints_tmp"),
      new org.apache.hadoop.fs.Path(path))
    kept.unpersist()
    n
  }
}
