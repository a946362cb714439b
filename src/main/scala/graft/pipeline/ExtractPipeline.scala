package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *   data/bucket=N/            extracted docs (+ per-doc n_dead counter),
  *                             parquet partitioned by bucket
  *   _checkpoints/             (run_id, stage, bucket, status, n_docs,
  *                              n_spans, text_chars, n_images, n_errors,
  *                              n_dead_letter, started_ts, finished_ts);
  *                             a run appends status='running' rows for the
  *                             buckets it claims, then status='done' rows
  *                             when they commit — so a crashed run leaves
  *                             'running' rows the stuck scan (Q6) finds
  *   _lineage/                 (run_id, input_path, code_version,
  *                              params_json, run_ts)
  * The metrics surface is [[metrics]] — a view over `_checkpoints`
  * (latest done row per bucket), not a second store to keep consistent.
  *
  * Buckets come from `pmod(xxhash64(doc_id), numBuckets)` — uniform for any
  * id distribution (monotonic int-derived ids included), and the output
  * directory partitioning lets resume prune scans to missing buckets only.
  *
  * Scan discipline: the job reads its input from storage ONCE. The tagged
  * projection (bucket + per-doc dead-letter count) persists with
  * MEMORY_AND_DISK, and the skew salter's light/heavy split plus the heavy
  * chunk path all read the persisted copy — at deployment scale one
  * materialized pass (spilling to executor-local disk) beats re-scanning a
  * remote 100 TB source three times, which is what the naive
  * dead-agg + light + heavy layout did. Dead-letter counts ride through
  * extraction as a carried column and are aggregated from the WRITTEN
  * output, so no separate input-side aggregate exists at all.
  */
object ExtractPipeline {

  case class Config(
      outDir: String,
      runId: String,
      numBuckets: Int = 32,
      heavyThreshold: Int = SkewSalter.DefaultHeavyThreshold,
      chunkTarget: Int = SkewSalter.DefaultChunkTarget,
      inputPath: String = "",
      codeVersion: String = BuildInfo.version,
      // V2 size cap (reference utils.py:504-506, main.py:258-264): docs
      // whose input span chars exceed the cap are recorded as a single
      // error span instead of extracted — the job continues (the reference
      // rejects the request; a 10^12-doc job must not die per row)
      oversizeCapChars: Option[Long] = None)

  /** Oversize sentinel prefix (kind="error" span text). */
  val OversizePrefix = "[ERRO: Arquivo excede o limite de "

  case class RunReport(bucketsTotal: Int, bucketsDone: Int, bucketsRun: Int,
      docsProcessed: Long)

  object BuildInfo { val version = "0.1.0" }

  private val Stage = "extract"

  /** Data subdirectory per checkpointed stage (the read/verify surfaces
    * take a stage parameter and resolve their table through this map, so
    * the invariant checker covers every stage, not just extract).
    */
  private val StageData = Map("extract" -> "data", "llm" -> "llm")

  /** THE bucket function of the storage layout — every consumer (the
    * write path, resume, and the serving layer's driver-side pruning)
    * derives from this one definition, so the layout can never drift
    * from its readers.
    */
  def bucketColOf(id: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(xxhash64(id), lit(numBuckets.toLong)).cast("int")

  def bucketCol(numBuckets: Int) = bucketColOf(col("doc_id"), numBuckets)

  /** Bucket of one LITERAL doc id, evaluated through the same expression
    * as [[bucketCol]] (a 1-row local plan — no scan, no shuffle): used by
    * the serving layer to turn a point lookup into a partition-pruning
    * predicate.
    */
  def bucketOfId(spark: SparkSession, docId: String, numBuckets: Int): Int =
    spark.range(1).select(bucketColOf(lit(docId), numBuckets)).head().getInt(0)

  /** Buckets already checkpointed 'done' for this stage (any run). A
    * bucket checkpointed 'empty' (claimed, no data in that run's input) is
    * NOT done: a later resume with a fuller input must recompute it.
    */
  def doneBuckets(spark: SparkSession, outDir: String, stage: String): Set[Int] = {
    val path = s"$outDir/_checkpoints"
    recoverStore(spark, path)
    if (!fileExists(spark, path)) Set.empty
    else spark.read.parquet(path)
      .where(col("stage") === stage && col("status") === "done")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
  }

  /** Crash recovery for [[cleanupCheckpoints]]'s rewrite: if the store is
    * missing but the renamed-aside copy exists (crash between the two
    * renames), restore it — otherwise every reader sees an empty store and
    * resume recomputes the world.
    */
  private[graft] def recoverStore(spark: SparkSession, path: String): Unit =
    synchronized {
      val fs = hadoopFs(spark, path)
      val p = new org.apache.hadoop.fs.Path(path)
      val pOld = new org.apache.hadoop.fs.Path(s"${path}_old")
      if (!fs.exists(p) && fs.exists(pOld)) {
        // The rename result is deliberately tolerated either way: a
        // concurrent recoverer winning the race leaves the source gone
        // (rename returns false — fine, the store is restored). The
        // harmful interleave — the destination appearing BETWEEN the
        // exists-check and the rename, which nests pOld INSIDE the
        // restored store — is detected and undone here. In-JVM racers
        // (serving layer + pipeline share a driver) are serialized by the
        // monitor; a cross-process race against a live cleanup aborts
        // loudly in rewriteKeeping's rename guards.
        if (fs.rename(pOld, p)) {
          val nested = new org.apache.hadoop.fs.Path(p, pOld.getName)
          // the undo rename must not fail silently: a stuck nested _old
          // directory inside the restored store makes every reader see
          // phantom extra files — fail loudly so the operator intervenes
          if (fs.exists(nested) && !fs.rename(nested, pOld))
            throw new IllegalStateException(
              s"recoverStore: restored $path but could not move nested " +
                s"$nested back out — readers would see phantom checkpoint rows")
        }
      }
    }

  private def fileExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def emptyCkptView(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** The ONE builder of `_checkpoints` rows: every status write (running
    * claims, done commits, empty claims, 0-doc closes) projects through
    * here, so the 12-column schema cannot drift between call sites — a
    * divergent hand-written copy would append parquet files with a
    * different schema that every reader then unions. `df` needs a
    * `bucket` column; `counters` overrides the counter columns a stage
    * actually measures (the rest stay null).
    */
  private def ckptRows(df: DataFrame, runId: String, stage: String,
      status: String, startedTs: String, finishedTs: Option[String],
      counters: Map[String, Column] = Map.empty): DataFrame = {
    def c(name: String): Column =
      counters.getOrElse(name, lit(null).cast("long")).as(name)
    df.select(
      lit(runId).as("run_id"),
      lit(stage).as("stage"),
      col("bucket"),
      lit(status).as("status"),
      c("n_docs"), c("n_spans"), c("text_chars"), c("n_images"),
      c("n_errors"), c("n_dead_letter"),
      lit(startedTs).cast("timestamp").as("started_ts"),
      finishedTs.fold(lit(null).cast("timestamp"))(ts => lit(ts).cast("timestamp"))
        .as("finished_ts"))
  }

  private def appendCkpt(rows: DataFrame, outDir: String): Unit =
    rows.coalesce(1).write.mode(SaveMode.Append).parquet(s"$outDir/_checkpoints")

  /** One checkpoint row per claimed bucket, status='running' — written from
    * a driver-local list (bucket ids are 0..numBuckets-1 minus done; no
    * input scan). The stuck scan keys off these.
    */
  private def writeRunningRows(spark: SparkSession, cfg: Config,
      buckets: Seq[Int], startedTs: String, stage: String = Stage): Unit = {
    import spark.implicits._
    if (buckets.isEmpty) return
    appendCkpt(ckptRows(buckets.toDF("bucket"), cfg.runId, stage, "running",
      startedTs, None), cfg.outDir)
  }

  /** Run (or resume) the extraction job. Only buckets without a 'done'
    * checkpoint are computed; their output directories are overwritten
    * atomically via dynamic partition overwrite, so a re-run after a crash
    * is idempotent.
    */
  def run(spark: SparkSession, input: DataFrame, cfg: Config): RunReport = {
    val done = doneBuckets(spark, cfg.outDir, Stage)
    val startedTs = java.time.Instant.now().toString
    writeRunningRows(spark, cfg,
      (0 until cfg.numBuckets).filterNot(done), startedTs)

    // THE input scan: bucket + per-doc dead-letter count tagged in one
    // projection, persisted so the light/heavy split below re-reads the
    // materialized copy, not the source (see object scaladoc)
    val bucketed = input
      .withColumn("bucket", bucketCol(cfg.numBuckets))
      .withColumn("n_dead", graft.extract.Extractor.deadLetterCount(col("spans")))
    val todo =
      (if (done.isEmpty) bucketed
       else bucketed.where(!col("bucket").isin(done.toSeq: _*)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // n_dead rides through extraction as a carried column (unknown kinds
    // are dropped by the kernel, so the count must be taken from the input
    // side — but it is WRITTEN with the output and aggregated from there)
    val extracted = cfg.oversizeCapChars match {
      case None => SkewSalter.extract(todo, cfg.heavyThreshold, cfg.chunkTarget)
      case Some(cap) =>
        // V2 cap: both branches read the SAME persisted projection — still
        // one source scan; oversize docs keep a row (resume invariants:
        // data covers every input doc exactly once)
        val chars = aggregate(col("spans"), lit(0L),
          (acc, s) => acc + coalesce(length(s.getField("text")), lit(0)))
        val normal = todo.where(chars <= cap)
        val oversize = todo.where(chars > cap).select(
          col("doc_id"), col("bucket"), col("n_dead"),
          array(struct(
            lit("error").as("kind"),
            concat(lit(OversizePrefix), lit(cap), lit(" caracteres: "),
              col("doc_id"), lit("]")).as("text"),
            lit(null).cast("string").as("media_ref"),
            lit(0).as("offset"))).as("spans"))
        SkewSalter.extract(normal, cfg.heavyThreshold, cfg.chunkTarget)
          .unionByName(oversize)
    }

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    extracted.write
      .mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"${cfg.outDir}/data")
    todo.unpersist()

    // per-bucket metrics from the WRITTEN output (reads back only the new
    // buckets via partition pruning) — verifies the write like the
    // reference's paranoid re-read (reference workers.py:91-109), but as a
    // single scan instead of per-row round-trips
    val written = spark.read.parquet(s"${cfg.outDir}/data")
      .where(if (done.isEmpty) lit(true) else !col("bucket").isin(done.toSeq: _*))
    val perBucket = written
      .select(col("bucket"), col("spans"), col("n_dead"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("spans"))).as("n_spans"),
        sum(aggregate(col("spans"), lit(0L),
          (acc, s) => acc + coalesce(length(s.getField("text")), lit(0)))).as("text_chars"),
        sum(size(filter(col("spans"), s => s.getField("kind") === "image"))).as("n_images"),
        sum(size(filter(col("spans"), s => s.getField("kind") === "error"))).as("n_errors"),
        sum(col("n_dead")).as("n_dead_letter"))
      .cache() // consumed by the ckpt write, the empty-claim diff, and the report

    val finishedTs = java.time.Instant.now().toString
    appendCkpt(ckptRows(perBucket, cfg.runId, Stage, "done", startedTs,
      Some(finishedTs),
      counters = Seq("n_docs", "n_spans", "text_chars", "n_images",
        "n_errors", "n_dead_letter").map(n => n -> col(n)).toMap),
      cfg.outDir)

    // claimed buckets with NO data in this run's input get a terminal
    // 'empty' row (driver-local list, bounded by numBuckets): the stuck
    // scan must not flag them forever, while resume (done-only) still
    // recomputes them if a later input covers them
    val withData = perBucket.select("bucket").collect().map(_.getInt(0)).toSet
    val emptyClaimed = (0 until cfg.numBuckets)
      .filterNot(done).filterNot(withData)
    if (emptyClaimed.nonEmpty) {
      import spark.implicits._
      appendCkpt(ckptRows(emptyClaimed.toDF("bucket"), cfg.runId, Stage,
        "empty", startedTs, Some(finishedTs),
        counters = Seq("n_docs", "n_spans", "text_chars", "n_images",
          "n_errors", "n_dead_letter").map(n => n -> lit(0L)).toMap),
        cfg.outDir)
    }

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
    perBucket.unpersist()
    RunReport(cfg.numBuckets, done.size, ran.getLong(1).toInt, ran.getLong(0))
  }

  /** P2/P3 as a CHECKPOINTED pipeline stage (reference workers.py:145-345:
    * the prompt→LLM→format chain that follows extraction), with the same
    * bucket-resume discipline as the extract stage: only buckets that are
    * extract-'done' but not llm-'done' are computed, claim rows make a
    * crashed run visible to the stuck scan, and the bucketed dynamic
    * partition overwrite keeps re-runs idempotent. Layout adds
    * `llm/bucket=N/` rows `(doc_id, full_prompt, llm_response, llm_error,
    * llm_attempts, formatted_response)`; dead-lettered transport failures
    * are ROWS here (`llm_error` set), counted per bucket in `n_errors`.
    *
    * The transport is the pluggable [[graft.llm.LlmStage.LlmTransport]]
    * (liveness-probed at submit; EchoTransport in-sandbox — the network
    * call stays out of the extraction invariant, SURVEY.md §0).
    */
  def runLlmStage(spark: SparkSession, cfg: Config,
      model: String = graft.llm.LlmStage.DefaultModel,
      // deployment entry point: the transport comes from the
      // GRAFT_LLM_TRANSPORT env gate (echo unless a deployment opts in —
      // driver queries keep an explicit EchoTransport for the oracle)
      transport: graft.llm.LlmStage.LlmTransport = graft.llm.LlmStage.transportFromEnv(),
      maxRetries: Int = graft.llm.LlmStage.MaxRetries,
      backoffMs: Int => Long = graft.llm.LlmStage.referenceBackoffMs): RunReport = {
    import graft.llm.LlmStage
    import graft.textops.LlmFormat
    val LlmStageName = "llm"
    val doneExtract = doneBuckets(spark, cfg.outDir, Stage)
    val doneLlm = doneBuckets(spark, cfg.outDir, LlmStageName)
    val todo = (doneExtract -- doneLlm).toSeq.sorted
    if (todo.isEmpty)
      return RunReport(cfg.numBuckets, doneLlm.size, 0, 0L)
    val startedTs = java.time.Instant.now().toString
    writeRunningRows(spark, cfg, todo, startedTs, LlmStageName)

    // prompt build (L1) over the STORED extracted text, pruned to the
    // resumable buckets (prompt/format expressions shared with the
    // inline llm_pipeline query — one definition)
    val data = spark.read.parquet(s"${cfg.outDir}/data")
      .where(col("bucket").isin(todo: _*))
    val prompts = data.select(
      col("doc_id"), LlmStage.promptFromSpans(col("spans")).as("full_prompt"))
    // the output CARRIES the stored bucket (joined back on the stringified
    // id) rather than re-hashing: generate stringifies doc_id, and
    // xxhash64(string) differs from xxhash64(long) — re-hashing would
    // scatter a long-keyed input's rows across the WRONG partitions
    val bucketOfDoc = data.select(
      col("doc_id").cast("string").as("doc_id"), col("bucket"))
    val replied = LlmStage.generate(prompts, model, transport, maxRetries, backoffMs)
      .withColumn("formatted_response", LlmStage.formattedCol(col("llm_response")))
      .join(bucketOfDoc, Seq("doc_id"))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    replied.write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(s"${cfg.outDir}/llm")

    // commit from the WRITTEN output (same re-read discipline as extract).
    // Explicit schema: an all-empty run writes a fileless directory, and
    // schema inference over zero files would throw — with the schema given
    // it reads as an empty table and the empty-claim path below closes the
    // buckets.
    val written = spark.read.schema(replied.schema).parquet(s"${cfg.outDir}/llm")
      .where(col("bucket").isin(todo: _*))
    val perBucket = written.groupBy("bucket").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("llm_error").isNotNull, 1L).otherwise(0L)).as("n_errors"))
      .cache()
    val finishedTs = java.time.Instant.now().toString
    appendCkpt(ckptRows(perBucket, cfg.runId, LlmStageName, "done",
      startedTs, Some(finishedTs),
      counters = Map("n_docs" -> col("n_docs"), "n_errors" -> col("n_errors"))),
      cfg.outDir)

    // claimed buckets that produced NO output rows (e.g. every row dropped
    // for a null doc_id) still need a terminal checkpoint: unlike the
    // extract stage's 'empty' (recomputable — a fuller INPUT may cover the
    // bucket later), the llm input is the frozen extract output, so a
    // rerun would yield the same nothing — a 0-doc 'done' row closes the
    // claim, or the stuck scan flags the bucket forever and every resume
    // recomputes it
    val withData = perBucket.select("bucket").collect().map(_.getInt(0)).toSet
    val emptyClaimed = todo.filterNot(withData)
    if (emptyClaimed.nonEmpty) {
      import spark.implicits._
      appendCkpt(ckptRows(emptyClaimed.toDF("bucket"), cfg.runId,
        LlmStageName, "done", startedTs, Some(finishedTs),
        counters = Map("n_docs" -> lit(0L), "n_errors" -> lit(0L))),
        cfg.outDir)
    }

    val ran = perBucket.agg(
      coalesce(sum("n_docs"), lit(0L)), count(lit(1))).collect()(0)
    perBucket.unpersist()
    RunReport(cfg.numBuckets, doneLlm.size, ran.getLong(1).toInt, ran.getLong(0))
  }

  /** The per-bucket metrics view (the VERBOSE counter logs of the
    * reference, utils.py:62,111,153,197, as a queryable table): latest
    * 'done' checkpoint row per bucket. This IS the `_metrics` surface the
    * layout doc describes — a projection of `_checkpoints`, not a second
    * store to keep consistent.
    */
  def metrics(spark: SparkSession, outDir: String): DataFrame = {
    val path = s"$outDir/_checkpoints"
    recoverStore(spark, path)
    if (!fileExists(spark, path))
      return emptyCkptView(spark, "bucket INT, run_id STRING, n_docs BIGINT, " +
        "n_spans BIGINT, text_chars BIGINT, n_images BIGINT, n_errors BIGINT, " +
        "n_dead_letter BIGINT, finished_ts TIMESTAMP")
    val w = Window.partitionBy("bucket").orderBy(desc("finished_ts"))
    spark.read.parquet(path)
      .where(col("stage") === Stage && col("status") === "done")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("bucket", "run_id", "n_docs", "n_spans", "text_chars",
        "n_images", "n_errors", "n_dead_letter", "finished_ts")
  }

  /** Q4/Q5 analog — the invariant checker (reference main.py:1063-1218,
    * fix_extraction_bug.py:26-70): buckets claimed done whose data is
    * missing or doc counts disagree. Empty result = healthy.
    */
  def verifyCheckpoints(spark: SparkSession, outDir: String,
      stage: String = Stage): DataFrame = {
    val path = s"$outDir/_checkpoints"
    val dataPath = s"$outDir/${StageData(stage)}"
    recoverStore(spark, path)
    val ckpt = (if (fileExists(spark, path))
      spark.read.parquet(path)
        .where(col("stage") === stage && col("status") === "done")
        .select("bucket", "n_docs")
    else emptyCkptView(spark, "bucket INT, n_docs BIGINT"))
      .groupBy("bucket").agg(max("n_docs").as("ckpt_docs"))
    val actual = (if (fileExists(spark, dataPath))
      spark.read.parquet(dataPath).select("bucket")
    else emptyCkptView(spark, "bucket INT"))
      .groupBy("bucket").agg(count(lit(1)).as("data_docs"))
    // a 0-doc 'done' bucket legitimately has NO data partition (the llm
    // stage closes claims that produced no rows that way) — missing data
    // counts as 0, and only a genuine count mismatch (or data with no
    // checkpoint at all) is a violation
    ckpt.join(actual, Seq("bucket"), "full_outer")
      .where(col("ckpt_docs").isNull ||
        coalesce(col("data_docs"), lit(0L)) =!= col("ckpt_docs"))
  }

  /** Q6 analog — the stuck-doc scan (reference fix_extraction_bug.py:48-53:
    * `status IN non-terminal AND created_at < now()-1h`): buckets whose
    * LATEST checkpoint row is still 'running' and older than
    * `olderThanHours` — a run claimed them and never committed. The
    * monitoring query every operator of a long-running pipeline runs first.
    */
  def staleCheckpoints(spark: SparkSession, outDir: String,
      olderThanHours: Double, stage: String = Stage): DataFrame = {
    val path = s"$outDir/_checkpoints"
    recoverStore(spark, path)
    if (!fileExists(spark, path)) // nothing claimed yet => nothing stuck
      return emptyCkptView(spark,
        "run_id STRING, bucket INT, status STRING, started_ts TIMESTAMP")
    val ckpt = spark.read.parquet(path).where(col("stage") === stage)
    // ties (a run's running+done rows share started_ts): 'done' wins
    val w = Window.partitionBy("bucket")
      .orderBy(desc("started_ts"), asc("status"))
    val olderThanSec = math.round(olderThanHours * 3600)
    ckpt.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("status") === "running" &&
        col("started_ts") < current_timestamp() - expr(s"INTERVAL $olderThanSec SECONDS"))
      .select("run_id", "bucket", "status", "started_ts")
  }

  /** P6 analog — retention cleanup (reference workers.py:347-390,
    * utils.py:476-502): drop checkpoint AND lineage rows older than
    * `maxAgeHours`. Returns checkpoint rows kept.
    *
    * Crash-safe rewrite: new store is written to `<path>_tmp`, the old
    * store is renamed ASIDE to `<path>_old` (not deleted), the new one is
    * renamed in, then the old copy is dropped. A crash at any point leaves
    * either the original or the `_old` copy on disk — never zero copies
    * (the previous delete-then-rename had a window that lost the whole
    * store, forcing a full recompute on resume).
    */
  def cleanupCheckpoints(spark: SparkSession, outDir: String, maxAgeHours: Int): Long = {
    val cutoff = current_timestamp() - expr(s"INTERVAL $maxAgeHours HOURS")
    rewriteKeeping(spark, s"$outDir/_lineage", col("run_ts") >= cutoff)
    rewriteKeeping(spark, s"$outDir/_checkpoints", col("finished_ts") >= cutoff ||
      // keep 'running' rows younger than the cutoff too (no finished_ts)
      (col("finished_ts").isNull && col("started_ts") >= cutoff))
  }

  /** Small-file compaction for the checkpoint + lineage stores, with no
    * retention cut: every run appends one `coalesce(1)` parquet file per
    * write (claim rows, done rows, empty rows, lineage), so thousands of
    * runs leave thousands of tiny files that `metrics`/`doneBuckets`
    * re-list on every call. The crash-safe rewrite in [[rewriteKeeping]]
    * already lands the whole store in one file — this entry point runs it
    * with `keep = true` so operators can compact WITHOUT expiring rows
    * (the reference's hourly beat couples the two, workers.py:385-390;
    * [[cleanupCheckpoints]] is that coupled shape and compacts as a side
    * effect). Returns the CHECKPOINT rows kept (the lineage store is
    * compacted too, but its count is not part of the return — same
    * convention as [[cleanupCheckpoints]]). Single-writer, like cleanup.
    */
  def compactCheckpoints(spark: SparkSession, outDir: String): Long = {
    rewriteKeeping(spark, s"$outDir/_lineage", lit(true))
    rewriteKeeping(spark, s"$outDir/_checkpoints", lit(true))
  }

  private def rewriteKeeping(spark: SparkSession, path: String,
      keep: org.apache.spark.sql.Column): Long = {
    recoverStore(spark, path) // a crashed prior rewrite left only <path>_old
    if (!fileExists(spark, path)) return 0L
    val kept = spark.read.parquet(path).where(keep).cache()
    val n = kept.count()
    kept.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"${path}_tmp")
    kept.unpersist()
    val fs = hadoopFs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val pTmp = new org.apache.hadoop.fs.Path(s"${path}_tmp")
    val pOld = new org.apache.hadoop.fs.Path(s"${path}_old")
    if (fs.exists(pOld)) fs.delete(pOld, true) // leftover from a past crash
    // cleanup is a SINGLE-WRITER maintenance job (the reference runs it as
    // one hourly beat, workers.py:385-390); readers self-heal via
    // recoverStore, but two concurrent cleanups are not supported. Rename
    // results are checked so an interleaving fails LOUDLY instead of
    // silently leaving expired rows or nesting directories — including the
    // quiet one: if a concurrent reader's recoverStore restores the store
    // between the two renames, `rename(pTmp, p)` with an existing
    // DIRECTORY destination moves _tmp INSIDE it and still returns true.
    require(fs.rename(p, pOld), s"cleanup: rename $p aside failed")
    require(!fs.exists(p),
      s"cleanup: $p reappeared between renames (concurrent recoverStore?) — aborting")
    require(fs.rename(pTmp, p), s"cleanup: rename $pTmp into place failed")
    require(!fs.exists(new org.apache.hadoop.fs.Path(p, pTmp.getName)),
      s"cleanup: rename nested $pTmp inside $p instead of replacing it")
    fs.delete(pOld, true)
    n
  }
}
