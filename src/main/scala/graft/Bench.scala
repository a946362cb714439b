package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract). Prints ONE JSON line:
  *   {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...,
  *    "scaling":{...}|null,...}
  *
  * Two measurements (protocol in BASELINE.md):
  *  1. Per-query seconds for every SparkEntry query at local[32].
  *     Steal medicine (this sandbox is a microVM with bursty neighbor
  *     steal; identical runs measured 20x apart): after one warmup pass,
  *     the full query list is timed in interleaved ROUNDS (q1..qk, q1..qk,
  *     ...) and each query reports its per-round minimum — a single noisy
  *     round then inflates at most one round, not one query by 20x.
  *  2. Extraction throughput (docs/sec) over a materialized fat-doc span
  *     table at local[2] (N) vs local[8] (4N) — the in-sandbox evidence
  *     for the north_rule's N vs 4N cluster-scaling criterion
  *     (efficiency = tput4N/(4*tputN); both wall and CPU-time-derived).
  *     Each measurement runs in a FRESH child JVM (sequential
  *     SparkSessions in one JVM contaminate each other's timings), the
  *     levels interleave best-of-N, and 2-vs-8 sits below the 32-core
  *     host's saturation point where steal distorts least.
  *
  * WALL-CLOCK BUDGET (round-2 post-mortem): the driver kills Bench at an
  * unpublished timeout; round 2's run blew it (prep + 2 fresh-JVM scaling
  * reps + 4 query passes under heavy steal) and, because the JSON printed
  * only at the very end, the kill left NOTHING parseable (BENCH_r02.json
  * rc=124, parsed:null). Three defenses, in order of importance:
  *   - a shutdown hook emits the JSON line with whatever has completed, so
  *     even a SIGTERM mid-phase yields a parseable artifact;
  *   - `SPARK_GRAFT_BENCH_BUDGET_SEC` (default 1140 s) is honored by
  *     shedding work: query rounds stop when their phase share is spent,
  *     scaling reps stop when the remaining budget cannot fit another rep
  *     (estimated from the previous rep), each child JVM gets a hard
  *     timeout and is destroyed on expiry;
  *   - the cheap deliverable (per-query timings) runs FIRST; the expensive
  *     one (fresh-JVM scaling) consumes only what remains.
  * A scaling block with no successful paired rep is reported as
  * `"scaling":null` — never as zero-filled placeholder rows that parse
  * like a catastrophic real measurement.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Force full evaluation of every output column. */
  private def force(df: DataFrame): Unit = {
    val all = struct(df.columns.map(col): _*)
    df.select(max(xxhash64(all))).collect()
    ()
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Everything the final JSON needs, filled in as phases complete, so the
    * shutdown hook can serialize a faithful partial artifact at any point.
    */
  private object State {
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var sfDir: String = ""
    @volatile var budgetSec: Double = 0.0
    @volatile var startNanos: Long = 0L
    // per-query best-so-far (-1 = attempted, never succeeded)
    val queryTimes = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    @volatile var queryRounds: Int = 0
    @volatile var nDocs: Long = -1L
    @volatile var coresN: Int = 2
    @volatile var cores4N: Int = 8
    // paired (wall docs/s, cpu docs/s) runs per level — appended only when
    // BOTH levels of a rep completed, so best-of stays a fair interleave
    val runsN = new java.util.concurrent.CopyOnWriteArrayList[(Double, Double)]()
    val runs4N = new java.util.concurrent.CopyOnWriteArrayList[(Double, Double)]()
    // per-rep lists of every pass's wall seconds (weather transparency)
    val passSecsN = new java.util.concurrent.CopyOnWriteArrayList[Seq[Double]]()
    val passSecs4N = new java.util.concurrent.CopyOnWriteArrayList[Seq[Double]]()
    // corpus fraction (percent) each paired rep measured — a weather-retry
    // rep may run reduced; the artifact must say so or its 40 s passes
    // read as an extreme calm window instead of a quarter-size corpus
    val repFracs = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    // the in-flight scaling child, if any — the shutdown hook must kill it,
    // or a driver-timeout SIGTERM orphans a 24g Spark JVM that keeps
    // extracting and contaminates whatever runs next
    @volatile var liveChild: Process = null

    def elapsed: Double = (System.nanoTime() - startNanos) / 1e9

    // ONE definition of "this ratio sampled different steal weather" —
    // shared by the weather_note in the artifact and the retry loop (two
    // copies would let the retry trigger drift from what the artifact
    // flags)
    val EffSaneLo = 0.5
    val EffSaneHi = 1.3
    def effSkewed(e: Double): Boolean = e > EffSaneHi || e < EffSaneLo

    /** Wall-ratio efficiency over the paired reps so far (best-of per
      * level), None until one rep completed — the rep loop uses this to
      * decide whether the block would ship weather-contaminated and a
      * retry rep is worth the budget. Same formula as the emitted
      * `efficiency` field.
      */
    def effWallNow: Option[Double] = {
      import scala.jdk.CollectionConverters._
      val rN = runsN.asScala.toSeq
      val r4N = runs4N.asScala.toSeq
      if (rN.isEmpty || r4N.isEmpty) None
      else Some(r4N.map(_._1).max / ((cores4N.toDouble / coresN) * rN.map(_._1).max))
    }

    def emit(): Unit = if (printed.compareAndSet(false, true)) {
      Option(liveChild).foreach { p => p.destroyForcibly(); () }
      import scala.jdk.CollectionConverters._
      val results = queryTimes.asScala.toSeq.sortBy(_._1)
      val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
        .mkString("{", ",", "}")
      // "value" sums only the timed queries — queries_timed/queries_total
      // make a budget-shed partial self-describing (a 5-of-35 total must
      // not read as a 7x speedup against a full-suite artifact)
      val timed = results.count(_._2 >= 0)
      val total = results.map(_._2).filter(_ >= 0).sum
      def arr(xs: Seq[Double]) = xs.map(x => f"$x%.1f").mkString("[", ",", "]")
      val rN = runsN.asScala.toSeq
      val r4N = runs4N.asScala.toSeq
      // "efficiency" = WALL-clock ratio (the honest headline; sensitive to
      // stragglers/idle loss); "efficiency_cpu" = CPU-time-derived ratio
      // (steal-immune cross-check — rationale in BASELINE.md)
      val scaling = if (rN.isEmpty || r4N.isEmpty) "null" else {
        val tN = rN.map(_._1).max; val t4N = r4N.map(_._1).max
        val cN = rN.map(_._2).max; val c4N = r4N.map(_._2).max
        val ratio = cores4N.toDouble / coresN
        val effWall = t4N / (ratio * tN)
        val effCpu = c4N / (ratio * cN)
        // an efficiency far outside [EffSaneLo, EffSaneHi] means the two
        // levels' best runs sampled DIFFERENT steal weather (one saw a
        // storm the other missed — a measured single-rep artifact hit 11.5
        // when the N child ran entirely inside a storm); say so in the
        // artifact instead of letting the headline stand alone
        val note =
          if (effSkewed(effWall))
            s""","weather_note":"levels sampled different steal weather (${rN.size} paired rep(s)); capability ratio unreliable this run -- compare pass_secs and prior-run/BASELINE.md history""""
          else ""
        s"""{"docs":$nDocs,"cores_n":$coresN,"cores_4n":$cores4N,""" +
          s""""docs_per_sec_n":${f"$tN%.1f"},"docs_per_sec_4n":${f"$t4N%.1f"},""" +
          s""""efficiency":${f"$effWall%.3f"},"efficiency_cpu":${f"$effCpu%.3f"},""" +
          s""""cpu_docs_per_sec_n":${f"$cN%.1f"},"cpu_docs_per_sec_4n":${f"$c4N%.1f"},""" +
          s""""wall_runs_n":${arr(rN.map(_._1))},"wall_runs_4n":${arr(r4N.map(_._1))},""" +
          s""""cpu_runs_n":${arr(rN.map(_._2))},"cpu_runs_4n":${arr(r4N.map(_._2))},""" +
          s""""pass_secs_n":${passSecsN.asScala.map(p => p.map(x => f"$x%.1f").mkString("[", ",", "]")).mkString("[", ",", "]")},""" +
          s""""pass_secs_4n":${passSecs4N.asScala.map(p => p.map(x => f"$x%.1f").mkString("[", ",", "]")).mkString("[", ",", "]")},""" +
          s""""rep_fracs":${repFracs.asScala.mkString("[", ",", "]")}$note}"""
      }
      println(
        s"""{"metric":"total_query_sec","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"queries_timed":$timed,"queries_total":${results.size},"sf":"$sfDir","scaling":$scaling,"query_rounds":$queryRounds,"budget_sec":${f"$budgetSec%.0f"},"elapsed_sec":${f"$elapsed%.0f"}}""")
      System.out.flush()
    }
  }

  /** JDK17 module opens for child JVMs (mirrors build.sbt / spark-submit). */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run one throughput measurement in a fresh JVM with a hard timeout;
    * returns (wall docs/sec, cpu-derived docs/sec), or None on timeout /
    * child failure (the child is destroyed — never left to eat the budget).
    */
  private def tputInChildJvm(cores: Int, scratch: String,
      timeoutSec: Double, passBudgetSec: Double,
      fracPct: Int = 100): Option[(Double, Double, Seq[Double])] = {
    if (timeoutSec <= 0) return None
    // once the shutdown hook has emitted, the process is dying — launching
    // (or keeping) a child past that point orphans a 24g Spark JVM
    if (State.printed.get()) return None
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx24g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.Bench", "tput", cores.toString, scratch,
      f"$passBudgetSec%.0f", fracPct.toString)
    // child stderr (Spark logs) inherits ours — buffering it would deadlock
    val p = new ProcessBuilder(cmd: _*)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()
    State.liveChild = p
    // close the start()-vs-hook race: if the hook fired in between, it
    // missed this child — kill it ourselves
    if (State.printed.get()) { p.destroyForcibly(); State.liveChild = null; return None }
    // drain stdout on a thread so waitFor can time out without pipe deadlock
    val outBuf = new java.io.ByteArrayOutputStream()
    val drainer = new Thread(() => { p.getInputStream.transferTo(outBuf); () })
    drainer.setDaemon(true)
    drainer.start()
    val finished = p.waitFor(math.ceil(timeoutSec).toLong,
      java.util.concurrent.TimeUnit.SECONDS)
    State.liveChild = null
    if (!finished) {
      System.err.println(s"[bench] child JVM (cores=$cores) hit ${timeoutSec.toInt}s timeout — killed")
      p.destroyForcibly()
      p.waitFor()
      return None
    }
    drainer.join(2000)
    val parsed = new String(outBuf.toByteArray).linesIterator
      .find(_.startsWith("TPUT ")).map { l =>
        val parts = l.stripPrefix("TPUT ").split(" ")
        val passes = if (parts.length > 2)
          parts(2).split(",").toSeq.map(_.toDouble) else Seq.empty[Double]
        (parts(0).toDouble, parts(1).toDouble, passes)
      }
    if (parsed.isEmpty) // OOM / Spark init failure — say so, don't just shrink the rep count
      System.err.println(s"[bench] child JVM (cores=$cores) exited rc=${p.exitValue()} with no TPUT line — scaling phase ends")
    parsed
  }

  /** Child-JVM entry: measure extraction docs/sec at one parallelism.
    * The input caches in memory first — with cold/page-cache parquet the
    * job is I/O-and-overhead-bound and thread count cannot show (measured
    * ~260k docs/s at BOTH 8 and 32 threads); the scaling claim is about
    * the extraction COMPUTE, so that is what gets timed.
    *
    * Emits BOTH wall docs/sec and a CPU-time-derived docs/sec
    * (`nDocs * cores / Σ executorCpuTime`). On this shared microVM,
    * neighbor steal swings identical wall measurements up to 20x;
    * stolen cycles do not accrue task CPU time, so the CPU-derived number
    * is the steal-immune scaling evidence (it still honestly degrades
    * under real contention — memory-stall cycles DO count).
    */
  private def tputMain(cores: Int, scratch: String, passBudgetSec: Double,
      fracPct: Int): Unit = {
    val s = session(cores)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) { cpuNs.addAndGet(e.taskMetrics.executorCpuTime); () }
    })
    val t0 = System.nanoTime()
    // fracPct < 100: a weather-retry rep measures a deterministic subset —
    // same per-doc work, a fraction of the pass time, so a calm rep still
    // fits a nearly-spent budget (docs/s stays comparable; fixed costs
    // amortize slightly worse, which only understates the short rep)
    val full = s.read.parquet(scratch)
    val cached = (if (fracPct >= 100) full
                  else full.sample(withReplacement = false, fracPct / 100.0, seed = 11))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = cached.count() // materialize the cache
    System.err.println(f"[bench] child cores=$cores: cached $nDocs docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // force the kernel with an int-only aggregate: size() consumes the
    // whole extract_spans output array (a custom expression can't be
    // partially evaluated) but hashing the multi-GB output — as the
    // full-width force does — is memory-bandwidth-bound and would cap
    // thread scaling at the DRAM wall instead of measuring the kernel
    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      graft.extract.Extractor.extract(df)
        .select(sum(size(col("spans")))).collect()
      ()
    }
    // JIT warmup on a ~10% sample: thousands of kernel invocations compile
    // the hot paths without burning a full pass — under a neighbor-steal
    // storm a full-corpus pass costs minutes (measured 305 s for a
    // nominal-7 s pass), and the warmup does not need corpus coverage
    run(cached.sample(withReplacement = false, 0.1, seed = 7))
    // as many passes as the soft budget allows (cap 8), keeping the MIN:
    // the host's steal storms are bursty at the ~minutes timescale (passes
    // in ONE child measured 43 s and 321 s minutes apart), so sampling
    // repeatedly across the child's window is what catches a calm slot —
    // the scaling criterion compares peak CAPABILITY per level, and a
    // storm-depressed sample would understate both levels' capability
    val childT0 = System.nanoTime()
    def childElapsed = (System.nanoTime() - childT0) / 1e9
    var passes = 0
    var lastWall = 0.0
    val measured = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    while (passes < 8 &&
        (passes == 0 || childElapsed + 1.1 * lastWall < passBudgetSec)) {
      passes += 1
      Thread.sleep(300) // let async listener events drain
      val cpu0 = cpuNs.get()
      val wall = time(run(cached))
      Thread.sleep(300)
      System.err.println(f"[bench] child cores=$cores: pass $passes ${wall}%.1f s wall")
      measured += ((wall, (cpuNs.get() - cpu0) / 1e9))
      lastWall = wall
    }
    val (wallSec, cpuSec) = measured.minBy(_._1)
    s.stop()
    // third field: every pass's wall seconds — the artifact then shows the
    // weather (bursty steal storms read as bimodal pass times)
    println(s"TPUT ${nDocs / wallSec} ${nDocs * cores / cpuSec} " +
      measured.map(m => f"${m._1}%.1f").mkString(","))
  }

  def main(args: Array[String]): Unit = {
    // the f interpolator is locale-sensitive: a comma-decimal default
    // locale would corrupt both the TPUT wire line and the JSON itself
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    if (args.length >= 4 && args(0) == "tput") {
      tputMain(args(1).toInt, args(2), args(3).toDouble,
        if (args.length > 4) args(4).toInt else 100)
      return
    }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 20x replication (~100k docs at sf0.1) rather than round-2's 50x:
    // measured passes at local[2] still run ~7 s (ample resolution above
    // timer noise), while the 2-thread cache materialization + passes fit
    // the budget even under a steal burst — a 250k-doc local[2] child
    // measured 714 s under steal, eating the whole scaling allowance
    val rep = sys.env.getOrElse("SPARK_GRAFT_BENCH_REP", "20").toInt
    val scratch = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft_bench") + "/spans"
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1140").toDouble
    val skipScaling = sys.env.get("SPARK_GRAFT_BENCH_SKIP_SCALING").contains("1")

    State.sfDir = sfDir
    State.budgetSec = budget
    State.startNanos = System.nanoTime()
    def remaining: Double = budget - State.elapsed
    Runtime.getRuntime.addShutdownHook(new Thread(() => State.emit()))

    // ---- phase 1: per-query timings at the driver's cpu count ----
    // interleaved rounds + per-query min (see scaladoc): one warmup pass,
    // then up to `qreps` timed passes, stopping when the phase share of the
    // budget is spent (scaling needs the rest; with scaling skipped the
    // queries may use nearly all of it)
    val qreps = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERY_REPS", "3").toInt
    val queryPhaseCap = if (skipScaling) budget - 30 else budget * 0.45
    val s = session(cpus)
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
    // every query is present in the JSON from the start: -1.0 = never
    // successfully timed (the long-standing failed-query sentinel), so a
    // budget-shed tail reads as explicit -1.0 entries, not missing keys
    qs0.foreach { case (name, _) => State.queryTimes.putIfAbsent(name, -1.0); () }
    var break = false
    for ((name, fn) <- qs0 if !break) { // warmup (uncounted; misses run cold)
      try force(fn(s, sfDir)) catch { case _: Throwable => () }
      if (State.elapsed > queryPhaseCap * 0.5) break = true
    }
    var r = 0
    while (r < qreps && State.elapsed < queryPhaseCap) {
      r += 1
      var completedRound = true
      for ((name, fn) <- qs0) {
        if (State.elapsed >= queryPhaseCap) completedRound = false
        else {
          val sec = try time(force(fn(s, sfDir))) catch { case _: Throwable => -1.0 }
          System.err.println(s"[bench] round $r $name: $sec")
          State.queryTimes.merge(name, sec,
            (a, b) => if (a < 0) b else if (b < 0) a else math.min(a, b))
        }
      }
      // query_rounds counts only FULL rounds — a budget-cut round must not
      // read as a complete sample
      if (completedRound) State.queryRounds = r
    }
    s.stop()
    System.err.println(f"[bench] query phase done: $r rounds, ${State.elapsed}%.0f s elapsed")

    // ---- phase 2+3: scaling (prep then fresh-JVM interleaved reps) ----
    // N and 4N parallelism levels. Default 2 vs 8: far below the 32-core
    // host's saturation point, where neighbor steal and all-core frequency
    // effects distort least (8-vs-32 measured local[32] COLLAPSING on this
    // host — see BASELINE.md).
    val Array(coresN, cores4N) = sys.env.getOrElse("SPARK_GRAFT_BENCH_CORES", "2,8")
      .split(",").map(_.trim.toInt)
    State.coresN = coresN
    State.cores4N = cores4N
    // 4 reps by default: the budget logic sheds what doesn't fit, and the
    // host's steal storms last long enough that 2 weather samples per
    // level can both land inside one — more, cheaper reps beat fewer
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "4").toInt

    if (!skipScaling && remaining > 300) {
      // prep: materialize the replicated span table (not timed). spanMult
      // fattens each doc (repeat + re-offset) so per-doc kernel work
      // dominates fixed overheads — the compute regime the claim is about
      val spanMult = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPAN_MULT", "8").toInt
      val skipPrep = sys.env.get("SPARK_GRAFT_BENCH_SKIP_PREP").contains("1") &&
        new java.io.File(scratch).exists()
      val prep = session(cpus)
      if (!skipPrep) {
        val base = graft.synth.SpanSynth.docsInput(prep, sfDir)
        val fat = flatten(array_repeat(col("spans"), spanMult))
        val refat = transform(fat, (sp, i) => struct(
          sp.getField("kind").as("kind"),
          sp.getField("text").as("text"),
          sp.getField("media_ref").as("media_ref"),
          i.cast("int").as("offset")))
        val replicated = base
          .select(explode(sequence(lit(0), lit(rep - 1))).as("r"), col("doc_id"),
            refat.as("spans"))
          .select(concat(col("doc_id"), lit("-"), col("r")).as("doc_id"), col("spans"))
        replicated.repartition(32).write.mode("overwrite").parquet(scratch)
      }
      State.nDocs = prep.read.parquet(scratch).count()
      prep.stop()
      System.err.println(f"[bench] prepared ${State.nDocs} docs at $scratch (${State.elapsed}%.0f s elapsed)")

      // interleaved paired reps, best-of per level; a rep launches only if
      // the remaining budget fits it (estimated from the last rep, with a
      // floor for the first), and each child gets the remaining budget
      // minus a reserve as its hard timeout
      var i = 0
      var stop = false
      val repCosts = scala.collection.mutable.ArrayBuffer.empty[Double]
      // launch gate: before any rep completes, the conservative 300 s
      // floor; after one, the MEASURED cheapest rep + reserve (ADVICE r03:
      // the fixed floor shed a calm ~150 s rep with 279 s of budget left —
      // exactly the rep that would have fixed a storm-skewed ratio).
      // Children still self-limit (shrinking pass budget + hard timeout),
      // so an optimistic launch can never overrun the budget.
      def repGate(frac: Int): Double =
        if (repCosts.isEmpty) 300.0
        else math.min(300.0, repCosts.min * frac / 100.0 + 60.0)
      // current best-of ratio is weather-skewed -> the block would ship
      // with a weather_note; worth extra reps (full or reduced) to catch
      // one calm sample per level
      def weatherSkewed: Boolean =
        State.effWallNow.exists(State.effSkewed)
      val maxExtraReps = 3
      var extra = 0
      while (!stop &&
          (i < maxReps || (weatherSkewed && extra < maxExtraReps))) {
        // a weather-retry rep past maxReps shrinks the corpus to fit the
        // leftover budget: 100% if it fits, else 50%, else 25%
        val frac =
          if (i < maxReps) 100
          else Seq(100, 50, 25).find(f => remaining > repGate(f)).getOrElse(25)
        if (remaining < repGate(frac)) {
          System.err.println(f"[bench] budget: skipping scaling rep ${i + 1} (${remaining}%.0f s left, gate ${repGate(frac)}%.0f s)")
          stop = true
        } else {
          if (i >= maxReps) {
            extra += 1
            System.err.println(f"[bench] weather retry ${extra}: best-of ratio still skewed (${State.effWallNow.getOrElse(-1.0)}%.3f), rep at $frac%%")
          }
          val repT0 = State.elapsed
          // soft per-child pass budget: calm children finish in well under
          // it (8-pass cap); storm children stop sampling in time for the
          // OTHER level to run. The hard kill-cap stays as backstop.
          def passBudget = math.min(240.0, (remaining - 90) / 2)
          tputInChildJvm(coresN, scratch, remaining - 45, passBudget, frac) match {
            case None => stop = true
            case Some((nW, nC, nP)) =>
              tputInChildJvm(cores4N, scratch, remaining - 45, passBudget, frac) match {
                case None => stop = true // unpaired N run discarded (fair best-of)
                case Some((n4W, n4C, n4P)) =>
                  State.runsN.add((nW, nC))
                  State.runs4N.add((n4W, n4C))
                  State.passSecsN.add(nP)
                  State.passSecs4N.add(n4P)
                  State.repFracs.add(frac)
                  val repSec = State.elapsed - repT0
                  // normalize to FULL-corpus-equivalent cost — repGate
                  // scales by frac, so a cheap 25% rep must not make it
                  // think a full rep costs a quarter of reality
                  repCosts += repSec * (100.0 / frac)
                  i += 1
                  System.err.println(f"[bench] rep $i (frac $frac%%): tN=($nW,$nC) t4N=($n4W,$n4C) (${repSec}%.0f s)")
              }
          }
        }
      }
    } else if (!skipScaling) {
      System.err.println(f"[bench] budget: scaling phase skipped entirely (${remaining}%.0f s left)")
    }

    State.emit()
  }
}
