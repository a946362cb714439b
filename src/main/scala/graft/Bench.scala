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
    // storm detection (round-4 post-mortem: one storm pass ate 1096 of
    // 1140 s and killed the scaling phase): a 3-query canary against
    // calm minima pinned from committed artifact history decides whether
    // this run degrades (reduced-replication scaling FIRST, query rounds
    // at the smaller sf, tight per-query caps)
    @volatile var stormMode = false
    @volatile var canaryFactor = -1.0
    @volatile var querySf: String = "" // dir the timed query rounds used
    // queries whose shipped time came from the degraded-sf salvage pass —
    // their seconds are NOT comparable to same-named entries of calm runs
    val degraded = new java.util.concurrent.CopyOnWriteArrayList[String]()
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

    /** A CONSISTENT prefix snapshot of (runsN, runs4N, repFracs): the
      * shutdown hook can fire between the three adds of a completing rep
      * (SIGTERM mid-append), and indexing a longer list by a shorter
      * one's indices would throw inside emit() and lose the artifact.
      */
    def repsSnapshot: (Seq[(Double, Double)], Seq[(Double, Double)], Seq[Int],
        Seq[Seq[Double]], Seq[Seq[Double]]) = {
      import scala.jdk.CollectionConverters._
      val a = runsN.asScala.toSeq
      val b = runs4N.asScala.toSeq
      val f = repFracs.asScala.toSeq
      val pN = passSecsN.asScala.toSeq
      val p4N = passSecs4N.asScala.toSeq
      val k = Seq(a.size, b.size, f.size, pN.size, p4N.size).min
      (a.take(k), b.take(k), f.take(k), pN.take(k), p4N.take(k))
    }

    def fracIdx(fr: Seq[Int], frac: Int): Seq[Int] =
      fr.zipWithIndex.filter(_._1 == frac).map(_._2)

    /** (wall eff, cpu eff) over best-of the given rep indices. */
    def effOver(rN: Seq[(Double, Double)], r4N: Seq[(Double, Double)],
        idx: Seq[Int]): (Double, Double) = {
      val ratio = cores4N.toDouble / coresN
      val tN = idx.map(rN(_)._1).max; val t4N = idx.map(r4N(_)._1).max
      val cN = idx.map(rN(_)._2).max; val c4N = idx.map(r4N(_)._2).max
      (t4N / (ratio * tN), c4N / (ratio * cN))
    }

    /** The frac group the shipped efficiency is computed over: a reduced
      * (weather-retry) rep must NOT enter the same best-of pool as full
      * reps — a quarter corpus that fits cache where the full corpus
      * spills can overstate one level's best and skew the ratio. Prefer
      * the largest frac whose within-group ratio is weather-sane; if none
      * is, the group with the most reps (larger frac on ties).
      */
    def chosenFrac(rN: Seq[(Double, Double)], r4N: Seq[(Double, Double)],
        fr: Seq[Int]): Option[Int] =
      if (fr.isEmpty) None
      else {
        val groups = fr.distinct.sortBy(-(_: Int))
        Some(groups.find(g => !effSkewed(effOver(rN, r4N, fracIdx(fr, g))._1))
          .getOrElse(groups.maxBy(g => (fracIdx(fr, g).size, g))))
      }

    /** Wall-ratio efficiency over the chosen frac group so far, None until
      * one rep completed — the rep loop uses this to decide whether the
      * block would ship weather-contaminated and a retry rep is worth the
      * budget. Same group selection as the emitted `efficiency` field.
      */
    def effWallNow: Option[Double] = {
      val (rN, r4N, fr, _, _) = repsSnapshot
      chosenFrac(rN, r4N, fr).map(g => effOver(rN, r4N, fracIdx(fr, g))._1)
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
      val (rN, r4N, frSnap, pSnapN, pSnap4N) = repsSnapshot
      // "efficiency" = WALL-clock ratio (the honest headline; sensitive to
      // stragglers/idle loss); "efficiency_cpu" = CPU-time-derived ratio
      // (steal-immune cross-check — rationale in BASELINE.md)
      val scaling = if (rN.isEmpty || r4N.isEmpty) "null" else {
        // best-of WITHIN one corpus-fraction group (see chosenFrac): mixed
        // full/reduced pools can let a cache-resident quarter corpus
        // overstate one level's best and skew the very ratio the retry
        // reps exist to repair
        val g = chosenFrac(rN, r4N, frSnap).get
        val gi = fracIdx(frSnap, g)
        val tN = gi.map(rN(_)._1).max; val t4N = gi.map(r4N(_)._1).max
        val cN = gi.map(rN(_)._2).max; val c4N = gi.map(r4N(_)._2).max
        val (effWall, effCpu) = effOver(rN, r4N, gi) // ONE formula definition
        // an efficiency far outside [EffSaneLo, EffSaneHi] means the two
        // levels' best runs sampled DIFFERENT steal weather (one saw a
        // storm the other missed — a measured single-rep artifact hit 11.5
        // when the N child ran entirely inside a storm); say so in the
        // artifact instead of letting the headline stand alone
        val mixedNote =
          if (frSnap.distinct.size > 1)
            s" (efficiency over the frac=$g% reps only; other-frac reps excluded from the best-of pool)"
          else ""
        val note =
          if (effSkewed(effWall))
            s""","weather_note":"levels sampled different steal weather (${gi.size} paired rep(s) in the scored group)$mixedNote; capability ratio unreliable this run -- compare pass_secs and prior-run/BASELINE.md history""""
          else if (mixedNote.nonEmpty)
            s""","weather_note":"${mixedNote.trim.stripPrefix("(").stripSuffix(")")}""""
          else ""
        s"""{"docs":$nDocs,"cores_n":$coresN,"cores_4n":$cores4N,""" +
          s""""docs_per_sec_n":${f"$tN%.1f"},"docs_per_sec_4n":${f"$t4N%.1f"},""" +
          s""""efficiency":${f"$effWall%.3f"},"efficiency_cpu":${f"$effCpu%.3f"},""" +
          s""""efficiency_frac":$g,""" +
          s""""cpu_docs_per_sec_n":${f"$cN%.1f"},"cpu_docs_per_sec_4n":${f"$c4N%.1f"},""" +
          s""""wall_runs_n":${arr(rN.map(_._1))},"wall_runs_4n":${arr(r4N.map(_._1))},""" +
          s""""cpu_runs_n":${arr(rN.map(_._2))},"cpu_runs_4n":${arr(r4N.map(_._2))},""" +
          s""""pass_secs_n":${pSnapN.map(p => p.map(x => f"$x%.1f").mkString("[", ",", "]")).mkString("[", ",", "]")},""" +
          s""""pass_secs_4n":${pSnap4N.map(p => p.map(x => f"$x%.1f").mkString("[", ",", "]")).mkString("[", ",", "]")},""" +
          s""""rep_fracs":${frSnap.mkString("[", ",", "]")}$note}"""
      }
      val degradedJson = degraded.asScala.toSeq.sorted
        .map(n => s""""$n"""").mkString("[", ",", "]")
      println(
        s"""{"metric":"total_query_sec","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"queries_timed":$timed,"queries_total":${results.size},"sf":"$sfDir","scaling":$scaling,"query_rounds":$queryRounds,"storm_mode":$stormMode,"canary_factor":${f"$canaryFactor%.2f"},"query_sf":"$querySf","degraded_queries":$degradedJson,"budget_sec":${f"$budgetSec%.0f"},"elapsed_sec":${f"$elapsed%.0f"}}""")
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

  /** Calm-run canary pins: min-of-rounds seconds for three cheap queries
    * at local[32]/sf0.1 from the committed artifact history
    * (bench_r4_local.json: dedup_simhash 0.167, text_tokens 0.278,
    * corpus_pack 0.297). A WARM re-run of the trio that takes more than
    * [[main]]'s storm factor (default 6x) times this sum means the host
    * is inside a neighbor-steal storm and the run must degrade rather
    * than let one inflated pass eat the whole budget (round 4's driver
    * artifact burned 1096 of 1140 s on a single storm pass).
    */
  private val CanaryQueries = Seq("dedup_simhash", "text_tokens", "corpus_pack")
  private val CanaryCalmSec = 0.75

  /** Run `body` with a hard wall cap enforced by job-group cancellation:
    * a storm-inflated (or pathological) job then costs at most `capSec`,
    * not minutes — the round-4 failure mode was exactly per-query 45-80 s
    * storm times with no cap. Returns the wall seconds; -1 when the cap
    * cancelled the job (retry may help once weather/budget changes); -2
    * on a failure BEFORE the cap (deterministic — retrying the same job
    * cannot help). The watchdog is a daemon and exits as soon as the job
    * finishes.
    */
  private def timedRun(s: SparkSession, capSec: Double)(body: => Unit): Double = {
    val group = s"bench-${java.util.UUID.randomUUID()}"
    @volatile var finished = false
    val sc = s.sparkContext
    sc.setJobGroup(group, "graft-bench capped job", interruptOnCancel = true)
    val t0 = System.nanoTime()
    val watchdog = new Thread(() => {
      val deadline = t0 + (capSec * 1e9).toLong
      while (!finished && System.nanoTime() < deadline) Thread.sleep(50)
      if (!finished) sc.cancelJobGroup(group)
    })
    watchdog.setDaemon(true)
    watchdog.start()
    try time(body)
    catch {
      case _: Throwable =>
        if ((System.nanoTime() - t0) / 1e9 >= capSec - 0.5) -1.0 else -2.0
    }
    finally { finished = true; sc.clearJobGroup() }
  }

  private def timedForce(s: SparkSession, mk: => DataFrame, capSec: Double): Double =
    math.max(timedRun(s, capSec)(force(mk)), -1.0) // callers use -1 = not timed

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
    // canary inflation beyond this factor over the pinned calm seconds
    // flips storm mode (8x sits between observed calm jitter — warm-trio
    // factors 1.7-5.1 across idle-host runs, residual JIT + page-cache
    // state — and the 10-20x storms this microVM measures)
    val stormThresh = sys.env.getOrElse("SPARK_GRAFT_BENCH_STORM_FACTOR", "8").toDouble
    val qreps = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERY_REPS", "3").toInt

    State.sfDir = sfDir
    State.budgetSec = budget
    State.startNanos = System.nanoTime()
    def remaining: Double = budget - State.elapsed
    Runtime.getRuntime.addShutdownHook(new Thread(() => State.emit()))

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

    // ---- phase 0: storm canary ----
    // warm the trio (cold costs: parquet footers + codegen, calm ~2-5 s
    // per query) capped at 45 s each; a warm trio beyond stormThresh x
    // the pinned calm sum — or a warm pass that itself blew 45 s — means
    // storm. Cost: calm ~8 s, storm <= 135 s; round 4 lost 1096 s to the
    // missing detection.
    // the pinned calm constants describe the driver configuration (the
    // /root/testdata sf dirs on this host); an unknown sfDir would make a
    // legitimately-larger cold trio read as a storm, silently shipping
    // degraded numbers — so auto-detection only arms on known dirs
    val pinsApply = Seq("sf0.1", "sf0.01", "sf0.001")
      .contains(new java.io.File(sfDir).getName)
    val canary = session(cpus)
    val canaryFns = CanaryQueries.flatMap(n => SparkEntry.queries.get(n))
    val warmSum = canaryFns.map { fn =>
      val t = timedForce(canary, fn(canary, sfDir), 45.0)
      if (t < 0) 45.0 else t
    }.sum
    if (warmSum > 45.0) { // >=5x the ~8 s calm COLD trio: conclusive alone
      State.canaryFactor = warmSum / CanaryCalmSec
      State.stormMode = pinsApply
    } else {
      val timedSum = canaryFns.map { fn =>
        val t = timedForce(canary, fn(canary, sfDir), 30.0)
        if (t < 0) 30.0 else t
      }.sum
      State.canaryFactor = timedSum / CanaryCalmSec
      State.stormMode = pinsApply && State.canaryFactor > stormThresh
    }
    System.err.println(f"[bench] canary: factor ${State.canaryFactor}%.1f (storm=${State.stormMode}, warm ${warmSum}%.1f s, pins_apply=$pinsApply)")

    // the degraded query dir: the sibling sf0.01 (an order of magnitude
    // less data — even 20x-storm-inflated queries finish in seconds)
    val degradedSf = {
      val f = new java.io.File(sfDir)
      val sib = new java.io.File(f.getParentFile, "sf0.01")
      if (sib.isDirectory && sib.getPath != f.getCanonicalPath && sib.getPath != f.getPath)
        sib.getPath
      else sfDir
    }
    State.querySf = if (State.stormMode) degradedSf else sfDir

    // ---- scaling machinery (shared by the storm-first and calm-last
    // invocations) ----
    val repCosts = scala.collection.mutable.ArrayBuffer.empty[Double]

    var scratchReady = false
    var prepBroken = false // deterministic prep failure: retrying cannot help
    /** Materialize the replicated span table (not timed), under a hard
      * wall cap — prep was the last un-capped job in the storm design,
      * and a storm-inflated write must not eat the phases the cap budget
      * protects. Returns false (and skips scaling) on cap/failure; a
      * failure BEFORE the cap (disk full, unwritable dir) marks the prep
      * broken so later phases do not burn budget re-running a doomed job.
      */
    def prepScratch(repMult: Int, capSec: Double): Boolean = {
      // spanMult fattens each doc (repeat + re-offset) so per-doc kernel
      // work dominates fixed overheads — the regime the claim is about
      val spanMult = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPAN_MULT", "8").toInt
      val skipPrep = sys.env.get("SPARK_GRAFT_BENCH_SKIP_PREP").contains("1") &&
        new java.io.File(scratch).exists()
      val prep = session(cpus)
      var capped = false
      val ok = skipPrep || {
        val base = graft.synth.SpanSynth.docsInput(prep, sfDir)
        val fat = flatten(array_repeat(col("spans"), spanMult))
        val refat = transform(fat, (sp, i) => struct(
          sp.getField("kind").as("kind"),
          sp.getField("text").as("text"),
          sp.getField("media_ref").as("media_ref"),
          i.cast("int").as("offset")))
        val replicated = base
          .select(explode(sequence(lit(0), lit(repMult - 1))).as("r"), col("doc_id"),
            refat.as("spans"))
          .select(concat(col("doc_id"), lit("-"), col("r")).as("doc_id"), col("spans"))
        val t = timedRun(prep, capSec) {
          replicated.repartition(32).write.mode("overwrite").parquet(scratch)
        }
        capped = t == -1.0
        if (t == -2.0) prepBroken = true
        t >= 0
      }
      if (ok) State.nDocs = prep.read.parquet(scratch).count()
      prep.stop()
      if (ok)
        System.err.println(f"[bench] prepared ${State.nDocs} docs at $scratch (${State.elapsed}%.0f s elapsed)")
      else if (capped)
        System.err.println(f"[bench] prep exceeded its ${capSec}%.0f s cap — scaling deferred (${State.elapsed}%.0f s elapsed)")
      else
        System.err.println(f"[bench] prep FAILED before its cap — scaling disabled this run (${State.elapsed}%.0f s elapsed)")
      scratchReady = ok
      ok
    }

    /** Interleaved paired reps, appended to the shared State pools.
      * @param target       total paired reps wanted across ALL invocations
      * @param baseFrac     percent of the full corpus the SCRATCH holds
      *                     (storm mode preps at reduced replication)
      * @param reserveSec   budget slice runReps must leave untouched
      *                     (storm-first leaves room for the query phase)
      * @param childCapSec  hard per-child timeout cap (storm-first bounds
      *                     each child so a trapped child cannot starve the
      *                     queries; the final invocation passes infinity)
      * @param weatherExtras extra reduced reps allowed past `target` while
      *                     the best-of ratio is weather-skewed
      */
    def runReps(target: Int, baseFrac: Int, reserveSec: Double,
        childCapSec: Double, weatherExtras: Int): Unit = {
      var stop = false
      var extra = 0
      def repsDone = State.runsN.size()
      def weatherSkewed = State.effWallNow.exists(State.effSkewed)
      // launch gate: before any rep completes, a frac-scaled floor; after
      // one, the MEASURED cheapest full-equivalent rep cost scaled to this
      // rep's fraction + reserve (ADVICE r03: a fixed floor shed a calm
      // ~150 s rep with 279 s left — exactly the rep that would have fixed
      // a storm-skewed ratio). Children still self-limit, so an optimistic
      // launch can never overrun the budget.
      def repGate(effFrac: Int): Double =
        if (repCosts.isEmpty) math.max(120.0, 300.0 * effFrac / 100.0)
        else math.min(300.0, repCosts.min * effFrac / 100.0 + 60.0)
      while (!stop && (repsDone < target || (weatherSkewed && extra < weatherExtras))) {
        val isExtra = repsDone >= target
        // a weather-retry rep past target shrinks the child's corpus
        // sample to fit the leftover budget: 100% if it fits, else 50/25%
        val childFrac =
          if (!isExtra) 100
          else Seq(100, 50, 25)
            .find(f => remaining - reserveSec > repGate(math.max(1, baseFrac * f / 100)))
            .getOrElse(25)
        val label = math.max(1, baseFrac * childFrac / 100)
        if (remaining - reserveSec < repGate(label)) {
          System.err.println(f"[bench] budget: skipping scaling rep ${repsDone + 1} (${remaining}%.0f s left, reserve ${reserveSec}%.0f, gate ${repGate(label)}%.0f s)")
          stop = true
        } else {
          if (isExtra) {
            extra += 1
            System.err.println(f"[bench] weather retry ${extra}: best-of ratio still skewed (${State.effWallNow.getOrElse(-1.0)}%.3f), child frac $childFrac%%")
          }
          val repT0 = State.elapsed
          // soft per-child pass budget: calm children finish well under it
          // (8-pass cap); storm children stop sampling in time for the
          // OTHER level to run. The hard kill-cap stays as backstop.
          def childTimeout = math.min(childCapSec, remaining - reserveSec - 45)
          def passBudget = math.min(240.0, (math.min(childCapSec * 2, remaining - reserveSec) - 90) / 2)
          tputInChildJvm(coresN, scratch, childTimeout, passBudget, childFrac) match {
            case None => stop = true
            case Some((nW, nC, nP)) =>
              tputInChildJvm(cores4N, scratch, childTimeout, passBudget, childFrac) match {
                case None => stop = true // unpaired N run discarded (fair best-of)
                case Some((n4W, n4C, n4P)) =>
                  State.runsN.add((nW, nC))
                  State.runs4N.add((n4W, n4C))
                  State.passSecsN.add(nP)
                  State.passSecs4N.add(n4P)
                  State.repFracs.add(label)
                  val repSec = State.elapsed - repT0
                  // normalize to FULL-corpus-equivalent cost — repGate
                  // scales by frac, so a cheap 25% rep must not make it
                  // think a full rep costs a quarter of reality
                  repCosts += repSec * (100.0 / label)
                  System.err.println(f"[bench] rep $repsDone (frac $label%%): tN=($nW,$nC) t4N=($n4W,$n4C) (${repSec}%.0f s)")
              }
          }
        }
      }
    }

    // ---- storm path: the scaling phase gets its reserved slice FIRST,
    // at reduced replication (cheap prep, cheap passes) — round 4 proved
    // that running it last lets one storm pass of the query phase starve
    // it to "scaling": null. rep_fracs discloses the reduction. Half, not
    // quarter: below ~50k docs the 4N level's pass time is fixed-cost
    // dominated and the ratio reads low even on a calm host.
    val stormRepMult = math.max(1, rep / 2)
    val stormBaseFrac = math.max(1, stormRepMult * 100 / rep)
    if (!skipScaling && State.stormMode) {
      canary.stop()
      // prep cap 360 s: a storm-trapped prep defers scaling to the
      // post-query budget instead of eating the query reserve
      if (prepScratch(stormRepMult, 360.0))
        runReps(target = 1, baseFrac = stormBaseFrac, reserveSec = 300.0,
          childCapSec = 270.0, weatherExtras = 0)
    }

    // ---- query phase: interleaved rounds + per-query min (see scaladoc),
    // every query under a hard wall cap (timedForce), phase under an
    // absolute deadline, then a salvage pass at the degraded sf so a
    // never-timed query still ships a number instead of -1
    val s = if (!skipScaling && State.stormMode) session(cpus) else canary
    val phaseStart = State.elapsed
    val deadline =
      if (skipScaling) budget - 30
      else if (State.stormMode) phaseStart + math.max(120.0, math.min(300.0, remaining - 120.0))
      else math.min(budget * 0.45, budget - math.min(500.0, budget * 0.5))
    val warmCap = if (State.stormMode) 30.0 else 90.0
    val roundCap = if (State.stormMode) 20.0 else 45.0
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
    // every query is present in the JSON from the start: -1.0 = never
    // successfully timed (the long-standing failed-query sentinel), so a
    // budget-shed tail reads as explicit -1.0 entries, not missing keys
    qs0.foreach { case (name, _) => State.queryTimes.putIfAbsent(name, -1.0); () }
    var break = false
    for ((name, fn) <- qs0 if !break) { // warmup (uncounted; misses run cold)
      timedForce(s, fn(s, State.querySf), warmCap)
      if (State.elapsed > phaseStart + 0.4 * (deadline - phaseStart)) break = true
    }
    var r = 0
    while (r < qreps && State.elapsed < deadline) {
      r += 1
      var completedRound = true
      for ((name, fn) <- qs0) {
        if (State.elapsed >= deadline) completedRound = false
        else {
          val sec = timedForce(s, fn(s, State.querySf), roundCap)
          System.err.println(s"[bench] round $r $name: $sec")
          State.queryTimes.merge(name, sec,
            (a, b) => if (a < 0) b else if (b < 0) a else math.min(a, b))
        }
      }
      // query_rounds counts only FULL rounds — a budget-cut round must not
      // read as a complete sample
      if (completedRound) State.queryRounds = r
    }
    // salvage: any query with no successful timing gets one attempt at the
    // degraded sf (cap 20 s) — queries_timed == queries_total even under a
    // full-run storm, with the names disclosed in degraded_queries
    for ((name, fn) <- qs0
         if State.queryTimes.get(name) < 0 && State.elapsed < budget - 45) {
      val sec = timedForce(s, fn(s, degradedSf), 20.0)
      if (sec >= 0) {
        State.queryTimes.put(name, sec)
        State.degraded.add(name)
        System.err.println(f"[bench] salvage $name @ $degradedSf: $sec%.2f s")
      }
    }
    s.stop()
    System.err.println(f"[bench] query phase done: $r rounds, ${State.elapsed}%.0f s elapsed")

    // ---- remaining scaling reps ----
    if (!skipScaling) {
      if (State.stormMode) {
        // same reduced scratch (re-prepped if the capped storm prep was
        // cancelled — but not if it FAILED); whatever budget queries left
        if (scratchReady ||
            (!prepBroken && prepScratch(stormRepMult, math.max(60.0, remaining - 150))))
          runReps(target = maxReps, baseFrac = stormBaseFrac, reserveSec = 0.0,
            childCapSec = Double.MaxValue, weatherExtras = 3)
      } else if (remaining > 300) {
        if (prepScratch(rep, math.max(60.0, remaining - 180)))
          runReps(target = maxReps, baseFrac = 100, reserveSec = 0.0,
            childCapSec = Double.MaxValue, weatherExtras = 3)
      } else {
        System.err.println(f"[bench] budget: scaling phase skipped entirely (${remaining}%.0f s left)")
      }
    }

    State.emit()
  }
}
