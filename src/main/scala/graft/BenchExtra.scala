package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic benchmark main (guide §1: measure first) — NOT part of the
  * driver contract ([[Bench]] is frozen and stays the measured artifact).
  * For each declared query this reports, per invocation:
  *
  *   - wall seconds for the same hash-force action [[Bench]] times
  *     (warmup pass + min over interleaved rounds, same methodology);
  *   - the number of Spark JOBS the timed action launched (every eager
  *     driver action inside a query builder — count()/head()/memo
  *     materialization — shows up here as an extra job: fixed scheduling
  *     overhead the plan-level numbers cannot explain);
  *   - the number of completed STAGES (shuffle boundaries actually run);
  *   - optionally a noop-sink timing (guide §1.4) as a cross-check that
  *     the hash-force is not dominated by the final hash itself.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [--rounds N] [--noop] [--plans DIR] [q...]"
  *
  * With `--plans DIR` it writes `DIR/<query>.txt` with
  * `.explain("formatted")` for each selected query (the judge-facing
  * before/after artifacts under plans/r06/).
  */
object BenchExtra {

  private def force(df: DataFrame): Unit = {
    val all = struct(df.columns.map(col): _*)
    df.select(max(xxhash64(all))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var rounds = 3
    var noop = false
    var plansDir: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--rounds" => rounds = args(i + 1).toInt; i += 2
        case "--noop" => noop = true; i += 1
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case q => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // job/stage counters via listener (events are async: drain with a
    // short sleep before reading — this is a diagnostic, not an artifact)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    })

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }

    // warmup pass (cold: parquet footers, codegen, memo tables)
    val warm = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for ((name, fn) <- qs) {
      val t0 = System.nanoTime()
      force(fn(spark, sfDir))
      warm(name) = (System.nanoTime() - t0) / 1e9
    }

    val best = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Int, Int)]
    for (r <- 1 to rounds; (name, fn) <- qs) {
      Thread.sleep(150); jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      force(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      val (j, st) = (jobs.get(), stages.get())
      best.get(name) match {
        case Some((b, _, _)) if b <= sec => ()
        case _ => best(name) = (sec, j, st)
      }
    }
    var total = 0.0
    for ((name, (sec, j, st)) <- best) {
      total += sec
      println(f"QEXTRA $name%-28s min=$sec%7.3f s  warm=${warm(name)}%7.3f s  jobs=$j%2d stages=$st%2d")
    }
    println(f"QEXTRA_TOTAL ${total}%.3f s over ${best.size} queries (min of $rounds rounds)")

    if (noop) {
      for ((name, fn) <- qs) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"QNOOP $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }

    plansDir.foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      for ((name, fn) <- qs) {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val elided = plan.linesIterator.map(l =>
          if (l.length <= 400) l else l.take(400) + " …<elided>").mkString("\n")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/$name.txt"), elided)
      }
      println(s"wrote plans to $dir")
    }
    spark.stop()
  }
}
