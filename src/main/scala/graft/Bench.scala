package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract). Prints ONE JSON line:
  *   {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...,
  *    "scaling":{...}}
  *
  * Two measurements (protocol in BASELINE.md):
  *  1. Extraction throughput (docs/sec) over a materialized span table at
  *     local[8] vs local[32] — the in-sandbox evidence for the north_rule's
  *     N vs 4N cluster-scaling criterion (efficiency = tput32/(4*tput8)).
  *     The input is pre-written to parquet (64 files) so the read
  *     parallelizes the way a real bucketed table would; evaluation is
  *     forced with a full-width aggregate (count() would prune the
  *     extraction away).
  *  2. Per-query seconds for every SparkEntry query at local[32].
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

  /** Best-of-n wall seconds after one warmup. */
  private def bestOf(n: Int)(f: => Unit): Double = {
    f // warmup
    (1 to n).map(_ => time(f)).min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rep = sys.env.getOrElse("SPARK_GRAFT_BENCH_REP", "20").toInt
    val scratch = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft_bench") + "/spans"

    // ---- prepare: materialize the replicated span table (not timed) ----
    val prep = session(cpus)
    val base = graft.synth.SpanSynth.docsInput(prep, sfDir)
    val replicated = base
      .select(explode(sequence(lit(0), lit(rep - 1))).as("r"), col("doc_id"), col("spans"))
      .select(concat(col("doc_id"), lit("-"), col("r")).as("doc_id"), col("spans"))
    replicated.repartition(64).write.mode("overwrite").parquet(scratch)
    val nDocs = prep.read.parquet(scratch).count()
    prep.stop()

    // ---- scaling: identical extraction job at 8 and 32 threads ----
    def tput(cores: Int): Double = {
      val s = session(cores)
      val sec = bestOf(2) {
        force(graft.extract.Extractor.extract(s.read.parquet(scratch)))
      }
      s.stop()
      nDocs / sec
    }
    System.err.println(s"[bench] prepared $nDocs docs at $scratch")
    val t8 = tput(8)
    System.err.println(s"[bench] tput8=$t8")
    val t32 = tput(32)
    System.err.println(s"[bench] tput32=$t32")
    val eff = t32 / (4.0 * t8)

    // ---- per-query timings at the driver's cpu count ----
    val s = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try bestOf(1)(force(fn(s, sfDir))) catch { case _: Throwable => -1.0 }
      System.err.println(s"[bench] $name: $sec")
      name -> sec
    }
    s.stop()

    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val scaling =
      s"""{"docs":$nDocs,"docs_per_sec_8":${f"$t8%.1f"},"docs_per_sec_32":${f"$t32%.1f"},"efficiency":${f"$eff%.3f"}}"""
    println(
      s"""{"metric":"total_query_sec","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
