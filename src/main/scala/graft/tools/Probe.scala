package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only timing probe for hot operators (not part of the driver
  * contract). Usage: runMain graft.tools.Probe <sfDir> <name>...
  */
object Probe {
  def force(df: DataFrame): Long = {
    df.select(max(xxhash64(struct(df.columns.map(col): _*)))).collect()
    df.count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => DataFrame): Unit =
      if (names.isEmpty || names.contains(name)) {
        val t0 = System.nanoTime()
        val n = force(f)
        println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

    import graft.textops._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")

    // round-6 sub-plan probes (run each op once to fill memos, then time
    // the listed pieces; names: probe with `containment_x` etc.)
    t("warm_containment") { Dedup.containment(spark, sfDir) }
    t("containment_full") { Dedup.containment(spark, sfDir) }
    t("warm_clean") { TextAnalysis.cleanPipeline(spark, sfDir) }
    t("clean_full") { TextAnalysis.cleanPipeline(spark, sfDir) }
    t("clean_keepers") { TextAnalysis.cleanPlanDupLines(spark, sfDir) }
    t("minhash_full") { Dedup.minhashLsh(spark, sfDir) }
    t("ngram_full") { Dedup.ngramJaccard(spark, sfDir) }
    t("dead_letter") { graft.serve.Queries.deadLetters(spark, sfDir) }
    t("synth_flat") { graft.synth.SpanSynth.flatSpans(spark, sfDir) }
    t("synth_flat_filtered") {
      graft.synth.SpanSynth.flatSpans(spark, sfDir)
        .where(!col("kind").isin(graft.model.Schemas.knownKinds: _*))
    }
    spark.stop()
  }
}
