package graft

import graft.textops.{Decontam, PortableHash, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the decontamination and PII-scrub passes (the DuckDB
  * oracle is the value gate; these pin the graph/logic invariants).
  */
class DecontamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("decontamination flags exactly the docs sharing a gram with the benchmark set") {
    val rows = Decontam.decontaminate(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length === docs.size) // audit shape: one row per doc

    // Scala reference: same hash family, same threshold
    def isBench(id: Long) =
      PortableHash.hexint32(s"bench-$id") % 1000 < Decontam.BenchmarkThreshold
    val benchGrams = docs.collect {
      case (id, t) if isBench(id) => TextAnalysis.gramHashesScala(t).toSet
    }.fold(Set.empty[Long])(_ ++ _)
    assert(benchGrams.nonEmpty)

    var contaminatedSeen = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val grams = TextAnalysis.gramHashesScala(docs(id))
      assert(r.getAs[Boolean]("is_benchmark") === isBench(id))
      assert(r.getAs[Int]("n_grams") === grams.length)
      val expected = !isBench(id) && grams.exists(benchGrams)
      assert(r.getAs[Boolean]("contaminated") === expected, s"doc $id")
      if (expected) contaminatedSeen += 1
    }
    // the fixture corpus plants exact dups, so overlap across the
    // benchmark boundary must exist — the query is not vacuous
    assert(contaminatedSeen > 0)
    // benchmark docs are never flagged against themselves
    assert(rows.filter(_.getAs[Boolean]("is_benchmark"))
      .forall(!_.getAs[Boolean]("contaminated")))
  }

  test("pii scrub redacts planted email/ip/phone and counts each category") {
    val rows = TextAnalysis.piiScrub(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val clean = r.getAs[String]("clean_text")
      (id % 3) match {
        case 0 =>
          assert(r.getAs[Int]("n_emails") >= 1, s"doc $id")
          assert(clean.contains("<EMAIL>"))
          assert(!clean.contains("@example.com"))
        case 1 =>
          assert(r.getAs[Int]("n_ips") >= 1, s"doc $id")
          assert(r.getAs[Int]("n_phones") >= 1, s"doc $id")
          assert(clean.contains("<IP>") && clean.contains("<PHONE>"))
          assert(!clean.contains("555-867-5309"))
        case _ => ()
      }
      assert(r.getAs[Int]("n_redactions") ===
        r.getAs[Int]("n_emails") + r.getAs[Int]("n_ips") + r.getAs[Int]("n_phones"))
    }
    // scrubbing is idempotent: a second pass over clean text redacts nothing
    import spark.implicits._
    val again = rows.map(_.getAs[String]("clean_text")).toSeq.toDF("text")
      .select(
        size(regexp_extract_all(col("text"), lit(TextAnalysis.PiiEmailPattern), lit(0))).as("e"),
        size(regexp_extract_all(col("text"), lit(TextAnalysis.PiiIpPattern), lit(0))).as("i"),
        size(regexp_extract_all(col("text"), lit(TextAnalysis.PiiPhonePattern), lit(0))).as("p"))
      .agg(sum(col("e") + col("i") + col("p"))).collect()(0).getLong(0)
    assert(again === 0L)
  }
}
