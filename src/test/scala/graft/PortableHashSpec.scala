package graft

import graft.textops.{PortableHash, SimHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The portable md5-prefix hash must agree across its three
  * implementations (Spark column op, plain Scala, DuckDB — the last is
  * covered by the driver oracle gate; this spec pins Spark == Scala so the
  * mapPartitions media stub and the native SimHash stay consistent with
  * the column ops).
  */
class PortableHashSpec extends AnyFunSuite with SparkSpec {

  test("Spark hexint32/hexint60 == Scala md5-prefix ints") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "média açúcar ﬁ", "doc-00000042#w")
    val fromSpark = inputs.toDF("s")
      .select(PortableHash.hexint32(col("s")), PortableHash.hexint60(col("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val fromScala = inputs.map { s =>
      (PortableHash.hexint32(s),
        java.lang.Long.parseLong(PortableHash.md5Hex(s).substring(0, 15), 16))
    }
    assert(fromSpark.toSeq === fromScala)
  }

  test("native simhash60 expression == Scala SimHash.simhash") {
    import spark.implicits._
    val inputs = Seq("", "a b c", "the quick fox", "x x x x y")
    val fromSpark = inputs.toDF("s")
      .select(SimHash.simhash60(col("s"))).collect().map(_.getLong(0))
    assert(fromSpark.toSeq === inputs.map(SimHash.simhash))
  }

  test("native fingerprint60 == columnar reference == Scala twin") {
    import graft.textops.TextAnalysis
    import spark.implicits._
    val inputs = Seq("", "a b c", "one two three four five",
      "one two three four five six seven", "the  double  space case x y z")
    val df = inputs.toDF("s").cache()
    val native = df.select(TextAnalysis.fingerprint60(col("s"))).collect().map(_.getLong(0))
    val columnar = df.select(TextAnalysis.fingerprintColumnar(col("s"))).collect().map(_.getLong(0))
    assert(native.toSeq === columnar.toSeq)
    assert(native.toSeq === inputs.map(TextAnalysis.fingerprintScala))
    df.unpersist()
  }

  test("native repetition fracs == columnar reference (full sf0.001 docs)") {
    import graft.textops.TextAnalysis
    val d = TextAnalysis.loadDocs(SparkSpec.session, "/root/testdata/sf0.001")
    val native = d.select(col("doc_id"), TextAnalysis.repetitionFracs(col("text")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val columnar = d.select(col("doc_id"),
      TextAnalysis.repetitionFracColumnar(col("text"), 2),
      TextAnalysis.repetitionFracColumnar(col("text"), 3))
      .collect().map(r => (r.getLong(0), Seq(r.getDouble(1), r.getDouble(2))))
    assert(native.sortBy(_._1).toSeq === columnar.sortBy(_._1).toSeq)
  }

  test("media stub decode is deterministic and in documented ranges") {
    val f = graft.media.MediaFeatures.decodeOne(
      graft.media.MediaFeatures.MediaRef("d", "media://d/0", 1))
    assert(f === graft.media.MediaFeatures.decodeOne(
      graft.media.MediaFeatures.MediaRef("d", "media://d/0", 1)))
    assert(f.width >= 64 && f.width < 64 + 1857)
    assert(f.height >= 64 && f.height < 64 + 1017)
    assert(Set("jpeg", "png", "webp").contains(f.format))
    assert(f.byte_size >= 1024)
  }
}
