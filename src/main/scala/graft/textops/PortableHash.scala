package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashes computable bit-identically in Spark, DuckDB, and plain Scala —
  * the foundation for oracle-verifiable dedup/similarity operators. md5 is
  * the only hash all three share; we take hex prefixes as integers.
  *
  * At 100 TB the md5 cost is irrelevant next to the shuffle it feeds, and
  * a keyed-prefix family (`md5(i + ":" + s)`) gives unlimited independent
  * hash functions for MinHash without custom expressions.
  */
object PortableHash {

  /** First 15 hex chars of md5 as a non-negative long (< 2^60).
    * DuckDB: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    */
  def hexint60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** First 8 hex chars of md5 as a long (< 2^32) — fits exactly in a
    * double, so bit extraction stays exact in any engine.
    * DuckDB: `CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)`.
    */
  def hexint32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Keyed hash family member i (independent-ish hashes for MinHash). */
  def keyed60(i: Int, c: Column): Column =
    hexint60(concat(lit(s"$i:"), c))

  // --- Scala-side equivalents (for typed/mapPartitions stages) ---

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def hexint32(s: String): Long = java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)

  // --- DuckDB SQL fragments ---

  def duckHexint60(x: String): String = s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"
  def duckHexint32(x: String): String = s"CAST('0x' || substr(md5($x), 1, 8) AS BIGINT)"
}
