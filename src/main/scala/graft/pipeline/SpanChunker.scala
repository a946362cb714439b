package graft.pipeline

import graft.extract.ExtractKernel
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Splits a document's span array into extraction-equivalent chunks for the
  * heavy-document skew path (SURVEY.md §4.2 "large-document skew"; the
  * reference's analog is one huge PDF pinning a Celery worker, mitigated
  * only by prefetch=1, reference workers.py:34).
  *
  * Chunk boundaries ALWAYS align with run boundaries (maximal same-kind
  * segments, the unit [[ExtractKernel]] serializes), so extracting chunks
  * independently and concatenating the outputs (dropping per-chunk
  * sentinels) is provably equal to whole-document extraction — a run is
  * never split, so each run's serialization is byte-identical, and
  * consecutive runs always emit separate output spans anyway. Verified by
  * the chunk-equivalence property tests in SkewSalterSpec.
  */
object SpanChunker {

  /** Greedy run-aligned packing: pack whole runs until `target` spans;
    * a single run larger than `target` forms its own chunk.
    */
  def chunk(spans: Seq[ExtractKernel.S], target: Int): Seq[Seq[ExtractKernel.S]] = {
    if (spans.length <= target) return Seq(spans)
    val sorted = spans.sortBy(_._4)
    def key(s: ExtractKernel.S): String = {
      val sheet = s._3 != null && s._3.startsWith("sheet:")
      if (sheet) s._1 + "#s" else s._1
    }
    val chunks = ArrayBuffer.empty[Seq[ExtractKernel.S]]
    val cur = ArrayBuffer.empty[ExtractKernel.S]
    var i = 0
    val n = sorted.length
    while (i < n) {
      var j = i + 1
      val k = key(sorted(i))
      while (j < n && key(sorted(j)) == k) j += 1
      val run = sorted.slice(i, j)
      if (cur.nonEmpty && cur.length + run.length > target) {
        chunks += cur.toSeq; cur.clear()
      }
      cur ++= run
      i = j
    }
    if (cur.nonEmpty) chunks += cur.toSeq
    chunks.toSeq
  }

  /** `chunk_spans(spans, target)` as a Column. */
  def chunk_spans(spans: Column, target: Column): Column =
    ColumnShim.column(ChunkSpansExpr(
      ColumnShim.expression(spans), ColumnShim.expression(target)))
}

/** Catalyst expression: `array<span-struct>`, `int` → `array<array<span-struct>>`. */
case class ChunkSpansExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private val spanStruct = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("media_ref", StringType, nullable = true),
    StructField("offset", IntegerType, nullable = false)))

  override def dataType: DataType =
    ArrayType(ArrayType(spanStruct, containsNull = false), containsNull = false)

  override def nullSafeEval(spansAny: Any, targetAny: Any): Any = {
    val arr = spansAny.asInstanceOf[ArrayData]
    val target = targetAny.asInstanceOf[Int]
    val in = new ArrayBuffer[ExtractKernel.S](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      val row = arr.getStruct(i, 4)
      in += ((str(row, 0), str(row, 1), str(row, 2), row.getInt(3)))
      i += 1
    }
    val chunks = SpanChunker.chunk(in.toSeq, target)
    new GenericArrayData(chunks.map { c =>
      new GenericArrayData(c.map { case (k, t, m, o) =>
        InternalRow(u(k), u(t), u(m), o)
      }.toArray[Any])
    }.toArray[Any])
  }

  private def str(r: InternalRow, i: Int): String =
    if (r.isNullAt(i)) null else r.getUTF8String(i).toString
  private def u(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChunkSpansExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "chunk_spans"
}
