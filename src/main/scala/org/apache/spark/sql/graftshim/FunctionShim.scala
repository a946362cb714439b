package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the session FunctionRegistry (`sessionState` is `private[sql]`
  * in Spark 4) — lets [[graft.GraftExtensions.register]] add the native
  * expressions to an ALREADY-RUNNING session; new sessions use the public
  * `spark.sql.extensions` mechanism instead.
  */
object FunctionShim {
  def registerTemp(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
