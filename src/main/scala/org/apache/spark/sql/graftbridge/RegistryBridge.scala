package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** FunctionRegistry access for in-session registration of the native
  * kernels. `sessionState` is `private[sql]` in Spark 4, so the one call
  * is re-exported from inside the package — same shim pattern as
  * [[ColumnBridge]], declared as such here. */
object RegistryBridge {
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
