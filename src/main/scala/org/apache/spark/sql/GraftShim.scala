package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column<->Expression conversions, so graft's
  * custom Catalyst expressions can surface as user-facing Columns.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-plan a computed batch frame as a STREAMING micro-batch frame —
    * what a V1 `Source.getBatch` must hand back (MicroBatchExecution
    * splices it into the streaming plan, which requires isStreaming).
    * The batch frame's physical rows are reused as-is.
    */
  def asMicroBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
