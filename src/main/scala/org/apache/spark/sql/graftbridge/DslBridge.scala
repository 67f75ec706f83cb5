package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` seams the SQL DML surface needs, re-exported
  * from a subpackage of `org.apache.spark.sql` (the standard placement
  * for Spark-extension libraries — see [[PredExtract]] for the same
  * pattern and the policy note): wrapping a parsed Catalyst
  * [[Expression]] back into a public [[Column]] (so a DML statement's
  * WHERE / action conditions can be applied with ordinary DataFrame
  * operations, resolving against the frame they filter), and running a
  * captured [[LogicalPlan]] as a [[DataFrame]] (so a MERGE source /
  * INSERT query subtree analyzes and executes standalone inside the
  * command's `run`). Read-only adapters — no internal behavior is
  * altered.
  */
object DslBridge {

  /** A [[Column]] over a Catalyst expression; unresolved attributes in
    * it resolve against whatever frame the column is applied to —
    * exactly the deferred-resolution a DML condition captured at parse
    * time needs.
    */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The inverse of [[column]]: the Catalyst expression a captured
    * [[Column]] wraps — the DML commands re-inspect and rewrite their
    * captured conditions/assignments per run (side disambiguation
    * against the actual source/target column sets, which are only
    * known at execution time).
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Analyze + wrap a logical plan as a DataFrame of this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-brand a fully-planned batch DataFrame as a STREAMING one — the
    * contract a V1 streaming `Source.getBatch` result must satisfy
    * (`MicroBatchExecution` asserts `isStreaming`). Planning (and with
    * it the engine's manifest/zone/bloom pruning) runs here, on the
    * batch plan, exactly as it would for the equivalent batch read; the
    * micro-batch then consumes the planned RDD through a
    * [[org.apache.spark.sql.execution.LogicalRDD]] carrying the
    * streaming flag — the same wrapping Spark's own
    * `DataStreamReader`-era sources use for computed batches.
    */
  def asStreamingBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd, isStreaming = true)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
  }

  /** The inverse brand-swap for a V1 streaming `Sink.addBatch`: the
    * micro-batch Dataset a sink receives is incrementally planned and
    * still flagged streaming, so handing it to ordinary batch writers
    * throws. Its planned rows wrapped in a non-streaming
    * [[org.apache.spark.sql.execution.LogicalRDD]] ARE the batch —
    * distribution preserved, nothing collected.
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
  }
}
