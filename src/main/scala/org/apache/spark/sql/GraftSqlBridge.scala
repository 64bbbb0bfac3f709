package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters,
  * needed to expose a custom Catalyst `Expression` (graft.functions
  * .VecDot) through the public Column API. Spark 4 wraps Column around
  * ColumnNode; `classic.ExpressionUtils` is the blessed converter for
  * the classic execution backend but is sql-private, hence this shim
  * package. No Spark internals are modified — this only re-exports two
  * pure conversion functions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. [[expression]] wraps the
    * Column's node tree in a lazy `ColumnNodeExpression` that only the
    * Dataset-boundary converter unrolls — embedded in a
    * FunctionRegistry builder's output it survives analysis unconverted
    * and fails at codegen (`Unevaluable`). This converts the whole node
    * tree to catalyst expressions up front (inner functions become
    * plain `UnresolvedFunction`s the analyzer resolves normally), which
    * is what a registry builder returning a Column COMPOSITION needs. */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The RDD backing a `localCheckpoint()`ed Dataset, so iterative
    * algorithms can free a superseded checkpoint's blocks explicitly —
    * the Dataset API offers no way to unpersist checkpoint storage. */
  def checkpointRdd(df: Dataset[Row]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Register a native Expression builder as a temp SQL function on a
    * LIVE session — the path for sessions not built with
    * [[graft.functions.GraftExtensions]] (e.g. a host application's
    * session handed to the library). `sessionState` is sql-private,
    * hence here. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Collision-free per-session identity (the sql-private sessionUUID
    * on Spark 4's classic concrete class) for session-keyed caches —
    * identity hashes can collide across sessions after GC churn. The
    * identity fallback only applies to a non-classic implementation,
    * which cannot be live in the same JVM as a classic session of the
    * same hash. */
  def sessionUuid(spark: SparkSession): String = spark match {
    case c: classic.SparkSession => c.sessionUUID
    case other => s"id-${System.identityHashCode(other)}"
  }

  /** A typed `Aggregator` as a Catalyst aggregate expression — what a
    * FunctionRegistry builder must return for a SQL-callable UDAF. The
    * public `functions.udaf(...).apply(col)` wraps the call in a lazy
    * ColumnNode that only the Column → plan converter unrolls; inside a
    * registry builder that wrapper survives analysis unconverted and
    * the deserializer check fails, so the `ScalaAggregator` (sql-
    * private) is built directly here. Encoders resolve later via
    * Spark's own `ResolveEncodersInScalaAgg` analyzer rule. */
  def udafExpression[IN, BUF, OUT](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT],
      inputEncoder: Encoder[IN],
      children: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
    def toExpr[T](e: Encoder[T]): ExpressionEncoder[T] = e match {
      case ee: ExpressionEncoder[T @unchecked] => ee
      case ae: AgnosticEncoder[T @unchecked] => ExpressionEncoder(ae)
      case other => throw new IllegalArgumentException(
        s"unsupported encoder ${other.getClass.getName}")
    }
    new execution.aggregate.ScalaAggregator(
      children, agg, toExpr(inputEncoder), toExpr(agg.bufferEncoder))
      .toAggregateExpression()
  }

  /** Block until the listener bus has delivered all queued events.
    * Task-metric gauges read by listeners (Runner's memory gauge) are
    * delivered asynchronously; without a drain a metrics read races the
    * last task's event. `waitUntilEmpty` is `private[spark]`, hence here. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
