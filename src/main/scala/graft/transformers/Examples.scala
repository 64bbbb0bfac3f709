package graft.transformers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Transformer

/** Example transformers, loaded by fully-qualified name through
  * TransformerRegistry (the analogue of the reference's dotted-path
  * transformer imports, Pype.py:150-162). Each is a whole-relation
  * `DataFrame => DataFrame`, so Catalyst sees through it.
  */

/** Derive net revenue per line item (filter + computed column — the
  * canonical per-row transformer shape from the reference's model). */
final class AddRevenue extends Transformer {
  def apply(df: DataFrame): DataFrame =
    df.withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
}

/** Keep only shipped-before-cutoff rows; the cutoff is a column-level
  * constant so the predicate is pushed to the parquet scan. */
final class ShippedBefore1997 extends Transformer {
  def apply(df: DataFrame): DataFrame =
    df.filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
}

/** Uppercase a status-ish column — key-rename/massage shape. */
final class NormalizeFlags extends Transformer {
  def apply(df: DataFrame): DataFrame =
    df.withColumn("l_returnflag", upper(col("l_returnflag")))
}

/** Drop a column — the "remove keys" transformer shape. */
final class DropTax extends Transformer {
  def apply(df: DataFrame): DataFrame = df.drop("l_tax")
}
