package graft.core

import org.apache.spark.sql.DataFrame

/** The engine's pluggable transformation unit — the analogue of the
  * reference's transformer contract (a class exposing
  * `filter(row: dict) -> dict`, applied per row at Pype.py:51-52).
  *
  * In Spark the unit is `DataFrame => DataFrame`: a whole-relation,
  * Catalyst-visible function, so filters/projections written by a
  * transformer still get pushed down, pruned and codegen'd — unlike the
  * reference's opaque per-row Python, which is the scalability wall at
  * 100 TB. Row-at-a-time logic remains expressible via `Dataset.map`
  * inside a transformer, but column functions are the paved road.
  */
trait Transformer extends (DataFrame => DataFrame) {
  def apply(df: DataFrame): DataFrame
}

/** Reflection-based loading of transformers by fully-qualified class name,
  * mirroring the reference's dotted-path dynamic import (Pype.py:150-162)
  * with `Class.forName`. Instantiated once per stage (Pype.py:160) and
  * validated eagerly so a bad name fails at config time, not mid-run.
  */
object TransformerRegistry {
  def load(className: String): Transformer =
    try {
      Class
        .forName(className)
        .getDeclaredConstructor()
        .newInstance()
        .asInstanceOf[Transformer]
    } catch {
      case e: ClassNotFoundException =>
        throw new IllegalArgumentException(
          s"Transformer class not found: $className", e)
      case e: ClassCastException =>
        throw new IllegalArgumentException(
          s"Class $className does not implement graft.core.Transformer", e)
    }

  def loadChain(classNames: Seq[String]): Seq[Transformer] =
    classNames.map(load)

  /** Apply an ordered chain (Pype.py:51-52 applies transformers in declared
    * order). `df.transform` keeps the whole chain in one logical plan. */
  def applyChain(df: DataFrame, chain: Seq[Transformer]): DataFrame =
    chain.foldLeft(df)((d, t) => d.transform(t))
}
