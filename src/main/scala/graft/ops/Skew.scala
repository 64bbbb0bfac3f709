package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for wide operations (SURVEY §2 Layer B; "salting for
  * skew" in the engine's scale toolkit).
  *
  * When to reach for this: AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`) already splits oversized sort-merge
  * partitions at runtime and should be the first answer. Salting is for
  * the cases AQE cannot fix: a shuffled HASH join or aggregation where
  * one key's rows must still meet in one task, or a deterministic plan
  * (AQE disabled / streaming) where runtime re-planning is unavailable.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key` with the big side's rows scattered
    * across `salts` sub-keys and the small side replicated `salts`
    * times: a key with 10⁹ rows lands on `salts` reducers instead of
    * one. Join results are identical for any salt assignment, so the
    * salt uses a cheap deterministic spread (seeded rand — which salt a
    * row gets is irrelevant, only that rows spread).
    *
    * Cost model: small side shuffles `salts`× its size — use for
    * big×medium joins where `small` is too large to broadcast but
    * `salts`× it still beats one hot reducer. If `small` fits in a
    * broadcast, broadcast it instead and skip salting entirely. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full_outer would emit `salts` null-extended copies of every
    // unmatched small-side row (each replica fails to match independently)
    require(Set("inner", "left", "left_outer", "cross")(joinType),
      s"saltedJoin supports inner/left joins only, got '$joinType' — " +
        "outer-preserving the replicated side would duplicate unmatched rows")
    val saltedBig = big.withColumn("_salt",
      (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedBig.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
