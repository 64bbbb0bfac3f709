package graft.sink

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** MERGE-semantics sink: upsert / update-only / delete keyed by a
  * configurable key (default "id"), with an update-exclusion column list.
  *
  * Reference semantics reproduced:
  *   - upsert  = INSERT ... ON CONFLICT (id) DO UPDATE SET <non-excluded>
  *               (Pype.py:97-117)
  *   - update  = UPDATE ... FROM <batch> WHERE target.id = batch.id
  *               (Pype.py:119-130) — unmatched batch rows are dropped
  *   - delete  = DELETE WHERE identifier = ANY(<deduped ids>)
  *               (Pype.py:179-186; dedup at Pype.py:184)
  *   - the key itself and `fields_excluded_from_update` never appear in the
  *     update set (Pype.py:132-143); excluded columns keep their TARGET
  *     value on match but take the BATCH value on insert (exclusion only
  *     affects the UPDATE branch, exactly like the reference's SET list).
  *   - the target schema is authoritative: batch columns unknown to the
  *     target are ignored, target columns missing from the batch become
  *     null on insert (json_populate_recordset(null::t, ...) coercion,
  *     Pype.py:107,126).
  *
  * Scale design: one full-outer (upsert) or left (update) join on the key.
  * The typical shape is huge-target × small-batch, so the batch side is
  * broadcast when `broadcastBatch` is set; otherwise Catalyst/AQE picks the
  * strategy (sort-merge with skew handling for batch ~ target).
  * [[mergeIntoParquet]] rewrites the whole flat-parquet target via an
  * atomic temp-dir swap — the analogue of the reference's per-batch commit
  * (Pype.py:148) and the right shape for modest targets. For targets where
  * O(target) per batch is the bottleneck, [[BucketedMergeSink]] stores the
  * target hash-bucketed on the merge key and rewrites ONLY the buckets a
  * batch touches; `mergeIntoParquet` auto-delegates when pointed at such a
  * layout.
  */
object MergeSink {

  /** Deterministically drop duplicate keys in the batch (keep the row that
    * sorts first over all columns). Postgres would reject a batch that
    * touches the same key twice ("cannot affect row a second time"); we
    * resolve it deterministically instead of failing. */
  def dedupeBatch(batch: DataFrame, key: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(key.map(col): _*)
      .orderBy(struct(batch.columns.map(col).toSeq: _*))
    batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  private def keyCond(key: Seq[String]): Column =
    key.map(k => col(s"t.$k") <=> col(s"b.$k")).reduce(_ && _)

  /** THE schema-evolution contract for both merge sinks (flat and
    * bucketed), matching the reference's by-name, target-authoritative
    * coercion (`json_populate_recordset(null::t, %s)`, Pype.py:107,126):
    *
    *   - a batch column UNKNOWN to the target is IGNORED (the reference
    *     drops JSON keys that aren't table columns);
    *   - a target column MISSING from the batch keeps its target value
    *     on match and loads NULL on insert (absent JSON key → NULL);
    *   - a shared column whose batch type up-casts LOSSLESSLY to the
    *     target type is coerced (int→long, float→double, decimal
    *     widening — [[losslessUpCast]]);
    *   - anything LOSSY or incompatible (double→long, string→int,
    *     int/long→float, long→double, mismatched nesting) REFUSES
    *     LOUDLY here. Postgres would raise on such a batch; a silent
    *     truncating cast is data loss — the failure mode this check
    *     exists to kill. A caller who intends the narrowing casts the
    *     batch explicitly first;
    *   - every merge-key column must be present in the batch — a merge
    *     without its key is meaningless.
    *
    * Called by [[upsert]] and [[update]] (and via them, the bucketed
    * sink); [[delete]] checks only the identifier column. */
  def validateBatchSchema(
      target: org.apache.spark.sql.types.StructType,
      batch: org.apache.spark.sql.types.StructType,
      key: Seq[String]): Unit = {
    val tTypes = target.fields.map(f => f.name -> f.dataType).toMap
    val missingKey = key.filterNot(k => batch.fieldNames.contains(k))
    require(missingKey.isEmpty,
      s"merge batch lacks key column(s) ${missingKey.mkString(", ")} " +
        s"(batch columns: ${batch.fieldNames.mkString(", ")})")
    val lossy = batch.fields.toSeq.flatMap { f =>
      tTypes.get(f.name) match {
        case Some(t) if f.dataType == t => None
        case Some(t) if losslessUpCast(f.dataType, t) => None
        case Some(t) =>
          Some(s"${f.name} (batch ${f.dataType.simpleString} -> target ${t.simpleString})")
        case None => None // unknown to the target: ignored by contract
      }
    }
    if (lossy.nonEmpty) throw new IllegalArgumentException(
      "merge batch column(s) would need a lossy/incompatible cast to the " +
        "target type — refusing silent data loss; cast the batch " +
        "explicitly if the narrowing is intended: " + lossy.mkString("; "))
  }

  /** `Cast.canUpCast`, minus the integral→floating promotions it
    * blesses that drop precision for large values: int/long→float
    * (24-bit mantissa) and long→double (53-bit). canUpCast follows SQL
    * numeric precedence, which orders float above long — right for
    * comparison coercion, wrong as a "lossless storage cast" test
    * (canUpCast(long, float) stores 16777217L as 1.6777216E7). */
  def losslessUpCast(from: org.apache.spark.sql.types.DataType,
                     to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}
    org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to) &&
      !((from, to) match {
        case (IntegerType | LongType, FloatType) => true
        case (LongType, DoubleType) => true
        case _ => false
      })
  }

  /** The delete-ids column [[delete]] will match on: `identifier` if the
    * ids frame has it, else its first column (a bare id list needn't
    * name its column after the target's key). */
  def deleteIdColumn(ids: DataFrame, identifier: String): String =
    if (ids.columns.contains(identifier)) identifier else ids.columns.head

  /** Loud-failure guard shared by [[delete]] and the bucketed sink's
    * delete routing: an id column that can't compare LOSSLESSLY with the
    * target identifier (string ids vs a long key; long ids vs a double
    * key, where ids ≥ 2^53 collapse under promotion) would silently
    * delete nothing — or the wrong row. Validated BEFORE any routing or
    * bucket pruning, so a mis-typed delete fails even when its ids
    * happen to route to absent buckets. */
  def validateDeleteIds(
      target: org.apache.spark.sql.types.StructType,
      ids: org.apache.spark.sql.types.StructType,
      identifier: String,
      idCol: String): Unit =
    for (tf <- target.fields.find(_.name == identifier);
         bf <- ids.fields.find(_.name == idCol)) {
      import org.apache.spark.sql.types.StringType
      // losslessUpCast alone is too lax here: it blesses anything→string,
      // but comparing string ids against a numeric key (or vice versa) is
      // exactly the silent-no-match case being guarded
      val comparable = bf.dataType == tf.dataType ||
        ((bf.dataType == StringType) == (tf.dataType == StringType) &&
          (losslessUpCast(bf.dataType, tf.dataType) ||
            losslessUpCast(tf.dataType, bf.dataType)))
      require(comparable,
        s"delete id column $idCol (${bf.dataType.simpleString}) is not " +
          s"losslessly comparable with target $identifier " +
          s"(${tf.dataType.simpleString}) — cast the ids explicitly")
    }

  /** Size-gated broadcast decision for a merge batch: true iff the
    * optimizer's size estimate fits under
    * `spark.sql.autoBroadcastJoinThreshold` (false when broadcasting is
    * disabled with -1). The estimate errs large without CBO stats —
    * filters don't shrink it — so the failure mode is a sort-merge that
    * could have broadcast, never a driver-killing broadcast of a
    * corpus-sized frame. This is what keeps the first micro-batch after
    * a fresh checkpoint on a large backlog (no maxFilesPerTrigger cap)
    * from being force-broadcast into the driver. */
  def fitsBroadcast(batch: DataFrame): Boolean = {
    val threshold =
      batch.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    threshold > 0 &&
      batch.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold)
  }

  /** Upsert `batch` into `target` on `key`.
    *
    * Two physical shapes with identical semantics:
    *
    *   - `broadcastBatch = true` (huge-target × small-batch, the typical
    *     shape): Spark cannot broadcast either side of a FULL OUTER join,
    *     so a naive full-outer formulation silently sort-merges the whole
    *     target. Instead the merge is decomposed into
    *       (1) target LEFT JOIN broadcast(batch)  — every target row,
    *           updated where the key matches (build side = batch, so the
    *           target is scanned in place, never shuffled), unioned with
    *       (2) the insert rows: batch rows whose key is absent from the
    *           target. The matched key set is computed with a LEFT SEMI
    *           join that also broadcasts the batch keys, and that (small,
    *           ≤|batch|) set is broadcast back for the anti join.
    *     Total cost: two broadcast passes over the target scan, zero
    *     shuffles of the target.
    *
    *   - `broadcastBatch = false` (batch comparable to target): one
    *     full-outer sort-merge join — the right plan when both sides must
    *     shuffle anyway.
    */
  def upsert(
      target: DataFrame,
      batch: DataFrame,
      key: Seq[String] = Seq("id"),
      excluded: Seq[String] = Nil,
      broadcastBatch: Boolean = false): DataFrame = {
    validateBatchSchema(target.schema, batch.schema, key)
    val cleanBatch = dedupeBatch(batch, key)
    val batchCols = cleanBatch.columns.toSet
    // the TARGET schema is authoritative (json_populate_recordset
    // coercion, Pype.py:107,126): batch values are cast to the target
    // column type in EVERY leg — otherwise a wider batch type (e.g.
    // double vs long) would silently widen the persisted target schema
    val tType = target.schema.fields.map(f => f.name -> f.dataType).toMap
    if (broadcastBatch) {
      // leg 1: all target rows, batch values where the key matches
      val t = target.alias("t")
      val b = broadcast(cleanBatch.withColumn("__b", lit(true))).alias("b")
      val updated = t.join(b, keyCond(key), "left").select(
        target.columns.toSeq.map { c =>
          if (key.contains(c) || excluded.contains(c) || !batchCols.contains(c))
            col(s"t.$c").as(c)
          else
            when(col("__b").isNotNull, col(s"b.$c").cast(tType(c)))
              .otherwise(col(s"t.$c")).as(c)
        }: _*)
      // leg 2: insert rows (batch keys absent from the target); excluded
      // columns take the batch value on insert, exactly like the
      // reference's ON CONFLICT SET list (exclusion only affects updates)
      val bk = broadcast(cleanBatch.select(key.map(col): _*))
      val matchedKeys = broadcast(
        target.select(key.map(col): _*).alias("t")
          .join(bk.alias("b"), keyCond(key), "left_semi")
          .distinct())
      val inserts = cleanBatch.alias("b")
        .join(matchedKeys.alias("t"), keyCond(key), "left_anti")
        .select(target.schema.fields.toSeq.map { f =>
          if (batchCols.contains(f.name)) col(s"b.${f.name}").cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
      updated.unionByName(inserts)
    } else {
      val t = target.withColumn("__t", lit(true)).alias("t")
      val b = cleanBatch.withColumn("__b", lit(true)).alias("b")
      val joined = t.join(b, keyCond(key), "full_outer")
      val out = target.columns.toSeq.map { c =>
        if (key.contains(c))
          coalesce(col(s"t.$c"), col(s"b.$c").cast(tType(c))).as(c)
        else if (!batchCols.contains(c))
          col(s"t.$c").as(c) // not shipped by batch: keep target / null on insert
        else if (excluded.contains(c))
          // excluded from update: target value wins on match, batch on insert
          when(col("__t").isNotNull, col(s"t.$c"))
            .otherwise(col(s"b.$c").cast(tType(c))).as(c)
        else
          when(col("__b").isNotNull, col(s"b.$c").cast(tType(c)))
            .otherwise(col(s"t.$c")).as(c)
      }
      joined.select(out: _*)
    }
  }

  /** SCD2 (slowly-changing-dimension type 2) merge: a history-preserving
    * upsert. The target carries every VERSION of each key, delimited by
    * sink-managed columns `validFrom` / `validTo` / `isCurrent`; a batch
    * row whose attributes differ from the key's current version CLOSES
    * that version (`validTo = batchTs`, `isCurrent = false`) and opens a
    * new one (`validFrom = batchTs`, open-ended, current); an identical
    * batch row is a NO-OP (change detection, null-safe `<=>` per shared
    * column); a brand-new key inserts an open first version. Historical
    * (non-current) rows pass through untouched.
    *
    * The reference's load vocabulary stops at overwrite-style upsert
    * (Pype.py:97-117); SCD2 is the standard warehouse extension of the
    * same conflict-key contract for targets that must answer "what did
    * this row look like when that training run was snapshotted?" —
    * time-travel per ROW, complementing the bucketed layout's per-BATCH
    * snapshots.
    *
    * Schema contract (the [[validateBatchSchema]] lattice, applied to the
    * target minus its SCD columns): the batch must NOT ship the
    * sink-managed columns; a target data column missing from the batch is
    * carried forward from the closed version into the new one (and NULL
    * on a brand-new key, like upsert's insert leg); unknown batch columns
    * are ignored; lossy casts refuse loudly.
    *
    * Physical shapes mirror [[upsert]]: `broadcastBatch = true` keeps the
    * (huge) current slice unshuffled — one broadcast left join emits
    * closed/new/unchanged rows via a per-row `explode` (still narrow),
    * and the insert leg re-broadcasts the matched-key sliver; `false` is
    * one full-outer sort-merge join. The historical slice is a
    * pass-through filter in BOTH shapes — at 100 TB the ever-growing
    * history costs a scan, never a join or shuffle. */
  def scd2(
      target: DataFrame,
      batch: DataFrame,
      batchTs: Column,
      key: Seq[String] = Seq("id"),
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      isCurrent: String = "is_current",
      broadcastBatch: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, StructType}
    val scdCols = Seq(validFrom, validTo, isCurrent)
    require(scdCols.distinct.size == 3, s"SCD columns must be distinct, got $scdCols")
    val absent = scdCols.filterNot(target.columns.contains)
    require(absent.isEmpty,
      s"SCD2 target lacks column(s) ${absent.mkString(", ")} — " +
        "create it with openVersions / a scd2-typed load stage")
    val shipped = scdCols.filter(batch.columns.contains)
    require(shipped.isEmpty,
      s"batch ships sink-managed SCD column(s) ${shipped.mkString(", ")} — " +
        "version bounds are derived from batchTs, never loaded")
    require(key.intersect(scdCols).isEmpty, "merge key cannot include SCD columns")
    val tType = target.schema.fields.map(f => f.name -> f.dataType).toMap
    require(tType(isCurrent) == BooleanType,
      s"$isCurrent must be boolean, got ${tType(isCurrent).simpleString}")
    validateBatchSchema(
      StructType(target.schema.fields.filterNot(f => scdCols.contains(f.name))),
      batch.schema, key)
    val cleanBatch = dedupeBatch(batch, key)
    val batchCols = cleanBatch.columns.toSet
    val cmpCols = target.columns
      .filterNot(c => scdCols.contains(c) || key.contains(c))
      .filter(batchCols.contains)

    val hist = target.filter(!coalesce(col(isCurrent), lit(false)))
    val cur = target.filter(coalesce(col(isCurrent), lit(false)))
    val from = batchTs.cast(tType(validFrom))
    val to = batchTs.cast(tType(validTo))

    // the three row shapes, as identically-typed structs so one explode
    // can emit 1 or 2 of them per joined row
    def unchangedRow = struct(target.columns.toSeq.map(c => col(s"t.$c").as(c)): _*)
    def closedRow = struct(target.columns.toSeq.map {
      case c if c == validTo   => to.as(c)
      case c if c == isCurrent => lit(false).as(c)
      case c                   => col(s"t.$c").as(c)
    }: _*)
    def newRow = struct(target.columns.toSeq.map {
      case c if c == validFrom      => from.as(c)
      case c if c == validTo        => lit(null).cast(tType(validTo)).as(c)
      case c if c == isCurrent      => lit(true).as(c)
      case c if key.contains(c)     =>
        coalesce(col(s"t.$c"), col(s"b.$c").cast(tType(c))).as(c)
      case c if batchCols.contains(c) => col(s"b.$c").cast(tType(c)).as(c)
      case c                        => col(s"t.$c").as(c) // carry-forward
    }: _*)
    def changed = cmpCols
      .map(c => !(col(s"t.$c") <=> col(s"b.$c").cast(tType(c))))
      .foldLeft(lit(false))(_ || _)
    def unpack(rows: DataFrame): DataFrame =
      rows.select(target.columns.toSeq.map(c => col(s"__r.$c").as(c)): _*)

    val merged =
      if (broadcastBatch) {
        val t = cur.alias("t")
        val b = broadcast(cleanBatch.withColumn("__b", lit(true))).alias("b")
        val current = unpack(t.join(b, keyCond(key), "left")
          .select(explode(
            when(col("__b").isNotNull && changed, array(closedRow, newRow))
              .otherwise(array(unchangedRow))).as("__r")))
        // insert leg, upsert's decomposition: broadcast the batch keys to
        // find matched keys (≤|batch| rows), broadcast THOSE back for the
        // anti join — the current slice is scanned, never shuffled
        val bk = broadcast(cleanBatch.select(key.map(col): _*))
        val matchedKeys = broadcast(
          cur.select(key.map(col): _*).alias("t")
            .join(bk.alias("b"), keyCond(key), "left_semi")
            .distinct())
        val inserts = cleanBatch.alias("b")
          .join(matchedKeys.alias("t"), keyCond(key), "left_anti")
          .select(target.columns.toSeq.map {
            case c if c == validFrom      => from.as(c)
            case c if c == validTo        => lit(null).cast(tType(validTo)).as(c)
            case c if c == isCurrent      => lit(true).as(c)
            case c if batchCols.contains(c) => col(s"b.$c").cast(tType(c)).as(c)
            case c                        => lit(null).cast(tType(c)).as(c)
          }: _*)
        current.unionByName(inserts)
      } else {
        val t = cur.withColumn("__t", lit(true)).alias("t")
        val b = cleanBatch.withColumn("__b", lit(true)).alias("b")
        unpack(t.join(b, keyCond(key), "full_outer")
          .select(explode(
            when(col("__t").isNull, array(newRow)) // new key: t side all-null
              .when(col("__b").isNotNull && changed, array(closedRow, newRow))
              .otherwise(array(unchangedRow))).as("__r")))
      }
    hist.unionByName(merged)
  }

  /** Stamp a version-less batch as the FIRST open SCD2 versions — the
    * bootstrap shape for a fresh SCD2 target (every row current from
    * `batchTs`, open-ended). Shared by both sinks' create paths; public
    * because callers composing [[scd2]] directly need the same bootstrap. */
  def openVersions(
      batch: DataFrame,
      key: Seq[String],
      batchTs: Column,
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      isCurrent: String = "is_current"): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    val shipped = Seq(validFrom, validTo, isCurrent).filter(batch.columns.contains)
    require(shipped.isEmpty,
      s"batch ships sink-managed SCD column(s) ${shipped.mkString(", ")}")
    dedupeBatch(batch, key)
      .withColumn(validFrom, batchTs.cast(TimestampType))
      .withColumn(validTo, lit(null).cast(TimestampType))
      .withColumn(isCurrent, lit(true))
  }

  /** Point-in-time read over an SCD2 target: the one version of each key
    * that was current at `ts` — `validFrom <= ts < validTo` with an open
    * `validTo` meaning "still current". The query-side twin of [[scd2]]:
    * "what did this table look like when that training run snapshotted
    * it?" is a FILTER, not a join — at 100 TB it rides the parquet scan
    * (predicate pushdown; partition/cluster the target by `validTo`
    * nullness or month to prune closed history physically). */
  def scd2AsOf(
      target: DataFrame,
      ts: Column,
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame =
    target.filter(
      col(validFrom) <= ts && (col(validTo).isNull || col(validTo) > ts))

  /** Update-only: matched rows take batch values (minus exclusions);
    * unmatched batch rows are dropped; unmatched target rows unchanged. */
  def update(
      target: DataFrame,
      batch: DataFrame,
      key: Seq[String] = Seq("id"),
      excluded: Seq[String] = Nil,
      broadcastBatch: Boolean = false): DataFrame = {
    validateBatchSchema(target.schema, batch.schema, key)
    val cleanBatch = dedupeBatch(batch, key)
    val b0 = if (broadcastBatch) broadcast(cleanBatch) else cleanBatch
    val t = target.alias("t")
    val b = b0.withColumn("__b", lit(true)).alias("b")
    val joined = t.join(b, keyCond(key), "left")
    val batchCols = b0.columns.toSet
    val tType = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val out = target.columns.toSeq.map { c =>
      if (key.contains(c) || excluded.contains(c) || !batchCols.contains(c))
        col(s"t.$c").as(c)
      else
        when(col("__b").isNotNull, col(s"b.$c").cast(tType(c)))
          .otherwise(col(s"t.$c")).as(c)
    }
    joined.select(out: _*)
  }

  /** Delete target rows whose `identifier` appears in `ids` (any column
    * layout: the first column of `ids` is used if `identifier` is absent).
    * Ids are deduped (Pype.py:184) — and left_anti is insensitive to
    * duplicates anyway.
    *
    * NULL ids are dropped from the delete set, mirroring the reference's
    * `identifier = ANY(...)` SQL semantics (Pype.py:179-186), where NULL
    * never matches anything: a NULL in the batch deletes nothing, and a
    * null-keyed target row (which upsert CAN create — its key join is
    * null-safe `<=>`) is only removable by an explicit filter, exactly as
    * it would be in the reference's Postgres target. */
  def delete(
      target: DataFrame,
      ids: DataFrame,
      identifier: String = "id",
      broadcastIds: Boolean = true): DataFrame = {
    val idCol = deleteIdColumn(ids, identifier)
    // same loud-failure stance as validateBatchSchema; shared with the
    // bucketed sink, which must run it BEFORE bucket pruning
    validateDeleteIds(target.schema, ids.schema, identifier, idCol)
    val dk = ids.select(col(idCol).as("__del_id"))
      .filter(col("__del_id").isNotNull).distinct()
    val d = if (broadcastIds) broadcast(dk) else dk
    // plain equality: with NULLs filtered from the delete set, `=` and
    // `<=>` agree on every non-null id, and a NULL-identifier target row
    // never matches — SQL IN-list parity
    target.join(d, col(identifier) === col("__del_id"), "left_anti")
  }

  /** Row-level change feed (CDC): the changes an [[upsert]] of `batch`
    * into `target` applies, as change-data-feed rows — the target's
    * columns plus `_op`:
    *   - `insert`       — a batch key absent from the target (the row as
    *                      it will exist after the merge)
    *   - `update_pre`   — the target row a matched, CHANGED key replaces
    *   - `update_post`  — the row that replaces it (upsert's merged row:
    *                      excluded / unshipped columns keep the target
    *                      value, so they can never be the change)
    * A matched key whose merged row is null-safely identical to the
    * target row emits NOTHING — no-op writes don't pollute downstream
    * consumers, so `feed is empty` ⇔ `the merge was a no-op`. The feed
    * is what an incremental consumer (a downstream aggregate, a
    * replication stream, an audit log) applies instead of re-reading the
    * whole target; same role as Delta Lake's Change Data Feed, derived
    * here rather than stored. Pairs with [[deleteFeed]]; the
    * apply-feed-equals-merge equivalence is pinned in MergeSinkSpec.
    *
    * Scale shape mirrors [[upsert]]: `broadcastBatch = true` is an inner
    * broadcast join (matched legs) plus upsert's double-broadcast insert
    * decomposition — the huge target is scanned, never shuffled;
    * `false` is ONE left join from batch to target (both sides shuffle
    * on the key, cost O(batch + matched-target), never O(target)). The
    * pre/post pair is emitted by a per-row explode — narrow. */
  def changeFeed(
      target: DataFrame,
      batch: DataFrame,
      key: Seq[String] = Seq("id"),
      excluded: Seq[String] = Nil,
      broadcastBatch: Boolean = false,
      opCol: String = "_op"): DataFrame = {
    require(!target.columns.contains(opCol),
      s"target already has a '$opCol' column — pass a different opCol")
    validateBatchSchema(target.schema, batch.schema, key)
    val cleanBatch = dedupeBatch(batch, key)
    val batchCols = cleanBatch.columns.toSet
    val tType = target.schema.fields.map(f => f.name -> f.dataType).toMap
    def rowOf(op: String, v: String => Column) =
      struct((lit(op).as(opCol) +: target.columns.toSeq.map(c => v(c).as(c))): _*)
    // upsert's merged value for a MATCHED key (MergeSink.upsert leg 1)
    def postVal(c: String): Column =
      if (key.contains(c) || excluded.contains(c) || !batchCols.contains(c))
        col(s"t.$c")
      else col(s"b.$c").cast(tType(c))
    // upsert's insert-leg value: excluded columns take the batch value
    def insertVal(c: String): Column =
      if (batchCols.contains(c)) col(s"b.$c").cast(tType(c))
      else lit(null).cast(tType(c))
    def preRow = rowOf("update_pre", c => col(s"t.$c"))
    def postRow = rowOf("update_post", postVal)
    def insertRow = rowOf("insert", insertVal)
    // a matched key changed iff any shipped, non-key, non-excluded column
    // differs null-safely — all other columns merge to the target value
    def changed = target.columns.toSeq
      .filter(c => !key.contains(c) && !excluded.contains(c) && batchCols.contains(c))
      .map(c => !(col(s"t.$c") <=> col(s"b.$c").cast(tType(c))))
      .foldLeft(lit(false))(_ || _)
    def unpack(rows: DataFrame): DataFrame =
      rows.select((opCol +: target.columns.toSeq).map(c => col(s"__r.$c").as(c)): _*)
    if (broadcastBatch) {
      val updates = unpack(target.alias("t")
        .join(broadcast(cleanBatch).alias("b"), keyCond(key), "inner")
        .filter(changed)
        .select(explode(array(preRow, postRow)).as("__r")))
      val bk = broadcast(cleanBatch.select(key.map(col): _*))
      val matchedKeys = broadcast(
        target.select(key.map(col): _*).alias("t")
          .join(bk.alias("b"), keyCond(key), "left_semi")
          .distinct())
      val inserts = unpack(cleanBatch.alias("b")
        .join(matchedKeys.alias("t"), keyCond(key), "left_anti")
        .select(insertRow.as("__r")))
      updates.unionByName(inserts)
    } else {
      val joined = cleanBatch.alias("b")
        .join(target.withColumn("__t", lit(true)).alias("t"), keyCond(key), "left")
      unpack(joined.select(explode(
        when(col("__t").isNull, array(insertRow))
          .when(changed, array(preRow, postRow))
          // matched no-op: an empty slice of the right element type
          .otherwise(slice(array(insertRow), 1, 0))).as("__r")))
    }
  }

  /** The delete half of the change feed: the target rows a [[delete]] of
    * `ids` removes, with `_op = delete`. Same id semantics as delete
    * (first column fallback, NULL ids never match); physically a
    * semi join against the (broadcast) deduped id set — the feed costs
    * one target scan, exactly like the delete itself. */
  def deleteFeed(
      target: DataFrame,
      ids: DataFrame,
      identifier: String = "id",
      broadcastIds: Boolean = true,
      opCol: String = "_op"): DataFrame = {
    require(!target.columns.contains(opCol),
      s"target already has a '$opCol' column — pass a different opCol")
    val idCol = deleteIdColumn(ids, identifier)
    validateDeleteIds(target.schema, ids.schema, identifier, idCol)
    val dk = ids.select(col(idCol).as("__del_id"))
      .filter(col("__del_id").isNotNull).distinct()
    val d = if (broadcastIds) broadcast(dk) else dk
    target.join(d, col(identifier) === col("__del_id"), "left_semi")
      .select((lit("delete").as(opCol) +: target.columns.toSeq.map(col)): _*)
  }

  /** The CONSUMER side of [[changeFeed]]/[[deleteFeed]]/
    * [[BucketedMergeSink.changesBetween]]: apply a feed to a replica,
    * producing the post-feed state. Rows whose key appears as
    * `update_pre` or `delete` leave; `insert` and `update_post` rows
    * land. Applying a merge's feed to a copy of its pre-merge target
    * reproduces the merge exactly (pinned in MergeSinkSpec and the
    * property suite) — the downstream-replication contract: ship feeds,
    * not snapshots.
    *
    * Feeds compose: applying batch feeds in commit order replays the
    * target's history. Keys are matched null-safely, mirroring the
    * feed producers. Scale: one anti join (replica shuffles on the key
    * only when the feed side is too big to broadcast) + a union —
    * O(replica + feed), with the replica never rewritten beyond the
    * keys the feed touches when the caller routes through a bucketed
    * layout. */
  def applyFeed(
      replica: DataFrame,
      feed: DataFrame,
      key: Seq[String] = Seq("id"),
      opCol: String = "_op",
      broadcastFeed: Boolean = true): DataFrame = {
    require(feed.columns.contains(opCol),
      s"feed lacks the '$opCol' column — not a change feed?")
    val gone0 = feed.filter(col(opCol).isin("update_pre", "delete"))
      .select(key.map(col): _*).distinct()
    val gone = (if (broadcastFeed) broadcast(gone0) else gone0).alias("b")
    val kept = replica.alias("t").join(gone, keyCond(key), "left_anti")
    val landed = feed.filter(col(opCol).isin("insert", "update_post"))
      .select(replica.columns.toSeq.map(col): _*)
    kept.unionByName(landed)
  }

  /** Listing fingerprint of the live target dir — every data file's
    * (name, length, mtime), sorted. The flat sink's optimistic-commit
    * base: a concurrent writer's swap replaces the dir contents
    * wholesale (fresh uuid-named part files), so ANY interleaved commit
    * changes this. */
  private def dirState(fs: FileSystem, dst: Path): Seq[(String, Long, Long)] =
    if (!fs.exists(dst)) Nil
    else fs.listStatus(dst).filter(_.isFile)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .toSeq.sortBy(_._1)

  /** Test seam for the concurrent-writer spec — invoked between a
    * merge's temp-dir write (by which point the plan has fully read the
    * old target) and its commit check/swap. Production value is a
    * no-op. Mirrors [[BucketedMergeSink.interleaveBeforeCommit]]. */
  private[graft] var interleaveBeforeSwap: () => Unit = () => ()

  /** Atomically replace the parquet dir at `path` with `df`: write to a
    * temp sibling, then swap. Safe for read-modify-write cycles where `df`
    * itself reads from `path` (writing in place would corrupt the input
    * mid-scan). Analogue of the reference's per-batch commit boundary
    * (Pype.py:148,186). */
  def writeAtomic(df: DataFrame, path: String): Unit =
    writeAtomicGuarded(df, path, None)

  /** [[writeAtomic]] with the single-writer contract's optimistic
    * detection (same contract as the bucketed sink — see
    * [[BucketedMergeSink]] scaladoc "Concurrent writers"):
    * `expectedState` is the target's [[dirState]] as of the merge's
    * read. If the live state differs at commit time, another writer
    * swapped in a batch this merge never saw — publishing ours would
    * silently drop theirs (lost update), so the loser deletes its temp
    * dir and throws the retryable [[ConcurrentWriteException]] instead.
    * Best-effort by nature (no atomic compare-and-rename exists on a
    * plain filesystem): the check window is after the full merge write,
    * microseconds before the swap — it turns the week-one
    * uncoordinated-deployment race loud instead of silent. */
  private[sink] def writeAtomicGuarded(
      df: DataFrame, path: String,
      expectedState: Option[Seq[(String, Long, Long)]]): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(path)
    val fs = dst.getFileSystem(hconf)
    val tmp = new Path(path + ".tmp-" + UUID.randomUUID().toString)
    try df.write.mode("overwrite").parquet(tmp.toString)
    catch { case e: Throwable =>
      fs.delete(tmp, true) // don't leak a partial .tmp dir beside the target
      throw e
    }
    interleaveBeforeSwap()
    expectedState.foreach { exp =>
      val now = dirState(fs, dst)
      if (now != exp) {
        fs.delete(tmp, true)
        throw new ConcurrentWriteException(
          s"flat target $path changed while this batch was being merged " +
            s"(${exp.size} -> ${now.size} files): another writer committed " +
            "first. This batch was NOT published. The target is " +
            "single-writer; retry the merge — it will re-read the new state.")
      }
    }
    if (fs.exists(dst)) {
      val old = new Path(path + ".old-" + UUID.randomUUID().toString)
      require(fs.rename(dst, old), s"could not stage out old $path")
      if (!fs.rename(tmp, dst)) {
        // best-effort rollback: put the previous data back before failing
        // so the target never ends up simply missing
        fs.rename(old, dst)
        throw new IllegalStateException(s"could not commit $path (rolled back)")
      }
      fs.delete(old, true)
    } else {
      require(fs.rename(tmp, dst), s"could not commit $path")
    }
  }

  /** Predicate-based delete (row-level TTL expiry, GDPR erasure): remove
    * every target row matching `condition` (a SQL boolean expression over
    * the target's columns). The reference's delete is id-list-based
    * (Pype.py:179-186); this is its set-based complement — the shape a
    * retention policy or right-to-be-forgotten sweep actually runs,
    * where the victims are defined by a predicate, not an id feed.
    *
    * Flat targets: one read-filter-atomic-rewrite (the same commit
    * boundary as every flat merge). Bucketed targets route to
    * [[BucketedMergeSink.deleteWhere]], which rewrites ONLY buckets that
    * contain at least one matching row. No-op (and no new version /
    * target creation) when nothing matches or the target is absent. */
  def deleteWhere(spark: SparkSession, path: String, condition: String): Unit = {
    if (BucketedMergeSink.isBucketed(spark, path)) {
      BucketedMergeSink.deleteWhere(spark, path, condition): Unit
      return
    }
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return // nothing to delete from
    val base = dirState(fs, new Path(path))
    val target = spark.read.parquet(path)
    val pred = expr(condition)
    // empty-match fast path: skip the rewrite entirely (and its version
    // churn) when the predicate hits nothing
    if (target.filter(pred).isEmpty) return
    // null-safe complement: a row where the predicate is NULL is NOT a
    // match and must survive (SQL DELETE semantics)
    writeAtomicGuarded(target.filter(!coalesce(pred, lit(false))), path, Some(base))
  }

  /** Read-merge-write against a parquet target path, creating it if absent
    * (upsert/update against an empty target = plain insert / no-op).
    *
    * `retainVersions` is forwarded when the path holds a bucketed layout
    * (0 = the layout's persisted retention; a non-zero value must match
    * it — sink contract). A flat target has no snapshots, so a non-zero
    * value against one is a misconfiguration surfaced loudly, never
    * dropped. */
  def mergeIntoParquet(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      loadType: String,
      key: Seq[String] = Seq("id"),
      identifier: String = "id",
      excluded: Seq[String] = Nil,
      retainVersions: Int = 0,
      scd2Ts: String = ""): Unit = {
    require(Set("upsert", "update", "delete", "scd2")(loadType),
      s"unknown load type: $loadType") // validated BEFORE any write, even on a fresh path
    require(loadType != "scd2" || scd2Ts.nonEmpty,
      "scd2 load needs an explicit batch timestamp (scd2_ts) — version " +
        "bounds must be deterministic, never wall-clock")
    if (BucketedMergeSink.isBucketed(spark, path)) {
      // a flat read-merge-write against a bucketed layout would flatten
      // it (and read gbucket as a data column) — route to the bucketed
      // sink, which has identical semantics
      BucketedMergeSink.merge(spark, batch, path, loadType, key, identifier, excluded,
        retainVersions = retainVersions, scd2Ts = scd2Ts)
      return
    }
    require(retainVersions == 0,
      s"retainVersions=$retainVersions on flat parquet target $path — " +
        "snapshot retention needs a bucketed layout (create it with " +
        "BucketedMergeSink.merge(numBuckets = N))")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // optimistic-commit base: the state this merge's read resolves
    // against (Nil for a create) — writeAtomicGuarded re-checks it at
    // swap time and fails the loser of a concurrent-writer race loudly
    val base = dirState(fs, new Path(path))
    val exists = base.nonEmpty || fs.exists(new Path(path))
    val result =
      if (!exists) loadType match {
        case "delete" => return // nothing to delete from
        case "upsert" => dedupeBatch(batch, key)
        // update-only against an absent target affects zero rows (same as
        // an existing-but-empty target) — it must NOT degrade to insert
        case "update" => dedupeBatch(batch, key).limit(0)
        // SCD2 bootstrap: every batch row becomes the key's first open
        // version — the create leg that gives the target its SCD columns
        case "scd2" => openVersions(batch, key, to_timestamp(lit(scd2Ts)))
      } else {
        val target = spark.read.parquet(path)
        // gate the broadcast on the batch's size estimate: the typical
        // merge batch is tiny and still broadcasts; a backlog-sized one
        // (e.g. the first micro-batch after a fresh checkpoint) falls
        // back to the full-outer sort-merge shape instead of
        // force-broadcasting itself into the driver
        val bcast = fitsBroadcast(batch)
        loadType match {
          case "upsert" => upsert(target, batch, key, excluded, broadcastBatch = bcast)
          case "update" => update(target, batch, key, excluded, broadcastBatch = bcast)
          case "delete" => delete(target, batch, identifier, broadcastIds = bcast)
          case "scd2" =>
            scd2(target, batch, to_timestamp(lit(scd2Ts)), key, broadcastBatch = bcast)
        }
      }
    writeAtomicGuarded(result, path, Some(base))
  }
}
