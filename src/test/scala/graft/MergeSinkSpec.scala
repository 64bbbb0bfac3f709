package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.MergeSink

/** MERGE semantics vs the reference (upsert Pype.py:97-117, update
  * Pype.py:119-130, delete Pype.py:179-186, exclusion Pype.py:132-143). */
class MergeSinkSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def target: DataFrame =
    Seq(
      (1L, "t1", "n1", 10),
      (2L, "t2", "n2", 20),
      (3L, "t3", "n3", 30))
      .toDF("id", "val", "note", "t_only")

  // "extra" is unknown to the target; "t_only" is missing from the batch
  private def batch: DataFrame =
    Seq(
      (2L, "b2", "bn2", "x"),
      (4L, "b4", "bn4", "y"))
      .toDF("id", "val", "note", "extra")

  private def expectedUpsert: DataFrame =
    Seq(
      (1L, "t1", "n1", Some(10)),
      (2L, "b2", "n2", Some(20)), // note excluded → target value on match
      (3L, "t3", "n3", Some(30)),
      (4L, "b4", "bn4", None)) // insert: excluded col takes batch value
      .toDF("id", "val", "note", "t_only")

  test("upsert: insert unmatched, update matched, exclusion keeps target value on match") {
    val out = MergeSink.upsert(target, batch, Seq("id"), excluded = Seq("note"))
    assertSameRows(out, expectedUpsert)
  }

  test("upsert: broadcast decomposition is semantically identical to full-outer") {
    val bc = MergeSink.upsert(target, batch, Seq("id"),
      excluded = Seq("note"), broadcastBatch = true)
    assertSameRows(bc, expectedUpsert)
  }

  test("upsert: broadcast plan contains no full-outer join") {
    val plan = MergeSink.upsert(target, batch, Seq("id"), broadcastBatch = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FullOuter"), s"unexpected full-outer join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"batch side not broadcast:\n$plan")
  }

  test("fitsBroadcast gates the merge broadcast: over the threshold the plan " +
    "has no BroadcastExchange and semantics are unchanged") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      // 1 byte: no batch fits → mergeIntoParquet's gate must pick the
      // non-broadcast shape (a backlog-sized first micro-batch must
      // never be force-broadcast into the driver)
      spark.conf.set(key, "1")
      assert(!MergeSink.fitsBroadcast(batch))
      val out = MergeSink.upsert(target, batch, Seq("id"),
        excluded = Seq("note"), broadcastBatch = MergeSink.fitsBroadcast(batch))
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"batch over the broadcast cap still broadcast:\n$plan")
      assertSameRows(out, expectedUpsert)
    } finally spark.conf.set(key, saved)
    // default threshold (10 MB): a merge-sized batch still broadcasts
    assert(MergeSink.fitsBroadcast(batch))
  }

  test("upsert: target schema is authoritative (batch-only columns dropped, missing ones null)") {
    val out = MergeSink.upsert(target, batch, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "val", "note", "t_only"))
    val inserted = out.filter($"id" === 4L).collect().head
    assert(inserted.isNullAt(inserted.fieldIndex("t_only")))
  }

  test("upsert: composite key matches on all key columns") {
    val t = Seq((1L, "a", "old"), (1L, "b", "old")).toDF("id", "region", "v")
    val b = Seq((1L, "a", "new"), (2L, "a", "new")).toDF("id", "region", "v")
    val out = MergeSink.upsert(t, b, Seq("id", "region"))
    val expected = Seq(
      (1L, "a", "new"), (1L, "b", "old"), (2L, "a", "new"))
      .toDF("id", "region", "v")
    assertSameRows(out, expected)
  }

  test("upsert: null keys match null-safely (<=>), both join shapes") {
    val t = Seq((Some(1L), "t1"), (None, "tnull")).toDF("id", "v")
    val b = Seq((Some(1L), "b1"), (None, "bnull")).toDF("id", "v")
    val expected = Seq((Some(1L), "b1"), (None, "bnull")).toDF("id", "v")
    assertSameRows(MergeSink.upsert(t, b, Seq("id")), expected)
    assertSameRows(MergeSink.upsert(t, b, Seq("id"), broadcastBatch = true), expected)
  }

  test("update: matched rows take batch values, unmatched batch rows dropped") {
    val out = MergeSink.update(target, batch, Seq("id"), excluded = Seq("note"))
    val expected = Seq(
      (1L, "t1", "n1", 10),
      (2L, "b2", "n2", 20), // note excluded
      (3L, "t3", "n3", 30)) // id=4 from batch NOT inserted
      .toDF("id", "val", "note", "t_only")
    assertSameRows(out, expected)
  }

  test("update: key and excluded columns never change") {
    val out = MergeSink.update(target, batch, Seq("id"), excluded = Seq("val"))
    val r2 = out.filter($"id" === 2L).collect().head
    assert(r2.getString(r2.fieldIndex("val")) == "t2")   // excluded
    assert(r2.getString(r2.fieldIndex("note")) == "bn2") // updated
  }

  test("delete: removes ids, insensitive to duplicate ids in the batch") {
    val ids = Seq(2L, 2L, 99L).toDF("id")
    val out = MergeSink.delete(target, ids, "id")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("delete: NULL ids delete nothing and null-keyed rows survive (SQL IN parity)") {
    val t = Seq((Some(1L), "a"), (None, "nullkey"), (Some(2L), "b"))
      .toDF("id", "v")
    val ids = Seq(Some(1L), None).toDF("id")
    val out = MergeSink.delete(t, ids, "id")
    // id=1 deleted; the NULL batch id matches nothing (id = ANY(...)
    // semantics, Pype.py:179-186), so the null-keyed target row stays
    assert(out.select("v").as[String].collect().sorted.toSeq
      == Seq("b", "nullkey"))
  }

  test("delete: falls back to the first ids column when identifier is absent") {
    val ids = Seq(3L).toDF("whatever")
    val out = MergeSink.delete(target, ids, "id")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("dedupeBatch: one row per key, deterministic survivor") {
    val b = Seq((1L, "z"), (1L, "a"), (2L, "m")).toDF("id", "v")
    val out = MergeSink.dedupeBatch(b, Seq("id"))
    // survivor = row sorting first over all columns → (1,"a")
    assert(canon(out) == Seq(Seq("1", "a"), Seq("2", "m")))
  }

  test("upsert: duplicate batch keys resolve deterministically, not multiplicatively") {
    val b = Seq((2L, "dup_z", "x", "e"), (2L, "dup_a", "x", "e"))
      .toDF("id", "val", "note", "extra")
    val out = MergeSink.upsert(target, b, Seq("id"))
    assert(out.count() == 3) // no row multiplication
    val r2 = out.filter($"id" === 2L).collect().head
    assert(r2.getString(r2.fieldIndex("val")) == "dup_a")
  }

  test("mergeIntoParquet: creates target on first upsert, delete on absent target is a no-op") {
    val dir = Files.createTempDirectory("graft-merge").toString
    val path = s"$dir/tgt"
    MergeSink.mergeIntoParquet(spark, target, path, "delete")
    assert(!new java.io.File(path).exists()) // no-op, nothing created
    MergeSink.mergeIntoParquet(spark, target, path, "upsert")
    assert(spark.read.parquet(path).count() == 3)
    MergeSink.mergeIntoParquet(spark, batch, path, "upsert",
      excluded = Seq("note"))
    assertSameRows(
      spark.read.parquet(path).select("id", "val", "note", "t_only"),
      expectedUpsert)
  }

  test("writeAtomic: read-modify-write against the same path is safe") {
    val dir = Files.createTempDirectory("graft-atomic").toString
    val path = s"$dir/t"
    target.write.parquet(path)
    // df reads from `path` and is rewritten to `path` — must not corrupt
    val df = spark.read.parquet(path).withColumn("t_only", col("t_only") + 1)
    MergeSink.writeAtomic(df, path)
    val out = spark.read.parquet(path)
    assert(out.count() == 3)
    assert(out.agg(sum("t_only")).as[Long].collect().head == 63)
    // no temp/old dirs left behind
    assert(new java.io.File(dir).listFiles().map(_.getName).toSeq == Seq("t"))
  }

  test("mergeIntoParquet: unknown load type raises") {
    val dir = Files.createTempDirectory("graft-unknown").toString
    val path = s"$dir/t"
    target.write.parquet(path)
    intercept[IllegalArgumentException] {
      MergeSink.mergeIntoParquet(spark, batch, path, "truncate")
    }
  }

  test("mergeIntoParquet: unknown load type raises even on a fresh path") {
    val path = Files.createTempDirectory("graft-unknown2").toString + "/t"
    intercept[IllegalArgumentException] {
      MergeSink.mergeIntoParquet(spark, batch, path, "truncate")
    }
    assert(!new java.io.File(path).exists()) // nothing was written
  }

  // ---- schema-evolution contract (MergeSink.validateBatchSchema) ----

  test("schema evolution: a WIDENING batch type coerces to the target type, " +
    "both join shapes") {
    import spark.implicits._
    val t = Seq((1L, 10L), (2L, 20L)).toDF("id", "v") // v: LONG
    val b = Seq((1, 99), (3, 33)).toDF("id", "v") // id, v: INT — lossless up-cast
    for (bc <- Seq(true, false)) {
      val up = MergeSink.upsert(t, b, broadcastBatch = bc)
      assert(up.schema("v").dataType == org.apache.spark.sql.types.LongType,
        s"broadcastBatch=$bc: batch int must cast to target long, " +
          s"got ${up.schema("v").dataType}")
      assert(canon(up) == canon(Seq((1L, 99L), (2L, 20L), (3L, 33L)).toDF("id", "v")))
    }
    val upd = MergeSink.update(t, b)
    assert(upd.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(canon(upd) == canon(Seq((1L, 99L), (2L, 20L)).toDF("id", "v")))
  }

  test("schema evolution: a LOSSY batch type refuses loudly (no silent truncation)") {
    import spark.implicits._
    val t = Seq((1L, 10L)).toDF("id", "v") // v: LONG
    val bDouble = Seq((1L, 99.9)).toDF("id", "v") // double -> long: lossy
    val bString = Seq((1L, "99")).toDF("id", "v") // string -> long: not coercible
    for (b <- Seq(bDouble, bString); bc <- Seq(true, false)) {
      val e = intercept[IllegalArgumentException](
        MergeSink.upsert(t, b, broadcastBatch = bc))
      assert(e.getMessage.contains("lossy") && e.getMessage.contains("v ("),
        s"error must name the offending column: ${e.getMessage}")
      intercept[IllegalArgumentException](MergeSink.update(t, b, broadcastBatch = bc))
    }
    // the caller stays in control: an EXPLICIT cast in the batch is the
    // documented opt-in to narrowing
    val explicit = MergeSink.upsert(t,
      bDouble.withColumn("v", col("v").cast("long")))
    assert(canon(explicit) == canon(Seq((1L, 99L)).toDF("id", "v")))
  }

  test("schema evolution: a batch without the merge key refuses loudly") {
    import spark.implicits._
    val t = Seq((1L, "a")).toDF("id", "v")
    val b = Seq(("x")).toDF("v")
    val e = intercept[IllegalArgumentException](MergeSink.upsert(t, b, Seq("id")))
    assert(e.getMessage.contains("key column"))
  }

  test("delete: id column not losslessly comparable with the target key refuses loudly") {
    import spark.implicits._
    val t = Seq((1L, "a")).toDF("id", "v")
    val ids = Seq("1").toDF("id") // string ids vs long key: silent no-match
    val e = intercept[IllegalArgumentException](MergeSink.delete(t, ids))
    assert(e.getMessage.contains("comparable"))
    // widening id types compare fine (int ids against a long key)
    assert(MergeSink.delete(t, Seq(1).toDF("id")).count() == 0)
  }

  test("schema evolution: integral→floating promotions refuse (Cast.canUpCast " +
    "blesses int/long→float and long→double; all drop precision for large values)") {
    import spark.implicits._
    val tF = Seq((1L, 1.0f)).toDF("id", "v") // v: FLOAT (24-bit mantissa)
    val tD = Seq((1L, 1.0d)).toDF("id", "v") // v: DOUBLE (53-bit mantissa)
    for ((t, b) <- Seq(
        (tF, Seq((1L, 16777217L)).toDF("id", "v")), // long → float: 2^24+1 → 2^24
        (tF, Seq((1L, 16777217)).toDF("id", "v")), // int → float: same collapse
        (tD, Seq((1L, 9007199254740993L)).toDF("id", "v")))) { // long → double: 2^53+1
      val e = intercept[IllegalArgumentException](MergeSink.upsert(t, b))
      assert(e.getMessage.contains("lossy"), e.getMessage)
    }
    // int → double holds EVERY int exactly — still a blessed coercion
    val ok = MergeSink.upsert(tD, Seq((1L, 16777217)).toDF("id", "v"))
    assert(ok.where(col("v") === lit(16777217.0d)).count() == 1)
    // the delete leg shares the rule: long ids vs a double key collapse ≥ 2^53
    val e = intercept[IllegalArgumentException](
      MergeSink.delete(Seq((1.0d, "a")).toDF("id", "v"), Seq(1L).toDF("id")))
    assert(e.getMessage.contains("comparable"))
  }

  test("mergeIntoParquet: update against an absent target affects zero rows, not insert") {
    val path = Files.createTempDirectory("graft-upd-absent").toString + "/t"
    MergeSink.mergeIntoParquet(spark, batch, path, "update")
    // target created with the batch schema but EMPTY — same result as an
    // existing-but-empty target; first run must not degrade to insert
    assert(spark.read.parquet(path).count() == 0)
  }

  test("concurrent writer: an interleaved flat-target commit is detected, " +
    "the loser publishes nothing, a retry converges (single-writer contract)") {
    // same contract as the bucketed sink, pinned on the flat path: writer
    // B's whole merge lands between writer A's read and A's swap via the
    // interleaveBeforeSwap seam
    val path = Files.createTempDirectory("graft-flat-race").toString + "/t"
    val seed = Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)).toDF("id", "v", "n")
    MergeSink.mergeIntoParquet(spark, seed, path, "upsert", Seq("id"))
    val batchB = Seq((2L, "B-WINS", 20L)).toDF("id", "v", "n")
    val batchA = Seq((2L, "A-LOSES", 200L), (9L, "a-new", 9L)).toDF("id", "v", "n")
    var fired = false
    MergeSink.interleaveBeforeSwap = () => {
      if (!fired) { fired = true
        MergeSink.mergeIntoParquet(spark, batchB, path, "upsert", Seq("id"))
      }
    }
    val e =
      try intercept[graft.sink.ConcurrentWriteException] {
        MergeSink.mergeIntoParquet(spark, batchA, path, "upsert", Seq("id"))
      } finally MergeSink.interleaveBeforeSwap = () => ()
    assert(fired)
    assert(e.getMessage.contains("retry"))
    // winner's state intact; nothing of A visible; no stray tmp dirs
    assertSameRows(
      spark.read.parquet(path).orderBy("id"),
      MergeSink.upsert(seed, batchB, Seq("id")).orderBy("id"))
    val parent = new java.io.File(path).getParentFile
    assert(parent.listFiles().map(_.getName).toSeq == Seq("t"),
      s"loser leaked dirs: ${parent.listFiles().map(_.getName).toSeq}")
    // retry converges against the winner's state
    MergeSink.mergeIntoParquet(spark, batchA, path, "upsert", Seq("id"))
    assertSameRows(
      spark.read.parquet(path).orderBy("id"),
      MergeSink.upsert(MergeSink.upsert(seed, batchB, Seq("id")), batchA, Seq("id"))
        .orderBy("id"))
  }

  // ------------------------------------------------------------- SCD2

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Key 1 has history (one closed + one current version); keys 2 and 3
    * are current-only. */
  private def scdTarget: DataFrame =
    Seq(
      (1L, "old1", "n1", ts("2023-01-01 00:00:00"),
        Some(ts("2024-01-01 00:00:00")), false),
      (1L, "cur1", "n1b", ts("2024-01-01 00:00:00"), None, true),
      (2L, "cur2", "n2", ts("2024-01-01 00:00:00"), None, true),
      (3L, "cur3", "n3", ts("2024-01-01 00:00:00"), None, true))
      .toDF("id", "val", "note", "valid_from", "valid_to", "is_current")

  /** Key 1 changed, key 2 identical (no-op), key 4 brand-new; `note` is
    * deliberately NOT shipped (carry-forward contract). */
  private def scdBatch: DataFrame =
    Seq((1L, "new1"), (2L, "cur2"), (4L, "b4")).toDF("id", "val")

  private def expectedScd2: DataFrame =
    Seq(
      // history passes through untouched
      (1L, "old1", "n1", ts("2023-01-01 00:00:00"),
        Some(ts("2024-01-01 00:00:00")), false),
      // changed key: current version closed at the batch ts...
      (1L, "cur1", "n1b", ts("2024-01-01 00:00:00"),
        Some(ts("2024-06-01 00:00:00")), false),
      // ...and reopened with batch values, `note` carried forward
      (1L, "new1", "n1b", ts("2024-06-01 00:00:00"), None, true),
      // identical batch row: NO new version (change detection)
      (2L, "cur2", "n2", ts("2024-01-01 00:00:00"), None, true),
      // key untouched by the batch
      (3L, "cur3", "n3", ts("2024-01-01 00:00:00"), None, true),
      // brand-new key: open first version, unshipped `note` is NULL
      (4L, "b4", null, ts("2024-06-01 00:00:00"), None, true))
      .toDF("id", "val", "note", "valid_from", "valid_to", "is_current")

  test("scd2: closes changed versions, no-ops identical rows, inserts new " +
    "keys, carries unshipped columns forward, passes history through") {
    val out = MergeSink.scd2(
      scdTarget, scdBatch, to_timestamp(lit("2024-06-01 00:00:00")), Seq("id"))
    assertSameRows(out, expectedScd2)
  }

  test("scd2: broadcast decomposition is semantically identical to full-outer") {
    val bc = MergeSink.scd2(
      scdTarget, scdBatch, to_timestamp(lit("2024-06-01 00:00:00")), Seq("id"),
      broadcastBatch = true)
    assertSameRows(bc, expectedScd2)
    // and like upsert's, the broadcast shape plans no full-outer join
    val joins = bc.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "FullOuter" => j
    }
    assert(joins.isEmpty, "broadcast scd2 must not plan a full-outer join")
  }

  test("scd2: re-merging the same batch is a no-op at any later timestamp " +
    "(change detection makes loads idempotent)") {
    val once = MergeSink.scd2(
      scdTarget, scdBatch, to_timestamp(lit("2024-06-01 00:00:00")), Seq("id"))
      .localCheckpoint(true)
    val again = MergeSink.scd2(
      once, scdBatch, to_timestamp(lit("2024-12-01 00:00:00")), Seq("id"))
    assertSameRows(again, once)
  }

  test("scd2: refuses a batch shipping sink-managed columns, a target " +
    "lacking them, and a key overlapping them") {
    val e1 = intercept[IllegalArgumentException] {
      MergeSink.scd2(scdTarget,
        scdBatch.withColumn("is_current", lit(true)),
        to_timestamp(lit("2024-06-01 00:00:00")), Seq("id"))
    }
    assert(e1.getMessage.contains("sink-managed"))
    val e2 = intercept[IllegalArgumentException] {
      MergeSink.scd2(target, scdBatch,
        to_timestamp(lit("2024-06-01 00:00:00")), Seq("id"))
    }
    assert(e2.getMessage.contains("lacks"))
    intercept[IllegalArgumentException] {
      MergeSink.scd2(scdTarget, scdBatch,
        to_timestamp(lit("2024-06-01 00:00:00")), Seq("id", "is_current"))
    }
  }

  test("openVersions: stamps first open versions, dedupes keys, refuses " +
    "pre-stamped batches") {
    val out = MergeSink.openVersions(
      Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "val"),
      Seq("id"), to_timestamp(lit("2024-01-01 00:00:00")))
    assertSameRows(out,
      Seq((1L, "a", ts("2024-01-01 00:00:00"), Option.empty[java.sql.Timestamp], true),
        (2L, "b", ts("2024-01-01 00:00:00"), Option.empty[java.sql.Timestamp], true))
        .toDF("id", "val", "valid_from", "valid_to", "is_current"))
    intercept[IllegalArgumentException] {
      MergeSink.openVersions(out, Seq("id"), to_timestamp(lit("2024-02-01 00:00:00")))
    }
  }

  test("scd2AsOf: inclusive valid_from, exclusive valid_to — a probe AT a " +
    "version boundary sees exactly the new version") {
    val merged = MergeSink.scd2(
      scdTarget, scdBatch, to_timestamp(lit("2024-06-01 00:00:00")), Seq("id"))
      .localCheckpoint(true)
    def visible(p: String): Seq[(Long, String)] =
      MergeSink.scd2AsOf(merged, to_timestamp(lit(p)))
        .select("id", "val").as[(Long, String)].collect().sortBy(_._1).toSeq
    // exactly at the change boundary: key 1's closed version (valid_to ==
    // probe) is OUT, the reopened one (valid_from == probe) is IN
    assert(visible("2024-06-01 00:00:00") ==
      Seq((1L, "new1"), (2L, "cur2"), (3L, "cur3"), (4L, "b4")))
    // before it: the pre-change state, no key 4 yet
    assert(visible("2024-03-01 00:00:00") ==
      Seq((1L, "cur1"), (2L, "cur2"), (3L, "cur3")))
    // before the bootstrap: only key 1's archaic version existed
    assert(visible("2023-06-01 00:00:00") == Seq((1L, "old1")))
    // every key has AT MOST one visible version at any probe
    val dup = MergeSink.scd2AsOf(merged, to_timestamp(lit("2024-06-01 00:00:00")))
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("mergeIntoParquet scd2: bootstrap on a fresh path, versioned merge " +
    "on an existing one; empty scd2_ts refuses before any write") {
    val path = Files.createTempDirectory("graft-scd2").toString + "/t"
    intercept[IllegalArgumentException] { // ts required even on a fresh path
      MergeSink.mergeIntoParquet(spark, scdBatch, path, "scd2", Seq("id"))
    }
    val seed = Seq((1L, "cur1", "n1b"), (2L, "cur2", "n2"), (3L, "cur3", "n3"))
      .toDF("id", "val", "note")
    MergeSink.mergeIntoParquet(spark, seed, path, "scd2", Seq("id"),
      scd2Ts = "2024-01-01 00:00:00")
    MergeSink.mergeIntoParquet(spark, scdBatch, path, "scd2", Seq("id"),
      scd2Ts = "2024-06-01 00:00:00")
    // the parquet round-trip equals the in-memory merge over the same
    // bootstrap (minus key 1's pre-existing history, which the fresh
    // target never had)
    val expected = MergeSink.scd2(
      MergeSink.openVersions(seed, Seq("id"), to_timestamp(lit("2024-01-01 00:00:00"))),
      scdBatch, to_timestamp(lit("2024-06-01 00:00:00")), Seq("id"))
    assertSameRows(spark.read.parquet(path), expected)
  }

  test("changeFeed: inserts and changed-update pre/post pairs; matched " +
    "no-ops and excluded-only differences emit NOTHING (both shapes)") {
    for (bb <- Seq(false, true)) {
      val feed = MergeSink.changeFeed(
        target, batch, Seq("id"), excluded = Seq("note"), broadcastBatch = bb)
      // id 2 matches and `val` changes (note is excluded — its diff must
      // not count; extra is unknown to the target); id 4 inserts
      val expect = Seq(
        ("insert", 4L, "b4", "bn4", None),
        ("update_pre", 2L, "t2", "n2", Some(20)),
        ("update_post", 2L, "b2", "n2", Some(20)))
        .toDF("_op", "id", "val", "note", "t_only")
      assertSameRows(feed.orderBy("id", "_op"), expect.orderBy("id", "_op"))
      // a batch that merges to the identical row is a no-op feed — here
      // the only difference is in the EXCLUDED column, which upsert keeps
      val noop = Seq((2L, "t2", "CHANGED", "x")).toDF("id", "val", "note", "extra")
      assert(MergeSink.changeFeed(
        target, noop, Seq("id"), excluded = Seq("note"), broadcastBatch = bb)
        .isEmpty, "excluded-only difference must emit no feed rows")
    }
  }

  test("changeFeed/deleteFeed: applying the feed to the target reproduces " +
    "the merge exactly") {
    val feed = MergeSink.changeFeed(target, batch, Seq("id"), excluded = Seq("note"))
    assertSameRows(
      MergeSink.applyFeed(target, feed, Seq("id")).orderBy("id"),
      MergeSink.upsert(target, batch, Seq("id"), excluded = Seq("note")).orderBy("id"))

    val ids = Seq(Some(2L), Some(2L), Some(404L), None).toDF("id")
    val dFeed = MergeSink.deleteFeed(target, ids, "id")
    // feed = exactly the removed rows (dup and NULL ids never match)
    assertSameRows(
      dFeed.drop("_op").orderBy("id"),
      target.join(MergeSink.delete(target, ids, "id"), Seq("id"), "left_anti").orderBy("id"))
    assert(dFeed.select("_op").distinct().as[String].collect().toSeq == Seq("delete"))
    assertSameRows(
      MergeSink.applyFeed(target, dFeed, Seq("id")).orderBy("id"),
      MergeSink.delete(target, ids, "id").orderBy("id"))
    // feeds COMPOSE: upsert feed then delete feed replays both merges
    assertSameRows(
      MergeSink.applyFeed(
        MergeSink.applyFeed(target, feed, Seq("id")), dFeed, Seq("id"))
        .orderBy("id"),
      MergeSink.delete(
        MergeSink.upsert(target, batch, Seq("id"), excluded = Seq("note")),
        ids, "id").orderBy("id"))
  }

  test("deleteWhere on a flat target: predicate purge with SQL DELETE " +
    "null semantics, atomic rewrite, absent/no-match fast paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dw").toString + "/t"
    // absent target: no-op, no creation
    MergeSink.deleteWhere(spark, dir, "v > 0")
    assert(!new java.io.File(dir).exists())
    Seq((1L, 10L), (2L, 20L), (3L, 300L))
      .toDF("id", "v")
      .unionByName(Seq((4L, null.asInstanceOf[java.lang.Long])).toDF("id", "v")
        .selectExpr("id", "CAST(v AS BIGINT) AS v"))
      .write.parquet(dir)
    MergeSink.deleteWhere(spark, dir, "v > 100")
    // null predicate = not a match = survives (SQL DELETE semantics)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    // no-match purge: content unchanged (fast path skips the rewrite)
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    MergeSink.deleteWhere(spark, dir, "v > 100000")
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet == files,
      "a purge matching nothing must not rewrite the target")
  }
}
