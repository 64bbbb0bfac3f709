package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.MergeSink

/** Algebraic properties of the merge sink (SURVEY §5 item 4): upsert
  * idempotence, key coverage, delete∘insert, dedupe uniqueness. Inputs are
  * scalacheck-generated row sets (seeded → deterministic), kept small
  * because every case pays a Spark job. */
class MergeSinkPropertySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** n deterministic samples of gen (scalatestplus isn't in the offline
    * dep cache, so cases are drawn by hand from seeded Gen). */
  private def samples[A](gen: Gen[A], n: Int = 8): Seq[A] = {
    val p = Gen.Parameters.default.withSize(12)
    Iterator.from(0)
      .map(i => gen.apply(p, Seed(42L + 1000L * i)))
      .collect { case Some(a) => a }
      .take(n).toSeq
  }

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.alphaLowerStr.map(_.take(4))))

  private def forAllPairs(f: (List[(Long, String)], List[(Long, String)]) => Unit): Unit =
    samples(Gen.zip(rowsGen, rowsGen)).foreach { case (t, b) =>
      withClue(s"target=$t batch=$b: ") { f(t, b) }
    }

  private def df(rows: List[(Long, String)]): DataFrame = rows.toDF("id", "v")

  test("property: upsert is idempotent — applying the same batch twice changes nothing") {
    forAllPairs { (t, b) =>
      val once = MergeSink.upsert(df(t), df(b)).cache()
      val twice = MergeSink.upsert(once, df(b))
      assert(canon(twice) == canon(once))
      once.unpersist()
    }
  }

  test("property: upsert result keys = target keys ∪ batch keys") {
    forAllPairs { (t, b) =>
      val out = MergeSink.upsert(df(t), df(b))
      val expectedKeys = (t.map(_._1) ++ b.map(_._1)).distinct.sorted
      val gotKeys = out.select("id").as[Long].collect().toList
      assert(gotKeys.distinct.sorted == expectedKeys)
      // a key-unique target stays key-unique (no row multiplication)
      if (t.map(_._1).distinct.size == t.size)
        assert(gotKeys.size == expectedKeys.size)
    }
  }

  test("property: matched rows take batch values, unmatched keep target values") {
    forAllPairs { (t0, b) =>
      val t = t0.distinctBy(_._1)
      val out = MergeSink.upsert(df(t), df(b)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val bMap = MergeSink.dedupeBatch(df(b), Seq("id")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      t.foreach { case (id, v) =>
        assert(out(id) == bMap.getOrElse(id, v))
      }
    }
  }

  test("property: delete then re-upsert restores the deleted keys") {
    samples(Gen.zip(rowsGen.map(_.distinctBy(_._1)),
      Gen.listOf(Gen.choose(0L, 15L)))).foreach { case (t, ids) =>
      val deleted = MergeSink.delete(df(t), ids.toDF("id"))
      val reinserted = MergeSink.upsert(deleted, df(t))
      assert(canon(reinserted) == canon(df(t)))
    }
  }

  test("property: dedupeBatch yields unique keys drawn from the batch, covering every key") {
    samples(rowsGen).foreach { b =>
      val out = MergeSink.dedupeBatch(df(b), Seq("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toList
      assert(out.map(_._1).distinct.size == out.size)
      assert(out.toSet.subsetOf(b.toSet))
      assert(out.map(_._1).toSet == b.map(_._1).toSet)
    }
  }

  test("property: broadcast and full-outer upsert shapes agree") {
    forAllPairs { (t, b) =>
      val a = MergeSink.upsert(df(t), df(b), broadcastBatch = false)
      val c = MergeSink.upsert(df(t), df(b), broadcastBatch = true)
      assert(canon(a) == canon(c))
    }
  }

  test("property: scd2 version chains are sound under any batch sequence — " +
    "one open current per key, gapless intervals, model-exact values at " +
    "every point in time") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val tss = Seq("2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00")
    // scala reference model: per batch, duplicate keys resolve to the
    // smallest whole row (dedupeBatch's survivor rule)
    def modelBatch(b: List[(Long, String)]): Map[Long, String] =
      b.groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).min }
    samples(Gen.listOfN(3, rowsGen), n = 6).foreach { batches =>
      withClue(s"batches=$batches: ") {
        val b0 +: rest = batches
        var state = MergeSink.openVersions(
          df(b0), Seq("id"), to_timestamp(lit(tss.head))).localCheckpoint(true)
        rest.zip(tss.tail).foreach { case (b, ts) =>
          state = MergeSink.scd2(
            state, df(b), to_timestamp(lit(ts)), Seq("id")).localCheckpoint(true)
        }
        val rows = state
          .select(col("id"), col("v"),
            col("valid_from").cast("string"), col("valid_to").cast("string"),
            col("is_current"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            Option(r.getString(3)), r.getBoolean(4)))
        // 1. exactly one current, open-ended version per ever-seen key
        val byKey = rows.groupBy(_._1)
        val everSeen = batches.flatMap(_.map(_._1)).toSet
        assert(byKey.keySet == everSeen)
        byKey.foreach { case (k, vs) =>
          val cur = vs.filter(_._5)
          assert(cur.size == 1 && cur.head._4.isEmpty, s"key $k current versions: $vs")
          // 2. gapless chain: sorted by valid_from, each closed version
          // ends exactly where the next begins; only the last is open
          val chain = vs.sortBy(_._3)
          chain.init.zip(chain.tail).foreach { case (a, b) =>
            assert(a._4.contains(b._3), s"key $k chain gap: $a -> $b")
          }
          assert(chain.init.forall(!_._5) && chain.last._5)
        }
        // 3. point-in-time values match the scala model after each batch
        val models = batches.scanLeft(Map.empty[Long, String]) {
          (m, b) => m ++ modelBatch(b)
        }.tail
        tss.zip(models).foreach { case (ts, model) =>
          val seen = MergeSink.scd2AsOf(state, to_timestamp(lit(ts)))
            .select("id", "v").as[(Long, String)].collect().toMap
          assert(seen == model, s"as-of $ts: got $seen, model $model")
        }
        // 4. version count per key = 1 + number of genuine changes
        byKey.foreach { case (k, vs) =>
          val values = models.flatMap(_.get(k)).distinctBy(identity)
          // consecutive-distinct fold: a value can recur after a change
          val changes = models.flatMap(_.get(k))
            .foldLeft(List.empty[String]) {
              case (acc, v) if acc.headOption.contains(v) => acc
              case (acc, v) => v :: acc
            }.size
          assert(vs.size == changes, s"key $k: ${vs.size} versions, $changes states ($values)")
        }
      }
    }
  }

  test("property: schema-evolution contract over a 5-type lattice — the " +
    "accept/refuse decision is identical in BOTH join shapes, acceptance " +
    "always preserves the target type, and the headline cases hold") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    val types: Seq[(String, DataType)] = Seq(
      ("int", IntegerType), ("long", LongType),
      ("float", FloatType), ("double", DoubleType), ("string", StringType))
    val t0 = Seq((1L, 10)).toDF("id", "v")
    val decisions = for ((bn, bt) <- types; (tn, tt) <- types) yield {
      val target = t0.select(col("id"), col("v").cast(tt).as("v"))
      val batch = t0.select(col("id"), col("v").cast(bt).as("v"))
      val results = Seq(true, false).map { bc =>
        scala.util.Try(MergeSink.upsert(target, batch, broadcastBatch = bc))
      }
      withClue(s"batch $bn -> target $tn: ") {
        // both physical shapes make the SAME accept/refuse decision
        assert(results.map(_.isSuccess).distinct.size == 1,
          "broadcast and full-outer shapes disagree on validity")
        // acceptance always yields the target's type (schema authority)
        results.foreach(_.foreach(out => assert(out.schema("v").dataType == tt)))
        // refusal is always the loud contract error, nothing else
        results.foreach(_.failed.foreach(e =>
          assert(e.isInstanceOf[IllegalArgumentException] &&
            e.getMessage.contains("lossy"), e.getMessage)))
      }
      (bn, tn, results.head.isSuccess)
    }
    val ok = decisions.collect { case (b, t, true) => s"$b->$t" }.toSet
    // headline cases, pinned concretely (ANSI store-assignment rules:
    // numeric-precedence widening and atomic→string are safe; everything
    // narrowing or string→numeric refuses)
    Seq("int->long", "int->double", "float->double", "long->string")
      .foreach(c => assert(ok.contains(c), s"$c must coerce"))
    Seq("double->long", "long->int", "double->float", "string->long",
      "string->double")
      .foreach(c => assert(!ok.contains(c), s"$c must refuse"))
    types.foreach { case (n, _) => assert(ok.contains(s"$n->$n")) }
  }

  test("property: change feed is the exact merge delta — applying it to " +
    "the target reproduces upsert, and it is empty iff the merge is a no-op") {
    import org.apache.spark.sql.functions.col
    forAllPairs { (t0, b) =>
      // key-unique target (the sink's own invariant for a real target)
      val t = t0.groupBy(_._1).map(_._2.head).toList
      val feed = MergeSink.changeFeed(df(t), df(b)).cache()
      val applied = MergeSink.applyFeed(df(t), feed)
      val merged = MergeSink.upsert(df(t), df(b))
      assert(canon(applied) == canon(merged))
      // empty-feed ⇔ no-op merge
      assert((feed.count() == 0) == (canon(merged) == canon(df(t))))
      // update ops pair exactly: every pre has its post on the same key
      val pre = feed.filter(col("_op") === "update_pre")
        .select("id").as[Long].collect().sorted.toSeq
      val post = feed.filter(col("_op") === "update_post")
        .select("id").as[Long].collect().sorted.toSeq
      assert(pre == post, s"pre/post keys must pair: $pre vs $post")
      feed.unpersist()
    }
  }

  test("property: a replica built by subscribeFeed from the outbox alone " +
    "equals the target after ANY random op sequence, with mid-stream " +
    "rebases thrown in") {
    import java.nio.file.Files
    import graft.sink.BucketedMergeSink
    // op sequence: each step is an upsert batch or a delete-id list
    val opGen: Gen[List[(Boolean, List[(Long, String)])]] =
      Gen.listOfN(4, Gen.zip(Gen.prob(0.7), rowsGen))
    samples(opGen, n = 4).zipWithIndex.foreach { case (ops, i) =>
      withClue(s"ops=$ops: ") {
        val root = Files.createTempDirectory(s"graft-subprop$i").toString
        val path = s"$root/t"; val feed = s"$root/f"; val rep = s"$root/r"
        var committed = 0
        ops.foreach { case (isUpsert, rows) =>
          val rowsDf = df(rows)
          if (isUpsert && rows.nonEmpty) {
            BucketedMergeSink.merge(spark, rowsDf, path, "upsert", Seq("id"),
              numBuckets = 4, retainVersions = 8)
            committed += 1
          } else if (!isUpsert && rows.nonEmpty && committed > 0) {
            BucketedMergeSink.merge(spark, rowsDf.select("id"), path,
              "delete", identifier = "id")
            committed += 1
          }
        }
        if (committed > 0) {
          BucketedMergeSink.publishChangeFeed(spark, path, feed)
          // rebase mid-life at the median batch: the consumer below must
          // bootstrap from the rebased base + remaining deltas
          if (committed >= 3)
            BucketedMergeSink.compactOutbox(spark, feed, (committed + 1) / 2L + 1)
          BucketedMergeSink.subscribeFeed(spark, feed, rep, numBuckets = 4)
          val got = BucketedMergeSink.read(spark, rep)
            .as[(Long, String)].collect().toSet
          val want = BucketedMergeSink.read(spark, path)
            .as[(Long, String)].collect().toSet
          assert(got == want, s"replica $got != target $want")
        }
      }
    }
  }
}
