package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{BucketedMergeSink, MergeSink}

/** Bucket-partitioned merge targets: identical semantics to the flat
  * [[MergeSink]] path, but a batch reads and rewrites ONLY the buckets
  * it touches — the claim pinned here by directory listings and mtimes,
  * not just by results. */
class BucketedMergeSinkSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmpTarget(): String =
    Files.createTempDirectory("graft-bms").toString + "/t"

  /** Every data file under a bucket dir as relPath -> (size, mtime). */
  private def bucketState(path: String, bucket: Int): Map[String, (Long, Long)] = {
    val dir = new File(path, s"${BucketedMergeSink.bucketCol}=$bucket")
    if (!dir.isDirectory) Map.empty
    else dir.listFiles().filter(_.isFile)
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  private def seed(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"name$i", i * 10L)).toDF("id", "name", "v")

  test("upsert/update/delete match the flat MergeSink semantics exactly") {
    val path = tmpTarget()
    val target = seed(50)
    val batch = Seq((10L, "TEN", 1000L), (999L, "new", 1L)).toDF("id", "name", "v")
    BucketedMergeSink.merge(spark, target, path, "upsert", Seq("id"), numBuckets = 8)
    BucketedMergeSink.merge(spark, batch, path, "upsert", Seq("id"),
      excluded = Seq("v"))
    val afterUpsert = MergeSink.upsert(target, batch, Seq("id"), excluded = Seq("v"))
    assertSameRows(
      BucketedMergeSink.read(spark, path).orderBy("id"),
      afterUpsert.orderBy("id"))

    val upd = Seq((999L, "NEW", 2L), (777L, "ghost", 3L)).toDF("id", "name", "v")
    BucketedMergeSink.merge(spark, upd, path, "update", Seq("id"))
    val afterUpdate = MergeSink.update(afterUpsert, upd, Seq("id"))
    assertSameRows(
      BucketedMergeSink.read(spark, path).orderBy("id"),
      afterUpdate.orderBy("id"))

    val dels = Seq(10L, 11L, 12L, 404L).toDF("id")
    BucketedMergeSink.merge(spark, dels, path, "delete", identifier = "id")
    assertSameRows(
      BucketedMergeSink.read(spark, path).orderBy("id"),
      MergeSink.delete(afterUpdate, dels, "id").orderBy("id"))
  }

  test("a single-key batch rewrites exactly ONE bucket directory") {
    val path = tmpTarget()
    val n = 4
    BucketedMergeSink.merge(spark, seed(100), path, "upsert", Seq("id"), numBuckets = n)
    val before = (0 until n).map(b => b -> bucketState(path, b)).toMap
    assert(before.values.forall(_.nonEmpty), "seed should populate all 4 buckets")

    val oneKey = Seq((42L, "FORTY-TWO", 0L)).toDF("id", "name", "v")
    val hit = oneKey
      .select(BucketedMergeSink.bucketExpr(Seq("id"), n)).as[Int].head()
    BucketedMergeSink.merge(spark, oneKey, path, "upsert", Seq("id"))

    val after = (0 until n).map(b => b -> bucketState(path, b)).toMap
    (0 until n).filterNot(_ == hit).foreach { b =>
      assert(after(b) == before(b),
        s"untouched bucket $b was rewritten (files/mtimes changed)")
    }
    assert(after(hit) != before(hit), s"touched bucket $hit should be rewritten")
    // and the merge actually landed
    assert(BucketedMergeSink.read(spark, path)
      .filter(col("id") === 42L).select("name").as[String].head() == "FORTY-TWO")
  }

  test("the touched-bucket read is partition-pruned (PartitionFilters on gbucket)") {
    val path = tmpTarget()
    BucketedMergeSink.merge(spark, seed(100), path, "upsert", Seq("id"), numBuckets = 8)
    val meta = BucketedMergeSink.readMeta(spark, path)
    val sliced = spark.read
      .schema(meta.schema.add(BucketedMergeSink.bucketCol, "int"))
      .parquet(path)
      .filter(col(BucketedMergeSink.bucketCol).isin(3))
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(BucketedMergeSink.bucketCol),
      s"expected a partition filter on the bucket column:\n$plan")
  }

  test("a delete that empties a bucket removes its directory") {
    val path = tmpTarget()
    val rows = seed(40)
    BucketedMergeSink.merge(spark, rows, path, "upsert", Seq("id"), numBuckets = 4)
    // delete every key in bucket 2
    val victims = rows
      .withColumn("b", BucketedMergeSink.bucketExpr(Seq("id"), 4))
      .filter(col("b") === 2).select("id")
    assert(victims.count() > 0)
    BucketedMergeSink.merge(spark, victims, path, "delete", identifier = "id")
    assert(bucketState(path, 2).isEmpty, "emptied bucket dir should be gone")
    assert(BucketedMergeSink.read(spark, path).count() == 40 - victims.count())
  }

  test("update against an absent target establishes the layout but writes no rows") {
    val path = tmpTarget()
    val batch = Seq((1L, "a", 1L)).toDF("id", "name", "v")
    BucketedMergeSink.merge(spark, batch, path, "update", Seq("id"), numBuckets = 4)
    assert(BucketedMergeSink.isBucketed(spark, path))
    assert(BucketedMergeSink.read(spark, path).count() == 0)
    // and a later upsert into the (empty) layout works
    BucketedMergeSink.merge(spark, batch, path, "upsert", Seq("id"))
    assert(BucketedMergeSink.read(spark, path).count() == 1)
  }

  test("upsert on a different key than the layout's is rejected") {
    val path = tmpTarget()
    BucketedMergeSink.merge(spark, seed(10), path, "upsert", Seq("id"), numBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      BucketedMergeSink.merge(spark, seed(10), path, "upsert", Seq("name"))
    }
    assert(e.getMessage.contains("routed"))
  }

  test("refuses to bucket-merge over an existing flat layout") {
    val path = tmpTarget()
    seed(5).write.parquet(path)
    val e = intercept[IllegalArgumentException] {
      BucketedMergeSink.merge(spark, seed(5), path, "upsert", Seq("id"), numBuckets = 4)
    }
    assert(e.getMessage.contains("not a bucketed target"))
  }

  test("a batch key narrower than the target's still routes to the right bucket") {
    val path = tmpTarget()
    BucketedMergeSink.merge(spark, seed(50), path, "upsert", Seq("id"), numBuckets = 8)
    // int-typed ids: hash(int) != hash(long) for the same value, so
    // unrouted this would miss the existing row and try to insert into a
    // stray bucket (merge() fails loudly on that) — the cast makes it
    // a clean in-place update instead
    val intBatch = Seq((7, "SEVEN", 70)).toDF("id", "name", "v")
    BucketedMergeSink.merge(spark, intBatch, path, "upsert", Seq("id"))
    val out = BucketedMergeSink.read(spark, path)
    assert(out.count() == 50)
    assert(out.filter(col("id") === 7L).select("name").as[String].head() == "SEVEN")
  }

  test("mergeIntoParquet auto-delegates when pointed at a bucketed layout") {
    val path = tmpTarget()
    BucketedMergeSink.merge(spark, seed(20), path, "upsert", Seq("id"), numBuckets = 4)
    MergeSink.mergeIntoParquet(spark, Seq((3L, "THREE", 33L)).toDF("id", "name", "v"),
      path, "upsert", Seq("id"))
    assert(BucketedMergeSink.isBucketed(spark, path), "layout must survive")
    val out = BucketedMergeSink.read(spark, path)
    assert(out.count() == 20)
    assert(out.filter(col("id") === 3L).select("v").as[Long].head() == 33L)
  }

  test("compact: fragmented buckets collapse to one file, content intact, no-op when clean") {
    val path = tmpTarget()
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // AQE off + several shuffle partitions: the create-path write keeps
      // one file per (task × bucket), so every bucket fragments
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      BucketedMergeSink.merge(spark, seed(200), path, "upsert", Seq("id"), numBuckets = 4)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", sp)
    }
    def dataFiles(b: Int): Int =
      bucketState(path, b).count(f => !f._1.startsWith(".") && !f._1.startsWith("_"))
    val pre = (0 until 4).map(b => b -> bucketState(path, b)).toMap
    val fragmented = (0 until 4).filter(b => dataFiles(b) > 1)
    assert(fragmented.nonEmpty, s"merge should fragment, got ${pre.view.mapValues(_.size).toMap}")
    val before = canon(BucketedMergeSink.read(spark, path))

    val compacted = BucketedMergeSink.compact(spark, path)
    assert(compacted == fragmented)
    fragmented.foreach { b =>
      assert(dataFiles(b) == 1, s"bucket $b should be one data file")
    }
    (0 until 4).filterNot(fragmented.contains).foreach { b =>
      assert(bucketState(path, b) == pre(b), s"clean bucket $b was rewritten")
    }
    assert(canon(BucketedMergeSink.read(spark, path)) == before)

    // an already-compact layout: compact is a no-op that touches nothing
    val clean = (0 until 4).map(b => b -> bucketState(path, b)).toMap
    assert(BucketedMergeSink.compact(spark, path).isEmpty)
    (0 until 4).foreach(b => assert(bucketState(path, b) == clean(b)))
  }

  test("replaying the same batch converges (at-least-once idempotence)") {
    val path = tmpTarget()
    BucketedMergeSink.merge(spark, seed(30), path, "upsert", Seq("id"), numBuckets = 4)
    val batch = Seq((5L, "x", 1L), (31L, "y", 2L)).toDF("id", "name", "v")
    BucketedMergeSink.merge(spark, batch, path, "upsert", Seq("id"))
    val once = canon(BucketedMergeSink.read(spark, path))
    BucketedMergeSink.merge(spark, batch, path, "upsert", Seq("id"))
    assert(canon(BucketedMergeSink.read(spark, path)) == once)
  }
}
