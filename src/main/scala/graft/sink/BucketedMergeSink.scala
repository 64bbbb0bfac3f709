package graft.sink

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.storage.StorageLevel

/** Bucket-partitioned MERGE target with MANIFEST commits: the
  * incremental-load shape that holds at 100 TB, with all-or-nothing
  * batch visibility.
  *
  * [[MergeSink.mergeIntoParquet]] reads and atomically rewrites the
  * ENTIRE parquet target per batch — semantically right (the reference's
  * own per-batch merge loop, Pype.py:97-148) but O(target) per batch.
  * This sink hash-buckets the target on the merge key so each batch
  * (1) routes its rows to their buckets, (2) reads ONLY the touched
  * buckets, (3) runs the exact same [[MergeSink]] upsert/update/delete
  * semantics against that slice, and (4) publishes only those buckets.
  * A small batch against a 100 TB target touching k of n buckets costs
  * O(k/n · target), not O(target).
  *
  * Physical layout (v2 — the lakehouse-table shape in miniature):
  *
  * {{{
  *   path/_graft_buckets                    <- bucket count, key, schema
  *   path/_graft_manifest/v000000001        <- bucket -> data-dir map, versioned
  *   path/data/c<commit>/gbucket=0/ part-*.parquet
  *   path/data/c<commit>/gbucket=7/ ...
  * }}}
  *
  * Data directories are IMMUTABLE once written: a batch writes its
  * touched buckets under a fresh `data/c<uuid>/` dir, then commits by
  * creating the next manifest version (`fs.create(..., overwrite =
  * false)` — one atomic file creation) that remaps the touched buckets
  * to the new dir. Readers resolve the highest manifest version into
  * explicit leaf-dir paths, so
  *
  *   - a batch is ALL-OR-NOTHING visible: before the manifest file
  *     exists, readers resolve the old mapping (the new data dir is an
  *     invisible orphan); after, the new one. There is no intermediate
  *     state, unlike the v1 bucket-at-a-time directory swap, and no
  *     rename of live data at all;
  *   - a crash mid-write leaves only an orphan `data/c*` dir, GC'd at
  *     the start of the next merge/compact. Retention is a LAYOUT
  *     property persisted at creation
  *     (pass `retainVersions = N` to the creating merge; change later
  *     with [[setRetention]]) and honored by every merge/compact: with
  *     the default of 1 a concurrent reader holding a superseded
  *     manifest may find its dirs GC'd and fail loudly, never read
  *     mixed data; with N the last N manifests AND every dir any of
  *     them references are kept, so readers get N-deep snapshot
  *     isolation ([[readVersion]] time travel) at the cost of retained
  *     storage;
  *   - bucket pruning is PATH-level: a touched-slice or keyed read
  *     simply never lists the other buckets' directories — stronger
  *     than a partition filter, which still enumerates the layout.
  *
  * The bucket count is fixed at creation (changing it moves every row);
  * size it so one bucket of the FULL-GROWN target fits comfortably in a
  * merge job, e.g. target_bytes / ~1 GB.
  *
  * ==Concurrent writers==
  *
  * The supported contract is '''one writer process per target at a
  * time''' — the same serialization the reference gets for free from
  * its single-threaded per-batch loop (`Pype.py:148,186`); [[Runner]]
  * enforces it WITHIN a run by refusing parallel stages that share a
  * target. Across processes nothing can enforce it, so a violation is
  * DETECTED and fails loudly instead of corrupting:
  *
  *   - every merge/compact records the manifest version its reads
  *     resolved against and commits `v(base+1)` optimistically; if
  *     another writer advanced the manifest in between — or wins the
  *     `create(overwrite = false)` of the same version by a hair — the
  *     loser throws [[ConcurrentWriteException]], publishes NOTHING
  *     (its data dir is deleted on the spot; a crash before that
  *     leaves an invisible orphan for the next write's GC), and the
  *     winner's committed state is untouched. The error is RETRYABLE:
  *     re-running the losing merge re-reads the winner's state and
  *     re-merges correctly.
  *   - the write-path GC can remove a VIOLATING concurrent writer's
  *     not-yet-committed data dir (it is indistinguishable from a
  *     crashed batch's orphan); that writer then fails at write or
  *     commit time — loudly, never by publishing mixed data. This is
  *     why the contract is single-writer rather than general optimistic
  *     concurrency: detection makes violations safe-and-loud, not
  *     correct.
  *
  * Pinned in BucketedMergeSinkSpec ("concurrent writer" cases).
  */
/** A manifest commit lost to another writer (see
  * [[BucketedMergeSink]] scaladoc, "Concurrent writers"). RETRYABLE:
  * nothing of the losing batch was published and the target is in the
  * winning writer's consistent state — re-running the same merge
  * re-reads that state and re-merges correctly. */
final class ConcurrentWriteException(msg: String)
  extends RuntimeException(msg)

object BucketedMergeSink {

  /** Partition-column name used when WRITING commit dirs (and reserved
    * in inputs); reads resolve leaf dirs and re-derive it only where
    * needed. */
  val bucketCol = "gbucket"

  private val metaFile = "_graft_buckets" // "_" prefix: invisible to Spark's file index
  private val manifestDir = "_graft_manifest"
  private val dataDir = "data"

  /** Layout metadata. `retainVersions` is a LAYOUT property, persisted
    * at creation like `numBuckets`: retention is a promise to READERS
    * (how deep their snapshot isolation reaches), so it cannot depend on
    * whichever writer happens to commit next — a default-parameter
    * writer silently truncating the window to 1 would delete snapshots
    * readVersion callers were promised. Change it explicitly with
    * [[setRetention]]. */
  final case class Meta(
      numBuckets: Int, key: Seq[String], schema: StructType,
      retainVersions: Int = 1)

  /** Deterministic bucket of a row: Murmur3 `hash()` of the key columns
    * mod the bucket count — the same expression at creation and on every
    * later batch, so routing is stable for the life of the target. */
  def bucketExpr(key: Seq[String], numBuckets: Int) =
    bucketOf(key.map(col), numBuckets)

  private def bucketOf(cols: Seq[org.apache.spark.sql.Column], numBuckets: Int) =
    pmod(hash(cols: _*), lit(numBuckets))

  /** True iff `path` is a bucketed target (has layout metadata). */
  def isBucketed(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, metaFile)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // --- metadata: one line per field; the schema travels as StructType
  // JSON (stable across Spark versions, unlike DDL round-trips of
  // exotic types). Column names are base64'd per element so a key
  // column name containing the separator can't corrupt the file.
  private def writeMeta(spark: SparkSession, path: String, meta: Meta): Unit = {
    val p = new Path(path, metaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val enc = java.util.Base64.getEncoder
    val body =
      "layout=2\n" +
        s"numBuckets=${meta.numBuckets}\n" +
        s"retainVersions=${meta.retainVersions}\n" +
        s"key=${meta.key.map(k => enc.encodeToString(k.getBytes(StandardCharsets.UTF_8))).mkString(",")}\n" +
        s"schema=${meta.schema.json}\n"
    val out = fs.create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readMeta(spark: SparkSession, path: String): Meta = {
    val body = readSmallFile(fsOf(spark, path), new Path(path, metaFile))
    val fields = body.linesIterator.filter(_.nonEmpty)
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
    require(fields.getOrElse("layout", "1") == "2",
      s"$path holds a pre-manifest (v1) bucketed layout — recreate the " +
        "target (layouts are rebuilt per run; v1 is not readable by v2)")
    val dec = java.util.Base64.getDecoder
    Meta(
      fields("numBuckets").toInt,
      fields("key") match {
        case "" => Nil
        case s => s.split(",").toSeq
          .map(k => new String(dec.decode(k), StandardCharsets.UTF_8))
      },
      DataType.fromJson(fields("schema")).asInstanceOf[StructType],
      // absent in layouts created before retention was persisted -> the
      // historical default
      fields.get("retainVersions").map(_.toInt).getOrElse(1))
  }

  /** Change the layout's retention window. Takes effect at the NEXT
    * commit (an enlarged window fills as new versions land; a shrunken
    * one trims then). Single-writer contract, like every other write. */
  def setRetention(spark: SparkSession, path: String, retainVersions: Int): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val meta = readMeta(spark, path)
    writeMeta(spark, path, meta.copy(retainVersions = retainVersions))
  }

  /** The retention the layout promises readers at `path`. */
  def retention(spark: SparkSession, path: String): Int =
    readMeta(spark, path).retainVersions

  /** Resolve a caller's `retainVersions` argument against the layout's
    * persisted value: 0 (the default) = the layout's; a positive value
    * must MATCH it — silently honoring a different value would either
    * delete promised snapshots (smaller) or silently change the
    * contract (larger). */
  private def resolveRetention(requested: Int, meta: Meta, path: String): Int = {
    if (requested == 0) meta.retainVersions
    else {
      require(requested == meta.retainVersions,
        s"retainVersions=$requested conflicts with the layout's persisted " +
          s"retention ${meta.retainVersions} at $path — retention is a " +
          "layout property; change it with BucketedMergeSink.setRetention")
      requested
    }
  }

  private def readSmallFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  // ----------------------------------------------------------- manifest

  /** Current bucket -> commit-dir mapping of the target (empty for an
    * empty target) — the introspection surface for tests and tooling. */
  def manifest(spark: SparkSession, path: String): Map[Int, String] =
    readManifest(spark, path)

  /** Absolute path of the live data dir for `bucket`, if it holds rows. */
  def bucketDataDir(spark: SparkSession, path: String, bucket: Int): Option[String] =
    readManifest(spark, path).get(bucket)
      .map(c => leafDir(path, c, bucket).toString)

  /** bucket -> commit-dir name (e.g. 3 -> "c1f2..."), empty for an
    * empty target. */
  private[sink] def readManifest(spark: SparkSession, path: String): Map[Int, String] = {
    val fs = fsOf(spark, path)
    currentManifestFile(fs, path) match {
      case None => Map.empty
      case Some(p) => parseManifest(fs, p)
    }
  }

  private def parseManifest(fs: FileSystem, p: Path): Map[Int, String] =
    readSmallFile(fs, p).linesIterator.filter(_.nonEmpty).map { l =>
      val Array(b, d) = l.split("\t", 2)
      b.toInt -> d
    }.toMap

  private def manifestFiles(fs: FileSystem, path: String): Seq[Path] = {
    val dir = new Path(path, manifestDir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .sorted // v%09d: lexicographic == numeric
      .map(new Path(dir, _))
  }

  private def currentManifestFile(fs: FileSystem, path: String): Option[Path] =
    manifestFiles(fs, path).lastOption

  /** The manifest versions currently retained, oldest first — each one
    * a consistent snapshot readable via [[readVersion]]. */
  def manifestVersions(spark: SparkSession, path: String): Seq[Long] =
    manifestFiles(fsOf(spark, path), path)
      .map(_.getName.stripPrefix("v").toLong)

  /** SNAPSHOT READ of a retained manifest version: the target exactly as
    * the batch that committed `version` left it. With the default layout
    * retention of 1 only the newest version exists; a layout created
    * with `retainVersions = N` keeps the last N snapshots readable — a
    * reader holding a retained version never sees mixed or vanished
    * data, because GC only removes dirs unreferenced by EVERY retained
    * manifest. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = fsOf(spark, path)
    val meta = readMeta(spark, path)
    val p = new Path(new Path(path, manifestDir), f"v$version%09d")
    require(fs.exists(p),
      s"manifest version $version is not retained at $path " +
        s"(have: ${manifestVersions(spark, path).mkString(",")})")
    val mapping = parseManifest(fs, p)
    val dirs = mapping.toSeq.sortBy(_._1)
      .map { case (b, c) => leafDir(path, c, b).toString }
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
    else spark.read.schema(meta.schema).parquet(dirs: _*)
  }

  private def versionOf(p: Path): Long = p.getName.stripPrefix("v").toLong

  /** CDC between two retained snapshots: the row-level changes that take
    * the target from `fromVersion`'s state to `toVersion`'s — the
    * layout's columns plus `_op` (`insert` / `delete` / `update_pre` /
    * `update_post`, [[MergeSink.changeFeed]]'s vocabulary). Consecutive
    * versions yield the feed of the batch that committed `toVersion`;
    * non-consecutive versions yield the NET change (a key upserted then
    * deleted in between emits nothing).
    *
    * Scale design — the reason this lives on the bucketed sink instead
    * of `readVersion(a) FULL OUTER JOIN readVersion(b)`: commit dirs are
    * immutable, so a bucket whose (bucket → commit-dir) manifest entry
    * is IDENTICAL in both versions is byte-identical data and is pruned
    * WITHOUT BEING READ — the diff costs O(buckets the interval
    * touched), not O(target), the same asymmetry the merge itself
    * enjoys. Untouched-bucket non-listing is pinned in PlanSpec. The
    * joined slices shuffle at most those buckets' rows on the key.
    * (A bucket rewritten byte-identically — compaction — is read but
    * emits nothing: the row diff, not the dir diff, is authoritative.)
    *
    * Requires the layout key (plus `extraKey`) to be unique per row in
    * both snapshots — true for upsert/update/delete targets by
    * construction; for SCD2 targets pass the version column
    * (`extraKey = Seq("valid_from")`) so history rows pair up. */
  def changesBetween(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long,
      extraKey: Seq[String] = Nil,
      opCol: String = "_op"): DataFrame = {
    require(fromVersion < toVersion,
      s"changesBetween wants fromVersion < toVersion, got v$fromVersion >= v$toVersion")
    val fs = fsOf(spark, path)
    val meta = readMeta(spark, path)
    require(!meta.schema.fieldNames.contains(opCol),
      s"layout already has a '$opCol' column — pass a different opCol")
    val cols = meta.schema.fieldNames.toSeq
    val mapOf: Long => Map[Int, String] = { v =>
      val p = new Path(new Path(path, manifestDir), f"v$v%09d")
      require(fs.exists(p),
        s"manifest version $v is not retained at $path " +
          s"(have: ${manifestVersions(spark, path).mkString(",")})")
      parseManifest(fs, p)
    }
    val mFrom = mapOf(fromVersion)
    val mTo = mapOf(toVersion)
    // manifest-diff prune: same commit dir ⇒ same bytes ⇒ no changes
    val touched = (mFrom.keySet ++ mTo.keySet).toSeq.sorted
      .filter(b => mFrom.get(b) != mTo.get(b))
    def slice(m: Map[Int, String]): DataFrame = {
      val dirs = touched.flatMap(b => m.get(b).map(c => leafDir(path, c, b).toString))
      if (dirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
      else spark.read.schema(meta.schema).parquet(dirs: _*)
    }
    val k = meta.key ++ extraKey
    val t = slice(mFrom).withColumn("__t", lit(true)).alias("t")
    val b = slice(mTo).withColumn("__b", lit(true)).alias("b")
    def rowOf(op: String, side: String) =
      struct((lit(op).as(opCol) +: cols.map(c => col(s"$side.$c").as(c))): _*)
    def differs = cols.filterNot(k.contains)
      .map(c => !(col(s"t.$c") <=> col(s"b.$c")))
      .foldLeft(lit(false))(_ || _)
    val joined = t.join(b,
      k.map(c => col(s"t.$c") <=> col(s"b.$c")).reduce(_ && _), "full_outer")
    joined.select(explode(
        when(col("__t").isNull, array(rowOf("insert", "b")))
          .when(col("__b").isNull, array(rowOf("delete", "t")))
          .when(differs, array(rowOf("update_pre", "t"), rowOf("update_post", "b")))
          .otherwise(org.apache.spark.sql.functions.slice(
            array(rowOf("insert", "b")), 1, 0))).as("__r"))
      .select((opCol +: cols).map(c => col(s"__r.$c").as(c)): _*)
  }

  /** CDC outbox catch-up: publish, under `feedPath/batch_id=<v>/`, the
    * change feed of every retained manifest version whose partition is
    * not there yet — [[changesBetween]] of each consecutive retained
    * pair, plus the all-inserts bootstrap for version 1 while it is
    * still retained. Returns the versions published this call.
    *
    * Idempotent and crash-safe by construction: partitions are keyed by
    * the DETERMINISTIC manifest version, an existing partition is
    * skipped (never clobbered), and a partial write from a crash is
    * cleaned by the per-dir overwrite on the next catch-up. Run it
    * after every load (the `change_feed:` stage key does) and the
    * outbox never gaps; a consumer reads `feedPath` as plain
    * partitioned parquet and resumes from the last `batch_id` it saw.
    *
    * Needs layout retention >= 1 + the versions committed per run —
    * with too shallow a window a version's predecessor is already GC'd
    * by publish time, so its delta can never be produced; feeds older
    * than the retention window are gone for the same reason
    * (publish-after-every-load with one commit per run and retention 2
    * never hits this; a stage that ALSO runs `delete_where:` or
    * `compact:` commits more versions per run and needs a
    * correspondingly deeper window — the Runner validates exactly
    * that). Cost per publish: O(buckets the batch touched), inherited
    * from [[changesBetween]]'s manifest-diff pruning. `extraKey` as in
    * [[changesBetween]] (SCD2 targets pass their version column).
    *
    * Bootstrap semantics: the FIRST publish into an empty feed emits
    * the oldest retained snapshot as an all-inserts base partition
    * (`batch_id=<oldest retained v>`), whatever that version number is
    * — so a feed added to a target mid-life is self-contained (a
    * consumer replaying it from scratch reconstructs current state),
    * never a baseless delta stream. Once a feed has partitions, a
    * retained version whose partition is missing AND whose predecessor
    * is GC'd is a GAP the feed can never close: the publish REFUSES
    * loudly ([[IllegalStateException]]) instead of silently skipping
    * that batch — raise retain_versions so publish never falls behind,
    * or start a fresh feed dir (whose base will be the current
    * snapshot). */
  def publishChangeFeed(
      spark: SparkSession,
      path: String,
      feedPath: String,
      extraKey: Seq[String] = Nil): Seq[Long] = {
    val fs = fsOf(spark, feedPath)
    val vs = manifestVersions(spark, path)
    def partDir(v: Long) = new Path(feedPath, s"batch_id=$v")
    // idempotence gate is COMMIT SUCCESS, not directory existence: the
    // parquet job creates the dir first and `_SUCCESS` last, so a crash
    // mid-write leaves a dir holding only `_temporary/` or partial part
    // files — skipping on bare existence would mark that torn batch
    // "already published" forever and consumers would half-apply it. A
    // dir WITHOUT `_SUCCESS` is unpublished; the overwrite rewrite
    // cleans its leftovers.
    def publish(v: Long)(feed: => DataFrame): Option[Long] = {
      if (isPublished(fs, partDir(v))) None
      else {
        feed.write.mode("overwrite").parquet(partDir(v).toString)
        Some(v)
      }
    }
    def insertAll(v: Long): DataFrame = {
      val t = readVersion(spark, path, v)
      t.select((lit("insert").as("_op") +: t.columns.toSeq.map(col)): _*)
    }
    val existing: Seq[Long] =
      if (!fs.exists(new Path(feedPath))) Nil
      else fs.listStatus(new Path(feedPath)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).sorted
    val feedStarted = existing.nonEmpty
    // a marked-base OLDEST partition is a [[compactOutbox]] rebase
    // point: every partition at or below it was DELIBERATELY pruned.
    // Publish must respect that floor — the retention window can be
    // deeper than `outbox_keep`, so retained versions below the rebase
    // are normal, not a gap. Resurrecting them (the pre-r13 behavior:
    // the bootstrap re-created a pruned batch 1, the delta loop
    // re-published pruned deltas) re-grew the compacted outbox every
    // run, and once the oldest retained version's own partition was
    // pruned the producer hard-failed with the misleading gap error —
    // reachable from a Runner-valid retention-4/keep-1 config on its
    // sixth run (spec-pinned).
    val rebasedAt: Option[Long] = existing.headOption.filter(b =>
      fs.exists(new Path(partDir(b), baseMarker)))
    val bootstrap =
      if (!feedStarted)
        // empty feed: all-inserts base at the oldest retained version
        // (v1's base and a mid-life base are the same construction);
        // marked _base so a consumer can tell a true base from a
        // hand-pruned prefix ([[subscribeFeed]] refuses the latter).
        // Published via stage-and-rename (writeFeedBase) so the marker
        // travels WITH the data: a direct write-then-mark would leave a
        // crash window where the partition is committed but unmarked —
        // re-publish would skip it ("already published") and every fresh
        // consumer would refuse the feed forever as a pruned prefix.
        vs.headOption.flatMap(v => writeFeedBase(fs, partDir(v)) {
          staged => insertAll(v).write.mode("overwrite").parquet(staged)
        })
      else if (rebasedAt.isEmpty && vs.head == 1L)
        // started, never rebased, v1 retained: batch 1 should exist as
        // the marked base — writeFeedBase is a no-op when it does and
        // heals a hand-pruned or legacy-unmarked one while v1 can still
        // be reconstructed
        writeFeedBase(fs, partDir(1L)) { staged =>
          insertAll(1L).write.mode("overwrite").parquet(staged)
        }
      else if (vs.head > rebasedAt.getOrElse(0L) && !fs.exists(partDir(vs.head)))
        throw new IllegalStateException(
          s"change feed at $feedPath has no partition for v${vs.head}, the " +
            s"oldest retained version of $path, and v${vs.head - 1} is " +
            "GC'd — the feed can never produce that delta and silently " +
            "skipping it would hand consumers an outbox with a missing " +
            "batch. Raise retain_versions so publish never falls behind " +
            "the retention window, or start a fresh feed dir (its base " +
            "will be the then-current snapshot).")
      else None
    // deltas at or below the rebase floor were compacted away — never
    // re-publish them (a compacted outbox must not re-grow)
    val floor = rebasedAt.getOrElse(0L)
    val deltas = vs.sliding(2).flatMap {
      case Seq(a, b) if b > floor =>
        publish(b)(changesBetween(spark, path, a, b, extraKey))
      case _ => None
    }
    (bootstrap.toSeq ++ deltas).sorted
  }

  /** Keep a persisted MinHash band index ([[graft.ops.Dedup.minhashBandIndex]],
    * rows `(id, band, bucket)`) in lockstep with this bucketed target:
    * every retained manifest version the index has not applied yet is
    * replayed as a merge into `indexPath`, signing ONLY that version's
    * delta rows — so after each load the index is current and
    * [[graft.ops.Dedup.incrementalMinhashPairs]] can vet the NEXT ingest
    * without ever re-signing the corpus. Returns the versions applied.
    *
    * Mechanics per version (from [[changesBetween]]'s feed, which costs
    * O(touched buckets)): inserted/updated docs re-sign and UPSERT their
    * postings (key = (id, band) — a doc always carries exactly `bands`
    * rows, so the upsert replaces its whole signature); deleted docs —
    * and docs whose text became null, which sign to nothing — DELETE
    * theirs. A fresh index bootstraps by signing the oldest retained
    * snapshot in full (the one unavoidable corpus pass).
    *
    * Idempotence & crash-safety, same contract as [[publishChangeFeed]]:
    * progress is recorded as `v<NNN>` markers in the SIBLING dir
    * `<indexPath>.applied` AFTER the version's merges land (a sibling
    * because the index dir's contents are manifest-managed — a foreign
    * file inside it would be swept by the layout's own GC; markers of a
    * vanished index are reset on the next sync); a crash in between
    * replays the version, and replaying a merge batch is idempotent. If
    * the index falls more than the retention window behind (its next
    * delta is GC'd), the sync refuses loudly — delete the index dir to
    * rebuild — rather than silently resyncing from a gapped feed.
    * Sync-after-every-load (the `minhash_index:` stage key) never hits
    * this with retention >= 2.
    *
    * The index is itself a [[BucketedMergeSink]] layout, keyed on `id`
    * and bucketed like its target, holding ONE nested row per doc
    * (`id, postings: array<struct<band,bucket>>`, read back flat via
    * [[readPostings]]) — so each sync rewrites O(touched buckets) of
    * postings, an upsert replaces a doc's whole signature atomically,
    * and a delete prunes to the doc's own bucket. A flat posting-per-row
    * index would pay a full-index rewrite on EVERY sync (the flat
    * sink's atomic-swap shape), which dominates at corpus scale. */
  def syncMinhashIndex(
      spark: SparkSession,
      path: String,
      indexPath: String,
      textCol: String = "text",
      k: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      charGrams: Boolean = false): Seq[Long] =
    syncIndexCore(spark, path, indexPath, "minhash index", textCol,
      bootstrap = (df, id) => graft.ops.Dedup.minhashBandIndex(
        df, k, bands, rowsPerBand, id, textCol, charGrams),
      sign = (df, id) => graft.ops.Dedup.minhashBandIndex(
        df, k, bands, rowsPerBand, id, textCol, charGrams))

  /** [[syncMinhashIndex]]'s embedding twin: keep a persisted cosine-LSH
    * bucket index ([[graft.ops.Similarity.lshBucketIndex]], rows
    * `(id, band, bucket)` — band is the hyperplane table, bucket its
    * sign signature) in lockstep with this bucketed target, so
    * [[graft.ops.Similarity.incrementalCosineDupPairs]] can vet each
    * ingest without re-signing the corpus. Same replay core, same
    * marker/bootstrap/refusal contract, same nested one-row-per-id
    * layout (read back flat via [[readPostings]]); (tables, bits, dim)
    * are the index's identity and must match the probe side's. A
    * re-sign UPSERT replaces a doc's whole signature row; a null
    * `vecCol` unsigns. */
  def syncLshIndex(
      spark: SparkSession,
      path: String,
      indexPath: String,
      vecCol: String = "embedding",
      tables: Int = 8,
      bits: Int = 12,
      dim: Int = 64): Seq[Long] =
    syncIndexCore(spark, path, indexPath, "lsh index", vecCol,
      bootstrap = (df, id) => graft.ops.Similarity.lshBucketIndex(
        df, tables, bits, dim, id, vecCol),
      sign = (df, id) => graft.ops.Similarity.lshBucketIndex(
        df, tables, bits, dim, id, vecCol))

  /** [[syncMinhashIndex]]'s SemDeDup twin: keep a persisted semantic
    * cell index ([[graft.ops.Similarity.semanticCellIndex]]) in
    * lockstep with this bucketed target, so
    * [[graft.ops.Similarity.incrementalSemanticDupPairs]] can vet each
    * ingest against frozen centroids. Two persisted pieces: postings
    * `(id, pcell)` at `indexPath`, and the centroid model at the
    * SIBLING `<indexPath>.centroids` (`(cell, centv)` parquet).
    * Centroids are TRAINED ONCE at bootstrap on the oldest retained
    * snapshot and FROZEN from then on — the coarse-quantizer contract
    * ([[graft.ops.Similarity.ivfTopK]]): per-ingest retraining would
    * silently shift every assignment; re-cluster offline when drift
    * warrants and rebuild (delete the index dir — bootstrap retrains
    * and overwrites the sibling). Unlike the fixed-cardinality MinHash/
    * LSH signatures, an updated doc's cell SET can change arbitrarily —
    * harmless under the nested layout, where the re-sign UPSERT
    * replaces the doc's whole posting row (old cells can't linger).
    * The bootstrap snapshot must be non-empty (there is nothing to
    * train on otherwise). */
  def syncSemanticIndex(
      spark: SparkSession,
      path: String,
      indexPath: String,
      vecCol: String = "embedding",
      nlist: Int = 0,
      iters: Int = 3,
      trainPerCell: Int = 256,
      // 0 = AUTO (Similarity.resolveProbes): the SAME default the
      // query-side entry points resolve, so an index built and queried
      // on defaults has one probe width on both sides of the index join
      probeCells: Int = 0): Seq[Long] = {
    val centsPath = indexPath.stripSuffix("/") + ".centroids"
    syncIndexCore(spark, path, indexPath, "semantic index", vecCol,
      bootstrap = (df, id) => {
        val (postings, cents) = graft.ops.Similarity.semanticCellIndex(
          df, nlist, iters, trainPerCell, probeCells, id, vecCol)
        cents.write.mode("overwrite").parquet(centsPath)
        postings
      },
      sign = (df, id) => {
        require(fsOf(spark, centsPath).exists(new Path(centsPath)),
          s"semantic index at $indexPath has no centroid model at " +
            s"$centsPath — rebuild the index (delete its dir) to retrain")
        graft.ops.Similarity.assignBatchCells(
          df, spark.read.parquet(centsPath), probeCells, id, vecCol)
      })
  }

  /** The shared version-marker replay core behind [[syncMinhashIndex]] /
    * [[syncLshIndex]] / [[syncSemanticIndex]] — everything about
    * KEEPING a derived postings index in lockstep with the target that
    * does not depend on what the postings ARE:
    *
    *   - `.applied` sibling markers record the last manifest version
    *     replayed into the index (a sibling because a flat index
    *     target's atomic full-rewrite swap would wipe anything stored
    *     inside it); markers of a vanished index reset on the next
    *     sync. Only the NEWEST marker is ever consulted, so older ones
    *     are pruned as each new one lands — the dir stays O(1) files
    *     instead of one empty file per version forever (the r11 ADVICE
    *     listing-degradation finding).
    *   - a fresh index bootstraps by signing the oldest retained
    *     snapshot in full (the one unavoidable corpus pass), via the
    *     family's `bootstrap` closure (which may also train/persist a
    *     model — the semantic family does).
    *   - each later retained version replays as [[changesBetween]]'s
    *     delta: ids whose op is delete — or update_post with a null
    *     `signCol`, which sign to nothing — DELETE their postings;
    *     inserted/updated rows re-sign through the family's `sign`
    *     closure and UPSERT on `mergeKey`. With `replaceOnUpdate` an
    *     updated id's old postings are deleted FIRST (families whose
    *     per-id posting KEY SET can change between signings — the
    *     semantic cells — would otherwise strand stale rows; the
    *     fixed-cardinality families skip the extra delete pass).
    *   - idempotence & crash-safety, same contract as
    *     [[publishChangeFeed]]: markers land AFTER the version's merges,
    *     a crash in between replays the version, and replaying a merge
    *     batch is idempotent. An index that fell more than the
    *     retention window behind refuses loudly rather than silently
    *     resyncing from a gapped feed — and the Runner's
    *     catch-up-BEFORE-load ordering plus its retention validation
    *     (>= 1 + versions committed per run) keep the config-driven
    *     paths from ever manufacturing that state. */
  private def syncIndexCore(
      spark: SparkSession,
      path: String,
      indexPath: String,
      family: String,
      signCol: String,
      bootstrap: (DataFrame, String) => DataFrame,
      sign: (DataFrame, String) => DataFrame): Seq[Long] = {
    val fs = fsOf(spark, indexPath)
    val meta = readMeta(spark, path)
    require(meta.key.size == 1,
      s"$family sync needs a single-column layout key, $path has ${meta.key}")
    val idCol = meta.key.head
    require(meta.schema.fieldNames.contains(signCol),
      s"$path has no '$signCol' column to sign")
    // The index is itself a bucketed layout keyed on `id`, sized like
    // its target, holding one NESTED row per doc: the family's flat
    // postings collapse to `postings: array<struct>`. That single-row
    // shape is what keeps every sync leg bucket-pruned — the upsert
    // replaces a doc's complete posting set atomically (no stale rows
    // can linger when a posting KEY SET changes, e.g. semantic cells),
    // and the delete leg's id-list prunes to the ids' own buckets.
    def nest(flat: DataFrame): DataFrame = {
      val pcols = flat.columns.filterNot(_ == "id").toSeq
      flat.groupBy("id").agg(
        // sort for a deterministic array order — replaying a version
        // must produce byte-identical posting rows
        sort_array(collect_list(struct(pcols.map(col): _*))).as("postings"))
    }
    def put(flat: DataFrame): Unit =
      merge(spark, nest(flat), indexPath, "upsert", key = Seq("id"),
        identifier = "id", numBuckets = meta.numBuckets)
    val vs = manifestVersions(spark, path)
    val appliedDir = new Path(indexPath.stripSuffix("/") + ".applied")
    // markers without an index = a rebuilt/deleted index; start fresh
    if (fs.exists(appliedDir) && !fs.exists(new Path(indexPath)))
      fs.delete(appliedDir, true)
    def mark(v: Long): Unit = markApplied(fs, appliedDir, v)
    val done = scala.collection.mutable.ArrayBuffer.empty[Long]
    var last = lastApplied(fs, appliedDir)
    if (last == 0L) {
      val v0 = vs.head
      put(bootstrap(readVersion(spark, path, v0), idCol))
      mark(v0); done += v0; last = v0
    }
    require(last >= vs.head,
      s"$family at $indexPath last applied v$last but the oldest " +
        s"retained version of $path is v${vs.head}: the intermediate " +
        "deltas are GC'd. Rebuild the index (delete its dir) or raise " +
        "retain_versions so sync never falls behind the window.")
    for (Seq(a, b) <- vs.sliding(2) if a >= last && b > last) {
      val delta = changesBetween(spark, path, a, b)
      // unsign deleted ids and ids whose sign column became null (they
      // sign to nothing); an id updated to a NEW signature needs no
      // delete — the nested upsert below replaces its whole posting row
      val unsign = delta.filter(col("_op") === "delete" ||
          (col("_op") === "update_post" && col(signCol).isNull))
        .select(col(idCol).as("id")).distinct()
      if (!unsign.isEmpty)
        merge(spark, unsign, indexPath, "delete", identifier = "id")
      val resign = delta.filter(
        col("_op").isin("insert", "update_post") && col(signCol).isNotNull)
      if (!resign.isEmpty) put(sign(resign, idCol))
      mark(b); done += b
    }
    done.toSeq
  }

  /** Last `v<NNN>` progress marker in a sibling `.applied` dir (0 =
    * none) — shared by the index syncs and [[subscribeFeed]]. */
  private def lastApplied(fs: FileSystem, appliedDir: Path): Long =
    if (fs.exists(appliedDir))
      fs.listStatus(appliedDir).toSeq
        .map(_.getPath.getName.stripPrefix("v").toLong)
        .sorted.lastOption.getOrElse(0L)
    else 0L

  /** Record progress marker `v` and prune superseded ones. Pruning is
    * create-THEN-delete: a crash in between leaves extra markers
    * (harmless — max still wins), never zero. */
  private def markApplied(fs: FileSystem, appliedDir: Path, v: Long): Unit = {
    fs.create(new Path(appliedDir, f"v$v%09d"), true).close() // replay-safe
    fs.listStatus(appliedDir).map(_.getPath)
      .filter(p => p.getName.stripPrefix("v").toLong < v)
      .foreach(p => fs.delete(p, false))
  }

  /** The flat `(id, <posting fields>)` view of a postings index
    * maintained by [[syncMinhashIndex]] / [[syncLshIndex]] /
    * [[syncSemanticIndex]] — explodes the layout's nested one-row-per-id
    * shape back into the posting-per-row frame the probe operators
    * ([[graft.ops.Dedup.incrementalMinhashPairs]] and friends) take.
    * Stays a narrow generate over the manifest-resolved scan: no
    * shuffle, and bucket/column pruning still reach the parquet leaves. */
  def readPostings(spark: SparkSession, indexPath: String): DataFrame = {
    val nested = read(spark, indexPath)
    val elem = nested.schema("postings").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[StructType]
    nested.select(col("id"), explode(col("postings")).as("p"))
      .select(col("id") +: elem.fieldNames.toSeq.map(n => col("p." + n).as(n)): _*)
  }

  /** The CONSUMER side of the CDC outbox at the TABLE level: apply every
    * not-yet-applied `batch_id=<N>` partition of the outbox at
    * `feedPath` ([[publishChangeFeed]]'s layout) to the replica target
    * at `replicaPath`, in batch order — downstream replication as one
    * idempotent catch-up call, the same contract shape as the index
    * syncs. Returns the batch ids applied.
    *
    * Per batch: `insert`/`update_post` rows UPSERT (their key's old row
    * is replaced — `update_pre` rows carry no extra information and are
    * skipped), `delete` rows delete by key. Net-change feeds give each
    * key at most one op per batch, so the two merges commute. Against a
    * bucketed replica both legs cost O(touched buckets); a fresh
    * replica's first application is the outbox's base partition (which
    * [[publishChangeFeed]] guarantees is a self-contained all-inserts
    * snapshot), establishing the layout with `numBuckets`.
    *
    * Progress lives in the sibling marker dir `<replicaPath>.applied`
    * (markers of a vanished replica reset on the next call); markers
    * land AFTER a batch's merges, so a crash in between replays the
    * batch — idempotent, like the index syncs. An outbox whose oldest
    * retained partition has moved past the replica's cursor (someone
    * pruned the outbox) refuses loudly: the missing deltas are
    * unreconstructable, rebuild the replica. SCD2 outboxes pair rows on
    * (key, valid_from) — pass that composite `key`; composite keys are
    * fine for the upsert leg, and scd2 feeds never carry deletes.
    *
    * A partition WITHOUT `_SUCCESS` is a publish still in flight (or a
    * producer crash's torn leftover): the catch-up STOPS there without
    * marking — applying whatever part files happen to be visible would
    * commit a half-batch and advance the cursor past it, permanent
    * silent divergence. The next call picks up where the producer's
    * rewrite left a committed partition; this is what makes the
    * [[graft.streaming.Streams.subscribeFeedStream]] daemon safe to run
    * concurrently with its producer.
    *
    * `consumerName`, when non-empty, REGISTERS this replica with the
    * outbox: its cursor is mirrored to `<feedPath>.consumers/<name>`
    * (after the replica's own marker, so the mirror can only lag —
    * conservative), and [[compactOutboxKeep]] clamps its rebase point to
    * the laggiest registered cursor + 1, so a registered consumer can
    * never be rebased past and forced into a rebuild. Unregistered
    * consumers keep the unclamped contract: size `outbox_keep` above
    * their worst lag yourself. */
  def subscribeFeed(
      spark: SparkSession,
      feedPath: String,
      replicaPath: String,
      key: Seq[String] = Seq("id"),
      numBuckets: Int = 64,
      retainVersions: Int = 0,
      upTo: Long = Long.MaxValue,
      consumerName: String = ""): Seq[Long] = {
    val feedFs = fsOf(spark, feedPath)
    require(feedFs.exists(new Path(feedPath)),
      s"no outbox at $feedPath — publish a change feed there first")
    val batches = feedFs.listStatus(new Path(feedPath)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted
    require(batches.nonEmpty, s"outbox at $feedPath has no batch partitions")
    require(batches.head >= 1,
      s"outbox at $feedPath starts at batch_id=${batches.head} — " +
        "subscribeFeed consumes the shared outbox layout (batch ids " +
        ">= 1: publishChangeFeed's manifest versions, or " +
        "streamingMergeWithFeed's base-at-1 + epoch+2 deltas); a " +
        "0-based feed is a pre-unification streaming layout — restart " +
        "it into a fresh feed dir")
    require(batches == (batches.head to batches.last),
      s"outbox at $feedPath has gaps in its batch ids " +
        s"(${batches.mkString(",")}) — a pruned outbox cannot be replayed")
    val fs = fsOf(spark, replicaPath)
    val appliedDir = new Path(replicaPath.stripSuffix("/") + ".applied")
    // markers without a replica = a rebuilt/deleted replica; start fresh
    if (fs.exists(appliedDir) && !fs.exists(new Path(replicaPath)))
      fs.delete(appliedDir, true)
    val last = lastApplied(fs, appliedDir)
    require(last == 0L || last >= batches.head - 1,
      s"replica at $replicaPath last applied batch $last but the " +
        s"outbox's oldest partition is batch ${batches.head}: the " +
        "intermediate deltas were pruned and cannot be replayed. " +
        "Rebuild the replica (delete it and its .applied dir).")
    // a FRESH consumer needs the oldest partition to be a base — batch 1
    // (delta from empty) or a marked all-inserts snapshot. A consecutive
    // run of deltas whose base was hand-pruned outside compactOutbox
    // would replay into a silently incomplete replica.
    require(last != 0L || batches.head == 1L ||
        feedFs.exists(new Path(
          new Path(feedPath, s"batch_id=${batches.head}"), baseMarker)),
      s"outbox at $feedPath has no base: its oldest partition " +
        s"(batch ${batches.head}) is an unmarked delta — the base was " +
        "pruned outside compactOutbox. Rebase the outbox (compactOutbox) " +
        "or start a fresh feed before subscribing new replicas.")
    val done = scala.collection.mutable.ArrayBuffer.empty[Long]
    def applyBatch(b: Long): Unit = {
      val partDir = new Path(feedPath, s"batch_id=$b")
      // an EMPTY delta (a compact's no-op diff) may have been written
      // with zero part files — only _SUCCESS — and a parquet read of
      // that dir fails schema inference; it applies as a no-op
      val hasData = feedFs.listStatus(partDir).exists(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      if (!hasData) return
      val part = spark.read.parquet(partDir.toString)
      if (feedFs.exists(new Path(partDir, baseMarker)) &&
          fs.exists(new Path(replicaPath))) {
        // a REBASED partition ([[compactOutbox]]): its all-inserts rows
        // are a full snapshot, not a delta — replace the replica
        // wholesale. Upserting into the existing replica would strand
        // rows deleted between this consumer's cursor and the rebase
        // point (their delete ops were pruned with the old partitions).
        val rows = part.filter(col("_op") === "insert").drop("_op")
        fs.delete(new Path(replicaPath), true)
        merge(spark, rows, replicaPath, "upsert", key = key,
          identifier = key.head, numBuckets = numBuckets,
          retainVersions = retainVersions)
        return
      }
      val dels = part.filter(col("_op") === "delete")
        .select(col(key.head)).distinct()
      val ups = part.filter(col("_op").isin("insert", "update_post"))
        .drop("_op")
      if (!dels.isEmpty) {
        require(key.size == 1,
          s"outbox at $feedPath carries delete ops in batch $b but the " +
            s"replica key is composite (${key.mkString(",")}) — deletes " +
            "route by a single identifier column")
        merge(spark, dels, replicaPath, "delete", identifier = key.head,
          numBuckets = numBuckets, retainVersions = retainVersions)
      }
      if (!ups.isEmpty)
        merge(spark, ups, replicaPath, "upsert", key = key,
          identifier = key.head, numBuckets = numBuckets,
          retainVersions = retainVersions)
    }
    // stop (don't skip) at the first unpublished partition: batches are
    // ordered deltas, so applying past a torn one would replay history
    // out of order even after the producer repairs it
    val pending = batches.filter(b => b > last && b <= upTo)
      .takeWhile(b => isPublished(feedFs, new Path(feedPath, s"batch_id=$b")))
    for (b <- pending) {
      applyBatch(b)
      markApplied(fs, appliedDir, b)
      if (consumerName.nonEmpty)
        markApplied(feedFs,
          new Path(consumersDir(feedPath), consumerName), b)
      done += b
    }
    done.toSeq
  }

  /** Marker file inside a rebased outbox partition: its rows are a full
    * all-inserts SNAPSHOT ([[compactOutbox]]), not a delta. Underscore
    * prefix keeps parquet readers from treating it as data. */
  private val baseMarker = "_base"

  /** A feed partition counts as PUBLISHED only once the parquet job's
    * `_SUCCESS` commit marker exists — the dir itself appears first and
    * the marker last, so bare existence spans the whole crash window. An
    * empty delta (a compact's no-op diff) is published too: it has
    * `_SUCCESS` and zero part files. */
  private def isPublished(fs: FileSystem, partDir: Path): Boolean =
    fs.exists(new Path(partDir, "_SUCCESS"))

  /** Sibling dir holding one cursor-marker dir per REGISTERED consumer
    * of the outbox at `feedPath` ([[subscribeFeed]]'s `consumerName`) —
    * a sibling, not a subdir, so plain partitioned-parquet readers of
    * the outbox never see it. */
  private def consumersDir(feedPath: String): Path =
    new Path(feedPath.stripSuffix("/") + ".consumers")

  /** Deregister a consumer from the outbox at `feedPath`: drop its
    * cursor marker so [[compactOutboxKeep]] stops clamping the rebase to
    * it. The operational release valve for the registration contract — a
    * replica that is decommissioned (or dead and not coming back) would
    * otherwise hold log-compaction back FOREVER and the outbox would
    * grow one partition per version, unbounded. Deliberately explicit
    * rather than a staleness timeout: only an operator knows whether a
    * silent consumer is gone or just slow, and guessing wrong rebases a
    * live replica into a forced rebuild. Idempotent; returns whether a
    * registration existed. The replica's own `.applied` cursor is
    * untouched — re-registering later (its next `subscribeFeed` with the
    * same `consumerName`) resumes from wherever it actually is, subject
    * to the normal pruned-outbox refusal. */
  def unregisterConsumer(
      spark: SparkSession, feedPath: String, name: String): Boolean = {
    require(name.nonEmpty, "unregisterConsumer needs a consumer name")
    val fs = fsOf(spark, feedPath)
    fs.delete(new Path(consumersDir(feedPath), name), true)
  }

  /** Publish an all-inserts BASE partition atomically: write into a
    * staged sibling dir (`writeStaged` receives its path), stamp the
    * [[baseMarker]] there, then rename over `partDir` — partition
    * existence thus implies a complete, marked base; there is no
    * committed-but-unmarked crash window. A staged dir whose marker
    * exists is a finished stage from a crashed run (marker is written
    * last): the swap is completed without rewriting. Returns the batch
    * id published, or None when the partition is already a marked,
    * committed base (idempotent catch-up). Shared by
    * [[publishChangeFeed]]'s bootstrap and the streaming producer's
    * ([[graft.streaming.Streams.streamingMergeWithFeed]]). */
  private[graft] def writeFeedBase(fs: FileSystem, partDir: Path)(
      writeStaged: String => Unit): Option[Long] = {
    if (isPublished(fs, partDir) && fs.exists(new Path(partDir, baseMarker)))
      None
    else {
      val staged = new Path(partDir.getParent, "." + partDir.getName + ".base-stage")
      if (!fs.exists(new Path(staged, baseMarker))) {
        writeStaged(staged.toString) // mode("overwrite") cleans torn stages
        fs.create(new Path(staged, baseMarker), true).close()
      }
      fs.delete(partDir, true) // a torn direct write's leftovers, if any
      require(fs.rename(staged, partDir),
        s"base publish failed: could not rename $staged over $partDir")
      Some(partDir.getName.stripPrefix("batch_id=").toLong)
    }
  }

  /** Log-compaction for the CDC outbox ([[publishChangeFeed]]'s layout):
    * REBASE the outbox at batch `upTo` — replace that partition with an
    * all-inserts snapshot of the state as of `upTo` (marked with
    * [[baseMarker]]) and prune every older partition. Bounds the
    * outbox's growth (one partition per target version forever
    * otherwise) the way a log-compacted topic does: history before the
    * rebase point collapses into one snapshot. Returns the pruned ids.
    *
    * Consumer contract afterwards ([[subscribeFeed]]):
    *   - cursor >= upTo: untouched — only delta partitions > upTo apply.
    *   - cursor == upTo - 1, or a fresh replica: the marked base applies
    *     as a FULL REPLACEMENT (deletes collapsed into the snapshot
    *     cannot be missed).
    *   - cursor < upTo - 1: refused loudly (the pruned deltas are
    *     unreconstructable) — pick `upTo` no newer than your laggiest
    *     consumer's cursor + 1.
    *
    * The snapshot is folded through the consumer machinery itself (a
    * scratch replica under `<feedPath>.rebase-tmp`), so base semantics
    * can never drift from apply semantics. Single-writer like the
    * producer side; a crash mid-rebase leaves either the old layout
    * (re-run) or a visible gap that consumers refuse loudly — never a
    * silently wrong feed. */
  def compactOutbox(
      spark: SparkSession,
      feedPath: String,
      upTo: Long,
      key: Seq[String] = Seq("id"),
      numBuckets: Int = 16): Seq[Long] = {
    val fs = fsOf(spark, feedPath)
    // heal a crash between the swap's delete and rename: the staged base
    // is complete (marker written last), finish the rename and continue
    val stagedPrev = new Path(feedPath, s".rebase-part-$upTo")
    if (fs.exists(stagedPrev) &&
        fs.exists(new Path(stagedPrev, baseMarker)) &&
        !fs.exists(new Path(feedPath, s"batch_id=$upTo")))
      require(fs.rename(stagedPrev, new Path(feedPath, s"batch_id=$upTo")),
        s"rebase heal failed: could not rename $stagedPrev")
    val batches = fs.listStatus(new Path(feedPath)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted
    require(batches.contains(upTo),
      s"outbox at $feedPath has no batch $upTo (batches: ${batches.mkString(",")})")
    val prune = batches.filter(_ < upTo)
    val partDir = new Path(feedPath, s"batch_id=$upTo")
    if (prune.isEmpty && fs.exists(new Path(partDir, baseMarker)))
      return Nil // already rebased here
    // fold state-as-of-upTo through subscribeFeed itself
    val tmp = feedPath.stripSuffix("/") + ".rebase-tmp"
    fs.delete(new Path(tmp), true)
    fs.delete(new Path(tmp + ".applied"), true)
    val folded = subscribeFeed(spark, feedPath, tmp, key, numBuckets, upTo = upTo)
    // the fold STOPS at an unpublished (torn) partition; rebasing there
    // would stamp a partial state as a full base — refuse instead
    require(folded.lastOption.contains(upTo),
      s"outbox at $feedPath has an unpublished partition at or below " +
        s"batch $upTo (a producer publish crashed or is in flight) — " +
        "run the producer's catch-up to repair it before compacting")
    val state = read(spark, tmp)
    val base = state.select(
      (lit("insert").as("_op") +: state.columns.toSeq.map(col)): _*)
    // stage the base OUTSIDE the partition, then swap: a consumer must
    // never observe a half-written base without its marker
    val staged = new Path(feedPath, s".rebase-part-$upTo")
    fs.delete(staged, true)
    base.write.mode("overwrite").parquet(staged.toString)
    fs.create(new Path(staged, baseMarker), true).close()
    fs.delete(partDir, true)
    require(fs.rename(staged, partDir),
      s"rebase swap failed: could not rename $staged over $partDir")
    prune.foreach(b => fs.delete(new Path(feedPath, s"batch_id=$b"), true))
    fs.delete(new Path(tmp), true)
    fs.delete(new Path(tmp + ".applied"), true)
    prune
  }

  /** [[compactOutbox]] by RETENTION COUNT: keep only the newest `keep`
    * batch partitions, rebasing at the oldest survivor. No-op while the
    * outbox holds `keep` or fewer. The policy knob behind the
    * `outbox_keep:` stage key.
    *
    * REGISTERED consumers ([[subscribeFeed]]'s `consumerName`) hold the
    * rebase back: the rebase point is clamped to the laggiest registered
    * cursor + 1, so a registered replica that fell behind keeps its
    * continuity (the outbox temporarily holds more than `keep`
    * partitions instead — compaction catches up once the consumer
    * does). UNREGISTERED consumers keep the unclamped contract: size
    * `keep` above their worst lag (one more than `keep - 1` batches
    * behind the head refuses loudly on its next catch-up). */
  def compactOutboxKeep(
      spark: SparkSession,
      feedPath: String,
      keep: Int,
      key: Seq[String] = Seq("id"),
      numBuckets: Int = 16): Seq[Long] = {
    require(keep >= 1, s"outbox_keep must be >= 1, got $keep")
    val fs = fsOf(spark, feedPath)
    if (!fs.exists(new Path(feedPath))) return Nil
    val batches = fs.listStatus(new Path(feedPath)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted
    if (batches.size <= keep) return Nil
    val requested = batches(batches.size - keep)
    // clamp to the laggiest REGISTERED consumer's cursor + 1 (a consumer
    // at cursor c can still apply the rebased base at c + 1); a cursor
    // already rebased past (registered late) clamps to the current head
    val cDir = consumersDir(feedPath)
    val laggiest: Option[Long] =
      if (!fs.exists(cDir)) None
      else fs.listStatus(cDir).toSeq.filter(_.isDirectory)
        .map(s => lastApplied(fs, s.getPath)).minOption
    val rebaseAt = laggiest.fold(requested)(c =>
      math.max(batches.head, math.min(requested, c + 1)))
    if (rebaseAt <= batches.head) Nil // nothing older to prune
    else compactOutbox(spark, feedPath, rebaseAt, key, numBuckets)
  }

  /** Test seam for the concurrent-writer spec: invoked between a
    * merge/compact's last read of the manifest and its commit attempt,
    * so BucketedMergeSinkSpec can interleave a competing writer's commit
    * at the exact moment a real race would land it. Production value is
    * a no-op. */
  private[graft] var interleaveBeforeCommit: () => Unit = () => ()

  /** Publish `mapping` as the next manifest version — the OPTIMISTIC
    * COMMIT point of the single-writer contract (see the object scaladoc
    * "Concurrent writers").
    *
    * `expectedBase` is the manifest version this batch's reads were
    * resolved against. Detection is two-layered:
    *   1. if the current version has advanced past `expectedBase`,
    *      another writer committed while this batch was being written —
    *      its merge output is stale (computed against superseded bucket
    *      contents) and publishing it would silently drop the other
    *      writer's batch (lost update). Fail with
    *      [[ConcurrentWriteException]] BEFORE creating anything.
    *   2. the `create(overwrite = false)` of `v(expectedBase+1)` is the
    *      atomic tie-break for two writers that BOTH passed check 1: the
    *      filesystem admits exactly one creator; the loser's
    *      already-exists failure is rethrown as the same retryable
    *      [[ConcurrentWriteException]].
    * Either way the losing batch publishes NOTHING (its data dir stays
    * an invisible orphan, removed by the caller and by the next write's
    * GC) and the winning batch is untouched.
    *
    * Afterwards only the newest `retain` versions are kept: superseded
    * manifests beyond the retention window point at dirs the GC may
    * remove, so leaving them listed would trade "old snapshot" for
    * "failing snapshot". */
  private def commitManifest(
      fs: FileSystem, path: String, mapping: Map[Int, String], retain: Int,
      expectedBase: Long): Unit = {
    interleaveBeforeCommit()
    val dir = new Path(path, manifestDir)
    val current = currentManifestFile(fs, path).map(versionOf).getOrElse(0L)
    if (current != expectedBase)
      throw new ConcurrentWriteException(
        s"manifest at $path advanced v$expectedBase -> v$current while this " +
          "batch was being written: another writer committed first. This " +
          "batch was NOT published (no partial state is visible). The " +
          "target is single-writer; retry the merge — it will re-read the " +
          "new state and re-merge.")
    val p = new Path(dir, f"v${expectedBase + 1}%09d")
    val body = mapping.toSeq.sorted
      .map { case (b, d) => s"$b\t$d" }.mkString("", "\n", "\n")
    // atomic commit: the fs admits exactly one creator of this version
    val out =
      try fs.create(p, false)
      catch { case e: java.io.IOException if fs.exists(p) =>
        throw new ConcurrentWriteException(
          s"lost the commit race for v${expectedBase + 1} at $path: another " +
            "writer created it first. This batch was NOT published; the " +
            s"target is single-writer — retry the merge. (${e.getMessage})")
      }
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val files = manifestFiles(fs, path)
    files.dropRight(math.max(1, retain)).foreach(fs.delete(_, false))
  }

  /** Remove data dirs not referenced by ANY retained manifest: leftovers
    * of a crash between data write and manifest commit, and bucket dirs
    * superseded past the retention window. Runs at the START of each
    * write (so a crashed batch's orphans die on replay) and after each
    * commit (so superseded data doesn't accumulate). Single-writer
    * contract. */
  private def gcUnreferenced(fs: FileSystem, path: String): Unit = {
    val dd = new Path(path, dataDir)
    if (!fs.exists(dd)) return
    val retained: Seq[Map[Int, String]] =
      manifestFiles(fs, path).map(p => parseManifest(fs, p))
    val live: Map[String, Set[Int]] = retained
      .flatMap(_.toSeq)
      .groupBy(_._2).map { case (d, m) => d -> m.map(_._1).toSet }
    fs.listStatus(dd).toSeq.filter(_.isDirectory).foreach { c =>
      val name = c.getPath.getName
      live.get(name) match {
        case None => fs.delete(c.getPath, true) // whole commit superseded/orphaned
        case Some(liveBuckets) =>
          fs.listStatus(c.getPath).toSeq.filter(_.isDirectory)
            .filter(_.getPath.getName.startsWith(bucketCol + "="))
            .filterNot(s => liveBuckets.contains(
              s.getPath.getName.stripPrefix(bucketCol + "=").toInt))
            .foreach(s => fs.delete(s.getPath, true))
      }
    }
  }

  private def leafDir(path: String, commit: String, bucket: Int): Path =
    new Path(new Path(new Path(path, dataDir), commit), s"$bucketCol=$bucket")

  // --------------------------------------------------------------- read

  /** The whole target as a DataFrame in its logical schema (no bucket
    * column). An empty target still has a schema — it is part of the
    * layout metadata. */
  def read(spark: SparkSession, path: String): DataFrame =
    readBuckets(spark, path, readManifest(spark, path).keys.toSeq)

  /** The given buckets of the target, resolved through the manifest into
    * explicit leaf dirs — untouched buckets are never even listed
    * (path-level pruning; pinned in BucketedMergeSinkSpec). */
  def readBuckets(spark: SparkSession, path: String, buckets: Seq[Int]): DataFrame = {
    val meta = readMeta(spark, path)
    val mapping = readManifest(spark, path)
    val dirs = buckets.distinct.sorted.flatMap(b =>
      mapping.get(b).map(c => leafDir(path, c, b).toString))
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
    else spark.read.schema(meta.schema).parquet(dirs: _*)
  }

  /** Point-lookup / keyed read: prune to the buckets the given key rows
    * hash to — the read-side twin of the write-side pruning. `keys` must
    * carry the layout's key columns (values are cast to the target
    * types before hashing, same as the merge's routing); the distinct
    * bucket set is ≤ numBuckets, so the collect is driver-safe. */
  def readForKeys(spark: SparkSession, path: String, keys: DataFrame): DataFrame = {
    val meta = readMeta(spark, path)
    val tType = meta.schema.fields.map(f => f.name -> f.dataType).toMap
    meta.key.foreach(k => require(keys.columns.contains(k),
      s"keyed read needs layout key column '$k' (got ${keys.columns.mkString(",")})"))
    val routeExprs = meta.key.map(k => col(k).cast(tType(k)))
    val buckets = keys
      .select(bucketOf(routeExprs, meta.numBuckets).as(bucketCol))
      .distinct().collect().map(_.getInt(0)).toSeq
    readBuckets(spark, path, buckets)
  }

  // -------------------------------------------------------------- merge

  /** Merge `batch` into the bucketed target at `path`, creating the
    * layout on first use. Same semantics as
    * [[MergeSink.mergeIntoParquet]] (it routes through the same
    * upsert/update/delete), different physical cost: only the buckets
    * the batch's keys hash to are read and rewritten, and the batch
    * becomes visible atomically at the manifest commit.
    *
    * `numBuckets` is only consulted at creation; later calls read it
    * from the layout metadata. Upsert/update must use the layout's key
    * (rows are ROUTED by it — merging on a different key would compare
    * rows across bucket boundaries that were never co-located). Delete
    * may use any `identifier`: when it differs from the layout key the
    * delete cannot prune and touches every bucket, which is still
    * correct, just full-cost. */
  def merge(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      loadType: String,
      key: Seq[String] = Seq("id"),
      identifier: String = "id",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 64,
      retainVersions: Int = 0,
      scd2Ts: String = ""): Unit = {
    require(Set("upsert", "update", "delete", "scd2")(loadType),
      s"unknown load type: $loadType")
    require(loadType != "scd2" || scd2Ts.nonEmpty,
      "scd2 load needs an explicit batch timestamp (scd2_ts) — version " +
        "bounds must be deterministic, never wall-clock")
    require(retainVersions >= 0,
      s"retainVersions must be >= 0 (0 = the layout's persisted value), got $retainVersions")
    require(!batch.columns.contains(bucketCol),
      s"'$bucketCol' is the reserved bucket column of the layout — rename it in the batch")
    val fs = fsOf(spark, path)

    if (!isBucketed(spark, path)) {
      require(!fs.exists(new Path(path)) || fs.listStatus(new Path(path)).isEmpty,
        s"$path exists but is not a bucketed target (no $metaFile) — " +
          "refusing to overwrite a flat layout; use MergeSink.mergeIntoParquet there")
      require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
      // creation is where a retention request becomes the LAYOUT's
      // retention (0 = the historical default of 1)
      val createRetain = if (retainVersions == 0) 1 else retainVersions
      loadType match {
        case "delete" => return // nothing to delete from
        case "update" =>
          // update-only against an absent target affects zero rows, but
          // it DOES establish the layout (schema + key), like
          // mergeIntoParquet's limit(0) write
          createTarget(spark, MergeSink.dedupeBatch(batch, key).limit(0), path, key, numBuckets, createRetain)
        case "upsert" =>
          createTarget(spark, MergeSink.dedupeBatch(batch, key), path, key, numBuckets, createRetain)
        case "scd2" =>
          // SCD2 bootstrap (MergeSink.openVersions): the layout's schema
          // includes the sink-managed version columns from day one
          createTarget(spark,
            MergeSink.openVersions(batch, key, to_timestamp(lit(scd2Ts))),
            path, key, numBuckets, createRetain)
      }
      return
    }

    val meta = readMeta(spark, path)
    val n = meta.numBuckets
    val mergeKey = if (loadType == "delete") Seq(identifier) else key
    // a conflicting retainVersions must fail HERE, not at commit time
    // after the whole extract→route→write job has run (same placement
    // rationale as the schema check below)
    val retention = resolveRetention(retainVersions, meta, path)
    // schema-evolution contract (MergeSink.validateBatchSchema scaladoc):
    // checked BEFORE any routing/persist work — the routing cast below
    // must never be the thing that silently narrows a batch column
    if (loadType != "delete")
      MergeSink.validateBatchSchema(meta.schema, batch.schema, mergeKey)
    else
      // BEFORE bucket pruning: a mis-typed id column must fail loudly
      // even when its (mis-cast) ids all route to absent buckets — the
      // early returns below would otherwise turn it into a silent no-op,
      // which the flat sink refuses
      MergeSink.validateDeleteIds(meta.schema, batch.schema, identifier,
        MergeSink.deleteIdColumn(batch, identifier))
    if (loadType != "delete")
      require(key == meta.key,
        s"bucketed target $path is keyed on ${meta.key.mkString(",")} — " +
          s"cannot ${loadType} on ${key.mkString(",")} (rows are routed by the layout key)")

    // the manifest version this batch's reads resolve against — the
    // optimistic-commit base (object scaladoc "Concurrent writers");
    // parse THAT file, not a re-listed current, so base and mapping
    // cannot straddle an interleaved commit
    val baseFile = currentManifestFile(fs, path)
    val base = baseFile.map(versionOf).getOrElse(0L)
    val mapping = baseFile.map(parseManifest(fs, _)).getOrElse(Map.empty[Int, String])
    // clean up any previous crash's orphan data dirs before writing ours
    gcUnreferenced(fs, path)
    val existing = mapping.keys.toSeq
    // which buckets does this batch touch? a delete prunes when the
    // TARGET column it matches is the layout key (a target row with
    // key=v lives in bucket hash(v), whatever the id column in the
    // batch is called); a foreign delete identifier can land anywhere →
    // all buckets, still correct, just full-cost
    val canPrune = mergeKey == meta.key
    // hash() is type-sensitive: a batch key narrower than the target's
    // (MergeSink casts batch values to the target type on output) must
    // be cast BEFORE hashing or it routes to the wrong bucket
    val tType = meta.schema.fields.map(f => f.name -> f.dataType).toMap
    val routeExprs: Seq[org.apache.spark.sql.Column] =
      if (loadType != "delete") mergeKey.map(k => col(k).cast(tType(k)))
      else {
        val idc = if (batch.columns.contains(identifier)) identifier
          else batch.columns.head // MergeSink.delete's id-column fallback
        Seq(col(idc).cast(tType(identifier)))
      }
    // The touched-bucket scan below is an ACTION on the batch, and the
    // merge/route/write then executes it again; through Runner the batch
    // is the whole extract→transform chain, so without caching every
    // bucketed incremental load pays that chain twice. Persist once and
    // serve both from the cache; a caller who already persisted keeps
    // ownership of their own cache.
    val ownPersist = canPrune && batch.storageLevel == StorageLevel.NONE
    if (ownPersist) batch.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val touched: Seq[Int] =
        if (!canPrune) existing
        else batch.select(bucketOf(routeExprs, n).as(bucketCol))
          .distinct().collect().map(_.getInt(0)).toSeq // ≤ numBuckets rows: driver-safe
      val touchedExisting = touched.intersect(existing)
      if (touched.isEmpty) return
      if (loadType == "delete" && touchedExisting.isEmpty) return // nothing to delete

      // the touched slice of the target: only its leaf dirs are listed
      val target = readBuckets(spark, path, touchedExisting)

      val bcast = MergeSink.fitsBroadcast(batch)
      val merged = loadType match {
        case "upsert" => MergeSink.upsert(target, batch, key, excluded, broadcastBatch = bcast)
        case "update" => MergeSink.update(target, batch, key, excluded, broadcastBatch = bcast)
        case "delete" => MergeSink.delete(target, batch, identifier, broadcastIds = bcast)
        case "scd2" =>
          MergeSink.scd2(target, batch, to_timestamp(lit(scd2Ts)), key,
            broadcastBatch = bcast)
      }
      // re-derive each output row's bucket from the LAYOUT key (surviving
      // target rows keep their bucket; inserts hash to a touched one)
      val routed = merged.withColumn(bucketCol, bucketExpr(meta.key, n))

      val commit = "c" + UUID.randomUUID().toString
      val commitPath = new Path(new Path(path, dataDir), commit)
      try routed.write.partitionBy(bucketCol).parquet(commitPath.toString)
      catch { case e: Throwable => fs.delete(commitPath, true); throw e }
      // sanity: the merge can only have produced rows in touched buckets
      val produced = fs.listStatus(commitPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(bucketCol + "="))
        .map(_.stripPrefix(bucketCol + "=").toInt)
      val stray = produced.filterNot(touched.contains)
      if (stray.nonEmpty) {
        fs.delete(commitPath, true)
        throw new IllegalStateException(
          s"merge produced rows in untouched buckets ${stray.mkString(",")} — routing bug")
      }
      // new mapping: touched buckets move to this commit (those merged
      // to zero rows simply drop out); for a delete, buckets the batch
      // hashes to but that never existed stay absent
      val rewritten = (if (loadType == "delete") touchedExisting else touched).toSet
      val newMapping = (mapping -- rewritten) ++
        produced.filter(rewritten.contains).map(_ -> commit)
      // the batch becomes visible HERE (retention resolved pre-job); a
      // lost commit race rolls our data dir back before rethrowing — the
      // loser must leave nothing behind beyond what a crash would
      try commitManifest(fs, path, newMapping, retention, expectedBase = base)
      catch { case e: ConcurrentWriteException =>
        fs.delete(commitPath, true); throw e
      }
      gcUnreferenced(fs, path)
    } finally if (ownPersist) batch.unpersist(false)
  }

  // ------------------------------------------------------------ compact

  /** Compact fragmented bucket directories down to one file each.
    *
    * Each merge rewrites a touched bucket with the write parallelism of
    * the merge job, so a bucket directory holds up to
    * `spark.sql.shuffle.partitions` part files per rewrite — cheap at
    * merge time (no extra shuffle on the latency-sensitive load path),
    * but after many micro-batches the small files tax every later scan
    * (file-listing + per-file open cost dominates at 100 TB). This is
    * the standard LSM split: fast fragmented writes, background
    * compaction.
    *
    * Buckets with more than `maxFiles` data files are rewritten as ONE
    * job into a fresh commit dir — `repartition($"gbucket")` so each
    * bucket lands in exactly one task (→ exactly one output file per
    * bucket) — and published with the same atomic manifest commit as a
    * merge: readers see the target fully fragmented or fully compacted,
    * never half. Content is row-identical. Fragmentation discovery
    * lists only referenced leaf dirs, in parallel across a bounded
    * thread pool — one driver-side listing per bucket was a serial
    * bottleneck at 1k+ buckets. Returns the compacted bucket ids. */
  def compact(
      spark: SparkSession,
      path: String,
      maxFiles: Int = 1,
      retainVersions: Int = 0): Seq[Int] = {
    val fs = fsOf(spark, path)
    val meta = readMeta(spark, path)
    // conflicting retention fails before the discovery listing and the
    // rewrite job, not after them at commit time (merge does the same)
    val retention = resolveRetention(retainVersions, meta, path)
    // same optimistic-commit base discipline as merge (scaladoc
    // "Concurrent writers"): mapping parsed from the base file itself
    val baseFile = currentManifestFile(fs, path)
    val base = baseFile.map(versionOf).getOrElse(0L)
    val mapping = baseFile.map(parseManifest(fs, _)).getOrElse(Map.empty[Int, String])
    gcUnreferenced(fs, path)
    val fragmented = listParallel(mapping.toSeq) { case (b, c) =>
      val files = fs.listStatus(leafDir(path, c, b))
        .count(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".")) // "."-files: local-fs .crc checksums
      if (files > maxFiles) Some(b) else None
    }.flatten.sorted
    if (fragmented.isEmpty) return Nil
    val slice = readBuckets(spark, path, fragmented)
      .withColumn(bucketCol, bucketExpr(meta.key, meta.numBuckets))
    val commit = "c" + UUID.randomUUID().toString
    val commitPath = new Path(new Path(path, dataDir), commit)
    try slice.repartition(col(bucketCol))
      .write.partitionBy(bucketCol).parquet(commitPath.toString)
    catch { case e: Throwable => fs.delete(commitPath, true); throw e }
    val newMapping = mapping ++ fragmented.map(_ -> commit)
    try commitManifest(fs, path, newMapping, retention, expectedBase = base)
    catch { case e: ConcurrentWriteException =>
      fs.delete(commitPath, true); throw e
    }
    gcUnreferenced(fs, path)
    fragmented
  }

  /** Predicate-based delete over a bucketed target — see
    * [[MergeSink.deleteWhere]] for the semantics. Physical cost: ONE
    * filtered scan locates the buckets holding matching rows — pruned
    * to the key's own buckets when the predicate pins the layout key
    * (the GDPR `user_id = X` shape, [[purgeDiscoveryBuckets]]); for
    * arbitrary predicates (TTL) it covers every live bucket with
    * parquet row-group statistics pruning inside — then
    * only those buckets rewrite — O(touched buckets), the same
    * asymmetry as the merge; a bucket the purge empties drops from the
    * manifest (and its dir is GC'd) exactly like an id-based delete
    * that empties it. Commits one manifest version under the same
    * optimistic single-writer detection as merge/compact. Returns the
    * rewritten bucket ids (empty = nothing matched, no version
    * committed). */
  def deleteWhere(
      spark: SparkSession,
      path: String,
      condition: String,
      retainVersions: Int = 0): Seq[Int] = {
    val fs = fsOf(spark, path)
    val meta = readMeta(spark, path)
    val retention = resolveRetention(retainVersions, meta, path)
    val baseFile = currentManifestFile(fs, path)
    val base = baseFile.map(versionOf).getOrElse(0L)
    val mapping = baseFile.map(parseManifest(fs, _)).getOrElse(Map.empty[Int, String])
    gcUnreferenced(fs, path)
    if (mapping.isEmpty) return Nil
    val pred = expr(condition)
    // which buckets hold matching rows? re-derive the routing bucket on
    // the filtered scan — bounded output (<= numBuckets distinct ids).
    // The scan itself prunes to the key's buckets when the predicate
    // pins the layout key (the GDPR `user_id = X` shape); arbitrary
    // predicates (TTL cutoffs) scan every live bucket, with parquet
    // row-group stats pruning inside where the predicate allows.
    val discovery = purgeDiscoveryBuckets(
      spark, meta, mapping.keys.toSeq, condition)
    val touched = readBuckets(spark, path, discovery)
      .filter(coalesce(pred, lit(false)))
      .select(bucketExpr(meta.key, meta.numBuckets).as("__b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Nil
    // rewrite the touched buckets without their matching rows (null
    // predicate = not a match = survives, SQL DELETE semantics)
    val slice = readBuckets(spark, path, touched)
      .filter(!coalesce(pred, lit(false)))
      .withColumn(bucketCol, bucketExpr(meta.key, meta.numBuckets))
    val commit = "c" + UUID.randomUUID().toString
    val commitPath = new Path(new Path(path, dataDir), commit)
    try slice.repartition(col(bucketCol))
      .write.partitionBy(bucketCol).parquet(commitPath.toString)
    catch { case e: Throwable => fs.delete(commitPath, true); throw e }
    // a fully-purged bucket writes no partition dir: drop it from the
    // manifest rather than point at a missing leaf
    val written = fs.listStatus(commitPath).toSeq
      .map(_.getPath.getName).filter(_.startsWith(s"$bucketCol="))
      .map(_.stripPrefix(s"$bucketCol=").toInt).toSet
    val newMapping = (mapping -- touched) ++
      touched.filter(written).map(_ -> commit)
    try commitManifest(fs, path, newMapping, retention, expectedBase = base)
    catch { case e: ConcurrentWriteException =>
      fs.delete(commitPath, true); throw e
    }
    gcUnreferenced(fs, path)
    touched
  }

  /** The buckets [[deleteWhere]]'s DISCOVERY scan must read for
    * `condition`: when every layout-key column is pinned to literal
    * values by top-level equality / IN conjuncts (the GDPR purge shape
    * — `user_id = 123`, `id IN (7, 42) AND ts < ...`), only the buckets
    * those key tuples hash to can hold matching rows, so discovery
    * prunes to them — [[readForKeys]]' routing applied to the predicate
    * text. Any other shape (ranges, ORs, non-key columns — the TTL
    * purge) returns every live bucket: the full filtered scan is
    * inherent there.
    *
    * Soundness over cleverness: pruning only engages when the pinned
    * literal's type equals the key column's, or both are integral (a
    * value-preserving coercion). A cross-type comparison like
    * `long_key = '0123'` matches rows via SQL coercion that hash
    * differently from the literal's own representation — those fall
    * back to the full scan rather than risk missing a matching row.
    * Literal combinations are capped (1024) so the local routing job
    * stays trivial next to the scan it replaces. */
  private[graft] def purgeDiscoveryBuckets(
      spark: SparkSession,
      meta: Meta,
      live: Seq[Int],
      condition: String): Seq[Int] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualNullSafe, EqualTo, Expression => CExpr, In => CIn, Literal => CLit}
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    val all = live.sorted
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(condition)
      catch { case scala.util.control.NonFatal(_) => return all }
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def isKey(e: CExpr, k: String): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.sizeIs == 1 && a.nameParts.head.equalsIgnoreCase(k)
      case _ => false
    }
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    def safeLit(l: CLit, k: String): Boolean = {
      val kt = meta.schema(meta.schema.fieldIndex(k)).dataType
      l.dataType == kt || (integral(l.dataType) && integral(kt))
    }
    val cs = conjuncts(parsed)
    // per key column: the literals a conjunct pins it to (None = unpinned)
    val pinned: Option[Seq[Seq[CLit]]] =
      meta.key.foldLeft(Option(Vector.empty[Seq[CLit]])) { (acc, k) =>
        acc.flatMap { v =>
          cs.collectFirst {
            case EqualTo(a, l: CLit) if isKey(a, k) && safeLit(l, k) => Seq(l)
            case EqualTo(l: CLit, a) if isKey(a, k) && safeLit(l, k) => Seq(l)
            case EqualNullSafe(a, l: CLit) if isKey(a, k) && safeLit(l, k) => Seq(l)
            case EqualNullSafe(l: CLit, a) if isKey(a, k) && safeLit(l, k) => Seq(l)
            case CIn(a, ls) if isKey(a, k) && ls.nonEmpty &&
                ls.forall { case l: CLit => safeLit(l, k); case _ => false } =>
              ls.map(_.asInstanceOf[CLit])
          }.map(v :+ _)
        }
      }
    pinned match {
      case Some(lists) if lists.map(_.size.toLong).product <= 1024L =>
        val tType = meta.schema.fields.map(f => f.name -> f.dataType).toMap
        val combos = lists.foldLeft(Seq(Seq.empty[CLit]))(
          (acc, ls) => acc.flatMap(pre => ls.map(pre :+ _)))
        // route each combination through the SAME cast + hash as the
        // merge: one local row per combo, cast to the layout's types
        val rows = combos.map { combo =>
          spark.range(1).select(meta.key.zip(combo).map { case (k, l) =>
            org.apache.spark.sql.GraftSqlBridge.column(l).cast(tType(k)).as(k)
          }: _*)
        }.reduce(_ unionByName _)
        val liveSet = live.toSet
        rows.select(bucketOf(meta.key.map(k => col(k).cast(tType(k))),
            meta.numBuckets).as(bucketCol))
          .distinct().collect().map(_.getInt(0)).toSeq
          .filter(liveSet).sorted
      case _ => all
    }
  }

  /** Driver-side parallel map over per-bucket filesystem metadata calls:
    * object stores serve ~tens of listings/s per thread, so a serial
    * loop over 10k buckets takes minutes while 32 threads take seconds.
    * Bounded pool; propagates the first failure. */
  private def listParallel[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    if (items.sizeIs <= 4) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, items.size))
    try {
      import scala.jdk.CollectionConverters._
      pool.invokeAll(items.map(a =>
        new java.util.concurrent.Callable[B] { def call(): B = f(a) }).asJava)
        .asScala.toSeq.map(_.get())
    } finally pool.shutdown()
  }

  // ------------------------------------------------------------- create

  private def createTarget(
      spark: SparkSession,
      rows: DataFrame,
      path: String,
      key: Seq[String],
      numBuckets: Int,
      retainVersions: Int): Unit = {
    key.foreach(k => require(rows.columns.contains(k),
      s"key column '$k' missing from batch (${rows.columns.mkString(",")})"))
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // meta FIRST: from here the target exists (empty) and every later
    // state is consistent — a crash before the manifest commit leaves an
    // established empty layout plus an invisible orphan, and replaying
    // the same batch converges (meta-last would instead strand a
    // half-created path that the flat-layout guard then refuses forever)
    writeMeta(spark, path, Meta(numBuckets, key, rows.schema, retainVersions))
    val commit = "c" + UUID.randomUUID().toString
    val commitPath = new Path(new Path(path, dataDir), commit)
    try rows.withColumn(bucketCol, bucketExpr(key, numBuckets))
      .write.partitionBy(bucketCol).parquet(commitPath.toString)
    catch { case e: Throwable => fs.delete(commitPath, true); throw e }
    val buckets = fs.listStatus(commitPath).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(bucketCol + "="))
      .map(_.stripPrefix(bucketCol + "=").toInt)
    // creation commits v1 from an empty manifest: two processes racing to
    // CREATE the same target tie-break on the v1 create — the loser gets
    // the same retryable ConcurrentWriteException (and on retry converges,
    // since the winner established the layout)
    try commitManifest(fs, path, buckets.map(_ -> commit).toMap, retainVersions,
      expectedBase = 0L)
    catch { case e: ConcurrentWriteException =>
      fs.delete(commitPath, true); throw e
    }
  }
}
