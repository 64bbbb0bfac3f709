package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}

/** One declared input of a pipeline stage (SURVEY §2 Layer B "Scans /
  * sources"; the reference's entire purpose is MySQL→Postgres movement —
  * `Pype.py:1-2`, source connection used at `Pype.py:33-36` — so a real
  * replacement must read more than parquet).
  *
  * `format`: parquet | orc | csv | json | text | binary (Spark's
  *   `binaryFile` — one row per raw asset file, the multimodal ingest
  *   path) | jdbc | bucketed (a BucketedMergeSink layout;
  *   `options: {version: N}` pins a retained snapshot — the time-travel
  *   read hook).
  * `path`: file-format location (dir or file); unused for jdbc.
  * `schema`: optional DDL string ("id LONG, name STRING"). For csv/json
  *   this should ALWAYS be set in production: schema inference reads the
  *   data twice, which at 100 TB doubles the scan before the query runs.
  * `options`: passed straight to the `DataFrameReader` — csv gets
  *   `header`/`delimiter`/..., jdbc gets `url`/`dbtable`|`query`/`user`/
  *   `password`/`driver` plus the parallel-read quartet
  *   `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` and
  *   `fetchsize` (the Spark-side analogue of the reference's
  *   `bulk_size`-batched cursor, Pype.py:38-47 — without
  *   `partitionColumn` a JDBC read is ONE executor pulling the whole
  *   table through one socket).
  */
final case class SourceSpec(
    format: String,
    path: String = "",
    schema: String = "",
    options: Map[String, String] = Map.empty)

object Sources {

  /** Cast every TIMESTAMP_NTZ column to session-tz TimestampType —
    * including NTZ buried inside structs, arrays and maps (the cast of a
    * rewritten nested type applies field-by-field / element-by-element).
    *
    * Spark 4 infers parquet `timestamp(isAdjustedToUTC=false)` as
    * TIMESTAMP_NTZ, which several operators reject or cannot cast
    * directly (e.g. no NTZ→BIGINT cast), and which compares against
    * TZ-typed columns via implicit coercions that depend on the session
    * timezone. Pipelines that standardize on instant semantics (as this
    * library's battery does, with the session tz pinned to UTC) can call
    * this once at the source boundary: the cast preserves wall-clock
    * values under the session tz, and is the identity on frames without
    * NTZ columns. Deliberately NOT applied inside [[read]] — whether
    * NTZ is "naive UTC" or truly zone-less is a data-owner decision. */
  def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    def rewrite(dt: DataType): DataType = dt match {
      case TimestampNTZType => TimestampType
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = rewrite(f.dataType))))
      case a: ArrayType => a.copy(elementType = rewrite(a.elementType))
      case m: MapType =>
        m.copy(keyType = rewrite(m.keyType), valueType = rewrite(m.valueType))
      case other => other
    }
    df.schema.fields.foldLeft(df) { (d, f) =>
      val nt = rewrite(f.dataType)
      if (nt == f.dataType) d
      else d.withColumn(f.name, d.col(s"`${f.name}`").cast(nt))
    }
  }

  val fileFormats = Set("parquet", "orc", "csv", "json", "text")

  /** `binaryFile`'s fixed schema: (path, modificationTime, length,
    * content). The raw-asset ingest path for multimodal pipelines — each
    * file (image/audio/video/blob) becomes one row with its bytes in
    * `content`, feeding [[graft.ops.Multimodal]] without any per-file
    * driver code. At 100 TB the relevant options ride through `options`
    * untouched: `pathGlobFilter` (server-side name filter — skip
    * non-asset files before any read), `recursiveFileLookup`, and
    * Spark's own `spark.sql.files.maxPartitionBytes` governs how many
    * small assets pack into one task. Large single files: a binaryFile
    * row must FIT in memory (the format never splits a file); shard
    * multi-GB containers upstream. */

  /** Build the DataFrame for a declared source. Validation is eager:
    * unknown formats and missing jdbc/file requirements fail at config
    * time with a clear message, not mid-run. */
  def read(spark: SparkSession, spec: SourceSpec): DataFrame = {
    val base: DataFrameReader = spark.read.options(spec.options)
    val reader = if (spec.schema.nonEmpty) base.schema(spec.schema) else base
    spec.format match {
      case f if fileFormats(f) =>
        require(spec.path.nonEmpty, s"source format '$f' requires a path")
        // `text` has ONE possible data column (value STRING; wholetext
        // collapses a file to one row) — a declared schema would have to
        // restate it, and a mismatch fails inside the scan; refuse early
        require(f != "text" || spec.schema.isEmpty,
          "text sources always read as a single `value STRING` column — " +
            "remove the 'schema' field (rename/split downstream)")
        reader.format(f).load(spec.path)
      case "binary" | "binaryFile" =>
        require(spec.path.nonEmpty, "source format 'binary' requires a path")
        require(spec.schema.isEmpty,
          "binary sources have the fixed schema (path, modificationTime, " +
            "length, content) — remove the 'schema' field")
        reader.format("binaryFile").load(spec.path)
      case "bucketed" =>
        // a BucketedMergeSink layout as a declared input — the read-side
        // hook for snapshot retention: `options: {version: N}` pins a
        // RETAINED manifest version (time travel; readVersion fails
        // loudly on one outside the layout's window), absent = current
        require(spec.path.nonEmpty, "source format 'bucketed' requires a path")
        require(spec.schema.isEmpty,
          "bucketed sources carry their schema in the layout metadata — " +
            "remove the 'schema' field")
        spec.options.get("version") match {
          case Some(v) => graft.sink.BucketedMergeSink.readVersion(spark, spec.path, v.toLong)
          case None => graft.sink.BucketedMergeSink.read(spark, spec.path)
        }
      case "jdbc" =>
        require(spec.schema.isEmpty,
          "jdbc sources take their schema from the database — " +
            "remove the 'schema' field (Spark rejects user schemas on jdbc)")
        require(spec.options.contains("url"),
          "jdbc source requires an 'url' option")
        require(
          spec.options.contains("dbtable") || spec.options.contains("query"),
          "jdbc source requires a 'dbtable' or 'query' option")
        reader.format("jdbc").load()
      case other =>
        throw new IllegalArgumentException(
          s"unknown source format: '$other' " +
            s"(expected ${fileFormats.mkString("/")}/binary/jdbc/bucketed)")
    }
  }

  /** JDBC sink — the write half of the reference's movement loop
    * (bulk DML at Pype.py:145-148). Plain append/overwrite maps directly;
    * MERGE semantics against a JDBC target are obtained by computing the
    * merged frame first (MergeSink.upsert/update/delete against
    * `spark.read.jdbc` of the target) and overwriting, or by a
    * foreachPartition upsert for targets that support ON CONFLICT.
    * `batchsize` (default 2000 = the reference's bulk_size, Pype.py:16)
    * controls rows per executor-side INSERT round-trip. */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Append,
      options: Map[String, String] = Map.empty): Unit =
    df.write
      .mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", options.getOrElse("batchsize", "2000"))
      .options(options)
      .save()

  /** Partitioned path write: Hive-style `col=value` directory layout.
    * At 100 TB this is the single biggest scan-cost lever: a filter on
    * the partition column (literal → static pruning; via a join to a
    * filtered dim → dynamic partition pruning, Catalyst's
    * `PartitionPruning` rule) skips whole directories at planning/run
    * time instead of reading and discarding rows. Partition by
    * low-cardinality, always-filtered columns (ingest date, source,
    * language) — thousands of partitions, not millions: each partition
    * should still hold enough data for well-sized files (small-file
    * explosion costs more in listing + task overhead than pruning
    * saves). Battery q84 joins a date-partitioned fact to a filtered
    * dim; PlanSpec pins the `dynamicpruning` subquery in the scan. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Range-CLUSTERED path write: the third leg of the layout toolkit
    * (bucketed = exchange-free equi-joins, partitioned = directory
    * pruning, clustered = ROW-GROUP pruning). `repartitionByRange` on
    * the cluster columns makes files cover disjoint value ranges and
    * `sortWithinPartitions` orders rows inside each file, so every
    * parquet row-group's min/max statistics become tight — a range
    * filter on the cluster column then skips whole files and row
    * groups at scan time instead of reading and discarding rows. Use
    * for high-cardinality range-filtered columns (event time, ids)
    * where directory partitioning would explode into millions of tiny
    * dirs; the layout composes with `partitionBy` on a coarser column.
    * Content is unchanged — only physical order moves (one range
    * exchange at write time buys every future scan's skipping). */
  def writeClustered(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      numFiles: Int = 0): Unit = {
    require(clusterCols.nonEmpty, "writeClustered needs at least one column")
    val cols = clusterCols.map(df.col)
    // numFiles > 0 pins the range-partition (≈ file) count — size it so
    // files land near the fs block size; 0 lets Spark derive it
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged
      .sortWithinPartitions(cols: _*)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** Z-ORDERED path write: [[writeClustered]] for MULTI-dimensional
    * predicates. A lexicographic range-sort on (a, b) gives tight
    * per-file min/max stats on `a` only — a filter on `b` alone still
    * reads every file. Here each cluster column maps to an equi-depth
    * bucket index against its own sampled quantile boundaries
    * ([[graft.functions.QuantileBucket]], equi-depth so skewed columns
    * still spread across the curve), the indices bit-interleave into
    * one Morton value ([[graft.functions.InterleaveBits]]), and ONE
    * `repartitionByRange` + in-file sort on that value lays rows out
    * along the space-filling curve — every file covers a compact
    * hyper-rectangle, so parquet min/max skipping works for range
    * predicates on ANY subset of the cluster columns (the Delta/Iceberg
    * OPTIMIZE ZORDER layout, rebuilt on plain parquet).
    *
    * Cost shape at 100 TB: one `approx_percentile` aggregation for the
    * boundaries (partial+final, a few KB to the driver), one narrow
    * codegen'd map for the curve value, one range exchange — the same
    * write cost as [[writeClustered]] plus the boundary pass. Columns
    * must be numeric/date/timestamp (rank-mapping strings has no
    * meaningful quantile arithmetic — refused loudly). Content is
    * unchanged; only physical order moves.
    *
    * File cuts fall ON curve-quadrant boundaries: the range exchange
    * partitions on the QUADRANT id (the curve value's top
    * ceil(log2(numFiles)) interleaved bits — the high bits of a Morton
    * value ARE the spatial quadrant), not on the raw curve value, and a
    * range partitioner never splits equal keys — so every file covers
    * whole hyper-rectangles instead of a sampled cut straddling two.
    * Per-file spread lands at the aligned ideal (SourcesSpec measures
    * ~0.24 on a uniform grid vs ~0.45 for sampled-boundary cuts). The
    * equi-depth per-column buckets keep marginal skew from imbalancing
    * quadrants; jointly-skewed data can still weight one quadrant — at
    * scale raise `numFiles` (finer quadrants) rather than reverting to
    * value-sampled cuts that trade alignment back away. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      bitsPerCol: Int = 12,
      numFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions._
    require(clusterCols.size >= 2,
      "z-ordering one column is just writeClustered — use that")
    val zCol = "__graft_z"
    val qCol = "__graft_zq"
    require(!df.columns.contains(zCol) && !df.columns.contains(qCol),
      s"input already has a $zCol/$qCol column")
    val asDouble: Map[String, org.apache.spark.sql.Column] =
      clusterCols.map { c =>
        val dt = df.schema(c).dataType
        val v = dt match {
          case _: NumericType => col(c).cast("double")
          case DateType => col(c).cast("timestamp").cast("double")
          case TimestampType | TimestampNTZType => col(c).cast("double")
          case t => throw new IllegalArgumentException(
            s"writeZOrdered: column '$c' is ${t.catalogString} — z-order " +
              "needs numeric/date/timestamp cluster columns")
        }
        c -> v
      }.toMap
    // one pass for every column's equi-depth boundaries (percentile
    // partial-aggregates; the driver receives a few KB of cut points)
    val buckets = 1 << bitsPerCol
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val cuts = df.select(clusterCols.map(c =>
      percentile_approx(asDouble(c), lit(probs.toArray),
        lit(10000)).as(c)): _*).head()
    // a null percentile row means NO non-null values in that column —
    // check every column, not just the first: an all-null later column
    // would NPE below, and an all-null FIRST column with populated
    // others must not be misread as "empty input"
    val nullCols = clusterCols.indices.filter(cuts.isNullAt).map(clusterCols)
    if (nullCols.size == clusterCols.size) {
      require(df.isEmpty,
        s"writeZOrdered: every cluster column (${clusterCols.mkString(", ")}) " +
          "is entirely NULL — there is no value space to lay out; drop the " +
          "null columns or use a plain write")
      // empty input: no quantiles to cut — the layout of nothing is
      // nothing, write it as-is instead of NPE-ing on the boundary row
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    require(nullCols.isEmpty,
      s"writeZOrdered: cluster column(s) ${nullCols.mkString(", ")} are " +
        "entirely NULL — an all-null dimension carries no layout " +
        "information; drop it from clusterCols (rows with SOME nulls are " +
        "fine — they sort to the curve's null region)")
    val boundaries: Map[String, Array[Double]] = clusterCols.zipWithIndex
      .map { case (c, i) =>
        // distinct-ify: a low-cardinality column repeats cut values and
        // binarySearch needs strictly sorted boundaries
        c -> cuts.getSeq[Double](i).distinct.sorted.toArray
      }.toMap
    val z = graft.functions.ZOrderExprs.interleaveBits(
      clusterCols.map(c => graft.functions.ZOrderExprs.quantileBucket(
        asDouble(c), boundaries(c))), bitsPerCol)
    // quadrant id = the curve value's top bits. ceil(log2(numFiles))
    // bits give 2^q >= numFiles quadrants, so each range partition
    // holds one or two ADJACENT whole quadrants; with no file-count
    // hint, 2^10 fine quadrants let the partitioner derive its own
    // count while cuts still fall on (fine) quadrant boundaries.
    val totalBits = clusterCols.size * bitsPerCol
    val qBits = math.min(totalBits,
      if (numFiles > 0) 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1, numFiles - 1).toLong).toInt
      else 10)
    val withZ = df.withColumn(zCol, z)
      .withColumn(qCol, shiftright(col(zCol), totalBits - qBits))
    val ranged =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, col(qCol))
      else withZ.repartitionByRange(col(qCol))
    ranged
      .sortWithinPartitions(zCol)
      .drop(zCol, qCol)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** Bucketed catalog write: pre-shuffles once at write time so every
    * future equi-join / aggregation on `key` between tables bucketed
    * with the SAME key and bucket count runs WITHOUT an exchange — the
    * co-located-join half of the engine's scale toolkit (the other half
    * is `broadcast()` for dims). `sortBy(key)` additionally removes the
    * sort from future sort-merge joins. Bucket metadata lives in the
    * session catalog, hence `saveAsTable` rather than a path write. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // Overwrite alone is NOT idempotent across sessions: the in-memory
    // catalog starts empty, so a managed-table location left by a
    // previous session (crash, or just a different JVM) makes
    // saveAsTable fail with LOCATION_ALREADY_EXISTS. Drop the catalog
    // entry if present, then remove any orphaned location.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
