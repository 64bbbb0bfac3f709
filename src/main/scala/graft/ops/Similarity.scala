package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ScoredId, TopKAggregator}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (SURVEY §2 Layer C):
  *   - `bruteForceTopK` — exact: broadcast the (small) query set, scan the
  *     corpus once, partial-aggregate a per-query top-k with a typed
  *     Aggregator. The corpus is never shuffled: the only exchange carries
  *     k×|queries| rows. This is the right exact plan at 100 TB whenever
  *     the query set fits in a broadcast.
  *   - `lshTopK` — approximate: deterministic random-hyperplane LSH.
  *     Corpus and queries are bucketed by an H-bit signature per table
  *     (L tables for recall); candidates are equi-joined on
  *     (table, signature) — bounded fan-out, no cross join — then scored
  *     exactly and top-k'd. The scale path when queries don't fit in a
  *     broadcast or the corpus×queries product is too big.
  *
  * All scoring is cosine in double precision via higher-order functions —
  * whole-stage-codegen'd, no UDF in the scan path.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * Sequential left-fold (HOF `aggregate`) ⇒ deterministic bits. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbours for every vector in `queries` against
    * `corpus`, excluding self-matches on id. Output:
    * (query_id, cand_id, cos, rank) with cos rounded to 4 d.p. and rank
    * dense from 1 with (cos DESC, cand_id ASC) ordering. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = Dedup.widen(corpus).select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c
      .join(q, col("query_id") =!= col("cand_id")) // broadcast NLJ: corpus scanned once
      .select(
        col("query_id"),
        round(cosine(col("qv"), col("cv")), 4).as("score"),
        col("cand_id").as("id"))
    // partial-aggregated top-k: k rows per (partition, query) cross the wire
    val agg = new TopKAggregator(k).toColumn
    scored
      .as[(Long, Double, Long)]
      .map { case (qid, s, id) => (qid, ScoredId(s, id)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case (si, i) =>
          (qid, si.id, si.score, i + 1)
        }
      }
      .toDF("query_id", "cand_id", "cos", "rank")
  }

  /** Deterministic random hyperplanes: L tables × H planes × dim weights,
    * seeded once — identical on every run and every executor. */
  private[ops] def planes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new Random(42)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** H-bit signature of a vector column under one table's planes. Each
    * plane ships as ONE array literal (`typedLit`), not `dim` scalar
    * literal nodes — per-double literals once ballooned the serialized
    * task binaries past 1 MiB. */
  private def signature(vec: Column, tablePlanes: Array[Array[Double]]): Column = {
    val bits = tablePlanes.zipWithIndex.map { case (p, i) =>
      val w = typedLit(p.toSeq)
      val d = aggregate(
        zip_with(vec, w, (x, y) => x.cast("double") * y),
        lit(0.0),
        (acc, v) => acc + v)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k via LSH bucketing: join on (table, signature),
    * exact-score candidates, keep per-query top-k. Recall grows with
    * `tables`; bucket size shrinks with `bits`. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      tables: Int = 8,
      bits: Int = 12,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val ps = planes(tables, bits, dim)
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame = {
      val sigs = (0 until tables).map { t =>
        struct(lit(t).as("table"), signature(col(vecCol), ps(t)).as("sig"))
      }
      // outer generate + widen: plain explode would make Catalyst infer a
      // size>0 filter that re-evaluates the whole tables×bits×dim
      // signature array a second time at the (possibly unsplittable)
      // scan — see Dedup.jaccardPairs for the full pathology.
      Dedup.widen(df)
        .select(col(idCol).as(id), col(vecCol).as(vec),
          explode_outer(array(sigs: _*)).as("b"))
        .filter(col("b").isNotNull)
        .select(col(id), col(vec), col("b.table"), col("b.sig"))
    }
    val qb = bucketed(queries, "query_id", "qv")
    val cb = bucketed(corpus, "cand_id", "cv")
    val cand = qb.join(cb, Seq("table", "sig"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "qv", "cand_id", "cv")
      .dropDuplicates("query_id", "cand_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    cand
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }
}
