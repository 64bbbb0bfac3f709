package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native graft kernels: every custom Catalyst
  * `Expression` in this package, exposed as a SQL function so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works — the
  * SparkSessionExtensions leg of the custom-operator design (compose
  * built-ins > native Expression > extension registration > UDF).
  *
  * Two registration paths:
  *   - build-time: `SparkSession.builder().withExtensions(new
  *     GraftExtensions)` — the proper injection point for sessions the
  *     application constructs;
  *   - post-hoc: [[GraftFunctions.register]] on a live session (e.g. one
  *     the host created without extensions), via the sql-private
  *     function registry.
  *
  * Cardinality/config arguments (hash counts, gram widths) must be
  * INTEGER LITERALS: they parameterize the generated code itself, so a
  * per-row value cannot work — the builders fail loudly instead of
  * silently taking the first row's value.
  */
object GraftFunctions {

  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INTEGER literal (it parameterizes codegen), " +
        s"got ${other.sql}")
  }

  // bin-range parameters (lo/hi/q) fix the generated expression tree's
  // constants the same way the integer cardinalities do — any numeric
  // SQL literal is accepted (0, 2e4, 0.5 parse as int/double/decimal)
  private def litDouble(fn: String, arg: String, e: Expression): Double =
    e match {
      case Literal(v, _: org.apache.spark.sql.types.NumericType)
          if v != null => v match {
        case d: Double => d
        case f: Float => f.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      }
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a NUMERIC literal (it parameterizes the " +
          s"generated expression), got ${other.sql}")
    }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (name, builder) for every native kernel. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args =>
      arity("vec_dot", 2, args); VecDot(args(0), args(1))
    },
    "minhash_sig" -> { args =>
      arity("minhash_sig", 2, args)
      MinHashSig(args(0), litInt("minhash_sig", "numHashes", args(1)))
    },
    "simhash64" -> { args =>
      arity("simhash64", 1, args); SimHash64(args(0))
    },
    "top_bigram_count" -> { args =>
      arity("top_bigram_count", 1, args); TopBigramCount(args(0))
    },
    "char_gram_minhash" -> { args =>
      arity("char_gram_minhash", 3, args)
      CharGramMinHash(args(0),
        litInt("char_gram_minhash", "k", args(1)),
        litInt("char_gram_minhash", "numHashes", args(2)))
    },
    "word_gram_minhash" -> { args =>
      arity("word_gram_minhash", 3, args)
      WordGramMinHash(args(0),
        litInt("word_gram_minhash", "k", args(1)),
        litInt("word_gram_minhash", "numHashes", args(2)))
    },
    // aggregate, not scalar: the builder hands back the Aggregator's
    // AggregateExpression (Complete mode pre-planning — the planner
    // still splits partial/final, PlanSpec pins the partial below the
    // exchange), so `SELECT freq_items(tok, 256) ... GROUP BY` works
    // like any built-in agg. capacity parameterizes the sketch bound
    // itself, hence the literal contract.
    "freq_items" -> { args =>
      arity("freq_items", 2, args)
      val cap = litInt("freq_items", "capacity", args(1))
      // any item type profiles as its string form (domains, keys,
      // status codes...) — same contract as TextAnalysis.heavyHitters'
      // cast("string"), so `freq_items(o_custkey, 64)` just works
      val item = org.apache.spark.sql.catalyst.expressions.Cast(
        args(0), org.apache.spark.sql.types.StringType)
      GraftSqlBridge.udafExpression(
        new FrequentItemsAggregator(cap),
        org.apache.spark.sql.Encoders.STRING, Seq(item))
    },
    // rollup of STORED freq_items summaries (map<string,bigint>) — the
    // persisted-sketch pattern's read side, lossless per the
    // mergeable-summaries theorem (see FrequentItemsMergeAggregator)
    "freq_items_merge" -> { args =>
      arity("freq_items_merge", 2, args)
      val cap = litInt("freq_items_merge", "capacity", args(1))
      GraftSqlBridge.udafExpression(
        new FrequentItemsMergeAggregator(cap),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Map[String, Long]](), Seq(args(0)))
    },
    // the fixed-bin profile family (graft.ops.Profiling) on the SQL
    // surface. hist_bin is the enabling kernel: with it the whole
    // sketch BUILD is plain SQL — `map_from_entries(sort_array(
    // collect_list(struct(bin, cnt))))` over `GROUP BY hist_bin(v, lo,
    // hi, n)` IS histSketch, and the rollup is explode + SUM in SQL —
    // while hist_quantile / hist_psi are the READ side over stored
    // map<int,bigint> profiles. All three are pure Column compositions
    // (codegen'd, no UDF); the range/q parameters are literals because
    // they fold into the expression tree's constants.
    "hist_bin" -> { args =>
      arity("hist_bin", 4, args)
      GraftSqlBridge.expressionEager(graft.ops.Profiling.binOf(
        GraftSqlBridge.column(args(0)),
        litDouble("hist_bin", "lo", args(1)),
        litDouble("hist_bin", "hi", args(2)),
        litInt("hist_bin", "nbins", args(3))))
    },
    "hist_quantile" -> { args =>
      arity("hist_quantile", 5, args)
      GraftSqlBridge.expressionEager(graft.ops.Profiling.histQuantile(
        GraftSqlBridge.column(args(0)),
        litDouble("hist_quantile", "lo", args(1)),
        litDouble("hist_quantile", "hi", args(2)),
        litInt("hist_quantile", "nbins", args(3)),
        litDouble("hist_quantile", "q", args(4))))
    },
    "hist_psi" -> { args =>
      arity("hist_psi", 2, args)
      GraftSqlBridge.expressionEager(graft.ops.Profiling.histPsi(
        GraftSqlBridge.column(args(0)),
        GraftSqlBridge.column(args(1))))
    },
    // compression-ratio quality signal; 1-arg form defaults to level 6
    // (zlib's own default), 2-arg form pins the level explicitly
    "deflate_ratio" -> { args =>
      require(args.length == 1 || args.length == 2,
        s"deflate_ratio expects 1 or 2 arguments, got ${args.length}")
      val level =
        if (args.length == 2) litInt("deflate_ratio", "level", args(1))
        else 6
      DeflateRatio(args(0), level)
    },
    // theta sketches — the set-algebra member of the persisted-sketch
    // family (see graft.functions.ThetaSketch). Items cast to string
    // like freq_items; the optional lgK literal sizes the sketch.
    "theta_sketch_agg" -> { args =>
      require(args.length == 1 || args.length == 2,
        s"theta_sketch_agg expects 1 or 2 arguments, got ${args.length}")
      val lgK = if (args.length == 2)
        litInt("theta_sketch_agg", "lgK", args(1)) else ThetaSketch.DefaultLgK
      val item = org.apache.spark.sql.catalyst.expressions.Cast(
        args(0), org.apache.spark.sql.types.StringType)
      ThetaSketchAgg(item, lgK).toAggregateExpression()
    },
    "theta_union_agg" -> { args =>
      require(args.length == 1 || args.length == 2,
        s"theta_union_agg expects 1 or 2 arguments, got ${args.length}")
      val lgK = if (args.length == 2)
        litInt("theta_union_agg", "lgK", args(1)) else ThetaSketch.DefaultLgK
      ThetaSetAgg(args(0), lgK, intersect = false).toAggregateExpression()
    },
    "theta_intersect_agg" -> { args =>
      require(args.length == 1 || args.length == 2,
        s"theta_intersect_agg expects 1 or 2 arguments, got ${args.length}")
      val lgK = if (args.length == 2)
        litInt("theta_intersect_agg", "lgK", args(1))
      else ThetaSketch.DefaultLgK
      ThetaSetAgg(args(0), lgK, intersect = true).toAggregateExpression()
    },
    "theta_estimate" -> { args =>
      arity("theta_estimate", 1, args); ThetaEstimate(args(0))
    },
    "theta_a_not_b" -> { args =>
      arity("theta_a_not_b", 2, args); ThetaANotB(args(0), args(1))
    },
    // KLL quantile sketches — the rank/quantile member of the
    // persisted-sketch family (see graft.functions.KllSketch). Values
    // cast to double; the optional k literal sizes the rank error
    // (default 200 ≈ 1.65%).
    "kll_sketch_agg" -> { args =>
      require(args.length == 1 || args.length == 2,
        s"kll_sketch_agg expects 1 or 2 arguments, got ${args.length}")
      val k = if (args.length == 2)
        litInt("kll_sketch_agg", "k", args(1)) else KllSketch.DefaultK
      val value = org.apache.spark.sql.catalyst.expressions.Cast(
        args(0), org.apache.spark.sql.types.DoubleType)
      KllSketchAgg(value, k).toAggregateExpression()
    },
    "kll_merge_agg" -> { args =>
      require(args.length == 1 || args.length == 2,
        s"kll_merge_agg expects 1 or 2 arguments, got ${args.length}")
      // 1-arg: the buffer adopts the inputs' k (no accuracy cliff when
      // merging high-k stored sketches). 2-arg: the explicit k governs —
      // merge takes min k, so it CAPS accuracy (see KllMergeAgg).
      if (args.length == 2)
        KllMergeAgg(args(0), litInt("kll_merge_agg", "k", args(1)))
          .toAggregateExpression()
      else
        KllMergeAgg(args(0), KllSketch.DefaultK, adaptK = true)
          .toAggregateExpression()
    },
    "kll_quantile" -> { args =>
      arity("kll_quantile", 2, args)
      KllQuantile(args(0), org.apache.spark.sql.catalyst.expressions.Cast(
        args(1), org.apache.spark.sql.types.DoubleType))
    },
    "kll_rank" -> { args =>
      arity("kll_rank", 2, args)
      KllRank(args(0), org.apache.spark.sql.catalyst.expressions.Cast(
        args(1), org.apache.spark.sql.types.DoubleType))
    },
    "kll_n" -> { args =>
      arity("kll_n", 1, args); KllN(args(0))
    },
    "kll_retained" -> { args =>
      arity("kll_retained", 1, args); KllRetained(args(0))
    },
    // deterministic bottom-k-by-hash exemplar sample (family #6 —
    // drill-down rows; see graft.functions.Exemplar)
    "exemplar_agg" -> { args =>
      arity("exemplar_agg", 3, args)
      ExemplarAgg(args(0), args(1), litInt("exemplar_agg", "k", args(2)))
        .toAggregateExpression()
    },
    // KMV distinct estimate read from a stored exemplar sample (the
    // free side reading; k must match the sample's build k)
    "kmv_estimate" -> { args =>
      arity("kmv_estimate", 2, args)
      GraftSqlBridge.expressionEager(Exemplar.kmvEstimate(
        GraftSqlBridge.column(args(0)),
        litInt("kmv_estimate", "k", args(1))))
    },
    "kll_ks" -> { args =>
      arity("kll_ks", 2, args); KllKsDelta(args(0), args(1))
    },
    "kll_ks_threshold" -> { args =>
      arity("kll_ks_threshold", 3, args)
      KllKsThreshold(args(0), args(1),
        org.apache.spark.sql.catalyst.expressions.Cast(
          args(2), org.apache.spark.sql.types.DoubleType))
    })

  /** Register every kernel on a live session (temp functions, session
    * scope — idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) =>
      GraftSqlBridge.registerFunction(spark, name, b)
    }
}

/** Build-time injection: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.functions
  * .GraftExtensions` in config). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        b))
    }
}
