package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layer B query battery (SURVEY §2): the relational surface the
  * reference delegates to SQL engines (Pype.py:36,167), expressed
  * natively on the DataFrame API. Every query is paired with an ANSI-SQL
  * oracle in `oracles` (run by the driver in DuckDB over the same
  * parquet).
  *
  * Cross-engine determinism rules used throughout:
  *   - double SUMs go through DECIMAL(18,4) (exact, order-independent)
  *     and cast back to double at the end; AVG = exact-sum / count.
  *   - per-row double arithmetic is left as-is (IEEE ops are bit-equal
  *     across engines given equal inputs).
  *   - every query has a total deterministic ORDER BY on both sides.
  *   - integer widths are aligned (Spark size()/year() are INT; DuckDB
  *     len()/extract() are BIGINT — the oracle casts).
  */
object QueriesRelational {

  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** The Dedup.widen idiom for CPU-dense scans (r17 optimization): a
    * single-row-group parquet file is unsplittable, so an expensive
    * per-row derivation over it (JSON parse, sketch build) runs on one
    * core no matter what maxPartitionBytes says. Repartition only when
    * the scan under-parallelizes — at 100 TB (thousands of splits) this
    * is a no-op, and when it fires the shuffled payload is by
    * definition small. Used by the few relational entries whose
    * per-row work dominates their scan (q130's VARIANT parse — measured
    * 1.84 → 0.82 s; q129's sketch build measured FLAT under the same
    * treatment, its wall being the sketch-table write/read round-trip,
    * so it stays unwidened); cheap scans stay exchange-free. */
  private def widened(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- aggregation: TPC-H Q1 shape (partial+final hash agg over the scan;
    //    the filter and 6-column projection push to parquet)
    "q01_pricing_summary" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          // reduce the scale-8 product sum to DECIMAL(30,4) BEFORE the
          // double cast: a scale-8 sum needs >15 significant digits at
          // sf>=0.1 and engines then disagree by 1 ulp on the decimal->
          // double conversion; at scale 4 the scaled integer stays under
          // 2^53 and every engine converts it exactly
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
            .cast("decimal(30,4)").cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // -- filter + projection + computed column (all pushdown-able)
    "q02_filter_project" -> ((s, dir) => {
      T(s, dir, "part")
        .filter(col("p_size").isin(1, 5, 10, 15, 20) &&
          col("p_type").like("S%") && col("p_retailprice") > 500.0)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          col("p_brand"), col("p_type"), col("p_size"),
          (col("p_retailprice") * 0.9).as("discounted"))
        .orderBy("p_partkey")
    }),

    // -- star join: fact × 2 shuffle joins × 2 broadcast dims
    "q03_star_join_revenue" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .groupBy("n_name")
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("n_name")
    }),

    // -- left-semi join (EXISTS)
    "q04_semi_join" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // -- left-anti join (NOT EXISTS)
    "q05_anti_join" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // -- theta (non-equi band) join: BroadcastNestedLoopJoin on the small side
    "q06_theta_join" -> ((s, dir) => {
      val su = T(s, dir, "supplier").select("s_suppkey", "s_acctbal")
      val c = T(s, dir, "customer").select("c_custkey", "c_acctbal")
      broadcast(su)
        .join(c, col("c_acctbal") > col("s_acctbal") &&
          col("c_acctbal") - col("s_acctbal") < 100.0, "left")
        .groupBy("s_suppkey")
        .agg(count(col("c_custkey")).as("n_near_richer"))
        .orderBy("s_suppkey")
    }),

    // -- window: top-3 orders per customer
    "q07_window_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // -- window: running total (exact via decimal), lag, rank
    "q08_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wr = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("run_total"),
          lag(col("o_totalprice"), 1).over(
            Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey")))
            .as("prev_price"),
          row_number().over(wr).as("price_rank"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // -- rollup (grouping sets)
    "q09_rollup_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // -- cube: all grouping-set combinations (rollup's sibling, q09)
    "q24_cube_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // -- map functions over parsed JSON: from_json to map, keys/values,
    //    element_at, transform_values (map HOF)
    "q25_map_funcs" -> ((s, dir) => {
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))
      T(s, dir, "events")
        .select(col("event_id"), m.as("m"))
        .select(
          col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_str"),
          element_at(transform_values(col("m"), (_, v) => v * 2), "k").as("k_doubled"),
          aggregate(map_values(col("m")), lit(0), (a, v) => a + v).as("vals_sum"))
        .orderBy("event_id")
        .limit(2000)
    }),

    // -- percentile aggregates: exact interpolated quantiles (the
    //    approx_percentile sketch is the 100 TB path; the exact form is
    //    the oracle-checkable one, like q48 vs q49). The 1e-6 bias is
    //    above double ulp at this magnitude and far below the rounding
    //    grain — it moves interpolated values off exact .xx5 boundaries
    //    identically in both engines (see TextAnalysis.qualityScore).
    "q26_percentiles" -> ((s, dir) => {
      def pct(p: Double) = round(
        call_function("percentile", col("o_totalprice"), lit(p)) + lit(1e-6), 2)
      T(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          pct(0.5).as("p50"),
          pct(0.9).as("p90"),
          pct(0.99).as("p99"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // -- distinct aggregates
    "q10_distinct_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          sum_distinct(dec(col("l_quantity"))).cast("double").as("sum_distinct_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // -- approximate distinct (HLL++); engine-specific sketch ⇒ no SQL oracle
    "q11_approx_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"))
        .orderBy("l_returnflag")
    }),

    // -- set operations: INTERSECT / EXCEPT / UNION ALL
    "q12_set_ops" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      val b = o.select(col("o_custkey").as("k"))
      val x = c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("k"))
      val y = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      a.intersect(b).union(x.except(y)).orderBy("k")
    }),

    // -- string functions
    "q13_string_funcs" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_type"), 1, 4).as("type4"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        regexp_replace(col("p_name"), "a", "@").as("repl"),
        length(col("p_name")).as("len"),
        levenshtein(col("p_brand"), lit("Brand#10")).as("lev"),
        regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brandnum"),
        lpad(col("p_brand"), 10, "*").as("padded"),
        element_at(split(col("p_brand"), "#"), 2).as("brand_no"))
        .orderBy("p_partkey")
    }),

    // -- date/time functions
    "q14_date_funcs" -> ((s, dir) => {
      T(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("mon_ts"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          unix_timestamp(col("o_orderdate")).as("unix_ts"),
          to_date(col("o_orderdate")).as("od"),
          add_months(to_date(col("o_orderdate")), 1).as("next_month"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")
    }),

    // -- math functions
    "q15_math_funcs" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000.0).as("dist1000"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        round(col("p_retailprice"), 1).as("r1"),
        sqrt(col("p_retailprice")).as("sq"),
        pow(lit(2.0), pmod(col("p_partkey"), lit(10))).as("p2"),
        pmod(col("p_partkey"), lit(7)).as("m7"),
        greatest(col("p_retailprice"), lit(900.0)).as("g"),
        least(col("p_retailprice"), lit(900.0)).as("l"))
        .orderBy("p_partkey")
    }),

    // -- array / higher-order functions
    "q16_array_funcs" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      T(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        array_contains(toks, "spark").as("has_spark"),
        element_at(toks, 1).as("first_token"),
        // arrays stay internal: the driver's comparator can't sort
        // top-level array columns, so the slice is emitted serialized
        concat_ws("|", slice(array_sort(toks), 1, 3)).as("top3_str"),
        size(filter(toks, t => length(t) > 5)).as("n_long"))
        .orderBy("doc_id")
    }),

    // -- JSON extraction over events.props
    "q17_json_events" -> ((s, dir) => {
      T(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // -- global top-k (sort + limit; Spark runs TakeOrderedAndProject)
    "q18_global_topk" -> ((s, dir) => {
      T(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // -- event-time tumbling window aggregation
    "q19_time_window_agg" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // -- sessionization (batch form: gap > 30 min starts a new session)
    "q20_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("new_s")).as("n_sessions"))
        .orderBy("user_id")
    }),

    // -- streaming surface driven in batch mode: the flatMapGroupsWithState
    //    sessionizer from graft.streaming.Streams (batch contract — the
    //    trailing session closes at end of input; the streaming deployment
    //    uses Streams.sessionizeStreaming, which closes sessions by
    //    event-time timeout instead). Emits one row per session, unlike
    //    q20's per-user counts.
    "q22_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val ev = T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .as[graft.streaming.Streams.Event]
      graft.streaming.Streams.sessionize(ev, gapMinutes = 30).toDF()
        .select(col("user_id"), col("n_events"),
          col("start").as("session_start"), col("end").as("session_end"))
        .orderBy("user_id", "session_start")
    }),

    // -- streaming windowed aggregation driven in batch mode: the
    //    watermarked tumbling-window agg from graft.streaming.Streams
    //    (window() + watermark are the same expressions either way; value
    //    is pre-cast to decimal so the sum is order-independent and
    //    oracle-hashable)
    "q23_stream_hourly" -> ((s, dir) => {
      val ev = T(s, dir, "events").withColumn("value", dec(col("value")))
      graft.streaming.Streams.hourlyTypeCounts(ev)
        .withColumn("sum_value", col("sum_value").cast("double"))
        .orderBy("hour", "event_type")
    }),

    // -- built-in session_window sessionization driven in batch mode
    //    (the declarative sibling of q22's flatMapGroupsWithState form;
    //    identical expression on a stream, where the watermark closes
    //    windows). Emits one row per session with the half-open
    //    [first, last+gap) window bounds.
    "q72_session_window" -> ((s, dir) => {
      graft.streaming.Streams.sessionWindowCounts(
        T(s, dir, "events"), gapMinutes = 30)
        .orderBy("user_id", "session_start")
    }),

    // -- interval join through the STREAMING operator in batch mode
    //    (Streams.intervalJoinStreams — watermarks become no-ops): each
    //    event joined to the SAME user's events in the hour before it
    //    (events self-join; the orders table lives in a disjoint decade,
    //    so an events×orders interval is always empty). Oracle-verifies
    //    the time-bound join condition, which StreamsSpec exercises
    //    across micro-batches but cannot hash-check against DuckDB.
    "q76_interval_join" -> ((s, dir) => {
      val e = T(s, dir, "events").select("event_id", "user_id", "ts")
      val prior = T(s, dir, "events").select(
        col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      graft.streaming.Streams.intervalJoinStreams(e, prior,
        leftKey = "user_id", rightKey = "p_user",
        leftTime = "ts", rightTime = "p_ts", maxLag = "1 hour")
        .filter(col("p_id") =!= col("event_id")) // a row always matches itself
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_prior"), max(col("p_id")).as("last_prior"))
        .orderBy("event_id")
    }),

    // -- as-of join: latest order at-or-before each event, per user.
    //    union+window (graft.ops.AsOf), NOT join-then-rank: the fan-out
    //    join materializes every (event, earlier order) pair first —
    //    O(events × orders/user) rows at 100 TB; this is one shuffle and
    //    exactly |events| output rows.
    "q21_asof_join" -> ((s, dir) => {
      val e = T(s, dir, "events").select("event_id", "user_id", "ts")
      val o = T(s, dir, "orders")
      graft.ops.AsOf.asof(e, o,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "o_custkey", rightTime = "o_orderdate",
        payload = Seq("o_orderkey" -> "last_order", "o_totalprice" -> "last_price"),
        tieBreak = Seq("o_orderkey"))
        .select("event_id", "user_id", "last_order", "last_price")
        .orderBy("event_id")
    }),

    // -- as-of join under the hot-key guard: same query as q21 but
    //    windowed by (key, 1-day time bucket) with cross-bucket carry-in
    //    (AsOf.timeBucketSeconds) — the code path a 100 TB deployment
    //    with one dominant key needs, since the default plan serializes a
    //    key's whole timeline through one task. Results are provably
    //    identical to q21's, so the oracle is q21's verbatim.
    "q67_asof_bucketed" -> ((s, dir) => {
      val e = T(s, dir, "events").select("event_id", "user_id", "ts")
      val o = T(s, dir, "orders")
      graft.ops.AsOf.asof(e, o,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "o_custkey", rightTime = "o_orderdate",
        payload = Seq("o_orderkey" -> "last_order", "o_totalprice" -> "last_price"),
        tieBreak = Seq("o_orderkey"),
        timeBucketSeconds = Some(86400L))
        .select("event_id", "user_id", "last_order", "last_price")
        .orderBy("event_id")
    }),

    // -- bag-semantics set ops: intersectAll / exceptAll preserve
    //    duplicates (q12 covers only the distinct forms). Both legs are
    //    tagged so one result carries both operators; orders.o_custkey
    //    repeats, so the bags genuinely contain duplicates.
    "q36_bag_set_ops" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
      val b = o.filter(col("o_totalprice") > 100000.0).select(col("o_custkey").as("k"))
      a.intersectAll(b).withColumn("op", lit("i"))
        .unionByName(a.exceptAll(b).withColumn("op", lit("e")))
        .orderBy("k", "op")
    }),

    // -- window ranking/navigation functions q07/q08/q20 don't cover:
    //    ntile, lead, first_value, last_value (full frame), dense_rank
    "q37_window_rank_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(wFull).as("last_order"),
          dense_rank().over(
            Window.partitionBy("o_custkey").orderBy(col("o_orderdate")))
            .as("date_rank"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // -- correlated scalar subqueries (Catalyst decorrelates to joins):
    //    inline per-customer aggregates over orders
    "q81_scalar_subquery" -> ((s, dir) => {
      val vc = s"cust_ss_${math.abs(dir.hashCode)}"
      val vo = s"ord_ss_${math.abs(dir.hashCode)}"
      T(s, dir, "customer").createOrReplaceTempView(vc)
      T(s, dir, "orders").createOrReplaceTempView(vo)
      s.sql(
        s"""SELECT c_custkey, c_name,
           |  (SELECT max(o_totalprice) FROM $vo WHERE o_custkey = c_custkey) AS max_price,
           |  (SELECT count(*) FROM $vo WHERE o_custkey = c_custkey) AS n_orders
           |FROM $vc ORDER BY c_custkey""".stripMargin)
    }),

    // -- correlated LATERAL subquery with per-row ORDER BY + LIMIT
    //    (top-2 orders per customer through the lateral-join surface —
    //    the SQL twin of q07's window top-k)
    "q82_lateral_join" -> ((s, dir) => {
      val vc = s"cust_lj_${math.abs(dir.hashCode)}"
      val vo = s"ord_lj_${math.abs(dir.hashCode)}"
      T(s, dir, "customer").createOrReplaceTempView(vc)
      T(s, dir, "orders").createOrReplaceTempView(vo)
      s.sql(
        s"""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           |FROM $vc c, LATERAL (
           |  SELECT o_orderkey, o_totalprice FROM $vo
           |  WHERE o_custkey = c.c_custkey
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
           |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }),

    // -- partitioned data layout + dynamic partition pruning: the fact
    //    side is a DATE-PARTITIONED copy of events (Sources.
    //    writePartitioned — at 100 TB the layout, not the query, is
    //    what bounds the scan); the dim side is a filtered date set
    //    with no literal predicate on the fact, so only Catalyst's
    //    PartitionPruning rule (a dynamicpruning subquery on the
    //    partition column, pinned in PlanSpec) keeps the scan from
    //    reading every partition.
    "q84_partitioned_dpp" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      // fixture keyed on the source parquet's identity, written once per
      // sf dir (same pattern + rationale as q34's csv/json fixtures)
      val fix = Tables.fixturePath("graft-part", s"$dir/events.parquet")
      if (!new java.io.File(s"$fix/_SUCCESS").exists())
        graft.sources.Sources.writePartitioned(
          ev.withColumn("event_date", to_date(col("ts"))), fix, Seq("event_date"))
      val fact = s.read.parquet(fix)
      val dim = ev.select(to_date(col("ts")).as("d")).distinct()
        .filter(dayofmonth(col("d")) <= 3) // the selective dim predicate DPP needs
      fact.join(dim, col("event_date") === col("d"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // -- range-clustered layout: files cover disjoint ts ranges (one
    //    range exchange at write), so the time filter's scan skips
    //    whole files/row-groups via parquet min/max stats; SourcesSpec
    //    pins the disjoint-range property
    "q94_clustered_scan" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val fix = Tables.fixturePath("graft-clus", s"$dir/events.parquet")
      if (!new java.io.File(s"$fix/_SUCCESS").exists())
        graft.sources.Sources.writeClustered(ev, fix, Seq("ts"))
      s.read.parquet(fix)
        .filter(col("ts") >= lit("2024-01-10 00:00:00") &&
          col("ts") < lit("2024-01-20 00:00:00"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // -- Z-ORDERED layout: q94's multi-dimensional sibling. The events
    //    table is laid out along a Morton curve over (user_id, value) —
    //    equi-depth quantile buckets per column, bit-interleaved, one
    //    range exchange — so a range predicate on EITHER column (or
    //    both, as here) skips files/row-groups via parquet min/max
    //    stats; a lexicographic sort would serve only its leading
    //    column. SourcesSpec pins the per-file-spread property that
    //    makes the skipping real; the oracle pins content.
    "q123_zorder_scan" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val fix = Tables.fixturePath("graft-zord", s"$dir/events.parquet")
      if (!new java.io.File(s"$fix/_SUCCESS").exists())
        graft.sources.Sources.writeZOrdered(
          ev.select("event_id", "user_id", "event_type", "value"),
          fix, Seq("user_id", "value"), bitsPerCol = 8)
      s.read.parquet(fix)
        .filter(col("user_id") <= 5 &&
          col("value").between(50.0, 150.0)) // 2-dim range = the z-shape
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // -- pivot: long→wide with an EXPLICIT value list (letting Spark
    //    discover values adds a collect job and non-deterministic column
    //    order); decimal-exact sums cast to double like every other agg
    "q79_pivot" -> ((s, dir) => {
      T(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .groupBy("yr")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .orderBy("yr")
    }),

    // -- unpivot (melt): wide→long, the inverse surface
    "q80_unpivot" -> ((s, dir) => {
      T(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size_d"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size_d")),
          "metric", "value")
        .orderBy("p_partkey", "metric")
    }),

    // -- explicit GROUPING SETS + grouping() markers, through the
    //    spark.sql STRING surface (the API the reference hands its SQL
    //    to — every other entry drives the DataFrame API): rollup/cube
    //    (q09/q24) can't express this asymmetric set list
    "q38_grouping_sets" -> ((s, dir) => {
      val v = s"li_gs_${math.abs(dir.hashCode)}"
      T(s, dir, "lineitem").createOrReplaceTempView(v)
      s.sql(
        s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
           |  CAST(grouping(l_linestatus) AS INT) AS g_ls
           |FROM $v
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    }),

    // -- RANGE-frame window (value-based, not row-based): every other
    //    window in the battery uses ROWS frames. Range frames include
    //    ALL peers of the boundary value, so the aggregate is
    //    deterministic even where prices tie.
    //    EXECUTION WARNING the partition choice encodes: Spark's sliding
    //    range frame has no aggregate retraction — it re-evaluates the
    //    whole frame per row, O(rows × frame width) per partition. An
    //    early cut of this query partitioned by o_orderstatus (3 × 50k
    //    rows, wide frames) and ran 120+ s at sf0.1; per-customer
    //    partitions keep frames a handful of rows.
    "q39_range_window" -> ((s, dir) => {
      val v = s"ord_rw_${math.abs(dir.hashCode)}"
      T(s, dir, "orders").createOrReplaceTempView(v)
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_totalprice,
           |  count(*) OVER w AS n_within_50k,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_within_50k
           |FROM $v
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
           |  RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
           |ORDER BY o_orderkey""".stripMargin)
    }),

    // -- salted skewed join (graft.ops.Skew): lineitem keyed by
    //    l_returnflag is a deliberately pathological distribution — 3
    //    distinct keys over the whole table, so an unsalted shuffled join
    //    would land ~1/3 of the table on each of THREE reducers no matter
    //    how many executors exist. saltedJoin spreads each key over 8
    //    sub-keys. Results are provably salt-invariant; the oracle is the
    //    plain join.
    "q27_salted_join" -> ((s, dir) => {
      import s.implicits._
      val rates = Seq(("A", 0.05), ("N", 0.10), ("R", 0.15))
        .toDF("flag", "rate")
      val big = T(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), dec(col("l_quantity")).as("qty"))
      graft.ops.Skew.saltedJoin(big, rates, "flag", salts = 8)
        .groupBy("flag", "rate")
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
        .select(col("flag"), col("rate"), col("n"),
          round(col("sq").cast("double") * col("rate"), 2).as("weighted_qty"))
        .orderBy("flag")
    }),

    // -- bucketed co-located join (graft.sources.writeBucketed): both
    //    sides pre-shuffled into 8 buckets on the join key at WRITE time,
    //    so the join (and the groupBy on the same key) runs with ZERO
    //    exchanges — the pay-once-shuffle-at-ingest half of the 100 TB
    //    toolkit (PlanSpec pins the exchange-free plan). Table names are
    //    per-SF so scale factors don't cross-contaminate; Overwrite makes
    //    re-runs idempotent.
    "q28_bucketed_join" -> ((s, dir) => {
      val tag = math.abs(dir.hashCode).toString
      val oT = s"graft_bk_orders_$tag"
      val cT = s"graft_bk_customer_$tag"
      graft.sources.Sources.writeBucketed(
        T(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        oT, "o_custkey", buckets = 8)
      graft.sources.Sources.writeBucketed(
        T(s, dir, "customer").select("c_custkey", "c_name"),
        cT, "c_custkey", buckets = 8)
      s.table(oT).join(s.table(cT), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("c_custkey")
    }),

    // -- approx-percentile audit: the sketch percentile (the 100 TB path
    //    q26's exact form stands in for) bounded against the exact
    //    interpolated quantile in one pass. approx_percentile with
    //    accuracy 10⁴ is deterministic; the tolerance is generous (5% of
    //    the group's value range) so the audit pins gross sketch
    //    breakage, not implementation-defined interpolation detail.
    "q65_approx_pct_audit" -> ((s, dir) => {
      val pcts = Seq(0.5, 0.9, 0.99)
      val o = T(s, dir, "orders")
      val aggs =
        pcts.map(p => call_function("approx_percentile",
          col("o_totalprice"), lit(p), lit(10000)).as(s"a${(p * 100).toInt}")) ++
          pcts.map(p => call_function("percentile",
            col("o_totalprice"), lit(p)).as(s"e${(p * 100).toInt}")) ++
          Seq((max(col("o_totalprice")) - min(col("o_totalprice"))).as("range"))
      val checked = o.groupBy("o_orderstatus").agg(aggs.head, aggs.tail: _*)
      val bad = pcts.map(p => {
        val (a, e) = (col(s"a${(p * 100).toInt}"), col(s"e${(p * 100).toInt}"))
        abs(a - e) > col("range") * 0.05
      }).reduce(_ || _)
      checked.filter(bad)
        .select(col("o_orderstatus"), lit("pct_out_of_bounds").as("violation"))
        .orderBy("o_orderstatus")
    }),

    // -- deterministic hash-split sampling: the train/holdout assignment
    //    a training pipeline runs over every document. The split hashes
    //    the KEY with plain arithmetic (expressible in any engine, unlike
    //    xxhash64), so assignment is stable across runs, partitionings
    //    and engines — sample-by-rand never is. Emits per-split counts
    //    plus the holdout slice itself.
    "q66_hash_split" -> ((s, dir) => {
      val h = graft.ops.TrainingPrep.idHash(col("doc_id"))
      T(s, dir, "documents")
        .withColumn("split",
          when(h % 100 < 90, lit("train")).otherwise(lit("holdout")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"))
        .orderBy("split")
    }),

    // -- HLL audit: q11's approx_count_distinct checked against the exact
    //    count in one pass; emits groups whose relative error exceeds 3×
    //    the default 5% rsd (violations — empty for a healthy sketch, and
    //    deterministic because Spark's HLL++ is). Converts q11's
    //    rows-only check into a hash-verified invariant.
    "q29_hll_audit" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .filter(abs(col("approx_orders") - col("exact_orders")) >
          col("exact_orders") * lit(0.15))
        .orderBy("l_returnflag")
    }),

    // -- PERSISTED-SKETCH ROLLUP (the 100 TB pre-aggregation pattern):
    //    per-(flag, ship-day) HLL sketches are materialized once — the
    //    stored binary datasketches column a warehouse keeps per
    //    partition — and any distinct-count query over a flag UNIONS the
    //    stored sketches (hll_union_agg) instead of rescanning raw rows.
    //    Audit: the rolled-up estimate must meet the SAME accuracy bar
    //    as the direct one-pass sketch — within 5% of the exact distinct
    //    count — plus a 3% drift band between rollup and direct. The
    //    union is NOT register-exact: tiny per-day sketches stay in
    //    sparse/coupon mode and the union gadget promotes them through
    //    an HLL_8 internal target before re-estimating, so rollup and
    //    direct genuinely diverge ~1% (measured 0.96–1.08% at sf0.01).
    //    The daily sketch table goes through a REAL parquet write/read
    //    (BinaryType sketch column), pinning the warehouse round-trip.
    "q129_hll_rollup" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val skPath = Tables.scratchPath("graft-hllsk", dir)
      li.groupBy(col("l_returnflag"), col("l_shipdate"))
        .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
        .write.mode("overwrite").parquet(skPath) // the stored sketch table
      val daily = s.read.parquet(skPath)
      val rolled = daily.groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_rollup"))
      val direct = li.groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))")
          .as("est_direct"),
          countDistinct(col("l_orderkey")).as("exact"))
      rolled.join(direct, "l_returnflag")
        // rollup accuracy pinned to the 5%-of-exact bar the direct
        // sketch already meets; 3% rollup-vs-direct band detects union
        // drift regressions without asserting register-exactness
        .filter(
          abs(col("est_rollup") - col("exact")) > col("exact") * lit(0.05) ||
          abs(col("est_rollup") - col("est_direct")) >
            col("est_direct") * lit(0.03) ||
          abs(col("est_direct") - col("exact")) > col("exact") * lit(0.05))
        .select(col("l_returnflag"), lit("hll_rollup_violation").as("violation"))
        .orderBy("l_returnflag")
    }),

    // -- VARIANT semi-structured access (Spark 4): a nested JSON doc is
    //    parsed ONCE into the binary VARIANT encoding and fields come out
    //    via typed variant_get paths — the lakehouse replacement for
    //    per-field get_json_object re-parsing. Pins the parse → typed
    //    extraction round-trip (bigint/string/int/double), a NESTED
    //    path, and missing-path null semantics against an oracle that
    //    reads the same values straight from the source columns.
    "q130_variant_events" -> ((s, dir) => {
      val ev = widened(T(s, dir, "events")) // parse_json is per-row CPU
      val doc = to_json(struct(
        struct(col("user_id").as("id"), col("event_type").as("kind"))
          .as("user"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value").as("v")))
      ev.select(col("event_id"), parse_json(doc).as("var"))
        .select(col("event_id"),
          expr("variant_get(var, '$.user.id', 'bigint')").as("uid"),
          expr("variant_get(var, '$.user.kind', 'string')").as("kind"),
          expr("variant_get(var, '$.k', 'int')").as("k"),
          round(expr("variant_get(var, '$.v', 'double')"), 4).as("v"),
          expr("variant_get(var, '$.missing', 'string')").as("absent"))
        .orderBy("event_id")
    }),

    // -- recursive CTE (Spark 4's WITH RECURSIVE — iterative UnionLoop
    //    execution, each level one more join over the previous
    //    frontier): nation read as an implicit binary tree
    //    (parent(k) = (k-1) DIV 2, root 0) and traversed from the root,
    //    carrying per-node depth and the root-path region-key sum —
    //    the org-chart / BOM-explosion query shape relational engines
    //    are asked for; DuckDB replays with its own WITH RECURSIVE.
    "q137_recursive_cte" -> ((s, dir) => {
      T(s, dir, "nation").createOrReplaceTempView("q137_nation")
      s.sql(
        """WITH RECURSIVE tree AS (
          |  SELECT n_nationkey AS key, 0 AS depth,
          |         CAST(n_regionkey AS BIGINT) AS path_sum
          |  FROM q137_nation WHERE n_nationkey = 0
          |  UNION ALL
          |  SELECT n.n_nationkey AS key, t.depth + 1 AS depth,
          |         t.path_sum + n.n_regionkey AS path_sum
          |  FROM q137_nation n JOIN tree t
          |    ON (n.n_nationkey - 1) DIV 2 = t.key
          |  WHERE n.n_nationkey > 0)
          |SELECT key, depth, path_sum FROM tree ORDER BY key""".stripMargin)
    }),

    // -- theta set-algebra sketches (the fourth persisted-sketch
    //    family member: q129 HLL = distinct rollup, q132 MG = heavy
    //    hitters, q133 = distributions, theta = SET ALGEBRA): one
    //    sketch of l_orderkey per returnflag is STORED through a real
    //    parquet round-trip, then |A∪N∪R|, |A∩R|, and |A\R| are
    //    estimated from the stored bytes alone — the segment-overlap
    //    question HLL structurally cannot answer. Audited vs exact
    //    distinct counts: union within 5% (single-sketch rse ~1.6% at
    //    lgK=12), intersection/difference within 10% (error scales
    //    with |A∪B|/|A∩B| per the theta framework). Violations =
    //    empty relation.
    "q139_theta_audit" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      import graft.functions.ThetaSketch
      val li = T(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_orderkey").cast("string").as("ok"))
      val skPath = Tables.scratchPath("graft-theta", dir)
      li.groupBy("flag")
        .agg(ThetaSketch.thetaSketch(col("ok")).as("sk"))
        .write.mode("overwrite").parquet(skPath) // the stored sketch table
      val stored = s.read.parquet(skPath)
      val estUnion = stored.agg(ThetaSketch.thetaEstimate(
        ThetaSketch.thetaUnion(col("sk"))).as("e")).head().getDouble(0)
      val estInt = stored.filter(col("flag").isin("A", "R"))
        .agg(ThetaSketch.thetaEstimate(
          ThetaSketch.thetaIntersect(col("sk"))).as("e")).head().getDouble(0)
      val estDiff = stored.filter(col("flag") === "A").select(col("sk").as("a"))
        .crossJoin(stored.filter(col("flag") === "R").select(col("sk").as("r")))
        .select(ThetaSketch.thetaEstimate(
          ThetaSketch.thetaANotB(col("a"), col("r"))).as("e"))
        .head().getDouble(0)
      // exact side in ONE pass (r16 verdict, optional item): per-key
      // membership flags from a single groupBy, then all three set
      // cardinalities as conditional sums — replaces five distinct
      // scans plus INTERSECT/EXCEPT set-op shuffles; exact stays
      // exact, bands unchanged, linear at any corpus scale
      val ex = li.groupBy("ok").agg(
          max(when(col("flag") === "A", 1).otherwise(0)).as("in_a"),
          max(when(col("flag") === "R", 1).otherwise(0)).as("in_r"))
        .agg(count(lit(1)).as("u"),
          // coalesce: sum over ZERO groups is null, and the replaced
          // distinct/intersect/except code returned 0 on an empty
          // corpus — keep that domain
          coalesce(sum(col("in_a") * col("in_r")), lit(0L)).as("i"),
          coalesce(sum(col("in_a") * (lit(1) - col("in_r"))), lit(0L))
            .as("d"))
        .head()
      val exactUnion = ex.getLong(0).toDouble
      val exactInt = ex.getLong(1).toDouble
      val exactDiff = ex.getLong(2).toDouble
      Seq(("union", estUnion, exactUnion, 0.05),
        ("intersect", estInt, exactInt, 0.10),
        ("diff", estDiff, exactDiff, 0.10))
        .toDF("op", "est", "exact", "bound")
        .filter(abs(col("est") - col("exact")) > col("bound") * col("exact"))
        .select(col("op"), lit("estimate_out_of_band").as("violation"))
        .orderBy("op")
    }),

    // -- q139's theta set algebra driven ENTIRELY through the plain
    //    spark.sql string surface (the q131/q135 pattern): an
    //    extract_query author gets sketch build, storage, and
    //    union/intersect/difference reads over the stored bytes with
    //    zero Scala Columns. Same audit bands as q139 (union 5% —
    //    single-sketch rse ~1.6% at lgK=12 — intersect/diff 10%);
    //    violations = empty relation. Anti-vacuity (r15 advice): the
    //    final check anchors on a FIXED op list — a missing 'A'/'R'
    //    sketch empties the intersect/diff estimate legs, and an
    //    absent-or-null estimate surfaces as a 'missing_input' row
    //    instead of an inner join silently dropping the op.
    "q141_theta_sql" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      T(s, dir, "lineitem").createOrReplaceTempView("q141_li")
      val skPath = Tables.scratchPath("graft-thetasql", dir)
      // BUILD via SQL string: one stored sketch per returnflag
      s.sql(
        """SELECT l_returnflag AS flag, theta_sketch_agg(l_orderkey) AS sk
          |FROM q141_li GROUP BY l_returnflag""".stripMargin)
        .write.mode("overwrite").parquet(skPath)
      s.read.parquet(skPath).createOrReplaceTempView("q141_sk")
      thetaSqlAudit(s, "q141_li", "q141_sk")
    }),

    // -- streaming drift alerting in BATCH mode (the q72 pattern for
    //    windowedDriftAlert): the one-aggregation stream operator —
    //    whose custom Aggregator folds the (nbins+2) counter buffer and
    //    replays histPsi's exact fold in finish — evaluates the same
    //    plan shape over a batch frame (the watermark is a no-op).
    //    Emitted rows are PARITY violations between the stream
    //    operator's alerts and the pure batch twin (histSketch per
    //    window + the histPsi column kernel, both sides filtered at the
    //    same threshold): any window where n, the histogram, or the
    //    BITWISE psi differ. Oracle = empty relation; StreamsSpec
    //    drives the same operator through a real micro-batched stream.
    "q142_drift_alert_batch" -> ((s, dir) => {
      import graft.ops.Profiling
      val ev = T(s, dir, "events")
      val (lo, hi, nbins, threshold) = (0.0, 500.0, 8, 0.25)
      // reference profile: the corpus's own global value distribution
      // (sorted-key ListMap — windowedDriftAlert's bitwise-parity
      // contract); <= nbins+2 rows reach the driver
      val refRows = Profiling.histSketch(ev, "value", lo, hi, nbins, Seq.empty)
        .select(explode(col("hist")).as(Seq("bin", "cnt"))).collect()
      val ref = scala.collection.immutable.ListMap(
        refRows.toSeq.map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1): _*)
      val alerts = graft.streaming.Streams.windowedDriftAlert(
        ev, "value", lo, hi, nbins, ref, threshold)
      val twin = Profiling.histSketch(
          ev.filter(col("value").isNotNull)
            .withColumn("w", window(col("ts"), "1 hour")),
          "value", lo, hi, nbins, Seq("w"))
        .select(col("w.start").as("window_start"),
          aggregate(map_values(col("hist")), lit(0L), (a, c) => a + c).as("n"),
          col("hist"),
          Profiling.histPsi(col("hist"), typedLit(ref)).as("psi"))
        .filter(col("psi") > lit(threshold))
      def canon(df: org.apache.spark.sql.DataFrame, src: String) =
        df.select(col("window_start"), col("n"),
          sort_array(map_entries(col("hist"))).as("h"), col("psi"),
          lit(src).as("src"))
      canon(alerts, "alert").unionByName(canon(twin, "batch"))
        .groupBy("window_start", "n", "h", "psi")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") =!= 2) // present on exactly one side = drift
        .select(col("window_start"), lit("alert_parity").as("violation"))
        .orderBy("window_start")
    }),

    // -- KLL quantile sketches (graft.functions.KllSketch) — the
    //    rank/quantile member of the persisted-sketch family, driven
    //    ENTIRELY through spark.sql strings (the q141 pattern): build
    //    per-returnflag sketches over l_extendedprice, store through
    //    parquet, merge-read corpus quantiles from the BYTES alone.
    //    The audit is in RANK SPACE — KLL bounds |est_rank − true_rank|
    //    (≈1.65% at k=200, 99% conf), never the value, so each probe
    //    quantile v̂ is checked by computing v̂'s TRUE rank over the
    //    corpus and demanding |true_rank(v̂) − q| ≤ 0.035 (2ε), plus
    //    the sketch's own rank of v̂ within the same band, plus kll_n
    //    EXACTLY equal to count(*) (KLL counts updates precisely).
    //    Compaction is randomized, so estimates vary run to run inside
    //    the band — violations relation, never an estimate hash.
    "q144_kll_quantiles" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      T(s, dir, "lineitem").createOrReplaceTempView("q144_li")
      val skPath = Tables.scratchPath("graft-kllsql", dir)
      // BUILD via SQL string: one stored sketch per returnflag
      s.sql(
        """SELECT l_returnflag AS flag, kll_sketch_agg(l_extendedprice) AS sk
          |FROM q144_li GROUP BY l_returnflag""".stripMargin)
        .write.mode("overwrite").parquet(skPath)
      s.read.parquet(skPath).createOrReplaceTempView("q144_sk")
      // SINGLE-PASS audit (r16 verdict, optional item): the previous
      // `est CROSS JOIN q144_li` emitted every corpus row 7× into the
      // partial aggregation (one copy per probe). Here the 7 ground-
      // truth ranks are 7 conditional averages over ONE 1× scan — each
      // probe's estimated value arrives as a non-correlated scalar
      // subquery (computed once from the ~KB sketch, inlined by
      // Catalyst) — then stack() pivots the 1-row result back to probe
      // rows for the identical band logic. Linear in the corpus with
      // no row multiplication: survives a 10× fixture unchanged.
      s.sql(
        """WITH merged AS (SELECT kll_merge_agg(sk) AS sk FROM q144_sk),
          |probes AS (SELECT col AS q FROM VALUES
          |  (0.01d), (0.10d), (0.25d), (0.50d), (0.75d), (0.90d), (0.99d)
          |  AS t(col)),
          |est AS (
          |  SELECT p.q,
          |    kll_quantile(m.sk, p.q) AS v,
          |    kll_rank(m.sk, kll_quantile(m.sk, p.q)) AS sk_rank,
          |    kll_n(m.sk) AS sk_n
          |  FROM probes p CROSS JOIN merged m),
          |scan AS (
          |  SELECT count(*) AS n,
          |    avg(CASE WHEN p <= (SELECT v FROM est WHERE q = 0.01d)
          |        THEN 1.0d ELSE 0.0d END) AS tr1,
          |    avg(CASE WHEN p <= (SELECT v FROM est WHERE q = 0.10d)
          |        THEN 1.0d ELSE 0.0d END) AS tr2,
          |    avg(CASE WHEN p <= (SELECT v FROM est WHERE q = 0.25d)
          |        THEN 1.0d ELSE 0.0d END) AS tr3,
          |    avg(CASE WHEN p <= (SELECT v FROM est WHERE q = 0.50d)
          |        THEN 1.0d ELSE 0.0d END) AS tr4,
          |    avg(CASE WHEN p <= (SELECT v FROM est WHERE q = 0.75d)
          |        THEN 1.0d ELSE 0.0d END) AS tr5,
          |    avg(CASE WHEN p <= (SELECT v FROM est WHERE q = 0.90d)
          |        THEN 1.0d ELSE 0.0d END) AS tr6,
          |    avg(CASE WHEN p <= (SELECT v FROM est WHERE q = 0.99d)
          |        THEN 1.0d ELSE 0.0d END) AS tr7
          |  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS p FROM q144_li)),
          |ranks AS (
          |  SELECT n, stack(7,
          |    0.01d, tr1, 0.10d, tr2, 0.25d, tr3, 0.50d, tr4,
          |    0.75d, tr5, 0.90d, tr6, 0.99d, tr7) AS (q, true_rank)
          |  FROM scan),
          |checked AS (
          |  SELECT e.q, e.sk_rank, e.sk_n, r.n, r.true_rank
          |  FROM est e JOIN ranks r USING (q))
          |SELECT q,
          |  CASE WHEN sk_n <> n THEN 'n_mismatch'
          |       WHEN abs(true_rank - q) > 0.035d THEN 'rank_out_of_band'
          |       ELSE 'self_rank_out_of_band' END AS violation
          |FROM checked
          |WHERE sk_n <> n OR abs(true_rank - q) > 0.035d
          |   OR abs(sk_rank - true_rank) > 0.035d
          |ORDER BY q""".stripMargin)
    }),

    // -- streaming quantile profiling in BATCH mode (the q142 pattern
    //    for Streams.windowedQuantiles): one KLL sketch per event-time
    //    window, probe quantiles read from the per-window bytes. The
    //    audit is the family's rank-space contract applied PER WINDOW,
    //    TIE-AWARE because hourly windows are small (13–18 events at
    //    sf0.01) and `value` has atoms: a value v̂ is a valid
    //    ε-quantile iff rank_<(v̂) ≤ q + ε AND rank_≤(v̂) ≥ q − ε —
    //    the one-sided |rank_≤ − q| form would flag any probe landing
    //    ON an atom, whose inclusive rank legitimately overshoots q by
    //    the atom's mass (the exact order statistic itself fails that
    //    test). Band is 2ε + 1/n (the 1/n term is rank discretization,
    //    irreducible by ANY sketch at window size n). Additionally
    //    each emitted n must equal the window's exact count, and the
    //    stored window sketches must merge-read to the corpus's exact
    //    total (the roll-up the bytes exist for). Violations relation;
    //    StreamsSpec drives the same operator through a real
    //    micro-batched stream with state-store round-trips.
    "q145_kll_windows" -> ((s, dir) => {
      import graft.functions.KllSketch
      val probes = Seq(0.25, 0.50, 0.75, 0.99)
      val ev = T(s, dir, "events").filter(col("value").isNotNull)
      val wq = graft.streaming.Streams.windowedQuantiles(ev, "value", probes)
      val est = wq.select(col("window_start"), col("n"),
        explode(col("quantiles")).as(Seq("q", "v")))
      val perWindow = est
        .join(ev.withColumn(
          "window_start", window(col("ts"), "1 hour")("start")),
          "window_start")
        .groupBy("window_start", "q", "n", "v")
        .agg(count(lit(1)).as("cnt"),
          avg(when(col("value") <= col("v"), 1.0d).otherwise(0.0d))
            .as("rank_le"),
          avg(when(col("value") < col("v"), 1.0d).otherwise(0.0d))
            .as("rank_lt"))
        .filter(col("n") =!= col("cnt") ||
          col("rank_lt") - col("q") > lit(0.035d) + lit(1.0d) / col("cnt") ||
          col("q") - col("rank_le") > lit(0.035d) + lit(1.0d) / col("cnt"))
        .select(col("window_start"), col("q"),
          when(col("n") =!= col("cnt"), lit("n_mismatch"))
            .otherwise(lit("rank_out_of_band")).as("violation"))
      val rollup = wq
        .agg(KllSketch.kllN(KllSketch.kllMerge(col("sk"))).as("rn"))
        .crossJoin(ev.agg(count(lit(1)).as("tot")))
        .filter(col("rn") =!= col("tot"))
        .select(lit(null).cast("timestamp").as("window_start"),
          lit(null).cast("double").as("q"),
          lit("rollup_n_mismatch").as("violation"))
      // audit-premise guard (r16 advice): the band is DETERMINISTIC
      // only while every window sketch is in exact mode (never
      // compacted — retained == n); past capacity the randomized
      // compactor makes the band probabilistic (~99% per check) and a
      // denser fixture would flake instead of failing for a reason.
      // This row names the fix: re-widen the band or shrink windows.
      val capacity = wq
        .filter(KllSketch.kllRetained(col("sk")) =!= col("n"))
        .select(col("window_start"), lit(null).cast("double").as("q"),
          lit("window_past_exact_capacity_rewiden_band").as("violation"))
      perWindow.unionByName(rollup).unionByName(capacity)
        .orderBy("window_start", "q")
    }),

    // -- KS drift over STORED KLL bytes (the monitoring question for
    //    metrics with NO declared range — hist_psi's q142 role when
    //    nobody configured a binning): three sketches built and stored
    //    through parquet via plain spark.sql — a reference era (even
    //    event_ids), a same-distribution current era (odd event_ids),
    //    and a shifted current era (odd, value + 500) — then the drift
    //    test kll_ks > kll_ks_threshold(p=1e-6) read from bytes alone.
    //    The audit demands the test SEPARATE: no drift detected
    //    between the two same-distribution halves (the threshold
    //    covers two-sample sampling noise + both sketches' rank
    //    error, so this is deterministic up to p=1e-6), drift
    //    DETECTED for the shifted era (the +500 shift pushes the
    //    CDFs nearly disjoint, delta ≈ 1 >> any threshold), and both
    //    deltas inside [0, 1]. Violations relation, empty oracle.
    "q146_kll_drift" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      T(s, dir, "events").filter(col("value").isNotNull)
        .createOrReplaceTempView("q146_ev")
      val skPath = Tables.scratchPath("graft-kllks", dir)
      s.sql(
        """SELECT era, kll_sketch_agg(v) AS sk FROM (
          |  SELECT CASE WHEN event_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS era,
          |         CAST(value AS DOUBLE) AS v FROM q146_ev
          |  UNION ALL
          |  SELECT 'shifted' AS era, CAST(value AS DOUBLE) + 500.0d AS v
          |  FROM q146_ev WHERE event_id % 2 = 1)
          |GROUP BY era""".stripMargin)
        .write.mode("overwrite").parquet(skPath)
      s.read.parquet(skPath).createOrReplaceTempView("q146_sk")
      s.sql(
        """WITH pairs AS (
          |  SELECT c.era,
          |    kll_ks(r.sk, c.sk) AS delta,
          |    kll_ks_threshold(r.sk, c.sk, 1e-6d) AS thr
          |  FROM (SELECT sk FROM q146_sk WHERE era = 'ref') r
          |  CROSS JOIN (SELECT era, sk FROM q146_sk WHERE era <> 'ref') c)
          |SELECT era,
          |  CASE WHEN delta IS NULL OR delta < 0.0d OR delta > 1.0d
          |         THEN 'delta_out_of_range'
          |       WHEN era = 'cur' AND delta > thr THEN 'false_alarm'
          |       ELSE 'missed_drift' END AS violation
          |FROM pairs
          |WHERE delta IS NULL OR delta < 0.0d OR delta > 1.0d
          |   OR (era = 'cur' AND delta > thr)
          |   OR (era = 'shifted' AND delta <= thr)
          |ORDER BY era""".stripMargin)
    }),

    // -- streaming KS drift alerting in BATCH mode (the q142 pattern
    //    for Streams.windowedKsAlert, KLL edition): the operator's
    //    per-window sketch+KS+gate must match a pure twin (one
    //    kll_sketch_agg per window + the kll_ks column kernel, same
    //    reference bytes, same threshold) on (window_start, n, ks) —
    //    deterministic because sf windows sit far below KLL's
    //    compaction capacity, so each side reconstructs the identical
    //    per-window CDF, and BOTH sides read the one shared reference
    //    byte array — a premise the kll_retained guard row now
    //    enforces instead of assumes. The reference is deliberately shifted +200 so a
    //    healthy share of windows alerts — a 'no_alerts' violation row
    //    guards vacuity (two empty sides would otherwise pass).
    //    Oracle = empty relation; StreamsSpec drives the same operator
    //    through a real micro-batched stream.
    "q148_ks_alert_batch" -> ((s, dir) => {
      import graft.functions.KllSketch
      val ev = T(s, dir, "events").filter(col("value").isNotNull)
      val threshold = 0.3
      // one shared reference: the corpus's own values shifted +200
      val ref = ev.agg(KllSketch.kllSketch(
          col("value").cast("double") + lit(200.0d)).as("sk"))
        .head().getAs[Array[Byte]](0)
      val alerts = graft.streaming.Streams.windowedKsAlert(
        ev, "value", ref, threshold)
      val twinSk = ev
        .groupBy(window(col("ts"), "1 hour"))
        .agg(KllSketch.kllSketch(col("value").cast("double")).as("sk"))
        .select(col("window.start").as("window_start"),
          KllSketch.kllN(col("sk")).as("n"), col("sk"))
      val twin = twinSk
        .select(col("window_start"), col("n"),
          KllSketch.kllKs(col("sk"), lit(ref)).as("ks"))
        .filter(col("ks") > lit(threshold))
      def canon(df: org.apache.spark.sql.DataFrame, src: String) =
        df.select(col("window_start"), col("n"), col("ks"),
          lit(src).as("src"))
      val parity = canon(alerts, "alert").unionByName(canon(twin, "batch"))
        .groupBy("window_start", "n", "ks")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") =!= 2)
        .select(col("window_start"), lit("alert_parity").as("violation"))
      val vacuity = alerts.agg(count(lit(1)).as("c"))
        .filter(col("c") === 0)
        .select(lit(null).cast("timestamp").as("window_start"),
          lit("no_alerts").as("violation"))
      // audit-premise guard (r16 advice): exact parity between two
      // INDEPENDENTLY built per-window sketches holds only in exact
      // mode (retained == n — no randomized compaction to diverge on;
      // whether a sketch has compacted is a deterministic function of
      // (k, n), so checking the twin side covers the operator side
      // too). The shared REFERENCE may compact freely — both sides
      // read the one byte array. A denser fixture now fails loudly
      // with the fix in the name: compare ks within a 2-epsilon band.
      val capacity = twinSk
        .filter(KllSketch.kllRetained(col("sk")) =!= col("n"))
        .select(col("window_start"),
          lit("window_past_exact_capacity_band_compare_ks").as("violation"))
      parity.unionByName(vacuity).unionByName(capacity)
        .orderBy("window_start")
    }),

    // -- deterministic EXEMPLAR sample (family #6, the drill-down
    //    rows; graft.functions.Exemplar): bottom-25-by-md5 over
    //    documents, driven through the SQL kernel. Unlike every other
    //    sketch family — whose randomized internals force violations-
    //    relation audits — the sample is a pure function of the key
    //    set AND md5 renders identical hex in DuckDB, so this entry
    //    gets a REAL cross-engine hash oracle: the driver hash-matches
    //    the exact (h, doc_key) rows against DuckDB's
    //    ORDER BY md5(...) LIMIT 25 on the same parquet.
    "q149_exemplar_sample" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      T(s, dir, "documents").createOrReplaceTempView("q149_docs")
      s.sql(
        """SELECT e.h AS h, e.payload AS doc_key
          |FROM (SELECT explode(exemplar_agg(md5(CAST(doc_id AS STRING)),
          |                                  CAST(doc_id AS STRING),
          |                                  25)) AS e
          |      FROM q149_docs)
          |ORDER BY h""".stripMargin)
    }),

    // -- exemplar MERGE identity cross-engine: per-lang bottom-20
    //    samples (grouped kernel, partial-below-exchange), unioned and
    //    re-cut to the corpus bottom-20 — which must equal DuckDB's
    //    direct global bottom-20 EXACTLY (bottomK(∪ bottomK(slices)) =
    //    bottomK(corpus); the slices partition the corpus). The same
    //    identity is why per-version/per-window stored exemplars roll
    //    up with zero error and zero target reads at 100 TB.
    "q150_exemplar_rollup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      T(s, dir, "documents").createOrReplaceTempView("q150_docs")
      s.sql(
        """WITH per AS (
          |  SELECT lang,
          |    exemplar_agg(md5(CAST(doc_id AS STRING)),
          |                 CAST(doc_id AS STRING), 20) AS ex
          |  FROM q150_docs GROUP BY lang),
          |flat AS (
          |  SELECT e.h AS h, e.payload AS doc_key
          |  FROM per LATERAL VIEW explode(ex) t AS e)
          |SELECT h, doc_key FROM flat ORDER BY h, doc_key LIMIT 20
          |""".stripMargin)
    }),

    // -- streaming exemplars in BATCH mode (Streams.windowedExemplars,
    //    the drill-down twin of q145/q148): per hour-window bottom-5
    //    by md5(event_id) with the window's exact n. Determinism +
    //    cross-engine md5 again buy a REAL oracle: DuckDB replays the
    //    per-window sample with row_number over the same hash order.
    //    StreamsSpec drives the identical operator through a real
    //    micro-batched stream with mid-window state-store round-trips.
    "q152_exemplar_windows" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      graft.streaming.Streams
        .windowedExemplars(ev, "event_id", 5, payloadCols = Seq("event_id"))
        .select(col("window_start"), col("n"),
          explode(col("exemplars")).as("e"))
        .select(col("window_start"), col("e.h").as("h"), col("n"))
        .orderBy("window_start", "h")
    }))

  /** q141's read side: set algebra over STORED theta sketch bytes via
    * plain `spark.sql`, audited in the same statement against exact
    * DISTINCT/INTERSECT/EXCEPT over `liView`. Anchored on a FIXED op
    * list (r15 advice): an absent 'A'/'R' sketch (or a null estimate
    * from an emptied aggregate leg) surfaces as a `missing_input` row
    * instead of the inner join silently dropping the op and the audit
    * passing vacuously — ThetaSketchSpec pins that direction on a
    * one-flag corpus. Requires `GraftFunctions.register`. */
  private[graft] def thetaSqlAudit(
      s: SparkSession, liView: String, skView: String): DataFrame =
    s.sql(
      s"""WITH est AS (
         |  SELECT 'union' AS op, theta_estimate(theta_union_agg(sk)) AS est
         |  FROM $skView
         |  UNION ALL
         |  SELECT 'intersect', theta_estimate(theta_intersect_agg(sk))
         |  FROM $skView WHERE flag IN ('A', 'R')
         |  UNION ALL
         |  SELECT 'diff', theta_estimate(theta_a_not_b(a.sk, r.sk))
         |  FROM (SELECT sk FROM $skView WHERE flag = 'A') a,
         |       (SELECT sk FROM $skView WHERE flag = 'R') r),
         |-- exact side in ONE pass (r16 verdict, optional item): per-key
         |-- membership flags from a single GROUP BY, all three set
         |-- cardinalities as conditional sums, stack() pivoting the
         |-- 1-row result — replaces five distinct scans plus
         |-- INTERSECT/EXCEPT set-op shuffles; bands unchanged
         |exact AS (
         |  SELECT stack(3,
         |    'union', u, 0.05d,
         |    'intersect', i, 0.10d,
         |    'diff', d, 0.10d) AS (op, exact, bound)
         |  FROM (
         |    SELECT CAST(count(*) AS DOUBLE) AS u,
         |      CAST(coalesce(sum(in_a * in_r), 0) AS DOUBLE) AS i,
         |      CAST(coalesce(sum(in_a * (1 - in_r)), 0) AS DOUBLE) AS d
         |    FROM (
         |      SELECT l_orderkey,
         |        max(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS in_a,
         |        max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS in_r
         |      FROM $liView GROUP BY l_orderkey)))
         |SELECT v.op,
         |  CASE WHEN e.est IS NULL THEN 'missing_input'
         |       ELSE 'estimate_out_of_band' END AS violation
         |FROM VALUES ('union'), ('intersect'), ('diff') AS v(op)
         |LEFT JOIN est e ON e.op = v.op
         |LEFT JOIN exact x ON x.op = v.op
         |WHERE e.est IS NULL OR abs(e.est - x.exact) > x.bound * x.exact
         |ORDER BY op""".stripMargin)

  val oracles: Map[String, String] = Map(
    "q27_salted_join" ->
      """WITH m(flag, rate) AS (VALUES ('A', 0.05), ('N', 0.10), ('R', 0.15))
        |SELECT l.l_returnflag AS flag, CAST(m.rate AS DOUBLE) AS rate,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    * CAST(m.rate AS DOUBLE), 2) AS weighted_qty
        |FROM lineitem l JOIN m ON l.l_returnflag = m.flag
        |GROUP BY 1, 2 ORDER BY flag""".stripMargin,
    "q28_bucketed_join" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q29_hll_audit" ->
      """SELECT CAST(NULL AS VARCHAR) AS l_returnflag,
        |  CAST(NULL AS BIGINT) AS approx_orders,
        |  CAST(NULL AS BIGINT) AS exact_orders
        |WHERE false""".stripMargin,
    "q129_hll_rollup" ->
      """SELECT CAST(NULL AS VARCHAR) AS l_returnflag,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q130_variant_events" ->
      """SELECT event_id, user_id AS uid, event_type AS kind,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  round(value, 4) AS v, CAST(NULL AS VARCHAR) AS absent
        |FROM events ORDER BY event_id""".stripMargin,
    "q139_theta_audit" ->
      """SELECT CAST(NULL AS VARCHAR) AS op,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q141_theta_sql" ->
      """SELECT CAST(NULL AS VARCHAR) AS op,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q142_drift_alert_batch" ->
      """SELECT CAST(NULL AS TIMESTAMP) AS window_start,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q144_kll_quantiles" ->
      """SELECT CAST(NULL AS DOUBLE) AS q,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q145_kll_windows" ->
      """SELECT CAST(NULL AS TIMESTAMP) AS window_start,
        |  CAST(NULL AS DOUBLE) AS q,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q146_kll_drift" ->
      """SELECT CAST(NULL AS VARCHAR) AS era,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q148_ks_alert_batch" ->
      """SELECT CAST(NULL AS TIMESTAMP) AS window_start,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    // exemplar samples: REAL hash oracles — deterministic bottom-k by
    // md5 is replayable in DuckDB verbatim (same hex, same casts)
    "q149_exemplar_sample" ->
      """SELECT md5(CAST(doc_id AS VARCHAR)) AS h,
        |  CAST(doc_id AS VARCHAR) AS doc_key
        |FROM documents ORDER BY h LIMIT 25""".stripMargin,
    "q150_exemplar_rollup" ->
      """SELECT md5(CAST(doc_id AS VARCHAR)) AS h,
        |  CAST(doc_id AS VARCHAR) AS doc_key
        |FROM documents ORDER BY h, doc_key LIMIT 20""".stripMargin,
    // n counts ALL rows per window (null keys included — the operator's
    // exact-count contract); ranks cover only non-null keys (nulls sort
    // last under ASC, the h IS NOT NULL guard drops any that sneak into
    // the top-5 of a nearly-empty window)
    "q152_exemplar_windows" ->
      """SELECT window_start, h, n FROM (
        |  SELECT date_trunc('hour', ts) AS window_start,
        |    md5(CAST(event_id AS VARCHAR)) AS h,
        |    count(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n,
        |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
        |      ORDER BY md5(CAST(event_id AS VARCHAR))) AS rk
        |  FROM events)
        |WHERE rk <= 5 AND h IS NOT NULL
        |ORDER BY window_start, h""".stripMargin,
    "q137_recursive_cte" ->
      """WITH RECURSIVE tree AS (
        |  SELECT n_nationkey AS key, 0 AS depth,
        |         CAST(n_regionkey AS BIGINT) AS path_sum
        |  FROM nation WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT n.n_nationkey AS key, t.depth + 1 AS depth,
        |         t.path_sum + n.n_regionkey AS path_sum
        |  FROM nation n JOIN tree t
        |    ON (n.n_nationkey - 1) // 2 = t.key
        |  WHERE n.n_nationkey > 0)
        |SELECT key, depth, path_sum FROM tree ORDER BY key""".stripMargin,
    "q65_approx_pct_audit" ->
      """SELECT CAST(NULL AS VARCHAR) AS o_orderstatus,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q66_hash_split" ->
      // CAST the sum: DuckDB sums BIGINT into HUGEINT, which the driver's
      // pandas path renders as float64 and the canonical hash diverges
      // from Spark's int64 even though values are identical
      // reduced-first hash (see TrainingPrep.idHash): congruent to
      // (doc_id * 2654435761) % 1000003 and overflow-free for all ids
      """SELECT CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 90
        |    THEN 'train' ELSE 'holdout' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,4)) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT p_partkey, upper(p_name) AS uname, p_brand, p_type, p_size,
        |  p_retailprice * CAST(0.9 AS DOUBLE) AS discounted
        |FROM part
        |WHERE p_size IN (1,5,10,15,20) AND p_type LIKE 'S%' AND p_retailprice > 500.0
        |ORDER BY p_partkey""".stripMargin,
    "q03_star_join_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_theta_join" ->
      """SELECT s_suppkey, count(c_custkey) AS n_near_richer
        |FROM supplier LEFT JOIN customer
        |  ON c_acctbal > s_acctbal AND c_acctbal - s_acctbal < 100.0
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q07_window_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q09_rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q26_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5) + 0.000001, 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9) + 0.000001, 2) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99) + 0.000001, 2) AS p99,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q24_cube_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q25_map_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k_val,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_str,
        |  CAST(json_extract(props, '$.k') AS INT) * 2 AS k_doubled,
        |  CAST(json_extract(props, '$.k') AS INT) AS vals_sum
        |FROM events ORDER BY event_id LIMIT 2000""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_distinct_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q12_set_ops" ->
      """(SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT SELECT o_custkey AS k FROM orders)
        |UNION ALL
        |(SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        | EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY k""".stripMargin,
    "q13_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
        |  substring(p_type, 1, 4) AS type4,
        |  concat_ws('-', p_brand, p_type) AS bt,
        |  regexp_replace(p_name, 'a', '@', 'g') AS repl,
        |  CAST(length(p_name) AS INT) AS len,
        |  CAST(levenshtein(p_brand, 'Brand#10') AS INT) AS lev,
        |  regexp_extract(p_brand, '#([0-9]+)', 1) AS brandnum,
        |  lpad(p_brand, 10, '*') AS padded,
        |  split_part(p_brand, '#', 2) AS brand_no
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q14_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS dom,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
        |  date_trunc('month', o_orderdate) AS mon_ts,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q15_math_funcs" ->
      """SELECT p_partkey,
        |  abs(p_retailprice - 1000.0) AS dist1000,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  round(p_retailprice, 1) AS r1,
        |  sqrt(p_retailprice) AS sq,
        |  pow(2.0, p_partkey % 10) AS p2,
        |  p_partkey % 7 AS m7,
        |  greatest(p_retailprice, 900.0) AS g,
        |  least(p_retailprice, 900.0) AS l
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q16_array_funcs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |  list_contains(toks, 'spark') AS has_spark,
        |  toks[1] AS first_token,
        |  array_to_string(list_sort(toks)[1:3], '|') AS top3_str,
        |  CAST(len(list_filter(toks, t -> length(t) > 5)) AS INT) AS n_long
        |FROM d ORDER BY doc_id""".stripMargin,
    "q17_json_events" ->
      """WITH e AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(k) AS DOUBLE) / count(k) AS avg_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q19_time_window_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q20_sessionize" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q22_stream_sessionize" ->
      // gap compares MICROSECONDS like Streams.sessionize (toMicros):
      // date_diff('second') floors, so a fractional gap in (1800s,1801s)
      // would split sessions on the Spark side but not in the oracle
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,
    "q23_stream_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // session_window coalesces TOUCHING windows (events exactly gap
    // apart merge — pinned in StreamsSpec), so the split condition is
    // strictly-greater, same as q22's; window end = last event + gap
    "q72_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM e)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,
    "q21_asof_join" ->
      """SELECT event_id, user_id, o_orderkey AS last_order, o_totalprice AS last_price FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q76_interval_join" ->
      """SELECT a.event_id, count(*) AS n_prior, max(b.event_id) AS last_prior
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts <= a.ts
        |  AND b.event_id <> a.event_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q67 is q21 under the hot-key time-bucket guard — provably the same
    // result, so the oracle is q21's verbatim
    "q67_asof_bucketed" ->
      """SELECT event_id, user_id, o_orderkey AS last_order, o_totalprice AS last_price FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q36_bag_set_ops" ->
      """SELECT k, 'i' AS op FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0)
        |UNION ALL
        |SELECT k, 'e' AS op FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0)
        |ORDER BY k, op""".stripMargin,
    "q81_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q82_lateral_join" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q84_partitioned_dpp" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(ts AS DATE) IN (
        |  SELECT DISTINCT CAST(ts AS DATE) FROM events
        |  WHERE day(CAST(ts AS DATE)) <= 3)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the clustered layout changes physical order only — the oracle is
    // the plain range aggregation over the raw table
    "q94_clustered_scan" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q123_zorder_scan" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE user_id <= 5 AND value BETWEEN 50.0 AND 150.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q79_pivot" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "P"
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q80_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size_d' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "q38_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q39_range_window" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  count(*) OVER w AS n_within_50k,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_within_50k
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |  RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q37_window_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS date_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
