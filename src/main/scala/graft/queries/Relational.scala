package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational capability surface the reference exposes through
  * DataFusion (SURVEY.md §2.2-2.3) — filters, projections, joins (inner/
  * semi/anti/broadcast), aggregations, windows, set ops, rollup/cube,
  * sorts/limits, scalar functions — expressed as Catalyst DataFrame plans
  * over the driver corpus, each with a DuckDB oracle.
  *
  * Float-determinism convention: every SUM over a double column routes
  * through an exact DECIMAL(18,4) accumulation and is cast to DOUBLE once
  * at the end, so Spark and DuckDB produce bit-identical doubles
  * regardless of partitioning/addition order. Computed integers are cast
  * to BIGINT on both sides.
  */
object Relational {
  private val D = DecimalType(18, 4)
  // Final downcast before surfacing as double: the accumulated values all
  // have <= 4 decimal digits, so DECIMAL(38,4) holds them exactly with a
  // mantissa < 2^53 — both engines then perform ONE exact-operand IEEE
  // division to double and agree bit-for-bit. (Casting a scale-8 decimal
  // straight to double diverges: DuckDB double-rounds via int128/1e8.)
  private val DOut = DecimalType(38, 4)
  /** Exact decimal sum of a double column, surfaced as double. */
  private def dsum(c: Column): Column = sum(c.cast(D)).cast(DOut).cast("double")
  /** Exact revenue-style sum: Σ price·(1-disc), decimal-exact. */
  private def revSum(price: Column, disc: Column): Column =
    sum(price.cast(D) * (lit(1) - disc).cast(D)).cast(DOut).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_groupby_agg" -> q01,
    "q02_filter_project" -> q02,
    "q03_join_topk" -> q03,
    "q04_semi_join" -> q04,
    "q05_multi_join_agg" -> q05,
    "q06_selective_agg" -> q06,
    "q07_window_rank" -> q07,
    "q08_distinct_agg" -> q08,
    "q09_set_ops" -> q09,
    "q10_rollup" -> q10,
    "q11_cube" -> q11,
    "q12_anti_join" -> q12,
    "q13_scalar_funcs" -> q13,
    "q14_date_case_agg" -> q14,
    "q15_events_tumbling" -> q15,
    "q16_events_sessions" -> q16,
    "q17_events_asof_latest" -> q17,
    "q19_json_extract" -> q19,
    "q20_string_funcs" -> q20,
    "q21_math_funcs" -> q21,
    "q22_array_map_funcs" -> q22,
    "q23_asof_join" -> q23,
    "q24_pivot" -> q24,
    "q25_percentiles" -> q25,
    "q26_salted_agg" -> q26,
    "q27_grouping_sets" -> q27,
    "q28_range_join" -> q28,
    "q29_set_ops_all" -> q29,
    "q30_scalar_subquery" -> q30,
    "q31_moving_avg" -> q31)

  private def q01(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        revSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        (sum(col("l_quantity").cast(D)).cast(DOut).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(D)).cast(DOut).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
        col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_shipdate")

  private def q03(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    // Build side must be the filtered customer⋈orders result, never the
    // lineitem fact table: statically its 3-column pruned scan estimate
    // fits under autoBroadcastJoinThreshold at bench SF, and Catalyst
    // would broadcast it — a plan that OOMs once lineitem outgrows the
    // driver. shuffle_hash on the co side pins SHJ-build-on-dimension;
    // lineitem streams, partitioned by orderkey, and the downstream
    // groupBy(l_orderkey, …) reuses that partitioning (no extra shuffle).
    val co = c.join(o, col("c_custkey") === col("o_custkey"))
      .select("o_orderkey", "o_orderdate")
      .hint("shuffle_hash")
    l.join(co, col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private def q04(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val big = Tables(s, dir, "lineitem")
      .where(col("l_quantity") >= 45).select("l_orderkey")
    o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
  }

  private def q05(s: SparkSession, dir: String): DataFrame = {
    val r = Tables(s, dir, "region")
    val n = Tables(s, dir, "nation")
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private def q06(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 25)
      .agg(sum(col("l_extendedprice").cast(D) * col("l_discount").cast(D))
        .cast(DOut).cast("double").as("revenue"))

  private def q07(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  private def q08(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"))
  }

  private def q09(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    val rich = c.where(col("c_acctbal") > 500).select(col("c_custkey").as("k"))
    val active = o.select(col("o_custkey").as("k"))
    val finished = o.where(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    val poor = c.where(col("c_acctbal") < 0).select(col("c_custkey").as("k"))
    rich.intersect(active).except(finished).union(poor).distinct()
  }

  private def q10(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  private def q11(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  private def q12(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val big = Tables(s, dir, "orders").where(col("o_totalprice") > 300000)
    c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_lonely"), dsum(col("c_acctbal")).as("bal"))
  }

  private def q13(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_name"), 1, 8).as("name_pfx"),
      (col("p_size") % 7).cast("long").as("size_mod"),
      abs(col("p_size") - 25).cast("long").as("size_dist"),
      floor(col("p_retailprice")).cast("long").as("price_floor"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))

  private def q14(s: SparkSession, dir: String): DataFrame = {
    val bucket = when(col("o_totalprice") < 50000, "small")
      .when(col("o_totalprice") < 150000, "mid")
      .otherwise("big")
    Tables(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
  }

  private def q15(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  private def q16(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .groupBy("user_id")
      .agg(
        sum(when(col("prev").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev"))) > 1800000000L, 1L)
          .otherwise(0L)).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  private def q17(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(s, dir, "events")
      .where(col("ts") <= expr("TIMESTAMP '2024-01-15 00:00:00'"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value", "ts")
  }

  private def q19(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
        max(col("k")).as("max_k"), min(col("k")).as("min_k"))

  private def q20(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").select(
      col("p_partkey"),
      expr("replace(p_name, ' ', '_')").as("name_u"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
      translate(col("p_brand"), "#", "-").as("brand_t"),
      expr("split_part(p_brand, '#', 2)").as("brand_num_s"),
      regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
      levenshtein(col("p_type"), lit("ECONOMY")).cast("long").as("lev"),
      reverse(col("p_name")).as("name_rev"),
      expr("left(p_name, 3)").as("pfx3"))

  private def q21(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").select(
      col("p_partkey"),
      sqrt(col("p_retailprice")).as("sqrt_price"),
      ceil(col("p_retailprice")).cast("long").as("ceil_price"),
      floor(col("p_retailprice")).cast("long").as("floor_price"),
      signum(col("p_size") - 25).cast("long").as("size_sign"),
      expr("mod(p_partkey, 7)").cast("long").as("key_mod"),
      greatest(col("p_size"), lit(10)).cast("long").as("size_hi"),
      least(col("p_size"), lit(40)).cast("long").as("size_lo"),
      (col("p_size") * col("p_size")).cast("long").as("size_sq"))

  /** Array + map scalar functions over the embedding column, surfaced as
    * scalars so the oracle comparison is type-stable. All arithmetic on
    * lossless float→double casts; the head_sum accumulates in declared
    * (ascending-index) order in both engines.
    */
  private def q22(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("_v"))
      .withColumn("_m", map(
        lit("max"), array_max(col("_v")), lit("min"), array_min(col("_v"))))
      .select(
        col("vec_id"),
        size(col("_v")).cast("long").as("n_dims"),
        array_max(col("_v")).as("vmax"),
        array_min(col("_v")).as("vmin"),
        element_at(col("_v"), 1).as("first_val"),
        aggregate(slice(col("_v"), 1, 8), lit(0.0d), (a, x) => a + x)
          .as("head_sum"),
        expr("CAST(array_position(_v, array_max(_v)) AS BIGINT)").as("argmax1"),
        size(filter(col("_v"), x => x > 0)).cast("long").as("n_pos"),
        (element_at(col("_m"), lit("max")) - element_at(col("_m"), lit("min")))
          .as("spread"),
        size(map_keys(col("_m"))).cast("long").as("n_keys"))

  /** As-of join: each purchase picks up the id and value of the same
    * user's most recent click at-or-before the purchase timestamp (null
    * if the user never clicked before buying).
    */
  private def q23(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("purchase_value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    graft.operators.AsOfJoin.leftAsOf(
        purchases, clicks, key = "user_id", ts = "ts",
        tieBreak = "event_id", payload = Seq("event_id", "value"))
      .withColumnRenamed("event_id", "purchase_id")
      .withColumnRenamed("asof_event_id", "click_id")
      .withColumnRenamed("asof_value", "click_value")
  }

  /** Pivot: order counts and totals per priority, spread across the three
    * order statuses as columns. Explicit pivot values keep the plan a
    * single pass (no distinct-values pre-query) — the form that scales.
    */
  private def q24(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      // empty pivot cells: count is 0 (as in SQL FILTER), sum stays null
      .na.fill(0L, Seq("F_n", "O_n", "P_n"))

  /** Exact percentiles (interpolating, QUANTILE_CONT semantics). Exact on
    * integer-valued l_quantity: lo + (hi-lo)·f is representable for
    * f ∈ {.25,.5,.75}, so Spark and DuckDB agree bit-for-bit.
    */
  private def q25(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_quantity, 0.75)").as("p75_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n"))

  /** Salted two-phase aggregation over event_type — a 5-value key is the
    * canonical aggregation-skew shape (every row funnels into 5 reducers
    * no matter how wide the cluster). The salt splits each hot group 16
    * ways; the result is identical to a plain groupBy, which is exactly
    * what the oracle checks. Decimal partials keep the merge exact.
    */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    graft.operators.Skew.saltedSumCount(
        ev, "event_type", col("value").cast(D), "value",
        graft.operators.Skew.saltFrom(16, col("event_id")))
      .withColumn("sum_value", col("sum_value").cast(DOut).cast("double"))
  }

  /** GROUPING SETS with grouping_id — the generalization of rollup/cube
    * (q10/q11): per-returnflag totals, per-linestatus totals, and the
    * grand total in one pass, disambiguated by the grouping bitmask.
    */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    val view = s"lineitem_gs_${math.abs(dir.hashCode)}"
    Tables(s, dir, "lineitem").createOrReplaceTempView(view)
    s.sql(
      s"""SELECT l_returnflag, l_linestatus,
            CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
            COUNT(*) AS n,
            CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
          FROM $view
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
  }

  /** Range (band) join: clicks within ±15 min of each purchase by the
    * same user. Naively this is an inequality join — Catalyst would plan
    * a nested loop. The scalable shape is bucket-equi-join: quantize time
    * into 30-min buckets, explode each purchase to its 3 candidate
    * buckets (a bounded ×3 expansion), hash-join on (user, bucket), then
    * apply the exact band predicate. Join cost becomes hash-join cost;
    * the residual filter runs only on same-bucket-neighborhood pairs.
    */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val bucketLen = 1800000000L // 30 min in micros
    val ev = Tables(s, dir, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pt"))
      .withColumn("_b", explode(array(
        (unix_micros_bucket(col("pt"), bucketLen) - 1),
        unix_micros_bucket(col("pt"), bucketLen),
        (unix_micros_bucket(col("pt"), bucketLen) + 1))))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ct"))
      .withColumn("_b", unix_micros_bucket(col("ct"), bucketLen))
    p.join(c, Seq("user_id", "_b"), "left")
      .withColumn("_hit",
        when(abs(col("pt") - col("ct")) <= 900000000L, 1L).otherwise(0L))
      .groupBy("user_id", "purchase_id")
      .agg(sum(col("_hit")).as("n_near_clicks"))
      .na.fill(0L, Seq("n_near_clicks"))
  }

  private def unix_micros_bucket(us: Column, len: Long): Column =
    floor(us / len).cast("long")

  /** Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) — distinct
    * Catalyst operators from q09's distinct-semantics trio: duplicates
    * are preserved per multiset arithmetic. Custkeys of orders: all
    * orders minus one per urgent order, intersected with the
    * high-priority multiset.
    */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val all = o.select(col("o_custkey").as("k"))
    val urgent = o.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"))
    val high = o.where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_custkey").as("k"))
    all.exceptAll(urgent).intersectAll(high)
      .groupBy("k").agg(count(lit(1)).as("n"))
  }

  /** Scalar subqueries (above-average orders per priority). The
    * above-average predicate is division-free — `price·count > sum` in
    * exact decimals — because decimal division scale/rounding rules
    * differ across engines and the comparison boundary must be exact.
    */
  private def q30(s: SparkSession, dir: String): DataFrame = {
    val view = s"orders_sq_${math.abs(dir.hashCode)}"
    Tables(s, dir, "orders").createOrReplaceTempView(view)
    s.sql(
      s"""SELECT o_orderpriority, COUNT(*) AS n
          FROM $view
          WHERE CAST(o_totalprice AS DECIMAL(18,4))
                  * (SELECT COUNT(*) FROM $view)
                > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) FROM $view)
          GROUP BY o_orderpriority""")
  }

  /** Range-frame window: 7-day moving average of daily revenue per order
    * priority — `RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` over the
    * integer day number, the window-frame class (value-range, not
    * row-count) the rest of the corpus doesn't touch. Daily sums are
    * decimal-exact; the average divides once in double (sum/count), so
    * both engines agree bit-for-bit. Plan: one shuffle for the daily
    * aggregate, one for the window partition — the frame itself is a
    * running in-partition computation, no self-join row explosion.
    */
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("order_day"))
      .agg(sum(col("o_totalprice").cast(D)).as("_rev"))
      .withColumn("_dayn", datediff(col("order_day"),
        lit(java.sql.Date.valueOf("1970-01-01"))))
    val w = Window.partitionBy(col("priority")).orderBy(col("_dayn"))
      .rangeBetween(-6, Window.currentRow)
    daily.select(col("priority"), col("order_day"),
      col("_rev").cast(DOut).cast("double").as("daily_rev"),
      (sum(col("_rev")).over(w).cast(DOut).cast("double") /
        count(lit(1)).over(w)).as("ma7_rev"))
  }

  /** DuckDB equivalents. Column aliases match the Spark plans exactly;
    * every double aggregate uses the same DECIMAL(18,4) accumulation.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_qty,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_quantity > 45""",
    "q03_join_topk" ->
      """SELECT l_orderkey, o_orderdate,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
                       JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q04_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
         GROUP BY o_orderpriority""",
    "q05_multi_join_agg" ->
      """SELECT r_name, n_name,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
                       JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q06_selective_agg" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 25""",
    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) WHERE rn <= 3""",
    "q08_distinct_agg" ->
      """SELECT c_mktsegment,
         COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment""",
    "q09_set_ops" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 500
         INTERSECT SELECT o_custkey AS k FROM orders
         EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
         UNION SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0""",
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q11_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q12_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_lonely,
         CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS bal
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         GROUP BY c_mktsegment""",
    "q13_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
         CAST(length(p_name) AS BIGINT) AS name_len,
         substr(p_name, 1, 8) AS name_pfx,
         CAST(p_size % 7 AS BIGINT) AS size_mod,
         CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
         CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
         concat(p_brand, '-', p_type) AS brand_type
         FROM part""",
    "q14_date_case_agg" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CASE WHEN o_totalprice < 50000 THEN 'small'
              WHEN o_totalprice < 150000 THEN 'mid' ELSE 'big' END AS bucket,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2, 3""",
    "q15_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_value,
         MIN(value) AS min_value, MAX(value) AS max_value
         FROM events GROUP BY 1, 2""",
    "q16_events_sessions" ->
      """SELECT user_id,
         CAST(SUM(CASE WHEN prev IS NULL
               OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
         COUNT(*) AS n_events
         FROM (SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events) GROUP BY user_id""",
    "q17_events_asof_latest" ->
      """SELECT user_id, event_id, event_type, value, ts
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
               FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
         WHERE rn = 1""",
    "q19_json_extract" ->
      """SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n,
         MAX(k) AS max_k, MIN(k) AS min_k
         FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
         GROUP BY event_type""",
    "q20_string_funcs" ->
      """SELECT p_partkey,
         replace(p_name, ' ', '_') AS name_u,
         lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
         translate(p_brand, '#', '-') AS brand_t,
         split_part(p_brand, '#', 2) AS brand_num_s,
         regexp_extract(p_brand, '[0-9]+') AS brand_num,
         CAST(levenshtein(p_type, 'ECONOMY') AS BIGINT) AS lev,
         reverse(p_name) AS name_rev,
         left(p_name, 3) AS pfx3
         FROM part""",
    "q21_math_funcs" ->
      """SELECT p_partkey,
         sqrt(p_retailprice) AS sqrt_price,
         CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
         CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
         CAST(sign(p_size - 25) AS BIGINT) AS size_sign,
         CAST(mod(p_partkey, 7) AS BIGINT) AS key_mod,
         CAST(greatest(p_size, 10) AS BIGINT) AS size_hi,
         CAST(least(p_size, 40) AS BIGINT) AS size_lo,
         CAST(p_size * p_size AS BIGINT) AS size_sq
         FROM part""",
    "q22_array_map_funcs" ->
      """SELECT vec_id,
         CAST(len(v) AS BIGINT) AS n_dims,
         list_max(v) AS vmax,
         list_min(v) AS vmin,
         v[1] AS first_val,
         v[1]+v[2]+v[3]+v[4]+v[5]+v[6]+v[7]+v[8] AS head_sum,
         CAST(list_position(v, list_max(v)) AS BIGINT) AS argmax1,
         CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
         list_max(v) - list_min(v) AS spread,
         CAST(2 AS BIGINT) AS n_keys
         FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
    "q23_asof_join" ->
      """WITH u AS (
           SELECT user_id, ts, event_id AS tie, 1 AS side,
                  event_id, value AS purchase_value,
                  NULL::BIGINT AS c_id, NULL::DOUBLE AS c_val
           FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts, event_id AS tie, 0 AS side,
                  NULL, NULL, event_id, value
           FROM events WHERE event_type = 'click'),
         w AS (
           SELECT *,
             last_value(c_id IGNORE NULLS) OVER win AS click_id,
             last_value(c_val IGNORE NULLS) OVER win AS click_value
           FROM u
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, tie
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, ts, event_id AS purchase_id, purchase_value,
                click_id, click_value
         FROM w WHERE side = 1""",
    "q24_pivot" ->
      """SELECT o_orderpriority,
         COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F_n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'F') AS DECIMAL(38,4)) AS DOUBLE) AS F_total,
         COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O_n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'O') AS DECIMAL(38,4)) AS DOUBLE) AS O_total,
         COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P_n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'P') AS DECIMAL(38,4)) AS DOUBLE) AS P_total
         FROM orders GROUP BY o_orderpriority""",
    "q25_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.25) AS p25_qty,
         quantile_cont(l_quantity, 0.5) AS med_qty,
         quantile_cont(l_quantity, 0.75) AS p75_qty,
         MAX(l_quantity) AS max_qty,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q26_salted_agg" ->
      """SELECT event_type,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value,
         COUNT(*) AS n
         FROM events GROUP BY event_type""",
    "q27_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q28_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
         CAST(COALESCE(SUM(CASE WHEN abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 900000000
                            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_near_clicks
         FROM events p
         LEFT JOIN events c ON c.user_id = p.user_id AND c.event_type = 'click'
         WHERE p.event_type = 'purchase'
         GROUP BY 1, 2""",
    "q29_set_ops_all" ->
      """SELECT k, COUNT(*) AS n FROM (
           SELECT k FROM (
             SELECT o_custkey AS k FROM orders
             EXCEPT ALL
             SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
           INTERSECT ALL
           SELECT o_custkey AS k FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         GROUP BY k""",
    "q30_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n
         FROM orders
         WHERE CAST(o_totalprice AS DECIMAL(18,4))
                 * (SELECT COUNT(*) FROM orders)
               > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders)
         GROUP BY o_orderpriority""",
    "q31_moving_avg" ->
      """SELECT priority, order_day,
           CAST(CAST(rev AS DECIMAL(38,4)) AS DOUBLE) AS daily_rev,
           CAST(CAST(SUM(rev) OVER w AS DECIMAL(38,4)) AS DOUBLE)
             / COUNT(*) OVER w AS ma7_rev
         FROM (SELECT o_orderpriority AS priority,
                 CAST(o_orderdate AS DATE) AS order_day,
                 SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
                 date_diff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) AS dayn
               FROM orders GROUP BY 1, 2, 4)
         WINDOW w AS (PARTITION BY priority ORDER BY dayn
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""")
}
