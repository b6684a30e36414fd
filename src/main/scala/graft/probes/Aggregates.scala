package graft.probes

import graft.Probe

/** SURVEY §2.5 — aggregation surface of DataFusion 40
  * (datafusion-functions-aggregate, Cargo.lock:1187), all reachable via
  * `ctx.sql` (lib.rs:678). Spark-first: every probe is a single
  * `groupBy().agg()` shape that plans to partial→final HashAggregate with
  * map-side combine — the layout that scales to 100 TB (no driver-side
  * reduction anywhere).
  */
object Aggregates {
  val probes: Seq[Probe] = Seq(

    // TPC-H Q1 shape — the flagship (SURVEY §7 M0).
    Probe.sql("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    Probe.sql("q_agg_having",
      """SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS total
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 3
        |ORDER BY o_custkey""".stripMargin),

    // multi-DISTINCT aggregate (Catalyst RewriteDistinctAggregates)
    Probe.sql("q_agg_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Probe.sql("q_agg_stats",
      """SELECT l_returnflag,
        |  stddev_samp(l_quantity) AS sd_samp,
        |  stddev_pop(l_quantity) AS sd_pop,
        |  var_samp(l_quantity) AS v_samp,
        |  var_pop(l_quantity) AS v_pop,
        |  corr(l_quantity, l_extendedprice) AS cor,
        |  covar_samp(l_quantity, l_extendedprice) AS cov_samp,
        |  covar_pop(l_quantity, l_extendedprice) AS cov_pop
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Probe.sql("q_agg_regr",
      """SELECT l_linestatus,
        |  regr_slope(l_extendedprice, l_quantity) AS slope,
        |  regr_intercept(l_extendedprice, l_quantity) AS icept,
        |  regr_count(l_extendedprice, l_quantity) AS n,
        |  regr_r2(l_extendedprice, l_quantity) AS r2,
        |  regr_avgx(l_extendedprice, l_quantity) AS ax,
        |  regr_avgy(l_extendedprice, l_quantity) AS ay
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin),

    Probe.sql("q_agg_minmax",
      """SELECT l_returnflag,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  min(l_linestatus) AS min_status, max(l_linestatus) AS max_status
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Probe.sql("q_agg_bool_bit",
      """SELECT l_linestatus,
        |  bool_and(l_quantity > 1) AS b_and,
        |  bool_or(l_discount > 0.05) AS b_or,
        |  bit_and(l_linenumber) AS bits_and,
        |  bit_or(l_linenumber) AS bits_or,
        |  bit_xor(l_linenumber) AS bits_xor
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin),

    Probe.sql("q_agg_median",
      """SELECT l_returnflag, median(l_extendedprice) AS med
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // GROUPING SETS + grouping() — explicit NULLS FIRST because Spark and
    // DuckDB default null ordering differ (ASC NULLS FIRST vs NULLS LAST).
    Probe.sql("q_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    Probe.sql("q_rollup",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    Probe.sql("q_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    Probe.sql("q_select_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ordered string_agg / listagg (native in Spark 4.1 — SURVEY §2.5)
    Probe.sql2("q_string_agg",
      """SELECT l_orderkey,
        |  listagg(CAST(l_linenumber AS STRING), ',')
        |    WITHIN GROUP (ORDER BY l_linenumber) AS lines
        |FROM lineitem
        |WHERE l_orderkey < 100
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
      """SELECT l_orderkey,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
        |FROM lineitem
        |WHERE l_orderkey IS NOT NULL AND l_orderkey < 100
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin),

    // ordered array_agg via sort_array(collect_list()) — the Spark idiom
    Probe.sql2("q_array_agg",
      """SELECT l_orderkey,
        |  array_join(transform(sort_array(collect_list(l_linenumber)),
        |                       x -> CAST(x AS STRING)), '|') AS nums
        |FROM lineitem
        |WHERE l_orderkey < 100
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), '|') AS nums
        |FROM lineitem
        |WHERE l_orderkey < 100
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin),

    // percentile_cont (WITHIN GROUP in Spark 4; quantile_cont in DuckDB)
    Probe.sql2("q_percentile_cont",
      """SELECT l_returnflag,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50,
        |  percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // approximate aggregates: sketch internals differ across engines by
    // design, so assert bounded relative error vs the exact answer instead
    // of hash-equality (both engines use HLL±t-digest; the driver's oracle
    // compares the *booleans*, which are deterministic).
    Probe.sql2("q_approx_agg",
      """SELECT l_returnflag,
        |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |    <= 0.05 * count(DISTINCT l_partkey) AS hll_ok,
        |  abs(approx_percentile(l_extendedprice, 0.5) - median(l_extendedprice))
        |    <= 0.05 * median(l_extendedprice) AS pct_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |    <= 0.05 * count(DISTINCT l_partkey) AS hll_ok,
        |  abs(approx_quantile(l_extendedprice, 0.5) - median(l_extendedprice))
        |    <= 0.05 * median(l_extendedprice) AS pct_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  )
}
