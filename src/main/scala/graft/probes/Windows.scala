package graft.probes

import graft.Probe

/** SURVEY §2.6 — window functions (WindowAggExec/BoundedWindowAggExec in
  * DataFusion 40, Cargo.lock:1290). Every ORDER BY inside a window carries
  * a unique tiebreaker column so results are deterministic across engines.
  * Scale note: windows shuffle once on PARTITION BY; none of these probes
  * use a global (unpartitioned) window except q_win_global, which is the
  * documented anti-pattern probe kept to verify semantics only.
  */
object Windows {
  val probes: Seq[Probe] = Seq(

    Probe.sql("q_win_rank",
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    Probe.sql("q_win_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  lag(o_totalprice, 2, -1.0) OVER w AS prev2
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    Probe.sql("q_win_frame_rows",
      """SELECT o_custkey, o_orderkey,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_sum,
        |  count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    Probe.sql("q_win_frame_range",
      """SELECT l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighborhood_qty
        |FROM lineitem
        |WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // GROUPS frames aren't in Spark (SURVEY §2.6 gap) — the documented
    // rewrite: dense_rank converts peer groups to consecutive integers,
    // then a RANGE frame over the rank IS the GROUPS frame (a peer group
    // == one dense_rank value, so rank±1 == one group either side).
    // DuckDB 1.0 doesn't implement GROUPS either, so the oracle runs the
    // same rewrite — the cross-engine check covers the emulation.
    Probe.sql("q_win_frame_groups",
      """WITH t AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    dense_rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_orderdate AS DATE)) AS dr
        |  FROM orders WHERE o_orderkey < 2000)
        |SELECT o_orderkey, o_orderpriority,
        |  sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY dr
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS grp_sum,
        |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY dr
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS grp_n
        |FROM t
        |ORDER BY o_orderkey""".stripMargin),

    Probe.sql("q_win_ntile",
      """SELECT o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pctrk,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    Probe.sql("q_win_first_last",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ord,
        |  last_value(o_orderkey) OVER w AS last_ord,
        |  nth_value(o_orderkey, 2) OVER w AS second_ord
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // aggregate-as-window + two distinct windows in one projection
    Probe.sql("q_win_agg_mixed",
      """SELECT l_orderkey, l_linenumber,
        |  avg(l_extendedprice) OVER (PARTITION BY l_orderkey) AS order_avg,
        |  max(l_quantity) OVER (PARTITION BY l_suppkey) AS supp_max_qty
        |FROM lineitem
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber, l_suppkey""".stripMargin),

    // global window — semantics probe only (single-partition shuffle)
    Probe.sql("q_win_global",
      """SELECT o_orderkey,
        |  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS global_rank
        |FROM orders
        |ORDER BY o_orderkey
        |LIMIT 1000""".stripMargin)
  )
}
