package graft.probes

import graft.{Probe, Tables}
import graft.operators.Stats

/** TPC-H-shaped multi-join headline queries (bench anchors) + the
  * weighted-percentile operator probe. */
object Headline {
  val probes: Seq[Probe] = Seq(

    // Q3 shape: selective dim filter + 3-way join + agg (date literals
    // adapted to the synthetic data's ranges)
    Probe.sql("q_tpch_q3",
      """SELECT l_orderkey, o_orderdate,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1996-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY l_orderkey""".stripMargin),

    // Q5 shape: 6-way snowflake join with a region filter + date range
    Probe.sql("q_tpch_q5",
      """SELECT n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin),

    // Q6 shape: pure scan-filter-aggregate (the pushdown stress case)
    Probe.sql("q_tpch_q6",
      """SELECT sum(l_extendedprice * l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin),

    // Q10 shape: returned-items revenue per customer, top 20
    Probe.sql("q_tpch_q10",
      """SELECT c_custkey, c_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin),

    // Q18 shape: semi-join against a HAVING aggregate, then re-aggregate
    // Spark text joins the aggregated subquery once (grouped keys are
    // unique, so the join equals the IN): Catalyst pushes an IN-subquery
    // semi-filter to BOTH join branches and the nullability-differing
    // copies don't hit ReusedExchange — the lineitem HAVING agg ran
    // twice. DuckDB keeps the reference's IN form.
    Probe.sql2("q_tpch_q18",
      """WITH big AS (
        |  SELECT l_orderkey AS big_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum(l_quantity) AS total_qty
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN big      ON o_orderkey = big_orderkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum(l_quantity) AS total_qty
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_orderkey""".stripMargin),

    // TPC-H Q4 shape (EXISTS + date window; adapted: the synthetic
    // lineitem has no commitdate/receiptdate, so "late" = shipped after
    // the order date)
    Probe.sql("q_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // TPC-H Q12 shape (priority-class counts over a join + date window;
    // l_returnflag stands in for the missing l_shipmode)
    Probe.sql("q_tpch_q12",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // TPC-H Q14 shape (promo revenue share; p_type = 'PROMO' in this
    // synthetic part table)
    Probe.sql("q_tpch_q14",
      """SELECT CAST(100.00 *
        |  sum(CASE WHEN p_type = 'PROMO'
        |           THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
        |  sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin),

    // exact weighted percentile (covers approx_percentile_cont_with_weight
    // with exact semantics — SURVEY §2.9 ⚠)
    Probe.df("q_weighted_percentile",
      """WITH w AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    sum(l_quantity) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM lineitem)
        |SELECT l_returnflag, min(l_extendedprice) AS wp
        |FROM w WHERE cw >= 0.5 * tw
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Stats.exactWeightedPercentile(
          Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", "l_quantity", 0.5,
          tieBreak = Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_returnflag")
    }
  )
}
