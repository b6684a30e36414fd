package graft.probes

import graft.Probe

/** The rest of the TPC-H suite expressible on the synthetic testdata
  * (reference capability: any SQL over the catalog tables, lib.rs:678 —
  * TPC-H is the canonical workload for an engine of this shape).
  *
  * Adaptations, forced by the synthetic schema (TESTDATA.md):
  *   - there is NO partsupp table → Q2/Q11/Q16/Q20 run on a DERIVED
  *     inventory relation both engines compute identically from
  *     part × supplier (dbgen's supplier-assignment formula; integer
  *     hash mixes for availqty/supplycost, cents as BIGINT so the
  *     aggregates are integer-exact — see the quartet's comments). Q9
  *     keeps its 6-way join + profit shape with `0.6 * p_retailprice`
  *     standing in for ps_supplycost.
  *   - lineitem has no commitdate/receiptdate → "late" (Q21) means
  *     shipped >60 days after the order date (same convention as the
  *     Q4/Q12 probes).
  *   - customer has no c_phone → Q22's country code is derived from
  *     c_nationkey; "no recent orders" replaces "no orders ever"
  *     (synthetic customers average 10 orders, so the literal predicate
  *     is vacuously empty).
  *
  * Dialect notes: `year()` returns INT in Spark, BIGINT in DuckDB — the
  * oracle side casts (driver hash is numeric-kind-sensitive). Interval
  * literals differ (`INTERVAL '60' DAY` vs `INTERVAL 60 DAY`).
  *
  * Scale shape (local[32] now, 1000 executors later): every dimension
  * here (nation, region, supplier, part, even customer at 1.5k·SF rows)
  * broadcasts; the only exchanges are the fact-side aggregates' own
  * partial→final shuffles, and the correlated EXISTS/scalar subqueries
  * rewrite to shuffled semi/anti/aggregate joins keyed on the fact keys
  * — the plans AQE picks here are the ones you'd pin at 100 TB.
  */
object TpchFull {
  val probes: Seq[Probe] = Seq(

    // Q1 pricing summary in full (q1_agg is the minimal flagship form)
    Probe.sql("q_tpch_q1",
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
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Q7 volume shipping between two nations, by ship year
    Probe.sql2("q_tpch_q7",
      """SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         year(l_shipdate) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
      """SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS INT) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    // Q8 national market share inside a region, by order year
    Probe.sql2("q_tpch_q8",
      """SELECT o_year,
        |  sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
        |    / sum(volume) AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region   ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA'
        |    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |    AND p_type = 'ECONOMY'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
      """SELECT o_year,
        |  sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
        |    / sum(volume) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region   ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA'
        |    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |    AND p_type = 'ECONOMY'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin),

    // Q9 product-type profit by supplier nation and year (ps_supplycost
    // stand-in: 0.6 * p_retailprice; p_name filter adapted to the
    // synthetic "adjective noun" names)
    Probe.sql2("q_tpch_q9",
      """SELECT nation, o_year, sum(amount) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |         l_extendedprice * (1 - l_discount)
        |           - 0.6 * p_retailprice * l_quantity AS amount
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%gear%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
      """SELECT nation, o_year, sum(amount) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |         l_extendedprice * (1 - l_discount)
        |           - 0.6 * p_retailprice * l_quantity AS amount
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%gear%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin),

    // Q13 customer order-count distribution (left join keeps zero-order
    // customers; o_orderpriority filter stands in for the o_comment
    // NOT LIKE predicate)
    Probe.sql("q_tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // Q15 top supplier by 3-month revenue. Selected by RANK, not by
    // `total_revenue = (SELECT max(...))`: float reduction order differs
    // between engines, so a near-tie under exact-double equality could
    // flip the row set nondeterministically at larger scale factors
    // (ADVICE r4) — row_number over (revenue DESC, suppkey) tie-breaks
    // on an integer key identically in both engines.
    Probe.sql("q_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey),
        |ranked AS (
        |  SELECT supplier_no, total_revenue,
        |         row_number() OVER (ORDER BY total_revenue DESC, supplier_no)
        |           AS rn
        |  FROM revenue)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN ranked ON s_suppkey = supplier_no
        |WHERE rn = 1
        |ORDER BY s_suppkey""".stripMargin),

    // Q17 small-quantity-order revenue (correlated scalar subquery
    // against the per-part average; p_type stands in for p_container)
    Probe.sql("q_tpch_q17",
      """SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin),

    // Q19 discounted revenue under disjunctive brand/type/quantity arms
    // (the OR-of-ANDs pushdown stress; p_type and brands adapted)
    Probe.sql("q_tpch_q19",
      """SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_type IN ('SMALL', 'MEDIUM')
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_type IN ('MEDIUM', 'LARGE')
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#4' AND p_type IN ('LARGE', 'ECONOMY')
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // Q21 suppliers who kept finished orders waiting: the sole late
    // supplier on a multi-supplier order ("late" = shipped >60 days
    // after the order date; EXISTS + NOT EXISTS both correlate on the
    // outer lineitem AND the outer orders row)
    Probe.sql2("q_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND n_name = 'NATION_4'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND n_name = 'NATION_4'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin),

    // ---- Q2/Q11/Q16/Q20: the partsupp quartet on a DERIVED inventory
    // table (round 8 — closes VERDICT r7 missing #3). TESTDATA ships no
    // partsupp; both engines derive the SAME one deterministically from
    // part × supplier: dbgen's own supplier-assignment formula
    // suppkey = (partkey + i·(S/4 + (partkey−1)/S)) mod S + 1, i∈0..3
    // (integer arithmetic, DISTINCT guards the small-S collision case),
    // with availqty/supplycost as integer hash mixes — cents as BIGINT
    // so every aggregate is integer-exact; /100.0 to money is one IEEE
    // division. Literal adaptations for the synthetic columns are noted
    // per query.

    // Q2 minimum-cost supplier (p_size BETWEEN stands in for the exact
    // size on the small synthetic part table; output columns limited to
    // what supplier carries — no address/phone/comment/mfgr)
    Probe.sql2("q_tpch_q2",
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count div 4 + (p_partkey - 1) div s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT explode(sequence(0, 3)) AS i)),
         |ps AS (SELECT ps_partkey, ps_suppkey,
         |    (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
         |    (ps_partkey * 13 + ps_suppkey * 17) % 100000 + 1 AS ps_supplycost_cents
         |  FROM ps0)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
         |       CAST(ps_supplycost_cents AS DOUBLE)/100.0 AS ps_supplycost
         |FROM ps, part, supplier, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size BETWEEN 1 AND 12 AND p_type LIKE '%DARD'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND ps_supplycost_cents = (
         |    SELECT min(ps2.ps_supplycost_cents)
         |    FROM ps ps2, supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
         |      AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count // 4 + (p_partkey - 1) // s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT unnest(range(4)) AS i) t),
         |ps AS (SELECT ps_partkey, ps_suppkey,
         |    (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
         |    (ps_partkey * 13 + ps_suppkey * 17) % 100000 + 1 AS ps_supplycost_cents
         |  FROM ps0)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
         |       CAST(ps_supplycost_cents AS DOUBLE)/100.0 AS ps_supplycost
         |FROM ps, part, supplier, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size BETWEEN 1 AND 12 AND p_type LIKE '%DARD'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND ps_supplycost_cents = (
         |    SELECT min(ps2.ps_supplycost_cents)
         |    FROM ps ps2, supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
         |      AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin),

    // Q11 important stock: integer cents·qty sums are exact; the HAVING
    // threshold is ONE double multiply of an exact integer total
    Probe.sql2("q_tpch_q11",
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count div 4 + (p_partkey - 1) div s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT explode(sequence(0, 3)) AS i)),
         |ps AS (SELECT ps_partkey, ps_suppkey,
         |    (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
         |    (ps_partkey * 13 + ps_suppkey * 17) % 100000 + 1 AS ps_supplycost_cents
         |  FROM ps0)
         |SELECT ps_partkey,
         |  CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
         |FROM ps, supplier, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'NATION_3'
         |GROUP BY ps_partkey
         |HAVING sum(ps_supplycost_cents * ps_availqty) > (
         |  SELECT sum(ps_supplycost_cents * ps_availqty) * CAST(0.001 AS DOUBLE)
         |  FROM ps, supplier, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name = 'NATION_3')
         |ORDER BY value_cents DESC, ps_partkey""".stripMargin,
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count // 4 + (p_partkey - 1) // s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT unnest(range(4)) AS i) t),
         |ps AS (SELECT ps_partkey, ps_suppkey,
         |    (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
         |    (ps_partkey * 13 + ps_suppkey * 17) % 100000 + 1 AS ps_supplycost_cents
         |  FROM ps0)
         |SELECT ps_partkey,
         |  CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
         |FROM ps, supplier, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'NATION_3'
         |GROUP BY ps_partkey
         |HAVING sum(ps_supplycost_cents * ps_availqty) > (
         |  SELECT sum(ps_supplycost_cents * ps_availqty) * CAST(0.001 AS DOUBLE)
         |  FROM ps, supplier, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name = 'NATION_3')
         |ORDER BY value_cents DESC, ps_partkey""".stripMargin),

    // Q16 supplier counts by part attributes (negative account balance
    // stands in for the '%Complaints%' comment filter — supplier has no
    // s_comment in the synthetic schema)
    Probe.sql2("q_tpch_q16",
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count div 4 + (p_partkey - 1) div s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT explode(sequence(0, 3)) AS i))
         |SELECT p_brand, p_type, p_size,
         |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM ps0, part
         |WHERE p_partkey = ps_partkey
         |  AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'PRO%'
         |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count // 4 + (p_partkey - 1) // s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT unnest(range(4)) AS i) t)
         |SELECT p_brand, p_type, p_size,
         |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM ps0, part
         |WHERE p_partkey = ps_partkey
         |  AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'PRO%'
         |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

    // Q20 excess-stock suppliers of 'small%' parts ("no shipments in
    // the window" counts as excess via coalesce(…, 0) — the strict
    // NULL-drops-row form is vacuous on the sparse synthetic pairs;
    // 0.5·sum(l_quantity) is exact: integer-valued doubles, ×2^-1)
    Probe.sql2("q_tpch_q20",
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count div 4 + (p_partkey - 1) div s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT explode(sequence(0, 3)) AS i)),
         |ps AS (SELECT ps_partkey, ps_suppkey,
         |    (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty
         |  FROM ps0)
         |SELECT s_name FROM supplier, nation
         |WHERE s_suppkey IN (
         |    SELECT ps_suppkey FROM ps
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |      AND ps_availqty > (
         |        SELECT coalesce(0.5 * sum(l_quantity), CAST(0 AS DOUBLE)) FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= TIMESTAMP '1995-01-01'
         |          AND l_shipdate < TIMESTAMP '1996-01-01'))
         |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
         |ORDER BY s_name""".stripMargin,
      s"""WITH sc AS (SELECT count(*) AS s_count FROM supplier),
         |ps0 AS (SELECT DISTINCT p_partkey AS ps_partkey,
         |    ((p_partkey + i * (s_count // 4 + (p_partkey - 1) // s_count)) % s_count) + 1 AS ps_suppkey
         |  FROM part, sc, (SELECT unnest(range(4)) AS i) t),
         |ps AS (SELECT ps_partkey, ps_suppkey,
         |    (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty
         |  FROM ps0)
         |SELECT s_name FROM supplier, nation
         |WHERE s_suppkey IN (
         |    SELECT ps_suppkey FROM ps
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |      AND ps_availqty > (
         |        SELECT coalesce(0.5 * sum(l_quantity), CAST(0 AS DOUBLE)) FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= TIMESTAMP '1995-01-01'
         |          AND l_shipdate < TIMESTAMP '1996-01-01'))
         |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
         |ORDER BY s_name""".stripMargin),

    // Q22 dormant high-balance customers by country code (c_nationkey
    // digit stands in for the phone prefix; "no orders in the last ~18
    // months" replaces "no orders ever", which is vacuous here)
    Probe.sql("q_tpch_q22",
      """SELECT cntrycode, count(*) AS numcust, sum(c_acctbal) AS totacctbal
        |FROM (
        |  SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal,
        |         c_custkey
        |  FROM customer
        |  WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
        |    AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                     WHERE c_acctbal > 0.00
        |                       AND c_nationkey % 10 IN (1, 3, 5, 7, 9))
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |) custsale
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin)
  )
}
