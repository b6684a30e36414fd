package graft.probes

import graft.Probe

/** SURVEY §2.10 — CTEs (incl. recursive), subquery decorrelation, VALUES,
  * UNNEST, CASE/CAST. Catalyst rewrites the correlated forms to semi/anti/
  * left joins exactly like datafusion-optimizer (Cargo.lock:1226) does.
  */
object Constructs {
  val probes: Seq[Probe] = Seq(

    // SIMILAR TO — in the reference's grammar (sqlparser via ctx.sql,
    // lib.rs:678); Spark has no such operator, so the Engine's
    // prepare/plan path rewrites it to an anchored RLIKE
    // (Engine.rewriteSimilarTo), exercised here directly. The oracle
    // states the SQL-standard semantics (% → .*, _ → ., '.' literal,
    // alternation/classes kept) as DuckDB's regex-flavored SIMILAR TO,
    // validating the translation against an independent regex engine.
    Probe.df("q_similar_to",
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name SIMILAR TO '.*(green|blue).*'
        |   OR p_type SIMILAR TO '(STANDARD|SMALL) [A-Z].*'
        |ORDER BY p_partkey""".stripMargin) { (s, _) =>
      s.sql(graft.engine.Engine.rewriteSimilarTo(
        """SELECT p_partkey, p_name, p_type FROM part
          |WHERE p_name SIMILAR TO '%(green|blue)%'
          |   OR p_type SIMILAR TO '(STANDARD|SMALL) [A-Z]%'
          |ORDER BY p_partkey""".stripMargin))
    },

    Probe.sql("q_cte",
      """WITH big_orders AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_totalprice > 200000
        |), cust AS (
        |  SELECT c_custkey, c_name FROM customer
        |)
        |SELECT c_name, count(*) AS n_big
        |FROM big_orders b JOIN cust c ON b.o_custkey = c.c_custkey
        |GROUP BY c_name
        |ORDER BY c_name""".stripMargin),

    // WITH RECURSIVE — verified native on Spark 4.1.2 (SURVEY §2.10);
    // integer sum cast to BIGINT because DuckDB sums ints into HUGEINT.
    Probe.sql("q_recursive_cte",
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT n + 1 FROM t WHERE n < 100
        |)
        |SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS cnt FROM t""".stripMargin),

    Probe.sql("q_scalar_subquery",
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin),

    // correlated scalar subquery (decorrelated to an aggregate+join)
    Probe.sql("q_corr_scalar_subquery",
      """SELECT o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT 2 * avg(l_extendedprice)
        |  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    Probe.sql("q_in_subquery",
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice > 250000
        |ORDER BY o_orderkey""".stripMargin),

    Probe.sql("q_not_in_subquery",
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_nationkey NOT IN (SELECT r_regionkey FROM region)
        |ORDER BY s_suppkey""".stripMargin),

    Probe.sql("q_values",
      """SELECT a, b FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(a, b)
        |ORDER BY a""".stripMargin),

    Probe.sql2("q_unnest",
      """SELECT c FROM (SELECT explode(sequence(1, 10)) AS c) t
        |WHERE c % 2 = 0 ORDER BY c""".stripMargin,
      """SELECT c FROM (SELECT unnest(generate_series(1, 10)) AS c) t
        |WHERE c % 2 = 0 ORDER BY c""".stripMargin),

    // UNNEST over real per-row arrays (split text → words)
    Probe.sql2("q_unnest_column",
      """SELECT doc_id, word, count(*) AS n
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS word
        |      FROM documents WHERE doc_id < 20) t
        |WHERE length(word) > 0
        |GROUP BY doc_id, word
        |ORDER BY doc_id, word""".stripMargin,
      """SELECT doc_id, word, count(*) AS n
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |      FROM documents WHERE doc_id < 20) t
        |WHERE length(word) > 0
        |GROUP BY doc_id, word
        |ORDER BY doc_id, word""".stripMargin),

    Probe.sql("q_case_when",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 250000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  CASE o_orderstatus WHEN 'F' THEN 'final'
        |                     WHEN 'O' THEN 'open'
        |                     ELSE 'other' END AS status_name
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin),

    Probe.sql2("q_cast",
      """SELECT CAST('42' AS INT) AS i,
        |  CAST(3.9 AS INT) AS trunc_i,
        |  CAST(42 AS STRING) AS s,
        |  CAST('2024-03-15' AS DATE) AS d,
        |  CAST('2024-03-15 12:30:00' AS TIMESTAMP) AS ts,
        |  TRY_CAST('abc' AS INT) AS bad_i,
        |  TRY_CAST('1e3' AS DOUBLE) AS sci""".stripMargin,
      """SELECT CAST('42' AS INT) AS i,
        |  CAST(trunc(3.9) AS INT) AS trunc_i,
        |  CAST(42 AS VARCHAR) AS s,
        |  CAST('2024-03-15' AS DATE) AS d,
        |  CAST('2024-03-15 12:30:00' AS TIMESTAMP) AS ts,
        |  TRY_CAST('abc' AS INT) AS bad_i,
        |  TRY_CAST('1e3' AS DOUBLE) AS sci""".stripMargin),

    // predicate zoo: BETWEEN / IN-list / LIKE / IS NULL / IS DISTINCT FROM
    Probe.sql2("q_predicates",
      """SELECT o_orderkey
        |FROM orders
        |WHERE o_totalprice BETWEEN 100000 AND 150000
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderstatus LIKE 'F%'
        |  AND o_custkey IS NOT NULL
        |  AND NOT (o_orderstatus <=> 'P')
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey
        |FROM orders
        |WHERE o_totalprice BETWEEN 100000 AND 150000
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderstatus LIKE 'F%'
        |  AND o_custkey IS NOT NULL
        |  AND o_orderstatus IS DISTINCT FROM 'P'
        |ORDER BY o_orderkey""".stripMargin)
  )
}
