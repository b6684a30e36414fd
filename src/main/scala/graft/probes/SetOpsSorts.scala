package graft.probes

import graft.Probe

/** SURVEY §2.7 (sort/limit/top-k) + §2.8 (set operations). Top-K probes
  * deliberately use the `ORDER BY … LIMIT k` shape Spark fuses into
  * `TakeOrderedAndProject` — no global sort at scale.
  */
object SetOpsSorts {
  val probes: Seq[Probe] = Seq(

    Probe.sql("q_topk",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin),

    Probe.sql("q_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_orderkey
        |LIMIT 10 OFFSET 7""".stripMargin),

    // multi-key sort, mixed direction, explicit null placement on a
    // genuinely-nullable column (LEFT JOIN miss)
    Probe.sql("q_sort_nulls",
      """SELECT c_custkey, o.o_orderkey
        |FROM customer c LEFT JOIN
        |  (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 150000) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_orderkey ASC NULLS FIRST, c_custkey DESC
        |LIMIT 500""".stripMargin),

    Probe.sql("q_union_all",
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier
        |) u GROUP BY k ORDER BY k""".stripMargin),

    Probe.sql("q_union_distinct",
      """SELECT c_nationkey AS k FROM customer
        |UNION
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin),

    Probe.sql("q_intersect",
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin),

    Probe.sql("q_except",
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin),

    Probe.sql("q_intersect_all",
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber = 1
        |  INTERSECT ALL
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber = 2
        |) t GROUP BY k ORDER BY k""".stripMargin),

    Probe.sql("q_except_all",
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber <= 2
        |  EXCEPT ALL
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber = 2
        |) t GROUP BY k ORDER BY k""".stripMargin)
  )
}
