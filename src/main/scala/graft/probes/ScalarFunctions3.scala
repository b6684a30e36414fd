package graft.probes

import graft.Probe

/** Third sweep: map type, struct arrays (arrays_zip/inline/posexplode),
  * TRY_ arithmetic, grouping_id, range-predicate join. Map/struct outputs
  * are stringified — cross-engine nested-value representation is not part
  * of the contract, the VALUES are. */
object ScalarFunctions3 {
  val probes: Seq[Probe] = Seq(

    Probe.sql2("q_fn_map",
      """SELECT c_custkey,
        |  element_at(map('seg', c_mktsegment, 'name', c_name), 'seg') AS seg_v,
        |  array_join(sort_array(map_keys(map('a', 1, 'b', 2))), ',') AS ks,
        |  CAST(size(map('a', 1, 'b', 2)) AS INT) AS msize
        |FROM customer
        |WHERE c_custkey < 200
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |  map(['seg', 'name'], [c_mktsegment, c_name])['seg'][1] AS seg_v,
        |  array_to_string(list_sort(map_keys(map(['a','b'],[1,2]))), ',') AS ks,
        |  CAST(cardinality(map(['a','b'],[1,2])) AS INT) AS msize
        |FROM customer
        |WHERE c_custkey < 200
        |ORDER BY c_custkey""".stripMargin),

    // arrays_zip + posexplode: pair up two arrays positionally and unnest
    Probe.sql2("q_fn_struct_array",
      """SELECT doc_id, pos, z.`0` AS w1, z.`1` AS w2
        |FROM documents
        |LATERAL VIEW posexplode(arrays_zip(slice(split(text, ' '), 1, 5),
        |                                   slice(split(text, ' '), 2, 5))) t AS pos, z
        |WHERE doc_id < 10
        |ORDER BY doc_id, pos""".stripMargin,
      """SELECT doc_id, pos, w1, w2 FROM (
        |  SELECT doc_id, (k.k - 1) AS pos,
        |    string_split(text, ' ')[k.k] AS w1,
        |    string_split(text, ' ')[k.k + 1] AS w2
        |  FROM documents, (SELECT unnest(generate_series(1, 5)) AS k) k
        |  WHERE doc_id < 10
        |) ORDER BY doc_id, pos""".stripMargin),

    // ANSI-safe TRY_ arithmetic (DataFusion wraps; Spark ANSI throws —
    // TRY_ forms give the NULL-on-error semantics portably)
    Probe.sql2("q_try_arith",
      """SELECT p_partkey,
        |  try_divide(p_retailprice, p_size - p_size) AS div0,
        |  try_divide(p_retailprice, 4) AS div4,
        |  try_add(9223372036854775807, p_partkey) AS ovf,
        |  try_multiply(CAST(p_size AS BIGINT), 1000000) AS mul
        |FROM part
        |WHERE p_partkey < 100
        |ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |  CASE WHEN p_size - p_size = 0 THEN NULL
        |       ELSE p_retailprice / (p_size - p_size) END AS div0,
        |  p_retailprice / 4 AS div4,
        |  CASE WHEN p_partkey = 0 THEN 9223372036854775807 ELSE NULL END AS ovf,
        |  p_size * 1000000 AS mul
        |FROM part
        |WHERE p_partkey < 100
        |ORDER BY p_partkey""".stripMargin),

    Probe.sql2("q_grouping_id",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // range-predicate join (date window containment)
    Probe.sql("q_join_range",
      """SELECT o1.o_orderkey AS k1, count(*) AS n_within_week
        |FROM orders o1 JOIN orders o2
        |  ON o2.o_orderdate BETWEEN o1.o_orderdate
        |     AND o1.o_orderdate + INTERVAL 7 DAY
        |  AND o1.o_custkey = o2.o_custkey
        |  AND o1.o_orderkey <> o2.o_orderkey
        |GROUP BY o1.o_orderkey
        |ORDER BY k1""".stripMargin)
  )
}
