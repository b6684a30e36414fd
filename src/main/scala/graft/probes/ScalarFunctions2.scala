package graft.probes

import graft.Probe

/** Second scalar-function sweep — the SURVEY §2.9 rows not covered by the
  * first file: string similarity/positioning, integer/bit math, interval
  * arithmetic & date parts, array mutation shims, ILIKE, regexp_match,
  * to_char. */
object ScalarFunctions2 {
  val probes: Seq[Probe] = Seq(

    Probe.sql2("q_fn_string2",
      """SELECT c_custkey,
        |  levenshtein(c_mktsegment, 'BUILDING') AS lev,
        |  overlay(c_name PLACING 'XX' FROM 3 FOR 2) AS ovl,
        |  initcap(lower(c_mktsegment)) AS ic,
        |  position('#' IN c_name) AS pos_in,
        |  instr(c_name, 'mer') AS ins,
        |  locate('mer', c_name) AS loc,
        |  substring_index(c_name, '#', 1) AS sidx,
        |  char_length(c_name) AS clen,
        |  bit_length(c_mktsegment) AS blen,
        |  octet_length(c_name) AS olen,
        |  find_in_set(c_mktsegment, 'AUTOMOBILE,BUILDING,FURNITURE') AS fis
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |  levenshtein(c_mktsegment, 'BUILDING') AS lev,
        |  concat(substr(c_name, 1, 2), 'XX', substr(c_name, 5)) AS ovl,
        |  concat(upper(substr(lower(c_mktsegment),1,1)), substr(lower(c_mktsegment),2)) AS ic,
        |  position('#' IN c_name) AS pos_in,
        |  instr(c_name, 'mer') AS ins,
        |  instr(c_name, 'mer') AS loc,
        |  split_part(c_name, '#', 1) AS sidx,
        |  length(c_name) AS clen,
        |  bit_length(c_mktsegment) AS blen,
        |  octet_length(encode(c_name)) AS olen,
        |  CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
        |       WHEN 'FURNITURE' THEN 3 ELSE 0 END AS fis
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Probe.sql2("q_fn_math2",
      """SELECT p_partkey,
        |  factorial(CAST(p_size % 10 AS INT)) AS fact,
        |  gcd(p_size, 24) AS g,
        |  lcm(CAST(p_size % 7 + 1 AS BIGINT), 6) AS l,
        |  isnan(CAST(p_retailprice AS DOUBLE)) AS nan_chk,
        |  nanvl(p_retailprice, 0.0) AS nv,
        |  width_bucket(p_retailprice, 0, 2000, 10) AS wb,
        |  pmod(p_size - 30, 7) AS pm,
        |  shiftleft(p_size, 2) AS shl,
        |  shiftright(p_size, 1) AS shr,
        |  p_size & 12 AS band, p_size | 3 AS bor, p_size ^ 5 AS bxor,
        |  ~p_size AS bnot
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |  CAST(factorial(p_size % 10) AS BIGINT) AS fact,
        |  gcd(p_size, 24) AS g,
        |  lcm(p_size % 7 + 1, 6) AS l,
        |  isnan(p_retailprice) AS nan_chk,
        |  CASE WHEN isnan(p_retailprice) THEN 0.0 ELSE p_retailprice END AS nv,
        |  CASE WHEN p_retailprice < 0 THEN 0
        |       WHEN p_retailprice >= 2000 THEN 11
        |       ELSE CAST(floor(p_retailprice / 200) + 1 AS INT) END AS wb,
        |  ((p_size - 30) % 7 + 7) % 7 AS pm,
        |  p_size * 4 AS shl,
        |  p_size // 2 AS shr,
        |  p_size & 12 AS band, p_size | 3 AS bor, xor(p_size, 5) AS bxor,
        |  ~p_size AS bnot
        |FROM part
        |ORDER BY p_partkey""".stripMargin),

    Probe.sql2("q_fn_datetime2",
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 DAY AS plus3d,
        |  o_orderdate - INTERVAL 90 MINUTE AS minus90m,
        |  datediff(DATE '1998-01-01', CAST(o_orderdate AS DATE)) AS dd,
        |  date_add(CAST(o_orderdate AS DATE), 7) AS dadd,
        |  add_months(CAST(o_orderdate AS DATE), 2) AS amon,
        |  last_day(CAST(o_orderdate AS DATE)) AS ld,
        |  weekofyear(o_orderdate) AS woy,
        |  dayofyear(o_orderdate) AS doy,
        |  make_date(2024, 5, CAST(o_orderkey % 28 + 1 AS INT)) AS md,
        |  unix_timestamp(o_orderdate) AS ep
        |FROM orders
        |WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 DAY AS plus3d,
        |  o_orderdate - INTERVAL 90 MINUTE AS minus90m,
        |  CAST(datediff('day', o_orderdate::DATE, DATE '1998-01-01') AS INT) AS dd,
        |  o_orderdate::DATE + 7 AS dadd,
        |  (o_orderdate::DATE + INTERVAL 2 MONTH)::DATE AS amon,
        |  last_day(o_orderdate::DATE) AS ld,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  make_date(2024, 5, CAST(o_orderkey % 28 + 1 AS INT)) AS md,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS ep
        |FROM orders
        |WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin),

    Probe.sql2("q_fn_array2",
      """SELECT p_partkey,
        |  array_join(array_append(array(1, 2), p_size), ',') AS app,
        |  array_join(array_prepend(p_size, array(1, 2)), ',') AS prep,
        |  array_join(array_remove(array(1, 2, 1, 3), 1), ',') AS rem,
        |  array_join(array_repeat(p_size, 3), ',') AS rep,
        |  array_position(array(5, 10, 15), CAST(p_size % 20 AS INT)) AS apos,
        |  array_join(sequence(1, 10, 3), ',') AS seq3,
        |  array_join(array_pop_back(array(1, 2, 3)), ',') AS popb,
        |  array_join(array_pop_front(array(1, 2, 3)), ',') AS popf,
        |  array_join(array_compact(array(1, NULL, 2)), ',') AS compacted
        |FROM part
        |WHERE p_partkey < 50
        |ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |  array_to_string(list_append([1, 2], p_size), ',') AS app,
        |  array_to_string(list_prepend(p_size, [1, 2]), ',') AS prep,
        |  array_to_string([x for x in [1, 2, 1, 3] if x != 1], ',') AS rem,
        |  array_to_string([p_size for x in range(3)], ',') AS rep,
        |  CAST(coalesce(list_position([5, 10, 15], p_size % 20), 0) AS BIGINT) AS apos,
        |  array_to_string(range(1, 11, 3), ',') AS seq3,
        |  '1,2' AS popb,
        |  '2,3' AS popf,
        |  '1,2' AS compacted
        |FROM part
        |WHERE p_partkey < 50
        |ORDER BY p_partkey""".stripMargin),

    Probe.sql2("q_fn_ilike_regexp",
      """SELECT c_custkey,
        |  c_mktsegment ILIKE 'build%' AS il,
        |  c_name ILIKE '%customer%' AS il2,
        |  array_join(regexp_match(c_name, 'Customer#[0-9]{3}'), ',') AS rm,
        |  to_char(TIMESTAMP '2024-03-15 13:14:15', '%Y-%m-%d %H:%M:%S') AS tc
        |FROM customer
        |WHERE c_custkey < 300
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |  c_mktsegment ILIKE 'build%' AS il,
        |  c_name ILIKE '%customer%' AS il2,
        |  CASE WHEN regexp_matches(c_name, 'Customer#[0-9]{3}')
        |       THEN regexp_extract(c_name, 'Customer#[0-9]{3}') END AS rm,
        |  strftime(TIMESTAMP '2024-03-15 13:14:15', '%Y-%m-%d %H:%M:%S') AS tc
        |FROM customer
        |WHERE c_custkey < 300
        |ORDER BY c_custkey""".stripMargin),

    // LATERAL correlated subquery in FROM (top-2 orders per customer)
    Probe.sql("q_lateral",
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |           WHERE o.o_custkey = c.c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey < 100
        |ORDER BY c_custkey, t.o_orderkey""".stripMargin)
  )
}
