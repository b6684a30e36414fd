package graft.probes

import graft.Probe

/** SURVEY §2.9 — the DataFusion 40 scalar-function families
  * (datafusion-functions / -array, Cargo.lock:1161/1205). One probe per
  * family, plus probes that exercise the DFCompat shims (date_bin, strpos,
  * substr_index, array_has_*). All run over table columns (not constants)
  * so they execute inside whole-stage codegen over the scan, the shape
  * that matters at scale.
  */
object ScalarFunctions {
  val probes: Seq[Probe] = Seq(

    // Transcendental outputs are quantized to 6 decimals on BOTH sides:
    // the driver hash-compares values exactly, and JVM Math vs DuckDB libm
    // differ by ULPs on ln/exp/cbrt/trig (round-1 q_fn_math hash mismatch).
    Probe.sql2("q_fn_math",
      """SELECT p_partkey,
        |  abs(p_retailprice - 1000) AS v_abs,
        |  ceil(p_retailprice / 100) AS v_ceil,
        |  floor(p_retailprice / 100) AS v_floor,
        |  round(p_retailprice / 7, 2) AS v_round,
        |  round(sqrt(p_retailprice), 6) AS v_sqrt,
        |  round(power(p_size, 2), 6) AS v_pow,
        |  round(ln(p_retailprice), 6) AS v_ln,
        |  round(log10(p_retailprice), 6) AS v_log10,
        |  round(log2(greatest(p_size, 1)), 6) AS v_log2,
        |  round(exp(p_size / 100.0), 6) AS v_exp,
        |  sign(p_retailprice - 1200) AS v_sign,
        |  mod(p_size, 7) AS v_mod,
        |  round(degrees(p_size / 50.0), 6) AS v_deg,
        |  round(radians(p_size), 6) AS v_rad,
        |  round(cbrt(p_retailprice), 6) AS v_cbrt,
        |  round(sin(p_size) + cos(p_size) + atan(p_size), 6) AS v_trig
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |  abs(p_retailprice - 1000) AS v_abs,
        |  CAST(ceil(p_retailprice / 100) AS BIGINT) AS v_ceil,
        |  CAST(floor(p_retailprice / 100) AS BIGINT) AS v_floor,
        |  round(p_retailprice / 7, 2) AS v_round,
        |  round(sqrt(p_retailprice), 6) AS v_sqrt,
        |  round(power(p_size, 2), 6) AS v_pow,
        |  round(ln(p_retailprice), 6) AS v_ln,
        |  round(log10(p_retailprice), 6) AS v_log10,
        |  round(log2(greatest(p_size, 1)), 6) AS v_log2,
        |  round(exp(p_size / 100.0), 6) AS v_exp,
        |  CAST(sign(p_retailprice - 1200) AS DOUBLE) AS v_sign,
        |  mod(p_size, 7) AS v_mod,
        |  round(degrees(p_size / 50.0), 6) AS v_deg,
        |  round(radians(p_size), 6) AS v_rad,
        |  round(cbrt(p_retailprice), 6) AS v_cbrt,
        |  round(sin(p_size) + cos(p_size) + atan(p_size), 6) AS v_trig
        |FROM part
        |ORDER BY p_partkey""".stripMargin),

    Probe.sql2("q_fn_string",
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  length(c_name) AS len,
        |  substr(c_name, 3, 8) AS sub,
        |  c_name || ':' || c_mktsegment AS cat,
        |  concat_ws('-', c_mktsegment, c_name) AS catws,
        |  replace(c_name, 'Customer', 'C') AS rep,
        |  reverse(c_mktsegment) AS rev,
        |  lpad(c_mktsegment, 12, '*') AS lp,
        |  rpad(c_mktsegment, 12, '*') AS rp,
        |  trim('  x  ') AS tr,
        |  ltrim('  x') AS ltr, rtrim('x  ') AS rtr,
        |  left(c_name, 4) AS lft, right(c_name, 3) AS rgt,
        |  repeat(c_mktsegment, 2) AS rep2,
        |  ascii(c_mktsegment) AS asc_c, chr(65 + c_nationkey % 26) AS chr_c,
        |  split_part(c_name, '#', 2) AS spart,
        |  strpos(c_name, '#') AS pos,
        |  substr_index(c_name, '#', 1) AS sidx,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS transl,
        |  starts_with(c_name, 'Customer') AS sw,
        |  ends_with(c_name, '1') AS ew
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  length(c_name) AS len,
        |  substr(c_name, 3, 8) AS sub,
        |  c_name || ':' || c_mktsegment AS cat,
        |  concat_ws('-', c_mktsegment, c_name) AS catws,
        |  replace(c_name, 'Customer', 'C') AS rep,
        |  reverse(c_mktsegment) AS rev,
        |  lpad(c_mktsegment, 12, '*') AS lp,
        |  rpad(c_mktsegment, 12, '*') AS rp,
        |  trim('  x  ') AS tr,
        |  ltrim('  x') AS ltr, rtrim('x  ') AS rtr,
        |  left(c_name, 4) AS lft, right(c_name, 3) AS rgt,
        |  repeat(c_mktsegment, 2) AS rep2,
        |  ascii(c_mktsegment) AS asc_c, chr(65 + c_nationkey % 26) AS chr_c,
        |  split_part(c_name, '#', 2) AS spart,
        |  strpos(c_name, '#') AS pos,
        |  split_part(c_name, '#', 1) AS sidx,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS transl,
        |  starts_with(c_name, 'Customer') AS sw,
        |  ends_with(c_name, '1') AS ew
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Probe.sql2("q_fn_regex",
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', '#') AS masked,
        |  regexp_like(c_name, '^Customer#[0-9]+$') AS matches,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS first_num
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  regexp_matches(c_name, '^Customer#[0-9]+$') AS matches,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS first_num
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Probe.sql2("q_fn_datetime",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  hour(o_orderdate) AS h, minute(o_orderdate) AS mi,
        |  date_trunc('month', o_orderdate) AS mon_start,
        |  date_trunc('day', o_orderdate) AS day_start,
        |  extract(quarter FROM o_orderdate) AS q,
        |  date_part('dow', o_orderdate) AS dow,
        |  CAST(o_orderdate AS DATE) AS as_date,
        |  date_format(o_orderdate, 'yyyy-MM-dd HH:mm') AS fmt,
        |  unix_timestamp(o_orderdate) AS epoch_s
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  hour(o_orderdate) AS h, minute(o_orderdate) AS mi,
        |  date_trunc('month', o_orderdate) AS mon_start,
        |  date_trunc('day', o_orderdate) AS day_start,
        |  extract(quarter FROM o_orderdate) AS q,
        |  CAST(date_part('dow', o_orderdate) + 1 AS INT) AS dow,
        |  CAST(o_orderdate AS DATE) AS as_date,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M') AS fmt,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin),

    // date_bin — custom Catalyst expression (graft.functions.DateBin);
    // DuckDB oracle via time_bucket with the same origin.
    Probe.sql2("q_date_bin",
      """SELECT date_bin(INTERVAL 15 MINUTE, ts, TIMESTAMP '2024-01-01 00:00:00') AS bucket,
        |  count(*) AS n, sum(value) AS sum_v
        |FROM events
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts, TIMESTAMP '2024-01-01 00:00:00') AS bucket,
        |  count(*) AS n, sum(value) AS sum_v
        |FROM events
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin),

    Probe.sql2("q_fn_hash",
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha2(c_name, 256) AS h_sha256,
        |  base64(CAST(c_mktsegment AS BINARY)) AS b64,
        |  hex(c_custkey) AS hx
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha256(c_name) AS h_sha256,
        |  to_base64(CAST(c_mktsegment AS BLOB)) AS b64,
        |  CASE WHEN c_custkey = 0 THEN '0'
        |       ELSE ltrim(hex(c_custkey), '0') END AS hx
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Probe.sql2("q_fn_conditional",
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  ifnull(NULL, c_name) AS name2,
        |  nvl2(nullif(c_nationkey, 0), 'has_nation', 'no_nation') AS nn,
        |  greatest(c_acctbal, 0.0) AS bal_pos,
        |  least(c_acctbal, 5000.0) AS bal_cap,
        |  if(c_acctbal > 0, 'pos', 'neg') AS sign_cls
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  ifnull(NULL, c_name) AS name2,
        |  CASE WHEN nullif(c_nationkey, 0) IS NOT NULL
        |       THEN 'has_nation' ELSE 'no_nation' END AS nn,
        |  greatest(c_acctbal, 0.0) AS bal_pos,
        |  least(c_acctbal, 5000.0) AS bal_cap,
        |  CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'neg' END AS sign_cls
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Probe.sql2("q_fn_array",
      """SELECT doc_id,
        |  size(split(text, ' ')) AS n_words,
        |  element_at(split(text, ' '), 1) AS first_word,
        |  element_at(split(text, ' '), -1) AS last_word,
        |  array_contains(split(text, ' '), 'spark') AS has_spark,
        |  size(array_distinct(split(text, ' '))) AS n_uniq,
        |  array_join(slice(sort_array(array_distinct(split(text, ' '))), 1, 3), ',') AS top3,
        |  size(array_intersect(split(text, ' '), array('spark', 'sql', 'join'))) AS n_kw
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_words,
        |  string_split(text, ' ')[1] AS first_word,
        |  string_split(text, ' ')[-1] AS last_word,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS top3,
        |  len(list_intersect(string_split(text, ' '), ['spark', 'sql', 'join'])) AS n_kw
        |FROM documents
        |ORDER BY doc_id""".stripMargin),

    // struct build + field access
    Probe.sql2("q_fn_struct",
      """SELECT t.s.k AS k, t.s.seg AS seg, count(*) AS n
        |FROM (SELECT named_struct('k', c_nationkey, 'seg', c_mktsegment) AS s
        |      FROM customer) t
        |GROUP BY t.s.k, t.s.seg
        |ORDER BY k, seg""".stripMargin,
      """SELECT s.k AS k, s.seg AS seg, count(*) AS n
        |FROM (SELECT struct_pack(k := c_nationkey, seg := c_mktsegment) AS s
        |      FROM customer) t
        |GROUP BY s.k, s.seg
        |ORDER BY k, seg""".stripMargin),

    // JSON access over events.props
    Probe.sql2("q_fn_json",
      """SELECT event_id,
        |  CAST(get_json_object(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE event_id < 200
        |ORDER BY event_id""".stripMargin,
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE event_id < 200
        |ORDER BY event_id""".stripMargin),

    // DFCompat shims over array helpers
    Probe.sql2("q_fn_array_compat",
      """SELECT doc_id,
        |  array_has_all(split(text, ' '), array('the', 'data')) AS has_both,
        |  array_has_any(split(text, ' '), array('spark', 'flink')) AS has_any
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin,
      """SELECT doc_id,
        |  list_has_all(string_split(text, ' '), ['the', 'data']) AS has_both,
        |  list_has_any(string_split(text, ' '), ['spark', 'flink']) AS has_any
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin)
  )
}
