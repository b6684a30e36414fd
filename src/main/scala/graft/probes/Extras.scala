package graft.probes

import graft.{Probe, Tables}
import org.apache.spark.sql.functions.{col, floor}

/** Late-round coverage: argmin/argmax aggregates, subquery in HAVING,
  * inverse-trig/hyperbolic math, bit_count, the TopKPerKey custom
  * physical operator, one-pass data profiling. */
object Extras {

  /** DuckDB SUMMARIZE-equivalent for [[graft.operators.Stats.profile]]:
    * one per-column SELECT (min/max rendered as VARCHAR, null and exact
    * distinct counts, table rowcount), UNION ALL'd. The oracle side may
    * scan once per column — it only ever runs at oracle scale; the Spark
    * side is pinned to ONE aggregate pass. */
  private def profileOracle(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value,
         |  CAST(count(*) - count($c) AS BIGINT) AS null_count,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(count(*) AS BIGINT) AS n_rows FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Partial oracle for the approx tier: the exact sketch outputs are
    * hash-checked; the HLL estimate is reduced to a sanity boolean the
    * oracle asserts TRUE (estimates themselves are engine-specific). */
  private def profileOracleApprox(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value,
         |  CAST(count(*) - count($c) AS BIGINT) AS null_count,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  TRUE AS distinct_sane FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  val probes: Seq[Probe] = Seq(

    // One-pass per-column profile (min/max/nulls/distinct/rowcount) —
    // exactDistinct so the counts are engine-independent (HLL sketches
    // are not). Spark plans a single scan + global aggregate.
    Probe.df("q_profile",
      profileOracle("orders", Seq("o_orderkey", "o_custkey",
        "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority"))) { (s, dir) =>
      graft.operators.Stats.profile(
          Tables.load(s, dir, "orders"), exactDistinct = true)
        .orderBy("column_name")
    },

    // Symmetric per-vector int8 quantization (operators/Quantize):
    // same-operand IEEE steps, so the DuckDB oracle replays scale AND
    // every code exactly. The code array is emitted comma-joined (a
    // deterministic scalar) because the driver's pandas row-sorter cannot
    // sort array cells; QuantizeSpec covers the typed array.
    Probe.df("q_quantize_int8",
      """WITH s AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings)
        |SELECT vec_id, scale,
        |  array_to_string(list_transform(embedding, x -> CAST(
        |    CASE WHEN scale = 0 THEN 0
        |         ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END
        |    AS TINYINT)), ',') AS q
        |FROM s ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col}
      graft.operators.Quantize.int8(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding")
        .withColumn("q", array_join(col("q").cast("array<string>"), ","))
        .orderBy("vec_id")
    },

    // The profile's SCALE tier (one-pass ProfileSketch kernel). The HLL
    // estimates are not cross-engine-stable, so the probe hashes the
    // sketch's EXACT outputs (min/max/nulls/rows — ProfileSketchSpec
    // proves exact parity of the estimates' machinery separately) and
    // reduces n_distinct to a sanity bound the oracle states as TRUE:
    // ≥1 distinct unless the column is all-null, ≤2× the row count
    // (HLL++ at default 5% error cannot miss 2× on these
    // cardinalities). The sketch still computes every field — the
    // benched plan is unchanged (VERDICT r9 #3).
    Probe.df("q_profile_approx",
      profileOracleApprox("lineitem", Seq("l_orderkey", "l_partkey",
        "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate"))) { (s, dir) =>
      import org.apache.spark.sql.functions.{col, least, lit}
      graft.operators.Stats.profile(
          Tables.load(s, dir, "lineitem"), exactDistinct = false)
        .select(col("column_name"), col("min_value"), col("max_value"),
          col("null_count"), col("n_rows"),
          (col("n_distinct") >=
              least(lit(1L), col("n_rows") - col("null_count")) &&
            col("n_distinct") <= col("n_rows") * 2).as("distinct_sane"))
        .orderBy("column_name")
    },

    // Equi-width histogram (operators/Stats.histogramWidth): bucket math
    // is same-operand IEEE arithmetic, so bin ids AND double bounds
    // hash-match DuckDB exactly.
    Probe.df("q_histogram",
      """WITH mm AS (SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |                   max(CAST(l_extendedprice AS DOUBLE)) AS mx
        |            FROM lineitem),
        |b AS (SELECT CASE WHEN mx = mn THEN 0
        |        ELSE LEAST(CAST(floor((CAST(l_extendedprice AS DOUBLE) - mn)
        |                    / ((mx - mn) / 20.0)) AS BIGINT), 19) END AS bin,
        |        mn, mx
        |      FROM lineitem, mm)
        |SELECT bin, mn + bin * ((mx - mn) / 20.0) AS bin_lo,
        |       mn + (bin + 1) * ((mx - mn) / 20.0) AS bin_hi,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY bin, mn, mx
        |ORDER BY bin""".stripMargin) { (s, dir) =>
      graft.operators.Stats.histogramWidth(
          Tables.load(s, dir, "lineitem"), "l_extendedprice", bins = 20)
        .orderBy("bin")
    },

    // Equi-depth histogram, exact ntile tier (the approx scale tier is
    // spec-checked — sketches are not cross-engine-stable)
    Probe.df("q_histogram_depth",
      """WITH t AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
        |  CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER)
        |    AS bin FROM orders)
        |SELECT bin, min(v) AS bin_lo, max(v) AS bin_hi,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM t GROUP BY bin
        |ORDER BY bin""".stripMargin) { (s, dir) =>
      graft.operators.Stats.histogramDepth(
          Tables.load(s, dir, "orders"), "o_totalprice", bins = 10,
          tieBreak = Seq("o_orderkey"))
        .orderBy("bin")
    },

    // Batch sessionization (operators/Sessionize): gap arithmetic on
    // unix_micros — exact integers, bit-identical boundaries cross-engine
    Probe.df("q_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin) { (s, dir) =>
      graft.operators.Sessionize.sessions(
          Tables.load(s, dir, "events"), "user_id", "ts",
          gapSeconds = 1800, tieBreak = Seq("event_id"))
        .orderBy("user_id", "session_seq")
    },

    // Robust per-group outliers (Hampel MAD rule) on the skewed
    // events.value stream, quantized to integer milli-units so medians
    // interpolate to exact halves/quarters and the outlier FLAG (which
    // picks rows) is bit-identical cross-engine; ~11% of events flag at
    // c=3, so the probe exercises both branches. Bare 3.0 would be
    // DECIMAL in DuckDB — CAST keeps the multiply in doubles.
    Probe.df("q_outlier_mad",
      """WITH b AS (SELECT event_id, event_type,
        |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        |m AS (SELECT event_type, median(v) AS med FROM b
        |      GROUP BY event_type),
        |d AS (SELECT b.event_id, b.event_type, b.v, m.med,
        |    abs(b.v - m.med) AS dev FROM b JOIN m USING (event_type)),
        |m2 AS (SELECT event_type, median(dev) AS mad FROM d
        |       GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.v, d.med, m2.mad, d.dev,
        |  (d.dev > CAST(3.0 AS DOUBLE) * m2.mad) AS is_outlier
        |FROM d JOIN m2 USING (event_type)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val b = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 1000).cast("long").as("v"))
      graft.operators.Stats.robustOutliers(b, Seq("event_type"), "v")
        .select(col("event_id"), col("event_type"), col("v"), col("med"),
          col("mad"), col("dev"), col("is_outlier"))
        .orderBy("event_id")
    },

    // Custom whole-operator path (LogicalPlan + Strategy + SparkPlan with
    // bounded heaps — graft.plans.TopKPerKey); oracle = the row_number
    // window idiom it replaces.
    Probe.df("q_topk_perkey",
      """SELECT o_custkey, o_orderkey, rank FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
        |  FROM orders) t
        |WHERE rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin) { (s, dir) =>
      graft.plans.TopK.perKey(Tables.load(s, dir, "orders"),
          Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)),
          k = 3)
        .select("o_custkey", "o_orderkey", "rank")
        .orderBy("o_custkey", "rank")
    },

    Probe.sql2("q_agg_minby",
      """SELECT l_returnflag,
        |  min_by(l_orderkey, l_extendedprice) AS cheapest_order,
        |  max_by(l_orderkey, l_extendedprice) AS priciest_order,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |  arg_min(l_orderkey, l_extendedprice) AS cheapest_order,
        |  arg_max(l_orderkey, l_extendedprice) AS priciest_order,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Probe.sql("q_having_subquery",
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) > (SELECT avg(o_totalprice) / 30000 FROM orders)
        |ORDER BY o_custkey""".stripMargin),

    Probe.sql2("q_fn_math3",
      """SELECT p_partkey,
        |  asin(p_size / 100.0) AS v_asin,
        |  acos(p_size / 100.0) AS v_acos,
        |  atan2(p_size, 7) AS v_atan2,
        |  sinh(p_size / 25.0) AS v_sinh,
        |  cosh(p_size / 25.0) AS v_cosh,
        |  tanh(p_size / 25.0) AS v_tanh,
        |  asinh(p_size / 10.0) AS v_asinh,
        |  acosh(1 + p_size / 10.0) AS v_acosh,
        |  atanh(p_size / 100.0) AS v_atanh,
        |  cot(1 + p_size / 10.0) AS v_cot,
        |  bit_count(p_size) AS v_bits
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |  asin(p_size / 100.0) AS v_asin,
        |  acos(p_size / 100.0) AS v_acos,
        |  atan2(p_size, 7) AS v_atan2,
        |  (exp(p_size / 25.0) - exp(-(p_size / 25.0))) / 2 AS v_sinh,
        |  (exp(p_size / 25.0) + exp(-(p_size / 25.0))) / 2 AS v_cosh,
        |  (exp(2 * p_size / 25.0) - 1) / (exp(2 * p_size / 25.0) + 1) AS v_tanh,
        |  ln(p_size / 10.0 + sqrt(p_size * p_size / 100.0 + 1)) AS v_asinh,
        |  ln(1 + p_size / 10.0 + sqrt((1 + p_size / 10.0) * (1 + p_size / 10.0) - 1)) AS v_acosh,
        |  0.5 * ln((1 + p_size / 100.0) / (1 - p_size / 100.0)) AS v_atanh,
        |  cot(1 + p_size / 10.0) AS v_cot,
        |  CAST(bit_count(p_size) AS INT) AS v_bits
        |FROM part
        |ORDER BY p_partkey""".stripMargin),

    // Z-order (Morton) key: range-quantize two measures to 8 bits each
    // against data-derived min/max (exact cross-engine — min/max are
    // order-insensitive), then bit-interleave. The layout key behind
    // Maintenance.compactZOrder's multi-dimensional file clustering;
    // CatalogV2Spec proves the pruning, this probe proves the key math.
    Probe.df("q_zorder_key", {
      import graft.operators.ZOrder
      s"""WITH mm AS (SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo1,
         |              max(CAST(l_extendedprice AS DOUBLE)) AS hi1,
         |              min(CAST(l_quantity AS DOUBLE)) AS lo2,
         |              max(CAST(l_quantity AS DOUBLE)) AS hi2
         |            FROM lineitem),
         |q AS (SELECT l_orderkey, l_linenumber,
         |  ${ZOrder.quantizeOracleExpr("l_extendedprice", "lo1", "hi1", 8)} AS q1,
         |  ${ZOrder.quantizeOracleExpr("l_quantity", "lo2", "hi2", 8)} AS q2
         |  FROM lineitem, mm)
         |SELECT l_orderkey, l_linenumber,
         |  ${ZOrder.interleaveOracleExpr(Seq("q1", "q2"), 8)} AS zkey
         |FROM q
         |ORDER BY l_orderkey, l_linenumber, zkey""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val li = Tables.load(s, dir, "lineitem")
      val mm = li.agg(
        min(col("l_extendedprice").cast("double")),
        max(col("l_extendedprice").cast("double")),
        min(col("l_quantity").cast("double")),
        max(col("l_quantity").cast("double"))).head()
      val zk = graft.operators.ZOrder.zkeyFor(
        Seq(col("l_extendedprice"), col("l_quantity")),
        Seq((mm.getDouble(0), mm.getDouble(1)),
          (mm.getDouble(2), mm.getDouble(3))), 8)
      li.select(col("l_orderkey"), col("l_linenumber"), zk.as("zkey"))
        .orderBy("l_orderkey", "l_linenumber", "zkey")
    },

    // Stored-procedure maintenance surface (`CALL cat.system.compact`)
    // — rows-only (file counts are commit-layout-dependent); the exact
    // semantics are pinned in CatalogV2Spec "CALL g2.system.*".
    Probe.noOracle("q_call_compact") { (s, dir) =>
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.pcompact")
      s.sql("CREATE TABLE gprobe.db.pcompact (k INT, name STRING)")
      s.sql("INSERT INTO gprobe.db.pcompact " +
        "SELECT CAST(r_regionkey AS INT), r_name FROM region")
      s.sql("INSERT INTO gprobe.db.pcompact " +
        "SELECT CAST(n_nationkey AS INT) + 100, n_name FROM nation")
      s.sql("CALL gprobe.system.compact(table => 'db.pcompact', " +
        "sort_cols => 'k', target_files => 1)")
    },

    // Write-audit-publish over catalog branches (Iceberg WAP): fork an
    // audit branch, stage an INSERT + a row-level DELETE on it, read all
    // three phases (main-during-staging proves ISOLATION, the branch
    // read is the AUDIT, main-after-fast-forward is the PUBLISH), and
    // hash-check the lot against DuckDB replaying the same relational
    // content. Each phase is COLLECTED eagerly — visible files resolve
    // at scan planning, so a lazy union would read every phase at its
    // execution-time state, not its staging-time state.
    Probe.df("q_wap_branch",
      """WITH mainv AS (SELECT CAST(r_regionkey AS BIGINT) AS k FROM region),
        |stage AS (SELECT CAST(n_nationkey AS BIGINT) + 100 AS k FROM nation
        |          WHERE CAST(n_nationkey AS BIGINT) % 2 = 0),
        |phases AS (
        |  SELECT 'main_before' AS phase, k FROM mainv
        |  UNION ALL SELECT 'branch_audit', k FROM mainv
        |  UNION ALL SELECT 'branch_audit', k FROM stage
        |  UNION ALL SELECT 'main_after', k FROM mainv
        |  UNION ALL SELECT 'main_after', k FROM stage)
        |SELECT phase, k FROM phases ORDER BY phase, k""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.wapt")
      s.sql("CREATE TABLE gprobe.db.wapt (k BIGINT)")                 // v1
      s.sql("INSERT INTO gprobe.db.wapt " +
        "SELECT CAST(r_regionkey AS BIGINT) FROM region")             // v2
      s.sql("CALL gprobe.system.create_branch('db.wapt', 'audit', 2)")
        .collect()
      s.sql("INSERT INTO gprobe.db.wapt.branch_audit " +
        "SELECT CAST(n_nationkey AS BIGINT) + 100 FROM nation")
      s.sql("DELETE FROM gprobe.db.wapt.branch_audit " +
        "WHERE k >= 100 AND k % 2 = 1")
      def phase(name: String, sql: String): Seq[(String, Long)] =
        s.sql(sql).collect().map(r => (name, r.getLong(0))).toSeq
      val before = phase("main_before", "SELECT k FROM gprobe.db.wapt")
      val audit = phase("branch_audit",
        "SELECT k FROM gprobe.db.wapt.branch_audit")
      s.sql("CALL gprobe.system.fast_forward('db.wapt', 'audit')").collect()
      val after = phase("main_after", "SELECT k FROM gprobe.db.wapt")
      (before ++ audit ++ after).toDF("phase", "k").orderBy("phase", "k")
    },

    // NET row-level changelog (Iceberg create_changelog_view with
    // carry-over removal): a COW DELETE's rewrite emits whole-file
    // delete+insert pairs; per (row, version) the untouched rows cancel,
    // leaving exactly the logical changes. Hash-checked against DuckDB
    // replaying the planted operation sequence — insert region keys
    // (v2), COW-delete the even ones (v3: carried-over odd rows MUST
    // cancel), insert shifted nation keys (v4).
    Probe.df("q_changelog_net",
      """WITH r AS (SELECT CAST(r_regionkey AS BIGINT) AS k FROM region),
        |n AS (SELECT CAST(n_nationkey AS BIGINT) + 100 AS k FROM nation),
        |ch AS (
        |  SELECT k, CAST(2 AS BIGINT) AS _commit_version,
        |         'insert' AS _change_type, CAST(1 AS BIGINT) AS n_copies
        |  FROM r
        |  UNION ALL
        |  SELECT k, CAST(3 AS BIGINT), 'delete', CAST(1 AS BIGINT)
        |  FROM r WHERE k % 2 = 0
        |  UNION ALL
        |  SELECT k, CAST(4 AS BIGINT), 'insert', CAST(1 AS BIGINT) FROM n)
        |SELECT k, _commit_version, _change_type, n_copies FROM ch
        |ORDER BY _commit_version, _change_type, k""".stripMargin) {
      (s, dir) =>
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.cdcnet")
      s.sql("CREATE TABLE gprobe.db.cdcnet (k BIGINT)")               // v1
      s.sql("INSERT INTO gprobe.db.cdcnet " +
        "SELECT CAST(r_regionkey AS BIGINT) FROM region")             // v2
      s.sql("DELETE FROM gprobe.db.cdcnet WHERE k % 2 = 0")           // v3
      s.sql("INSERT INTO gprobe.db.cdcnet " +
        "SELECT CAST(n_nationkey AS BIGINT) + 100 FROM nation")       // v4
      graft.catalog.Changelog.netChanges(s, "gprobe.db.cdcnet", 1L, 4L)
        .select(col("k"), col("_commit_version"), col("_change_type"),
          col("n_copies"))
        .orderBy("_commit_version", "_change_type", "k")
    },

    // MERGE-ON-READ DELETE (Iceberg v2 `write.delete.mode`): positions,
    // not rewrites — the commit records (file, pos) sidecars and scans
    // anti-apply them below the plan. Four hash-checked phases: 'after'
    // (masked rows excluded from plain reads), 'cdc' (the row-level
    // changelog emits exactly the masked rows as deletes — semantics
    // copy-on-write file diffs cannot express), 'travel' (the
    // pre-delete snapshot still serves every row), and 'sidecar' (a
    // 0/1 pin that sidecars exist and the data files were untouched —
    // i.e. this really took the MOR path, not a silent COW fallback).
    Probe.df("q_delete_mor",
      """WITH base AS (
        |  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS k,
        |         CAST(l_quantity AS DOUBLE) AS qty
        |  FROM lineitem WHERE l_orderkey % 7 = 0),
        |phases AS (
        |  SELECT 'after' AS phase, k, qty FROM base WHERE qty >= 10
        |  UNION ALL SELECT 'cdc', k, qty FROM base WHERE qty < 10
        |  UNION ALL SELECT 'travel', k, qty FROM base
        |  UNION ALL SELECT 'sidecar', CAST(1 AS BIGINT), CAST(0 AS DOUBLE))
        |SELECT phase, k, qty FROM phases ORDER BY phase, k, qty""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.mordel")
      s.sql("""CREATE TABLE gprobe.db.mordel (k BIGINT, qty DOUBLE)
        TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")       // v1
      s.sql("INSERT INTO gprobe.db.mordel " +
        "SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT), " +
        "CAST(l_quantity AS DOUBLE) FROM lineitem " +
        "WHERE l_orderkey % 7 = 0")                                   // v2
      val dataBefore = graft.catalog.Snapshots
        .latest(java.nio.file.Paths.get(wh, "db", "mordel")).get.dataFiles.toSet
      s.sql("DELETE FROM gprobe.db.mordel WHERE qty < 10")            // v3: MOR
      val snap = graft.catalog.Snapshots
        .latest(java.nio.file.Paths.get(wh, "db", "mordel")).get
      val morPinned = // sidecars written AND no data file rewritten
        snap.deleteFiles.nonEmpty && snap.dataFiles.toSet == dataBefore
      val after = s.sql(
        "SELECT 'after' AS phase, k, qty FROM gprobe.db.mordel")
      val cdc = graft.catalog.Changelog.read(s, "gprobe.db.mordel", 2L, 3L)
        .where(col("_change_type") === "delete")
        .select(org.apache.spark.sql.functions.lit("cdc").as("phase"),
          col("k"), col("qty"))
      val travel = s.sql(
        "SELECT 'travel' AS phase, k, qty FROM gprobe.db.mordel VERSION AS OF 2")
      val sidecar = Seq(("sidecar", if (morPinned) 1L else 0L, 0.0d))
        .toDF("phase", "k", "qty")
      after.unionAll(cdc).unionAll(travel).unionAll(sidecar)
        .orderBy("phase", "k", "qty")
    },

    // TYPE PROMOTION (Iceberg spec §4 legal widenings): ALTER COLUMN
    // int→bigint seals a schema generation; files written before the
    // promotion keep the NARROW physical type and serve correct wide
    // values natively (Spark's parquet reader widens narrow columns
    // under the declared schema — no data rewrite, no compact
    // required). Phases: 'rows' (narrow-era and wide-era rows under the
    // wide schema, incl. a value beyond int range), 'agg' (a sum that
    // only works if both eras read exactly), 'mutated' (r17 — UPSERT
    // and a deleteByKey KEYED ON THE PROMOTED COLUMN, both WITHOUT an
    // intervening compact: row-level writes are first-class on promoted
    // tables), and 'compacted' (the same rows after compact migrates
    // every file to the wide type).
    Probe.df("q_promote_type",
      """WITH nat AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k,
        |         CAST(n_nationkey * 3 AS BIGINT) AS q FROM nation),
        |wide AS (
        |  SELECT CAST(100 + r_regionkey AS BIGINT) AS k,
        |         CAST(3000000000 + r_regionkey AS BIGINT) AS q FROM region),
        |allr AS (SELECT k, q FROM nat UNION ALL SELECT k, q FROM wide),
        |mut AS (
        |  SELECT k, CASE WHEN k = 1 THEN CAST(777 AS BIGINT) ELSE q END AS q
        |  FROM allr WHERE NOT (k = 3 AND q = 9)
        |  UNION ALL SELECT CAST(555 AS BIGINT), CAST(888 AS BIGINT)),
        |phases AS (
        |  SELECT 'rows' AS phase, k, q FROM allr
        |  UNION ALL SELECT 'mutated', k, q FROM mut
        |  UNION ALL SELECT 'compacted', k, q FROM mut
        |  UNION ALL SELECT 'agg', CAST(count(*) AS BIGINT),
        |    CAST(sum(q) AS BIGINT) FROM allr)
        |SELECT phase, k, q FROM phases ORDER BY phase, k, q""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.promo")
      s.sql("CREATE TABLE gprobe.db.promo (k BIGINT, q INT)")         // v1
      s.sql("INSERT INTO gprobe.db.promo " +
        "SELECT CAST(n_nationkey AS BIGINT), " +
        "CAST(n_nationkey * 3 AS INT) FROM nation")                   // v2: narrow
      s.sql("ALTER TABLE gprobe.db.promo ALTER COLUMN q TYPE BIGINT")
      s.sql("INSERT INTO gprobe.db.promo " +
        "SELECT CAST(100 + r_regionkey AS BIGINT), " +
        "CAST(3000000000 + r_regionkey AS BIGINT) FROM region")       // v3: wide
      val rows = s.sql(
        "SELECT 'rows' AS phase, k, q FROM gprobe.db.promo")
      val agg = s.sql("""SELECT 'agg' AS phase,
        CAST(count(*) AS BIGINT) AS k, sum(q) AS q FROM gprobe.db.promo""")
      // collected before the row-level mutations below
      val preMutation = rows.unionAll(agg).collect()
      // r17: row-level writes WITHOUT compacting first — the upsert
      // reads narrow-era files natively widened, and the equality
      // delete keys on the PROMOTED column (narrow files scratch-read
      // q widened, so the wide key masks the int-era row)
      graft.catalog.Maintenance.upsert(s, "gprobe.db.promo",
        Seq((1L, 777L), (555L, 888L)).toDF("k", "q"), Seq("k"))       // v4
      graft.catalog.Maintenance.deleteByKey(s, "gprobe.db.promo",
        Seq(9L).toDF("q"))                                            // v5
      val mutated = s.sql(
        "SELECT 'mutated' AS phase, k, q FROM gprobe.db.promo")
      val preCompact = preMutation ++ mutated.collect()
      graft.catalog.Maintenance.compact(s, "gprobe.db.promo", Seq("k"), 1)
      val compacted = s.sql(
        "SELECT 'compacted' AS phase, k, q FROM gprobe.db.promo")
      import org.apache.spark.sql.types._
      val outSchema = StructType(Seq(StructField("phase", StringType, false),
        StructField("k", LongType, true), StructField("q", LongType, true)))
      s.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(preCompact.toSeq).asJava,
        outSchema)
        .unionAll(compacted)
        .orderBy("phase", "k", "q")
    },

    // MERGE / UPDATE ON HIDDEN-PARTITIONED TABLES (r17, VERDICT r16
    // #1): row-level commands over days()- and bucket()-partitioned
    // tables — the V2 writer recomputes each row's derived dir value
    // through the same catalyst expressions the prune path evaluates
    // (BatchWrites.deriveExpr), and runtime group filtering dir-prunes
    // the rewrite. Phases over a days(ts) events table: 'merged'
    // (matched UPDATE + unmatched INSERT into a brand-new day),
    // 'updated' (a day-range UPDATE that dir-prunes), 'compacted' (the
    // same rows after compact); plus a bucket(8, c_custkey) customer
    // table: 'bucket' (MERGE matched + unmatched) and
    // 'bucket_compacted'.
    Probe.df("q_merge_partitioned",
      """WITH ev AS (SELECT event_id, ts, value FROM events),
        |merged AS (
        |  SELECT event_id, ts,
        |    CASE WHEN event_id % 97 = 0 THEN value + 1000 ELSE value END AS value
        |  FROM ev
        |  UNION ALL
        |  SELECT event_id + 1000000, TIMESTAMP '2024-02-05 12:00:00',
        |    CAST(event_id AS DOUBLE)
        |  FROM ev WHERE event_id % 203 = 0),
        |updated AS (
        |  SELECT event_id, ts,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
        |          AND ts <  TIMESTAMP '2024-01-15 00:00:00'
        |         THEN value * 2 ELSE value END AS value
        |  FROM merged),
        |cust AS (SELECT c_custkey, c_acctbal FROM customer),
        |bkt AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 500
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM cust
        |  UNION ALL
        |  SELECT c_custkey + 500000, CAST(c_custkey AS DOUBLE)
        |  FROM cust WHERE c_custkey % 13 = 0),
        |dayagg AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(value) AS DOUBLE) AS sv
        |  FROM updated GROUP BY 1),
        |phases AS (
        |  SELECT 'merged' AS phase, CAST(ts AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(value) AS DOUBLE) AS sv
        |  FROM merged GROUP BY 2
        |  UNION ALL SELECT 'updated', d, n, sv FROM dayagg
        |  UNION ALL SELECT 'compacted', d, n, sv FROM dayagg
        |  UNION ALL SELECT ph, DATE '2024-01-01',
        |    CAST(count(*) AS BIGINT), CAST(sum(c_acctbal) AS DOUBLE)
        |  FROM bkt CROSS JOIN (SELECT 'bucket' AS ph UNION ALL
        |    SELECT 'bucket_compacted') GROUP BY ph)
        |SELECT phase, d, n, sv FROM phases ORDER BY phase, d""".stripMargin) {
      (s, dir) =>
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.evmrgp")
      s.sql("""CREATE TABLE gprobe.db.evmrgp
        (event_id BIGINT, ts TIMESTAMP, value DOUBLE)
        PARTITIONED BY (days(ts))""")
      s.sql("INSERT INTO gprobe.db.evmrgp " +
        "SELECT event_id, ts, value FROM events")
      // matched UPDATE (+1000) and unmatched INSERT into a NEW day dir
      s.sql("""MERGE INTO gprobe.db.evmrgp t
        USING (
          SELECT event_id, ts, value FROM events WHERE event_id % 97 = 0
          UNION ALL
          SELECT event_id + 1000000, TIMESTAMP '2024-02-05 12:00:00',
                 CAST(event_id AS DOUBLE)
          FROM events WHERE event_id % 203 = 0) s
        ON t.event_id = s.event_id
        WHEN MATCHED THEN UPDATE SET t.value = t.value + 1000
        WHEN NOT MATCHED THEN INSERT *""")
      def dayAgg(phase: String) = s.sql(s"""SELECT '$phase' AS phase,
          CAST(ts AS DATE) AS d, count(*) AS n,
          CAST(sum(value) AS DOUBLE) AS sv
        FROM gprobe.db.evmrgp GROUP BY 1, 2""")
      val merged = dayAgg("merged").collect()
      // day-range UPDATE: runtime group filtering + dir pruning
      s.sql("""UPDATE gprobe.db.evmrgp SET value = value * 2
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts <  TIMESTAMP '2024-01-15 00:00:00'""")
      val updated = dayAgg("updated").collect()
      graft.catalog.Maintenance.compact(s, "gprobe.db.evmrgp",
        Seq("event_id"), 2)
      val compacted = dayAgg("compacted").collect()
      // bucket(8, k): MERGE matched + unmatched, then compact
      s.sql("DROP TABLE IF EXISTS gprobe.db.custb")
      s.sql("""CREATE TABLE gprobe.db.custb
        (c_custkey BIGINT, c_acctbal DOUBLE)
        PARTITIONED BY (bucket(8, c_custkey))""")
      s.sql("INSERT INTO gprobe.db.custb " +
        "SELECT c_custkey, c_acctbal FROM customer")
      s.sql("""MERGE INTO gprobe.db.custb t
        USING (
          SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 11 = 0
          UNION ALL
          SELECT c_custkey + 500000, CAST(c_custkey AS DOUBLE)
          FROM customer WHERE c_custkey % 13 = 0) s
        ON t.c_custkey = s.c_custkey
        WHEN MATCHED THEN UPDATE SET t.c_acctbal = t.c_acctbal + 500
        WHEN NOT MATCHED THEN INSERT *""")
      def bAgg(phase: String) = s.sql(s"""SELECT '$phase' AS phase,
          DATE '2024-01-01' AS d, count(*) AS n,
          CAST(sum(c_acctbal) AS DOUBLE) AS sv FROM gprobe.db.custb""")
      val bucket = bAgg("bucket").collect()
      graft.catalog.Maintenance.compact(s, "gprobe.db.custb",
        Seq("c_custkey"), 2)
      val bucketC = bAgg("bucket_compacted").collect()
      import org.apache.spark.sql.types._
      val outSchema = StructType(Seq(StructField("phase", StringType, false),
        StructField("d", DateType, true), StructField("n", LongType, false),
        StructField("sv", DoubleType, true)))
      s.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(
          (merged ++ updated ++ compacted ++ bucket ++ bucketC).toSeq).asJava,
        outSchema)
        .orderBy("phase", "d")
    },

    // HIDDEN PARTITIONING (Iceberg spec §4 partition transforms): a
    // days(ts)-partitioned events table lays out derived `ts_day=...`
    // dirs the user never writes or queries; a RAW ts-range predicate
    // prunes them driver-side (PartitionTransforms — the plan reads
    // only the overlapping day dirs, pinned in CatalogV2Spec). Phases:
    // 'week' (a 7-day range aggregation over the partitioned table) and
    // 'layout' (a 0/1 pin that the day-dir count matches the distinct
    // days, i.e. the hidden layout really landed).
    Probe.df("q_part_days",
      """WITH agg AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(value) AS DOUBLE) AS sv
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |    AND ts <  TIMESTAMP '2024-01-15 00:00:00'
        |  GROUP BY 1),
        |phases AS (
        |  SELECT 'week' AS phase, d, n, sv FROM agg
        |  UNION ALL SELECT 'layout', DATE '2024-01-01', CAST(1 AS BIGINT),
        |    CAST(0 AS DOUBLE))
        |SELECT phase, d, n, sv FROM phases ORDER BY phase, d""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.evdays")
      s.sql("""CREATE TABLE gprobe.db.evdays
        (event_id BIGINT, ts TIMESTAMP, value DOUBLE)
        PARTITIONED BY (days(ts))""")
      s.sql("INSERT INTO gprobe.db.evdays " +
        "SELECT event_id, ts, value FROM events")
      val week = s.sql("""SELECT 'week' AS phase, CAST(ts AS DATE) AS d,
          count(*) AS n, CAST(sum(value) AS DOUBLE) AS sv
        FROM gprobe.db.evdays
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts <  TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1, 2""")
      val dataDir = java.nio.file.Paths.get(wh, "db", "evdays", "data")
      val dayDirs = scala.util.Using.resource(
        java.nio.file.Files.list(dataDir)) { st =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator())
          .asScala.count(_.getFileName.toString.startsWith("ts_day="))
      }
      val distinctDays = s.sql(
        "SELECT count(DISTINCT CAST(ts AS DATE)) FROM events")
        .collect().head.getLong(0)
      val layout = Seq(("layout", java.sql.Date.valueOf("2024-01-01"),
        if (dayDirs.toLong == distinctDays) 1L else 0L, 0.0d))
        .toDF("phase", "d", "n", "sv")
      week.unionAll(layout).orderBy("phase", "d")
    },

    // PARTITION-SPEC EVOLUTION (Iceberg spec §4 versioned partition
    // specs, r18): ADD PARTITION FIELD hours(ts) on a days(ts) table —
    // old files keep pruning and reading under the days-only era, new
    // files lay out day+hour dirs; a MERGE spans both eras; DROP
    // PARTITION FIELD days(ts) opens a third era; compact migrates
    // everything to the latest spec; repartition_table then REPLACES
    // the spec with an IDENTITY field (the data-rewrite evolution path
    // — hours dirs dissolve, shard= dirs appear). Phases: 'mixed'
    // (week range agg over two live eras), 'merged' (post-MERGE full
    // agg), 'evolved' (three live eras + third insert), 'compacted'
    // (same content after the era migration), 'repart' (same content
    // again on the identity layout), 'layout' (a 0/1 pin that era-2
    // files really carried ts_day/ts_hour nested dirs, post-compact
    // live files hour dirs only, and post-repartition live files
    // shard= dirs only).
    Probe.df("q_part_evolve",
      """WITH ev AS (SELECT event_id, ts, value FROM events),
        |merged AS (
        |  SELECT event_id, ts,
        |    CASE WHEN event_id % 131 = 0 THEN value + 1000
        |         ELSE value END AS value
        |  FROM ev
        |  UNION ALL
        |  SELECT event_id + 2000000, TIMESTAMP '2024-02-07 06:30:00',
        |    CAST(event_id AS DOUBLE)
        |  FROM ev WHERE event_id % 407 = 0),
        |evolved AS (
        |  SELECT * FROM merged
        |  UNION ALL
        |  SELECT event_id + 3000000, ts + INTERVAL 35 DAY, value * 3
        |  FROM ev WHERE event_id % 203 = 0),
        |wk AS (
        |  SELECT 'mixed' AS phase, CAST(ts AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(value) AS DOUBLE) AS sv
        |  FROM ev
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |    AND ts <  TIMESTAMP '2024-01-15 00:00:00'
        |  GROUP BY 2),
        |mg AS (
        |  SELECT 'merged' AS phase, CAST(ts AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(value) AS DOUBLE) AS sv
        |  FROM merged GROUP BY 2),
        |evp AS (
        |  SELECT ph AS phase, d, n, sv FROM (
        |    SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n,
        |           CAST(sum(value) AS DOUBLE) AS sv
        |    FROM evolved GROUP BY 1)
        |  CROSS JOIN (SELECT 'evolved' AS ph UNION ALL SELECT 'compacted'
        |              UNION ALL SELECT 'repart')),
        |phases AS (
        |  SELECT * FROM wk UNION ALL SELECT * FROM mg
        |  UNION ALL SELECT * FROM evp
        |  UNION ALL SELECT 'layout', DATE '2024-01-01',
        |    CAST(1 AS BIGINT), CAST(0 AS DOUBLE))
        |SELECT phase, d, n, sv FROM phases
        |ORDER BY phase, d""".stripMargin) { (s, dir) =>
      import s.implicits._
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.evevol")
      s.sql("""CREATE TABLE gprobe.db.evevol
        (event_id BIGINT, ts TIMESTAMP, value DOUBLE, shard STRING)
        PARTITIONED BY (days(ts))""")
      s.sql("INSERT INTO gprobe.db.evevol " +
        "SELECT event_id, ts, value, CAST(event_id % 4 AS STRING) " +
        "FROM events WHERE event_id % 2 = 0")
      s.sql("CALL gprobe.system.add_partition_field('db.evevol', 'hours(ts)')")
      s.sql("INSERT INTO gprobe.db.evevol " +
        "SELECT event_id, ts, value, CAST(event_id % 4 AS STRING) " +
        "FROM events WHERE event_id % 2 = 1")
      def agg(phase: String, where: String = "true") = s.sql(
        s"""SELECT '$phase' AS phase, CAST(ts AS DATE) AS d,
            count(*) AS n, CAST(sum(value) AS DOUBLE) AS sv
          FROM gprobe.db.evevol WHERE $where GROUP BY 1, 2""").collect()
      // two live eras: a raw ts-range predicate prunes era-1 by day
      // dirs, era-2 by day AND hour dirs
      val mixed = agg("mixed",
        """ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts < TIMESTAMP '2024-01-15 00:00:00'""")
      // MERGE spans eras: matched rows live in both layouts
      s.sql("""MERGE INTO gprobe.db.evevol t
        USING (
          SELECT event_id, ts, value, CAST(event_id % 4 AS STRING) AS shard
          FROM events WHERE event_id % 131 = 0
          UNION ALL
          SELECT event_id + 2000000, TIMESTAMP '2024-02-07 06:30:00',
                 CAST(event_id AS DOUBLE),
                 CAST((event_id + 2000000) % 4 AS STRING)
          FROM events WHERE event_id % 407 = 0) s
        ON t.event_id = s.event_id
        WHEN MATCHED THEN UPDATE SET t.value = t.value + 1000
        WHEN NOT MATCHED THEN INSERT *""")
      val merged = agg("merged")
      // era-2 layout pin: nested ts_day=/ts_hour= dirs really landed
      val tdir = java.nio.file.Paths.get(wh, "db", "evevol")
      val liveMid = graft.catalog.Snapshots.latest(tdir).get.dataFiles
      val sawNested = liveMid.exists(f =>
        f.contains("ts_day=") && f.contains("ts_hour="))
      s.sql("CALL gprobe.system.drop_partition_field('db.evevol', 'days(ts)')")
      s.sql("""INSERT INTO gprobe.db.evevol
        SELECT event_id + 3000000, ts + INTERVAL 35 DAYS, value * 3,
               CAST((event_id + 3000000) % 4 AS STRING)
        FROM events WHERE event_id % 203 = 0""")
      val evolved = agg("evolved")
      graft.catalog.Maintenance.compact(s, "gprobe.db.evevol",
        Seq("event_id"), 2)
      val compacted = agg("compacted")
      val liveEnd = graft.catalog.Snapshots.latest(tdir).get.dataFiles
      val migrated = liveEnd.forall(f =>
        f.contains("ts_hour=") && !f.contains("ts_day="))
      // REPLACE the spec with an IDENTITY field (data-rewrite path):
      // hour dirs dissolve into file bytes, shard= identity dirs appear
      s.sql("CALL gprobe.system.repartition_table(" +
        "'db.evevol', 'shard', 'event_id', 2)")
      val repart = agg("repart")
      val liveRp = graft.catalog.Snapshots.latest(tdir).get.dataFiles
      val identityLanded = liveRp.nonEmpty && liveRp.forall(f =>
        f.contains("shard=") && !f.contains("ts_hour="))
      val layout = Seq(("layout", java.sql.Date.valueOf("2024-01-01"),
        if (sawNested && migrated && identityLanded) 1L else 0L, 0.0d))
        .toDF("phase", "d", "n", "sv")
      import org.apache.spark.sql.types._
      val outSchema = StructType(Seq(StructField("phase", StringType, false),
        StructField("d", DateType, true), StructField("n", LongType, false),
        StructField("sv", DoubleType, true)))
      s.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(
          (mixed ++ merged ++ evolved ++ compacted ++ repart).toSeq).asJava,
        outSchema)
        .unionAll(layout.select(col("phase"), col("d"),
          col("n"), col("sv")))
        .orderBy("phase", "d")
    },

    // EQUALITY DELETES (Iceberg v2's second delete-file type): a
    // DELETE-BY-KEY commits the key tuples as a `deletes/eq_*` sidecar —
    // O(keys) metadata, no data read or rewrite — and scans mask rows of
    // files first-seen STRICTLY BEFORE the sidecar's commit version.
    // Four hash-checked phases: 'after' (keyed rows gone from reads),
    // 'cdc' (the changelog emits exactly the newly-masked rows),
    // 'reinsert' (a later insert of a deleted key is SERVED — the strict
    // version rule, the property streaming CDC upserts rely on), and
    // 'sidecar' (a 0/1 pin that an eq sidecar exists and no data file
    // was rewritten — this really took the equality path).
    Probe.df("q_delete_eq",
      """WITH base AS (
        |  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS k,
        |         CAST(l_quantity AS DOUBLE) AS qty
        |  FROM lineitem WHERE l_orderkey % 5 = 0),
        |delkeys AS (SELECT DISTINCT k FROM base WHERE qty < 15),
        |phases AS (
        |  SELECT 'after' AS phase, k, qty FROM base
        |  WHERE k NOT IN (SELECT k FROM delkeys)
        |  UNION ALL SELECT 'cdc', k, qty FROM base
        |  WHERE k IN (SELECT k FROM delkeys)
        |  UNION ALL SELECT 'reinsert', (SELECT min(k) FROM delkeys),
        |         CAST(99 AS DOUBLE)
        |  UNION ALL SELECT 'sidecar', CAST(1 AS BIGINT), CAST(0 AS DOUBLE)
        |  UNION ALL
        |  SELECT 'tspart', event_id, CAST(epoch_us(ts) AS DOUBLE)
        |  FROM events WHERE event_id % 101 = 0
        |    AND ts NOT IN (SELECT ts FROM events
        |                   WHERE event_id % 101 = 0 AND event_id % 3 = 0))
        |SELECT phase, k, qty FROM phases ORDER BY phase, k, qty""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.eqdel")
      s.sql("CREATE TABLE gprobe.db.eqdel (k BIGINT, qty DOUBLE)")    // v1
      s.sql("INSERT INTO gprobe.db.eqdel " +
        "SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT), " +
        "CAST(l_quantity AS DOUBLE) FROM lineitem " +
        "WHERE l_orderkey % 5 = 0")                                   // v2
      val tdir = java.nio.file.Paths.get(wh, "db", "eqdel")
      val dataBefore = graft.catalog.Snapshots
        .latest(tdir).get.dataFiles.toSet
      // COLLECTED eagerly: once the eq sidecar commits, re-evaluating
      // this frame would see the keys already masked (empty result)
      val delKeys: Array[Long] = s.sql(
        "SELECT DISTINCT k FROM gprobe.db.eqdel WHERE qty < 15")
        .collect().map(_.getLong(0))
      graft.catalog.Maintenance.deleteByKey(s, "gprobe.db.eqdel",
        delKeys.toSeq.toDF("k"))                                      // v3: eq
      val snap = graft.catalog.Snapshots.latest(tdir).get
      val eqPinned = // an eq sidecar exists AND no data file rewritten
        snap.eqDeleteFiles.nonEmpty && snap.posDeleteFiles.isEmpty &&
          snap.dataFiles.toSet == dataBefore
      val minDel = delKeys.min
      s.sql(s"INSERT INTO gprobe.db.eqdel VALUES ($minDel, 99.0)")    // v4
      val after = s.sql(
        "SELECT 'after' AS phase, k, qty FROM gprobe.db.eqdel " +
          s"WHERE NOT (k = $minDel AND qty = 99.0)")
      val cdc = graft.catalog.Changelog.read(s, "gprobe.db.eqdel", 2L, 3L)
        .where(col("_change_type") === "delete")
        .select(org.apache.spark.sql.functions.lit("cdc").as("phase"),
          col("k"), col("qty"))
      val reinsert = s.sql(
        "SELECT 'reinsert' AS phase, k, qty FROM gprobe.db.eqdel " +
          s"WHERE k = $minDel AND qty = 99.0")
      val sidecar = Seq(("sidecar", if (eqPinned) 1L else 0L, 0.0d))
        .toDF("phase", "k", "qty")
      // TIMESTAMP identity-partition keys (r18): dir values render and
      // parse under the zone pinned at CREATE, so an equality mask
      // keyed on the partition column is exact at MICROSECOND grain
      s.sql("DROP TABLE IF EXISTS gprobe.db.eqdts")
      s.sql("""CREATE TABLE gprobe.db.eqdts (k BIGINT, ts TIMESTAMP)
        PARTITIONED BY (ts)""")
      s.sql("INSERT INTO gprobe.db.eqdts " +
        "SELECT event_id, ts FROM events WHERE event_id % 101 = 0")
      val delTs = s.sql(
        "SELECT DISTINCT ts FROM gprobe.db.eqdts WHERE k % 3 = 0")
        .collect().map(_.getTimestamp(0))
      if (delTs.nonEmpty)
        graft.catalog.Maintenance.deleteByKey(s, "gprobe.db.eqdts",
          delTs.toSeq.toDF("ts"))
      val tspart = s.sql("""SELECT 'tspart' AS phase, k,
          CAST(unix_micros(ts) AS DOUBLE) AS qty FROM gprobe.db.eqdts""")
      after.unionAll(cdc).unionAll(reinsert).unionAll(sidecar)
        .unionAll(tspart)
        .orderBy("phase", "k", "qty")
    },

    // FIELD-ID schema evolution (Iceberg spec §4): RENAME COLUMN serves
    // pre-rename files' bytes under the new name (phase 'renamed'), and
    // DROP + re-ADD of the same name does NOT resurrect the dropped
    // column's data — the re-added field has a fresh id, absent from
    // every older generation, so old files read NULL (phase 'dra', the
    // classic field-id test). Both phases hash-checked against a DuckDB
    // replay of the logical content.
    Probe.df("q_rename_fieldids",
      """WITH nat AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        |reg AS (SELECT CAST(r_regionkey AS BIGINT) AS k FROM region),
        |ren AS (
        |  SELECT 'renamed' AS phase, k,
        |         CAST(k AS DOUBLE) * CAST(1.5 AS DOUBLE) AS b FROM nat
        |  UNION ALL SELECT 'renamed', k + 100,
        |         CAST(k + 100 AS DOUBLE) * CAST(2.0 AS DOUBLE) FROM reg),
        |dra AS (
        |  SELECT 'dra' AS phase, k, CAST(NULL AS DOUBLE) AS b FROM nat
        |  UNION ALL SELECT 'dra', k + 100, CAST(NULL AS DOUBLE) FROM reg
        |  UNION ALL SELECT 'dra', k + 200,
        |         CAST(k + 200 AS DOUBLE) * CAST(3.0 AS DOUBLE) FROM reg)
        |SELECT phase, k, b FROM (SELECT * FROM ren UNION ALL SELECT * FROM dra)
        |ORDER BY phase, k, b NULLS FIRST""".stripMargin) { (s, dir) =>
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.renev")
      s.sql("CREATE TABLE gprobe.db.renev (k BIGINT, a DOUBLE)")      // v1
      s.sql("INSERT INTO gprobe.db.renev " +
        "SELECT CAST(n_nationkey AS BIGINT), " +
        "CAST(n_nationkey AS DOUBLE) * CAST(1.5 AS DOUBLE) FROM nation") // v2
      s.sql("ALTER TABLE gprobe.db.renev RENAME COLUMN a TO b")
      s.sql("INSERT INTO gprobe.db.renev " +
        "SELECT CAST(r_regionkey AS BIGINT) + 100, " +
        "CAST(r_regionkey + 100 AS DOUBLE) * CAST(2.0 AS DOUBLE) FROM region") // v3
      // COLLECTED eagerly: the later DROP changes what `b` resolves to
      val renamed = s.sql(
        "SELECT 'renamed' AS phase, k, b FROM gprobe.db.renev").collect()
      s.sql("ALTER TABLE gprobe.db.renev DROP COLUMN b")
      s.sql("ALTER TABLE gprobe.db.renev ADD COLUMN b DOUBLE")
      s.sql("INSERT INTO gprobe.db.renev " +
        "SELECT CAST(r_regionkey AS BIGINT) + 200, " +
        "CAST(r_regionkey + 200 AS DOUBLE) * CAST(3.0 AS DOUBLE) FROM region") // v4
      val dra = s.sql(
        "SELECT 'dra' AS phase, k, b FROM gprobe.db.renev").collect()
      import org.apache.spark.sql.types._
      val outSchema = StructType(Seq(StructField("phase", StringType, false),
        StructField("k", LongType, true), StructField("b", DoubleType, true)))
      s.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava((renamed ++ dra).toSeq).asJava,
        outSchema)
        .orderBy(col("phase"), col("k"), col("b").asc_nulls_first)
    },

    // Iceberg-parity `_file` metadata column through the graft catalog
    // (GraftTable + FileTaggedScans): rows tagged with their source data
    // file inside ONE delegate scan — rows-only (paths are
    // run-dependent); CatalogV2Spec pins the exact semantics.
    Probe.noOracle("q_file_metadata") { (s, dir) =>
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_probe_wh").getAbsolutePath
      s.conf.set("spark.sql.catalog.gprobe", "graft.catalog.MetaCatalog")
      s.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      s.sql("DROP TABLE IF EXISTS gprobe.db.fmeta")
      s.sql("CREATE TABLE gprobe.db.fmeta (k INT, name STRING)")
      s.sql("INSERT INTO gprobe.db.fmeta " +
        "SELECT CAST(r_regionkey AS INT), r_name FROM region")
      s.sql("INSERT INTO gprobe.db.fmeta VALUES (99, 'extra')")
      s.sql("""SELECT count(DISTINCT _file) AS n_files,
               count(*) AS n_rows FROM gprobe.db.fmeta""")
    }
  )
}
