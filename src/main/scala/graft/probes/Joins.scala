package graft.probes

import graft.{Probe, Tables}

/** SURVEY §2.4 — all DataFusion 40 join types (HashJoin/SortMergeJoin/
  * NestedLoopJoin/CrossJoin, Cargo.lock:1290), declared declaratively so
  * Catalyst+AQE pick the physical strategy. At scale: dimension tables
  * (region/nation/supplier/part/customer) sit under
  * `spark.sql.autoBroadcastJoinThreshold`, so every dim join planned here
  * becomes a BroadcastHashJoin with zero shuffle of the fact table; only
  * fact-fact joins (lineitem⋈orders) shuffle, on their join key.
  */
object Joins {
  val probes: Seq[Probe] = Seq(

    Probe.sql("q_join_inner",
      """SELECT n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_name""".stripMargin),

    // 4-way star join — TPC-H Q5 shape (fact shuffles once; dims broadcast)
    Probe.sql("q_join_star",
      """SELECT n_name, r_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  count(*) AS cnt
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name
        |ORDER BY n_name, r_name""".stripMargin),

    Probe.sql("q_join_left",
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin),

    Probe.sql("q_join_right",
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin),

    Probe.sql("q_join_full",
      """WITH s AS (SELECT s_nationkey AS k, count(*) AS n_supp
        |           FROM supplier GROUP BY s_nationkey),
        |     c AS (SELECT c_nationkey AS k, count(*) AS n_cust
        |           FROM customer GROUP BY c_nationkey)
        |SELECT coalesce(s.k, c.k) AS k, n_supp, n_cust
        |FROM s FULL JOIN c ON s.k = c.k
        |ORDER BY k""".stripMargin),

    // semi join via EXISTS (Catalyst RewritePredicateSubquery → LeftSemi)
    Probe.sql("q_join_semi",
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin),

    // anti join via NOT EXISTS (→ LeftAnti)
    Probe.sql("q_join_anti",
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // mixed equi + range condition (equi part drives the hash join;
    // range is a post-join filter)
    Probe.sql("q_join_nonequi",
      """SELECT p1.p_brand AS brand, count(*) AS pairs
        |FROM part p1 JOIN part p2
        |  ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        |GROUP BY p1.p_brand
        |ORDER BY brand""".stripMargin),

    Probe.sql("q_join_cross",
      """SELECT r1.r_name AS a, r2.r_name AS b
        |FROM region r1 CROSS JOIN region r2
        |ORDER BY a, b""".stripMargin),

    // pure theta join (no equi key → BroadcastNestedLoopJoin; kept tiny
    // on purpose — NLJ cardinality is the user's responsibility)
    Probe.sql("q_join_theta",
      """SELECT n_name, count(*) AS bigger_regions
        |FROM nation JOIN region ON n_regionkey < r_regionkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin),

    Probe.sql("q_join_self",
      """SELECT a.n_name AS n1, b.n_name AS n2
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |ORDER BY n1, n2""".stripMargin),

    // as-of join (operators/AsOf): per purchase, the latest prior view of
    // the same user. Oracle = DuckDB's native ASOF JOIN; the right side is
    // pre-aggregated per (user_id, ts) so the nearest match is unique in
    // both engines (AsOf's documented contract).
    Probe.df("q_join_asof",
      """WITH v AS (SELECT user_id, ts, max(value) AS value FROM events
        |           WHERE event_type = 'view' GROUP BY user_id, ts),
        |     p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |       v.ts AS view_ts, v.value AS view_value
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      val ev = s.table("events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("value").as("value"))
      graft.operators.AsOf.asofJoin(p, v, Seq("user_id"), "ts", "ts",
          rightPrefix = "view_")
        .orderBy("event_id")
    },

    // as-of LEFT: purchases with no prior view keep NULL view columns
    Probe.df("q_join_asof_left",
      """WITH v AS (SELECT user_id, ts, max(value) AS value FROM events
        |           WHERE event_type = 'view' GROUP BY user_id, ts),
        |     p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |       v.ts AS view_ts, v.value AS view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      val ev = s.table("events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("value").as("value"))
      graft.operators.AsOf.asofJoin(p, v, Seq("user_id"), "ts", "ts",
          joinType = "left", rightPrefix = "view_")
        .orderBy("event_id")
    },

    // forward as-of: the EARLIEST view at-or-after each purchase
    Probe.df("q_join_asof_fwd",
      """WITH v AS (SELECT user_id, ts, max(value) AS value FROM events
        |           WHERE event_type = 'view' GROUP BY user_id, ts),
        |     p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |       v.ts AS view_ts, v.value AS view_value
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      val ev = s.table("events")
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("value").as("value"))
      graft.operators.AsOf.asofJoin(p, v, Seq("user_id"), "ts", "ts",
          direction = "forward", rightPrefix = "view_")
        .orderBy("event_id")
    },

    // salted skew join (operators/SkewJoin): same result as the plain
    // equi-join — the salt only respreads whale keys across reducers
    Probe.df("q_join_salted",
      """SELECT s_nationkey, count(*) AS items, sum(l_quantity) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      graft.operators.SkewJoin.saltedJoin(
          s.table("lineitem"), s.table("supplier"),
          Seq("l_suppkey" -> "s_suppkey"), salts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("items"), sum("l_quantity").as("qty"))
        .orderBy("s_nationkey")
    },

    // AUTO-salted skew join (VERDICT r12 #5): per-key salt factors come
    // from the skewProfile broadcast — whales spread by their measured
    // share, uniform keys unsalted. Result identical to the plain join.
    Probe.df("q_join_salted_auto",
      """SELECT s_nationkey, count(*) AS items, sum(l_quantity) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      graft.operators.SkewJoin.saltedJoinAuto(
          s.table("lineitem"), s.table("supplier"),
          Seq("l_suppkey" -> "s_suppkey"), topK = 64)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("items"), sum("l_quantity").as("qty"))
        .orderBy("s_nationkey")
    },

    // bloom-pruned join (operators/BloomJoin): fact rows are pre-filtered
    // by a bloom filter of the post-predicate dim keys before the join
    // exchange; the exact join makes the result identical to a plain join
    Probe.df("q_join_bloom",
      """SELECT s_nationkey, count(*) AS items, sum(l_quantity) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_acctbal > 5000
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      val dim = s.table("supplier").filter(col("s_acctbal") > 5000)
      graft.operators.BloomJoin.bloomPrunedJoin(
          s.table("lineitem"), dim, "l_suppkey", "s_suppkey",
          expectedItems = 1L << 16)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("items"), sum("l_quantity").as("qty"))
        .orderBy("s_nationkey")
    },

    // bucketed co-located join: both sides written CLUSTERED BY the join
    // key into the same bucket count, so the join plans with ZERO
    // exchanges (BucketedJoinSpec pins that); this probe pins the
    // RESULT equal to the plain join. At 100 TB pre-bucketing the fact
    // tables is how repeated key-joins stop paying the shuffle.
    Probe.df("q_join_bucketed",
      """SELECT o_orderpriority, count(*) AS items, sum(l_quantity) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions._
      val (li, ord) = graft.operators.Bucketing.ensureBucketed(s,
        s.table("lineitem"), s.table("orders"),
        "l_orderkey", "o_orderkey", buckets = 8)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("items"), sum("l_quantity").as("qty"))
        .orderBy("o_orderpriority")
    },

    // USING-clause join
    Probe.sql2("q_join_using",
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin),

    // Interval-overlap join, binned: error-event intervals vs view-event
    // intervals ([ts, ts + min(floor(value),30) minutes], epoch-micros
    // integer math). Spark runs the bucket-exploded equi-join
    // (IntervalJoin.overlapPairs — the scale path); the oracle runs the
    // plain theta join. Identical pairs, integer-exact bounds.
    Probe.df("q_join_interval",
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(least(floor(value), 30) AS BIGINT) * 60000000 AS e
        |  FROM events)
        |SELECT a.event_id AS ida, b.event_id AS idb,
        |  a.s AS sa, a.e AS ea, b.s AS sb, b.e AS eb
        |FROM e a JOIN e b
        |  ON a.event_type = 'error' AND b.event_type = 'view'
        |  AND a.s <= b.e AND b.s <= a.e
        |ORDER BY ida, idb""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) +
            least(floor(col("value")), lit(30L)).cast("bigint")
              * lit(60000000L)).as("e"))
      graft.operators.IntervalJoin.overlapPairs(
          ev.where(col("event_type") === "error"), "event_id", "s", "e",
          ev.where(col("event_type") === "view"), "event_id", "s", "e",
          bin = 1800000000L) // 30-minute buckets ~ the max interval length
        .orderBy("ida", "idb")
    },

    // Edit-distance (fuzzy) join — FuzzyJoin.editDistanceJoin: q-gram
    // count-filter blocking (Gravano '01, recall-complete) + exact
    // levenshtein verify, so the blocked plan must equal the naive
    // cross join the oracle computes. Planted zero-padded entity names:
    // ids differing in ONE digit are genuine cross-id distance-1
    // matches, every third right row carries a one-char typo (still
    // matches), every 3k+1 row grows a 6-char suffix (must NOT match).
    Probe.df("q_join_fuzzy",
      """WITH l AS (SELECT doc_id AS id_l,
        |    'entity ' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
        |      || ' corporation' AS s
        |  FROM documents),
        |r AS (SELECT doc_id AS id_r,
        |    'entity ' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ||
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN ' corpXration'
        |      WHEN 1 THEN ' corporation extra'
        |      ELSE ' corporation' END AS s
        |  FROM documents)
        |SELECT l.id_l, r.id_r,
        |  CAST(levenshtein(l.s, r.s) AS BIGINT) AS dist
        |FROM l, r WHERE levenshtein(l.s, r.s) <= 1
        |ORDER BY id_l, id_r""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val d = Tables.load(s, dir, "documents")
      val l = d.select(col("doc_id").as("id_l"),
        concat(lit("entity "), lpad(col("doc_id").cast("string"), 4, "0"),
          lit(" corporation")).as("s"))
      val r = d.select(col("doc_id").as("id_r"),
        concat(lit("entity "), lpad(col("doc_id").cast("string"), 4, "0"),
          when(col("doc_id") % 3 === 0, lit(" corpXration"))
            .when(col("doc_id") % 3 === 1, lit(" corporation extra"))
            .otherwise(lit(" corporation"))).as("s"))
      graft.operators.FuzzyJoin.editDistanceJoin(
          l, r, "id_l", "s", "id_r", "s", maxDist = 1)
        .orderBy("id_l", "id_r")
    },

    // Exact Jaccard join, BENCH tier (SetJoin.jaccardJoin on a
    // sparse-similarity corpus): q_join_jaccard's natural-text corpus
    // is the CORRECTNESS tier but its output is inherently quadratic
    // (12.46M true pairs at sf0.1 — any exact join must emit them all,
    // so it measures output throughput, not plan; same reasoning that
    // keeps q_fingerprint_overlap out of the bench). This corpus is
    // the shape the operator exists for at scale: each doc's token set
    // shares 6 group tokens with its 5-doc group and carries 2 own
    // tokens → within-group Jaccard 0.6-0.78, cross-group < 0.1, so
    // true pairs are LINEAR (~6 per doc incl. self) and the benched
    // number tracks blocking selectivity + verify cost, not emit volume.
    // The 'x' token repeats corpus-wide (f ≈ n/7): the ppjoin prefix
    // must sort it out of every prefix or candidates go quadratic.
    Probe.df("q_join_jaccard_groups",
      """WITH d AS (SELECT doc_id,
        |    ['doc' || CAST(doc_id AS VARCHAR),
        |     'x' || CAST(doc_id % 7 AS VARCHAR),
        |     'g1-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g2-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g3-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g4-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g5-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g6-' || CAST(doc_id // 5 AS VARCHAR)] AS t
        |  FROM documents),
        |p AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r,
        |    CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS inter,
        |    CAST(len(a.t) AS BIGINT) AS sz_l,
        |    CAST(len(b.t) AS BIGINT) AS sz_r
        |  FROM d a, d b)
        |SELECT id_l, id_r, inter, sz_l, sz_r,
        |  inter::DOUBLE / (sz_l + sz_r - inter)::DOUBLE AS jaccard
        |FROM p
        |WHERE inter::DOUBLE / (sz_l + sz_r - inter)::DOUBLE
        |  >= CAST(0.5 AS DOUBLE)
        |ORDER BY id_l, id_r""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val g = expr("CAST(doc_id DIV 5 AS STRING)")
      val toks = Tables.load(s, dir, "documents").select(col("doc_id"),
        array(
          concat(lit("doc"), col("doc_id").cast("string")),
          concat(lit("x"), (col("doc_id") % 7).cast("string")),
          concat(lit("g1-"), g), concat(lit("g2-"), g),
          concat(lit("g3-"), g), concat(lit("g4-"), g),
          concat(lit("g5-"), g), concat(lit("g6-"), g)).as("toks"))
      graft.operators.SetJoin.jaccardJoin(
          toks, toks, "doc_id", "toks", "doc_id", "toks", tau = 0.5)
        .orderBy("id_l", "id_r")
    },

    // Exact set-CONTAINMENT join (SetJoin.containmentJoin): all pairs
    // with |A∩B|/|A| >= 0.75 — the asymmetric quote/provenance question
    // ("is this small doc mostly contained in that bigger one?").
    // Planted: left docs carry 4 tokens (3 group + own id), right docs
    // 8 (the same 3 group tokens + 3 more + own id + a corpus-wide x
    // token the left prefix must never fan out on); within-group
    // containment is exactly 3/4 = τ (a boundary-exact pair — one IEEE
    // division of exact integers on both engines), self pairs 4/4,
    // cross-group 0. Oracle = naive cross join.
    Probe.df("q_join_containment",
      """WITH ids AS (SELECT doc_id,
        |    CAST(doc_id // 5 AS VARCHAR) AS g FROM documents),
        |lt AS (SELECT doc_id, ['qa-' || g, 'qb-' || g, 'qc-' || g,
        |    'doc' || CAST(doc_id AS VARCHAR)] AS t FROM ids),
        |rt AS (SELECT doc_id, ['qa-' || g, 'qb-' || g, 'qc-' || g,
        |    'g4-' || g, 'g5-' || g, 'g6-' || g,
        |    'doc' || CAST(doc_id AS VARCHAR),
        |    'x' || CAST(doc_id % 7 AS VARCHAR)] AS t FROM ids),
        |p AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r,
        |    CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS inter,
        |    CAST(len(a.t) AS BIGINT) AS sz_l,
        |    CAST(len(b.t) AS BIGINT) AS sz_r
        |  FROM lt a, rt b)
        |SELECT id_l, id_r, inter, sz_l, sz_r,
        |  inter::DOUBLE / sz_l::DOUBLE AS containment
        |FROM p
        |WHERE inter::DOUBLE / sz_l::DOUBLE >= CAST(0.75 AS DOUBLE)
        |ORDER BY id_l, id_r""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val g = expr("CAST(doc_id DIV 5 AS STRING)")
      val d = Tables.load(s, dir, "documents")
      val lt = d.select(col("doc_id"), array(
        concat(lit("qa-"), g), concat(lit("qb-"), g),
        concat(lit("qc-"), g),
        concat(lit("doc"), col("doc_id").cast("string"))).as("toks"))
      val rt = d.select(col("doc_id"), array(
        concat(lit("qa-"), g), concat(lit("qb-"), g),
        concat(lit("qc-"), g), concat(lit("g4-"), g),
        concat(lit("g5-"), g), concat(lit("g6-"), g),
        concat(lit("doc"), col("doc_id").cast("string")),
        concat(lit("x"), (col("doc_id") % 7).cast("string"))).as("toks"))
      graft.operators.SetJoin.containmentJoin(
          lt, rt, "doc_id", "toks", "doc_id", "toks", tau = 0.75)
        .orderBy("id_l", "id_r")
    },

    // WEIGHTED Jaccard self-join (SetJoin.weightedJaccardJoin): integer
    // idf weights w = N div f over the union of both sides — rare
    // tokens dominate, the corpus-wide x token weighs ~7 units against
    // the unique doc token's ~N. On the grouped corpus the within-group
    // weighted similarity is ~0.37 (six group tokens at w=N/10 vs the
    // heavy unique token), self pairs 1.0, cross-group ~0 — τ=0.35
    // selects exactly group-mates. The oracle replays the WHOLE weight
    // derivation (union counts, integer division) plus the naive join.
    Probe.df("q_join_jaccard_weighted",
      """WITH d AS (SELECT doc_id,
        |    ['doc' || CAST(doc_id AS VARCHAR),
        |     'x' || CAST(doc_id % 7 AS VARCHAR),
        |     'g1-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g2-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g3-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g4-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g5-' || CAST(doc_id // 5 AS VARCHAR),
        |     'g6-' || CAST(doc_id // 5 AS VARCHAR)] AS t
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(t) AS tok FROM d),
        |u AS (SELECT * FROM e UNION ALL SELECT * FROM e),
        |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM u
        |  GROUP BY tok),
        |nn AS (SELECT 2 * count(*) AS n FROM d),
        |w AS (SELECT tok, CAST(nn.n // f.f AS BIGINT) AS w FROM f, nn),
        |ws AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS wsum
        |  FROM e JOIN w USING (tok) GROUP BY doc_id),
        |iw AS (SELECT a.doc_id AS id_l, b.doc_id AS id_r,
        |    CAST(sum(w.w) AS BIGINT) AS w_inter
        |  FROM e a JOIN e b ON a.tok = b.tok JOIN w ON w.tok = a.tok
        |  GROUP BY 1, 2),
        |p AS (SELECT id_l, id_r, w_inter, wa.wsum AS w_l, wb.wsum AS w_r
        |  FROM iw JOIN ws wa ON wa.doc_id = id_l
        |          JOIN ws wb ON wb.doc_id = id_r)
        |SELECT id_l, id_r, w_inter, w_l, w_r,
        |  w_inter::DOUBLE / (w_l + w_r - w_inter)::DOUBLE AS w_jaccard
        |FROM p
        |WHERE w_inter::DOUBLE / (w_l + w_r - w_inter)::DOUBLE
        |  >= CAST(0.35 AS DOUBLE)
        |ORDER BY id_l, id_r""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val g = expr("CAST(doc_id DIV 5 AS STRING)")
      val toks = Tables.load(s, dir, "documents").select(col("doc_id"),
        array(
          concat(lit("doc"), col("doc_id").cast("string")),
          concat(lit("x"), (col("doc_id") % 7).cast("string")),
          concat(lit("g1-"), g), concat(lit("g2-"), g),
          concat(lit("g3-"), g), concat(lit("g4-"), g),
          concat(lit("g5-"), g), concat(lit("g6-"), g)).as("toks"))
      graft.operators.SetJoin.weightedJaccardJoin(
          toks, toks, "doc_id", "toks", "doc_id", "toks", tau = 0.35)
        .orderBy("id_l", "id_r")
    }
  )
}
