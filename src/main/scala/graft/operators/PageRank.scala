package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the classic web-graph quality prior a
  * crawl-curation pipeline mixes into document scoring (the reference
  * has no graph surface, lib.rs:678; beyond-ref extension like the
  * dedup/ANN family).
  *
  * All-INTEGER arithmetic: ranks live in micro-units (`unit` total mass
  * at start, `unit / N` per node), per-edge contributions are integer
  * divisions `rank div outdeg`, damping is `(85 · x) div 100`. Integer
  * sums are order-independent, so the result is bit-exact under any
  * partitioning AND replayable in DuckDB with `//` — a floating
  * PageRank can never hash-match cross-engine (summation order).
  * Division remainders vanish (mass shrinks slightly per hop) and
  * dangling nodes leak their mass — both deterministic, both replayed
  * identically by the oracle; ranks are a RELATIVE signal.
  *
  * Scale shape: edges persist once partitioned by `src`, so every
  * iteration's rank⋈edge join reuses that layout; each iteration pays
  * one shuffle on `dst` for the contribution aggregate — the canonical
  * distributed-PageRank cost. N arrives via a broadcast 1-row count,
  * never a driver collect. Each iteration references the previous rank
  * table TWICE (contribution join + damping join), so an unrolled plan
  * doubles per iteration — [[Checkpoints.truncate]] cuts lineage every
  * `truncateEvery` rounds, bounding plan size at 2^truncateEvery leaf
  * references while materializing only the fixed-width (id, rank, n)
  * table (graft.checkpoint.dir makes those cuts executor-loss-durable).
  */
object PageRank {

  /** (id, rank) after `iters` damped iterations; rank in micro-units of
    * `unit` total initial mass. Edge DataFrame must have src/dst cols. */
  def ranks(edges: DataFrame, iters: Int, unit: Long = 1000000000000L,
      dampNum: Long = 85, dampDen: Long = 100,
      truncateEvery: Int = 4): DataFrame = {
    require(truncateEvery >= 1, "truncateEvery must be >= 1")
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .transform(OperatorCache.persist)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nRow = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("id"), expr(s"${unit}L div n").as("rank"), col("n"))
    var lastCut: Option[DataFrame] = None
    for (it <- 1 to iters) {
      val contrib = ranks.join(e, col("id") === col("src"))
        .join(deg, "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = ranks.join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (expr(s"((${unit}L div n) * ${dampDen - dampNum}L) div ${dampDen}L") +
            expr(s"(${dampNum}L * coalesce(s, 0L)) div ${dampDen}L"))
            .as("rank"),
          col("n"))
      // integer arithmetic: truncation never changes values, only bounds
      // the doubling-per-iteration plan (skip after the last round — the
      // caller gets a composable lazy frame). The PREVIOUS cut's
      // reliable files are reclaimed once the new cut materializes; the
      // last cut stays (the returned lazy plan reads it) — callers own
      // reclaiming it after materializing (see Checkpoints.discard's
      // final-cut-lifetime note).
      if (it % truncateEvery == 0 && it < iters) {
        val t = Checkpoints.truncate(ranks)
        lastCut.foreach(Checkpoints.discard)
        lastCut = Some(t)
        ranks = t
      }
    }
    ranks.select(col("id"), col("rank"))
  }

  /** DuckDB replay: the same fixed-point-free integer chain, iterations
    * unrolled as chained CTEs. `edgesCte` must define `e(src, dst)`. */
  def oracleSql(edgesCte: String, iters: Int, unit: Long = 1000000000000L,
      dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = s"(($unit // n) * ${dampDen - dampNum}) // $dampDen"
    val steps = (1 to iters).map { t =>
      s"""c$t AS (SELECT e.dst, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS s
         |  FROM r${t - 1} r JOIN e ON r.id = e.src
         |  JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |r$t AS (SELECT r.id, $base + ($dampNum * COALESCE(c$t.s, 0)) // $dampDen
         |    AS rank, r.n
         |  FROM r${t - 1} r LEFT JOIN c$t ON r.id = c$t.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |nd AS (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |  FROM e GROUP BY src),
       |r0 AS (SELECT id, $unit // n AS rank, n FROM nd, nn),
       |$steps
       |SELECT id, rank FROM r$iters ORDER BY id""".stripMargin
  }
}
