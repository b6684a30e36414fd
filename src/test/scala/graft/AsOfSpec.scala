package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** AsOf.asofJoin semantics: directions, join types, strictness, tolerance,
  * NULL-time rows, and the one-shuffle plan shape. The DuckDB-checked
  * probes (q_join_asof*) pin the cross-engine answers; these tests pin the
  * variants DuckDB SQL can't express (tolerance) and the edge cases. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // quotes (right) and trades (left), the canonical as-of pairing
  private lazy val trades = Seq(
    (1L, "A", 10L, 100.0),
    (2L, "A", 20L, 101.0),
    (3L, "B", 15L, 55.0),
    (4L, "C", 5L, 7.0)          // key with no quotes at all
  ).toDF("trade_id", "sym", "t", "px")

  private lazy val quotes = Seq(
    ("A", 10L, 99.5),
    ("A", 15L, 100.5),
    ("B", 20L, 54.5)
  ).toDF("sym", "t", "bid")

  private def run(direction: String = "backward", joinType: String = "inner",
      strict: Boolean = false,
      tolerance: Option[org.apache.spark.sql.Column] = None) =
    AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "t",
        direction = direction, joinType = joinType, strict = strict,
        tolerance = tolerance)
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getAs[Long]("trade_id"),
        Option(r.getAs[java.lang.Long]("r_t")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("r_bid")).map(_.toDouble)))
      .toSeq

  test("backward inner: latest quote at-or-before each trade") {
    assert(run() == Seq(
      (1L, Some(10L), Some(99.5)),     // equal instant matches
      (2L, Some(15L), Some(100.5))))   // trade B@15 has no quote <= 15
  }

  test("backward left keeps unmatched trades with NULL quote columns") {
    assert(run(joinType = "left") == Seq(
      (1L, Some(10L), Some(99.5)),
      (2L, Some(15L), Some(100.5)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("strict backward excludes the equal instant") {
    assert(run(strict = true, joinType = "left") == Seq(
      (1L, None, None),                // only quote A@10 == trade time
      (2L, Some(15L), Some(100.5)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("forward inner: earliest quote at-or-after each trade") {
    assert(run(direction = "forward") == Seq(
      (1L, Some(10L), Some(99.5)),
      (3L, Some(20L), Some(54.5))))    // trade A@20 has no quote >= 20
  }

  test("strict forward excludes the equal instant") {
    assert(run(direction = "forward", strict = true, joinType = "left") == Seq(
      (1L, Some(15L), Some(100.5)),
      (2L, None, None),
      (3L, Some(20L), Some(54.5)),
      (4L, None, None)))
  }

  test("tolerance gates far-away matches to NULL / drops them on inner") {
    // trade A@20 matches quote A@15 (gap 5); tolerance 4 voids it
    assert(run(tolerance = Some(lit(4L))) == Seq((1L, Some(10L), Some(99.5))))
    assert(run(tolerance = Some(lit(5L))) == Seq(
      (1L, Some(10L), Some(99.5)), (2L, Some(15L), Some(100.5))))
  }

  test("NULL-time rows never match on either side") {
    val l = Seq((1L, "A", Some(10L)), (2L, "A", None))
      .toDF("id", "k", "t")
    val r = Seq(("A", Some(5L), 1.0), ("A", None, 2.0))
      .toDF("k", "t", "v")
    val out = AsOf.asofJoin(l, r, Seq("k"), "t", "t", joinType = "left")
      .orderBy("id").collect()
      .map(x => (x.getAs[Long]("id"),
        Option(x.getAs[java.lang.Double]("r_v")).map(_.toDouble)))
      .toSeq
    assert(out == Seq((1L, Some(1.0)), (2L, None)))
  }

  test("timestamp tolerance works with interval columns") {
    val l = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "ts")
    val r = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 9.0))
      .toDF("k", "ts", "v")
    def go(tol: String) =
      AsOf.asofJoin(l, r, Seq("k"), "ts", "ts",
        tolerance = Some(expr(s"INTERVAL $tol"))).count()
    assert(go("3 HOUR") == 1L)
    assert(go("1 HOUR") == 0L)
  }

  test("plan has exactly one shuffle (hash by key), no join operator") {
    val out = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "t")
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
