package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** PageRank: the distributed integer chain equals a naive single-threaded
  * reference, is partitioning-invariant, and ranks what it should rank
  * (a node every other node points at beats a leaf). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // star + chain: everyone links to 0; 0 links to 1; 3 dangles off 2.
  private val edges = Seq(
    (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
    (0L, 1L), (2L, 3L)).toDF("src", "dst")

  private val Unit0 = 1000000000000L

  /** Naive reference with the same integer semantics. */
  private def naive(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = es.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> Unit0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v =>
        v -> (((Unit0 / n) * 15L) / 100L + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("matches the naive integer reference on a known graph") {
    val got = PageRank.ranks(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive(Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (0L, 1L), (2L, 3L)), 3))
  }

  test("partitioning-invariant (integer sums are order-independent)") {
    val a = PageRank.ranks(edges.coalesce(1), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.ranks(edges.repartition(5), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("the hub outranks leaves; dangling leaf keeps only base + inflow") {
    val r = PageRank.ranks(edges, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(0L) > r(3L) && r(0L) > r(4L))
    // node 4 has no in-edges: pure base mass, the minimum possible
    assert(r.values.min == r(4L))
  }
}
