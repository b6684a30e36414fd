package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomIntervals(seed: Int, n: Int, span: Long, maxLen: Long) = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map { i =>
      val s = (rnd.nextDouble() * span).toLong
      (i, s, s + (rnd.nextDouble() * maxLen).toLong)
    }.toDF("id", "s", "e")
  }

  test("binned overlap join equals the naive theta join at any bin width") {
    val a = randomIntervals(1, 80, 100000L, 700L)
    val b = randomIntervals(2, 90, 100000L, 1500L)
    val naive = a.as("a").join(b.as("b"),
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (bin <- Seq(100L, 1000L, 50000L)) {
      val got = IntervalJoin.overlapPairs(a, "id", "s", "e",
          b, "id", "s", "e", bin)
        .select("ida", "idb").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bin=$bin produced duplicate pairs")
      assert(got.toSet == naive, s"bin=$bin mismatch")
    }
  }

  test("negative coordinates bucket correctly (floor, not truncate)") {
    // intervals straddling and below zero: truncating division would put
    // [-150,-50] and [50,150] in the same bucket 0 and still work, but
    // [-450,-350] vs [-50,50] must NOT silently miss the [-450,-350] vs
    // [-400,-300] overlap (trunc maps -450 and -350 both to 0 bucket -1
    // edge cases). Verify against the naive join.
    val a = Seq((1L, -450L, -350L), (2L, -150L, 50L), (3L, 100L, 200L))
      .toDF("id", "s", "e")
    val b = Seq((10L, -400L, -300L), (11L, -50L, -10L), (12L, 190L, 210L))
      .toDF("id", "s", "e")
    val naive = a.as("a").join(b.as("b"),
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    for (bin <- Seq(64L, 100L, 1000L)) {
      val got = IntervalJoin.overlapPairs(a, "id", "s", "e",
          b, "id", "s", "e", bin)
        .select("ida", "idb").as[(Long, Long)].collect().toSet
      assert(got == naive, s"bin=$bin")
    }
  }

  test("closed endpoints touch-overlap; inverted intervals drop") {
    val a = Seq((1L, 100L, 200L), (2L, 500L, 400L)).toDF("id", "s", "e")
    val b = Seq((10L, 200L, 300L), (11L, 401L, 402L)).toDF("id", "s", "e")
    val got = IntervalJoin.overlapPairs(a, "id", "s", "e",
        b, "id", "s", "e", 128L)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    // a1 touches b10 at t=200 (closed ⇒ overlap); inverted a2 never joins
    assert(got == Set((1L, 10L)))
  }

  test("the plan is an equi-join on the bucket — no nested-loop, no cartesian") {
    val a = randomIntervals(3, 50, 10000L, 300L)
    val b = randomIntervals(4, 50, 10000L, 300L)
    val plan = IntervalJoin.overlapPairs(a, "id", "s", "e",
      b, "id", "s", "e", 256L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"expected a binned equi-join plan, got:\n$plan")
  }
}
