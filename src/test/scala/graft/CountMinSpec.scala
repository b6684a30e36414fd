package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, HeavyHitters}

/** Count-Min sketch: counters equal the naive bucket counts, estimates
  * never undercount, the matrix is partitioning-invariant (associative
  * merge), and the heavy-hitter composition has exact recall. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Depth = 3
  private val Width = 16

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana apple date elderberry fig"),
    (3L, "apple apple apple grape banana"),
    (4L, "cherry date cherry")).toDF("doc_id", "text")

  private def terms(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(explode(Dedup.words(col("text"))).as("t"))
      .collect().map(_.getString(0)).toSeq

  /** Naive reference: the same md5-slice bucket counters in plain Scala. */
  private def naiveCounters(ts: Seq[String]): Array[Long] = {
    val m = new Array[Long](Depth * Width)
    for (t <- ts) {
      val d = graft.functions.CountMinSketch.md5(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      for (i <- 0 until Depth)
        m(i * Width + graft.functions.CountMinSketch.bucket(d, i, Width)) += 1L
    }
    m
  }

  test("sketch counters equal the naive per-bucket counts") {
    val cms = HeavyHitters.sketch(docs, "text", Depth, Width)
      .collect().head.getSeq[Long](0).toArray
    assert(cms.toSeq == naiveCounters(terms(docs)).toSeq)
    assert(cms.sum == terms(docs).size.toLong * Depth)
  }

  test("sketch is invariant under repartitioning (associative merge)") {
    val one = HeavyHitters.sketch(docs.coalesce(1), "text", Depth, Width)
      .collect().head.getSeq[Long](0)
    val many = HeavyHitters.sketch(docs.repartition(7), "text", Depth, Width)
      .collect().head.getSeq[Long](0)
    assert(one == many)
  }

  test("estimates never undercount and are exact without collisions") {
    val sk = HeavyHitters.sketch(docs, "text", Depth, Width)
    val ts = terms(docs)
    val exact = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val est = HeavyHitters.estimates(
        ts.distinct.toDF("term"), "term", sk, Depth, Width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, c) <- exact) assert(est(t) >= c, s"undercount for $t")
    // depth-3 min over a 16-wide table with 7 distinct terms: apple (the
    // true heavy hitter) must estimate close; undercount is impossible,
    // so est == exact whenever no bucket collides in some row.
    assert(est("apple") >= 5L)
  }

  test("heavyHitters recall is exact: every term with cnt >= minCount kept") {
    val hh = HeavyHitters.heavyHitters(docs, "text", minCount = 2L,
        depth = Depth, width = Width)
      .collect().map(_.getString(0)).toSet
    val exact = terms(docs).groupBy(identity).collect {
      case (t, xs) if xs.size >= 2 => t
    }.toSet
    assert(exact.subsetOf(hh)) // CMS never undercounts => no false negatives
  }

  test("null terms are skipped, empty input yields a zero matrix") {
    val withNull = Seq((1L, Option("apple apple")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val cms = HeavyHitters.sketch(withNull, "text", Depth, Width)
      .collect().head.getSeq[Long](0)
    assert(cms.sum == 2L * Depth)
    val empty = HeavyHitters.sketch(
        docs.filter(lit(false)), "text", Depth, Width)
      .collect().head.getSeq[Long](0)
    assert(empty.forall(_ == 0L) && empty.size == Depth * Width)
  }
}
