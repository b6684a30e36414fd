package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sessionize, Stats}

/** Sessionize + histogram operators: semantics the DuckDB probes can't
  * see (approx-depth tier, gap edge cases, plan shape). */
class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionize: gap splits, equal-gap does not, per-user isolation") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),   // 600s gap == limit → same
      (1L, ts("2024-01-01 10:20:01"), 3L),   // 601s gap → new session
      (2L, ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.sessions(ev, "user_id", "ts", 600, Seq("event_id"))
      .orderBy("user_id", "session_seq").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("n_events"))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
    assert(out(0).getAs[Long]("duration_us") == 600L * 1000000)
  }

  test("sessionize plans one exchange for assign + rollup") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val plan = Sessionize.sessions(ev, "user_id", "ts", 1800, Seq("event_id"))
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, plan)
  }

  test("histogramWidth covers all rows, bounds tile [min,max]") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val h = Stats.histogramWidth(df, "v", 10).orderBy("bin").collect()
    assert(h.length == 10)
    assert(h.map(_.getAs[Long]("n")).sum == 1000)
    assert(h.head.getAs[Double]("bin_lo") == 1.0)
    assert(h.last.getAs[Double]("bin_hi") == 1000.0)
    // adjacent bounds meet exactly (same-operand arithmetic)
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("bin_hi") == b.getAs[Double]("bin_lo")) }
  }

  test("histogramWidth degenerate single-value column → one bucket") {
    val df = Seq.fill(10)(7.0).toDF("v")
    val h = Stats.histogramWidth(df, "v", 5).collect()
    assert(h.length == 1 && h.head.getAs[Long]("n") == 10)
  }

  test("histogramDepth: near-equal populations, ordered bounds") {
    val df = (1 to 1003).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val h = Stats.histogramDepth(df, "v", 10, Seq("id")).orderBy("bin").collect()
    assert(h.length == 10)
    assert(h.map(_.getAs[Long]("n")).sum == 1003)
    assert(h.map(_.getAs[Long]("n")).max -
      h.map(_.getAs[Long]("n")).min <= 1)   // ntile balance
  }

  test("int8 quantize: codes bounded, dequant error within scale/2 per dim") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),        // zero vector
      (3L, Array(100.0f, -100.0f, 3.0f, -0.01f))
    ).toDF("vec_id", "embedding")
    val q = graft.operators.Quantize.int8(vecs, "vec_id", "embedding")
    val deq = graft.operators.Quantize.dequantize(q, "q", "scale", "vhat")
      .orderBy("vec_id").collect()
    val orig = vecs.orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding"))
    deq.zip(orig).foreach { case (row, ov) =>
      val scale = row.getAs[Double]("scale")
      val codes = row.getAs[scala.collection.Seq[Byte]]("q")
      assert(codes.forall(c => c >= -127 && c <= 127))
      val vhat = row.getAs[scala.collection.Seq[Double]]("vhat")
      ov.zip(vhat).foreach { case (o, h) =>
        assert(math.abs(o - h) <= scale / 2 + 1e-12,
          s"dim err ${math.abs(o - h)} vs scale $scale") }
    }
    // zero vector: scale 0, all-zero codes
    val z = deq(1)
    assert(z.getAs[Double]("scale") == 0.0 &&
      z.getAs[scala.collection.Seq[Byte]]("q").forall(_ == 0))
  }

  test("histogramDepthApprox: all rows binned, roughly equal depth, no sort") {
    val df = (1 to 10000).map(i => ((i % 997).toDouble + i / 1000.0))
      .toDF("v")
    val out = Stats.histogramDepthApprox(df, "v", 10)
    val h = out.orderBy("bin").collect()
    assert(h.map(_.getAs[Long]("n")).sum == 10000)
    assert(h.length >= 9)   // sketch may merge a boundary, never explode
    val ns = h.map(_.getAs[Long]("n"))
    assert(ns.max <= 3L * ns.min, ns.mkString(","))
    // scale shape: no global sort (exact ntile needs one; the only
    // SinglePartition exchange is the percentile sketch's final-agg,
    // which moves one buffer per partition, not data rows)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort [__v"), plan)
    assert(!plan.contains("ntile("), plan)
  }

  test("robustOutliers: MAD rule, zero-MAD groups, strict boundary") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      ("b", 0L), ("b", 0L), ("b", 0L), ("b", 4L), // mad = 0: any dev > 0
      ("c", 1L), ("c", 3L)                        // dev == c·mad at c=1
    ).toDF("g", "v")
    val out = Stats.robustOutliers(df, Seq("g"), "v", c = 3.0)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Boolean]("is_outlier"))).toMap
    assert(out(("a", 3L)) == ((3.0, 1.0, false)))
    assert(out(("a", 100L)) == ((3.0, 1.0, true)))
    assert(out(("a", 1L))._3 == false)           // dev 2 <= 3
    assert(out(("b", 4L)) == ((0.0, 0.0, true))) // dev 4 > 0
    assert(out(("b", 0L))._3 == false)
    // c = 1: both rows of group c sit EXACTLY at dev == c·mad (1.0);
    // the rule is strict >, so neither flags
    val tight = Stats.robustOutliers(df.filter($"g" === "c"), Seq("g"),
      "v", c = 1.0).collect()
    assert(tight.forall(!_.getAs[Boolean]("is_outlier")))
    assert(tight.forall(_.getAs[Double]("med") == 2.0))
  }
}
