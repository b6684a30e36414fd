package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** The one-pass ProfileSketch kernel (approx tier of Stats.profile)
  * against the exact width-split tier: min/max/nulls/rows must agree
  * EXACTLY; HLL distinct within its design rsd. */
class ProfileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dir = "/root/testdata/sf0.001"

  test("kernel profile: min/max/nulls/rows exact, distinct within 5%") {
    val li = Tables.load(spark, dir, "lineitem")
    val approx = Stats.profile(li, exactDistinct = false)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Stats.profile(li, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    for ((name, e) <- exact) {
      val a = approx(name)
      assert(a.getLong(3) == e.getLong(3), s"$name null_count")
      assert(a.getLong(5) == e.getLong(5), s"$name n_rows")
      val (ad, ed) = (a.getLong(4), e.getLong(4))
      assert(math.abs(ad - ed) <= math.max(1L, (0.05 * ed).toLong),
        s"$name n_distinct: approx $ad vs exact $ed")
      // string/long/bool min-max render identically to cast-to-string;
      // doubles may differ in formatting only — compare numerically
      val numeric = li.schema(name).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
      if (numeric) {
        assert(a.getString(1).toDouble == e.getString(1).toDouble, s"$name min")
        assert(a.getString(2).toDouble == e.getString(2).toDouble, s"$name max")
      } else {
        assert(a.getString(1) == e.getString(1), s"$name min")
        assert(a.getString(2) == e.getString(2), s"$name max")
      }
    }
  }

  test("kernel profile survives shuffles (merge + serde) and nulls") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "apple", 1.5), (2L, null, 2.5), (3L, "pear", null),
      (4L, "apple", -0.5), (null, "zebra", 9.0))
      .toDF("k", "s", "v")
      .repartition(7) // force partial buffers + merge path
    val rows = Stats.profile(df, exactDistinct = false)
      .orderBy("column_name").collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    val k = byName("k")
    assert(k.getString(1) == "1" && k.getString(2) == "4")
    assert(k.getLong(3) == 1 && k.getLong(4) == 4 && k.getLong(5) == 5)
    val s = byName("s")
    assert(s.getString(1) == "apple" && s.getString(2) == "zebra")
    assert(s.getLong(3) == 1 && s.getLong(4) == 3)
    val v = byName("v")
    assert(v.getString(1).toDouble == -0.5 && v.getString(2).toDouble == 9.0)
    assert(v.getLong(3) == 1 && v.getLong(4) == 4)
  }

  test("double min/max are NaN-ordered like Spark (NaN greatest, order-independent)") {
    // NaN-first partitions would pin min/max to NaN under naive '<'/'>'
    // comparisons; Spark orders NaN as the greatest double
    val df = Seq(Double.NaN, 3.0, -2.0, Double.NaN, 7.5)
      .toDF("v").repartition(5) // some partitions see ONLY NaN
    val r = Stats.profile(df, exactDistinct = false)
      .collect().map(r => r.getString(0) -> r).toMap.apply("v")
    assert(r.getString(1).toDouble == -2.0, "min must not be poisoned by NaN")
    assert(r.getString(2) == "NaN", "max is NaN, like Spark's max()")
    // and it agrees with the exact tier (Spark's own min/max aggregates)
    val e = Stats.profile(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap.apply("v")
    assert(e.getString(1).toDouble == r.getString(1).toDouble)
    assert(e.getString(2) == r.getString(2))
  }

  test("all-null column yields (null, null, n, 0, n)") {
    val df = Seq((1, Option.empty[String]), (2, Option.empty[String]))
      .toDF("a", "b")
    val b = Stats.profile(df, exactDistinct = false)
      .collect().map(r => r.getString(0) -> r).toMap.apply("b")
    assert(b.isNullAt(1) && b.isNullAt(2))
    assert(b.getLong(3) == 2 && b.getLong(4) == 0 && b.getLong(5) == 2)
  }

  test("decimal columns profile through the kernel, both backing widths") {
    val df = spark.range(0, 100)
      .selectExpr("CAST(id AS DECIMAL(10,2)) AS d10",      // long-backed
        "CAST(id % 7 AS DECIMAL(38,10)) AS d38")           // BigDecimal
      .repartition(5) // force partial serde + merge
    val rows = Stats.profile(df, exactDistinct = false)
      .collect().map(r => r.getString(0) -> r).toMap
    val d10 = rows("d10")
    assert(d10.getString(1) == "0.00" && d10.getString(2) == "99.00")
    assert(d10.getLong(3) == 0 && d10.getLong(5) == 100)
    assert(math.abs(d10.getLong(4) - 100) <= 5, s"d10 distinct ${d10.getLong(4)}")
    val d38 = rows("d38")
    assert(d38.getString(1) == "0.0000000000" &&
      d38.getString(2) == "6.0000000000")
    assert(math.abs(d38.getLong(4) - 7) <= 1, s"d38 distinct ${d38.getLong(4)}")
    // decimals take the kernel, not the width-split fallback
    val plan = Stats.profile(df, exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("profile_sketch"), plan)
  }

  test("approx tier plans ONE scan + ObjectHashAggregate, no SortAggregate") {
    val li = Tables.load(spark, dir, "lineitem")
    val plan = Stats.profile(li, exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
