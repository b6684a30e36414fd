package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

/** The custom whole-operator extension (LogicalPlan + SparkStrategy +
  * SparkPlan): per-group top-k via bounded heaps must return EXACTLY the
  * window row_number() formulation's rows, with a plan that exchanges on
  * the group key but never sorts whole groups. */
class TopKPlanSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    Tables.register(s, "/root/testdata/sf0.001")
    s
  }

  test("TopK.perKey equals the row_number window idiom") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val custom = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
      .select("o_custkey", "o_orderkey", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "o_orderkey", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(custom == windowed)
    assert(custom.nonEmpty)
  }

  test("plan exchanges on the key but contains no Sort (heap, not sort)") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val df = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p.take(800))
    assert(p.contains("Exchange hashpartitioning(o_custkey"), p.take(800))
    assert(!p.contains("Sort ["), s"bounded heaps must replace the sort:\n${p.take(800)}")
  }

  test("global top-k (no keys) uses a single AllTuples partition") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val rows = TopK.perKey(orders, Seq.empty,
        Seq(("o_totalprice", false), ("o_orderkey", true)), k = 5)
      .select("o_orderkey", "rank").collect()
    assert(rows.length == 5)
    val expect = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5).select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(rows.sortBy(_.getInt(1)).map(_.getLong(0)).toSeq == expect)
  }

  test("column names resolve case-insensitively like the rest of Spark") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val upper = TopK.perKey(orders, Seq("O_CUSTKEY"),
      Seq(("O_TOTALPRICE", false), ("O_ORDERKEY", true)), k = 1)
    val lower = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k = 1)
    assert(upper.count() == lower.count())
  }

  test("ranks are deterministic under a total order (ties broken)") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 10.0, "a"), (1, 10.0, "b"), (1, 10.0, "c"), (2, 5.0, "z"))
      .toDF("k", "v", "t")
    val out = TopK.perKey(df, Seq("k"), Seq(("v", false), ("t", true)), k = 2)
      .select("k", "t", "rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set((1, "a", 1), (1, "b", 2), (2, "z", 1)))
  }
}
