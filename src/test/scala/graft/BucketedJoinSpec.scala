package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketing.ensureBucketed: a join between two same-count bucketed
  * tables plans with ZERO exchanges (the whole point), and the result
  * matches the plain join (q_join_bucketed pins that cross-engine). */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fact = (1 to 2000)
    .map(i => (i.toLong % 97, i.toDouble)).toDF("k", "v")
  private lazy val dim = (0 to 96)
    .map(i => (i.toLong, s"d$i")).toDF("dk", "name")

  test("bucketed-bucketed join plans with no exchange and matches plain") {
    val (f, d) = Bucketing.ensureBucketed(spark, fact, dim, "k", "dk",
      buckets = 4, namePrefix = "spec_buckets")
    // force a shuffle-based strategy so an elided exchange is meaningful
    val plain = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = f.join(d, col("k") === col("dk"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(k#"), plan)
      assert(!plan.contains("Exchange hashpartitioning(dk#"), plan)

      val expect = fact.join(dim, col("k") === col("dk"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .orderBy("k").collect().toSeq
      assert(joined.orderBy("k").collect().toSeq == expect)
    } finally plain match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("engine SQL surface accepts CLUSTERED BY ... INTO n BUCKETS") {
    val dir = java.nio.file.Files.createTempDirectory("spec_ddl_bucket")
    spark.sql("DROP TABLE IF EXISTS spec_ddl_bucketed")
    spark.sql(
      s"""CREATE TABLE spec_ddl_bucketed (id BIGINT, s STRING)
         |USING parquet CLUSTERED BY (id) INTO 4 BUCKETS
         |LOCATION '$dir'""".stripMargin)
    spark.sql("INSERT INTO spec_ddl_bucketed VALUES (1, 'a'), (2, 'b')")
    assert(spark.table("spec_ddl_bucketed").count() == 2)
    val desc = spark.sql("DESCRIBE EXTENDED spec_ddl_bucketed")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("4"), desc)
    spark.sql("DROP TABLE spec_ddl_bucketed")
  }
}
