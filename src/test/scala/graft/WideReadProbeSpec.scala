package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SPARK INVARIANT the r17 promotion design rests on:
  * `FieldIds.identityTranslated` treats promotion-only generations as
  * identity because Spark 4's parquet reader natively serves every
  * catalog-legal widening (int32→bigint, float→double, decimal
  * precision growth) under the declared wide read schema — BOTH reader
  * paths, with filter pushdown intact, including values only
  * representable in the wide type. If a Spark upgrade ever regressed
  * this, these pins fail before any catalog test silently mis-reads. */
class WideReadProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def roundTrip(vectorized: Boolean): Unit = {
    val iso = spark.newSession()
    iso.conf.set("spark.sql.parquet.enableVectorizedReader",
      vectorized.toString)
    import iso.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_wide").toString
    Seq(1, 2, 2147000000).toDF("k").write.mode("overwrite")
      .parquet(s"$d/i")
    assert(iso.read.schema("k BIGINT").parquet(s"$d/i")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 2147000000L))
    // pushed filter on the widened column, incl. beyond-int32 bounds
    assert(iso.read.schema("k BIGINT").parquet(s"$d/i")
      .where("k > 1 AND k < 6000000000")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 2147000000L))
    Seq(1.5f, 2.5f).toDF("f").write.mode("overwrite").parquet(s"$d/f")
    assert(iso.read.schema("f DOUBLE").parquet(s"$d/f")
      .where("f > 2.0").collect().map(_.getDouble(0)).toSeq == Seq(2.5))
    Seq(BigDecimal("12.34"), BigDecimal("56.78")).toDF("q")
      .select($"q".cast("decimal(8,2)").as("q"))
      .write.mode("overwrite").parquet(s"$d/q")
    assert(iso.read.schema("q DECIMAL(20,2)").parquet(s"$d/q")
      .where("q > 20").collect().map(_.getDecimal(0)).toSeq ==
      Seq(new java.math.BigDecimal("56.78")))
    // MIXED narrow+wide files in one read under the wide schema
    Seq(7L).toDF("k").write.mode("append").parquet(s"$d/i")
    assert(iso.read.schema("k BIGINT").parquet(s"$d/i")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 7L, 2147000000L))
  }

  test("parquet reader serves catalog-legal widenings natively " +
      "(vectorized path, pushdown on)") { roundTrip(vectorized = true) }

  test("parquet reader serves catalog-legal widenings natively " +
      "(row-based parquet-mr path)") { roundTrip(vectorized = false) }

  test("aggregate pushdown REFUSES a widened schema (falls back to a " +
      "correct scan, never serves narrow footer stats as wide)") {
    val iso = spark.newSession()
    iso.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    import iso.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_wagg").toString
    Seq(1, 9, 3).toDF("k").write.parquet(s"$d/i")
    val df = iso.read.schema("k BIGINT").parquet(s"$d/i").agg(
      org.apache.spark.sql.functions.max("k").as("mx"),
      org.apache.spark.sql.functions.min("k").as("mn"))
    assert(!df.queryExecution.executedPlan.toString
      .contains("PushedAggregation: [MAX"))
    assert(df.collect().head.toSeq == Seq(9L, 1L))
  }
}
