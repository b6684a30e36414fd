package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroSource

/** Avro external-table source (SURVEY §2.2): container-format round-trip
  * on the shipped Avro core library (the spark-avro connector jar is not
  * in /opt/spark/jars — STATUS.md). */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("schema maps both ways, nullability preserved") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val back = AvroSource.structType(AvroSource.avroSchema(st))
    assert(back == st)
  }

  test("round-trip preserves values, nulls, bytes across partitions") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val rows = (1L to 100L).map { i =>
      Row(i,
        if (i % 7 == 0) null else s"name_$i",
        if (i % 5 == 0) null else i * 1.5,
        if (i % 3 == 0) null else Array.tabulate(4)(b => (i + b).toByte))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), st)
    val out = java.nio.file.Files.createTempDirectory("graft_avro_spec").toString
    AvroSource.write(df, out)
    // one container per input partition
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 4)
    val back = AvroSource.read(spark, out)
    assert(back.schema.fieldNames.toSeq == st.fieldNames.toSeq)
    assert(back.rdd.getNumPartitions == 4)
    val got = back.collect().map(r => (r.getLong(0),
      Option(r.getString(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      Option(r.getAs[Array[Byte]](3)).map(_.toSeq))).sortBy(_._1)
    val want = rows.map(r => (r.getLong(0),
      Option(r.getString(1)),
      Option(r.get(2)).map(_.asInstanceOf[Double]),
      Option(r.get(3)).map(_.asInstanceOf[Array[Byte]].toSeq)))
    assert(got.toSeq == want)
  }

  test("USING avro rejects in this environment (connector jar absent)") {
    val e = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW avro_missing " +
        "USING avro OPTIONS (path '/tmp/nonexistent.avro')")
    }
    assert(e.getMessage.contains("Failed to find data source"),
      s"unexpected: ${e.getMessage.take(200)}")
  }
}
