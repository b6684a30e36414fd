package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShardExport

class ShardExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (0L until 40L)
    .map(i => (i, s"doc body $i ${"x" * (i % 7).toInt}"))
    .toDF("doc_id", "text")

  test("plan deals every row exactly once with contiguous 1..n ranks") {
    val p = ShardExport.plan(docs, "doc_id", numShards = 4)
    assert(p.count() == 40)
    assert(p.select("doc_id").distinct().count() == 40)
    val ranks = p.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("shard_rank").as("lo"),
        max("shard_rank").as("hi"), countDistinct("shard_rank").as("d"))
      .collect()
    assert(ranks.nonEmpty)
    ranks.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
    }
  }

  test("plan is partition-invariant (same shard and rank on any layout)") {
    val a = ShardExport.plan(docs, "doc_id", 4)
      .select("doc_id", "shard", "shard_rank").collect().toSet
    val b = ShardExport.plan(docs.repartition(13), "doc_id", 4)
      .select("doc_id", "shard", "shard_rank").collect().toSet
    assert(a == b)
  }

  test("salt reorders within shards without moving membership") {
    val e0 = ShardExport.plan(docs, "doc_id", 4, salt = "epoch0")
    val e1 = ShardExport.plan(docs, "doc_id", 4, salt = "epoch1")
    val m0 = e0.select("doc_id", "shard").collect().toSet
    val m1 = e1.select("doc_id", "shard").collect().toSet
    assert(m0 == m1) // membership fixed by id alone
    val o0 = e0.select("doc_id", "shard_rank").collect().toSet
    val o1 = e1.select("doc_id", "shard_rank").collect().toSet
    assert(o0 != o1) // order is salt-dependent
    // and the manifest fingerprint sees the order change
    def fps(df: org.apache.spark.sql.DataFrame) =
      ShardExport.manifest(df, "text").collect()
        .map(r => r.getAs[Long]("shard") -> r.getAs[String]("content_md5"))
        .toMap
    assert(fps(e0) != fps(e1))
  }

  test("manifest counts and fingerprint match a sequential replay") {
    val p = ShardExport.plan(docs, "doc_id", 3)
    val m = ShardExport.manifest(p, "text").collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"),
          r.getAs[String]("content_md5"))).toMap
    val rows = p.select("shard", "shard_rank", "text").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("shard_rank"),
        r.getAs[String]("text")))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(_._2).map(_._3)
      val (n, chars, fp) = m(shard)
      assert(n == ordered.length)
      assert(chars == ordered.map(_.length.toLong).sum)
      assert(fp == md5hex(ordered.map(md5hex).mkString))
    }
  }

  test("writeShards emits one hive dir per shard with rank-ordered rows") {
    val out = Files.createTempDirectory("graft_shards").toString
    val p = ShardExport.plan(docs, "doc_id", 4)
    ShardExport.writeShards(p, 4, out)
    val expected = p.select("shard", "shard_rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    expected.keys.foreach { shard =>
      // one file per shard: the shard lands wholly in one task
      val files = new java.io.File(s"$out/shard=$shard")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1)
      // single-file read preserves row order == shard_rank order
      val got = spark.read.parquet(files.head.getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(got == expected(shard))
    }
    // round-trip completeness
    val back = spark.read.parquet(out)
    assert(back.count() == 40)
    assert(back.select("doc_id").distinct().count() == 40)
  }
}
