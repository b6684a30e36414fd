package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // planted anisotropy: variance concentrated along (1, 2, 0)/√5 with
  // small deterministic noise in the third coordinate
  private lazy val planted = (1 to 200).map { i =>
    val t = (i % 21 - 10).toDouble / 10.0 // -1 .. 1
    val noise = ((i * 7) % 11 - 5).toDouble / 200.0
    (i.toLong, Seq(t + 3.0, 2.0 * t - 1.0, noise))
  }.toDF("vec_id", "embedding")

  test("gramTable matches a driver-side integer replay exactly") {
    val d = Seq(
      (1L, Seq(0.5, -1.25)),
      (2L, Seq(1.0, 0.75)),
      (3L, Seq(-0.25, 2.0))).toDF("vec_id", "embedding")
    val out = Pca.gramTable(d, "embedding", 2, quantBits = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val q = Seq(Seq(0.5, -1.25), Seq(1.0, 0.75), Seq(-0.25, 2.0))
      .map(_.map(x => math.floor(x * 1024).toLong))
    val n = q.length.toLong
    val m = Seq(0, 1).map(k => q.map(_(k)).sum)
    for (i <- 0 to 1; j <- 0 to 1) {
      val s = q.map(v => v(i) * v(j)).sum
      assert(out((i.toLong, j.toLong)) == n * s - m(i) * m(j), s"cell $i,$j")
    }
  }

  test("gramCells equals the full gramTable on every requested cell " +
      "(the explode-free O(cells) path)") {
    val d = Seq(
      (1L, Seq(0.5, -1.25, 2.0, 0.25)),
      (2L, Seq(1.0, 0.75, -0.5, 1.5)),
      (3L, Seq(-0.25, 2.0, 0.0, -1.0))).toDF("vec_id", "embedding")
    val full = Pca.gramTable(d, "embedding", 4, quantBits = 10)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        r.getLong(2)).toMap
    val cells = Seq((0, 0), (1, 1), (0, 1), (2, 3), (3, 3))
    val got = Pca.gramCells(d, "embedding", 10, cells)
    cells.foreach { c => assert(got(c) == full(c), s"cell $c") }
  }

  test("jacobiEigen rotates equal-diagonal matrices (theta = 0)") {
    // [[2,1],[1,2]]: eigenvalues 3 and 1, dominant axis (1,1)/sqrt(2) —
    // sgn(0)=0 in place of +1 would skip every rotation and return the
    // identity basis
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12,
      vals.toSeq.toString)
    val inv = 1.0 / math.sqrt(2.0)
    val cos = vecs(0)(0) * inv + vecs(0)(1) * inv
    assert(math.abs(math.abs(cos) - 1.0) < 1e-9, vecs(0).toSeq.toString)
  }

  test("fit recovers the planted principal axis; components orthonormal") {
    val (mean, comps, vals) = Pca.fit(planted, "embedding", 3, 2)
    assert(mean.length == 3 && comps.length == 2)
    // eigenvalues descending, dominant one carries almost everything
    assert(vals(0) > vals(1) && vals(0) > 10.0 * vals(1),
      s"expected dominant axis, got ${vals.toSeq}")
    // first component aligns with (1, 2, 0)/sqrt(5)
    val axis = Array(1.0, 2.0, 0.0).map(_ / math.sqrt(5.0))
    val cos = comps(0).zip(axis).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"axis alignment ${math.abs(cos)}")
    // orthonormal rows
    for (a <- comps.indices; b <- comps.indices) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<$a,$b> = $dot")
    }
  }

  test("PCA-compressed neighbor search keeps recall on low-rank data") {
    // the pipeline composition PCA exists for: when the corpus has low
    // intrinsic dimension, searching in the 8-dim PCA space recovers
    // the full-space neighbors. Planted: rank-5, near-zero-mean vectors
    // in 16 dims (zero mean keeps cosine comparable across spaces —
    // centering is not translation-invariant for cosine; and the
    // sf0.001 synthetic embeddings are genuinely full-rank, where ANY
    // 8-dim cut scrambles neighbors, so they cannot test this).
    val basis = (0 until 5).map(b =>
      (0 until 16).map(k => math.sin(0.7 * (b + 1) * (k + 3))).toArray)
    val planted16 = (1 to 200).map { i =>
      val w = (0 until 5).map(b => ((i * (b + 2)) % 21 - 10).toDouble / 10.0)
      val eps = ((i * 13) % 7 - 3).toDouble / 500.0
      (i.toLong, (0 until 16).map(k =>
        (0 until 5).map(b => w(b) * basis(b)(k)).sum +
          (if (k == 7) eps else 0.0)).toSeq)
    }.toDF("vec_id", "embedding")
    val (mean, comps, _) =
      graft.operators.Pca.fit(planted16, "embedding", 16, 8)
    val proj = graft.operators.Pca.project(
      planted16, "vec_id", "embedding", mean, comps)
      .select(col("vec_id"), col("proj").as("embedding"))
    def topk(q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      graft.operators.Similarity.bruteForceTopK(
          q.filter($"vec_id" <= 8), c, "vec_id", "embedding", 10)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = topk(planted16, planted16)
    val compressed = topk(proj, proj)
    val recall = full.intersect(compressed).size.toDouble / full.size
    assert(recall >= 0.9, s"PCA-space recall@10 too low: $recall")
  }

  test("project concentrates variance in the first coordinate and centers it") {
    val (mean, comps, _) = Pca.fit(planted, "embedding", 3, 2)
    val proj = Pca.project(planted, "vec_id", "embedding", mean, comps)
      .collect().map(_.getSeq[Double](1))
    val n = proj.length.toDouble
    def colStats(k: Int): (Double, Double) = {
      val xs = proj.map(_(k))
      val mu = xs.sum / n
      (mu, xs.map(x => (x - mu) * (x - mu)).sum / n)
    }
    val (mu0, var0) = colStats(0)
    val (_, var1) = colStats(1)
    // the fitted mean is floor-quantized at 2^-10 per component, so the
    // projected mean is only centered to quantization granularity
    assert(math.abs(mu0) < 3e-3, s"projection not centered: $mu0")
    assert(var0 > 10.0 * var1, s"variance not concentrated: $var0 vs $var1")
  }
}
