package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RandomProjection

/** Sparse random projection: the kernel equals the naive per-entry
  * computation, the sign matrix has the Achlioptas distribution and is
  * deterministic, and the projection approximately preserves cosine
  * similarity on the real embeddings table (the JL property — the
  * reason the operator exists). */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val InDim = 8
  private val OutDim = 4

  test("kernel equals the naive floor-quantize + sign-matrix product") {
    val vec = Array(0.5f, -1.25f, 3.0f, 0.000001f, -0.75f, 2.5f, 0f, 1f)
    val df = Seq((1L, vec.toSeq)).toDF("vec_id", "embedding")
    val out = RandomProjection.project(df, "vec_id", "embedding", OutDim, InDim)
      .collect().head.getSeq[Long](1)
    val m = RandomProjection.signMatrix(OutDim, InDim)
    val q = vec.map(x => math.floor(x.toDouble * (1 << 20)).toLong)
    val expect = m.map(row =>
      row.zip(q).map { case (s, v) => s * v }.sum)
    assert(out == expect)
  }

  test("sign matrix is deterministic with a roughly 1/6,1/6,2/3 split") {
    val a = RandomProjection.signMatrix(16, 64).flatten
    val b = RandomProjection.signMatrix(16, 64).flatten
    assert(a == b)
    val n = a.size.toDouble
    val plus = a.count(_ == 1) / n
    val minus = a.count(_ == -1) / n
    assert(math.abs(plus - 1.0 / 6) < 0.04, s"P(+1) = $plus")
    assert(math.abs(minus - 1.0 / 6) < 0.04, s"P(-1) = $minus")
  }

  test("projection approximately preserves cosine on real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 40)
    val orig = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = RandomProjection
      .projectF(e, "vec_id", "embedding", 32, 64)
      .collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = orig.keys.toSeq.sorted
    val errs = for {
      x <- ids; y <- ids if x < y
    } yield math.abs(cos(orig(x), orig(y)) - cos(proj(x), proj(y)))
    assert(errs.max < 0.6, s"worst-pair drift ${errs.max}")
    val mean = errs.sum / errs.size
    // E|err| ~ sqrt(2/(pi*32)) ≈ 0.14 for 64→32 sparse JL
    assert(mean < 0.2, s"mean drift $mean")
  }
}
