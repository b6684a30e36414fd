package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Coreset, Retrieval, RetrievalEval}

class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val U = 1L << 40

  test("rrfFuse sums integer reciprocals and breaks score ties by id") {
    val run1 = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "rank")
    val run2 = Seq(("b", 1), ("a", 2), ("d", 3)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(run1, run2), Seq.empty, "id", "rank",
        kRrf = 60, topN = 10, unit = U)
      .orderBy("fused_rank").collect()
    val byId = out.map(r => r.getAs[String]("id") ->
      (r.getAs[Long]("n_runs"), r.getAs[Long]("best_rank"),
        r.getAs[Long]("rrf_q"), r.getAs[Int]("fused_rank"))).toMap
    // a and b have identical fused scores (u/61 + u/62) — tie falls to id
    val ab = U / 61 + U / 62
    assert(byId("a") == ((2L, 1L, ab, 1)))
    assert(byId("b") == ((2L, 1L, ab, 2)))
    assert(byId("c") == ((1L, 3L, U / 63, 3)))
    assert(byId("d") == ((1L, 3L, U / 63, 4)))
  }

  test("rrfFuse is per-key when keyCols are given and cuts at topN") {
    val run1 = Seq((1, "a", 1), (1, "b", 2), (2, "x", 1)).toDF("q", "id", "rank")
    val run2 = Seq((1, "b", 1), (2, "y", 1)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(run1, run2), Seq("q"), "id", "rank",
        kRrf = 60, topN = 1, unit = U)
      .orderBy("q").collect()
    assert(out.length == 2) // one winner per query
    val q1 = out(0)
    assert(q1.getAs[Int]("q") == 1 && q1.getAs[String]("id") == "b")
    assert(q1.getAs[Long]("rrf_q") == U / 62 + U / 61)
    val q2 = out(1)
    // x and y tie at u/61 within query 2 — id breaks it
    assert(q2.getAs[Int]("q") == 2 && q2.getAs[String]("id") == "x")
  }

  // collinear points: positions 0, 1, 2, 10, 20 (×1024 after quantizing)
  private lazy val line = Seq(
    (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(2f, 0f)),
    (3L, Seq(10f, 0f)), (4L, Seq(20f, 0f))
  ).toDF("vec_id", "embedding")

  test("kCenterGreedy walks the farthest-point trajectory deterministically") {
    val cs = Coreset.kCenterGreedy(line, "vec_id", "embedding", k = 3)
    def sq(x: Long) = x * x
    // seed = min id; then 20 (farthest from 0); then 10 (min-dist
    // max over remaining: min(10,10)² beats 1, 2's)
    assert(cs.map(_.id) == Seq(0L, 4L, 3L))
    assert(cs.map(_.radiusQ) == Seq(-1L, sq(20 * 1024), sq(10 * 1024)))
    // radii never increase after the seed
    assert(cs.drop(1).map(_.radiusQ) == cs.drop(1).map(_.radiusQ).sorted.reverse)
  }

  test("assign picks the nearest center, earliest iter on exact ties") {
    val cs = Coreset.kCenterGreedy(line, "vec_id", "embedding", k = 3)
    val a = Coreset.assign(line, "vec_id", "embedding", cs)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(a(0L) == ((0L, 1L, 0L)))
    assert(a(4L) == ((4L, 2L, 0L)))
    assert(a(3L) == ((3L, 3L, 0L)))
    assert(a(1L) == ((0L, 1L, 1024L * 1024)))
    assert(a(2L) == ((0L, 1L, 2048L * 2048)))
    // exact tie: a point at 15 is equidistant to centers 10 (iter 3)
    // and 20 (iter 2) — the EARLIER center (iter 2) must win
    val tied = Seq((9L, Seq(15f, 0f))).toDF("vec_id", "embedding")
    val t = Coreset.assign(tied, "vec_id", "embedding", cs).collect()(0)
    assert(t.getAs[Long]("center_id") == 4L &&
      t.getAs[Long]("center_iter") == 2L)
  }

  test("RetrievalEval.atK scores hits, precision counts and fixed-point RR") {
    // q1: relevant {b, z}; run has b at rank 2 (z never retrieved)
    // q2: relevant {m};   run misses it inside k=2 but finds it at 3
    // q3: judged relevant only — never retrieved at all
    // q4: retrieved only — no judgments
    val run = Seq(("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
      ("q2", "x", 1), ("q2", "y", 2), ("q2", "m", 3),
      ("q4", "w", 1)).toDF("qid", "id", "rank")
    val qrels = Seq(("q1", "b"), ("q1", "z"), ("q2", "m"), ("q3", "r"))
      .toDF("qid", "id")
    val out = RetrievalEval.atK(run, qrels, k = 2, unit = U)
      .orderBy("qid").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("q1") == ((2L, 2L, 1L, 2L, U / 2)))
    assert(out("q2") == ((1L, 2L, 0L, 3L, U / 3)))
    assert(out("q3") == ((1L, 0L, 0L, 0L, 0L)))
    assert(out("q4") == ((0L, 1L, 0L, 0L, 0L)))
  }

  test("kCenterGreedy k=1 returns only the seed; empty corpus throws") {
    val cs = Coreset.kCenterGreedy(line, "vec_id", "embedding", k = 1)
    assert(cs == Seq(Coreset.Center(1, 0L, Seq(0L, 0L), -1L, 1024)))
    val empty = line.filter(col("vec_id") < 0)
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(empty, "vec_id", "embedding", k = 2)
    }
  }

  test("kCenterGreedy stops early when distinct vectors run out " +
      "(no duplicate centers)") {
    val dup = Seq((0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)), (2L, Seq(5f, 0f)),
      (3L, Seq(5f, 0f))).toDF("vec_id", "embedding")
    val cs = Coreset.kCenterGreedy(dup, "vec_id", "embedding", k = 4)
    assert(cs.map(_.id) == Seq(0L, 2L)) // only 2 distinct vectors exist
    assert(cs.map(_.id).distinct.size == cs.size)
  }

  test("assign derives the scale from the centers and rejects mixes") {
    // centers selected at a non-default scale still assign correctly —
    // the scale travels WITH the centers, not as a second parameter a
    // caller could get wrong
    val cs = Coreset.kCenterGreedy(line, "vec_id", "embedding", k = 2,
      scale = 4096)
    assert(cs.forall(_.scale == 4096))
    val a = Coreset.assign(line, "vec_id", "embedding", cs)
      .orderBy("id").collect()
    assert(a.head.getAs[Long]("dist_q") == 0L) // seed maps to itself
    intercept[IllegalArgumentException] {
      Coreset.assign(line, "vec_id", "embedding",
        Seq(cs.head, cs.last.copy(scale = 1024)))
    }
  }

  // ---- merge-and-reduce (sharded) k-center ----

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucketOf(id: Long, m: Int): Long =
    java.lang.Long.parseLong(md5Hex(id.toString).take(8), 16) % m

  /** Plain-Scala replay of kCenterSharded's two phases. */
  private def naiveSharded(points: Seq[(Long, Seq[Float])], m: Int,
      kb: Int, kf: Int, scale: Int = 1024)
      : (Seq[(Long, Int, Long)], Seq[Long]) = {
    def quant(v: Seq[Float]) =
      v.map(x => math.floor(x.toDouble * scale).toLong)
    def sq(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byBucket = points.map { case (id, v) =>
      (bucketOf(id, m), id, quant(v))
    }.groupBy(_._1)
    var perBucket = Vector.empty[(Long, Int, Long, Seq[Long])]
    byBucket.foreach { case (b, ps) =>
      val pts = ps.map(p => (p._2, p._3))
      val seed = pts.minBy(_._1)
      var cs = Vector((1, seed._1, seed._2))
      var mind = pts.map { case (id, v) => (id, v, sq(v, seed._2)) }
      var t = 2
      var stop = false
      while (t <= kb && !stop) {
        val cands = mind.filter(_._3 > 0)
        if (cands.isEmpty) stop = true
        else {
          val win = cands.minBy { case (id, _, d) => (-d, id) }
          cs :+= ((t, win._1, win._2))
          mind = mind.map { case (id, v, d) =>
            (id, v, math.min(d, sq(v, win._2)))
          }
          t += 1
        }
      }
      perBucket ++= cs.map(c => (b, c._1, c._2, c._3))
    }
    // merge greedy over the union of bucket centers
    val cen = perBucket.map(c => (c._3, c._4)).sortBy(_._1)
    val seed = cen.minBy(_._1)
    var fin = Vector(seed._1)
    var mind = cen.map { case (id, v) => (id, v, sq(v, seed._2)) }
    var t = 2
    var stop = false
    while (t <= kf && !stop) {
      val cands = mind.filter(_._3 > 0)
      if (cands.isEmpty) stop = true
      else {
        val win = cands.minBy { case (id, _, d) => (-d, id) }
        fin :+= win._1
        val wv = cen.find(_._1 == win._1).get._2
        mind = mind.map { case (id, v, d) => (id, v, math.min(d, sq(v, wv))) }
        t += 1
      }
    }
    (perBucket.map(c => (c._1, c._2, c._3)).sortBy(c => (c._1, c._2)), fin)
  }

  private lazy val shardPts: Seq[(Long, Seq[Float])] =
    (0L until 24L).map { i =>
      (i, Seq((i % 7).toFloat, (i % 5).toFloat, (i / 8).toFloat))
    }

  test("kCenterSharded matches the plain-Scala two-phase replay") {
    val df = shardPts.toDF("vec_id", "embedding")
    val (per, fin) = Coreset.kCenterSharded(df, "vec_id", "embedding",
      numBuckets = 3, kPerBucket = 3, kFinal = 4)
    val (nPer, nFin) = naiveSharded(shardPts, 3, 3, 4)
    assert(per.map(c => (c.bucket, c.iter, c.id)).sortBy(c => (c._1, c._2))
      == nPer)
    assert(fin.map(_.id) == nFin)
    // merged centers carry the merge-stage selection order
    assert(fin.map(_.iter) == (1 to fin.size))
  }

  test("kCenterSharded is partition-invariant") {
    val df = shardPts.toDF("vec_id", "embedding")
    val a = Coreset.kCenterSharded(df, "vec_id", "embedding", 3, 3, 4)
    val b = Coreset.kCenterSharded(df.repartition(11), "vec_id",
      "embedding", 3, 3, 4)
    assert(a._1.map(c => (c.bucket, c.iter, c.id)).sorted ==
      b._1.map(c => (c.bucket, c.iter, c.id)).sorted)
    assert(a._2.map(_.id) == b._2.map(_.id))
  }

  test("kCenterSharded stops exhausted buckets early (no dup centers)") {
    // every vector identical: each bucket yields ONLY its seed, and the
    // merge stage yields only the global min-id center
    val dup = (0L until 12L).map(i => (i, Seq(1f, 1f))).toDF(
      "vec_id", "embedding")
    val (per, fin) = Coreset.kCenterSharded(dup, "vec_id", "embedding",
      numBuckets = 3, kPerBucket = 4, kFinal = 3)
    assert(per.forall(_.iter == 1))
    assert(per.map(_.id).distinct.size == per.size)
    assert(fin.size == 1)
  }

  // ---- MMR diversity re-ranking ----

  /** Plain-Scala replay of mmrSelect's integer semantics. */
  private def naiveMmr(cands: Seq[(Long, Seq[Float])], query: Seq[Double],
      k: Int, lNum: Int, lDen: Int, scale: Int = 1024): Seq[(Int, Long)] = {
    def quant(v: Seq[Double]) = v.map(x => math.floor(x * scale).toLong)
    val qq = quant(query)
    val qs = cands.map { case (id, v) =>
      id -> quant(v.map(_.toDouble))
    }
    def dot(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rel = qs.map { case (id, v) => id -> dot(v, qq) }.toMap
    var picked = Vector.empty[(Int, Long)]
    var remaining = qs
    var t = 1
    while (t <= k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v) =>
        val ms =
          if (picked.isEmpty) 0L
          else picked.map { case (_, pid) =>
            dot(v, qs.find(_._1 == pid).get._2)
          }.max
        (id, lNum * rel(id) - (lDen - lNum) * ms)
      }
      val win = scored.minBy { case (id, s) => (-s, id) }._1
      picked :+= (t, win)
      remaining = remaining.filterNot(_._1 == win)
      t += 1
    }
    picked
  }

  // NOTE: the query must NOT coincide with the top candidate — when
  // q == c1 exactly, rel(d) = dot(d, q) = dot(d, c1) = maxsim(d) after
  // the first pick and every λ=1/2 MMR score degenerates to 0.
  private lazy val mmrCands = Seq(
    (1L, Seq(0.9f, 0.1f)),   // most relevant (ties 2 on rel, wins by id)
    (2L, Seq(0.9f, 0.12f)),  // near-duplicate of 1
    (3L, Seq(0.5f, -0.8f)),  // diverse, moderate relevance
    (4L, Seq(0.1f, 0.05f))   // weakly relevant
  ).toDF("vec_id", "embedding")
  private val mmrQuery = Seq(1.0, 0.0)

  test("mmrSelect matches the plain-Scala integer replay") {
    val rows = mmrCands.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val got = Retrieval.mmrSelect(mmrCands, "vec_id", "embedding",
        mmrQuery, k = 4, lambdaNum = 3, lambdaDen = 4)
      .map(p => (p.iter, p.id))
    assert(got == naiveMmr(rows, mmrQuery, 4, 3, 4))
  }

  test("mmrSelect trades relevance for diversity at lambda = 1/2") {
    val picks = Retrieval.mmrSelect(mmrCands, "vec_id", "embedding",
      mmrQuery, k = 3, lambdaNum = 1, lambdaDen = 2)
    // pure relevance would pick 1 then its near-duplicate 2; MMR's
    // second pick must jump to the diverse candidate 3
    assert(picks.head.id == 1L && picks.head.maxSimQ == 0L)
    assert(picks(1).id == 3L)
    // the near-dup's penalty is visible: when 2 finally enters, its
    // maxsim is the (large) dot with pick 1
    val p2 = picks.find(_.id == 2L)
    assert(p2.forall(_.maxSimQ > 0L))
  }

  test("mmrSelect with lambdaNum == lambdaDen is pure relevance top-k") {
    val picks = Retrieval.mmrSelect(mmrCands, "vec_id", "embedding",
      mmrQuery, k = 4, lambdaNum = 1, lambdaDen = 1)
    val relOrder = mmrCands.collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1024).toLong)
        val q = mmrQuery.map(x => math.floor(x * 1024).toLong)
        (r.getLong(0), v.zip(q).map { case (a, b) => a * b }.sum)
      }
      .sortBy { case (id, rel) => (-rel, id) }.map(_._1).toSeq
    assert(picks.map(_.id) == relOrder)
    // selection order IS the mmr trajectory; mmr == lambda * rel here
    assert(picks.forall(p => p.mmrQ == p.relQ))
  }

  test("mmrSelect drains early when k exceeds the candidate count") {
    val picks = Retrieval.mmrSelect(mmrCands, "vec_id", "embedding",
      mmrQuery, k = 10)
    assert(picks.size == 4)
    assert(picks.map(_.id).distinct.size == 4)
  }
}
