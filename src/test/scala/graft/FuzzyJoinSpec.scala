package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val lRows = Seq(
    (1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "a"), (5L, ""),
    (6L, "gamma ray"), (7L, "gama ray"), (8L, "delta force nine"))
  private val rRows = Seq(
    (11L, "alpha"), (12L, "betas"), (13L, "b"), (14L, ""),
    (15L, "gamma ray"), (16L, "xx"), (17L, "delta force nin"),
    (18L, "ba"))

  private def naive(k: Int): Set[(Long, Long, Long)] =
    (for {
      (il, sl) <- lRows; (ir, sr) <- rRows
      d = lev(sl, sr) if d <= k
    } yield (il, ir, d.toLong)).toSet

  test("blocked edit-distance join equals the naive cross join at " +
      "k = 0, 1, 2 (short strings, empties, inserts, deletes included)") {
    val l = lRows.toDF("id_l", "s")
    val r = rRows.toDF("id_r", "s")
    for (k <- 0 to 2) {
      val got = FuzzyJoin.editDistanceJoin(l, r, "id_l", "s", "id_r", "s",
          maxDist = k)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .toSet
      assert(got == naive(k), s"mismatch at maxDist=$k")
    }
  }

  test("randomized adversarial corpus: tiny alphabet, lengths 0-7, " +
      "equality with the naive join at k = 0, 1, 2") {
    // seeded, so deterministic; alphabet {a, b, space} maximizes gram
    // collisions and near-pairs — the hardest recall regime
    val rnd = new scala.util.Random(42)
    def randStr() =
      (0 until rnd.nextInt(8)).map(_ => "ab "(rnd.nextInt(3))).mkString
    val ls = (1L to 25L).map(i => (i, randStr()))
    val rs = (101L to 130L).map(i => (i, randStr()))
    val l = ls.toDF("id_l", "s")
    val r = rs.toDF("id_r", "s")
    for (k <- 0 to 2) {
      val expected = (for {
        (il, sl) <- ls; (ir, sr) <- rs
        d = lev(sl, sr) if d <= k
      } yield (il, ir, d.toLong)).toSet
      val got = FuzzyJoin.editDistanceJoin(l, r, "id_l", "s", "id_r", "s",
          maxDist = k)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .toSet
      assert(got == expected, s"mismatch at maxDist=$k: " +
        s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("short-string-dominated corpus: naive equality AND no cartesian " +
      "node — the short path is a length-bucket equi-join") {
    // A corpus that is ~all short codes (tickers/SKU-like, length 0-5 at
    // q=2,k=2 ⇒ every string is at or below the gram bound's reach):
    // the old short path cross-joined this whole corpus. Seeded RNG.
    val rnd = new scala.util.Random(7)
    def code() =
      (0 until rnd.nextInt(6)).map(_ => "abc12"(rnd.nextInt(5))).mkString
    val ls = (1L to 40L).map(i => (i, code()))
    val rs = (201L to 240L).map(i => (i, code()))
    val l = ls.toDF("id_l", "s")
    val r = rs.toDF("id_r", "s")
    for (k <- 1 to 2) {
      val joined = FuzzyJoin.editDistanceJoin(l, r, "id_l", "s", "id_r", "s",
        maxDist = k)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"short-string corpus must not plan a cartesian node at k=$k:\n$p")
      val expected = (for {
        (il, sl) <- ls; (ir, sr) <- rs
        d = lev(sl, sr) if d <= k
      } yield (il, ir, d.toLong)).toSet
      val got = joined.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(got == expected, s"mismatch at maxDist=$k: " +
        s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("short-string pairs (below the count-filter bound) are found " +
      "by the dedicated path") {
    // every string here is <= q-1+k*q = 3 chars at q=2, k=1 — the gram
    // count filter can never admit them, so matches prove the short path
    val l = Seq((1L, "ab"), (2L, "x")).toDF("id_l", "s")
    val r = Seq((10L, "ac"), (11L, "xy"), (12L, "zzz")).toDF("id_r", "s")
    val got = FuzzyJoin.editDistanceJoin(l, r, "id_l", "s", "id_r", "s", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L))) // ab~ac (sub), x~xy (ins)
  }
}
