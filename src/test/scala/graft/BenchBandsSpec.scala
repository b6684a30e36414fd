package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bands-as-data machinery (VERDICT r15 #6): the committed
  * tools/bench_bands.json drives standalone forcing, and quiet runs
  * tighten it in place — no code edit per record. */
class BenchBandsSpec extends AnyFunSuite {

  test("the committed bands file parses and covers the r15 watchlist") {
    val bands = Bench.loadBands("tools/bench_bands.json")
    assert(bands.size >= 60, s"expected the 61-entry r15 table, got ${bands.size}")
    assert(bands.contains("q_quality_classifier") && bands.contains("q_tpch_q1"))
    assert(bands.values.forall(v => v > 0 && v < 60))
  }

  test("refreshBands only TIGHTENS, adds first-time queries, skips " +
      "failures, and round-trips through loadBands") {
    val f = java.nio.file.Files.createTempFile("bands", ".json")
    java.nio.file.Files.writeString(f, "{\n\"q_a\": 1.0,\n\"q_b\": 0.5\n}\n")
    Bench.refreshBands(f.toString,
      results = Seq("q_a" -> 2.0, "q_b" -> 0.4004, "q_new" -> 0.7,
        "q_fail" -> -1.0),
      standalones = Seq("q_a" -> 0.8, "q_new" -> 0.6))
    val out = Bench.loadBands(f.toString)
    assert(out("q_a") == 0.8)   // standalone beat the band
    assert(out("q_b") == 0.4)   // in-suite beat the band (rounded)
    assert(out("q_new") == 0.6) // first quiet anchor
    assert(!out.contains("q_fail"))
    java.nio.file.Files.deleteIfExists(f)
  }
}
