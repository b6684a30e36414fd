package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the probe registry must stay internally
  * consistent or the correctness gate silently shrinks. */
class ContractSpec extends AnyFunSuite {

  test("probe names are unique (duplicates would vanish in the Map)") {
    val names = SparkEntry.probesAll.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate probe names: ${dups.mkString(", ")}")
    assert(names.size == SparkEntry.queries.size)
  }

  test("every oracle key has a query") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: ${extra.mkString(", ")}")
  }

  test("bench headline names all resolve") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.benchNames.forall(qs.contains))
  }

  test("the flagship entry answers on sf0.001 with rows > 0") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
