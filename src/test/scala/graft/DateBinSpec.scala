package graft

import org.scalatest.funsuite.AnyFunSuite

class DateBinSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; DFCompat.install(s); s }

  private def one(sql: String): String =
    spark.sql(sql).collect().head.get(0).toString

  test("15-minute bins anchor at the origin") {
    assert(one("SELECT date_bin(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 00:37:11'," +
      " TIMESTAMP '2024-01-01 00:00:00')") == "2024-01-01 00:30:00.0")
  }

  test("bins before the origin floor correctly (floorDiv, not truncation)") {
    assert(one("SELECT date_bin(INTERVAL 1 HOUR, TIMESTAMP '2023-12-31 23:59:00'," +
      " TIMESTAMP '2024-01-01 00:00:00')") == "2023-12-31 23:00:00.0")
  }

  test("2-arg form anchors at the unix epoch") {
    assert(one("SELECT date_bin(INTERVAL 1 DAY, TIMESTAMP '2024-03-05 13:14:15')") ==
      "2024-03-05 00:00:00.0")
  }

  test("ts exactly on a boundary maps to itself") {
    assert(one("SELECT date_bin(INTERVAL 10 MINUTE, TIMESTAMP '2024-01-01 00:20:00'," +
      " TIMESTAMP '2024-01-01 00:00:00')") == "2024-01-01 00:20:00.0")
  }

  test("sub-minute strides keep microsecond precision") {
    assert(one("SELECT date_bin(INTERVAL 30 SECOND, TIMESTAMP '2024-01-01 00:00:59.999999'," +
      " TIMESTAMP '2024-01-01 00:00:00')") == "2024-01-01 00:00:30.0")
  }

  test("null inputs give null") {
    assert(spark.sql("SELECT date_bin(INTERVAL 1 HOUR, CAST(NULL AS TIMESTAMP)," +
      " TIMESTAMP '2024-01-01 00:00:00')").collect().head.isNullAt(0))
  }
}
