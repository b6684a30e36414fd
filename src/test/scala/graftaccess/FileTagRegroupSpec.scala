package org.apache.spark.sql.graftaccess

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.scalatest.funsuite.AnyFunSuite

/** The `_file` regroup step in isolation: one tagged partition per
  * contiguous same-file run, fail-fast on a non-FilePartition (an empty
  * tag would silently skew count(DISTINCT _file)-style queries — the
  * column is declared non-nullable with absolute-path semantics). */
class FileTagRegroupSpec extends AnyFunSuite {

  private def pf(path: String, start: Long, len: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      start, len)

  test("splits of one file keep one tag each; distinct files separate") {
    val parts = FileTaggedScans.regroupByFile(Array(
      FilePartition(0, Array(
        pf("file:/w/a.parquet", 0, 10), pf("file:/w/a.parquet", 10, 10),
        pf("file:/w/b.parquet", 0, 5))),
      FilePartition(1, Array(pf("file:/w/c.parquet", 0, 7)))))
    val tagged = parts.map(_.asInstanceOf[FileTaggedScans.TaggedPartition])
    // the two a-splits stay in ONE partition (same contiguous run)
    assert(tagged.map(_.file).toSeq ==
      Seq("file:/w/a.parquet", "file:/w/b.parquet", "file:/w/c.parquet"))
    assert(tagged.head.inner.asInstanceOf[FilePartition].files.length == 2)
  }

  test("a non-FilePartition from the delegate fails fast, never an empty tag") {
    val alien = new InputPartition {}
    val e = intercept[IllegalStateException] {
      FileTaggedScans.regroupByFile(Array(alien))
    }
    assert(e.getMessage.contains("FilePartition"), e.getMessage)
  }
}
