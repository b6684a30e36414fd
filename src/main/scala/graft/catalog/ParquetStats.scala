package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._

/** File-level pruning from Parquet footer statistics — the metadata-only
  * check that lets copy-on-write DELETE rewrite ONLY files that might
  * contain matching rows (Iceberg prunes the same way from manifest
  * stats; after [[Maintenance.compact]] sorts the table on the predicate
  * column, a key-range DELETE touches O(1) files out of a 100 TB table).
  *
  * Strictly CONSERVATIVE: returns true ("may match") whenever stats are
  * missing, the type is unhandled, or the filter shape can't be reasoned
  * about — pruning can only skip files that PROVABLY contain no match.
  */
object ParquetStats {

  /** Could any row of `file` satisfy the conjunction of `filters`? */
  def mayMatchAll(file: String, filters: Seq[Filter]): Boolean = {
    if (filters.isEmpty) return true
    val footer = try {
      val in = HadoopInputFile.fromPath(new Path(file), new Configuration())
      val r = ParquetFileReader.open(in)
      try r.getFooter finally r.close()
    } catch { case _: Exception => return true }
    val blocks = footer.getBlocks.asScala
    if (blocks.isEmpty) return false // zero row groups: no rows at all
    // a row matching the AND must live in SOME row group matching every
    // conjunct's may-match bound
    blocks.exists { block =>
      val cols = block.getColumns.asScala.map { c =>
        c.getPath.toDotString -> c
      }.toMap
      filters.forall { f => mayMatch(f, cols.get _) }
    }
  }

  private type ColLookup = String => Option[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]

  private def mayMatch(f: Filter, col: ColLookup): Boolean = f match {
    case EqualTo(a, v) => rangeOverlaps(col(a), v, v)
    case GreaterThan(a, v) => maxAbove(col(a), v, strict = true)
    case GreaterThanOrEqual(a, v) => maxAbove(col(a), v, strict = false)
    case LessThan(a, v) => minBelow(col(a), v, strict = true)
    case LessThanOrEqual(a, v) => minBelow(col(a), v, strict = false)
    case In(a, vs) => vs.exists(v => rangeOverlaps(col(a), v, v))
    case IsNull(a) => col(a).forall { c =>
      val s = c.getStatistics
      s == null || !s.isNumNullsSet || s.getNumNulls > 0
    }
    case And(l, r) => mayMatch(l, col) && mayMatch(r, col)
    case Or(l, r) => mayMatch(l, col) || mayMatch(r, col)
    case AlwaysFalse() => false
    case _ => true // Not, string matchers, unknown: conservative
  }

  /** [lo, hi] of the filter value overlaps the chunk's [min, max]. */
  private def rangeOverlaps(c: Option[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData],
      lo: Any, hi: Any): Boolean =
    stats(c) match {
      case Some((min, max)) =>
        cmp(hi, min).forall(_ >= 0) && cmp(lo, max).forall(_ <= 0)
      case None => true
    }

  private def maxAbove(c: Option[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData],
      v: Any, strict: Boolean): Boolean =
    stats(c) match {
      case Some((_, max)) =>
        cmp(max, v).forall(d => if (strict) d > 0 else d >= 0)
      case None => true
    }

  private def minBelow(c: Option[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData],
      v: Any, strict: Boolean): Boolean =
    stats(c) match {
      case Some((min, _)) =>
        cmp(min, v).forall(d => if (strict) d < 0 else d <= 0)
      case None => true
    }

  private def stats(c: Option[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
      : Option[(Any, Any)] =
    c.flatMap { cc =>
      val s = cc.getStatistics
      if (s == null || !s.hasNonNullValue) None
      else Some((s.genericGetMin, s.genericGetMax))
    }

  /** Compare a stats value with a filter value; None = incomparable
    * (conservative). Numeric types widen to double for the comparison —
    * fine at these magnitudes for pruning (never for correctness). */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Number, y: Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: Binary, y: String) =>
      Some(x.toStringUsingUTF8.compareTo(y))
    case (x: String, y: Binary) =>
      Some(x.compareTo(y.toStringUsingUTF8))
    case (x: Binary, y: Binary) =>
      Some(x.toStringUsingUTF8.compareTo(y.toStringUsingUTF8))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case _ => None
  }
}
