package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Hidden-partition pruning shim ([[graft.catalog.PartitionTransforms]]):
  * the kept FILE LIST depends on the pushed filters, but a DSv2 builder
  * receives filters only after construction — so this wrapper records
  * pruning/filter calls, and at `build()` time prunes the file list
  * with the translated V1 filters, constructs the real delegate stack
  * over the surviving files, replays the recorded calls onto it
  * (parquet row-group pruning still sees every filter) and builds.
  * All filters are returned as residual — same stance as the
  * multi-generation composite; data filters over parquet are always
  * re-applied above the scan anyway. Built once per query (no runtime
  * re-filtering on interactive scans), so the late delegate
  * construction is planning-time-only work. */
object HiddenPruneScans {

  final class Builder(
      allFiles: Seq[String],
      pruneFiles: (Seq[String], Seq[Filter]) => Seq[String],
      mkDelegate: Seq[String] => ScanBuilder)
      extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters {

    private var required: Option[StructType] = None
    private var filters: Seq[Expression] = Seq.empty

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = Some(requiredSchema)

    override def pushFilters(fs: Seq[Expression]): Seq[Expression] = {
      filters = fs
      fs // ALL residual: the delegate re-receives them at build
    }

    override def pushedFilters: Array[Predicate] = Array.empty

    override def build(): Scan = {
      val v1 = filters.flatMap(f =>
        DataSourceStrategy.translateFilter(f,
          supportNestedPredicatePushdown = true))
      val kept = pruneFiles(allFiles, v1)
      val delegate = mkDelegate(kept)
      delegate match {
        case p: SupportsPushDownCatalystFilters => p.pushFilters(filters)
        case _ => ()
      }
      delegate match {
        case p: SupportsPushDownRequiredColumns =>
          required.foreach(p.pruneColumns)
        case _ => ()
      }
      delegate.build()
    }
  }
}
