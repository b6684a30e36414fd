package graft.catalog

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Table-maintenance surface for MetaCatalog tables — the rebuild of
  * Iceberg's `expire_snapshots` / orphan-file cleanup (the operational
  * half of snapshot-based tables: without expiry, copy-on-write DELETE and
  * OVERWRITE grow storage forever; at 100 TB this runs as a scheduled
  * metadata-only job, never a data scan). */
object Maintenance {

  /** Resolve `cat.ns....table` to its directory under the catalog's
    * configured warehouse. */
  private[catalog] def tableDir(spark: SparkSession, ident: String): Path = {
    val parts = ident.split("\\.")
    require(parts.length >= 3, s"need cat.ns.table, got $ident")
    val wh = spark.conf.get(s"spark.sql.catalog.${parts.head}.warehouse")
    parts.tail.foldLeft(Paths.get(wh))((p, n) => p.resolve(n))
  }

  /** Compact + sort-cluster a table's current snapshot — the rebuild of
    * Iceberg's `rewrite_data_files` with a sort strategy: many small
    * commit-sized files become `targetFiles` range-partitioned,
    * internally sorted files, so Parquet row-group min/max stats actually
    * prune on `sortCols` predicates (the data-skipping layout that turns
    * a 100 TB scan into a range read). Runs as one distributed
    * read→shuffle→write; commits ONE new snapshot (old files stay for
    * time travel until [[expireSnapshots]]). Returns (files before,
    * files after). */
  def compact(spark: SparkSession, ident: String, sortCols: Seq[String],
      targetFiles: Int): (Int, Int) = {
    import org.apache.spark.sql.functions.col
    require(targetFiles >= 1 && sortCols.nonEmpty)
    rewriteClustered(spark, ident) { pinned =>
      pinned
        .repartitionByRange(targetFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    }
  }

  /** [[compact]] with a Z-ORDER layout instead of a linear sort: rows
    * cluster along the Morton curve over `zCols`
    * ([[graft.operators.ZOrder]]), so every output file covers a small
    * hyper-rectangle and footer min/max stats prune on ANY of the
    * z-columns — the multi-predicate data-skipping layout
    * (Iceberg's rewrite_data_files zorder strategy). A linear sort
    * clusters only its leading column; its files span the full range of
    * every other dimension and never prune on them. Per-dimension
    * [lo, hi] comes from one metadata-cheap min/max aggregate over the
    * pinned snapshot. */
  def compactZOrder(spark: SparkSession, ident: String, zCols: Seq[String],
      targetFiles: Int, bits: Int = 16): (Int, Int) = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, max, min}
    require(targetFiles >= 1 && zCols.nonEmpty)
    rewriteClustered(spark, ident) { pinned =>
      val aggs = zCols.flatMap(c =>
        Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
      val mm = pinned.agg(aggs.head, aggs.tail: _*).head()
      // an all-NULL z-column has no [lo, hi] — fail with the column name
      // rather than an opaque NULL-primitive getDouble error
      zCols.zipWithIndex.foreach { case (c, i) =>
        if (mm.isNullAt(2 * i) || mm.isNullAt(2 * i + 1))
          throw new IllegalArgumentException(
            s"z-order column '$c' is entirely NULL in $ident; " +
              "pick a populated column or compact() on another key")
      }
      val ranges = zCols.indices.map(i => (mm.getDouble(2 * i), mm.getDouble(2 * i + 1)))
      val zk = graft.operators.ZOrder.zkeyFor(zCols.map(col), ranges, bits)
      // rows with a NULL in any z-column get a NULL key; pin them to a
      // sentinel below every real key (keys are non-negative) so they
      // form one deterministic leading range instead of relying on the
      // range partitioner's NULL placement
      pinned.withColumn("__z", coalesce(zk, lit(-1L)))
        .repartitionByRange(targetFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    }
  }

  /** Shared rewrite plumbing: pin ONE snapshot for both the read and the
    * surgical commit — a writeTo().overwrite() would blanket-replace and
    * lose any INSERT that commits while the rewrite job runs;
    * replaceFiles keeps it and aborts if a concurrent rewrite replaced
    * the base. Returns (files before, files after). */
  private def rewriteClustered(spark: SparkSession, ident: String)(
      layout: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Int, Int) = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val dir = tableDir(spark, ident)
    val base = Snapshots.latest(dir).getOrElse(
      throw new IllegalArgumentException(s"no snapshots for $ident"))
    if (base.files.isEmpty) return (0, 0)
    val schema = DataType.fromJson(
      Files.readString(dir.resolve("_graft_schema.json"))).asInstanceOf[StructType]
    val props = {
      val f = dir.resolve("_graft_props.properties")
      if (!Files.exists(f)) Map.empty[String, String]
      else {
        val p = new java.util.Properties()
        val in = Files.newInputStream(f)
        try p.load(in) finally in.close()
        p.asScala.toMap
      }
    }
    val parts = props.get("graft.partition.columns").toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty)
    val pinned = spark.read
      .option("basePath", dir.resolve("data").toString)
      .schema(schema)
      .parquet(base.files.map(f => dir.resolve(f).toString): _*)
    val table = new GraftTable(ident, dir, schema, parts,
      props - "graft.partition.columns", pinned = None)
    table.replaceFiles(layout(pinned), base.files)
    val after = Snapshots.latest(dir).map(_.files.length).getOrElse(0)
    (base.files.length, after)
  }

  /** Test hook: drive a surgical rewrite from an explicitly stale base to
    * assert the conflict-abort path (impossible to time reliably with
    * real concurrent statements). */
  private[graft] object CompactTestHook {
    def replaceWithStaleBase(spark: SparkSession, ident: String,
        staleBase: Seq[String]): Unit = {
      import org.apache.spark.sql.types.{DataType, StructType}
      val dir = tableDir(spark, ident)
      val schema = DataType.fromJson(
        Files.readString(dir.resolve("_graft_schema.json"))).asInstanceOf[StructType]
      val table = new GraftTable(ident, dir, schema, Seq.empty, Map.empty, None)
      table.replaceFiles(spark.table(ident), staleBase)
    }
  }

  /** Drop all but the newest `keepLast` snapshots and delete data files no
    * surviving snapshot references. Returns (snapshots dropped, files
    * deleted). Time travel to expired versions stops working — that is the
    * point. */
  def expireSnapshots(spark: SparkSession, ident: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val dir = tableDir(spark, ident)
    val all = Snapshots.list(dir)
    if (all.length <= keepLast) return (0, 0)
    val (drop, keep) = all.splitAt(all.length - keepLast)
    val live = keep.flatMap(_.files).toSet
    val dead = drop.flatMap(_.files).toSet -- live
    dead.foreach { f => Files.deleteIfExists(dir.resolve(f)) }
    drop.foreach { s =>
      Files.deleteIfExists(dir.resolve("_graft_snapshots").resolve(f"v${s.version}%08d.snap"))
    }
    // prune now-empty partition dirs under data/
    val dataDir = dir.resolve("data")
    if (Files.isDirectory(dataDir)) {
      scala.util.Using.resource(Files.walk(dataDir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .filter(p => p != dataDir && Files.isDirectory(p))
          .foreach { p =>
            val empty = scala.util.Using.resource(Files.list(p))(!_.iterator().hasNext)
            if (empty) Files.delete(p)
          }
      }
    }
    (drop.length, dead.size)
  }
}
