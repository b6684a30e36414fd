package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SetJoin, Similarity}

/** Measured LINEAR-SCALING evidence for the heavy operator families
  * (VERDICT r14 #5): the 100 TB claims elsewhere are analytic +
  * sf0.1-measured; this main runs the five heaviest families at sf0.1
  * AND at a deterministically generated ~10× corpus and prints the
  * runtime ratios — a super-linear blowup surfaces as ratio >> factor.
  *
  * The scaled corpus replicates documents/embeddings `factor`× with
  * SEEDED mutations that keep the duplicate structure LINEAR (carried
  * lesson: quadratic-true-pair corpora cannot be benched): every
  * SECOND word of a replica gets a replica-specific suffix, so every
  * 3-word shingle and every 40-char gram contains a mutated word and
  * nothing matches across replicas (an every-8th-word mutation was
  * measured to leave cross-replica Jaccard ≈ 5/11, near the 0.5 LSH
  * threshold — pair counts went 73× at 10× data); ids offset by r·10⁷
  * keep every planted group replica-local. Embeddings get a
  * per-replica deterministic perturbation. No RNG anywhere — re-runs
  * are bit-identical.
  *
  * Usage: `tools/run.sh graft.ScaleBench <srcSfDir> <scaledDir> [factor]
  * [op ...]` — generates `<scaledDir>` once (skips when present), then
  * for each op prints one JSON line
  * `{"op":…,"base_sec":…,"scaled_sec":…,"ratio":…,"base_rows":…,"scaled_rows":…}`.
  * Results are recorded in BASELINE.md ("Round 15: measured scaling"). */
object ScaleBench {

  private val IdOffset = 10000000L

  def genCorpus(spark: SparkSession, src: String, dest: String,
      factor: Int): Unit = {
    // the marker is written LAST: a crash mid-generation (documents
    // written, embeddings missing) leaves no marker and regenerates;
    // a marker from a DIFFERENT factor fails loudly rather than
    // silently benchmarking the wrong scale under this factor's label
    val marker = Paths.get(dest, "_graft_scale_factor")
    if (Files.exists(marker)) {
      val have = Files.readString(marker).trim
      require(have == factor.toString,
        s"$dest was generated at factor $have, not $factor; " +
          "point at a fresh directory")
      return
    }
    Files.createDirectories(Paths.get(dest))
    val docs = Tables.load(spark, src, "documents")
    val docReps = (0 until factor).map { r =>
      if (r == 0) docs
      else {
        val mutated = array_join(
          // every SECOND word mutated: every 3-shingle and 40-char
          // gram hits a replica-specific token — zero cross-replica
          // matches, in-replica structure intact
          expr(s"transform(split(text, ' '), (w, i) -> " +
            s"IF(i % 2 = 0, concat(w, '_r$r'), w))"), " ")
        docs.select(
          (col("doc_id") + lit(r * IdOffset)).as("doc_id"),
          mutated.as("text"),
          col("lang"), col("source"),
          length(mutated).cast("long").as("n_chars"))
      }
    }.reduce(_ unionByName _)
    docReps.write.mode("overwrite")
      .parquet(Paths.get(dest, "documents.parquet").toString)

    val emb = Tables.load(spark, src, "embeddings")
    val embReps = (0 until factor).map { r =>
      if (r == 0) emb
      else emb.select(
        (col("vec_id") + lit(r * IdOffset)).as("vec_id"),
        // (i%13 + 1) * r is NONZERO for every dimension of every
        // replica r >= 1 and DISTINCT across replicas at every i — a
        // modular form like (i*r)%7 is identically zero when r divides
        // the modulus (replica 7 came out bit-identical to the base:
        // the planted-duplicate failure this mutation exists to avoid)
        expr(s"transform(embedding, (v, i) -> " +
          s"CAST(v + CAST(i % 13 + 1 AS FLOAT) * CAST($r AS FLOAT) * " +
          s"CAST(3.0E-4 AS FLOAT) AS FLOAT))").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    embReps.write.mode("overwrite")
      .parquet(Paths.get(dest, "embeddings.parquet").toString)
    Files.writeString(marker, factor.toString)
  }

  /** The probe-identical planted shapes (linear duplicate structure). */
  private def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(lit("XX "), col("text")).as("text")))
  }

  private def chainPairs(s: SparkSession, dir: String): DataFrame = {
    val ranked = Tables.load(s, dir, "documents").select("doc_id")
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
    ranked.as("a")
      .join(ranked.as("b"), col("b.r") === col("a.r") + 1 &&
        col("a.r") % 50 =!= 0)
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
  }

  private def groupToks(s: SparkSession, dir: String): DataFrame = {
    val g = expr("CAST(doc_id DIV 5 AS STRING)")
    Tables.load(s, dir, "documents").select(col("doc_id"),
      array(
        concat(lit("doc"), col("doc_id").cast("string")),
        concat(lit("x"), (col("doc_id") % 7).cast("string")),
        concat(lit("g1-"), g), concat(lit("g2-"), g),
        concat(lit("g3-"), g), concat(lit("g4-"), g),
        concat(lit("g5-"), g), concat(lit("g6-"), g)).as("toks"))
  }

  /** One catalog table per corpus for the row-level ops. */
  private def rowLevelTable(s: SparkSession, dir: String): String = {
    val wh = Paths.get(
      sys.props("java.io.tmpdir"), "graft_scale_wh").toString
    s.conf.set("spark.sql.catalog.gscale", "graft.catalog.MetaCatalog")
    s.conf.set("spark.sql.catalog.gscale.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gscale.db")
    "t" + Integer.toHexString(dir.hashCode).takeWhile(_ != '-')
  }

  val ops: Map[String, (SparkSession, String) => Long] = Map(
    // r18 (VERDICT r17 #6): the row-level write path's scaling. BUILD a
    // days-partitioned, write-ordered table from the corpus (ts is
    // doc_id-correlated: one day per 200 ids — the natural CDC shape
    // where updates target a key band). Returns the table's file count.
    "rowlevel_build" -> ((s, dir) => {
      val t = rowLevelTable(s, dir)
      s.sql(s"DROP TABLE IF EXISTS gscale.db.$t")
      s.sql(s"""CREATE TABLE gscale.db.$t
        (doc_id BIGINT, ts TIMESTAMP, n_chars BIGINT)
        PARTITIONED BY (days(ts))
        TBLPROPERTIES ('graft.write.ordered-by'='doc_id')""")
      Tables.load(s, dir, "documents").createOrReplaceTempView("sb_docs")
      s.sql(s"""INSERT INTO gscale.db.$t
        SELECT doc_id,
               timestamp_seconds(1700000000 + (doc_id DIV 200) * 86400),
               n_chars
        FROM sb_docs""")
      graft.catalog.Snapshots
        .latest(graft.catalog.Maintenance.tableDir(s, s"gscale.db.$t"))
        .get.dataFiles.length.toLong
    }),
    // NARROW MERGE over the table rowlevel_build created: a CONSTANT
    // 100-key band (doc_id in [1000, 1100) — half of day 5 of the base
    // replica) at EVERY scale, so the returned value — files REWRITTEN
    // by the commit — must stay O(matching files) while the table's
    // file count grows with the corpus (runtime group filtering +
    // footer stats over the write-ordered layout; the
    // GraftTable.scala:~700 claim, measured). The ratio line's
    // scaled_rows/base_rows IS the amplification factor.
    "rowlevel_merge" -> ((s, dir) => {
      val t = rowLevelTable(s, dir)
      val tdir = graft.catalog.Maintenance.tableDir(s, s"gscale.db.$t")
      val before = graft.catalog.Snapshots.latest(tdir).get.dataFiles.toSet
      Tables.load(s, dir, "documents").createOrReplaceTempView("sb_docs")
      s.sql(s"""MERGE INTO gscale.db.$t t
        USING (
          SELECT doc_id,
                 timestamp_seconds(1700000000 + (doc_id DIV 200) * 86400)
                   AS ts,
                 n_chars + 1 AS n_chars
          FROM sb_docs WHERE doc_id >= 1000 AND doc_id < 1100) s
        ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET t.n_chars = s.n_chars""")
      val after = graft.catalog.Snapshots.latest(tdir).get.dataFiles.toSet
      (before -- after).size.toLong
    }),
    // DRIVER-SIDE FOOTER OPENS during a narrow MERGE — the planning-
    // metadata pass that used to be O(table files) and is O(matching
    // files) with the commit-time stats cache (_graft_filestats). The
    // returned value must stay a SMALL CONSTANT while the table's file
    // count grows 10× (opens come only from stripZeroRowParts on the
    // write output + the commit's own record() of rewritten files) —
    // at object-store latency this count, not the rewrite I/O, is what
    // a narrow MERGE's driver time scales with. Uses a different key
    // band than rowlevel_merge so both measure a real rewrite.
    "rowlevel_opens" -> ((s, dir) => {
      val t = rowLevelTable(s, dir)
      Tables.load(s, dir, "documents").createOrReplaceTempView("sb_docs")
      val before = graft.catalog.ParquetStats.footerOpens.get()
      s.sql(s"""MERGE INTO gscale.db.$t t
        USING (
          SELECT doc_id,
                 timestamp_seconds(1700000000 + (doc_id DIV 200) * 86400)
                   AS ts,
                 n_chars + 2 AS n_chars
          FROM sb_docs WHERE doc_id >= 3000 AND doc_id < 3100) s
        ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET t.n_chars = s.n_chars""")
      graft.catalog.ParquetStats.footerOpens.get() - before
    }),
    // banded MinHash+LSH near-dup candidate generation + exact verify
    "minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text").count()),
    // large/small-star connected components over a planted chain graph
    "cc_star" -> ((s, dir) =>
      Dedup.clusterPairsStar(chainPairs(s, dir)).count()),
    // exact Jaccard ε-join (prefix-filtered ppjoin)
    "setjoin_jaccard" -> ((s, dir) =>
      SetJoin.jaccardJoin(groupToks(s, dir), groupToks(s, dir),
        "doc_id", "toks", "doc_id", "toks", tau = 0.5).count()),
    // exact-substring dedup at char granularity (one md5 per char).
    // A plain count() would let Spark PRUNE the clean_text rebuild —
    // aggregate over it so the full span-merge + rebuild is paid.
    "substr_exact" -> ((s, dir) =>
      Dedup.exactSubstrDedup(plantedDocs(s, dir), "doc_id", "text",
          gramChars = 40)
        .agg(sum(length(col("clean_text"))), sum(col("dup_chars")))
        .collect().head.getLong(0)),
    // the winnowed gram-selection tier (~1/w of the grams)
    "substr_winnow" -> ((s, dir) =>
      Dedup.winnowSubstrDedup(plantedDocs(s, dir), "doc_id", "text",
          gramChars = 40, window = 8)
        .agg(sum(length(col("clean_text"))), sum(col("dup_chars")))
        .collect().head.getLong(0)),
    // IVF: deterministic k-means build + cell assignment of the corpus
    "ivf_build" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsFrom(e, "vec_id", "embedding", 16)
      Similarity.ivfAssign(e, "vec_id", "embedding", cents).count()
    }),
    // IVF search: 64 in-corpus queries probing 4 of 16 cells, top-10
    "ivf_search" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsFrom(e, "vec_id", "embedding", 16)
      val q = e.filter(col("vec_id") % 31 === 0).limit(64)
      Similarity.ivfTopK(q, e, "vec_id", "embedding", cents,
        nprobe = 4, k = 10).count()
    })
  )

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleBench <srcSfDir> <scaledDir> [factor] [op ...]")
    val (src, dest) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val requested =
      if (args.length > 3) args.drop(3).toSeq else ops.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    genCorpus(spark, src, dest, factor)

    def timed(f: => Long): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    requested.foreach { name =>
      val f = ops.getOrElse(name,
        sys.error(s"unknown op $name; have ${ops.keys.toSeq.sorted}"))
      f(spark, src) // warm BOTH corpora (JIT, codegen, footers, listing)
      f(spark, dest)
      val (baseSec, baseRows) = timed(f(spark, src))
      val (scaledSec, scaledRows) = timed(f(spark, dest))
      println(f"""{"op":"$name","factor":$factor,"base_sec":$baseSec%.3f,""" +
        f""""scaled_sec":$scaledSec%.3f,"ratio":${scaledSec / baseSec}%.2f,""" +
        f""""base_rows":$baseRows,"scaled_rows":$scaledRows}""")
    }
    spark.stop()
  }
}
