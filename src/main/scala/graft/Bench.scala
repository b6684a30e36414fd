package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Each query is forced end-to-end through the `noop` DSv2 sink — unlike
  * `count()`, which lets Catalyst prune the whole projection, noop executes
  * the full physical plan (all expressions, joins, windows) and discards
  * rows at the sink, which is the honest analogue of the reference's
  * `df.collect()` at lib.rs:333-336 without driver materialization cost.
  * One untimed warmup amortizes JIT + parquet footer reads.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // A JVM that executes MANY distinct plans (this suite runs 40+
      // queries x 3 passes) churns Spark's generated-class cache, whose
      // DEFAULT capacity is 100 entries: once it overflows, every
      // execution Janino-recompiles evicted classes and runs them
      // cold — the round-11 diagnosis measured late-suite stages 5-10x
      // slower (q_fingerprint_overlap_banded standalone 26s vs 2.5s
      // with a right-sized cache). Size it to the workload.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // The default 4 MB file-open cost caps a 10 MB local parquet at ~3
      // splits — 3 of 32 threads busy on every scan-bound global
      // aggregate. The local files have no open latency; 256 KB lets the
      // split math hit totalSize/defaultParallelism. Irrelevant at
      // cluster scale (≥128 MB files split on maxPartitionBytes alone).
      .config("spark.sql.files.openCostInBytes", "262144")
      // The 64 MB advisory target is cluster sizing: at sf0.1 the big
      // shuffles are 10-30 MB TOTAL, so AQE coalesces every post-shuffle
      // stage to <=8 fat tasks and 24 of 32 threads idle through the
      // heaviest aggregates (q_fingerprint_overlap_banded's (d1,d2)
      // count ran on 8 tasks, 650 ms wall). 2 MB/256 KB sizes the same
      // stages at ~16-32 tasks locally; a real cluster keeps defaults.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "2m"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "256k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_BENCH_STAGES=1: per-stage WALL times to stderr — the
    // plan-metric pipelineTime is cumulative task CPU, which hides
    // serialized single-task stages and scheduling gaps.
    if (sys.env.contains("SPARK_GRAFT_BENCH_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val wall = for {
              a <- i.submissionTime; b <- i.completionTime
            } yield b - a
            System.err.println(f"[stage] id=${i.stageId}%-4d " +
              f"tasks=${i.numTasks}%-4d wall=${wall.getOrElse(-1L)}%-6d " +
              i.name.takeWhile(_ != '\n').take(90))
          }
        })

    // 1-min load BEFORE the warmup pass: the `load` field below samples
    // at END of suite, where it always reads this bench's own 32 busy
    // threads (~8-13 regardless of co-tenancy). Start load is the number
    // that actually says whether the box was quiet when the run began.
    def loadNow: String =
      try {
        val mx = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        f"${mx.getSystemLoadAverage}%.1f"
      } catch { case _: Throwable => "-1" }
    val loadStart = loadNow

    // SPARK_GRAFT_BENCH_DIAG=1: per-attempt JVM counters to stderr — the
    // round-14 inflation investigation needs to see, for ONE in-suite
    // run, whether a slow sample coincides with Janino recompilation
    // (codegen-cache eviction), GC pressure, or neither (pure CPU
    // contention). Counters are cumulative JVM-wide; the per-attempt
    // DELTA is what matters.
    val diag = sys.env.contains("SPARK_GRAFT_BENCH_DIAG")
    def gcMsNow: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def compilesNow: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount

    val qs = SparkEntry.queries
    def runOnce(name: String): Double = {
      val c0 = if (diag) compilesNow else 0L
      val g0 = if (diag) gcMsNow else 0L
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (diag) System.err.println(
        f"[diag] $name%-36s t=$t%7.3f compiles=${compilesNow - c0}%-4d " +
          f"gc_ms=${gcMsNow - g0}%-6d load=$loadNow%s")
      // Cache hygiene OUTSIDE the timer: several operators persist()
      // intermediates and hand back a lazy DataFrame, so each timed pass
      // creates fresh cached blocks that nothing ever unpersists. Over
      // 20+ queries x 3-4 passes the leaked MEMORY_AND_DISK blocks fill
      // the old gen and the spill dir — on a loaded box that turned one
      // cache-heavy query into 30s of GC churn + a task death (round-3
      // driver bench). Each pass still builds its own cache inside the
      // timed region, so timings stay comparable.
      spark.catalog.clearCache()
      // Driver GC pacing, also OUTSIDE the timer: broadcast blocks and
      // shuffle state are reclaimed by ContextCleaner only after their
      // weak references are GC'd on the DRIVER, and Spark's own safety
      // net (spark.cleaner.periodicGC.interval) fires every 30 MINUTES —
      // longer than this whole bench. A query whose operator loop
      // broadcasts per iteration (classifier training) plus ~40 other
      // queries x 3 passes accumulates enough dead broadcast/shuffle
      // blocks to squeeze executor memory, and late-suite stages ran
      // 5-10x slow (round-11 diagnosis: q_fingerprint_overlap_banded
      // standalone 26s after the full suite vs 2.7s without the
      // classifier in the set). An explicit collection per query keeps
      // the cleaner's queue drained; a real cluster driver does the same
      // pacing via its idle GCs, which this single-JVM loop never gets.
      System.gc()
      t
    }

    // SPARK_GRAFT_BENCH_QUERIES=a,b,c narrows the set (diagnosis runs);
    // SPARK_GRAFT_BENCH_EXPLAIN=1 prints the formatted plan per query;
    // SPARK_GRAFT_BENCH_ANALYZE=1 executes once per query and prints the
    // plan tree with runtime SQLMetric values (EXPLAIN ANALYZE) to stderr.
    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSeq.filter(qs.contains))
      .getOrElse(SparkEntry.benchNames.filter(qs.contains))
    if (sys.env.contains("SPARK_GRAFT_BENCH_EXPLAIN"))
      names.foreach { n =>
        System.err.println(s"===== $n ====="); qs(n)(spark, sfDir).explain("formatted")
      }
    if (sys.env.contains("SPARK_GRAFT_BENCH_ANALYZE"))
      names.foreach { n =>
        System.err.println(s"===== $n (analyzed) =====")
        org.apache.spark.sql.graftaccess.Internals
          .explainAnalyze(qs(n)(spark, sfDir))
          .foreach(System.err.println)
      }
    def attempt(n: String): Double =
      try runOnce(n) catch { case _: Throwable => Double.PositiveInfinity }

    names.foreach(attempt) // warmup
    // Steady-state timing: min over two WHOLE passes (pass 2 runs after
    // every query's pass 1, so a multi-second co-tenant spike can't hit
    // both samples of the same query), plus an adaptive third attempt
    // when the two samples disagree by >40% — that disagreement IS the
    // signature of external noise, and one more sample usually lands in
    // steady state. A single timed pass was hostage to JIT recompilation
    // and co-tenant CPU (round-1 driver run measured 7x local steady
    // state; round-2 paid a task-retry stack under the same gate).
    val p1 = names.map(n => n -> attempt(n)).toMap
    val p2 = names.map(n => n -> attempt(n)).toMap
    val results = names.map { n =>
      val best = math.min(p1(n), p2(n))
      val spread = math.abs(p1(n) - p2(n))
      val v =
        if (!best.isFinite) attempt(n) // both passes failed: one retry
        else if (spread > 0.4 * best && best > 0.15) math.min(best, attempt(n))
        else best
      n -> (if (v.isFinite) v else -1.0)
    }

    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Self-adjudication fields (VERDICT r7 #7 — the q_tpch_q18 "2.03×"
    // scare was pure co-tenancy): per-query relative spread between the
    // two whole passes, plus the box's 1-min load. A query whose spread
    // is large under high load is a noisy sample, not a regression —
    // the reported best-of-passes is the steady-state number; the
    // spread says how much the suite wall-clock overstates it.
    val sjson = names.map { n =>
      val best = math.min(p1(n), p2(n))
      val rel =
        if (!best.isFinite || best <= 0) -1.0
        else math.abs(p1(n) - p2(n)) / best
      "\"" + n + "\":" + f"$rel%.2f"
    }.mkString("{", ",", "}")
    val load = loadNow
    // Standalone re-measure of the heaviest queries (VERDICT r8 #8):
    // suite numbers interleave 40 queries, so a heavy query's sample can
    // land on a co-tenant spike or another query's cache/GC tail and
    // read as a regression (the r7 q_tpch_q18 "2.03×" and r8
    // q_dedup_minhash scares were exactly this). After the suite, the
    // top-K by best-of-passes run again BACK-TO-BACK (nothing else in
    // flight, same JVM, warm JIT): min of two isolated passes is the
    // steady-state number an adjudicator would otherwise have to
    // re-measure by hand. SPARK_GRAFT_BENCH_STANDALONE overrides K
    // (0 disables).
    val standaloneK =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STANDALONE", "5").toInt
    // Quiet-box BAND per query (VERDICT r14 #1, generalizing the r14
    // two-query watchlist): each value is the recorded quiet best
    // (min over the r14 closing quiet line, the round-15 opening
    // anchor, and the round-15 CLOSING quiet line at load_start 0.4 —
    // provenance in BASELINE.md "Round 15 (closing)"). ANY query whose in-suite best-of-passes exceeds
    // 1.5x its band is FORCED into the same-run standalone
    // re-measure, so every driver line self-adjudicates: an inflated
    // in-suite sample (the r14-diagnosed disk-I/O co-tenant shape)
    // ships with its steady-state number in the same JSON instead of
    // needing a by-hand re-measure. Queries without a band (new this
    // round) are only covered by the top-K set until their first
    // quiet anchor. Bands are adjudication thresholds, not goals —
    // update them only from quiet (load_start < 1.5) runs.
    // Bands live in a committed JSON the bench itself refreshes
    // (VERDICT r15 #6): a new quiet record tightens its band with no
    // code edit, and the quiet line survives driver BENCH_LOCAL
    // clobbering inside the bands file.
    val bandsPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_BANDS", "tools/bench_bands.json")
    val bands: Map[String, Double] = Bench.loadBands(bandsPath)
    // A renamed query must SURFACE, not silently lose its band
    // (ADVICE r14): warn loudly on band keys that no longer exist.
    val unknownBands = bands.keySet.diff(qs.keySet)
    if (unknownBands.nonEmpty) System.err.println(
      s"[bench] WARNING: band entries for unknown queries " +
        s"${unknownBands.toSeq.sorted.mkString(", ")} — renamed in " +
        "SparkEntry.queries? Their standalone forcing is disabled.")
    // standaloneK = 0 still means "no standalone re-measures at all" —
    // the band forcing widens the default set, it must not override an
    // explicit disable
    val forced =
      if (standaloneK <= 0) Seq.empty
      else results
        .filter { case (n, v) => bands.get(n).exists(b => v > 1.5 * b) }
        .map(_._1)
    val heaviest = (results.filter(_._2 >= 0).sortBy(-_._2)
      .take(math.max(0, standaloneK)).map(_._1) ++ forced).distinct
    val standaloneVals: Seq[(String, Double)] = heaviest.map { n =>
      n -> math.min(attempt(n), attempt(n))
    }
    val stjson = standaloneVals.map { case (n, v) =>
      "\"" + n + "\":" + (if (v.isFinite) v else -1.0)
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"spread":$sjson,"standalone":$stjson,"load":$load,"load_start":$loadStart,"sf":"$sfDir"}"""
    // STDOUT gets a line that FITS THE DRIVER'S 2000-CHAR TAIL CAPTURE
    // (VERDICT r16 #7: the full line with spread + standalone outgrew
    // it in r15 AND r16 — its head was cut off mid-JSON and the
    // driver's parse failed, leaving "parsed": null): per-query values
    // at 3 decimals (1 ms — below bench noise), NO spread/standalone
    // maps. The FULL line (full precision + the self-adjudication
    // attachments) lands in BENCH_LOCAL.json (driver-clobbered
    // post-commit) AND tools/bench_attach.json (atomic write, survives
    // the clobber — the standalone/spread evidence an adjudicator
    // reads next to BENCH_r{N}.json).
    // Locale.ROOT: the f interpolator uses the JVM default locale — a
    // comma-decimal locale would emit {"value":30,458} (invalid JSON)
    // and re-break the parse this line exists to fix
    def dec3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qjsonOut = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v >= 0) dec3(v) else "-1") }
      .mkString("{", ",", "}")
    val stdoutLine =
      s"""{"metric":"total","value":${dec3(total)},"unit":"sec","queries":$qjsonOut,"load":$load,"load_start":$loadStart,"sf":"$sfDir"}"""
    if (stdoutLine.length > 1800) System.err.println(
      s"[bench] WARNING: stdout line ${stdoutLine.length} chars — " +
        "approaching the driver's 2000-char tail; trim precision or keys")
    println(stdoutLine)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
      line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: $e")
    }
    try {
      val attach = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_ATTACH", "tools/bench_attach.json"))
      val tmp = attach.resolveSibling(
        s".attach.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.writeString(tmp, line + "\n")
      java.nio.file.Files.move(tmp, attach,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_attach.json: $e")
    }
    // QUIET runs refresh the bands file in place (VERDICT r15 #6): the
    // per-query best-ever only ever TIGHTENS (min of old band, in-suite
    // best and same-run standalone), so a new record arms stricter
    // standalone forcing for every later run with no code edit. Loaded
    // runs never write — an inflated sample must not be recorded, and
    // a fast fluke on a loaded box is not trusted either.
    // ...and only at the CANONICAL bench scale: a quiet sf0.01
    // iteration run would otherwise tighten the sf0.1 bands to
    // unreachable values and force every standalone forever
    if (loadStart.toDoubleOption.exists(l => l >= 0 && l < 1.5) &&
        sfDir.replaceAll("/+$", "").endsWith("sf0.1"))
      Bench.refreshBands(bandsPath, results, standaloneVals)
    spark.stop()
  }

  /** Parse the committed flat-JSON bands file ({"query": seconds, ...});
    * a missing or unreadable file disables band forcing with a loud
    * stderr note rather than failing the bench. */
  def loadBands(path: String): Map[String, Double] =
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val re = """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r
      re.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch {
      case e: Exception =>
        System.err.println(
          s"[bench] no bands file at $path ($e); standalone forcing " +
            "falls back to the top-K set only")
        Map.empty
    }

  /** Tighten the bands file from a QUIET run: per query, the new band is
    * min(existing band, in-suite best, standalone re-measure). Queries
    * measured for the first time gain a band. Failed measures (< 0)
    * never write. */
  def refreshBands(path: String, results: Seq[(String, Double)],
      standalones: Seq[(String, Double)]): Unit =
    try {
      val old = loadBands(path)
      val st = standalones.filter(_._2 >= 0).toMap
      val merged = scala.collection.mutable.Map.empty[String, Double] ++ old
      results.filter(_._2 >= 0).foreach { case (n, v) =>
        val cand = math.min(v, st.getOrElse(n, v))
        merged(n) = merged.get(n).fold(cand)(b => math.min(b, cand))
      }
      val body = merged.toSeq.sortBy(_._1).map { case (n, v) =>
        "\"" + n + "\": " + BigDecimal(v).setScale(3,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      }.mkString("{\n", ",\n", "\n}\n")
      // write-to-tmp + ATOMIC_MOVE: a crash or concurrent reader
      // mid-write must never see a truncated bands file (loadBands'
      // regex would silently parse a partial band set)
      val target = java.nio.file.Paths.get(path)
      val tmp = target.resolveSibling(
        s".${target.getFileName}.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.writeString(tmp, body)
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] could not refresh bands file: $e")
    }
}
