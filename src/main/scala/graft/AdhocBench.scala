package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc standalone timings for operators that are too heavy for the
  * per-round bench suite (which runs 3 passes of every query) but whose
  * at-scale cost still needs a measured line in BASELINE.md — e.g. a
  * merges=64 BPE training run. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.AdhocBench bpe_train64
  *
  * Prints one JSON line per requested op: {"op":..., "sec":..., "rows":...}.
  * Same session config as [[Bench]] so numbers are comparable.
  */
object AdhocBench {

  private val ops: Map[String, (SparkSession, String) => Long] = Map(
    // the bounded-merge-chain trainer at a real-ish vocab depth — 8
    // materialize segments of 8 merges each (plan depth never exceeds
    // one segment); returns the learned merge count
    "bpe_train64" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.train(docs, "text", 64).count()
    }),
    "bpe_bytes_train64" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.trainBytes(docs, "text", 64).count()
    }),
    "bpe_encode64" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.encode(docs, "doc_id", "text", 64).count()
    }),
    // WordPiece-score trainer at the same depth: two aggregates + two
    // broadcast joins per round instead of BPE's one aggregate
    "wordpiece_train64" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.trainWordPiece(docs, "text", 64).count()
    }),
    // Real-ish vocab depth through the HYBRID tier (VERDICT r13 #2):
    // ONE distributed word-frequency aggregate, then 1024 driver-side
    // merge rounds — no per-round scheduler round-trips
    "bpe_train1024" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.train(docs, "text", 1024).count()
    }),
    "wordpiece_train1024" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.trainWordPiece(docs, "text", 1024).count()
    }),
    // forced-DISTRIBUTED twins (localTrainMaxWords=0): the
    // oracle-replayable tier's cost line, for the hybrid A/B
    "bpe_train64_dist" -> ((s, dir) => forceDistributed(s) {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.train(docs, "text", 64).count()
    }),
    "wordpiece_train64_dist" -> ((s, dir) => forceDistributed(s) {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.BpeTrain.trainWordPiece(docs, "text", 64).count()
    })
  )

  private def forceDistributed(s: SparkSession)(body: => Long): Long = {
    val key = graft.operators.BpeTrain.LocalTrainMaxWordsKey
    val old = s.conf.getOption(key)
    s.conf.set(key, "0")
    try body
    finally old match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val requested = if (args.isEmpty) ops.keys.toSeq.sorted else args.toSeq
    requested.foreach { name =>
      val f = ops.getOrElse(name,
        sys.error(s"unknown op $name; have ${ops.keys.toSeq.sorted}"))
      f(spark, sfDir) // warmup (JIT + footers)
      val t0 = System.nanoTime()
      val rows = f(spark, sfDir)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","sec":$sec%.3f,"rows":$rows,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
