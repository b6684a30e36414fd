package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame operators (connected
  * components, BPE training rounds, PageRank): any loop that re-references
  * its own output grows the LOGICAL plan exponentially — persist/cache
  * materializes data, not lineage, and the driver OOMs building AQE's
  * plan strings at depth ≳10. Eager checkpointing does both: the round's
  * result is materialized AND its plan is cut to a leaf.
  *
  * Durability is a deployment choice, not a code path:
  *
  *  - `graft.checkpoint.dir` UNSET (default): `localCheckpoint` — blocks
  *    live in executor storage. Right for single-JVM runs; on a real
  *    cluster an executor loss mid-loop kills the job (local blocks are
  *    not recoverable), restarting an hours-long CC job from zero.
  *  - `graft.checkpoint.dir` SET: reliable `checkpoint()` into that
  *    directory (HDFS/object store on a cluster) — each round's state
  *    survives executor loss, so a 1000-executor job resumes the loop's
  *    lineage from files instead of dying. The extra cost is one
  *    write+read of the (small, fixed-width) iteration state per round,
  *    never of the corpus.
  *
  * Both modes return bit-identical results — the knob changes WHERE the
  * materialized bytes live, nothing about the computation (OperatorsSpec
  * pins label equality across modes).
  */
object Checkpoints {

  val DirKey = "graft.checkpoint.dir"

  /** Eagerly materialize `df` and truncate its lineage to a leaf plan;
    * reliable when [[DirKey]] is set, executor-local otherwise. */
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir appends a per-SparkContext UUID subdir; set it
        // once (first caller wins) so every round shares one directory.
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Best-effort reclamation of a SUPERSEDED [[truncate]] result's
    * reliable checkpoint files. Spark only deletes reliable checkpoints
    * via the ContextCleaner when spark.cleaner.referenceTracking
    * .cleanCheckpoints is enabled — a conf that must be set before the
    * SparkContext starts, so an iterative operator cannot rely on it;
    * without reclamation an hours-long loop writes one full copy of its
    * state per round until the checkpoint volume fills (round-13
    * review). Call ONLY once every consumer of the superseded round's
    * data has materialized (the loops call it after the convergence
    * check). No-op for local checkpoints (executor blocks are
    * ContextCleaner-reclaimed regardless of that conf).
    *
    * FINAL-cut lifetime (ADVICE r13): an iterative operator's RETURNED
    * plan still reads its last truncate's files, so the loops
    * (PageRank, the CC family, BPE training) deliberately leave ONE
    * iteration-state copy per job in `graft.checkpoint.dir`. Callers
    * that run many jobs against one long-lived directory own the
    * reclamation: persist or write the final result, then call
    * [[discard]] on the returned frame (it is a [[truncate]] root, so
    * discard resolves its files) — or sweep the directory between jobs.
    * Spark cannot do it for them: the files must outlive the job for
    * exactly as long as the caller keeps composing on the lazy plan. */
  def discard(df: DataFrame): Unit =
    try {
      // ROOT-only: a [[truncate]] result's plan IS a LogicalRDD leaf. A
      // LAZY frame (e.g. the not-yet-materialized first round of a loop)
      // must be a no-op — collecting the first LogicalRDD anywhere in
      // its lineage would find an UPSTREAM checkpoint the CALLER owns
      // (the round-13 second review: BpeTrain discarding its still-lazy
      // initial state would have deleted a checkpoint-backed INPUT's
      // files out from under the caller).
      val rdd = df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
        case _ => None
      }
      rdd.flatMap(_.getCheckpointFile).foreach { file =>
        val p = new org.apache.hadoop.fs.Path(file)
        p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    } catch { case _: Exception => () } // reclamation must never fail a job
}
