package graft.operators

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of operator-persisted intermediates.
  *
  * [[Dedup]], [[LmScore]], [[Similarity]] and [[Fingerprint]] persist
  * heavy intermediates (signature tables, tokenized corpora, candidate
  * pairs) and hand back LAZY DataFrames, so the operator cannot know when
  * the caller's last action over the result ran. The former CALLER
  * CONTRACT — "long-lived sessions must clearCache() between calls" —
  * becomes automatic when every such persist is routed through
  * [[persist]]: the block is recorded against its owning SparkSession and
  * [[release]] drops everything the session accumulated. The Engine calls
  * release from closeStatement/closeSession, so a service session's
  * storage returns to baseline when a statement closes; batch drivers
  * (Bench/Verify) keep their existing clearCache() hygiene, which
  * coexists with the registry (release skips already-unpersisted
  * entries, and [[persist]] prunes them).
  *
  * Dropping a cached block is always SAFE in Spark — a consumer that
  * still needs it recomputes from lineage — so releasing while a
  * concurrent statement of the same session is mid-read costs a
  * recompute, never correctness.
  */
object OperatorCache {

  private val reg =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()

  /** Persist `df` MEMORY_AND_DISK and track the block against its owning
    * session. Returns `df` (drop-in for `.persist(...)` via
    * `.transform(OperatorCache.persist)`). */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val q = reg.computeIfAbsent(df.sparkSession,
      _ => new ConcurrentLinkedQueue[DataFrame]())
    // prune entries something else (operator-internal unpersist,
    // clearCache) already dropped, so a never-closed batch session's
    // queue stays bounded by its LIVE blocks
    q.removeIf(d => d.storageLevel == StorageLevel.NONE)
    q.add(df)
    df
  }

  /** Tracked blocks still persisted for `session`. */
  def trackedCount(session: SparkSession): Int = {
    val q = reg.get(session)
    if (q == null) 0
    else {
      var n = 0
      q.forEach(df => if (df.storageLevel != StorageLevel.NONE) n += 1)
      n
    }
  }

  /** Unpersist every tracked block of `session` (blocking, so executor
    * storage is back to baseline when this returns). Already-unpersisted
    * entries are skipped; returns the number of blocks dropped. */
  def release(session: SparkSession): Int = {
    val q = reg.remove(session)
    if (q == null) 0
    else {
      var n = 0
      q.forEach { df =>
        if (df.storageLevel != StorageLevel.NONE) {
          df.unpersist(blocking = true)
          n += 1
        }
      }
      n
    }
  }
}
