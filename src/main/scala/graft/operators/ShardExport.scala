package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard export planning — the last step of a curation
  * pipeline: deal the corpus into `numShards` deterministic shards,
  * fix a reproducible pseudo-random READ ORDER inside each shard (the
  * "global shuffle" a training loader needs, without a global sort),
  * and emit a per-shard manifest (doc/char counts + an order-sensitive
  * content fingerprint) that a loader can integrity-check shards
  * against. (Beyond-ref extension: the reference's DataFusion surface
  * at lib.rs:678 stops at COPY TO — no sharded/manifested export.)
  *
  * Determinism: shard = first-8-hex md5(id) mod numShards and the
  * intra-shard order ranks md5(salt‖id) — the [[Sampling]] md5 recipe —
  * so the SAME rows land in the same shard at the same position on any
  * cluster size, after any repartition, and in the DuckDB oracle.
  * Different `salt` values give independent epoch orders over identical
  * shard membership.
  *
  * Scale shape: ONE shuffle total. The rank window partitions by the
  * shard key, so the window exchange IS the export shuffle; the
  * manifest is a per-shard aggregate of 32-byte per-doc hashes (shard
  * sizes are operator-chosen — docs-per-shard stays bounded by
  * construction, so the ordered fingerprint chain never sees more than
  * one shard's hashes); the physical writer reuses the same
  * partitioning, bounding open writers to O(shards/tasks) per task.
  */
object ShardExport {

  /** Plan the export: adds `shard` (0-based BIGINT) and `shard_rank`
    * (1-based BIGINT position in the shard's deterministic shuffled
    * read order) to every row. Pure projection + one shard-keyed
    * window exchange. */
  def plan(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "epoch0"): DataFrame = {
    require(numShards >= 1, "shard export needs numShards >= 1")
    val idStr = col(idCol).cast("string")
    val shard = Sampling.md5Bucket(col(idCol), numShards)
    val order = md5(concat(lit(salt), idStr))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__ord"), col(idCol))
    df.withColumn("shard", shard)
      .withColumn("__ord", order)
      .withColumn("shard_rank", row_number().over(w).cast("long"))
      .drop("__ord")
  }

  /** Per-shard manifest over a [[plan]] output: doc count, exact char
    * count of `payloadCol`, and `content_md5` — md5 over the
    * concatenation of per-doc md5(payload) in `shard_rank` order, so
    * the fingerprint pins CONTENT AND ORDER (a loader replaying the
    * shard sequentially can recompute it in one pass). */
  def manifest(planned: DataFrame, payloadCol: String): DataFrame =
    planned
      .select(col("shard"), col("shard_rank"),
        md5(col(payloadCol)).as("__h"),
        length(col(payloadCol)).cast("long").as("__len"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__len")).cast("long").as("n_chars"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("shard_rank"), col("__h")))),
            x => x.getField("__h")),
          "")).as("content_md5"))

  /** Physically write the planned shards under `outDir` as hive-layout
    * `shard=K/` parquet dirs, rows inside each file in `shard_rank`
    * order. One shuffle (hash on the shard key into `numShards` tasks);
    * the within-partition sort puts each task's shards contiguous, so
    * the dynamic-partition writer holds ONE open file at a time. */
  def writeShards(planned: DataFrame, numShards: Int, outDir: String): Unit =
    planned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_rank"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)

  /** DuckDB replay of [[plan]] + [[manifest]] over `table(idCol,
    * payloadCol)` — identical md5 shard assignment, identical salted
    * order, identical ordered fingerprint chain. */
  def oracleSql(table: String, idCol: String, payloadCol: String,
      numShards: Int, salt: String = "epoch0"): String = {
    val saltLit = salt.replace("'", "''") // match Spark's lit(salt)
    s"""WITH p AS (SELECT $idCol AS id, $payloadCol AS payload,
       |    ${Sampling.duckMd5Bucket(idCol, numShards)} AS shard,
       |    md5('$saltLit' || CAST($idCol AS VARCHAR)) AS ord
       |  FROM $table),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY ord, id) AS BIGINT) AS shard_rank FROM p)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(length(payload)) AS BIGINT) AS n_chars,
       |  md5(string_agg(md5(payload), '' ORDER BY shard_rank)) AS content_md5
       |FROM r GROUP BY shard ORDER BY shard""".stripMargin
  }
}
