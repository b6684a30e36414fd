package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftaccess.Internals

import graft.functions.WinnowFingerprints

/** Local document fingerprinting (winnowing) and fingerprint-overlap
  * copy detection — the MOSS pipeline as Spark relational algebra.
  *
  * Scale shape: [[fingerprints]] is a pure projection (the kernel is one
  * codegen call per row — no shuffle, no state). [[overlapPairs]] explodes
  * each document into ~len/w fingerprint rows and self-joins on the
  * fingerprint — the fingerprint IS the blocking key, so the join only
  * touches documents that actually share a ≥(k+w−1)-char passage, never
  * all pairs. Both sides shuffle on `fp`; the optional ubiquitous-gram
  * guard (`maxDocFreq`) rides that same hash partitioning as a window
  * count — zero extra exchanges, same fusion trick as
  * [[Dedup.bandedCandidates]] — and drops boilerplate fingerprints that
  * appear in more than `maxDocFreq` docs (at corpus scale: license
  * headers, navigation chrome) before they can quadratically blow up a
  * bucket.
  *
  * Selectivity caveat (measured, BASELINE.md round-5 notes): blocking on
  * a SINGLE fingerprint assumes k-grams are high-entropy. On a
  * tiny-vocabulary corpus (the synthetic testdata: ~40 distinct words)
  * fingerprints go ubiquitous and the self-join degenerates toward
  * all-pairs — there `maxDocFreq` bounds the work but also the recall,
  * because true near-dups share exactly those ubiquitous fingerprints.
  * Corpus-level near-dup at scale belongs to [[Dedup.minhashLshPairs]];
  * this operator is the passage-level copy-detection tier.
  */
object Fingerprint {

  /** Winnowed fingerprint column over a text column. */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    Internals.column(WinnowFingerprints(Internals.expression(text), k, w))

  /** (id, fps) — sorted distinct winnowed fingerprints per document. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(idCol), winnow(col(textCol), k, w).as("fps"))

  /** Pairs of documents whose winnowed-fingerprint sets overlap with
    * Jaccard ≥ `minJaccard`. Output: (d1, d2, shared, m1, m2, jac),
    * d1 < d2. The Jaccard is one IEEE division of exact integers —
    * bit-identical across engines. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minJaccard: Double = 0.5,
      maxDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fps = fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fps"), size(col("fps")).as("m"))
    val e0 = fps.select(col("id"), col("m"), explode(col("fps")).as("fp"))
    // Ubiquitous-fingerprint guard on the join's own fp-partitioning.
    val e = maxDocFreq match {
      case Some(cap) =>
        e0.withColumn("__df", count(lit(1)).over(Window.partitionBy("fp")))
          .where(col("__df") <= cap).drop("__df")
      case None => e0
    }
    val a = e.select(col("id").as("d1"), col("m").as("m1"), col("fp"))
    val b = e.select(col("id").as("d2"), col("m").as("m2"), col("fp"))
    a.join(b, Seq("fp"))
      .where(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("shared"),
        // min, not first: m1/m2 are functionally determined by d1/d2,
        // but min is deterministic by construction (and what the oracle
        // computes) while first depends on task arrival order
        min(col("m1")).as("m1"), min(col("m2")).as("m2"))
      .withColumn("jac",
        col("shared").cast("double") / (col("m1") + col("m2") - col("shared")))
      .where(col("jac") >= minJaccard)
  }

  /** DuckDB CTE replaying the kernel's exact integer math (validated
    * against the kernel in FingerprintSpec; FIXTURES.md conventions).
    * Yields relation f(id, fps). */
  def oracleFpsCte(table: String, idCol: String, textCol: String,
      k: Int, w: Int): String = {
    val pw = Array.iterate(1L, k)(p => p * WinnowFingerprints.Base
      % WinnowFingerprints.Mod).reverse
    val terms = (0 until k).map(j =>
      s"CAST(unicode(substr(text, CAST(i AS INT)+$j, 1)) AS BIGINT) * ${pw(j)}")
      .mkString(" + ")
    s"""t AS (SELECT $idCol AS id, $textCol AS text,
       |  length($textCol) AS n FROM $table),
       |h AS (SELECT id,
       |  [ ($terms) % ${WinnowFingerprints.Mod} for i in range(1, n - $k + 2) ] AS hh
       |  FROM t),
       |f AS (SELECT id, list_sort(list_distinct(
       |  CASE WHEN len(hh) = 0 THEN []::BIGINT[]
       |       WHEN len(hh) <= $w THEN [list_min(hh)]
       |       ELSE [ list_min(hh[CAST(i AS INT) : CAST(i AS INT)+${w - 1}])
       |              for i in range(1, len(hh) - $w + 2) ]
       |  END)) AS fps FROM h)""".stripMargin
  }

  /** Full oracle for [[fingerprints]] on `table`. */
  def fingerprintsOracleSql(table: String, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): String =
    s"""WITH ${oracleFpsCte(table, idCol, textCol, k, w)}
       |SELECT id AS $idCol, fps FROM f ORDER BY $idCol""".stripMargin

  /** Full oracle for [[overlapPairs]] (no doc-freq guard — the guard is
    * plan-shape machinery, spec-forced in FingerprintSpec). */
  def overlapOracleSql(table: String, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minJaccard: Double = 0.5): String =
    s"""WITH ${oracleFpsCte(table, idCol, textCol, k, w)},
       |e AS (SELECT id, unnest(fps) AS fp, len(fps) AS m FROM f),
       |p AS (SELECT a.id AS d1, b.id AS d2, count(*) AS shared,
       |        min(a.m) AS m1, min(b.m) AS m2
       |      FROM e a JOIN e b ON a.fp = b.fp AND a.id < b.id
       |      GROUP BY 1, 2)
       |SELECT d1, d2, shared, m1, m2,
       |  CAST(shared AS DOUBLE)/(m1 + m2 - shared) AS jac
       |FROM p
       |WHERE CAST(shared AS DOUBLE)/(m1 + m2 - shared) >= $minJaccard
       |ORDER BY d1, d2""".stripMargin
}
