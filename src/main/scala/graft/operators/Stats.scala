package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics beyond Spark's builtin aggregates.
  * [[exactWeightedPercentile]] covers DataFusion's
  * `approx_percentile_cont_with_weight` (SURVEY §2.9 ⚠) with exact
  * semantics: the smallest value whose cumulative weight reaches
  * p × total. One window pass per group — no driver collection, scales
  * with the group-by shuffle. */
object Stats {

  /** Data profile: per column, min / max (rendered as strings so one
    * result schema fits every column type), null count, distinct count,
    * and the table row count — DuckDB's SUMMARIZE for an arbitrary
    * DataFrame. A `stack` unpivots the 1×(4n+1) aggregate row to n rows.
    *
    * `exactDistinct = false` (the scale default) uses HLL
    * approx_count_distinct; `true` uses exact multi-DISTINCT (Spark
    * plans one Expand — still a single scan, n× the aggregate input),
    * which cross-engine probes need because HLL sketches differ between
    * engines.
    *
    * Plan shape: ONE mixed aggregate would carry the string columns'
    * min/max in a variable-width buffer, forcing a SortAggregate whose
    * per-row updates skip whole-stage codegen for EVERY column — at
    * scale the interpreted update dominates. So the profile splits into
    * two global aggregates joined by a 1-row × 1-row broadcast cross
    * join:
    *   - fixed-width columns (numeric / date / timestamp / boolean):
    *     codegen HashAggregate;
    *   - var-width columns: min/max via the custom
    *     [[graft.functions.StringMinMax]] TypedImperativeAggregate, so
    *     the branch plans as an ObjectHashAggregate (compiled
    *     UTF8String.compareTo updates) instead of an interpreted
    *     SortAggregate, and HLL sketches compose in the same operator.
    * Parquet column pruning makes the two scans read DISJOINT column
    * sets, so total I/O stays one pass over the table; each branch's
    * shuffle carries a single aggregation buffer per partition. */
  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftaccess.Internals
    import org.apache.spark.sql.types.{StringType, DataType => SqlType}
    val fields = df.schema.fields.toSeq
    // Approx tier, all column types sketchable → the ONE-PASS kernel:
    // a single ProfileSketch aggregate computes min/max/nulls/HLL for
    // every column in one scan + one ObjectHashAggregate (one update
    // call per row), instead of two scans × 4 functions per column.
    // Measured 1.15s → sub-second on the 11-column lineitem profile at
    // sf0.1 (BASELINE.md round 7). Falls through to the width-split
    // plan for exact distincts (multi-DISTINCT Expand) or exotic types.
    if (!exactDistinct && fields.forall(f =>
        graft.functions.ProfileSketch.kindOf(f.dataType) >= 0)) {
      val sketch = Internals.column(
        graft.functions.ProfileSketch(
          fields.map(f => Internals.expression(col(f.name))))
          .toAggregateExpression()).as("__prof")
      val names = array(fields.map(f => lit(f.name)): _*)
      return df.agg(sketch)
        .select(posexplode(col("__prof")).as(Seq("__pos", "__e")))
        .select(element_at(names, col("__pos") + 1).as("column_name"),
          col("__e.min_value"), col("__e.max_value"),
          col("__e.null_count"), col("__e.n_distinct"), col("__e.n_rows"))
    }
    def isFixedWidth(dt: SqlType): Boolean = dt match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.DateType => true
      case org.apache.spark.sql.types.TimestampType => true
      case org.apache.spark.sql.types.TimestampNTZType => true
      case org.apache.spark.sql.types.BooleanType => true
      case _ => false
    }
    def distinctOf(c: Column): Column =
      if (exactDistinct) count_distinct(c) else approx_count_distinct(c)
    val (fixed, varw) = fields.partition(f => isFixedWidth(f.dataType))
    val branches = Seq(
      Option.when(fixed.nonEmpty) {
        val a = fixed.flatMap { f =>
          val c = col(f.name)
          Seq(min(c).cast("string").as(s"${f.name}__min"),
            max(c).cast("string").as(s"${f.name}__max"),
            (count(lit(1)) - count(c)).as(s"${f.name}__nulls"),
            distinctOf(c).as(s"${f.name}__distinct"))
        } :+ count(lit(1)).as("__n")
        df.select(fixed.map(f => col(f.name)): _*).agg(a.head, a.tail: _*)
      },
      Option.when(varw.nonEmpty) {
        val a = varw.flatMap { f =>
          val c = col(f.name)
          val mm = f.dataType match {
            case StringType => Seq(Internals.column(
              graft.functions.StringMinMax(Internals.expression(c))
                .toAggregateExpression()).as(s"${f.name}__mm"))
            // non-string var-width (binary, array, …): builtin min/max —
            // rare in a profile target, accepted SortAggregate
            case _ => Seq(min(c).cast("string").as(s"${f.name}__min"),
              max(c).cast("string").as(s"${f.name}__max"))
          }
          mm ++ Seq((count(lit(1)) - count(c)).as(s"${f.name}__nulls"),
            distinctOf(c).as(s"${f.name}__distinct"))
        } :+ count(lit(1)).as(if (fixed.nonEmpty) "__n_vw" else "__n")
        df.select(varw.map(f => col(f.name)): _*).agg(a.head, a.tail: _*)
      }).flatten
    val joined = branches.reduce((l, r) => l.crossJoin(broadcast(r)))
    val entries = fields.map { f =>
      val q = f.name.replace("`", "``")
      val (mnRef, mxRef) =
        if (!isFixedWidth(f.dataType) && f.dataType == StringType)
          (s"`${q}__mm`.mn", s"`${q}__mm`.mx")
        else (s"`${q}__min`", s"`${q}__max`")
      s"'${f.name.replace("'", "''")}', $mnRef, $mxRef, " +
        s"`${q}__nulls`, `${q}__distinct`, `__n`"
    }
    joined.selectExpr(
      s"stack(${fields.size}, ${entries.mkString(", ")}) AS " +
        "(column_name, min_value, max_value, null_count, n_distinct, n_rows)")
  }

  /** Equi-width histogram over a numeric column: `bins` equal-width
    * buckets between the column's min and max, degenerate single-bucket
    * when min == max. TWO scans (the min/max aggregate, then the bin
    * count), no driver collection — the 2-value min/max row rides back
    * in as a broadcast cross join, so the whole thing is one plan and
    * the second scan's projection is codegen'd arithmetic. Bucket math
    * uses only same-operand IEEE ops (one subtraction, one division,
    * one multiply per bound), which reproduce bit-identically across
    * engines (FIXTURES.md recipes). */
  /** Join/aggregation KEY SKEW profile — the pre-flight a 100 TB
    * shuffle needs: the top-K heaviest keys with exact counts, their
    * corpus share (parts-per-million, integer DIV — exact), and the
    * SALT FACTOR a skew mitigation should split each key into,
    * ceil(cnt · partitions / total) = the number of average-partition
    * units the key occupies. One map-side-combined count aggregate
    * (the distinct-key table, not the corpus, feeds everything else);
    * keys are cast to string so the report is type-uniform. */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int,
      partitions: Int): DataFrame = {
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    // top-K via TakeOrdered (distributed heap — never a global window
    // over the key table, which can be huge); the rank window then runs
    // on ≤ topK rows
    val byWeight = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key"))
    counts
      .orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(byWeight))
      // the ppm/salt multiplies are widened to DECIMAL(38,0) BEFORE the
      // multiply: at the 100 TB scale this targets, per-key counts past
      // ~9.2e12 would overflow BIGINT·1e6 (ANSI throws, non-ANSI wraps
      // silently — ADVICE r12); the quotients are tiny, so the final
      // BIGINT cast is always safe
      .select(col("rank"), col("key"), col("cnt"),
        expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)")
          .as("share_ppm"),
        saltFactorExpr("cnt", "total", partitions).as("salt"))
  }

  /** ceil(cnt · partitions / total) with the DECIMAL(38,0) widening —
    * the ONE copy of the salt-factor arithmetic, shared by
    * [[skewProfile]]'s report and [[SkewJoin.saltedJoinAuto]]'s typed-key
    * factor table so the probe-matched profile and the join's actual
    * factors can never drift (round-13 second review). */
  private[operators] def saltFactorExpr(cntCol: String, totalCol: String,
      partitions: Int): Column =
    expr(s"CAST((CAST($cntCol AS DECIMAL(38,0)) * $partitions + " +
      s"$totalCol - 1) DIV $totalCol AS BIGINT)")

  /** DuckDB replay of [[skewProfile]] — same integer DIV arithmetic,
    * HUGEINT-widened like the DECIMAL(38,0) engine side. */
  def skewProfileOracleSql(table: String, keyExpr: String, topK: Int,
      partitions: Int): String =
    s"""WITH c AS (SELECT CAST($keyExpr AS VARCHAR) AS key,
       |    CAST(count(*) AS BIGINT) AS cnt FROM $table GROUP BY 1),
       |t AS (SELECT *, CAST(sum(cnt) OVER () AS BIGINT) AS total FROM c),
       |r AS (SELECT key, cnt, total,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INT) AS rank
       |  FROM t)
       |SELECT rank, key, cnt,
       |  CAST(CAST(cnt AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm,
       |  CAST((CAST(cnt AS HUGEINT) * $partitions + total - 1) // total
       |    AS BIGINT) AS salt
       |FROM r WHERE rank <= $topK ORDER BY rank""".stripMargin

  def histogramWidth(df: DataFrame, valueCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("__mn"), max(v).as("__mx"))
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val bin = when(col("__mx") === col("__mn"), lit(0L))
      .otherwise(least(floor((v - col("__mn")) / width), lit(bins - 1L)))
    df.join(broadcast(mm))
      .select(bin.as("bin"), col("__mn"), col("__mx"))
      .groupBy("bin", "__mn", "__mx").agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("__mn") + col("bin") * ((col("__mx") - col("__mn")) /
          lit(bins.toDouble))).as("bin_lo"),
        (col("__mn") + (col("bin") + 1) * ((col("__mx") - col("__mn")) /
          lit(bins.toDouble))).as("bin_hi"),
        col("n"))
  }

  /** Equi-depth histogram: `bins` buckets of (near-)equal row count via
    * ntile over the value order. `tieBreak` must make the order total or
    * boundary rows land nondeterministically. One shuffle + sort. */
  def histogramDepth(df: DataFrame, valueCol: String, bins: Int,
      tieBreak: Seq[String]): DataFrame = {
    val ord = (col(valueCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.orderBy(ord: _*)
    df.select(col(valueCol).cast("double").as("__v"),
        ntile(bins).over(w).as("bin"))
      .groupBy("bin")
      .agg(min(col("__v")).as("bin_lo"), max(col("__v")).as("bin_hi"),
        count(lit(1)).as("n"))
  }

  /** Scale-path equi-depth histogram: bucket boundaries from ONE
    * approx_percentile pass (no global sort — exact ntile semantics
    * need one, which caps [[histogramDepth]] at single-node sortable
    * sizes), then a projection pass bins rows against the broadcast
    * boundary array. Bucket populations are approximately equal (sketch
    * accuracy); boundaries are actual data values. The per-row boundary
    * scan is a `filter`+`size` HOF over `bins` elements — interpreted,
    * but O(bins) per row with no join. */
  def histogramDepthApprox(df: DataFrame, valueCol: String, bins: Int,
      accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = col(valueCol).cast("double")
    val ps = array((1 until bins).map(i => lit(i.toDouble / bins)): _*)
    val bounds = df.agg(
      percentile_approx(v, ps, lit(accuracy)).as("__bounds"))
    df.join(broadcast(bounds))
      .select(v.as("__v"),
        size(filter(col("__bounds"), b => b < v)).cast("long").as("bin"))
      .groupBy("bin")
      .agg(min(col("__v")).as("bin_lo"), max(col("__v")).as("bin_hi"),
        count(lit(1)).as("n"))
  }

  /** Per-group exact weighted percentile. `tieBreak` columns make the
    * cumulative order (and hence the result) deterministic when values
    * repeat. */
  def exactWeightedPercentile(
      df: DataFrame, groupCol: String, valueCol: String, weightCol: String,
      p: Double, tieBreak: Seq[String]): DataFrame = {
    val order = (col(valueCol) +: tieBreak.map(col)).map(_.asc)
    val cum = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valueCol),
        sum(col(weightCol)).over(cum).as("__cw"),
        sum(col(weightCol)).over(total).as("__tw"))
      .filter(col("__cw") >= lit(p) * col("__tw"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as(s"wp"))
  }

  /** Per-group robust outlier detection: flag rows whose absolute
    * deviation from the group MEDIAN exceeds `c` × the group's median
    * absolute deviation (Hampel's MAD rule — the robust z-score every
    * metrics/telemetry curation pass reaches for, immune to the very
    * outliers a mean/stddev rule would absorb; beyond-ref extension —
    * DataFusion 40 via lib.rs:678 ships median but no robust-outlier
    * surface).
    *
    * EXACTNESS: the caller hands an INTEGER value column (quantize a
    * double upstream: `floor(x·10^k)` is one exact-rounded multiply +
    * floor, bit-identical cross-engine). Medians of integers
    * interpolate to exact halves and MADs to exact quarters — all
    * representable doubles — so `dev > c·mad` compares bit-identical
    * values in both engines and the FLAG (which picks rows) can never
    * drift, unlike a float median on raw doubles (ULP-safe for VALUES,
    * unsafe for selections — the FIXTURES recipe).
    *
    * Scale shape: two grouped aggregates (the med pass, then the MAD
    * pass over deviations) + two broadcast joins of group-sized stats
    * back to the stream; the value rows shuffle on the group key twice
    * and are never collected. Output: every input row + `med`, `mad`,
    * `dev`, `is_outlier`. */
  def robustOutliers(df: DataFrame, groupCols: Seq[String],
      valueCol: String, c: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "robustOutliers needs grouping columns")
    val g = groupCols.map(col)
    val med = df.groupBy(g: _*)
      .agg(median(col(valueCol)).as("med"))
    // persisted: withMed feeds BOTH the MAD aggregate and the output
    // join — without the cache the scan + median pass would execute
    // twice per action
    val withMed = df.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col(valueCol).cast("double") - col("med")))
      .transform(OperatorCache.persist)
    val mad = withMed.groupBy(g: _*)
      .agg(median(col("dev")).as("mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn("is_outlier", col("dev") > lit(c) * col("mad"))
  }
}
