package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass, all-columns data-profile sketch — the scale tier of
  * [[graft.operators.Stats.profile]] (DuckDB `SUMMARIZE`-class
  * capability; the reference surfaces per-column stats through
  * DataFusion's aggregate library, lib.rs:678).
  *
  * Motivation (measured at sf0.1, BASELINE.md round 7): the width-split
  * profile plans TWO scans of the table and 4 aggregate functions PER
  * COLUMN; with HLL present the per-row update path runs outside
  * whole-stage codegen, so every row pays ~44 function updates plus two
  * ColumnarToRow materializations. This kernel computes min / max /
  * null count / HLL distinct for EVERY column in ONE
  * TypedImperativeAggregate: one scan, one ObjectHashAggregate, one
  * buffer-object update call per row with tight primitive loops inside.
  *
  * At 100 TB the shape is ideal: state is O(cols × 2^p) bytes
  * (~4 KB/col), partials combine associatively, the shuffle carries one
  * sketch per partition — same contract as any distributed HLL.
  *
  * Distinct estimator: dense HyperLogLog, p=12 (4096 registers,
  * rsd ≈ 1.6% — tighter than Spark's 5% default), with the standard
  * linear-counting small-range correction so low-cardinality columns
  * (flags, enums) come out exact. Sketches are engine-local (NOT
  * cross-engine stable) — the probe stays rows-only, the exact tier
  * remains the oracle.
  *
  * Output: `array<struct<min_value string, max_value string,
  * null_count long, n_distinct long, n_rows long>>`, one entry per
  * child in child order. Min/max render as strings (one schema fits all
  * column types); all-null columns yield (null, null, n, 0, n).
  */
case class ProfileSketch(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ProfileSketch.Buffer] {

  import ProfileSketch._

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(EntryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot(dt => kindOf(dt) >= 0)
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("profile_sketch needs >= 1 column")
    else if (bad.nonEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"profile_sketch: unsupported column types ${bad.mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val kinds: Array[Int] =
    children.map(c => kindOf(c.dataType)).toArray
  @transient private lazy val kids: Array[Expression] = children.toArray

  override def createAggregationBuffer(): Buffer = new Buffer(kids.length)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    buf.rows += 1
    var i = 0
    val n = kids.length
    while (i < n) {
      val v = kids(i).eval(input)
      if (v == null) buf.nulls(i) += 1
      else kinds(i) match {
        case KindLong => buf.updateLong(i, asLong(v))
        case KindDouble => buf.updateDouble(i,
          v match { case f: java.lang.Float => f.doubleValue; case d => d.asInstanceOf[Double] })
        case KindString => buf.updateString(i, v.asInstanceOf[UTF8String])
        case KindDecimal => buf.updateDecimal(i, v.asInstanceOf[Decimal])
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = { b1.mergeFrom(b2); b1 }

  override def eval(buf: Buffer): Any = {
    val n = kids.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val (mn, mx) =
        if (!buf.hasVal(i)) (null, null)
        else kinds(i) match {
          case KindLong =>
            (renderLong(buf.minL(i), kids(i).dataType),
              renderLong(buf.maxL(i), kids(i).dataType))
          case KindDouble =>
            (UTF8String.fromString(buf.minD(i).toString),
              UTF8String.fromString(buf.maxD(i).toString))
          case KindString => (buf.minS(i), buf.maxS(i))
          case KindDecimal =>
            // toPlainString = Spark's cast(decimal as string) rendering
            (UTF8String.fromString(buf.minDec(i).toJavaBigDecimal.toPlainString),
              UTF8String.fromString(buf.maxDec(i).toJavaBigDecimal.toPlainString))
        }
      // clamp the sketch estimate at its trivial upper bound (the
      // non-null count) so a +rsd overshoot can't exceed n_rows
      val est = math.min(buf.estimate(i), buf.rows - buf.nulls(i))
      out(i) = InternalRow(mn, mx, buf.nulls(i), est, buf.rows)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): ProfileSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ProfileSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "profile_sketch"
}

object ProfileSketch {
  val EntryType: StructType = StructType(Seq(
    StructField("min_value", StringType),
    StructField("max_value", StringType),
    StructField("null_count", LongType),
    StructField("n_distinct", LongType),
    StructField("n_rows", LongType)))

  // HLL geometry: p=12 → 4096 registers, rsd ≈ 1.04/√4096 ≈ 1.6%
  val P = 12
  val M: Int = 1 << P
  private val AlphaM2: Double = (0.7213 / (1 + 1.079 / M)) * M * M
  private val Seed = 42L

  private[functions] val KindLong = 0 // bool/byte/short/int/date/long/ts
  private[functions] val KindDouble = 1 // float/double
  private[functions] val KindString = 2
  private[functions] val KindDecimal = 3

  private[graft] def kindOf(dt: DataType): Int = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
        LongType | TimestampType | TimestampNTZType => KindLong
    case FloatType | DoubleType => KindDouble
    case StringType => KindString
    case _: DecimalType => KindDecimal
    case _ => -1
  }

  private def asLong(v: Any): Long = v match {
    case b: java.lang.Boolean => if (b) 1L else 0L
    case b: java.lang.Byte => b.longValue
    case s: java.lang.Short => s.longValue
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l
    case other => other.asInstanceOf[Long]
  }

  /** Render a long-kind min/max back in its logical type's terms. */
  private def renderLong(l: Long, dt: DataType): UTF8String = dt match {
    case BooleanType => UTF8String.fromString((l != 0).toString)
    case DateType =>
      UTF8String.fromString(java.time.LocalDate.ofEpochDay(l).toString)
    case TimestampType | TimestampNTZType =>
      // micros → "yyyy-MM-dd HH:mm:ss[.ffffff]" (NTZ/session-naive walls
      // both render the naive wall time; rows-only display semantics)
      val secs = Math.floorDiv(l, 1000000L)
      val micros = Math.floorMod(l, 1000000L).toInt
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        secs, micros * 1000, java.time.ZoneOffset.UTC)
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
        f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
        f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      val frac = if (micros == 0) ""
        else ("." + f"$micros%06d").reverse.dropWhile(_ == '0').reverse
      UTF8String.fromString(base + frac)
    case _ => UTF8String.fromString(l.toString)
  }

  /** Mutable per-partition state: for each column a typed (min, max),
    * null count, and a dense HLL register file; plus the row count. */
  final class Buffer(n: Int) {
    var rows = 0L
    val nulls = new Array[Long](n)
    val hasVal = new Array[Boolean](n)
    val minL = new Array[Long](n)
    val maxL = new Array[Long](n)
    val minD = new Array[Double](n)
    val maxD = new Array[Double](n)
    val minS = new Array[UTF8String](n)
    val maxS = new Array[UTF8String](n)
    val minDec = new Array[Decimal](n)
    val maxDec = new Array[Decimal](n)
    val regs: Array[Array[Byte]] = Array.fill(n)(new Array[Byte](M))

    @inline private def hll(i: Int, hash: Long): Unit = {
      val idx = (hash >>> (64 - P)).toInt
      val w = hash << P
      val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
      val r = regs(i)
      if (r(idx) < rank) r(idx) = rank.toByte
    }

    def updateLong(i: Int, l: Long): Unit = {
      if (!hasVal(i)) { hasVal(i) = true; minL(i) = l; maxL(i) = l }
      else {
        if (l < minL(i)) minL(i) = l
        if (l > maxL(i)) maxL(i) = l
      }
      hll(i, XXH64.hashLong(l, Seed))
    }

    def updateDouble(i: Int, d: Double): Unit = {
      if (!hasVal(i)) { hasVal(i) = true; minD(i) = d; maxD(i) = d }
      else {
        // SQLOrderingUtil, not '<'/'>': those are false for NaN, which
        // would pin min/max to whichever NaN arrived first per
        // partition (merge-order-dependent). Spark's ordering — NaN
        // greatest, -0.0 == 0.0 — applied deterministically.
        import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        if (SQLOrderingUtil.compareDoubles(d, minD(i)) < 0) minD(i) = d
        if (SQLOrderingUtil.compareDoubles(d, maxD(i)) > 0) maxD(i) = d
      }
      hll(i, XXH64.hashLong(java.lang.Double.doubleToLongBits(d), Seed))
    }

    def updateDecimal(i: Int, d: Decimal): Unit = {
      // row accessors hand out fresh Decimal instances — safe to retain
      if (!hasVal(i)) { hasVal(i) = true; minDec(i) = d; maxDec(i) = d }
      else {
        if (d.compare(minDec(i)) < 0) minDec(i) = d
        if (d.compare(maxDec(i)) > 0) maxDec(i) = d
      }
      // one column's values share a scale, so the unscaled long is a
      // faithful distinct key up to Decimal128's long-backed range
      val h =
        if (d.precision <= Decimal.MAX_LONG_DIGITS)
          XXH64.hashLong(d.toUnscaledLong, Seed)
        else {
          val b = d.toJavaBigDecimal.unscaledValue().toByteArray
          XXH64.hashUnsafeBytes(b,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
        }
      hll(i, h)
    }

    def updateString(i: Int, s: UTF8String): Unit = {
      // UTF8Strings off an UnsafeRow alias task-reused memory — clone
      // before retaining (same contract as StringMinMax)
      if (!hasVal(i)) { hasVal(i) = true; minS(i) = s.clone(); maxS(i) = s.clone() }
      else {
        if (s.compareTo(minS(i)) < 0) minS(i) = s.clone()
        if (s.compareTo(maxS(i)) > 0) maxS(i) = s.clone()
      }
      hll(i, XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, Seed))
    }

    def mergeFrom(o: Buffer): Unit = {
      rows += o.rows
      var i = 0
      while (i < nulls.length) {
        nulls(i) += o.nulls(i)
        if (o.hasVal(i)) {
          if (!hasVal(i)) {
            hasVal(i) = true
            minL(i) = o.minL(i); maxL(i) = o.maxL(i)
            minD(i) = o.minD(i); maxD(i) = o.maxD(i)
            minS(i) = o.minS(i); maxS(i) = o.maxS(i)
            minDec(i) = o.minDec(i); maxDec(i) = o.maxDec(i)
          } else {
            if (o.minL(i) < minL(i)) minL(i) = o.minL(i)
            if (o.maxL(i) > maxL(i)) maxL(i) = o.maxL(i)
            // NaN-ordered like updateDouble (Spark: NaN greatest)
            if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
              .compareDoubles(o.minD(i), minD(i)) < 0) minD(i) = o.minD(i)
            if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
              .compareDoubles(o.maxD(i), maxD(i)) > 0) maxD(i) = o.maxD(i)
            if (o.minS(i) != null &&
              (minS(i) == null || o.minS(i).compareTo(minS(i)) < 0))
              minS(i) = o.minS(i)
            if (o.maxS(i) != null &&
              (maxS(i) == null || o.maxS(i).compareTo(maxS(i)) > 0))
              maxS(i) = o.maxS(i)
            if (o.minDec(i) != null &&
              (minDec(i) == null || o.minDec(i).compare(minDec(i)) < 0))
              minDec(i) = o.minDec(i)
            if (o.maxDec(i) != null &&
              (maxDec(i) == null || o.maxDec(i).compare(maxDec(i)) > 0))
              maxDec(i) = o.maxDec(i)
          }
        }
        val a = regs(i)
        val b = o.regs(i)
        var j = 0
        while (j < M) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
        i += 1
      }
    }

    /** Bias-corrected HLL estimate with linear-counting small-range
      * correction (exact-ish for low-cardinality columns). */
    def estimate(i: Int): Long = {
      val r = regs(i)
      var sum = 0.0
      var zeros = 0
      var j = 0
      while (j < M) {
        sum += java.lang.Double.longBitsToDouble((1023L - r(j)) << 52) // 2^-r
        if (r(j) == 0) zeros += 1
        j += 1
      }
      val raw = AlphaM2 / sum
      val e = if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
        else raw
      math.rint(e).toLong
    }

    def toBytes: Array[Byte] = {
      val n = nulls.length
      // per col: hasVal(1) + nulls(8) + minL/maxL(16) + minD/maxD(16)
      // + four length prefixes(32) + registers(M)
      var size = 4 + 8 + n * (1 + 8 + 16 + 16 + 32 + M)
      val sBytes = new Array[Array[Byte]](4 * n)
      def decBytes(d: Decimal): Array[Byte] =
        if (d == null) null
        else d.toJavaBigDecimal.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < n) {
        sBytes(4 * i) = if (minS(i) == null) null else minS(i).getBytes
        sBytes(4 * i + 1) = if (maxS(i) == null) null else maxS(i).getBytes
        sBytes(4 * i + 2) = decBytes(minDec(i))
        sBytes(4 * i + 3) = decBytes(maxDec(i))
        var j = 0
        while (j < 4) {
          if (sBytes(4 * i + j) != null) size += sBytes(4 * i + j).length
          j += 1
        }
        i += 1
      }
      val bb = ByteBuffer.allocate(size)
      bb.putInt(n)
      bb.putLong(rows)
      i = 0
      while (i < n) {
        bb.put(if (hasVal(i)) 1.toByte else 0.toByte)
        bb.putLong(nulls(i))
        bb.putLong(minL(i)); bb.putLong(maxL(i))
        bb.putDouble(minD(i)); bb.putDouble(maxD(i))
        def putS(a: Array[Byte]): Unit = {
          bb.putLong(if (a == null) -1L else a.length.toLong)
          if (a != null) bb.put(a)
        }
        putS(sBytes(4 * i)); putS(sBytes(4 * i + 1))
        putS(sBytes(4 * i + 2)); putS(sBytes(4 * i + 3))
        bb.put(regs(i))
        i += 1
      }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new Buffer(n)
      buf.rows = bb.getLong
      var i = 0
      while (i < n) {
        buf.hasVal(i) = bb.get() == 1
        buf.nulls(i) = bb.getLong
        buf.minL(i) = bb.getLong; buf.maxL(i) = bb.getLong
        buf.minD(i) = bb.getDouble; buf.maxD(i) = bb.getDouble
        def getB(): Array[Byte] = {
          val len = bb.getLong.toInt
          if (len < 0) null
          else { val a = new Array[Byte](len); bb.get(a); a }
        }
        def dec(a: Array[Byte]): Decimal =
          if (a == null) null
          else Decimal(new java.math.BigDecimal(
            new String(a, java.nio.charset.StandardCharsets.UTF_8)))
        buf.minS(i) = Option(getB()).map(UTF8String.fromBytes).orNull
        buf.maxS(i) = Option(getB()).map(UTF8String.fromBytes).orNull
        buf.minDec(i) = dec(getB()); buf.maxDec(i) = dec(getB())
        bb.get(buf.regs(i))
        i += 1
      }
      buf
    }
  }
}
