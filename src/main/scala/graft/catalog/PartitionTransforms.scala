package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** HIDDEN PARTITIONING for MetaCatalog tables — Iceberg's partition
  * transforms (spec §4 "Partition Transforms"; VERDICT r15 #4):
  * `days(ts)`, `bucket(n, col)`, `truncate(w, col)` alongside plain
  * identity columns. The table partitions on a DERIVED value the user
  * never writes or sees: writes compute it and lay out hive-style dirs
  * (`ts_day=2026-01-01/`); scans prune those dirs from predicates on
  * the SOURCE column — the defining property of hidden partitioning
  * (no `WHERE ts_day = ...` ceremony, no accidentally-unpartitioned
  * queries). Time-partitioned event tables are the first thing a
  * 100 TB ingest builds; bucket transforms spread write-hot keys.
  *
  * Pruning is driver-side over the snapshot's file list (the same
  * metadata pass footer-stats pruning uses): each file's dir value is
  * parsed from its path and tested against the pushed predicates,
  * conservatively (cannot prove a miss → keep). The derived column is
  * dropped on read — it lives only in directory names.
  *
  * Bucket hashing uses Spark's own `hash()` (Murmur3, seed 42),
  * evaluated through the SAME catalyst expression on both the write
  * path and the prune path, so a literal can never hash differently
  * than the column it prunes.
  *
  * Day-boundary time zone (ADVICE r16): `days()` over a ZONED timestamp
  * needs ONE zone shared by every writer and every reader — deriving
  * with the write session's zone and pruning with the read session's
  * would make the two disagree on day boundaries and silently drop
  * files. CREATE TABLE pins the creating session's zone into table
  * properties ([[ZoneKey]]); both [[derive]] and [[prune]] use the
  * pinned zone regardless of the current session's setting. Tables
  * created before the key existed fall back to the session zone (the
  * pre-r17 behavior, correct as long as the zone never changes). */
object PartitionTransforms {

  /** Hive's null-partition directory value. */
  val NullDir = "__HIVE_DEFAULT_PARTITION__"

  /** Table property pinning the time zone `days()` uses for its day
    * boundaries (set at CREATE from the creating session). */
  val ZoneKey = "graft.partition.zone"

  sealed trait T {
    /** Source column (the one users query). */
    def source: String
    /** Directory column name (`<src>` for identity, `<src>_day` etc). */
    def dirName: String
    /** Round-trip spec string stored in table properties. */
    def spec: String
    def isIdentity: Boolean = this.isInstanceOf[Identity]
  }
  final case class Identity(source: String) extends T {
    def dirName: String = source
    def spec: String = source
  }
  final case class Days(source: String) extends T {
    def dirName: String = s"${source}_day"
    def spec: String = s"days($source)"
  }
  /** Year dirs `ts_year=2023` (r17 — completing Iceberg spec §4's time
    * transform set alongside days). */
  final case class Years(source: String) extends T {
    def dirName: String = s"${source}_year"
    def spec: String = s"years($source)"
  }
  /** Month dirs `ts_month=2023-11`. */
  final case class Months(source: String) extends T {
    def dirName: String = s"${source}_month"
    def spec: String = s"months($source)"
  }
  /** Hour dirs `ts_hour=2023-11-16-22` (timestamps only). */
  final case class Hours(source: String) extends T {
    def dirName: String = s"${source}_hour"
    def spec: String = s"hours($source)"
  }
  /** `wide` = the v2 HASH-WIDTH-STABLE derivation (r18): integral
    * sources hash as `hash(cast(k AS BIGINT))`, so an int→bigint
    * promotion of the source leaves every existing dir value valid
    * (Spark's Murmur3 hashes int and long DIFFERENTLY — under the v1
    * derivation a promotion would silently orphan every bucket dir,
    * which is why the ALTER guard rejects it there). Recorded per table
    * as the `graft.bucket.derivation=v2` property, set at CREATE for
    * new tables; pre-r18 tables keep v1 and the promotion rejection.
    * The flag is carried here (not threaded through every signature) so
    * the write derivation and the prune containment evaluate the SAME
    * expression by construction. It never appears in spec strings. */
  final case class Bucket(n: Int, source: String,
      wide: Boolean = false) extends T {
    require(n >= 1, s"bucket($n, $source): need n >= 1")
    def dirName: String = s"${source}_bucket"
    def spec: String = s"bucket($n,$source)"
  }
  final case class Trunc(w: Int, source: String) extends T {
    require(w >= 1, s"truncate($w, $source): need w >= 1")
    def dirName: String = s"${source}_trunc"
    def spec: String = s"truncate($w,$source)"
  }

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val DaysRe = """days\(\s*([^)]+?)\s*\)""".r
  private val YearsRe = """years\(\s*([^)]+?)\s*\)""".r
  private val MonthsRe = """months\(\s*([^)]+?)\s*\)""".r
  private val HoursRe = """hours\(\s*([^)]+?)\s*\)""".r

  def parse(s: String): T = s.trim match {
    case DaysRe(c) => Days(c)
    case YearsRe(c) => Years(c)
    case MonthsRe(c) => Months(c)
    case HoursRe(c) => Hours(c)
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case TruncRe(w, c) => Trunc(w.toInt, c)
    case c => Identity(c)
  }

  /** Split a stored partition spec into per-transform strings. The
    * legacy format is comma-joined bare identity names; transform specs
    * contain commas INSIDE parens (`bucket(8,k)`), so the r16 writer
    * joins with `;` whenever any transform is present. Reading accepts
    * both: a `;` or a `(` selects the transform-aware split. */
  def splitSpec(propVal: String): Seq[String] = {
    val parts =
      if (propVal.contains(';') || propVal.contains('(')) propVal.split(';')
      else propVal.split(',')
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  def parseSpec(propVal: String): Seq[T] = splitSpec(propVal).map(parse)

  /** Spark's named connector `Transform`s → the catalog's spec — ONE
    * parser shared by MetaCatalog and RestCatalog createTable
    * (`PARTITIONED BY (days(ts))` arrives as named transforms,
    * `truncate` as a generic ApplyTransform, argument order free). */
  def fromSparkTransforms(
      partitions: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[T] = {
    def ref(t: org.apache.spark.sql.connector.expressions.Transform): String =
      t.references().head.fieldNames().mkString(".")
    def intArg(t: org.apache.spark.sql.connector.expressions.Transform): Int =
      t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Number] =>
          l.value().asInstanceOf[Number].intValue()
      }.getOrElse(throw new IllegalArgumentException(
        s"transform $t needs an integer argument"))
    partitions.map {
      case t if t.name == "identity" => Identity(ref(t))
      case t if t.name == "days" => Days(ref(t))
      case t if t.name == "years" => Years(ref(t))
      case t if t.name == "months" => Months(ref(t))
      case t if t.name == "hours" => Hours(ref(t))
      case t if t.name == "bucket" => Bucket(intArg(t), ref(t))
      case t if t.name == "truncate" => Trunc(intArg(t), ref(t))
      case t => throw new UnsupportedOperationException(
        s"graft tables support identity, years/months/days/hours, " +
          s"bucket and truncate partitioning; got $t")
    }
  }

  /** Whether CREATE TABLE must pin the session zone ([[ZoneKey]]): any
    * calendar transform over a ZONED timestamp derives zone-dependent
    * dir values — ONE helper shared by MetaCatalog and RestCatalog so
    * the two can never diverge (r17 second review). IDENTITY transforms
    * over a zoned timestamp need the pin too (r18): the dir value is
    * the timestamp RENDERED as text, and both the write-side rendering
    * and the read-side partition-value parse are zone-dependent —
    * without one shared zone, a reader in another session would parse
    * different instants than the writer stored (and an equality-delete
    * mask keyed on the column would be zone-dependent, the r17
    * deleteByKey rejection). */
  def needsPinnedZone(spec: Seq[T], schema: StructType): Boolean =
    spec.exists {
      case t @ (_: Days | _: Years | _: Months | _: Hours | _: Identity) =>
        schema.fields.find(_.name == t.source)
          .exists(_.dataType.isInstanceOf[TimestampType])
      case _ => false
    }

  /** Table property selecting the bucket hash derivation; "v2" = the
    * hash-width-stable variant ([[Bucket.wide]]). */
  val BucketDerivationKey = "graft.bucket.derivation"

  /** Tag every bucket transform with the table's derivation mode —
    * call sites that parse spec strings for HASHING consumers (write
    * derivation, prune) must apply this; validation/guard-only readers
    * need not. */
  def withBucketMode(spec: Seq[T], wide: Boolean): Seq[T] =
    if (!wide) spec
    else spec.map {
      case b: Bucket => b.copy(wide = true)
      case t => t
    }

  def formatSpec(spec: Seq[T]): String =
    if (spec.forall(_.isIdentity)) spec.map(_.spec).mkString(",")
    else spec.map(_.spec).mkString(";")

  /** Validate a transform against the table schema at CREATE TABLE. */
  def validate(t: T, schema: StructType): Unit = {
    val f = schema.fields.find(_.name == t.source).getOrElse(
      throw new IllegalArgumentException(
        s"partition transform ${t.spec}: column ${t.source} not in schema"))
    t match {
      case _: Identity => ()
      case _: Days | _: Years | _: Months => f.dataType match {
        case _: TimestampType | _: TimestampNTZType | _: DateType => ()
        case other => throw new IllegalArgumentException(
          s"${t.spec} needs a timestamp/date column, got " +
            other.simpleString)
      }
      case _: Hours => f.dataType match {
        case _: TimestampType | _: TimestampNTZType => ()
        case other => throw new IllegalArgumentException(
          s"hours(${t.source}) needs a timestamp column, got " +
            other.simpleString)
      }
      case _: Bucket => f.dataType match {
        case _: IntegerType | _: LongType | _: StringType | _: DateType |
             _: TimestampType | _: ShortType | _: ByteType => ()
        case other => throw new IllegalArgumentException(
          s"bucket(n, ${t.source}) needs an atomic key column, got " +
            other.simpleString)
      }
      case _: Trunc => f.dataType match {
        case _: StringType | _: IntegerType | _: LongType => ()
        case other => throw new IllegalArgumentException(
          s"truncate(w, ${t.source}) needs a string or integral column, " +
            s"got ${other.simpleString}")
      }
    }
    if (!t.isIdentity && schema.fieldNames.contains(t.dirName))
      throw new IllegalArgumentException(
        s"partition transform ${t.spec} derives directory column " +
          s"'${t.dirName}', which collides with a schema column")
  }

  /** The dir-value pattern of a calendar transform. */
  private def patternFor(t: T): String = t match {
    case _: Years => "yyyy"
    case _: Months => "yyyy-MM"
    case _: Hours => "yyyy-MM-dd-HH"
    case other => throw new IllegalStateException(s"no pattern for $other")
  }

  /** The derived partition value as ONE catalyst expression — shared by
    * the V1 write path (wrapped as a Column), the V2 row-level writer
    * ([[org.apache.spark.sql.graftaccess.BatchWrites]]) and, via the
    * same shapes, the prune path's reasoning, so no two paths can ever
    * disagree on a dir value (r17 review). `zone` is the table's
    * pinned [[ZoneKey]]; None (pre-r17 table) = the CURRENT session
    * zone, captured here on the driver. NTZ and DATE sources are
    * zone-free (wall time / calendar value). */
  def deriveCatalyst(t: T,
      ref: org.apache.spark.sql.catalyst.expressions.Expression,
      zone: Option[String])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, DateFormatClass, Literal, Murmur3Hash, Pmod, Substring, Subtract}
    def z: String = zone.getOrElse(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    // wall-time rendering for NTZ/DATE: interpret and format in ONE
    // fixed zone (UTC) — the zone cancels, leaving the calendar fields
    def wallTs: org.apache.spark.sql.catalyst.expressions.Expression =
      Cast(ref, TimestampType, Some("UTC"))
    t match {
      case Identity(_) => ref
      case Days(_) => ref.dataType match {
        case _: DateType => ref // DATE dirs: ts_day=2026-01-01
        case _: TimestampNTZType => Cast(ref, DateType) // wall time
        case _ => Cast(ref, DateType, Some(z))
      }
      case _: Years | _: Months | _: Hours =>
        val fmt = Literal(patternFor(t))
        ref.dataType match {
          case _: TimestampType => new DateFormatClass(ref, fmt, Some(z))
          case _ => new DateFormatClass(wallTs, fmt, Some("UTC"))
        }
      case Bucket(n, _, wide) =>
        // v2 (wide): integral keys hash through one canonical width, so
        // an int→bigint promotion of the source is dir-stable; every
        // other type hashes as-is (only int→long is a legal widening)
        val key = ref.dataType match {
          case _: ByteType | _: ShortType | _: IntegerType if wide =>
            Cast(ref, LongType)
          case _ => ref
        }
        Pmod(new Murmur3Hash(Seq(key)), Literal(n))
      case Trunc(w, _) => ref.dataType match {
        case _: StringType => Substring(ref, Literal(1), Literal(w))
        case _ => // floor-to-multiple, correct for negatives via pmod
          val v = Cast(ref, LongType)
          Subtract(v, Pmod(v, Literal(w.toLong)))
      }
    }
  }

  /** The derived partition value for the V1 write path. */
  def derive(t: T, df: DataFrame, zone: Option[String]): Column =
    org.apache.spark.sql.graftaccess.Internals.column(
      deriveCatalyst(t,
        org.apache.spark.sql.graftaccess.Internals.expression(df(t.source)),
        zone))

  /** Columns the write's `partitionBy` uses, in spec order. */
  def dirColumns(spec: Seq[T]): Seq[String] = spec.map(_.dirName)

  /** Inject the derived dir columns of NON-identity transforms. */
  def withDerived(spec: Seq[T], df: DataFrame,
      zone: Option[String]): DataFrame =
    spec.filterNot(_.isIdentity).foldLeft(df)((acc, t) =>
      acc.withColumn(t.dirName, derive(t, acc, zone)))

  // --- pruning -----------------------------------------------------------

  /** The bucket of one literal, evaluated through the SAME catalyst
    * derivation the write path compiles ([[deriveCatalyst]] — including
    * the v2 wide-hash variant), so prune and layout can never disagree
    * by construction. */
  private def bucketOf(t: T, value: Any, dt: DataType): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    deriveCatalyst(t, Literal.create(value, dt), None)
      .eval(null).asInstanceOf[Int]
  }

  /** The zone the write-path derivation interprets the source in: the
    * table's PINNED zone ([[ZoneKey]]) for zoned timestamps (session
    * zone only for pre-r17 tables without the key), wall-time
    * (UTC-as-wall) for TIMESTAMP_NTZ. Prune and layout must use the
    * SAME zone or a day boundary could prune a dir that holds matches. */
  private def zoneFor(srcType: DataType,
      pinned: Option[String]): java.time.ZoneId = srcType match {
    case _: TimestampNTZType => java.time.ZoneOffset.UTC
    case _ => java.time.ZoneId.of(pinned.getOrElse(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
  }

  private def toEpochMicros(v: Any, zone: java.time.ZoneId): Option[Long] =
    v match {
      case t: java.sql.Timestamp =>
        Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case i: java.time.Instant =>
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
      case l: java.time.LocalDateTime => // TIMESTAMP_NTZ: wall time
        Some(l.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          l.getNano / 1000)
      case d: java.sql.Date =>
        Some(d.toLocalDate.atStartOfDay(zone).toInstant.getEpochSecond
          * 1000000L)
      case d: java.time.LocalDate =>
        Some(d.atStartOfDay(zone).toInstant.getEpochSecond * 1000000L)
      case _ => None
    }

  /** Constant hour-dir parser, hoisted out of the per-(file, predicate)
    * prune loop (r17 second review). */
  private val HourDirFormat: java.time.format.DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd-HH")
      .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
      .toFormatter()

  /** [lo, hi) epoch-micros interval of a calendar-transform dir value
    * in `zone` — days `2023-11-16`, years `2023`, months `2023-11`,
    * hours `2023-11-16-22` (r17). Unparseable → None (conservative). */
  private def timeInterval(t: T, dirVal: String,
      zone: java.time.ZoneId): Option[(Long, Long)] =
    try {
      def us(z: java.time.ZonedDateTime): Long =
        z.toInstant.getEpochSecond * 1000000L
      t match {
        case _: Days =>
          val d = java.time.LocalDate.parse(dirVal)
          Some((us(d.atStartOfDay(zone)), us(d.plusDays(1).atStartOfDay(zone))))
        case _: Years =>
          val y = java.time.Year.parse(dirVal)
          Some((us(y.atDay(1).atStartOfDay(zone)),
            us(y.plusYears(1).atDay(1).atStartOfDay(zone))))
        case _: Months =>
          val m = java.time.YearMonth.parse(dirVal)
          Some((us(m.atDay(1).atStartOfDay(zone)),
            us(m.plusMonths(1).atDay(1).atStartOfDay(zone))))
        case _: Hours =>
          val h = java.time.LocalDateTime.parse(dirVal, HourDirFormat)
          Some((us(h.atZone(zone)), us(h.plusHours(1).atZone(zone))))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** The dir value of transform `t` in a tableDir-relative file path, if
    * the path carries it (None → conservative keep). Hive-escaped
    * characters are %-decoded. */
  private[catalog] def dirValueOf(t: T, relPath: String): Option[String] =
    relPath.split('/').collectFirst {
      case seg if seg.startsWith(t.dirName + "=") =>
        unescape(seg.substring(t.dirName.length + 1))
    }

  /** Hive partition-dir unescaping (`%2F` → `/` etc). */
  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** May a file whose transform-dir value is `dirVal` contain a row
    * matching `filter`? Conservative: anything unprovable → true. Only
    * filters referencing `t.source` can prune. */
  private def mayMatch(t: T, dirVal: String, filter: sources.Filter,
      schema: StructType, zone: Option[String]): Boolean = {
    import sources._
    val isNullDir = dirVal == NullDir
    def srcType: DataType = schema(t.source).dataType
    filter match {
      // WHERE null rows land differs per transform: days/truncate
      // derive NULL → the hive null dir; BUCKET derives pmod(hash(NULL),
      // n) — Spark's hash() of NULL is the SEED (42), NOT null — so
      // null-source rows live in an ORDINARY bucket dir and an IS NULL
      // prune keyed on the null dir alone would silently drop them.
      case And(l, r) =>
        mayMatch(t, dirVal, l, schema, zone) &&
          mayMatch(t, dirVal, r, schema, zone)
      case Or(l, r) =>
        mayMatch(t, dirVal, l, schema, zone) ||
          mayMatch(t, dirVal, r, schema, zone)
      case IsNull(a) if a == t.source => nullInDir(t, dirVal, srcType)
      case IsNotNull(a) if a == t.source => !isNullDir
      case EqualTo(a, v) if a == t.source =>
        if (isNullDir || v == null) false
        else valueInDir(t, dirVal, v, srcType, zone)
      case EqualNullSafe(a, v) if a == t.source =>
        if (v == null) nullInDir(t, dirVal, srcType)
        else !isNullDir && valueInDir(t, dirVal, v, srcType, zone)
      case In(a, vs) if a == t.source =>
        if (isNullDir) false
        else vs.exists(v =>
          v != null && valueInDir(t, dirVal, v, srcType, zone))
      case GreaterThan(a, v) if a == t.source =>
        !isNullDir && rangeOverlaps(t, dirVal, v, lowerExcl = true,
          isLowerBound = true, srcType, zone)
      case GreaterThanOrEqual(a, v) if a == t.source =>
        !isNullDir && rangeOverlaps(t, dirVal, v, lowerExcl = false,
          isLowerBound = true, srcType, zone)
      case LessThan(a, v) if a == t.source =>
        !isNullDir && rangeOverlaps(t, dirVal, v, lowerExcl = true,
          isLowerBound = false, srcType, zone)
      case LessThanOrEqual(a, v) if a == t.source =>
        !isNullDir && rangeOverlaps(t, dirVal, v, lowerExcl = false,
          isLowerBound = false, srcType, zone)
      case StringStartsWith(a, prefix) if a == t.source => t match {
        case Trunc(w, _) if !isNullDir =>
          if (prefix.length >= w) prefix.take(w) == dirVal
          else dirVal.startsWith(prefix)
        case _ => true
      }
      case _ => true // Not(...), other columns, unknown filters: keep
    }
  }

  /** Could a NULL source value live in this dir? days/truncate derive
    * NULL → the hive null dir; bucket derives the SEED hash's bucket
    * (evaluated through the same catalyst expression as the write). */
  private def nullInDir(t: T, dirVal: String, srcType: DataType): Boolean =
    t match {
      case _: Bucket =>
        dirVal == NullDir || // belt-and-braces; bucket never writes it
          dirVal.toIntOption.contains(bucketOf(t, null, srcType))
      case _ => dirVal == NullDir
    }

  /** Point containment: does `v` land in this dir? */
  private def valueInDir(t: T, dirVal: String, v: Any,
      srcType: DataType, pinned: Option[String]): Boolean = t match {
    case Identity(_) => true // identity dirs prune via the file index
    case _: Days | _: Years | _: Months | _: Hours =>
      // interval containment: v lands in this dir iff lo <= v < hi
      val zone = zoneFor(srcType, pinned)
      (toEpochMicros(v, zone), timeInterval(t, dirVal, zone)) match {
        case (Some(us), Some((lo, hi))) => us >= lo && us < hi
        case _ => true
      }
    case _: Bucket =>
      dirVal.toIntOption match {
        case Some(b) => bucketOf(t, v, srcType) == b
        case None => true
      }
    case Trunc(w, _) => v match {
      case s: String => s.take(w) == dirVal
      case i: Int => dirVal.toLongOption.forall(d =>
        i - Math.floorMod(i.toLong, w.toLong) == d)
      case l: Long => dirVal.toLongOption.forall(d =>
        l - Math.floorMod(l, w.toLong) == d)
      case _ => true
    }
  }

  /** Range overlap for order-preserving transforms (calendar
    * transforms, numeric and string truncate); bucket ranges never
    * prune (hash is unordered). */
  private def rangeOverlaps(t: T, dirVal: String, v: Any,
      lowerExcl: Boolean, isLowerBound: Boolean,
      srcType: DataType, pinned: Option[String]): Boolean = t match {
    case _: Days | _: Years | _: Months | _: Hours =>
      val zone = zoneFor(srcType, pinned)
      (toEpochMicros(v, zone), timeInterval(t, dirVal, zone)) match {
        case (Some(us), Some((lo, hi))) =>
          if (isLowerBound) hi > us + (if (lowerExcl) 1 else 0)
          else lo < us + (if (lowerExcl) 0 else 1)
        case _ => true
      }
    case Trunc(w, _) => v match {
      case s: String =>
        // dir covers all strings with this w-prefix
        if (isLowerBound) dirVal >= s.take(w) || s.startsWith(dirVal)
        else dirVal <= s.take(w)
      case other =>
        val x = other match {
          case i: Int => i.toLong
          case l: Long => l
          case _ => return true
        }
        dirVal.toLongOption match {
          case Some(lo) =>
            val hi = lo + w // exclusive
            if (isLowerBound) hi > x + (if (lowerExcl) 1 else 0)
            else lo < x + (if (lowerExcl) 0 else 1)
          case None => true
        }
    }
    case _ => true
  }

  /** Driver-side hidden-partition file pruning: drop files whose
    * transform-dir values PROVABLY cannot match the pushed filters.
    * Conjunct semantics: every top-level filter must be satisfiable. */
  def prune(files: Seq[String], spec: Seq[T],
      filters: Seq[sources.Filter], schema: StructType,
      zone: Option[String]): Seq[String] = {
    val hidden = spec.filterNot(_.isIdentity)
    if (hidden.isEmpty || filters.isEmpty) return files
    files.filter { f =>
      hidden.forall { t =>
        dirValueOf(t, f) match {
          case Some(dv) =>
            filters.forall(fl => mayMatch(t, dv, fl, schema, zone))
          case None => true // no dir in path (old layout): keep
        }
      }
    }
  }
}
