package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftaccess.Internals
import graft.functions.DateBin

/** DataFusion-40 function-name compatibility layer (SURVEY §2.9 ⚠/≈ rows).
  *
  * Every shim is registered as a native Catalyst `Expression` builder — not
  * a Scala UDF — so the optimizer can fold/push them and whole-stage
  * codegen stays unbroken (the reference's functions are all vectorized
  * library code; a black-box UDF would be a scale regression, not parity).
  *
  * `current_schema`/`current_database` mirror the only two first-party UDFs
  * in the reference (env-backed, immutable volatility —
  * iceberg-datafusion-arrow-flight/src/lib.rs:106-128): they fold to
  * literals at plan time exactly like DataFusion's `Volatility::Immutable`.
  */
object DFCompat {
  private val marker = "graft_compat_installed"

  /** chrono/strftime % codes → java.time pattern letters (the subset a
    * DataFusion `to_char` user actually hits). */
  private[graft] def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'j' => sb.append("DDD")
          case 'e' => sb.append("d")
          case 'a' => sb.append("EEE")
          case 'A' => sb.append("EEEE")
          case 'b' => sb.append("MMM")
          case 'B' => sb.append("MMMM")
          case '%' => sb.append('%')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** All shims as (name, builder) — consumed by [[install]] (runtime
    * registration on a live session) and by [[graft.GraftExtensions]]
    * (config-time injection via SparkSessionExtensions). */
  lazy val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[Expression] => Expression)]
    def reg(name: String)(b: Seq[Expression] => Expression): Unit =
      acc += ((name, b))

    // --- reference first-party UDFs (lib.rs:106-128) ---
    reg("current_schema")(_ =>
      Literal(sys.env.getOrElse("CURRENT_SCHEMA", "public")))
    reg("current_database")(_ =>
      Literal(sys.env.getOrElse("CURRENT_DATABASE", "datafusion")))

    // --- date/time ---
    // date_bin(stride, ts[, origin]) — 2-arg form anchors at epoch, like DF.
    reg("date_bin") {
      case Seq(s, t, o) => DateBin(s, t, o)
      case Seq(s, t)    => DateBin(s, t, Literal(0L, TimestampType))
      case args => throw new IllegalArgumentException(
        s"date_bin expects 2 or 3 args, got ${args.length}")
    }
    // current_time: Spark has no TIME type (SURVEY §1.2) — DataFusion's
    // current_time becomes the query-constant wall-clock formatted as a
    // string (CurrentTimestamp is fixed per query, so every row agrees).
    reg("current_time")(_ =>
      DateFormatClass(CurrentTimestamp(), Literal("HH:mm:ss")))
    reg("to_timestamp_seconds") { case Seq(e) => SecondsToTimestamp(e) }
    reg("to_timestamp_millis") { case Seq(e) => MillisToTimestamp(e) }
    reg("to_timestamp_micros") { case Seq(e) => MicrosToTimestamp(e) }
    // DF to_timestamp_nanos: Spark timestamps are µs — truncate (SURVEY §2.9 ⚠)
    reg("to_timestamp_nanos") { case Seq(e) =>
      MicrosToTimestamp(IntegralDivide(e, Literal(1000L), EvalMode.LEGACY))
    }
    reg("today")(_ => CurrentDate())

    // --- string ---
    // DataFusion spells these with underscores; Spark's builtins are
    // `startswith`/`endswith`.
    reg("starts_with") { case Seq(s, p) => StartsWith(s, p) }
    reg("ends_with") { case Seq(s, p) => EndsWith(s, p) }
    // DF strpos(string, substring) == Spark instr(str, substr), 1-based.
    reg("strpos") { case Seq(str, sub) => StringInstr(str, sub) }
    reg("substr_index") { case Seq(s, d, c) => SubstringIndex(s, d, c) }

    // --- math ---
    reg("iszero") { case Seq(e) =>
      EqualTo(Cast(e, DoubleType), Literal(0.0d))
    }
    // DF trunc(x[, prec]) truncates a NUMBER toward zero; Spark's trunc is
    // date-oriented. Dispatch: a string second argument keeps Spark's
    // TruncDate, anything else takes the numeric path
    // signum(x) * floor(|x| * 10^p) / 10^p.
    def numericTrunc(x: Expression, p: Expression): Expression = {
      val p10 = Pow(Literal(10.0d), Cast(p, DoubleType))
      val xd = Cast(x, DoubleType)
      Multiply(
        Cast(Signum(xd), DoubleType),
        Divide(
          Cast(Floor(Multiply(Abs(xd, failOnError = false), p10)), DoubleType),
          p10))
    }
    reg("trunc") {
      case Seq(x) => numericTrunc(x, Literal(0))
      // numeric path ONLY for an unambiguous literal numeric precision —
      // every other 2-arg form (string literal OR any non-literal fmt)
      // keeps Spark's builtin date-trunc semantics, so existing
      // trunc(date, fmtCol) queries don't silently change behavior.
      case Seq(x, p @ Literal(_, ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | _: DecimalType)) =>
        numericTrunc(x, p)
      case Seq(d, f) => TruncDate(d, f)
      case args => throw new IllegalArgumentException(
        s"trunc expects 1 or 2 args, got ${args.length}")
    }
    reg("gcd") { case Seq(a, b) =>
      graft.functions.Gcd(Cast(a, LongType), Cast(b, LongType))
    }
    reg("lcm") { case Seq(a, b) =>
      graft.functions.Lcm(Cast(a, LongType), Cast(b, LongType))
    }

    // --- array (DF datafusion-functions-array names Spark lacks) ---
    // array_has_all(a, b): every element of b present in a.
    reg("array_has_all") { case Seq(a, b) =>
      EqualTo(Size(ArrayExcept(b, a)), Literal(0))
    }
    reg("array_has_any") { case Seq(a, b) => ArraysOverlap(a, b) }
    reg("array_has") { case Seq(a, e) => ArrayContains(a, e) }
    reg("array_element") { case Seq(a, i) => ElementAt(a, i) }
    reg("list_element") { case Seq(a, i) => ElementAt(a, i) }
    reg("array_indexof") { case Seq(a, e) => ArrayPosition(a, e) }
    reg("array_to_string") { case Seq(a, d) => ArrayJoin(a, d, None) }
    reg("array_length") { case Seq(a) => Size(a) }
    reg("empty") { case Seq(a) => EqualTo(Size(a), Literal(0)) }
    reg("array_empty") { case Seq(a) => EqualTo(Size(a), Literal(0)) }

    // regexp_match: DataFusion returns the first match as a list (the
    // whole match when the pattern has no capture group). NULL when no
    // match — never an empty list.
    reg("regexp_match") { case Seq(s, p) =>
      If(RLike(s, p),
        CreateArray(Seq(RegExpExtract(s, p, Literal(0)))),
        Literal.create(null, ArrayType(StringType)))
    }

    // to_char(ts, fmt): DataFusion/chrono strftime %-codes → Spark's
    // java.time letters (literal formats only — the common case; a
    // non-literal format falls back to the pattern unchanged).
    reg("to_char") { case Seq(ts, fmt) =>
      val translated = fmt match {
        case Literal(v, StringType) if v != null =>
          Literal(strftimeToJava(v.toString))
        case other => other
      }
      DateFormatClass(ts, translated)
    }
    reg("to_unixtime") { case Seq(e) =>
      Multiply(Cast(UnixMicros(Cast(e, TimestampType)), DoubleType), Literal(1e-6))
    }

    // array shims DataFusion has and Spark lacks
    reg("array_prepend") { case Seq(e, a) => Concat(Seq(CreateArray(Seq(e)), a)) }
    reg("array_push_front") { case Seq(a, e) => Concat(Seq(CreateArray(Seq(e)), a)) }
    reg("array_push_back") { case Seq(a, e) => Concat(Seq(a, CreateArray(Seq(e)))) }
    reg("array_concat") { case args => Concat(args) }
    reg("make_array") { case args => CreateArray(args) }
    // DF string_to_array splits on a LITERAL delimiter (not a regex).
    reg("string_to_array") {
      case Seq(s, Literal(d, StringType)) if d != null =>
        StringSplit(s, Literal(java.util.regex.Pattern.quote(d.toString)), Literal(-1))
      case _ => throw new IllegalArgumentException(
        "string_to_array requires a literal string delimiter")
    }
    reg("arrow_typeof") { case Seq(e) => TypeOf(e) }
    // DF encode/decode(expr, 'base64'|'hex') are codec dispatchers; any
    // other second argument keeps Spark's builtin charset semantics.
    reg("encode") {
      case Seq(e, Literal(c, StringType)) if c != null &&
          c.toString.equalsIgnoreCase("base64") => Base64(Cast(e, BinaryType))
      case Seq(e, Literal(c, StringType)) if c != null &&
          c.toString.equalsIgnoreCase("hex") => Lower(Hex(Cast(e, BinaryType)))
      case Seq(e, charset) => Encode(e, charset)
      case args => throw new IllegalArgumentException(
        s"encode expects 2 args, got ${args.length}")
    }
    reg("decode") {
      case Seq(e, Literal(c, StringType)) if c != null &&
          c.toString.equalsIgnoreCase("base64") => UnBase64(e)
      case Seq(e, Literal(c, StringType)) if c != null &&
          c.toString.equalsIgnoreCase("hex") => Unhex(e)
      case Seq(e, charset) => StringDecode(e, charset)
      // 3+ args: Spark's Oracle-style decode(expr, search1, res1, ...,
      // default) must keep working — pass through to the builtin.
      case args => new Decode(args)
    }
    reg("array_ndims")(_ => Literal(1))
    reg("array_dims") { case Seq(a) => CreateArray(Seq(Size(a))) }
    reg("array_pop_back") { case Seq(a) =>
      Slice(a, Literal(1), Greatest(Seq(Subtract(Size(a), Literal(1)), Literal(0))))
    }
    reg("array_pop_front") { case Seq(a) =>
      Slice(a, Literal(2), Greatest(Seq(Subtract(Size(a), Literal(1)), Literal(0))))
    }

    // digest(x, algo) — dispatch to the concrete hash (literal algo only,
    // matching DataFusion's usage)
    reg("digest") { case Seq(e, Literal(algo, StringType)) =>
      algo.toString.toLowerCase match {
        case "md5" => Md5(Cast(e, BinaryType))
        case "sha224" => Sha2(Cast(e, BinaryType), Literal(224))
        case "sha256" => Sha2(Cast(e, BinaryType), Literal(256))
        case "sha384" => Sha2(Cast(e, BinaryType), Literal(384))
        case "sha512" => Sha2(Cast(e, BinaryType), Literal(512))
        case "sha1" => Sha1(Cast(e, BinaryType))
        case "blake2b" => graft.functions.Blake2(Cast(e, BinaryType), wide = true)
        case "blake2s" => graft.functions.Blake2(Cast(e, BinaryType), wide = false)
        case "blake3" => graft.functions.Blake3(Cast(e, BinaryType))
        case other => throw new IllegalArgumentException(
          s"digest: unsupported algorithm '$other'")
      }
    }

    // generate_series(start, stop[, step]) — inclusive list, like DF
    reg("generate_series") {
      case Seq(a, b) => new Sequence(a, b)
      case Seq(a, b, s) => new Sequence(a, b, s)
    }

    // --- curation kernels on the SQL surface (a service client gets the
    // pipeline extension layer without the Scala API) ---
    // unicode_normalize(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])
    reg("unicode_normalize") {
      case Seq(e) => graft.functions.UnicodeNormalize(e, "NFC")
      case Seq(e, Literal(f: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
        graft.functions.UnicodeNormalize(e,
          f.toString.toUpperCase(java.util.Locale.ROOT))
      case _ => throw new IllegalArgumentException(
        "unicode_normalize expects (text[, literal form])")
    }
    // char_entropy(text) — the Shannon bits/char quality signal (the
    // full (n, distinct, entropy) struct stays on the Scala surface)
    reg("char_entropy") { case Seq(e) =>
      GetStructField(graft.functions.CharEntropy(e), 2, Some("char_entropy"))
    }
    // vector kernels (the Similarity codegen expressions) — similarity
    // search from plain SQL: cosine_sim(a, b), dot_product(a, b),
    // vec_norm(a). SQL literals arrive as array<decimal> (a bare 3.0 is
    // DECIMAL), so coerce every argument to array<double> — exact for
    // the float columns the kernels already accept, and the cast is a
    // no-op on double input. The kernels assume dense same-length
    // vectors (the Scala operator path only ever feeds them parquet
    // float arrays); arbitrary SQL can hand them a NULL element (the
    // kernel would read 0.0) or mismatched lengths (it would truncate
    // to the shorter) — both silent wrong answers, so the SQL surface
    // guards them to NULL, the standard SQL contagion for undefined
    // input.
    locally {
      def vec(e: Expression): Expression =
        Cast(e, ArrayType(DoubleType, containsNull = true))
      def hasNullElem(a: Expression): Expression = {
        val x = UnresolvedNamedLambdaVariable(Seq("__v_x"))
        ArrayExists(a, LambdaFunction(IsNull(x), Seq(x)))
      }
      def nullDouble: Expression = Literal.create(null, DoubleType)
      def guard2(a: Expression, b: Expression)(
          mk: (Expression, Expression) => Expression): Expression = {
        If(Or(Or(hasNullElem(a), hasNullElem(b)),
            Not(EqualTo(Size(a), Size(b)))),
          nullDouble, mk(a, b))
      }
      reg("cosine_sim") { case Seq(a, b) =>
        guard2(vec(a), vec(b))(graft.functions.CosineSim(_, _))
      }
      reg("dot_product") { case Seq(a, b) =>
        guard2(vec(a), vec(b))(graft.functions.DotProduct(_, _))
      }
      reg("vec_norm") { case Seq(a) =>
        val v = vec(a)
        If(hasNullElem(v), nullDouble, graft.functions.VecNorm(v))
      }
    }
    // char_grams(text[, n]) — normalized character n-grams (LangId's
    // feature extractor)
    reg("char_grams") {
      case Seq(e) => graft.functions.CharGrams(e, 3)
      case Seq(e, Literal(n, IntegerType)) =>
        graft.functions.CharGrams(e, n.asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "char_grams expects (text[, literal n])")
    }
    // strip_html(text) — the WET-style extraction chain as one call
    // (same pattern order as operators/Normalize.stripHtml)
    reg("strip_html") { case Seq(e) =>
      graft.operators.Normalize.stripHtmlExpr(e)
    }
    // hashed_margin(text, weights) — the trained-quality-classifier
    // scorer (QualityClassifier.scoreProjected's kernel): weights[i] is
    // the weight of md5 bucket i and the array LENGTH is the hash dim,
    // so a service client can inline a trained model and score in SQL.
    // The array must be a foldable integral literal (it becomes a
    // task-closure constant, exactly like the Scala path).
    reg("hashed_margin") {
      case Seq(e, arr) if arr.foldable &&
          arr.dataType.isInstanceOf[ArrayType] =>
        val at = arr.dataType.asInstanceOf[ArrayType]
        val data = arr.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val ws = new Array[Long](data.numElements())
        var i = 0
        while (i < ws.length) {
          require(!data.isNullAt(i), "hashed_margin: null weight")
          ws(i) = at.elementType match {
            case LongType => data.getLong(i)
            case IntegerType => data.getInt(i).toLong
            case ShortType => data.getShort(i).toLong
            case other => throw new IllegalArgumentException(
              s"hashed_margin: integral weights expected, got $other")
          }
          i += 1
        }
        graft.functions.HashedMargin(e, ws)
      case _ => throw new IllegalArgumentException(
        "hashed_margin expects (text, foldable integral-array weights)")
    }
    // count_min_sketch(term, depth, width) — the one-pass frequency
    // sketch as a SQL aggregate (the analyzer wraps the raw aggregate
    // function, exactly like the built-in registry entries)
    reg("count_min_sketch") {
      case Seq(e, Literal(d, IntegerType), Literal(w, IntegerType)) =>
        graft.functions.CountMinSketch(
          e, d.asInstanceOf[Int], w.asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "count_min_sketch expects (term, literal depth, literal width)")
    }
    // project_quant(vec, out_dim, in_dim[, scale_bits]) — the sparse
    // JL projection; the md5-derived Achlioptas sign matrix is built
    // here (deterministic), so SQL callers name only the shape
    reg("project_quant") {
      case Seq(e, Literal(o, IntegerType), Literal(i, IntegerType)) =>
        graft.functions.ProjectQuant(e, graft.operators.RandomProjection
          .signMatrix(o.asInstanceOf[Int], i.asInstanceOf[Int]), 20)
      case Seq(e, Literal(o, IntegerType), Literal(i, IntegerType),
          Literal(b, IntegerType)) =>
        graft.functions.ProjectQuant(e, graft.operators.RandomProjection
          .signMatrix(o.asInstanceOf[Int], i.asInstanceOf[Int]),
          b.asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "project_quant expects (vec, literal out_dim, literal in_dim" +
          "[, literal scale_bits])")
    }

    // --- array mutation shims, built as raw lambda HOF trees (the
    // Column/functions API can't be used inside registry builders: its
    // ColumnNodeExpression wrappers never resolve there)
    {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
      def LV(parts: Seq[String]): UnresolvedNamedLambdaVariable =
        UnresolvedNamedLambdaVariable(parts)
      def lam(body: Expression, vs: UnresolvedNamedLambdaVariable*): LambdaFunction =
        LambdaFunction(body, vs)
      def field(e: Expression, name: String): Expression =
        UnresolvedExtractValue(e, Literal(name))
      def mkStruct(n: Expression, out: Expression): Expression =
        CreateNamedStruct(Seq(Literal("n"), n, Literal("out"), out))

      reg("array_replace_all") { case Seq(a, from, to) =>
        val x = LV(Seq("__g_x"))
        ArrayTransform(a, lam(If(EqualTo(x, from), to, x), x))
      }
      def replaceN(a: Expression, from: Expression, to: Expression,
          n: Expression): Expression = {
        val acc = LV(Seq("__g_acc"))
        val x = LV(Seq("__g_x"))
        val acc2 = LV(Seq("__g_acc2"))
        val zero = mkStruct(Cast(n, IntegerType), Slice(a, Literal(1), Literal(0)))
        val merge = lam(
          If(And(EqualTo(x, from), GreaterThan(field(acc, "n"), Literal(0))),
            mkStruct(Subtract(field(acc, "n"), Literal(1)),
              Concat(Seq(field(acc, "out"), CreateArray(Seq(to))))),
            mkStruct(field(acc, "n"),
              Concat(Seq(field(acc, "out"), CreateArray(Seq(x)))))),
          acc, x)
        val finish = lam(field(acc2, "out"), acc2)
        ArrayAggregate(a, zero, merge, finish)
      }
      reg("array_replace") { case Seq(a, from, to) =>
        replaceN(a, from, to, Literal(1))
      }
      reg("array_replace_n") { case Seq(a, from, to, n) =>
        replaceN(a, from, to, n)
      }
      reg("array_positions") { case Seq(a, e) =>
        val i = LV(Seq("__g_i"))
        val y = LV(Seq("__g_y"))
        val positions = ArrayFilter(
          ArrayTransform(
            new Sequence(Literal(1), Size(a)),
            lam(If(EqualTo(ElementAt(a, i), e), i,
              Literal.create(null, IntegerType)), i)),
          lam(IsNotNull(y), y))
        // sequence(1, 0) would count DOWN; guard the empty-array case
        If(EqualTo(Size(a), Literal(0)),
          Literal.create(Array.empty[Int], ArrayType(IntegerType)), positions)
      }
      reg("array_resize") { case Seq(a, n, fill) =>
        val cn = Cast(n, IntegerType)
        If(LessThan(Size(a), cn),
          Concat(Seq(a, ArrayRepeat(fill, Subtract(cn, Size(a))))),
          Slice(a, Literal(1), cn))
      }
    }

    reg(marker)(_ => Literal(true))
    acc.toSeq
  }

  def install(spark: SparkSession): Unit = synchronized {
    if (Internals.functionExists(spark, marker)) return
    builders.foreach { case (n, b) => Internals.registerFunction(spark, n, b) }
  }
}
