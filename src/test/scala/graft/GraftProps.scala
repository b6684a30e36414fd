package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{DayTimeIntervalType, TimestampType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.{DateBin, IntMath}

/** Property-based laws (SURVEY §5.4). Expression-level, so ScalaCheck can
  * hammer thousands of cases without a Spark job per sample. */
object DateBinProps extends Properties("DateBin") {
  // timestamps within ±50 years of epoch (micros), strides 1s .. 7d
  private val tsGen = Gen.choose(-1577880000000000L, 1577880000000000L)
  private val strideGen = Gen.choose(1000000L, 7L * 86400 * 1000000)

  private def bin(stride: Long, ts: Long, origin: Long): Long =
    DateBin(
      Literal(stride, DayTimeIntervalType()),
      Literal(ts, TimestampType),
      Literal(origin, TimestampType)
    ).eval(null).asInstanceOf[Long]

  property("bin is the floor of its window: bin <= ts < bin + stride") =
    Prop.forAll(strideGen, tsGen, tsGen) { (stride, ts, origin) =>
      val b = bin(stride, ts, origin)
      b <= ts && ts < b + stride
    }

  property("bin is aligned to origin modulo stride") =
    Prop.forAll(strideGen, tsGen, tsGen) { (stride, ts, origin) =>
      math.floorMod(bin(stride, ts, origin) - origin, stride) == 0L
    }

  property("binning is idempotent") =
    Prop.forAll(strideGen, tsGen, tsGen) { (stride, ts, origin) =>
      val b = bin(stride, ts, origin)
      bin(stride, b, origin) == b
    }
}

object IntMathProps extends Properties("IntMath") {
  private val posGen = Gen.choose(1L, 1000000L)

  property("gcd divides both arguments") =
    Prop.forAll(posGen, posGen) { (a, b) =>
      val g = IntMath.gcd(a, b)
      g > 0 && a % g == 0 && b % g == 0
    }

  property("gcd * lcm == a * b for positive args") =
    Prop.forAll(posGen, posGen) { (a, b) =>
      IntMath.gcd(a, b) * IntMath.lcm(a, b) == a * b
    }

  property("gcd is commutative and handles zero") =
    Prop.forAll(posGen, posGen) { (a, b) =>
      IntMath.gcd(a, b) == IntMath.gcd(b, a) && IntMath.gcd(a, 0) == a
    }
}

/** Distributed-law checks that need Spark jobs: few samples, real
  * repartitioning — partial/final aggregation must not depend on the
  * partition layout (SURVEY §5.4 "agg partial=final equivalence"). */
object PartitionLawProps extends Properties("PartitionLaws") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  private val dataGen = Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0))
  private val partsGen = Gen.choose(1, 8)

  property("sum/count/min/max invariant under repartitioning") =
    Prop.forAll(dataGen, partsGen) { (xs, parts) =>
      import spark.implicits._
      val base = xs.toDF("x")
      def agg(df: org.apache.spark.sql.DataFrame) = {
        import org.apache.spark.sql.functions._
        df.agg(sum($"x"), count($"x"), min($"x"), max($"x")).collect().head
      }
      val a = agg(base.coalesce(1))
      val b = agg(base.repartition(parts))
      math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-6 &&
        a.getLong(1) == b.getLong(1) &&
        a.getDouble(2) == b.getDouble(2) && a.getDouble(3) == b.getDouble(3)
    }

  property("exactDedup keep-count equals distinct text count") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("a b c", "d e f", "a  b   c", "g"))) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kept = graft.operators.Dedup.exactDedup(df, "doc_id", "text").count()
      kept == texts.map(_.toLowerCase).distinct.size
    }
}

/** Kernel expressions must be BIT-IDENTICAL to an independent plain-Scala
  * model of the declarative formulations they replaced — the property the
  * whole oracle-hash strategy rests on. */
object KernelProps extends Properties("Kernels") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.SketchKernels

  // EQUAL lengths: the kernels' contract is fixed-dimension embeddings
  // (cosine min-truncates all three accumulators on ragged input, while
  // norm sums its whole array — only equal dims make them interchangeable;
  // a forAll over independent lengths falsifies in seconds).
  private val pairGen: Gen[(List[Float], List[Float])] = for {
    n <- Gen.choose(1, 64)
    a <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
    b <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
  } yield (a, b)

  property("cosine == dot / (norm * norm) bit-for-bit (equal dims)") =
    Prop.forAll(pairGen) { case (a, b) =>
      val aa = new GenericArrayData(a.map(x => x: Any).toArray)
      val bb = new GenericArrayData(b.map(x => x: Any).toArray)
      val cos = SketchKernels.cosine(aa, false, bb, false)
      val viaNorms = SketchKernels.dot(aa, false, bb, false) /
        (SketchKernels.norm(aa, false) * SketchKernels.norm(bb, false))
      java.lang.Double.doubleToLongBits(cos) ==
        java.lang.Double.doubleToLongBits(viaNorms) ||
        (cos.isNaN && viaNorms.isNaN)
    }

  property("dot matches sequential fold over float->double casts") =
    Prop.forAll(pairGen) { case (a, b) =>
      val aa = new GenericArrayData(a.map(x => x: Any).toArray)
      val bb = new GenericArrayData(b.map(x => x: Any).toArray)
      val model = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      SketchKernels.dot(aa, false, bb, false) == model
    }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)), Gen.const(" "), Gen.const("\t"),
    Gen.const("."), Gen.const("!"), Gen.const("the"), Gen.const("DER")
  )).map(_.mkString)

  property("TextStatsKernel matches a plain-Scala model of the declarative form") =
    Prop.forAll(textGen) { text =>
      val stops = List(List("the", "a", "of"), List("der", "die"))
      val sets = stops.map { ls =>
        val s = new java.util.HashSet[UTF8String]()
        ls.foreach(w => s.add(UTF8String.fromString(w)))
        s
      }.toArray
      val row = graft.functions.TextStatsKernel.compute(
        UTF8String.fromString(text), sets)
      // independent model: Java regex semantics, like the old lambdas
      val words = text.toLowerCase.split("\\s+", -1).filter(_.nonEmpty).toList
      val expectTokens = words.length
      val expectSum = words.map(_.length.toLong).sum
      val expectDistinct = words.distinct.size
      val expectHits = stops.map(ls => words.count(ls.contains))
      val expectJoined = words.distinct.sorted.mkString(" ")
      val expectPunct = text.count(".,;:!?".contains(_))
      row.getInt(0) == expectTokens &&
        row.getLong(1) == expectSum &&
        row.getInt(2) == expectDistinct &&
        row.getArray(3).toIntArray.toSeq == expectHits.toSeq &&
        row.getUTF8String(4).toString == expectJoined &&
        row.getInt(5) == expectPunct
    }

  property("bandKeys collide iff the r-slices are equal") =
    Prop.forAll(Gen.listOfN(8, Gen.choose(0L, 1000L)),
        Gen.listOfN(8, Gen.choose(0L, 1000L))) { (s1, s2) =>
      def keys(s: List[Long]): Seq[Long] =
        SketchKernels.bandKeys(new GenericArrayData(s.map(x => x: Any).toArray), 4)
          .toLongArray.toSeq
      val (k1, k2) = (keys(s1), keys(s2))
      (0 until 4).forall { b =>
        val slice1 = s1.slice(b * 2, b * 2 + 2)
        val slice2 = s2.slice(b * 2, b * 2 + 2)
        if (slice1 == slice2) k1(b) == k2(b)
        else k1(b) != k2(b) // 64-bit mix: collision ~ never at this scale
      }
    }
}

/** Unicode-normalization kernel laws vs java.text.Normalizer — the
  * kernel's contract is "Normalizer semantics over valid UTF-8";
  * generators build strings from codepoints (no unpaired surrogates:
  * Spark strings are UTF8String, which cannot represent them). */
object UnicodeNormalizeProps
    extends org.scalacheck.Properties("UnicodeNormalize") {
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.UnicodeKernels

  private val cpGen: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(0x20, 0x7e),     // ASCII
    2 -> Gen.choose(0xc0, 0x17f),    // Latin-1/Ext-A (composition targets)
    2 -> Gen.choose(0x300, 0x36f),   // combining marks
    1 -> Gen.choose(0x3040, 0x30ff), // kana
    1 -> Gen.choose(0xac00, 0xd7a3), // hangul syllables (NFD-decomposable)
    1 -> Gen.choose(0xfb00, 0xfb06), // ligatures (K-forms fold)
    1 -> Gen.choose(0xff01, 0xff5e), // full-width (K-forms fold)
    1 -> Gen.choose(0x1f600, 0x1f64f)) // astral emoji
  private val strGen: Gen[String] =
    Gen.listOf(cpGen).map { cps =>
      val sb = new java.lang.StringBuilder
      cps.foreach(sb.appendCodePoint)
      sb.toString
    }
  private val forms = java.text.Normalizer.Form.values()

  private def kernel(s: String, ord: Int): String =
    UnicodeKernels.normalize(UTF8String.fromString(s), ord).toString

  property("kernel equals java.text.Normalizer for every form") =
    Prop.forAll(strGen, Gen.choose(0, forms.length - 1)) { (s, f) =>
      kernel(s, f) == java.text.Normalizer.normalize(s, forms(f))
    }

  property("normalization is idempotent per form") =
    Prop.forAll(strGen, Gen.choose(0, forms.length - 1)) { (s, f) =>
      val once = kernel(s, f)
      kernel(once, f) == once
    }

  property("NFC after NFD equals direct NFC") =
    Prop.forAll(strGen) { s =>
      val nfd = java.text.Normalizer.Form.NFD.ordinal
      val nfc = java.text.Normalizer.Form.NFC.ordinal
      kernel(kernel(s, nfd), nfc) == kernel(s, nfc)
    }
}

/** Character-entropy kernel laws vs a naive reference. */
object CharEntropyProps
    extends org.scalacheck.Properties("CharEntropy") {
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.CharEntropy

  private val cpGen: Gen[Int] = Gen.frequency(
    7 -> Gen.choose(0x20, 0x7e),
    2 -> Gen.choose(0xc0, 0x2ff),
    1 -> Gen.choose(0x4e00, 0x4e2f),
    1 -> Gen.choose(0x1f600, 0x1f60f))
  private val strGen: Gen[String] =
    Gen.listOf(cpGen).map { cps =>
      val sb = new java.lang.StringBuilder
      cps.foreach(sb.appendCodePoint)
      sb.toString
    }

  private def prof(s: String): (Long, Long, Double) = {
    val r = CharEntropy.compute(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  property("counts match naive codepoint counting") =
    Prop.forAll(strGen) { s =>
      val cps = s.codePoints().toArray
      val (n, d, _) = prof(s)
      n == cps.length && d == cps.distinct.length
    }

  property("entropy matches the naive -sum(p log2 p) within 1e-9 rel") =
    Prop.forAll(strGen) { s =>
      val cps = s.codePoints().toArray
      val (_, _, h) = prof(s)
      if (cps.isEmpty) h == 0.0
      else {
        val n = cps.length.toDouble
        val ref = cps.groupBy(identity).values.map { g =>
          val p = g.length / n
          -p * (math.log(p) / math.log(2.0))
        }.sum
        math.abs(h - ref) <= 1e-9 * math.max(math.abs(ref), 1.0)
      }
    }

  property("entropy is permutation-invariant (exactly)") =
    Prop.forAll(strGen) { s =>
      val rev = new java.lang.StringBuilder
      s.codePoints().toArray.reverse.foreach(rev.appendCodePoint)
      prof(s) == prof(rev.toString)
    }

  property("entropy bounded by log2(distinct); zero iff <= 1 distinct") =
    Prop.forAll(strGen) { s =>
      val (_, d, h) = prof(s)
      if (d <= 1) h == 0.0
      else h >= 0.0 && h <= math.log(d.toDouble) / math.log(2.0) + 1e-9
    }
}

/** Hashed-margin kernel laws vs a naive reference scorer. */
object HashedMarginProps
    extends org.scalacheck.Properties("HashedMargin") {
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.QualityKernels

  // text mixing ASCII words, every ASCII whitespace byte the kernel
  // treats as a separator (0x09-0x0d, 0x20), uppercase (case folding),
  // and multibyte codepoints (bucket hashing over UTF-8 bytes)
  private val cpGen: Gen[Int] = Gen.frequency(
    8 -> Gen.choose(0x61, 0x7a),     // a-z
    3 -> Gen.choose(0x41, 0x5a),     // A-Z (folds)
    3 -> Gen.oneOf(0x20, 0x09, 0x0a, 0x0b, 0x0c, 0x0d),
    1 -> Gen.choose(0x30, 0x39),     // digits
    1 -> Gen.choose(0xc0, 0x17f),    // Latin-1/Ext-A multibyte
    1 -> Gen.choose(0x4e00, 0x4e80)) // CJK multibyte
  private val strGen: Gen[String] =
    Gen.listOf(cpGen).map { cps =>
      val sb = new java.lang.StringBuilder
      cps.foreach(sb.appendCodePoint)
      sb.toString
    }
  private val wGen: Gen[Array[Long]] = for {
    dim <- Gen.oneOf(1, 8, 256)
    ws <- Gen.listOfN(dim, Gen.choose(-1000L, 1000L))
  } yield ws.toArray

  private def kernel(s: String, w: Array[Long]): Long =
    QualityKernels.margin(UTF8String.fromString(s), w)

  /** Reference: Spark-lower (UTF8String), Java \s+ split, md5 of each
    * token's UTF-8 bytes, first 4 bytes unsigned mod dim. */
  private def naive(s: String, w: Array[Long]): Long = {
    val lowered = UTF8String.fromString(s).toLowerCase.toString
    lowered.split("\\s+").filter(_.nonEmpty).map { tok =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      w((h % w.length).toInt)
    }.sum
  }

  property("kernel equals the naive tokenizer+md5 reference") =
    Prop.forAll(strGen, wGen) { (s, w) => kernel(s, w) == naive(s, w) }

  property("margin is additive across a space join") =
    Prop.forAll(strGen, strGen, wGen) { (a, b, w) =>
      kernel(a + " " + b, w) == kernel(a, w) + kernel(b, w)
    }

  property("margin is invariant under whitespace-run collapsing") =
    Prop.forAll(strGen, wGen) { (s, w) =>
      kernel(s.replaceAll("\\s+", " "), w) == kernel(s, w)
    }
}

object SortedIntersectProps extends Properties("SortedIntersectCount") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.SetKernels

  // The kernel's contract: ascending UTF8String binary order, distinct,
  // no nulls — exactly what SetJoin's array_sort(array_distinct(...))
  // produces. Small alphabet maximizes collisions.
  private val tokGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 20)
    t <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "", "xyz", "é", "1"))
  } yield t

  private def sortedArr(ts: List[String]): (GenericArrayData, Set[String]) = {
    val distinct = ts.distinct
    val sorted = distinct.map(UTF8String.fromString)
      .sortWith(_.binaryCompare(_) < 0)
    (new GenericArrayData(sorted.map(x => x: Any).toArray), distinct.toSet)
  }

  property("merge-walk count equals set-intersection size") =
    Prop.forAll(tokGen, tokGen) { (a, b) =>
      val (aa, sa) = sortedArr(a)
      val (bb, sb) = sortedArr(b)
      SetKernels.sortedIntersectCount(aa, bb) == (sa & sb).size.toLong
    }

  property("count is symmetric and bounded by min size") =
    Prop.forAll(tokGen, tokGen) { (a, b) =>
      val (aa, _) = sortedArr(a)
      val (bb, _) = sortedArr(b)
      val n = SetKernels.sortedIntersectCount(aa, bb)
      n == SetKernels.sortedIntersectCount(bb, aa) &&
        n <= math.min(aa.numElements(), bb.numElements())
    }

  property("self-intersection is the full size") =
    Prop.forAll(tokGen) { a =>
      val (aa, sa) = sortedArr(a)
      SetKernels.sortedIntersectCount(aa, aa) == sa.size.toLong
    }
}
