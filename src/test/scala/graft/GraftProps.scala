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
