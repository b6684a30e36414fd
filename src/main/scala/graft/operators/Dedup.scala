package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (builder-prompt extension surface; not present in the reference, whose
  * SQL engine stops at relational ops — lib.rs:678).
  *
  * Everything here is a declarative `DataFrame → DataFrame` transform built
  * from codegen'd `functions._` expressions — no UDFs, no driver-side
  * collection — so Catalyst can pipeline shingling/hashing inside the scan
  * stage and the only shuffles are the ones the algorithm genuinely needs
  * (group-by-fingerprint, band-bucket join). At 100 TB:
  *   - exact dedup shuffles 16-byte fingerprints, not documents;
  *   - MinHash-LSH shuffles (id, band-key) pairs — candidate verification
  *     re-joins the shingle sets only for the (rare) colliding pairs;
  *   - banding bounds the self-join blowup; heavily skewed buckets (all-
  *     identical corpora) should additionally cap bucket size upstream.
  */
object Dedup {

  /** Lower-cased whitespace tokens, empties dropped. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Distinct n-word shingles ("n-grams of words"). Documents shorter than
    * n words yield their whole text as one shingle. */
  def shingles(text: Column, n: Int): Column = {
    val ws = words(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(ws) - (n - 1), lit(1))),
      i => array_join(slice(ws, i, lit(n)), " ")))
  }

  /** 2^31-1; keeping hash values under 2^31 makes a*h+b overflow-free in
    * Long arithmetic, which matters because Spark 4 runs ANSI mode (where
    * silent wraparound would instead throw ARITHMETIC_OVERFLOW). */
  val HashPrime = 2147483647L

  private def perms(numPerms: Int): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(42)
    val as = Seq.fill(numPerms)(1L + rnd.nextInt(Int.MaxValue - 2).toLong)
    val bs = Seq.fill(numPerms)(rnd.nextInt(Int.MaxValue - 1).toLong)
    (as, bs)
  }

  /** MinHash signature: for each of `numPerms` affine permutations
    * (a*h + b) mod P over xxhash64 shingle hashes, the minimum value. */
  def minhashSig(sh: Column, numPerms: Int): Column = {
    val (as, bs) = perms(numPerms)
    val aCol = typedLit(as)
    val bCol = typedLit(bs)
    transform(sequence(lit(0), lit(numPerms - 1)), p =>
      array_min(transform(sh, s =>
        pmod(
          element_at(aCol, p + lit(1)) * pmod(xxhash64(s), lit(HashPrime)) +
            element_at(bCol, p + lit(1)),
          lit(HashPrime)))))
  }

  /** Exact dedup: group identical (lower-cased) texts by MD5 fingerprint;
    * representative = min id. Shuffles only (fp, id) pairs. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(col(textCol))).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact blocked all-pairs n-gram Jaccard: the quadratic baseline, kept
    * honest by a blocking key (same language, similar length, ...). The
    * scale path is [[minhashLshPairs]]; this is its verification oracle. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double): DataFrame = {
    val t = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      shingles(col(textCol), n).as("sh"))
    t.alias("a").join(t.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash + LSH near-dup pairs: signature → band keys → bucket
    * self-join for candidates → exact-Jaccard verification of candidates
    * only. With numPerms=128, bands=32 (r=4), a pair at J=0.8 is missed
    * with probability (1-0.8^4)^32 ≈ 4e-8 — effectively exact above the
    * threshold, while never comparing non-colliding documents. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 128, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val r = numPerms / bands
    val base = df.select(col(idCol).as("id"),
        shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSig(col("sh"), numPerms))

    val banded = base.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(concat_ws("_",
            transform(slice(col("sig"), b * lit(r) + lit(1), lit(r)),
              v => v.cast("string")))).as("key")))).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))

    val cand = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"))
      .distinct()

    val sets = base.select(col("id"), col("sh"))
    cand
      .join(sets.select(col("id").as("ida"), col("sh").as("sha")), "ida")
      .join(sets.select(col("id").as("idb"), col("sh").as("shb")), "idb")
      .select(col("ida"), col("idb"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  private val pow2_16: Seq[Long] = (0 until 16).map(1L << _)

  /** Per-document 64-dim SimHash sign vector: sum over words of ±1 per bit
    * of xxhash64(word). Positive component ⇒ bit set. */
  def simhashVector(text: Column): Column =
    aggregate(words(text), typedLit(Seq.fill(64)(0L)), (acc, w) =>
      zip_with(acc,
        transform(sequence(lit(0), lit(63)), i =>
          call_function("getbit", xxhash64(w), i).cast("long") * 2 - 1),
        (a, b) => a + b))

  /** SimHash near-dup pairs: 4×16-bit band keys (two docs within Hamming
    * distance 3 must agree on ≥1 band) → bucket join → exact Hamming
    * verification. Same shuffle shape as MinHash-LSH. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val p2 = typedLit(pow2_16)
    val base = df.select(col(idCol).as("id"),
      simhashVector(col(textCol)).as("sv"))
    val withBands = base.withColumn("bands",
      transform(sequence(lit(0), lit(3)), b =>
        aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, j) =>
          acc + when(element_at(col("sv"), b * lit(16) + j + lit(1)) > 0,
            element_at(p2, j + lit(1))).otherwise(lit(0L)))))

    val banded = withBands.select(col("id"), col("sv"),
      posexplode(col("bands")).as(Seq("band", "key")))
    val cand = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"))
      .distinct()

    val sets = base
    cand
      .join(sets.select(col("id").as("ida"), col("sv").as("sva")), "ida")
      .join(sets.select(col("id").as("idb"), col("sv").as("svb")), "idb")
      .select(col("ida"), col("idb"),
        size(filter(zip_with(col("sva"), col("svb"),
          (a, b) => (a > 0) =!= (b > 0)), x => x)).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
