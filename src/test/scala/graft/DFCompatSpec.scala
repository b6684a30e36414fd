package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the shims that have no DuckDB-oracle probe (hash
  * algorithms DuckDB lacks, DataFusion-specific array mutations). */
class DFCompatSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; DFCompat.install(s); s }

  private def one(sql: String): Any = spark.sql(sql).collect().head.get(0)

  test("digest dispatches to the named algorithm") {
    assert(one("SELECT digest('abc', 'md5')") ==
      "900150983cd24fb0d6963f7d28e17f72")
    assert(one("SELECT digest('abc', 'sha256')") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one("SELECT digest('abc', 'sha512')").toString.length == 128)
    assert(one("SELECT digest('abc', 'sha224')").toString.length == 56)
    assert(scala.util.Try(one("SELECT digest('abc', 'nosuchalgo')")).isFailure)
  }

  test("blake3 matches the published test vectors") {
    // official test-vector input pattern (bytes i % 251), input_len = 1
    assert(one("SELECT digest(X'00', 'blake3')") ==
      "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213")
    // input_len = 2 of the same pattern
    assert(one("SELECT digest(X'0001', 'blake3')") ==
      "7b7015bb92cf0b318037702a6cdd81dee41224f734684c2c122cd6359cb1ee63")
    assert(one("SELECT digest('abc', 'blake3')") ==
      "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85")
    assert(one("SELECT digest('hello world', 'blake3')") ==
      "d74981efa70a0c880b8d8c1985d075dbcbf679b99a5f9914e5aaf96b831a9e24")
    assert(one("SELECT digest('The quick brown fox jumps over the lazy dog', 'blake3')") ==
      "2f1514181aadccd913abd94cfa592701a5686ab23f8df1dff1b74710febc6d4a")
  }

  test("blake3 multi-block and multi-chunk paths (spec-derived pins)") {
    import org.apache.spark.sql.functions._
    def b3(n: Int): String = {
      val pat = Array.tabulate(n)(i => (i % 251).toByte)
      graft.functions.Blake3Kernels.blake3Hex(pat).toString
    }
    // >64 bytes: multi-block single chunk; >1024: the merkle-tree path.
    // Pinned from this implementation (whose single-chunk path is
    // vector-verified above) so any tree regression is caught.
    assert(b3(65).length == 64)
    assert(b3(1025) ==
      "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444")
    assert(b3(2048) ==
      "e776b6028c7cd22a4d0ba182a8bf62205d2ef576467e838ed6f2529b85fba24a")
    // 3 and 5 chunks exercise the odd-node promotion tree shapes
    assert(b3(3072).length == 64 && b3(5000).length == 64)
    // kernel agrees with itself through the SQL surface (codegen path)
    val viaSql = spark.range(1).select(
      expr("digest(repeat('a', 3000), 'blake3')")).collect().head.getString(0)
    val viaKernel = graft.functions.Blake3Kernels
      .blake3Hex(Array.fill[Byte](3000)('a')).toString
    assert(viaSql == viaKernel)
  }

  test("blake2b / blake2s match the RFC 7693 appendix test vectors") {
    // RFC 7693 appendix A: BLAKE2b-512("abc")
    assert(one("SELECT digest('abc', 'blake2b')") ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    // RFC 7693 appendix B: BLAKE2s-256("abc")
    assert(one("SELECT digest('abc', 'blake2s')") ==
      "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982")
    // empty-message digests (RFC reference implementation self-test values)
    assert(one("SELECT digest('', 'blake2b')") ==
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
        "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce")
    assert(one("SELECT digest('', 'blake2s')") ==
      "69217a3079908094e11121d042354a7c1f55b6482ca1a51e1b250dfd1ed0eef9")
    // multi-block input (> 128 bytes) exercises the streaming compress loop
    assert(one("SELECT digest(repeat('a', 300), 'blake2b')")
      .toString.length == 128)
    assert(one("SELECT length(digest(repeat('x', 200), 'blake2s'))") == 64)
  }

  test("numeric trunc truncates toward zero; string form stays date trunc") {
    assert(one("SELECT trunc(3.789, 2)") == 3.78)
    assert(one("SELECT trunc(-3.789, 2)") == -3.78)
    assert(one("SELECT trunc(3.789)") == 3.0)
    assert(one("SELECT trunc(3.999, 2.0)") == 3.99) // fractional literal precision
    assert(one("SELECT trunc(DATE'2024-05-17', 'MM')").toString == "2024-05-01")
    // Oracle-style multi-arg decode passes through to the Spark builtin
    assert(one("SELECT decode(2, 1, 'one', 2, 'two', 'other')") == "two")
  }

  test("make_array / string_to_array / arrow_typeof / today / to_timestamp_nanos") {
    assert(one("SELECT array_join(make_array(1, 2, 3), ',')") == "1,2,3")
    assert(one("SELECT array_join(string_to_array('a.b.c', '.'), '|')") == "a|b|c")
    assert(one("SELECT arrow_typeof(1)") == "int")
    assert(one("SELECT today() = current_date()") == true)
    assert(one("SELECT to_timestamp_nanos(1500000000000000000)").toString
      == "2017-07-14 02:40:00.0")
  }

  test("encode/decode dispatch: base64/hex codecs vs charset fallback") {
    assert(one("SELECT encode('abc', 'base64')") == "YWJj")
    assert(one("SELECT encode('abc', 'hex')") == "616263")
    assert(one("SELECT CAST(decode(encode('abc', 'base64'), 'base64') AS STRING)") == "abc")
    assert(one("SELECT CAST(decode('616263', 'hex') AS STRING)") == "abc")
    // non-codec second arg → Spark's charset semantics survive
    assert(one("SELECT CAST(decode(encode('abc', 'utf-8'), 'utf-8') AS STRING)") == "abc")
  }

  test("current_time returns a query-constant HH:mm:ss string (no TIME type)") {
    val t = one("SELECT current_time()").toString
    assert(t.matches("\\d{2}:\\d{2}:\\d{2}"), t)
    // query-constant: every row of a multi-row scan sees the same value
    val distinct = spark.sql(
      "SELECT count(DISTINCT current_time()) FROM range(1000)")
      .collect().head.getLong(0)
    assert(distinct == 1L)
  }

  test("sha2 family via sha2() covers 224/384/512") {
    assert(one("SELECT sha2('abc', 384)").toString.length == 96)
  }

  test("generate_series is inclusive like DataFusion") {
    assert(one("SELECT array_join(generate_series(1, 5), ',')") == "1,2,3,4,5")
    assert(one("SELECT array_join(generate_series(0, 10, 5), ',')") == "0,5,10")
  }

  test("array_replace family: first / all / first-n") {
    assert(one("SELECT array_join(array_replace(array(1,2,1,1), 1, 9), ',')") ==
      "9,2,1,1")
    assert(one("SELECT array_join(array_replace_all(array(1,2,1,1), 1, 9), ',')") ==
      "9,2,9,9")
    assert(one("SELECT array_join(array_replace_n(array(1,2,1,1), 1, 9, 2), ',')") ==
      "9,2,9,1")
  }

  test("array_positions lists every match index") {
    assert(one("SELECT array_join(array_positions(array('a','b','a'), 'a'), ',')") ==
      "1,3")
    assert(one("SELECT size(array_positions(array('a','b'), 'z'))") == 0)
  }

  test("array_resize truncates or pads with the fill value") {
    assert(one("SELECT array_join(array_resize(array(1,2,3), 2, 0), ',')") == "1,2")
    assert(one("SELECT array_join(array_resize(array(1,2), 4, 7), ',')") == "1,2,7,7")
  }

  test("array_pop/push/prepend/dims shims") {
    assert(one("SELECT array_join(array_pop_back(array(1,2,3)), ',')") == "1,2")
    assert(one("SELECT array_join(array_pop_front(array(1,2,3)), ',')") == "2,3")
    assert(one("SELECT array_join(array_push_back(array(1,2), 3), ',')") == "1,2,3")
    assert(one("SELECT array_join(array_prepend(0, array(1,2)), ',')") == "0,1,2")
    assert(one("SELECT element_at(array_dims(array(1,2,3)), 1)") == 3)
    assert(one("SELECT array_ndims(array(1,2))") == 1)
  }

  test("to_unixtime returns fractional epoch seconds") {
    assert(one("SELECT to_unixtime(TIMESTAMP '1970-01-01 00:01:00')") == 60.0)
  }

  test("curation kernels are reachable from SQL (service surface)") {
    // unicode_normalize: decomposed e+combining-acute composes under NFC
    assert(one("SELECT unicode_normalize('e\u0301cole')") == "\u00e9cole")
    assert(one("SELECT unicode_normalize('\ufb01le', 'NFKC')") == "file")
    assert(one("SELECT unicode_normalize('\ufb01le', 'nfkc')") == "file")
    // char_entropy: 'aab' → log2(3) − 2/3
    assert(math.abs(one("SELECT char_entropy('aab')")
      .asInstanceOf[Double] - 0.9182958340544896) < 1e-12)
    // char_grams: padded trigrams of 'ab' → [' ab', 'b ']... first gram
    assert(one("SELECT element_at(char_grams('ab'), 1)") == " ab")
    assert(one("SELECT size(char_grams('ab', 2))") == 3)
    // strip_html: same chain as the operator
    assert(one("SELECT strip_html('<p>hi</p><!-- c --> &amp; bye')") ==
      "hi & bye")
    // hashed_margin: md5('spam') bucket is 5 at dim 8 (0xe09f6a75 % 8),
    // so a weight of 10 there scores 'spam spam' = 20; 'SPAM' folds
    // case; a non-foldable weights arg must be rejected
    assert(one("SELECT hashed_margin('spam spam', array(0,0,0,0,0,10,0,0))")
      == 20L)
    assert(one("SELECT hashed_margin('SPAM ham', array(0,0,0,0,0,10,0,0))")
      == 10L)
    intercept[Exception] {
      one("SELECT hashed_margin('x', array(cast(rand() * 0 as int)))")
    }
    // vector kernels: 3-4-5 triangle — dot((3,4),(3,4)) = 25, norm 5;
    // orthogonal unit vectors → cosine 0; parallel → 1
    assert(one("SELECT dot_product(array(3.0, 4.0), array(3.0, 4.0))")
      == 25.0)
    assert(one("SELECT vec_norm(array(3.0, 4.0))") == 5.0)
    assert(one("SELECT cosine_sim(array(1.0, 0.0), array(0.0, 2.0))")
      == 0.0)
    // parallel vectors: sqrt(5)*sqrt(20) is not exactly 10 in doubles
    assert(math.abs(one("SELECT cosine_sim(array(1.0, 2.0), array(2.0, 4.0))")
      .asInstanceOf[Double] - 1.0) < 1e-12)
    // undefined input is NULL, never a silent wrong answer: a NULL
    // element would read as 0.0 in the kernel, mismatched lengths
    // would truncate to the shorter
    assert(one("SELECT dot_product(array(1.0, NULL), array(5.0, 7.0))")
      == null)
    assert(one("SELECT dot_product(array(1.0, 2.0, 3.0), array(1.0, 2.0))")
      == null)
    assert(one("SELECT vec_norm(array(1.0, NULL))") == null)
    assert(one("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0))")
      == null)
  }

  test("sketch kernels are reachable from SQL (service surface)") {
    // count_min_sketch: an aggregate — total hits = rows × depth, and
    // estimating the seen term via the same md5-slice recipe is exact
    // with no collisions at width 64
    val sums = spark.sql(
      """SELECT aggregate(cms, 0L, (a, x) -> a + x) AS total,
        |  least(
        |    element_at(cms, cast(conv(substring(md5('a'), 1, 8), 16, 10) % 64 as int) + 1),
        |    element_at(cms, cast(64 + conv(substring(md5('a'), 9, 8), 16, 10) % 64 as int) + 1)) AS est
        |FROM (SELECT count_min_sketch(t, 2, 64) AS cms
        |      FROM VALUES ('a'), ('a'), ('b') AS v(t))""".stripMargin)
      .collect().head
    assert(sums.getLong(0) == 6L && sums.getLong(1) == 2L)
    // project_quant: out_dim 2 over a 4-dim vector matches the operator
    val m = graft.operators.RandomProjection.signMatrix(2, 4)
    val q = Seq(1.5, -2.0, 0.25, 3.0).map(x => math.floor(x * (1 << 20)).toLong)
    val expect = m.map(row => row.zip(q).map { case (s, v) => s * v }.sum)
    val got = spark.sql(
      "SELECT project_quant(array(1.5D, -2.0D, 0.25D, 3.0D), 2, 4) AS p")
      .collect().head.getSeq[Long](0)
    assert(got == expect)
  }
}
