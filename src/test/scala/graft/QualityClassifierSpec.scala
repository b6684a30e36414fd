package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** Trained quality classifier: batch-perceptron dynamics on
  * hand-computable corpora (exact integer weights and margins), the
  * false-positive subtraction sweep, separable-corpus convergence,
  * determinism, and the no-word margin-0 contract. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def modelMap(m: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    m.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def scored(docs: Seq[(Long, String)],
      model: org.apache.spark.sql.DataFrame): Map[Long, (Long, Boolean)] =
    QualityClassifier.score(docs.toDF("doc_id", "text"), "doc_id", "text",
        model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

  test("one-feature corpus: exact weights and margins (hand-computed)") {
    // iter 1 (w=0): only the positive is misclassified -> w[spam] += 2
    // iter 2: d1 z=4>0 correct, d2 z=0 correct -> converged
    val docs = Seq(1L -> "spam spam", 2L -> "ham").toDF("doc_id", "text")
      .withColumn("y", when(col("doc_id") === 1, 1).otherwise(0))
    val model = QualityClassifier.train(docs, "doc_id", "text", "y")
    val spamB = 3768543861L % 256 // first 8 md5 hex of "spam" = 0xe09f6a75
    assert(modelMap(model) == Map(spamB -> 2L))
    val out = scored(Seq(1L -> "spam spam", 2L -> "ham"), model)
    assert(out == Map(1L -> ((4L, true)), 2L -> ((0L, false))))
  }

  test("false-positive subtraction: shared background weight returns " +
      "to zero and zero weights leave the model") {
    // iter 1: w[spam]+=1, w[common]+=1 (d1 is the only error)
    // iter 2: d2 z=1>0 false positive -> w[common]-=1
    // iter 3: no errors -> early exit; zero weight filtered from model
    val docs = Seq(1L -> "spam common", 2L -> "common").toDF("doc_id", "text")
      .withColumn("y", when(col("doc_id") === 1, 1).otherwise(0))
    val model = QualityClassifier.train(docs, "doc_id", "text", "y")
    val spamB = 3768543861L % 256
    assert(modelMap(model) == Map(spamB -> 1L))
    val out = scored(Seq(1L -> "spam common", 2L -> "common"), model)
    assert(out == Map(1L -> ((1L, true)), 2L -> ((0L, false))))
  }

  test("separable corpus converges to zero training error") {
    val pos = (0L until 20L).map(i =>
      (i, s"free offer winner bonus doc$i item${i % 5}", 1))
    val neg = (20L until 40L).map(i =>
      (i, s"regular prose about doc$i item${i % 5} today", 0))
    val docs = (pos ++ neg).toDF("doc_id", "text", "y")
    val model = QualityClassifier.train(docs, "doc_id", "text", "y",
      dim = 512, iters = 10)
    val out = QualityClassifier.score(docs, "doc_id", "text", model, dim = 512)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
      .select(col("doc_id"), col("y"), col("pred")).collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getBoolean(2) == (r.getInt(1) == 1),
        s"doc ${r.getLong(0)} predicted ${r.getBoolean(2)} for y=${r.getInt(1)}")
    }
  }

  test("training is deterministic: two runs yield identical models") {
    val docs = (0L until 30L).map(i => (i,
      if (i % 3 == 0) s"spamword junk doc$i shared${i % 4}"
      else s"clean text doc$i shared${i % 4}",
      if (i % 3 == 0) 1 else 0)).toDF("doc_id", "text", "y")
    val m1 = modelMap(QualityClassifier.train(docs, "doc_id", "text", "y"))
    val m2 = modelMap(QualityClassifier.train(docs, "doc_id", "text", "y"))
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("scoreProjected kernel equals the relational score on the corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        concat(col("text"), when(col("doc_id") % 3 === 0,
          lit(" freeoffer winbig bonusx bonusx")).otherwise(lit("")))
          .as("text"),
        (col("doc_id") % 3 === 0).cast("int").as("y"))
    val model = QualityClassifier.train(docs, "doc_id", "text", "y")
    val rel = QualityClassifier.score(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    val projDf = QualityClassifier.scoreProjected(docs, "doc_id", "text", model)
    val proj = projDf
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(rel.nonEmpty && rel == proj)
    assert(rel.exists(_._2 != 0L), "planted signal must move some margin")
    // over a real scan (a local relation constant-folds the projection
    // away) the scoring is a zero-exchange whole-stage-codegen pass
    val plan = projDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    // the kernel projection rides inside a codegen stage (the `*(n)`
    // star prefix in the executed plan's compact notation)
    assert(plan.linesIterator.exists(l =>
      l.contains("hashed_margin") && l.trim.startsWith("*")), plan)
  }

  test("scoreProjected matches score on null/empty/multibyte text") {
    val train = Seq((1L, "spam spam", 1), (2L, "ham", 0))
      .toDF("doc_id", "text", "y")
    val model = QualityClassifier.train(train, "doc_id", "text", "y")
    val odd = Seq((3L, null.asInstanceOf[String]), (4L, "   "),
      (5L, "spamé世 spam"), (6L, "SPAM"))
      .toDF("doc_id", "text")
    val rel = QualityClassifier.score(odd, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val projDf = QualityClassifier.scoreProjected(odd, "doc_id", "text", model)
    val proj = projDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rel == proj)
    assert(proj.contains((6L, 2L, true)), "case folding must match lower()")
  }

  test("prCurve: hand-computed thresholds; cumsum matches single-col path") {
    val scored = Seq((1L, 10L, 1), (2L, 10L, 0), (3L, 5L, 1), (4L, 0L, 0))
      .toDF("doc_id", "margin", "y")
    val out = QualityClassifier.prCurve(scored).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out == Map(
      10L -> ((1L, 1L, 0.5, 0.5)),
      5L -> ((2L, 1L, 2.0 / 3, 1.0)),
      0L -> ((2L, 2L, 0.5, 1.0))))
    // the multi-column cumsum must agree with the original single-column
    // operator on each accumulated column
    val per = Seq((1L, 3L, 7L), (2L, 4L, 1L), (3L, 5L, 2L))
      .toDF("ord", "a", "b")
    val multi = graft.operators.Packing
      .cumsumDistributedCols(per, "ord", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val single = graft.operators.Packing
      .cumsumDistributed(per, "ord", "a")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(multi == Set((1L, 3L, 7L), (2L, 7L, 8L), (3L, 12L, 10L)))
    assert(single == Set((1L, 3L), (2L, 7L), (3L, 12L)))
  }

  test("docs with no words score margin 0 / pred false and are " +
      "retained in the output") {
    val train = Seq((1L, "spam spam", 1), (2L, "ham", 0))
      .toDF("doc_id", "text", "y")
    val model = QualityClassifier.train(train, "doc_id", "text", "y")
    val out = scored(Seq(3L -> "", 4L -> "   ", 5L -> "spam"), model)
    assert(out == Map(3L -> ((0L, false)), 4L -> ((0L, false)),
      5L -> ((2L, true))))
  }
}
