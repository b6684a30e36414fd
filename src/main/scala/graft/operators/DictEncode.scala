package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-dense dictionary encoding: every distinct token gets a
  * dense int id ranked by (frequency DESC, token ASC) — id 1 is the most
  * common token, ties break lexically, so the dictionary is a pure
  * function of the corpus (bit-identical across engines and cluster
  * sizes; the determinism recipe every tokenizer vocabulary builds on).
  *
  * Scale shape: token counts are one map-side-combined aggregate; the
  * dense-rank window runs single-partition over the DISTINCT-token
  * relation — that is the model artifact (a vocabulary), not the corpus,
  * the same O(model) concession as [[Similarity.kmeansFit]]'s driver
  * centroids; at 100 TB a vocabulary is ~10⁶ rows, trivially
  * single-partition. Encoding joins tokens to the dictionary on the
  * token (broadcast when the dictionary is small) and rebuilds each
  * document's id sequence in token order with a bounded per-doc collect.
  */
object DictEncode {

  /** (token, id, n) dictionary over whitespace tokens of `textCol`. */
  def dictionary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .withColumn("id", row_number()
        .over(Window.orderBy(col("n").desc, col("token"))))

  /** (idCol, ids array<int>) — each document's token sequence encoded
    * through [[dictionary]], original token order preserved. */
  def encode(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dict = dictionary(df, textCol)
    val tokens = df.select(col(idCol),
      posexplode(Dedup.words(col(textCol))).as(Seq("pos", "token")))
    tokens.join(dict.select("token", "id"), "token")
      .groupBy(idCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("id")))),
        x => x.getField("id")).as("ids"))
  }
}
