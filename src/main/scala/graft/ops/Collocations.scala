package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: score adjacent token pairs by pointwise mutual
  * information, PMI = ln( p(ab) / (p(a) p(b)) ) — the phrase-detection
  * pass (word2vec-style "new_york" merging, tokenizer-vocabulary
  * candidates) over a tokenized corpus.
  *
  * Shape: one explode into adjacent bigrams, then everything is counts
  * over the bounded vocab/bigram tables — both totals come from
  * re-aggregating those tables (no second corpus pass) and broadcast
  * back as 1-row frames; the unigram joins hit the vocabulary table.
  * The min-count floor applies AFTER the totals, so probabilities are
  * true corpus shares, and it kills PMI's rare-pair bias before output.
  */
object Collocations {

  /** PMI over adjacent bigrams of `tokensCol` (an array<string> column).
    * Returns (w1, w2, c_bigram, pmi) for pairs seen at least `minCount`
    * times. `pmi` is rounded to 6 dp so downstream ranking can't diverge
    * on last-ulp ln() differences.
    */
  def pmiBigrams(df: DataFrame, tokensCol: String,
                 minCount: Long = 5L): DataFrame = {
    val toks = col(tokensCol)
    val bigrams = when(size(toks) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))
    val uni = df.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val bi = df.select(explode(bigrams).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bigram"))
    val nTok = uni.agg(sum(col("c_w")).as("n_tokens"))
    val nBi = bi.agg(sum(col("c_bigram")).as("n_bigrams"))
    bi.filter(col("c_bigram") >= minCount)
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_bigram"),
        round(log((col("c_bigram").cast("double") / col("n_bigrams")) /
          ((col("c_1").cast("double") / col("n_tokens")) *
            (col("c_2").cast("double") / col("n_tokens")))), 6).as("pmi"))
  }
}
