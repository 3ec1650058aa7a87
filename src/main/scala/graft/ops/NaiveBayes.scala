package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes with add-1 smoothing — the generative,
  * counts-only text classifier (complement to the discriminative
  * logistic-GD classifier in LinearModel): train is ONE pass of
  * partial-aggregated (class, token) counts; scoring is one token-keyed
  * join, so nothing driver-side ever holds the vocabulary.
  *
  * The score uses the algebraic split
  *   score(d, c) = logprior(c) + |d| * fallback(c)
  *               + sum_{t in d, (t,c) in model} cnt_t * ln(c_tc + 1)
  * where fallback(c) = ln(1 / (tot_c + V)): unseen (token, class) pairs
  * never need model rows (the missing-row case IS the fallback term), so
  * the join is inner on the observed model and each class's correction
  * reduces to ln(count + 1) — integer-derived, engine-portable.
  */
object NaiveBayes {

  /** Train on `train`, score every `eval` document against every train
    * class. Returns (idCol, cls, score) with `score` the per-class
    * log-posterior ROUNDED to 6 dp so downstream argmax ranking cannot
    * diverge on last-ulp sum-order differences. Documents with zero
    * tokens are dropped (no evidence either way), matching the
    * counts-table formulation on any engine.
    */
  def scores(train: DataFrame, eval: DataFrame, idCol: String,
             classCol: String, tokensCol: String): DataFrame = {
    val trt = train.select(col(classCol).as("cls"),
      explode(col(tokensCol)).as("tok"))
    val lt = trt.groupBy(col("cls"), col("tok"))
      .agg(count(lit(1)).as("c_ct"))
    val totl = lt.groupBy(col("cls")).agg(sum(col("c_ct")).as("tot_c"))
    val vocab = lt.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val clsd = train.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_c"))
    val d = clsd.agg(sum(col("n_c")).as("d"))
    val stats = clsd.join(totl, Seq("cls"))
      .crossJoin(d).crossJoin(vocab)
      .select(col("cls"),
        log(col("n_c").cast("double") / col("d")).as("logprior"),
        log(lit(1.0) / (col("tot_c") + col("v")).cast("double"))
          .as("fallback"))
    val evc = eval.select(col(idCol).as("id"), explode(col(tokensCol)).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("cnt"))
    val evtot = evc.groupBy(col("id"))
      .agg(sum(col("cnt")).as("total_cnt"))
    val adj = evc.join(lt, Seq("tok"))
      .groupBy(col("id"), col("cls"))
      .agg(sum(col("cnt").cast("double") * log(col("c_ct") + lit(1)))
        .as("adj"))
    evtot.crossJoin(broadcast(stats))
      .join(adj, Seq("id", "cls"), "left")
      .select(col("id").as(idCol), col("cls"),
        round(col("logprior") + col("total_cnt") * col("fallback") +
          coalesce(col("adj"), lit(0.0)), 6).as("score"))
  }
}
