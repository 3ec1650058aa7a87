package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chi-squared feature selection: score each (class, term) association by
  * the 2x2 contingency chi-squared statistic over DOCUMENT-LEVEL term
  * presence — the classic "which tokens identify this class" pass that
  * feeds classifier vocabularies (and pairs with the logistic classifier
  * in LinearModel).
  *
  * Shape: presence is deduped per document with array_distinct (row-local,
  * no global distinct), then everything is counts: the (class, term) table
  * is partial-aggregated, the term table re-aggregates it (no second
  * corpus pass), class totals are a bounded broadcast. All contingency
  * products run in doubles — counts at 100 TB overflow a long multiply
  * under ANSI, doubles don't.
  */
object FeatureSelection {

  /** Chi-squared score for every (classCol, term) pair, term drawn from
    * `tokensCol` (array<string>), presence counted once per document.
    * Terms below `minDocFreq` total document frequency, or present in
    * every document (zero discriminative power, degenerate denominator),
    * are dropped. `chi2` is rounded to 6 dp for engine-portable ranking.
    */
  def chi2Terms(df: DataFrame, classCol: String, tokensCol: String,
                minDocFreq: Long = 5L): DataFrame = {
    val pres = df.select(col(classCol).as("cls"),
      explode(array_distinct(col(tokensCol))).as("term"))
    val lt = pres.groupBy(col("cls"), col("term"))
      .agg(count(lit(1)).as("n_ct"))
    val tok = lt.groupBy(col("term")).agg(sum(col("n_ct")).as("n_t"))
      .filter(col("n_t") >= minDocFreq)
    val cls = df.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_c"))
    val total = cls.agg(sum(col("n_c")).as("n_docs"))
    def d(c: Column): Column = c.cast("double")
    lt.join(tok, Seq("term"))
      .join(broadcast(cls), Seq("cls"))
      .crossJoin(broadcast(total))
      .filter(col("n_t") < col("n_docs"))
      .select(col("cls"), col("term"), col("n_ct"),
        round(d(col("n_docs")) *
          pow(d(col("n_ct")) * (d(col("n_docs")) - d(col("n_c")) -
              (d(col("n_t")) - d(col("n_ct")))) -
            (d(col("n_t")) - d(col("n_ct"))) *
              (d(col("n_c")) - d(col("n_ct"))), 2) /
          (d(col("n_t")) * (d(col("n_docs")) - d(col("n_t"))) *
            d(col("n_c")) * (d(col("n_docs")) - d(col("n_c")))), 6)
          .as("chi2"))
  }
}
