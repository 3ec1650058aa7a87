package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TopK

/** BM25 keyword retrieval over a document corpus — the search primitive a
  * training-data pipeline needs for decontamination probes ("which corpus
  * docs match this benchmark question?") and corpus exploration.
  *
  * Scale shape (100 TB corpus, small query set):
  *   - the corpus text column is scanned ONCE to build posting lists; after
  *     tokenization only (term, doc_id, tf, dl) rows — ids and small ints —
  *     ever shuffle, never the text;
  *   - the query-term relation is tiny and is BROADCAST into the postings
  *     join, so candidate generation touches only postings of query terms
  *     (index-at-rest would make this a lookup; here it is one pruned scan);
  *   - corpus statistics (N, total tokens) ride a 1-row broadcast relation —
  *     no driver-side action;
  *   - per-(query, doc) scores aggregate with partial (map-side) combine,
  *     and the final top-k uses the bounded [[TopK]] aggregator, not a
  *     window — each partition emits at most k candidates per query.
  *
  * Determinism: per-term contributions are fixed to integer micro-units
  * BEFORE the per-document sum, so the (query, doc) score is an
  * order-independent BIGINT — float summation order can never flip a rank
  * between this engine and the oracle. The only float op left is one `ln`
  * per (query term), rounded at 1e-6 granularity.
  */
object Search {

  /** Search tokenizer, shared verbatim with the DuckDB oracle: lowercase,
    * split on runs of non-alphanumerics, drop empties.
    */
  def searchTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+", -1), t => length(t) > 0)

  /** Posting lists: one row per (term, doc) with exact integer term
    * frequency `tf` and document length `dl`. The text column is consumed
    * map-side; only id+int rows reach the shuffle.
    */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        searchTokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Lucene-style BM25 top-k: `queries` is a (query_id, query_text)
    * relation (small — it is broadcast). Returns
    * (query_id, doc_id, score, rank) with rank 1..k per query, ranked by
    * (score desc, doc_id asc).
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    * tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val post = postings(docs, textCol, idCol)

    // Distinct query terms; duplicates within one query score once.
    val qterms = queries.select(col("query_id"),
        explode(array_distinct(searchTokens(col("query_text")))).as("term"))
      .distinct()

    // Corpus stats as a 1-row broadcast relation (single agg job, no
    // collect): N counts ALL docs (a token-less doc still grows N), and
    // avgdl = total tokens / N.
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(searchTokens(col(textCol))).cast("long")).as("total_toks"))

    // Postings pruned to query terms only, then per-term document
    // frequency over the pruned set (identical to df over the full corpus
    // — df is a property of the term).
    val matched = post.join(broadcast(qterms.select("term").distinct()),
      Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df_ = matched.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // one row per (term, doc) => count = df

    val contrib = matched
      .join(broadcast(df_), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl",
        col("total_toks").cast("double") / col("n_docs").cast("double"))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("__tfn",
        col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("__avgdl"))))
      .withColumn("__micro",
        round(col("__idf") * col("__tfn") * lit(1e6), 0).cast("long"))

    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__micro")).as("score_micro"))

    val top = TopK.perGroup(
      scored.withColumn("__s", col("score_micro").cast("double")),
      "query_id", "__s", "doc_id", "doc_id", k)

    top.select(col("group").as("query_id"),
      col("tie").as("doc_id"),
      (col("score").cast("long").cast("double") / lit(1e6)).as("score"),
      col("rank"))
  }

  /** The oracle-side tokenizer fragment (DuckDB), kept adjacent to
    * [[searchTokens]] so the two dialects stay in lockstep.
    */
  def searchTokensSqlFrom(table: String, idCol: String, textCol: String): String =
    s"SELECT $idCol, unnest(string_split_regex(lower($textCol), '[^a-z0-9]+')) AS term FROM $table"
}
