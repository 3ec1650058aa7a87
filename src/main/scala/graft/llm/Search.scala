package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TopK

/** BM25 keyword retrieval over a document corpus — the search primitive a
  * training-data pipeline needs for decontamination probes ("which corpus
  * docs match this benchmark question?") and corpus exploration.
  *
  * Two forms:
  *   - [[bm25TopK]] — ad-hoc: two map-only passes over the text (posting
  *     lists + the 1-row stats aggregate) for a one-shot query batch;
  *   - [[writeSearchIndex]] / [[querySearchIndex]] — index at rest: the
  *     postings are written term-sorted once, and each query batch reads
  *     ONLY the row groups of its own terms (parquet min/max + IN
  *     pushdown) — zero passes over the corpus text per batch. This is
  *     the 100 TB shape when the corpus is queried more than once.
  *
  * Shared scale properties:
  *   - after tokenization only (term, doc_id, tf, dl) rows — ids and small
  *     ints — ever shuffle, never the text;
  *   - the query-term relation is tiny and is BROADCAST into the postings
  *     join;
  *   - corpus statistics (N, total tokens) ride a 1-row broadcast relation;
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
    // Corpus stats as a 1-row broadcast relation: N counts docs with at
    // least one token (a token-less doc can never match and contributes
    // nothing to avgdl).
    val stats = docs.agg(
      count(when(size(searchTokens(col(textCol))) > 0, 1)).as("n_docs"),
      sum(size(searchTokens(col(textCol))).cast("long")).as("total_toks"))
    rank(post, stats, queries, k, k1, b)
  }

  /** Persist the inverted index: term-sorted postings (so a term filter
    * prunes row groups on read) plus the 1-row corpus stats. Build once;
    * query batches then never touch the corpus text.
    */
  def writeSearchIndex(docs: DataFrame, textCol: String, idCol: String,
                       path: String): Unit = {
    postings(docs, textCol, idCol)
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/postings")
    docs.agg(
        count(when(size(searchTokens(col(textCol))) > 0, 1)).as("n_docs"),
        sum(size(searchTokens(col(textCol))).cast("long")).as("total_toks"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against a persisted [[writeSearchIndex]] layout. The query
    * batch's distinct terms (a bounded driver-side set — a query batch is
    * small by definition) become an IN filter pushed into the postings
    * scan, so only matching row groups of the term-sorted files are read.
    */
  def querySearchIndex(spark: SparkSession, path: String, queries: DataFrame,
                       k: Int, k1: Double = 1.2,
                       b: Double = 0.75): DataFrame = {
    val terms = queries
      .select(explode(array_distinct(searchTokens(col("query_text"))))
        .as("term"))
      .distinct().collect().map(_.getString(0)).toSeq
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$path/stats")
    rank(post, stats, queries, k, k1, b, dedupeQueries = true)
  }

  /** Shared scoring tail: prune postings to query terms, df over the
    * pruned set (df is a property of the term, so pruning doesn't change
    * it), integer micro-unit contributions, bounded top-k.
    *
    * `dedupeQueries`: queries with an identical distinct-term SET share
    * scores exactly (BM25 is a sum over the set), so the serving path
    * scores ONE representative per set and replicates results over a
    * broadcast map at the end — repeated probes (the decontamination
    * pattern of re-issuing the same benchmark questions per corpus
    * snapshot) then cost one scoring pass, not one per copy. The dedup
    * costs one extra tiny stage + broadcast join per call (~0.3 s fixed,
    * measured), which a large or repeated serving batch amortizes but a
    * small one-shot ad-hoc batch would only pay — so [[bm25TopK]] keeps
    * the direct plan and [[querySearchIndex]] dedupes.
    */
  private def rank(post: DataFrame, stats: DataFrame, queries: DataFrame,
                   k: Int, k1: Double, b: Double,
                   dedupeQueries: Boolean = false): DataFrame = {
    // dropDuplicates(query_id): a batch that carries the same query row
    // twice must stay idempotent — without this, the direct path would
    // double-count its contributions (scores exactly 2x) and the dedupe
    // path's replicate map would emit each result row once per copy. The
    // dedup aggregates the tiny query batch, never the postings.
    val qsets = queries.select(col("query_id"),
      sort_array(array_distinct(searchTokens(col("query_text"))))
        .as("__tset"))
      .dropDuplicates("query_id")
    // When dedupeQueries, score only one representative query_id per term
    // set; qmap replicates its rows back to every duplicate at the end.
    // Renamed columns (and the group-key rename inside TopK) keep that
    // replicate join free of self-join ambiguity — top and qmap both
    // descend from `queries`.
    val (qterms, qmap) =
      if (dedupeQueries) {
        val reps = qsets.groupBy(col("__tset"))
          .agg(min(col("query_id")).as("__rep"))
        (reps.select(col("__rep").as("query_id"),
           explode(col("__tset")).as("term")),
         Some(qsets.join(reps, Seq("__tset"))
           .select(col("query_id").as("__orig_qid"), col("__rep"))))
      } else
        (qsets.select(col("query_id"), explode(col("__tset")).as("term")),
         None)

    val matched = post.join(broadcast(qterms.select("term").distinct()),
      Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df_ = matched.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // one row per (term, doc) => count = df

    // The BM25 contribution of a (term, doc) posting is query-independent,
    // so compute the integer micro-unit ONCE per matched posting, BEFORE
    // the per-query fan-out. The fan-out join and the (query, doc) sum —
    // the batch-scaling hot path, linear in sum over queries of matched
    // postings — then ship and evaluate nothing but narrow
    // (term, doc_id, micro-long) rows, no per-row transcendentals.
    val tdMicro = matched
      .join(broadcast(df_), Seq("term"))
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
      .select(col("term"), col("doc_id"),
        round(col("__idf") * col("__tfn") * lit(1e6), 0).cast("long")
          .as("__micro"))

    // Serving path only: repartition the NARROW per-posting rows by doc
    // BEFORE the query fan-out. hash(doc_id) satisfies the
    // (query_id, doc_id) clustering the score sum needs, so the fanned
    // relation — |postings| x queries-per-term rows, the largest in the
    // whole plan — aggregates in place with NO exchange, and the bounded
    // TopK partial then ships only k rows per (query, partition). Without
    // this the plan shuffles the fanned rows themselves (~1B at a
    // 1000-query batch over a 1M-doc corpus). Ad-hoc small batches skip
    // it: fan-out there is a handful of queries, and the extra stage is
    // pure fixed latency (~0.2 s measured at sf0.1).
    val tdScoring =
      if (dedupeQueries) tdMicro.repartition(col("doc_id")) else tdMicro

    val scored = tdScoring
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__micro")).as("score_micro"))

    val top = TopK.perGroup(
      scored.withColumn("__s", col("score_micro").cast("double")),
      "query_id", "__s", "doc_id", "doc_id", k)

    val scoreCol =
      (col("score").cast("long").cast("double") / lit(1e6)).as("score")
    qmap match {
      case Some(m) =>
        top.join(broadcast(m), col("group") === col("__rep"))
          .select(col("__orig_qid").as("query_id"),
            col("tie").as("doc_id"), scoreCol, col("rank"))
      case None =>
        top.select(col("group").as("query_id"),
          col("tie").as("doc_id"), scoreCol, col("rank"))
    }
  }

  /** The oracle-side tokenizer fragment (DuckDB), kept adjacent to
    * [[searchTokens]] so the two dialects stay in lockstep.
    */
  def searchTokensSqlFrom(table: String, idCol: String, textCol: String): String =
    s"SELECT $idCol, unnest(string_split_regex(lower($textCol), '[^a-z0-9]+')) AS term FROM $table"

  /** Sparse TF-IDF cosine similarity between document PAIRS — the
    * lexical doc-doc near-match pass (plagiarism / boilerplate family
    * detection) next to the set-based n-gram Jaccard in Dedup and the
    * dense embedding cosine in Similarity. idf = ln(N/df) over the
    * df-pruned vocabulary; norms and dots both live in that pruned
    * space, so the df cap (which bounds every posting list, and with it
    * the pair join) is part of the scoring definition, not an
    * approximation bolted on.
    *
    * Shape: one postings pass (text consumed map-side), df table
    * re-aggregated from it; the pair join ships (term, id, weight) rows
    * only, bounded per term by maxDf, then partial-aggregates straight
    * to (idA, idB, dot). Threshold applies to the ROUNDED cosine so an
    * external oracle keeps the identical pair set.
    */
  def tfidfPairs(docs: DataFrame, textCol: String, idCol: String,
                 minDf: Long = 2L, maxDf: Long = 400L,
                 threshold: Double = 0.3): DataFrame = {
    val post = postings(docs, textCol, idCol)
    val n = docs.agg(count(lit(1)).as("__n"))
    val dfT = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    val w = post.join(dfT, Seq("term")).crossJoin(broadcast(n))
      .select(col("term"), col("doc_id"),
        (col("tf").cast("double") *
          log(col("__n").cast("double") / col("df"))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    w.select(col("term"), col("doc_id").as("idA"), col("w").as("wa"))
      .join(w.select(col("term"), col("doc_id").as("idB"), col("w").as("wb")),
        Seq("term"))
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB")).agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("idA"), col("norm").as("na")),
        Seq("idA"))
      .join(norms.select(col("doc_id").as("idB"), col("norm").as("nb")),
        Seq("idB"))
      .select(col("idA"), col("idB"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
