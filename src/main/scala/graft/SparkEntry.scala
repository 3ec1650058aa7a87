package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.functions.{TextFunctions => TF, UrlFunctions => UF, VectorFunctions => VF}
import graft.llm.{Bpe, Dedup, Multimodal, Pq, Search, Similarity}

/** Driver contract: the engine's declared query inventory (one entry per
  * implemented operator from SURVEY.md §2 plus the LLM-pipeline additions)
  * and, for each SQL-expressible query, the equivalent DuckDB SQL oracle.
  *
  * Parity rules shared by every (query, oracle) pair:
  *   - identical output column names and types (counts as BIGINT, ratios as
  *     DOUBLE rounded so double-summation order can't flip a hash);
  *   - identical total ordering (every ORDER BY ends in a unique key);
  *   - regexes written in the Java-regex/RE2 common dialect.
  */
object SparkEntry {

  /** Typed row for the A20 typed-source round trip (q75). */
  final case class SupplierTyped(s_suppkey: Long, s_name: String,
                                 s_nationkey: Int, s_acctbal: Double)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Deterministic per-query scratch dir for queries that stage external
    * write locations (q70/q71); wiped and recreated on every call so the
    * queries stay idempotent across Verify/Bench repeats.
    */
  private def scratchDir(name: String): String = {
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-scratch/$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (root.exists()) rm(root)
    root.mkdirs()
    root.getAbsolutePath
  }

  /** events with `ts` normalized to TimestampType, whatever the generator
    * emitted: TIMESTAMP(NANOS) reads as a nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong` (`div 1000` integral keeps
    * microsecond precision exactly); TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * reads as TIMESTAMP_NTZ and is cast in the UTC session.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] with isAdjustedToUTC=false reads as NTZ; the session
        // time zone is UTC, so the cast to TimestampType preserves the wall
        // clock and unix_micros matches DuckDB's epoch_us on the same file.
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** documents ∪ mutated near-duplicate copies (id+100000, first 20 chars
    * dropped) — the deterministic corpus used by the near-dup queries so
    * they provably emit pairs even on an all-distinct source table.
    */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.union(d.select(col("doc_id") + 100000L, expr("substring(text, 21)")))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational core (SURVEY.md §2C: aggregation) -------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_filter_sum" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    // ---- joins (SURVEY.md §2C: equi/semi/anti/broadcast) ----------------
    "q03_topk_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q04_semi_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .countBy(Seq("o_orderpriority"), "order_count")
    }),

    "q05_join5_agg" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1997-01-01"))
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q06_anti_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .countBy(Seq("c_mktsegment"), "n_customers")
    }),

    "q07_broadcast_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // ---- window functions ----------------------------------------------
    "q08_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("rank"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    "q09_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- distinct aggregates / grouping sets / set ops / sort-limit ----
    "q10_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    "q11_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
          coalesce(col("n_name"), lit("ALL")).as("n_name"), col("n_customers"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q12_setops" -> ((s, dir) => {
      val a = t(s, dir, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_nationkey").as("nk")).distinct()
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      val ex = t(s, dir, "nation").filter(col("n_regionkey") === 0)
        .select(col("n_nationkey").as("nk"))
      a.union(b).distinct().except(ex).orderBy(col("nk"))
    }),

    "q13_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- reference dataflow surface (SURVEY.md §2B) ---------------------
    "q14_remove_where" -> ((s, dir) => {
      t(s, dir, "part")
        .removeWhere(col("p_size") > 30 || col("p_brand").like("Brand#4%"))
        .identitySelect("p_partkey", "p_brand", "p_size")
        .orderBy(col("p_partkey"))
    }),

    "q15_coerce" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .coerceDdl("l_linenumber" -> "bigint")
        .withColumn("l_orderkey_str", col("l_orderkey").cast("string"))
        .identitySelect("l_orderkey", "l_linenumber", "l_orderkey_str")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q16_identity_select" -> ((s, dir) => {
      t(s, dir, "customer")
        .identitySelect("c_custkey", "c_name", "c_mktsegment")
        .orderBy(col("c_custkey"))
    }),

    "q17_countby" -> ((s, dir) => {
      t(s, dir, "lineitem").countBy(Seq("l_returnflag", "l_linestatus"))
    }),

    "q18_wordcount" -> ((s, dir) => {
      t(s, dir, "documents")
        .splitGenerate(col("text"), """[ \[\]\(\),.]""")
        .countBy(Seq("token"))
    }),

    // ---- LLM-pipeline: dedup -------------------------------------------
    "q19_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(concat_ws(" ", TF.normTokens(col("text"))).as("__norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
        .orderBy(col("keep_id"))
    }),

    // ---- LLM-pipeline: text analysis -----------------------------------
    "q20_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "q21_text_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TF.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TF.stopwordRatio(col("text")), 6).as("stopword_ratio"),
          round(TF.meanTokenLen(col("text")), 6).as("mean_token_len"),
          round(TF.qualityScore(col("text")), 6).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "q22_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TF.langIdHeuristic(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // ---- LLM-pipeline: near-dedup (scale paths, self-checked vs exact) --
    // Each declares the SCALE formulation (bucketed candidate generation)
    // and verifies it in-query against the O(n^2) exact scan, emitting the
    // set-difference metrics — deterministic (all hash-based), so the DuckDB
    // oracle pins them. "spurious = 0" holds by construction (candidates are
    // verified with the exact measure); the recall rows are the real check.
    "q23_minhash_pairs" -> ((s, dir) => {
      // The full-corpus LSH output is the declared result; the O(n^2) exact
      // scan used for the containment/recall check runs on the doc_id%5==0
      // SUBSET only (25x cheaper, and planted near-dup pairs (d, d+100000)
      // survive the cut since 100000 % 5 == 0) — the bounded-cost form of
      // the check that still works at any corpus size.
      val docs = docsWithNearDups(s, dir)
      val lsh = Dedup.minhashPairs(docs, "text", "doc_id",
          shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.35)
        .select(col("idA"), col("idB"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exactSub = Dedup.minhashPairsExact(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0), "text", "doc_id",
          shingleSize = 3, numHashes = 32, threshold = 0.35)
        .select(col("idA"), col("idB"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lshSub = lsh.filter(
        pmod(col("idA"), lit(5)) === 0 && pmod(col("idB"), lit(5)) === 0)
      val spurious = lshSub.except(exactSub)
        .agg(count(lit(1)).as("value"))
        .select(lit("lsh_minus_exact_pairs").as("metric"), col("value"))
      val recall = lshSub.agg(count(lit(1)).as("nl"))
        .crossJoin(exactSub.agg(count(lit(1)).as("ne")))
        .select(lit("recall_pct_ge_90").as("metric"),
          when(col("nl") * 100 >= col("ne") * 90, 1L).otherwise(0L).as("value"))
      val nonempty = lsh.agg(count(lit(1)).as("n"))
        .select(lit("pairs_nonempty").as("metric"),
          when(col("n") > 0, 1L).otherwise(0L).as("value"))
      spurious.union(recall).union(nonempty).orderBy(col("metric"))
    }),

    "q24_simhash_pairs" -> ((s, dir) => {
      // pigeonhole blocking guarantees recall = 1: blocked set == exact set
      val docs = docsWithNearDups(s, dir)
      val blocked = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
        .select(col("idA"), col("idB"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exact = Dedup.simhashPairsExact(docs, "text", "doc_id", maxHamming = 3)
        .select(col("idA"), col("idB"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val spurious = blocked.except(exact)
        .agg(count(lit(1)).as("value"))
        .select(lit("blocked_minus_exact_pairs").as("metric"), col("value"))
      val missing = exact.except(blocked)
        .agg(count(lit(1)).as("value"))
        .select(lit("exact_minus_blocked_pairs").as("metric"), col("value"))
      // the finite default bucket cap's carve-out, surfaced: rows in dropped
      // buckets lose the recall guarantee, so their count rides with the
      // result (0 on this fixture — blocked == exact stays meaningful)
      val dropped = Dedup.simhashDroppedBuckets(docs, "text", "doc_id",
          maxHamming = 3)
        .agg(coalesce(sum(col("bucket_n")), lit(0L)).as("value"))
        .select(lit("dropped_bucket_rows").as("metric"), col("value"))
      val nonempty = blocked.agg(count(lit(1)).as("n"))
        .select(lit("pairs_nonempty").as("metric"),
          when(col("n") > 0, 1L).otherwise(0L).as("value"))
      spurious.union(missing).union(dropped).union(nonempty)
        .orderBy(col("metric"))
    }),

    "q25_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), "text", "doc_id",
          n = 3, threshold = 0.3, maxShingleFreq = 400)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("idA"), col("idB"))
    }),

    // jaccard here is over df-filtered gram sets (see Dedup.ngramJaccardPairs);
    // the oracle replicates the same df cut.

    "q65_dup_clusters" -> ((s, dir) => {
      // exact duplicate-cluster grouping: connected components over the
      // n-gram Jaccard pair graph (iterative min-label propagation, one
      // shuffle per round) — the step after pair generation that
      // single-pass dedup approximates. Oracle: DuckDB recursive CTE
      // transitive closure over the same pair set.
      val pairs = Dedup.ngramJaccardPairs(docsWithNearDups(s, dir),
          "text", "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"))
      Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    }),


    "q26_embedding_dups" -> ((s, dir) => {
      // the oracle-grade exact baseline (value-checked against DuckDB's own
      // all-pairs cosine); the declared SCALE path is q58, which buckets
      // candidates with LSH and self-checks against this exact set
      Dedup.embeddingPairsExact(t(s, dir, "embeddings"), "embedding", "vec_id", 0.4)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy(col("idA"), col("idB"))
    }),

    "q58_embedding_dups_lsh" -> ((s, dir) => {
      // scale path for q26: OR-amplified hyperplane LSH near-dup pairs,
      // checked against CONSTRUCTED ground truth — the corpus is unioned
      // with a deterministic perturbation of itself (cosine ~0.995 to its
      // source; every other pair in the fixture stays below ~0.6), so the
      // exact pair set at threshold 0.9 is precisely the planted
      // (v, v+100000) pairs and NO O(n^2) scan is needed to verify the
      // scale path. At sigBits=12 x 12 tables the per-pair miss probability
      // at cosine 0.995 is ~1e-6: the LSH output must EQUAL the planted
      // set. sigBits sizes the bucket count — it must grow with the corpus
      // (buckets ~ n/loadFactor) or per-bucket occupancy goes quadratic.
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val d = size(col("embedding"))
      val perturbed = emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + lit(0.1) * element_at(col("embedding"), pmod(i + 1, d) + 1))
          .as("embedding"))
      val corpus = emb.unionByName(perturbed)
      val lsh = Dedup.embeddingPairs(corpus, "embedding", "vec_id",
          threshold = 0.9, sigBits = 12, nTables = 12)
        .select(col("idA"), col("idB"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val truth = emb.select(col("vec_id").as("idA"),
        (col("vec_id") + 100000L).as("idB"))
      val spurious = lsh.except(truth)
        .agg(count(lit(1)).as("value"))
        .select(lit("lsh_minus_planted_pairs").as("metric"), col("value"))
      val missing = truth.except(lsh)
        .agg(count(lit(1)).as("value"))
        .select(lit("planted_minus_lsh_pairs").as("metric"), col("value"))
      val nplanted = emb.agg(count(lit(1)).as("value"))
        .select(lit("n_planted_pairs").as("metric"), col("value"))
      spurious.union(missing).union(nplanted).orderBy(col("metric"))
    }),

    // ---- LLM-pipeline: similarity search --------------------------------
    "q27_knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
          "embedding", "vec_id", k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "q28_knn_lsh" -> ((s, dir) => {
      // multi-probe LSH top-k, self-checked against the exact brute force:
      // returned cosines are exact by construction; recall@5 is asserted.
      // n_queries is the one DuckDB-recomputable row. The fixture vectors
      // are UNIFORM RANDOM (nearest cosines ~0.35, no planted clusters) —
      // the adversarial case for any LSH — so the probe budget here is set
      // wide (sigBits=8, probe<=5 scans ~85% of buckets, measured recall
      // 0.94-0.98 at sf0.001-0.1); on clustered real corpora the same
      // structure prunes hard at the same recall.
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val lsh = Similarity.lshTopK(q, emb,
          "embedding", "vec_id", k = 5, sigBits = 8, probeHamming = 5)
        .select(col("query_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exact = Similarity.bruteForceTopK(q, emb, "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val recall = lsh.join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("nc"))
        .crossJoin(exact.agg(count(lit(1)).as("ne")))
        .select(lit("recall_pct_ge_90").as("metric"),
          when(col("nc") * 100 >= col("ne") * 90, 1L).otherwise(0L).as("value"))
      val nq = exact.agg(countDistinct(col("query_id")).as("value"))
        .select(lit("n_queries").as("metric"), col("value"))
      recall.union(nq).orderBy(col("metric"))
    }),

    "q72_knn_ivf" -> ((s, dir) => {
      // IVF ANN scale path: k-means-trained centroid cells (hash-spread
      // seeds + spherical updates), self-checked on CONSTRUCTED ground
      // truth — queries are small perturbations of corpus vectors (cosine
      // ~0.995 to their source vs ~0.35 background on this uniform-random
      // fixture), so the true top-1 neighbor of each query is its source by
      // a wide margin and recall needs no O(n^2) scan. A hit requires the
      // source's cell to be among the query's nProbe probed cells — the
      // property that breaks when centroids don't track data geometry.
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val d = size(col("embedding"))
      val queries = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + lit(0.1) * element_at(col("embedding"), pmod(i + 1, d) + 1))
            .as("embedding"))
      val ivf = Similarity.ivfTopK(queries, emb, "embedding", "vec_id",
          k = 1, nCentroids = 16, nProbe = 4, kmeansIters = 3)
        .filter(col("rank") === 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hits = ivf
        .filter(col("neighbor_id") === col("query_id") - 100000L)
        .agg(count(lit(1)).as("nh"))
      val nq = queries.agg(count(lit(1)).as("nq"))
      val recall = hits.crossJoin(nq)
        .select(lit("top1_recall_pct_ge_90").as("metric"),
          when(col("nh") * 100 >= col("nq") * 90, 1L).otherwise(0L).as("value"))
      val nqRow = nq.select(lit("n_queries").as("metric"),
        col("nq").cast("long").as("value"))
      recall.union(nqRow).orderBy(col("metric"))
    }),

    "q73_embedding_quantize" -> ((s, dir) => {
      // int8 scalar quantization as the embedding STORAGE transform
      // (array<float> -> array<tinyint> + scale, ~4x smaller): the oracle
      // recomputes the full quantization — per-vector scale, the quantized
      // codes (as an order-weighted integer checksum), and the
      // reconstruction bound |codes*scale - x| <= scale/2 — so any drift in
      // rounding or scaling breaks the hash.
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val q = emb.withColumn("qv", VF.quantizeInt8(col("v")))
      q.select(
        col("vec_id"),
        round(col("qv.scale"), 9).as("scale"),
        aggregate(
          transform(col("qv.codes"), (c, i) => c.cast("long") * (i + 1)),
          lit(0L), (a, x) => a + x).as("q_checksum"),
        when(
          aggregate(
            zip_with(col("qv.codes"), col("v"),
              (c, x) => abs(c.cast("double") * col("qv.scale") - x)),
            lit(0.0), (a, e) => greatest(a, e))
            <= col("qv.scale") * 0.5000001, 1L).otherwise(0L).as("recon_ok"))
        .orderBy(col("vec_id"))
    }),

    "q76_semantic_dedup" -> ((s, dir) => {
      // SemDeDup scale path: k-means cells bound the quadratic pair check,
      // self-checked on CONSTRUCTED ground truth — the corpus is unioned
      // with small perturbations of itself (cosine ~0.9998 to the source vs
      // ~0.6 max background on this fixture), so the exact all-pairs dedup
      // at threshold 0.9 drops precisely the perturbed ids and no O(n^2)
      // scan is needed. Two invariants ride with the result: (1) semantic
      // dedup NEVER drops a row exact dedup keeps — within-cell witnesses
      // are global witnesses, a hard 0; (2) >=90% of the planted duplicates
      // are caught, which requires source and copy to share a k-means cell
      // — the property that breaks when centroids ignore data geometry.
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val d = size(col("embedding"))
      val perturbed = emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + lit(0.02) * element_at(col("embedding"), pmod(i + 1, d) + 1))
          .as("embedding"))
      val corpus = emb.unionByName(perturbed)
      val kept = Dedup.semanticDedup(corpus, "embedding", "vec_id",
          threshold = 0.9, nCentroids = 16, kmeansIters = 3)
        .select(col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val semDropped = corpus.select(col("vec_id"))
        .join(kept, Seq("vec_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the fixture's exact dropped set: every perturbed id, nothing else
      val exactDropped = emb.select((col("vec_id") + 100000L).as("vec_id"))
      val spurious = semDropped.except(exactDropped)
        .agg(count(lit(1)).as("value"))
        .select(lit("sem_dropped_minus_exact_dropped").as("metric"),
          col("value"))
      val caught = semDropped.join(exactDropped, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("nc"))
      val recall = caught.crossJoin(exactDropped.agg(count(lit(1)).as("ne")))
        .select(lit("dup_recall_pct_ge_90").as("metric"),
          when(col("nc") * 100 >= col("ne") * 90, 1L).otherwise(0L).as("value"))
      val nd = exactDropped.agg(count(lit(1)).as("value"))
        .select(lit("n_exact_dropped").as("metric"), col("value"))
      spurious.union(recall).union(nd).orderBy(col("metric"))
    }),

    "q77_line_dedup" -> ((s, dir) => {
      // RefinedWeb-style line-level boilerplate removal: every document is
      // framed with the same header/footer lines (planted boilerplate) plus
      // its own body; lines occurring in >= 5 distinct docs are stripped and
      // the text reassembled in line order. The oracle recomputes the whole
      // pipeline relationally (split -> distinct-doc line counts -> anti-join
      // -> ordered string_agg), so the comparison is exact end to end.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws("\n", lit("== SHARED HEADER =="), col("text"),
            lit("(c) shared footer")).as("text"))
      Dedup.dedupLines(docs, "text", "doc_id", minDocs = 5)
        .orderBy(col("doc_id"))
    }),

    "q78_bucketed_join" -> ((s, dir) => {
      // co-located join via bucketed layout: both sides are written
      // bucketBy(16, custkey) + sortBy (one file per bucket), so the join
      // plans with NO Exchange and NO Sort — the 100 TB pattern for a fact
      // table joined repeatedly on the same key: the shuffle is paid once
      // at write time and amortized over every later join. BucketingSpec
      // asserts the plan shape; the oracle checks the result against a
      // plain DuckDB join of the source parquet.
      graft.io.Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice")),
        "graft_bkt_orders", "o_custkey", 16)
      graft.io.Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "graft_bkt_customer", "c_custkey", 16)
      graft.io.Bucketing.bucketedJoin(s, "graft_bkt_orders", "o_custkey",
          "graft_bkt_customer", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy(col("c_mktsegment"))
    }),

    "q79_random_projection" -> ((s, dir) => {
      // Johnson-Lindenstrauss reduction (64 -> 32 dims, deterministic
      // Rademacher signs) self-checked on both sides of the margin:
      // (1) planted near-identical pairs (cosine ~0.9998) must KEEP
      // projected cosine >= 0.9 — projection is linear, so a small relative
      // perturbation stays small; (2) among fixed distant pairs
      // (i, i+200 with true cosine < 0.5), >= 90% must stay BELOW 0.9 —
      // the distortion bound working in the other direction. n_planted and
      // n_distant are DuckDB-recomputed (the latter exercises the oracle's
      // own cosine on the same pair population).
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val proj = emb.select(col("vec_id"), col("v"),
        VF.randomProjection(col("v"), 32, seed = 7).as("pv"))
      val d = size(col("v"))
      val planted = emb.filter(col("vec_id") < 20)
        .select(col("vec_id"),
          transform(col("v"), (x, i) =>
            x + lit(0.02) * element_at(col("v"), pmod(i + 1, d) + 1)).as("w"))
        .select(col("vec_id"),
          VF.randomProjection(col("w"), 32, seed = 7).as("pw"))
      val plantedOk = proj.join(planted, Seq("vec_id"))
        .agg(min(when(VF.cosine(col("pv"), col("pw")) >= 0.9, 1L)
          .otherwise(0L)).as("value"))
        .select(lit("planted_preserved_all").as("metric"), col("value"))
      val shifted = proj.select((col("vec_id") - 200L).as("vec_id"),
        col("v").as("v2"), col("pv").as("pv2"))
      val distant = proj.filter(col("vec_id") < 50)
        .join(shifted, Seq("vec_id"))
        .select(VF.cosine(col("v"), col("v2")).as("tc"),
          VF.cosine(col("pv"), col("pv2")).as("pc"))
        .filter(col("tc") < 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sep = distant
        .agg(sum(when(col("pc") < 0.9, 1L).otherwise(0L)).as("ns"),
          count(lit(1)).as("n"))
        .select(lit("distant_separated_pct_ge_90").as("metric"),
          when(col("ns") * 100 >= col("n") * 90, 1L).otherwise(0L).as("value"))
      val nDistant = distant.agg(count(lit(1)).as("value"))
        .select(lit("n_distant").as("metric"), col("value"))
      val nPlanted = planted.agg(count(lit(1)).as("value"))
        .select(lit("n_planted").as("metric"), col("value"))
      plantedOk.union(sep).union(nDistant).union(nPlanted)
        .orderBy(col("metric"))
    }),

    "q80_normalize_text" -> ((s, dir) => {
      // canonical text normalization (NFC + casefold + whitespace collapse):
      // every document is framed with a decomposed spelling ("Cafe" +
      // combining acute U+0301), a compatibility-canonical codepoint
      // (U+212B ANGSTROM SIGN -> U+00C5), and messy whitespace; DuckDB's
      // nfc_normalize + lower + regexp_replace recomputes the identical
      // canonical bytes, so the comparison is exact per document.
      t(s, dir, "documents")
        .select(col("doc_id"),
          TF.normalizeText(concat(lit("Cafe\u0301  "), col("text"),
            lit("  \u212B troke"))).as("norm_text"))
        .orderBy(col("doc_id"))
    }),

    "q81_sequence_pack" -> ((s, dir) => {
      // training-sequence assembly (concat-and-chop packing): documents in
      // doc_id order within each language, running token count, and chunk
      // id floor(tokens_before / 512) — each chunk is one training
      // sequence. The running count comes from the two-phase distributed
      // prefix sum (PrefixSum.groupedRunningSum): per-task work is bounded
      // by the RANGE-partition size, never by group size — the naive
      // `sum over (partition by lang)` would put an entire language in one
      // task at 100 TB. Oracle recomputes with a plain window cumsum.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TF.tokenCount(col("text")).cast("long").as("toks"))
      graft.ops.PrefixSum.groupedRunningSum(docs, "lang", "doc_id",
          col("toks"), "cum_toks")
        .withColumn("seq_id", expr("(cum_toks - toks) div 512"))
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .orderBy(col("lang"), col("seq_id"))
    }),

    "q82_ivf_index" -> ((s, dir) => {
      // persisted ANN index + partition-pruned serving: buildIvfIndex
      // writes the corpus PARTITIONED BY k-means cell (plus a tiny
      // centroid table); queryIvfIndex equi-joins each query's nProbe
      // probed cells against the partition column, so dynamic partition
      // pruning reads only the probed cell directories — the index builds
      // once and every later query batch scans ~nProbe/nCentroids of the
      // corpus. Ground truth as in q72: queries are perturbations of
      // corpus vectors (cosine ~0.995 vs ~0.35 background), top-1 must
      // recover the source through the persisted layout.
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val root = scratchDir("q82_ivf")
      Similarity.buildIvfIndex(emb, "embedding", "vec_id", root,
        nCentroids = 16, kmeansIters = 3)
      val d = size(col("embedding"))
      val queries = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + lit(0.1) * element_at(col("embedding"), pmod(i + 1, d) + 1))
            .as("embedding"))
      val res = Similarity.queryIvfIndex(s, root, queries, "embedding",
          "vec_id", k = 1, nProbe = 4)
        .filter(col("rank") === 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hits = res
        .filter(col("neighbor_id") === col("query_id") - 100000L)
        .agg(count(lit(1)).as("nh"))
      val nq = queries.agg(count(lit(1)).as("nq"))
      val recall = hits.crossJoin(nq)
        .select(lit("top1_recall_pct_ge_90").as("metric"),
          when(col("nh") * 100 >= col("nq") * 90, 1L).otherwise(0L).as("value"))
      val nqRow = nq.select(lit("n_queries").as("metric"),
        col("nq").cast("long").as("value"))
      recall.union(nqRow).orderBy(col("metric"))
    }),

    "q83_incremental_dedup" -> ((s, dir) => {
      // incremental ingest dedup against PERSISTED corpus signatures: the
      // signature table is written once (writeMinhashSignatures); a new
      // batch (mutated copies — first 20 chars dropped — of docs 0..49)
      // is checked against it without re-reading any corpus text. The
      // self-check mirrors q23: the banded result must be a SUBSET of the
      // exact batch x corpus pair set at the same threshold (hard 0), with
      // recall >= 90% — all flowing through the persisted layout.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val root = scratchDir("q83_sigs")
      Dedup.writeMinhashSignatures(docs, "text", "doc_id", s"$root/sigs",
        shingleSize = 3, numHashes = 32)
      val batch = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000L).as("doc_id"),
          expr("substring(text, 21)").as("text"))
      val sigs = s.read.parquet(s"$root/sigs")
      val inc = Dedup.dedupAgainstSignatures(batch, "text", "doc_id", sigs,
          shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .select(col("new_id"), col("existing_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bs = batch.select(col("doc_id").as("new_id"),
        Dedup.minhashSignature(col("text"), 3, 32).as("__sigN"))
      val exact = sigs
        .select(col("id").as("existing_id"), col("sig").as("__sigE"))
        .join(broadcast(bs))
        .filter(graft.expressions.TextExpressions.matchFraction(
          col("__sigN"), col("__sigE")) >= 0.5)
        .select(col("new_id"), col("existing_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val spurious = inc.except(exact)
        .agg(count(lit(1)).as("value"))
        .select(lit("banded_minus_exact_pairs").as("metric"), col("value"))
      val recall = inc.join(exact, Seq("new_id", "existing_id"))
        .agg(count(lit(1)).as("nc"))
        .crossJoin(exact.agg(count(lit(1)).as("ne")))
        .select(lit("recall_pct_ge_90").as("metric"),
          when(col("nc") * 100 >= col("ne") * 90, 1L).otherwise(0L).as("value"))
      val nb = batch.agg(count(lit(1)).as("value"))
        .select(lit("n_batch_docs").as("metric"), col("value"))
      spurious.union(recall).union(nb).orderBy(col("metric"))
    }),

    "q84_heavy_hitters" -> ((s, dir) => {
      // Misra-Gries heavy hitters (k=32, bounded state, mergeable): the MG
      // guarantee — every token with true frequency > N/(k+1) survives ANY
      // partial/merge order — is checked against exact counts; both counts
      // are DuckDB-recomputable from the same tokenization.
      import s.implicits._
      val k = 32
      val toks = t(s, dir, "documents")
        .select(explode(TF.normTokens(col("text"))).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sketch = toks.as[String]
        .select(graft.ops.TypedAggregators.misraGries(k)).head()
      val total = toks.count()
      val heavy = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .filter(col("c") * (k + 1) > lit(total))
        .select(col("tok")).as[String].collect()
      val allIn = heavy.forall(sketch.contains)
      Seq(
        ("guaranteed_all_in_sketch", if (allIn) 1L else 0L),
        ("n_guaranteed_heavy", heavy.length.toLong),
        ("n_total_tokens", total)
      ).toDF("metric", "value").orderBy(col("metric"))
    }),

    "q85_profile" -> ((s, dir) => {
      // ANALYZE-style column profiling: nulls / exact distinct / min / max
      // for every requested column in ONE aggregate pass (multi-
      // countDistinct expand), unpivoted to long format. The oracle
      // recomputes each column's row independently.
      graft.ops.Profile.summarize(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy(col("column"))
    }),

    "q86_temperature_mix" -> ((s, dir) => {
      // temperature-scaled language balancing (tau=2): head languages are
      // downsampled toward the flattened sqrt-share distribution, tail
      // languages keep 100%; membership is decided by the stable key hash,
      // so the sample is layout- and engine-independent. The oracle
      // recomputes the counts, the sqrt weights, the integer percents, and
      // the per-row hash cut.
      val docs = t(s, dir, "documents")
      val pct = graft.ops.Sampling.temperaturePercents(docs, "lang", tau = 2.0)
      graft.ops.Sampling.mixtureSample(docs, "lang", "doc_id", pct)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    "q87_doc_chunking" -> ((s, dir) => {
      // context-window chunking (16-token windows, stride 8): map-only
      // explode, every token covered, final window short. The oracle
      // recomputes the windows relationally (range + list_slice).
      TF.chunkDocs(t(s, dir, "documents"), "text", "doc_id",
          chunkTokens = 16, stride = 8)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    "q88_quality_checks" -> ((s, dir) => {
      // data-quality expectations as VIOLATION sets: uniqueness violations
      // are planted by duplicating every 997th order, referential orphans
      // by corrupting every 499th order's custkey; both checks must return
      // exactly the planted keys (the oracle recomputes them), and nothing
      // from the clean remainder.
      val orders = t(s, dir, "orders")
      val withDups = orders.unionByName(
        orders.filter(pmod(col("o_orderkey"), lit(997)) === 0))
      val dupKeys = graft.ops.Checks.duplicateKeys(withDups, Seq("o_orderkey"))
        .select(lit("dup_key").as("check"), col("o_orderkey").as("key"),
          col("n_rows").as("n"))
      val corrupted = orders.withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(499)) === 0,
          col("o_custkey") + 10000000L).otherwise(col("o_custkey")))
      val orphanRows = graft.ops.Checks.orphans(corrupted, "o_custkey",
          t(s, dir, "customer"), "c_custkey")
        .select(lit("orphan").as("check"), col("o_orderkey").as("key"),
          lit(1L).as("n"))
      dupKeys.unionByName(orphanRows).orderBy(col("check"), col("key"))
    }),

    "q89_fuzzy_join" -> ((s, dir) => {
      // blocked edit-distance self-join: strings are the documents' first
      // three normalized tokens plus planted single-char typos (ASCII '~'
      // substitution at position 3 — the corpus is pure ASCII, so Spark's
      // codepoint levenshtein and DuckDB's byte levenshtein agree).
      // Symmetric-delete blocking guarantees recall 1 below the bucket
      // cap, so the oracle is the plain ALL-PAIRS levenshtein <= 1 —
      // exact set equality, no flags.
      val phrases = t(s, dir, "documents")
        .select(col("doc_id"),
          array_join(slice(TF.normTokens(col("text")), 1, 3), " ").as("s"))
      val typos = phrases.select((col("doc_id") + 100000L).as("doc_id"),
        concat(substring(col("s"), 1, 2), lit("~"),
          substring(col("s"), 4, 1000000)).as("s"))
      graft.ops.FuzzyJoin.editDistancePairs(
          phrases.unionByName(typos), "s", "doc_id", maxDist = 1)
        .orderBy(col("idA"), col("idB"))
    }),

    "q90_embedding_dedup_clustered" -> ((s, dir) => {
      // cluster-exact embedding dedup: connected components over the LSH
      // near-dup pair graph, smallest id kept per cluster. Fixture as q58
      // (planted perturbed copies, per-pair LSH miss probability ~1e-6 at
      // sigBits=12 x 12 tables), so the survivors must be EXACTLY the
      // original ids — the oracle is a plain scan of embeddings.
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val d = size(col("embedding"))
      val perturbed = emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + lit(0.1) * element_at(col("embedding"), pmod(i + 1, d) + 1))
          .as("embedding"))
      Dedup.embeddingDedupClustered(emb.unionByName(perturbed),
          "embedding", "vec_id", threshold = 0.9, sigBits = 12, nTables = 12)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    "q91_lm_perplexity" -> ((s, dir) => {
      // corpus-trained bigram LM quality scores (CCNet-style): smoothed
      // average log-probability per document. The oracle retrains the
      // identical "model" (two count tables + vocab) and rescoring in
      // DuckDB — counts are exact, the only fp is ln/avg, absorbed by
      // round(4).
      TF.bigramLogProb(t(s, dir, "documents"), "text", "doc_id", addK = 0.5)
        .select(col("doc_id"), round(col("avg_logprob"), 4).as("avg_logprob"),
          col("n_bigrams"))
        .orderBy(col("doc_id"))
    }),

    "q92_training_order" -> ((s, dir) => {
      // epoch-seeded deterministic training order: shuffle position = the
      // exact global rank under a keyed-hash order. Computed with the
      // two-phase prefix-sum decomposition (PrefixSum.globalRank) — range
      // partition + per-partition offsets — never the single-task
      // row_number()-over-everything window.
      val h = graft.ops.Sampling.keyHash(col("doc_id").bitwiseXOR(lit(7L)))
      graft.ops.PrefixSum.globalRank(
          t(s, dir, "documents").select(col("doc_id")),
          Seq(h, col("doc_id")), "pos")
        .select(col("doc_id"), col("pos"))
        .orderBy(col("pos"))
    }),

    "q93_markup_strip" -> ((s, dir) => {
      // web-scrape text extraction: each doc deterministically wrapped in
      // HTML (title/heading/body plus style, script, comment, and entity
      // noise), then stripMarkup must recover the clean prose. The oracle
      // replays the identical construction AND strip chain in DuckDB.
      val html = concat(
        lit("<html><head><title>"), col("source"),
        lit("</title><style>p{margin:0}</style></head><body><!-- nav -->"),
        lit("<h1>Doc &#39;"), col("doc_id").cast("string"),
        lit("&#39;</h1>\n<p>"), substring(col("text"), 1, 200),
        lit("</p>\n<script type=\"text/javascript\">var x=1;</script>"),
        lit("<p>Q&amp;A&nbsp;&lt;here&gt;</p></body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), TF.stripMarkup(html).as("clean"))
        .orderBy(col("doc_id"))
    }),

    "q94_bm25_search" -> ((s, dir) => {
      // BM25 keyword retrieval (decontamination probe / corpus search):
      // posting lists built in one corpus pass, query terms broadcast,
      // per-term scores fixed to integer micro-units before the sum so
      // ranks are float-order-independent (Search.scala scale notes).
      import s.implicits._
      val queries = Seq(
        (1L, "spark window agg"),
        (2L, "vector scan batch"),
        (3L, "customer stream query")).toDF("query_id", "query_text")
      Search.bm25TopK(t(s, dir, "documents"), "text", "doc_id", queries, 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q95_scd2_history" -> ((s, dir) => {
      // CDC log -> SCD2 dimension history: consecutive same-attribute
      // events collapse into validity intervals, open interval = current.
      // One shuffle on the key (Scd.scala).
      Scd.scd2History(events(s, dir), "user_id", "event_type", "ts",
          "event_id")
        .select(col("user_id"), col("event_type"),
          col("valid_from").cast("long").as("valid_from"),
          col("valid_to").cast("long").as("valid_to"),
          col("version"), col("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),

    "q96_gap_fill" -> ((s, dir) => {
      // time-series regularization: hourly grid per user with
      // forward-filled values — the aggregate reduces the raw stream
      // BEFORE the grid explode, so cost is keys x span, not event volume.
      Resample.gapFillHourly(events(s, dir), "user_id", "ts", "value")
        .select(col("user_id"), col("bucket").cast("long").as("hour_ts"),
          col("v"), col("v_filled"), col("n"), col("is_gap"))
        .orderBy(col("user_id"), col("hour_ts"))
    }),

    "q97_url_canonical" -> ((s, dir) => {
      // URL canonicalization + dedup stats: each doc gets two cosmetically
      // different crawl URLs (case/www/port/tracking-params/fragment
      // variants) that must collapse to ONE canonical form. Map-only
      // codegen'd string ops; the only shuffle is the tiny per-source agg.
      val d = t(s, dir, "documents")
      val v1 = d.select(col("source"), concat(lit("HTTPS://WWW."),
        upper(col("source")), lit(".Example.COM:443/docs/"),
        col("doc_id").cast("string"),
        lit("/?utm_source=feed&b=2&a=1#frag")).as("url"))
      val v2 = d.select(col("source"), concat(lit("https://"),
        col("source"), lit(".example.com/docs/"),
        col("doc_id").cast("string"),
        lit("?a=1&b=2&utm_campaign=x")).as("url"))
      v1.unionByName(v2)
        .select(col("source"), UF.canonicalizeUrl(col("url")).as("canon"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canon")).as("n_canonical"),
          min(col("canon")).as("sample_canon"))
        .orderBy(col("source"))
    }),

    "q98_zorder_value" -> ((s, dir) => {
      // z-order layout kernel: Morton-interleave (custkey, price bucket)
      // and rank orders along the curve — the math zorderWrite clusters
      // files by (ZOrder.scala; layout effectiveness proven in
      // ZOrderSpec against real parquet footers).
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          ZOrder.zValue(
            pmod(col("o_custkey"), lit(4096L)),
            pmod(floor(col("o_totalprice") / 100).cast("long"), lit(4096L)),
            12).as("zval"))
        .orderBy(col("zval"), col("o_orderkey"))
    }),

    "q100_funnel" -> ((s, dir) => {
      // ordered-sequence funnel (view -> click -> purchase): stage k
      // counts only strictly after stage k-1. Fixed-depth filtered
      // aggregates over thin event slices — no per-user sort of the log
      // (Funnel.scala).
      Funnel.funnelCounts(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
    }),

    "q101_retention" -> ((s, dir) => {
      // weekly cohort retention: users bucketed by first-activity week,
      // counted once per active week offset. Two aggregates + one equi
      // join, all keyed on user_id.
      val ev = events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      ev.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          ((col("week").cast("long") - col("cohort_week").cast("long")) /
            lit(604800L)).cast("long").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("cohort_week").cast("long").as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    "q102_oov_rate" -> ((s, dir) => {
      // tokenizer-vocabulary coverage: out-of-vocabulary token rate per
      // doc against the corpus top-20 vocabulary — the coverage check run
      // before committing to a tokenizer. Vocab is tiny and broadcast;
      // rates are exact rationals (0/1 sums), so no float-order risk.
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Search.searchTokens(col("text"))).as("term"))
      val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("term")).limit(20)
        .select(col("term"), lit(1).as("__in"))
      toks.join(broadcast(vocab), Seq("term"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(when(col("__in").isNull, 1.0).otherwise(0.0)), 6)
            .as("oov_rate"))
        .orderBy(col("doc_id"))
    }),

    "q103_histogram" -> ((s, dir) => {
      // equi-width histogram with materialized empty buckets
      // (Profile.histogram): two aggregate passes, bucketing is map-side.
      Profile.histogram(t(s, dir, "orders"), "o_totalprice", 20)
        .select(col("bucket"), round(col("lo"), 4).as("lo"),
          round(col("hi"), 4).as("hi"), col("n"))
        .orderBy(col("bucket"))
    }),

    "q104_rolling_window" -> ((s, dir) => {
      // 7-day rolling revenue per customer: a RANGE frame over event-time
      // seconds (q09 covers ROWS frames; RANGE is the time-windowed
      // variant a metrics pipeline uses). One shuffle on the key.
      // o_orderdate is TIMESTAMP_NTZ; in a UTC session the wall-clock
      // equals the UTC instant, so the timestamp hop to epoch is exact.
      val ts = col("o_orderdate").cast("timestamp").cast("long")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(ts)
        .rangeBetween(-6L * 86400L, 0L)
      t(s, dir, "orders")
        .withColumn("rolling_7d", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_orderkey"), col("o_custkey"),
          ts.as("order_ts"),
          round(col("o_totalprice"), 2).as("price"), col("rolling_7d"))
        .orderBy(col("o_orderkey"))
    }),

    "q105_schema_evolution" -> ((s, dir) => {
      // schema-drift ingestion: generation 2 of a feed adds a column;
      // a mergeSchema read presents one schema with generation-1 rows
      // null-filled — the evolving-feed discipline (A15's null-fill
      // applied across file generations). Statically partition-prunable
      // since each generation is its own directory.
      val base = scratchDir("q105_evo")
      val n = t(s, dir, "nation")
      n.select(lit(1L).as("gen"), col("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(s"$base/g1")
      n.select(lit(2L).as("gen"), col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
        .write.mode("overwrite").parquet(s"$base/g2")
      s.read.option("mergeSchema", "true").parquet(s"$base/g1", s"$base/g2")
        .select(col("gen"), col("n_nationkey"), col("n_name"),
          col("n_regionkey"))
        .orderBy(col("gen"), col("n_nationkey"))
    }),

    "q106_forget_delete" -> ((s, dir) => {
      // right-to-be-forgotten hard delete: tombstoned users anti-join the
      // event log, audit counts prove the purge. The tombstone set is the
      // broadcast side; at 100 TB pair with compaction (q74) to rewrite
      // only affected files.
      val ev = events(s, dir)
      val tomb = ev.select(col("user_id")).distinct()
        .filter(pmod(col("user_id"), lit(7L)) === 0)
      ev.join(broadcast(tomb), Seq("user_id"), "left_anti")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    "q107_countmin" -> ((s, dir) => {
      // count-min sketch self-check: one bounded-state aggregate over all
      // token occurrences (96 KiB sketch regardless of stream size), then
      // the CMS guarantees verified against exact counts for the top-100
      // tokens: estimates never under-count, and never over-count by more
      // than ceil((e/w)*N). Deterministic — fixed hash rows, fixed corpus.
      import s.implicits._
      val d = 6; val w = 2048
      val toks = t(s, dir, "documents")
        .select(explode(Search.searchTokens(col("text"))).as("tok"))
        .as[String]
      val sketch = toks.select(TypedAggregators.countMin(d, w).name("sk"))
        .collect()(0).toIndexedSeq
      val nTotal = sketch.slice(0, w).sum // each row sums to the stream size
      val bound = math.ceil(math.E / w * nTotal).toLong
      val top = toks.toDF("tok").groupBy(col("tok"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(100).collect()
      val ests = top.map { r =>
        val c = r.getLong(1)
        val est = TypedAggregators.CountMin.estimate(sketch, d, w, r.getString(0))
        (est >= c, est <= c + bound)
      }
      Seq((ests.length.toLong,
        ests.count(!_._1).toLong, ests.count(!_._2).toLong))
        .toDF("n_checked", "n_underestimates", "n_over_bound")
    }),

    "q108_quantile_bins" -> ((s, dir) => {
      // quantile discretization (feature binning): decile bin per language
      // by quality score — ntile's floor-division split is engine-exact,
      // so bins match the oracle bit-for-bit.
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TF.qualityScore(col("text")).as("quality"))
        .withColumn("bin", ntile(10).over(w).cast("long"))
        .select(col("doc_id"), col("lang"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    "q109_tokenize_ids" -> ((s, dir) => {
      // tokenize-to-ids: corpus vocabulary ranked by (freq desc, term),
      // each doc rendered as its token-id sequence — the final encoding
      // step before training. The vocab is broadcast; order restored with
      // the sort_array(struct(pos, id)) idiom (no ordered collect_list in
      // Spark); ids serialized to a string so the oracle compare stays
      // scalar.
      val toks = t(s, dir, "documents").select(col("doc_id"),
        posexplode(Search.searchTokens(col("text"))).as(Seq("pos", "term")))
      // vocab ids via the two-phase global ranker (PrefixSum.globalRank) —
      // a web-scale vocab never funnels through one ranking task
      val vocab = graft.ops.PrefixSum.globalRank(
          toks.groupBy(col("term")).agg(count(lit(1)).as("tf")),
          Seq(col("tf").desc, col("term")), "id")
        .select(col("term"), col("id"))
      toks.join(broadcast(vocab), Seq("term"))
        .groupBy(col("doc_id"))
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("id")))),
          e => e.getField("id").cast("string")), " ").as("ids"),
          count(lit(1)).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q110_funnel_windowed" -> ((s, dir) => {
      // conversion-window funnel: stage k counts only within 3 days of
      // stage k-1 — the attribution-window variant of q100.
      Funnel.funnelCounts(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = Some(259200L))
    }),

    "q111_agg_merge" -> ((s, dir) => {
      // re-aggregatable metrics: daily partials (sum/count/min/max as
      // DECIMAL so partial-sum order is exact) merged into monthly equal
      // the direct monthly aggregate — the algebra every incremental
      // rollup pipeline depends on. The oracle computes the DIRECT
      // monthly aggregate; hash-equality proves the merge.
      val daily = t(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
          col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"),
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
      daily
        .groupBy(date_trunc("month", col("day")).cast("timestamp")
          .cast("long").as("month_ts"), col("o_orderpriority"))
        .agg(sum(col("s")).as("s"), sum(col("n")).as("n"),
          min(col("mn")).as("mn"), max(col("mx")).as("mx"))
        .select(col("month_ts"), col("o_orderpriority"),
          col("s").cast("double").as("sum_price"), col("n").as("n_orders"),
          round(col("mn"), 2).as("min_price"),
          round(col("mx"), 2).as("max_price"),
          // avg truncated to 4 dp via exact integer arithmetic: round()
          // on a quotient is engine-divergent exactly at half boundaries
          // (hit twice at sf0.1); floor of an exact-integer ratio is not
          (floor((col("s") * 10000).cast("long").cast("double") / col("n"))
            / lit(10000.0)).as("avg_price"))
        .orderBy(col("month_ts"), col("o_orderpriority"))
    }),

    "q112_shard_plan" -> ((s, dir) => {
      // training-shard export plan: deterministic hash order, 5000-token
      // shards, summarized per shard. Rank and running total both come
      // from the two-phase prefix-sum machinery — no global-window task
      // (Sharding.scala).
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"))
      val h = graft.ops.Sampling.keyHash(col("doc_id").bitwiseXOR(lit(13L)))
      Sharding.shardAssignments(docs, Seq(h, col("doc_id")),
          col("n_tokens"), 5000L)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"))
        .orderBy(col("shard_id"))
    }),

    "q113_corpus_report" -> ((s, dir) => {
      // dataset-card corpus report: per source — doc/token volume, mean
      // quality, language spread, exact-dup count. One aggregate pass
      // (the exact-dup term is count - countDistinct(text); at corpus
      // scale substitute the 8-byte fingerprint of q19 for the raw text).
      t(s, dir, "documents")
        .select(col("source"), col("lang"), col("text"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"),
          TF.qualityScore(col("text")).as("quality"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(avg(col("quality")), 6).as("avg_quality"),
          countDistinct(col("lang")).as("n_langs"),
          (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"))
        .orderBy(col("source"))
    }),

    "q114_pipeline_e2e" -> ((s, dir) => {
      // end-to-end curation pipeline in ONE declarative chain: per-language
      // quality cut (top 80%) -> exact dedup (min-id survivor, fingerprint
      // groupBy) -> deterministic hash order -> 5000-token shard plan.
      // Every stage is an engine operator; Catalyst fuses the whole flow —
      // this is the "switch your pipeline to this library" demonstration.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("quality", TF.qualityScore(col("text")))
      val cut = Sampling.topQuantileByGroup(docs, "lang", "quality",
        "doc_id", 0.8)
      val deduped = Dedup.exact(cut, "text", "doc_id")
        .withColumn("n_tokens", TF.tokenCount(col("text")).cast("long"))
      val h = graft.ops.Sampling.keyHash(col("doc_id").bitwiseXOR(lit(29L)))
      Sharding.shardAssignments(deduped, Seq(h, col("doc_id")),
          col("n_tokens"), 5000L)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy(col("shard_id"))
    }),

    "q115_char_entropy" -> ((s, dir) => {
      // character-entropy gibberish filter: native one-pass histogram per
      // doc (the relational form explodes |text| rows per doc); the
      // low-entropy flag compares on the ROUNDED value so both engines
      // cut identically.
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TF.charEntropy(col("text")), 6).as("entropy"))
        .withColumn("low_entropy", col("entropy") < 3.0)
        .orderBy(col("doc_id"))
    }),

    "q116_bm25_index" -> ((s, dir) => {
      // index-at-rest BM25: term-sorted postings written once, the query
      // batch served through the persisted layout — its scan reads only
      // query-term row groups (In(term) pushed; WarehouseOpsSpec asserts
      // the PushedFilters and ad-hoc parity). Zero corpus passes per
      // batch.
      import s.implicits._
      val idx = scratchDir("q116_idx")
      Search.writeSearchIndex(t(s, dir, "documents"), "text", "doc_id", idx)
      val queries = Seq(
        (1L, "merge batch row"),
        (2L, "filter group vector"),
        (3L, "slow table scan")).toDF("query_id", "query_text")
      Search.querySearchIndex(s, idx, queries, 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q117_image_neardup" -> ((s, dir) => {
      // perceptual-hash near-dup screening, self-checked (q24's pattern):
      // 40 deterministic payloads + exact copies; the pigeonhole-blocked
      // pair set must equal the exact O(n^2) Hamming pair set (recall-1
      // guarantee) and contain every planted copy pair. All three output
      // facts are invariants, so the oracle states them from the corpus
      // size alone.
      import s.implicits._
      val base = t(s, dir, "documents").orderBy(col("doc_id")).limit(40)
        .select(col("doc_id").as("id"), encode(col("text"), "UTF-8").as("payload"))
      val copies = base.select((col("id") + 100000L).as("id"), col("payload"))
      val payloads = base.unionByName(copies)
      val hashes = Multimodal.perceptualHashes(payloads, "id", "payload")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val blocked = Dedup.hammingPairs(hashes, "phash", "id", maxHamming = 0)
        .select(col("idA"), col("idB"))
      val l = hashes.select(col("id").as("idA"), col("phash").as("pa"))
      val r = hashes.select(col("id").as("idB"), col("phash").as("pb"))
      val exact = l.join(broadcast(r), col("idA") < col("idB"))
        .filter(bit_count(col("pa").bitwiseXOR(col("pb"))) === 0)
        .select(col("idA"), col("idB"))
      val planted = base.select(col("id").as("idA"),
        (col("id") + 100000L).as("idB"))
      payloads.agg(count(lit(1)).as("n_payloads"))
        .crossJoin(broadcast(
          blocked.exceptAll(exact).unionAll(exact.exceptAll(blocked))
            .agg((count(lit(1)) === 0).as("blocked_eq_exact"))))
        .crossJoin(broadcast(
          planted.exceptAll(blocked)
            .agg((count(lit(1)) === 0).as("planted_all_found"))))
    }),

    "q118_table_diff" -> ((s, dir) => {
      // snapshot reconciliation: version 2 of orders drops every 97th key,
      // bumps every 13th price, and inserts a copy of every 101st row
      // under a new key — the diff must classify exactly. One full-outer
      // join on the key (Diff.scala).
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val kept = base.filter(pmod(col("o_orderkey"), lit(97L)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(13L)) === 0,
            col("o_totalprice") + 1.5).otherwise(col("o_totalprice")))
      val inserted = base.filter(pmod(col("o_orderkey"), lit(101L)) === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      Diff.diffSummary(base, kept.unionByName(inserted),
        Seq("o_orderkey"), Seq("o_custkey", "o_totalprice"))
    }),

    "q119_table_diff_pruned" -> ((s, dir) => {
      // checksum-pruned reconciliation (the 100 TB diff path): bucket
      // fingerprints first, row-level join only for disagreeing buckets,
      // agreeing buckets credited to `unchanged` from counts alone. Same
      // classification contract as q118, proven by this oracle and by
      // WarehouseOpsSpec's pruned==full parity.
      val base = t(s, dir, "lineitem")
        .groupBy((col("l_orderkey") * 10 + col("l_linenumber")).as("k"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      val next = base.filter(pmod(col("k"), lit(211L)) =!= 0)
        .withColumn("qty",
          when(pmod(col("k"), lit(89L)) === 0, col("qty") + 5.0)
            .otherwise(col("qty")))
      Diff.diffSummaryPruned(base, next, Seq("k"), Seq("qty"),
        nBuckets = 512)
    }),

    "q120_cluster_longest" -> ((s, dir) => {
      // dedup representative policy: within each near-dup cluster keep
      // the LONGEST member (tie to smallest id) — the practical survivor
      // rule when near-dups are truncations. argmax via max(struct(len,
      // -id)) — a plain aggregate over labeled nodes, no window.
      val corpus = docsWithNearDups(s, dir)
      val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
          n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"))
      Dedup.connectedComponents(pairs)
        .join(corpus, col("id") === col("doc_id"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(length(col("text")).as("len"),
            (-col("doc_id")).as("negid"))).as("__m"))
        .select(col("component"), (-col("__m.negid")).as("keep_id"),
          col("__m.len").cast("long").as("keep_len"), col("n_members"))
        .orderBy(col("component"))
    }),

    "q121_repeated_spans" -> ((s, dir) => {
      // exact-substring dedup signal (Lee et al.): every 8-token window is
      // hashed; windows whose hash repeats anywhere in the corpus merge
      // into maximal duplicated spans per doc. Planted repeats: every 7th
      // doc gets a companion that is its first 200 chars twice over — the
      // companion is self-repetitive AND shares its windows with the base
      // doc. Only the 8-byte window hash shuffles for the frequency pass.
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.filter(pmod(col("doc_id"), lit(7L)) === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat_ws(" ", substring(col("text"), 1, 200),
            substring(col("text"), 1, 200)).as("text"))
      Dedup.repeatedSpanStats(d.unionByName(planted), "text", "doc_id", k = 8)
        .orderBy(col("doc_id"))
    }),

    "q122_leakage_safe_split" -> ((s, dir) => {
      // leakage-safe train/val/test split: the 80/10/10 hash cut is taken
      // on the near-dup CLUSTER label (q65's components), so a document
      // can never sit in train while its near-duplicate sits in eval.
      // Output: per-split doc and cluster counts, plus how many docs a
      // naive doc-id split would have placed differently — the leakage
      // surface the operator closes.
      val corpus = docsWithNearDups(s, dir)
      val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
          n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"))
      val split = Dedup.splitByCluster(corpus, "doc_id", pairs,
        Seq(80, 10, 10), labelCol = Some("cluster"))
      val naive = Sampling.splitByKey(
        split.select(col("doc_id"), col("split"), col("cluster")),
        "doc_id", Seq(80, 10, 10), outCol = "naive_split")
      naive.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster")).as("n_clusters"),
          sum(when(col("naive_split") =!= col("split"), 1L).otherwise(0L))
            .as("n_moved_vs_naive"))
        .orderBy(col("split"))
    }),

    "q123_cdc_apply" -> ((s, dir) => {
      // MERGE INTO / upsert: apply a CDC changelog to the customer
      // snapshot — per key the highest-sequence row wins, op D deletes,
      // I/U upsert, untouched keys pass through. Changelog derived from
      // orders (seq = o_orderkey; every 1000th order keys a brand-new
      // customer to exercise inserts). One partial-agg max_by + one
      // full-outer join (Diff.cdcApply).
      val base = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
      val log = t(s, dir, "orders").select(
        (col("o_custkey") +
          when(pmod(col("o_orderkey"), lit(1000L)) === 7, 1000000L)
            .otherwise(0L)).as("c_custkey"),
        col("o_orderkey").as("seq"),
        when(pmod(col("o_orderkey"), lit(10L)) === 0, "D")
          .when(pmod(col("o_orderkey"), lit(10L)) < 5, "U")
          .otherwise("I").as("op"),
        concat(lit("upd_"), col("o_orderkey").cast("string")).as("c_name"),
        round(col("o_totalprice"), 2).as("c_acctbal"))
      Diff.cdcApply(base, log, Seq("c_custkey"), "seq", "op")
        .orderBy(col("c_custkey"))
    }),

    "q124_k_anonymity" -> ((s, dir) => {
      // k-anonymity release gate: rows whose quasi-identifier combination
      // (nation, market segment) is shared by < 10 customers are
      // suppressed before release. Output: per-group sizes of the rows
      // that actually survived the row-level gate — if the semi-join
      // passed anything it shouldn't, the counts diverge from the oracle's
      // HAVING recomputation.
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      Checks.kAnonymous(c, Seq("c_nationkey", "c_mktsegment"), k = 10)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    "q125_interval_join" -> ((s, dir) => {
      // interval-overlap join with BOTH sides large: view and click events
      // each become 60 s half-open activity windows; pairs that overlap in
      // time join via grid-bin equi-join (5 min bins) with responsibility-
      // bin dedup — one bin-key shuffle per side, no nested loop, no
      // distinct (ops/IntervalJoin.scala).
      val ev = events(s, dir)
      def side(tpe: String, id: String, st: String, en: String) =
        ev.filter(col("event_type") === tpe)
          .select(col("event_id").as(id), unix_micros(col("ts")).as(st),
            (unix_micros(col("ts")) + 60000000L).as(en))
      IntervalJoin.overlapJoin(
          side("view", "idA", "sA", "eA"),  "sA", "eA",
          side("click", "idB", "sB", "eB"), "sB", "eB",
          binSize = 300000000L)
        .select(col("idA"), col("idB"),
          (least(col("eA"), col("eB")) - greatest(col("sA"), col("sB")))
            .as("overlap_us"))
        .orderBy(col("idA"), col("idB"))
    }),

    "q126_bpe_train" -> ((s, dir) => {
      // BPE tokenizer induction: the corpus collapses to a (word, freq)
      // vocabulary first (the 100 TB trick — every merge round then runs
      // on vocab-sized data), 12 merges learned distributed. Self-check
      // vs the single-JVM reference on the SAME vocab (collected — oracle
      // fixture only), plus DuckDB-checkable corpus stats; merge freqs
      // must be non-increasing (a merge can never create a pair more
      // frequent than the max it replaced).
      import s.implicits._
      val vocab = Bpe.wordFreq(t(s, dir, "documents").select(col("text")),
        "text").persist()
      val dist = Bpe.learnMerges(vocab, numMerges = 12)
      val local = Bpe.learnMergesLocal(
        vocab.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 12)
      val stats = vocab.agg(count(lit(1)).as("dw"), sum(col("freq")).as("tw"))
        .collect().head
      vocab.unpersist()
      val matches = dist.zip(local).count { case (d, l) =>
        d.left == l.left && d.right == l.right && d.freq == l.freq }
      val noninc = dist.map(_.freq).sliding(2)
        .forall(p => p.length < 2 || p(0) >= p(1))
      Seq(
        ("distinct_words", stats.getLong(0)),
        ("merge_freqs_nonincreasing", if (noninc) 1L else 0L),
        ("merges_learned", dist.length.toLong),
        ("merges_match_reference", matches.toLong),
        ("total_word_occurrences", stats.getLong(1))
      ).toDF("metric", "value").orderBy(col("metric"))
    }),

    "q127_bpe_encode" -> ((s, dir) => {
      // corpus-level subword encode with the learned merge table: the
      // zero-shuffle expression chain must agree with the single-JVM
      // reference on EVERY document (collected for the oracle fixture
      // only), and subword count can never exceed chars+words (each
      // merge only shrinks a word's token sequence).
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val vocab = Bpe.wordFreq(docs, "text").persist()
      val merges = Bpe.learnMerges(vocab, numMerges = 12)
      vocab.unpersist()
      val enc = Bpe.encode(docs, "text", merges, "toks")
        .select(col("doc_id"), col("text"), col("toks"))
        .collect()
      val nMatch = enc.count { r =>
        r.getSeq[String](2) == Bpe.encodeLocal(r.getString(1), merges) }
      val bounded = enc.forall { r =>
        val words = r.getString(1).trim.split("\\s+").count(_.nonEmpty)
        r.getSeq[String](2).length <=
          r.getString(1).codePointCount(0, r.getString(1).length) + words
      }
      Seq(
        ("docs_encoded", enc.length.toLong),
        ("docs_match_reference", nMatch.toLong),
        ("tokens_bounded_by_chars_plus_words", if (bounded) 1L else 0L)
      ).toDF("metric", "value").orderBy(col("metric"))
    }),

    "q128_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25 keyword top-10 and embedding cosine top-10
      // fused by reciprocal-rank fusion (score = sum 1/(60+rank), held as
      // exact integer micro-units so the fused order is float-free). The
      // RAG-stack ranking primitive: each system ranks independently,
      // fusion is one tiny union + aggregate over <= 2k rows per query.
      import s.implicits._
      val queries = Seq(
        (1L, "spark window agg"),
        (2L, "vector scan batch"),
        (3L, "customer stream query")).toDF("query_id", "query_text")
      val lex = Search.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
          queries, 10)
        .select(col("query_id"), col("doc_id"),
          col("rank").cast("long").as("rank"))
      val emb = t(s, dir, "embeddings")
      val sem = Similarity.bruteForceTopK(
          emb.filter(col("vec_id").isin(1L, 2L, 3L)), emb,
          "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").cast("long").as("rank"))
      val contrib = lex.unionByName(sem)
        .select(col("query_id"), col("doc_id"),
          expr("1000000 div (60 + rank)").as("c"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("rrf_micro"), col("doc_id"))
      contrib.groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("rrf_micro"), count(lit(1)).as("n_systems"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q129_scd2_join" -> ((s, dir) => {
      // fact-to-dimension as-of join: each purchase picks the user's
      // view-value band (SCD2 interval) in force at purchase time;
      // purchases before the user's first view keep a null band (left
      // join). Equi-join on the key + interval prune (Scd.dimensionJoin).
      val ev = events(s, dir)
      val dim = ev.filter(col("event_type") === "view")
        .withColumn("band", when(col("value") >= 30.0, "high")
          .otherwise("low"))
      val hist = Scd.scd2History(dim, "user_id", "band", "ts", "event_id")
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Scd.dimensionJoin(facts, hist, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("fact_ts"), col("band"), col("version"),
          col("valid_from").cast("long").as("valid_from"))
        .orderBy(col("event_id"))
    }),

    "q130_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS + grouping() markers (the general form
      // rollup/cube specialize); identical SQL text runs on both engines
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(groupingSetsSql)
    }),

    "q131_pq_ann" -> ((s, dir) => {
      // product quantization (IVF-PQ's compression half): 64-dim floats
      // -> 8 codes over 16-codeword codebooks (32x smaller); ADC top-1
      // over the CODES must recover planted scaled copies (cosine exactly
      // 1 -> near-identical codes -> ADC distance ~0, every other pair
      // far). Scale shape: training on a bounded sample trains all 8
      // subspaces in one aggregate per round; scoring never touches the
      // original vectors.
      import s.implicits._
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.05)).as("embedding"))
      val corpus = emb.unionByName(planted)
      val cb = Pq.train(corpus, "embedding", "vec_id", m = 8, k = 16,
        iters = 3)
      val codes = Pq.encode(corpus, "embedding", "vec_id", cb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val queries = emb.filter(col("vec_id") < 20)
      val hits = Pq.adcTopK(queries, codes, "embedding", "vec_id", cb,
          kNn = 1)
        .filter(col("neighbor_id") === col("query_id") + 100000L)
        .count()
      val nq = queries.count()
      codes.unpersist()
      Seq(
        ("codes_per_vector", cb.m.toLong),
        ("n_queries", nq),
        ("n_vectors", corpus.count()),
        ("top1_planted_recall_pct_ge_90",
          if (hits * 100 >= nq * 90) 1L else 0L)
      ).toDF("metric", "value").orderBy(col("metric"))
    }),

    "q132_ivfpq_ann" -> ((s, dir) => {
      // the full IVF-PQ serving path end-to-end: spherical-k-means cells
      // + PQ codes built into one index; each query probes 8/32 cells and
      // ADC-scores only those codes. Planted scaled copies (cosine
      // exactly 1 -> same probed cell, near-identical codes) must come
      // back top-1.
      import s.implicits._
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.05)).as("embedding"))
      val corpus = emb.unionByName(planted)
      val cb = Pq.train(corpus, "embedding", "vec_id", m = 8, k = 16,
        iters = 2)
      val cents = Similarity.trainSphericalKMeans(corpus, "embedding",
        "vec_id", nCentroids = 32, iters = 2)
      val index = Pq.buildIvfPqIndex(corpus, "embedding", "vec_id", cb,
          cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val queries = emb.filter(col("vec_id") < 20)
      val hits = Pq.ivfPqTopK(queries, index, "embedding", "vec_id", cb,
          cents, kNn = 1, nProbe = 8)
        .filter(col("neighbor_id") === col("query_id") + 100000L)
        .count()
      val nq = queries.count()
      index.unpersist()
      Seq(
        ("n_cells", 32L),
        ("n_queries", nq),
        ("probe_fraction_pct", 25L),
        ("top1_planted_recall_pct_ge_90",
          if (hits * 100 >= nq * 90) 1L else 0L)
      ).toDF("metric", "value").orderBy(col("metric"))
    }),

    "q133_negative_sample" -> ((s, dir) => {
      // contrastive-training negatives: 5 deterministic pseudo-random
      // negatives per query doc, drawn from the query's hash bucket via
      // an equi-join (no query x corpus cross product), ranked by the
      // engine-portable keyHash — same negatives on any engine or layout.
      val docs = t(s, dir, "documents").select(col("doc_id"))
      Sampling.negativeSample(docs.filter(col("doc_id") < 10), "doc_id",
          docs, "doc_id", k = 5, nBuckets = 8)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q134_pagerank" -> ((s, dir) => {
      // weighted PageRank over the per-user item-transition graph (items =
      // the JSON `k` prop, edges = consecutive items in a user's event
      // sequence): the link-analysis quality signal web-scale corpus
      // pipelines rank hosts/items with. Fixed 5 damped iterations with
      // dangling-mass redistribution — deterministic and engine-portable.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      val edges = ev.withColumn("src", lag(col("item"), 1).over(byUser))
        .filter(col("src").isNotNull && col("src") =!= col("item"))
        .groupBy(col("src"), col("item").as("dst"))
        .agg(count(lit(1)).cast("double").as("w"))
      graft.ops.Graph.pageRank(edges, nIter = 5, damping = 0.85)
        .select(col("node"), round(col("pr") * 1000, 6).as("pr_permille"),
          col("in_deg"), col("out_deg"))
        .orderBy(col("node"))
    }),

    "q135_mad_outliers" -> ((s, dir) => {
      // robust per-key outlier screen (median/MAD rule): the value column
      // is heavy-tailed, so the 3-sigma-equivalent MAD cut flags the real
      // tail. Both engines compute medians, deviations, and the threshold
      // product on identical doubles, so the boolean cut agrees bitwise.
      graft.ops.Outliers.madFlag(
          events(s, dir).select(col("event_type"), col("value")),
          "event_type", "value", z = 3.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
          round(min(col("med")), 6).as("med"),
          round(min(col("mad")), 6).as("mad"),
          round(max(col("abs_dev")), 6).as("max_abs_dev"))
        .orderBy(col("event_type"))
    }),

    "q136_dim_stats" -> ((s, dir) => {
      // per-dimension mean/std over the embedding corpus — the
      // standardization/whitening prep pass. posexplode + groupBy(dim)
      // looks like a dims-x-rows shuffle but is NOT: HashAggregate's
      // map-side partials collapse each task to 64 rows before the
      // exchange, so the shuffle is 64 rows per task at any corpus size.
      t(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .select((col("pos") + 1).cast("long").as("dim"),
          col("x").cast("double").as("x"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("x")), 6).as("mean_x"),
          round(stddev_pop(col("x")), 6).as("std_x"),
          round(min(col("x")), 6).as("min_x"),
          round(max(col("x")), 6).as("max_x"))
        .orderBy(col("dim"))
    }),

    "q137_drift_psi" -> ((s, dir) => {
      // PSI drift gate between corpus snapshots: reference = even
      // event_ids, candidate = odd event_ids with a planted 1.25x unit
      // shift — the broken-upstream-feed scenario the monitor exists to
      // catch. Identical longs -> identical smoothed shares on both
      // engines; only ln() is libm-dependent, absorbed by round(6).
      val ev = events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
      val ref = ev.filter(pmod(col("event_id"), lit(2)) === 0)
      val cur = ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .withColumn("value", col("value") * lit(1.25))
      graft.ops.Drift.psi(ref, cur, "event_type", "value",
          binWidth = 25.0, nBins = 10)
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          round(col("psi"), 6).as("psi"))
        .orderBy(col("event_type"))
    }),

    "q138_quality_classifier" -> ((s, dir) => {
      // CCNet-style linear quality/language classifier trained ON the
      // cluster: 3 full-batch logistic GD epochs, each ONE aggregate over
      // the corpus (model broadcasts as literals, gradient = dim
      // partial-agg sums). Output: learned coefficients + training-set
      // log-loss/accuracy, all replayed by the oracle's unrolled updates.
      import s.implicits._
      val (feat, cols) = classifierFeatures(s, dir)
      val w = graft.ops.LinearModel.logisticGd(feat, cols, "y",
        lr = 0.5, nIter = 3)
      val ev = graft.ops.LinearModel.logisticEval(feat, cols, "y", w).head()
      (cols.zipWithIndex.map { case (c, i) => (i.toLong, c, w(i)) } ++
        Seq((4L, "__log_loss", ev.getDouble(0)),
          (5L, "__accuracy", ev.getDouble(1))))
        .toDF("coef_id", "feature", "weight")
        .withColumn("weight", round(col("weight"), 6))
        .orderBy(col("coef_id"))
    }),

    "q139_coverage_select" -> ((s, dir) => {
      // greedy maximum-coverage selection: the 5 docs that together cover
      // the most distinct token 3-grams (submodular data-selection step —
      // "pick a diverse subset"). 3-grams, not tokens: the fixture's
      // vocabulary is 31 words and one doc covers it all (the early-stop
      // case GraphSelectionSpec pins); the 3-gram universe is large
      // enough for 5 real rounds. covered_total = running window sum
      // (gains are disjoint by construction).
      val toks = TF.normTokens(col("text"))
      val grams = when(size(toks) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1),
            element_at(toks, i + 2), element_at(toks, i + 3))))
      val terms = t(s, dir, "documents")
        .select(col("doc_id"), explode(grams).as("item"))
      graft.ops.Selection.greedyMaxCover(terms, 5)
        .select(col("round"), col("id").as("doc_id"), col("gain"))
        .withColumn("covered_total",
          sum(col("gain")).over(Window.orderBy(col("round"))))
        .orderBy(col("round"))
    }),

    "q140_exact_stratified" -> ((s, dir) => {
      // exactly-100-doc validation sample matching the corpus language
      // mix: largest-remainder quotas (integer-exact, no float shares) +
      // engine-portable keyHash draw order within each stratum
      Sampling.exactStratifiedSample(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", 100L)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    "q141_join_size" -> ((s, dir) => {
      // join-cardinality planning statistic: exact sum(cntA*cntB) over the
      // per-key count tables + the deterministic 1-in-8 keyHash key-sample
      // estimate, both from ONE aggregate — the broadcast-vs-shuffle and
      // skew decision input, without running the join
      graft.ops.Profile.joinSizeStats(
        t(s, dir, "orders"), "o_orderkey",
        t(s, dir, "lineitem"), "l_orderkey", sampleMod = 8)
    }),

    "q142_label_prop" -> ((s, dir) => {
      // annotate-one-doc-per-cluster, spread to the rest: originals carry
      // lang seeds, mutated near-dup copies (+100000) take the majority
      // neighbor label along the 3-gram Jaccard pair graph; 2 monotone
      // rounds (round = the frontier distance from a seed)
      val pairs = Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"))
      val seeds = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      graft.ops.Graph.labelPropagate(pairs, seeds, nIter = 2)
        .filter(col("round") > 0)
        .select(col("id").as("doc_id"), col("label"), col("round"))
        .orderBy(col("doc_id"))
    }),

    "q143_pmi_bigrams" -> ((s, dir) => {
      // collocation mining: top-20 adjacent-token pairs by PMI (ranked on
      // the ROUNDED score + lexicographic tiebreak so ln() ulps can't
      // flip the order) — the phrase-detection / tokenizer-vocab pass.
      // The final window ranks the bounded bigram-stats table, not rows.
      val docs = t(s, dir, "documents")
        .select(TF.normTokens(col("text")).as("toks"))
      graft.ops.Collocations.pmiBigrams(docs, "toks", minCount = 5L)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("pmi").desc, col("w1"), col("w2"))).cast("long"))
        .filter(col("rank") <= 20)
        .orderBy(col("rank"))
    }),

    "q144_calibration" -> ((s, dir) => {
      // reliability diagram for the q138 classifier: decile-bin the
      // predicted probability, compare mean prediction vs observed
      // positive rate per bin — the "is the quality score a probability
      // or just a ranking" audit. One aggregate over the scored corpus.
      val (feat, cols) = classifierFeatures(s, dir)
      val w = graft.ops.LinearModel.logisticGd(feat, cols, "y",
        lr = 0.5, nIter = 3)
      val z = cols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
        .reduce(_ + _)
      feat.withColumn("p", lit(1.0) / (lit(1.0) + exp(-z)))
        .withColumn("bin", least(floor(col("p") * 10), lit(9)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("p")), 6).as("avg_p"),
          round(avg(col("y")), 6).as("frac_pos"))
        .orderBy(col("bin"))
    }),

    "q145_weighted_wor" -> ((s, dir) => {
      // Efraimidis-Spirakis weighted sampling WITHOUT replacement: the 30
      // largest u^(1/w) keys (u deterministic from keyHash, w = quality +
      // 0.1) are an exact weighted no-replacement draw — the "pick N docs
      // favoring quality, no duplicates, reproducible anywhere" op that
      // Bernoulli q63 can't express (it can't hit a fixed N).
      val docs = t(s, dir, "documents")
        .withColumn("quality", TF.qualityScore(col("text")))
        .withColumn("w", col("quality") + lit(0.1))
      Sampling.weightedSampleWithoutReplacement(docs, "doc_id", "w", 30)
        .select(col("doc_id"), col("lang"),
          round(col("quality"), 6).as("quality"), col("rank"))
        .orderBy(col("rank"))
    }),

    "q146_correlated_scalar" -> ((s, dir) => {
      // TPC-H Q17 shape: correlated scalar subquery (per-partkey average
      // gates the outer rows); identical SQL text on both engines —
      // Catalyst decorrelates into aggregate + join
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql(correlatedScalarSql)
    }),

    "q147_exists_chain" -> ((s, dir) => {
      // TPC-H Q21 shape: EXISTS + NOT EXISTS correlated chain -> semi +
      // anti joins after decorrelation; identical SQL text on both engines
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql(existsChainSql)
    }),

    "q148_assoc_rules" -> ((s, dir) => {
      // market-basket association rules over per-user event property
      // baskets (a-priori pruned: only items clearing the 20% relative
      // support floor enter pair generation). Top-30 rules by ROUNDED
      // lift + lexicographic tiebreak — engine-portable order.
      val baskets = events(s, dir)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      graft.ops.Association.pairRules(baskets, "user_id", "item", 0.2)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("lift").desc, col("antecedent"),
            col("consequent"))).cast("long"))
        .filter(col("rank") <= 30)
        .orderBy(col("rank"))
    }),

    "q149_chi2_terms" -> ((s, dir) => {
      // chi-squared feature selection: top-5 class-identifying tokens per
      // language by the 2x2 contingency statistic over doc-level presence
      // — ranked on the ROUNDED score + token tiebreak. Counts-only after
      // one explode; class totals broadcast.
      val docs = t(s, dir, "documents")
        .select(col("lang"), TF.normTokens(col("text")).as("toks"))
      graft.ops.FeatureSelection.chi2Terms(docs, "lang", "toks", minDocFreq = 5L)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("cls"))
            .orderBy(col("chi2").desc, col("term"))).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("cls").as("lang"), col("term"), col("n_ct"),
          col("chi2"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    "q150_naive_bayes" -> ((s, dir) => {
      // generative counterpart to the q138 logistic classifier:
      // multinomial naive Bayes lang-id trained on the doc_id%5<4 split,
      // confusion matrix on the held-out fifth. Scores are rounded before
      // the per-doc argmax (lang tiebreak) so both engines rank alike.
      val norm = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TF.normTokens(col("text")).as("toks"))
      val train = norm.filter(col("doc_id") % 5 < 4)
      val ev = norm.filter(col("doc_id") % 5 === 4)
      val sc = graft.ops.NaiveBayes.scores(train, ev, "doc_id", "lang", "toks")
      val pred = sc.withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("cls"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cls").as("pred_lang"))
      ev.select(col("doc_id"), col("lang").as("true_lang"))
        .join(pred, Seq("doc_id"))
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }),

    "q151_decayed_engagement" -> ((s, dir) => {
      // recency-weighted engagement: exponentially decayed purchase value
      // per user, tau = 7 days against the corpus max event time, in
      // exact microseconds on both engines. Top-20 on the ROUNDED score.
      val ev = events(s, dir).filter(col("event_type") === "purchase")
      graft.ops.Resample.decayedSum(ev, "user_id", "ts", "value", 7.0 * 86400)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("decayed_sum").desc, col("user_id"))).cast("long"))
        .filter(col("rank") <= 20)
        .orderBy(col("rank"))
    }),

    "q152_mutual_info" -> ((s, dir) => {
      // column-dependency audit: mutual information + normalized MI
      // between lang and source over documents — everything computed from
      // the bounded joint count table, data shuffles once.
      graft.ops.Profile.mutualInformation(t(s, dir, "documents"), "lang", "source")
    }),

    "q153_triangles" -> ((s, dir) => {
      // triangle membership over the 3-gram Jaccard near-dup graph —
      // clique-density audit of dup clusters. Degree-ordered orientation
      // bounds the wedge join; the oracle replays with id ordering (any
      // total order finds each triangle exactly once).
      val pairs = Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"))
      graft.ops.Graph.triangleCounts(pairs, "idA", "idB")
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n_triangles").desc, col("node"))).cast("long"))
        .filter(col("rank") <= 20)
        .select(col("node").as("doc_id"), col("n_triangles"), col("rank"))
        .orderBy(col("rank"))
    }),

    "q154_event_trigrams" -> ((s, dir) => {
      // behavioral sequence mining: top-15 event-type trigrams along each
      // user's (ts, event_id)-ordered stream — one window shuffle, runs
      // collapse to partial-agg counts, total re-aggregates the bounded
      // trigram table.
      graft.ops.Sequence.ngramCounts(events(s, dir), "user_id", "ts",
          "event_id", "event_type", 3)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3")))
          .cast("long"))
        .filter(col("rank") <= 15)
        .orderBy(col("rank"))
    }),

    "q155_winsorized" -> ((s, dir) => {
      // tail-robust location estimates per event_type: winsorized (clamp
      // into the exact p10-p90 band) and trimmed (drop outside it) means
      // next to the plain mean — one percentile pass + one aggregate.
      graft.ops.Outliers.winsorizedStats(events(s, dir), "event_type",
          "value", 0.1, 0.9)
        .orderBy(col("event_type"))
    }),

    "q156_benford" -> ((s, dir) => {
      // fabricated-numbers screen: leading-digit distribution of value
      // per event_type vs Benford expectation, per-digit chi-squared
      // contribution; string-domain digit extraction (log10/pow can
      // misround at powers of ten).
      graft.ops.Profile.benfordAudit(events(s, dir), "event_type", "value")
        .select(col("key").as("event_type"), col("digit"), col("n_d"),
          col("obs_share"), col("benford_p"), col("chi2_term"))
        .orderBy(col("event_type"), col("digit"))
    }),

    "q157_jaro_winkler_er" -> ((s, dir) => {
      // entity-resolution scoring: first-token-blocked Jaro-Winkler over
      // distinct part names via the native codegen'd expression — the
      // oracle re-scores the same pairs with DuckDB's INDEPENDENT
      // jaro_winkler_similarity implementation (same standard parameters),
      // a cross-implementation check, not a recompute.
      val names = t(s, dir, "part").select(col("p_name")).distinct()
        .withColumn("blk", substring_index(col("p_name"), " ", 1))
      names.select(col("blk"), col("p_name").as("name_a"))
        .join(names.select(col("blk"), col("p_name").as("name_b")), Seq("blk"))
        .filter(col("name_a") < col("name_b"))
        .withColumn("jw", round(graft.expressions.TextExpressions
          .jaroWinkler(col("name_a"), col("name_b")), 6))
        .filter(col("jw") >= 0.85)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("jw").desc, col("name_a"), col("name_b")))
          .cast("long"))
        .filter(col("rank") <= 20)
        .select(col("name_a"), col("name_b"), col("jw"), col("rank"))
        .orderBy(col("rank"))
    }),

    "q158_source_overlap" -> ((s, dir) => {
      // corpus-diversity audit: pairwise vocabulary Jaccard between
      // sources — posting-list self-join on the token key over the
      // (source, token) presence table; sizes re-aggregate that table
      // and broadcast back. |sources| is bounded, pairs are |S|^2/2.
      val st = t(s, dir, "documents")
        .select(col("source"), explode(TF.normTokens(col("text"))).as("tok"))
        .distinct()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      st.select(col("tok"), col("source").as("src_a"))
        .join(st.select(col("tok"), col("source").as("src_b")), Seq("tok"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("i"))
        .join(broadcast(sizes.select(col("source").as("src_a"),
          col("sz").as("sz_a"))), Seq("src_a"))
        .join(broadcast(sizes.select(col("source").as("src_b"),
          col("sz").as("sz_b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("i"),
          round(col("i").cast("double") /
            (col("sz_a") + col("sz_b") - col("i")), 6).as("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    "q159_hits" -> ((s, dir) => {
      // HITS hubs/authorities over the item-transition graph (referrer
      // quality vs destination quality — PageRank q134 conflates them);
      // 2 fixed mutual-reinforcement rounds, L2 norms folded in as
      // broadcast 1-row frames. Top-15 authorities on ROUNDED scores.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      val edges = ev.withColumn("src", lag(col("item"), 1).over(byUser))
        .filter(col("src").isNotNull && col("src") =!= col("item"))
        .select(col("src"), col("item").as("dst"))
      graft.ops.Graph.hits(edges, nIter = 2)
        .select(col("node"), round(col("auth"), 6).as("auth"),
          round(col("hub"), 6).as("hub"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("auth").desc, col("node"))).cast("long"))
        .filter(col("rank") <= 15)
        .orderBy(col("rank"))
    }),

    "q160_source_calibration" -> ((s, dir) => {
      // per-source score calibration: each doc's GLOBAL quality percentile
      // (two-phase distributed ranking — no single ordering task), then
      // per-source mean percentile: a fair scorer gives every source ~0.5;
      // systematic deviation = the source's quality prior, the
      // up/down-weighting input for mixture sampling.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TF.qualityScore(col("text")).as("quality"))
      val ranked = graft.ops.PrefixSum.globalRank(docs,
        Seq(col("quality"), col("doc_id")), "grk")
      val n = docs.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(n))
        .withColumn("pr", (col("grk") - 1).cast("double") / (col("n_total") - 1))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("quality")), 6).as("avg_quality"),
          round(avg(col("pr")), 6).as("avg_pctile"),
          round(min(col("pr")), 6).as("min_pctile"),
          round(max(col("pr")), 6).as("max_pctile"))
        .orderBy(col("source"))
    }),

    "q161_rbo" -> ((s, dir) => {
      // rank-biased overlap (p=0.9, depth 10) between the BM25 and
      // embedding-cosine rankings — the "do the two retrieval systems
      // agree" metric next to q128's fusion. Each common doc contributes
      // the SUFFIX sum of (1-p)p^(d-1)/d from depth max(ra, rb): the
      // depth table is 10 broadcast rows, the join is rank-pair sized.
      import s.implicits._
      val queries = Seq(
        (1L, "spark window agg"),
        (2L, "vector scan batch"),
        (3L, "customer stream query")).toDF("query_id", "query_text")
      val lex = Search.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
          queries, 10)
        .select(col("query_id"), col("doc_id"),
          col("rank").cast("long").as("ra"))
      val emb = t(s, dir, "embeddings")
      val sem = Similarity.bruteForceTopK(
          emb.filter(col("vec_id").isin(1L, 2L, 3L)), emb,
          "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").cast("long").as("rb"))
      val suffix = s.range(1, 11).select(col("id").as("d"))
        .withColumn("term", lit(0.1) * pow(lit(0.9), col("d") - 1) / col("d"))
        .withColumn("suf", sum(col("term")).over(
          Window.orderBy(col("d").desc)
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("d"), col("suf"))
      val common = lex.join(sem, Seq("query_id", "doc_id"))
        .withColumn("d", greatest(col("ra"), col("rb")))
        .join(broadcast(suffix), Seq("d"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_common"), sum(col("suf")).as("rbo"))
      queries.select(col("query_id")).join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          round(coalesce(col("rbo"), lit(0.0)), 6).as("rbo"))
        .orderBy(col("query_id"))
    }),

    "q162_pareto_frontier" -> ((s, dir) => {
      // skyline selection: the quality-vs-length trade-off curve (no doc
      // on it is beaten on both axes) — distinct points via partial agg,
      // then a two-phase range-partitioned prefix-max scan (no single
      // global ordering task).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TF.qualityScore(col("text")).as("quality"),
          TF.tokenCount(col("text")).cast("long").as("ntok"))
      graft.ops.Selection.paretoFrontier2d(docs, "quality", "ntok", "doc_id")
        .select(round(col("x"), 6).as("quality"), col("y").as("ntok"),
          col("min_id").as("min_doc"), col("n_rows").as("n_docs"))
        .orderBy(col("quality").desc, col("ntok").desc, col("min_doc"))
    }),

    "q163_markov_predict" -> ((s, dir) => {
      // first-order Markov next-event prediction: transition counts from
      // the first 80% of each user's stream (one window shuffle), argmax
      // next per prev type, held-out accuracy on the remaining 20% —
      // the sequence-model sanity baseline over behavioral data.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seq0 = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .withColumn("rn", row_number().over(byUser).cast("long"))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col("user_id"))))
        .filter(col("prev").isNotNull)
        .withColumn("is_train", col("rn") <= floor(col("cnt") * 0.8))
      val model = seq0.filter(col("is_train"))
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("c"))
      val pred = model.withColumn("r", row_number().over(
          Window.partitionBy(col("prev"))
            .orderBy(col("c").desc, col("next"))))
        .filter(col("r") === 1)
        .select(col("prev"), col("next").as("pred_next"))
      val trainN = model.groupBy(col("prev")).agg(sum(col("c")).as("n_train"))
      seq0.filter(!col("is_train"))
        .join(broadcast(pred), Seq("prev"))
        .join(broadcast(trainN), Seq("prev"))
        .groupBy(col("prev").as("prev_type"), col("pred_next"),
          col("n_train"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("event_type") === col("pred_next"), 1L).otherwise(0L))
            .as("n_correct"))
        .withColumn("accuracy",
          round(col("n_correct").cast("double") / col("n_test"), 6))
        .orderBy(col("prev_type"))
    }),

    "q164_tfidf_pairs" -> ((s, dir) => {
      // lexical doc-doc near-match: sparse TF-IDF cosine over the
      // df-pruned vocabulary on the planted near-dup corpus — the
      // weighted complement of set-based n-gram Jaccard (q25). Top-20 on
      // the ROUNDED cosine.
      val pairs = Search.tfidfPairs(docsWithNearDups(s, dir), "text",
        "doc_id", minDf = 2L, maxDf = 400L, threshold = 0.5)
      pairs.withColumn("rank", row_number().over(
          Window.orderBy(col("cosine").desc, col("idA"), col("idB")))
          .cast("long"))
        .filter(col("rank") <= 20)
        .orderBy(col("rank"))
    }),

    "q165_entropy_rate" -> ((s, dir) => {
      // entropy rate of user behavior: H(next | prev) from the transition
      // counts (counts-only after one window shuffle), next to the
      // unconditional H(next) — the gap is how much the previous event
      // predicts the next one (the sequence-level twin of q152's MI).
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("c"))
      val tot = tr.agg(sum(col("c")).as("n"))
      val prevTot = tr.groupBy(col("prev")).agg(sum(col("c")).as("cp"))
      val nextTot = tr.groupBy(col("next")).agg(sum(col("c")).as("cn"))
      val hCond = tr.join(broadcast(prevTot), Seq("prev"))
        .crossJoin(broadcast(tot))
        .agg((-sum((col("c").cast("double") / col("n")) *
          log(col("c").cast("double") / col("cp")))).as("h_cond"))
      val hNext = nextTot.crossJoin(broadcast(tot))
        .agg((-sum((col("cn").cast("double") / col("n")) *
          log(col("cn").cast("double") / col("n")))).as("h_next"))
      hNext.crossJoin(broadcast(hCond))
        .select(round(col("h_next"), 6).as("h_next"),
          round(col("h_cond"), 6).as("h_cond"),
          round(col("h_next") - col("h_cond"), 6).as("info_gain"))
    }),

    "q166_trend_slopes" -> ((s, dir) => {
      // per-type linear trend of value over time: closed-form least
      // squares from ONE aggregate of (n, Σx, Σy, Σxy, Σx²) — x in days
      // since the corpus start so the arithmetic is well-conditioned and
      // identical on both engines.
      val ev = events(s, dir)
      val t0 = ev.agg(min(unix_micros(col("ts"))).as("t0"))
      ev.crossJoin(broadcast(t0))
        .withColumn("x", (unix_micros(col("ts")) - col("t0")).cast("double")
          / lit(86400e6))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("value")).as("sy"),
          sum(col("x") * col("value")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
             (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"), 6)
            .as("intercept"))
        .orderBy(col("event_type"))
    }),

    "q167_correlations" -> ((s, dir) => {
      // Pearson correlations between lineitem measures via the EXPLICIT
      // sum formula (engine corr() aggregates differ in n vs n-1 and
      // pairwise-null handling across engines; raw sums do not): one
      // aggregate pass for all three pairs.
      def r(x: String, y: String) = {
        val n = col("n")
        (n * col(s"s_${x}_$y") - col(s"s_$x") * col(s"s_$y")) /
          sqrt((n * col(s"s_${x}_$x") - col(s"s_$x") * col(s"s_$x")) *
            (n * col(s"s_${y}_$y") - col(s"s_$y") * col(s"s_$y")))
      }
      t(s, dir, "lineitem")
        .select(col("l_quantity").cast("double").as("q"),
          col("l_extendedprice").cast("double").as("p"),
          col("l_discount").cast("double").as("d"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("q")).as("s_q"), sum(col("p")).as("s_p"),
          sum(col("d")).as("s_d"),
          sum(col("q") * col("q")).as("s_q_q"),
          sum(col("p") * col("p")).as("s_p_p"),
          sum(col("d") * col("d")).as("s_d_d"),
          sum(col("q") * col("p")).as("s_q_p"),
          sum(col("q") * col("d")).as("s_q_d"),
          sum(col("p") * col("d")).as("s_p_d"))
        .select(col("n").cast("long").as("n"),
          round(r("q", "p"), 6).as("r_qty_price"),
          round(r("q", "d"), 6).as("r_qty_disc"),
          round(r("p", "d"), 6).as("r_price_disc"))
    }),

    "q168_ks_test" -> ((s, dir) => {
      // two-sample Kolmogorov-Smirnov: en vs non-en quality distributions.
      // Points collapse to the distinct-value count table FIRST (partial
      // agg), cumulative counts via the two-phase prefix scan (unique
      // order = the value itself), KS = max CDF gap — the
      // exact-distribution drift gate next to binned PSI (q137).
      val docs = t(s, dir, "documents")
        .select(TF.qualityScore(col("text")).as("v"),
          (col("lang") === "en").as("is_a"))
      val pts = docs.groupBy(col("v"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
      val c1 = graft.ops.PrefixSum.groupedRunningSum(
        pts.withColumn("__g", lit(1)), "__g", "v", col("ca"), "cum_a")
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        c1, "__g", "v", col("cb"), "cum_b")
      val tot = pts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        .select(col("na"), col("nb"), col("v"),
          round(abs(col("cum_a").cast("double") / col("na") -
            col("cum_b").cast("double") / col("nb")), 6).as("gap"))
        .groupBy(col("na"), col("nb"))
        .agg(max(col("gap")).as("ks"),
          round(max_by(col("v"), struct(col("gap"), -col("v"))), 6)
            .as("ks_at"))
        .select(col("na"), col("nb"), col("ks"), col("ks_at"))
    }),

    "q169_auc" -> ((s, dir) => {
      // ROC AUC of the q138/q144 classifier via the tie-correct
      // Mann-Whitney rank-sum: distinct-score table + one two-phase
      // cumulative count gives average ranks without any global sort.
      val (feat, cols) = classifierFeatures(s, dir)
      val w = graft.ops.LinearModel.logisticGd(feat, cols, "y",
        lr = 0.5, nIter = 3)
      val z = cols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
        .reduce(_ + _)
      val scored = feat.select(col("y"),
        (lit(1.0) / (lit(1.0) + exp(-z))).as("p"))
      val pts = scored.groupBy(col("p"))
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("cpos"),
          count(lit(1)).as("ctot"))
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        pts.withColumn("__g", lit(1)), "__g", "p", col("ctot"), "cum_t")
      val rsum = cum
        .select((col("cpos").cast("double") *
          (col("cum_t").cast("double") - (col("ctot") - 1).cast("double") / 2))
          .as("rs"))
        .agg(sum(col("rs")).as("rank_sum"))
      val tot = pts.agg(sum(col("cpos")).as("n_pos"),
        (sum(col("ctot")) - sum(col("cpos"))).as("n_neg"))
      rsum.crossJoin(broadcast(tot))
        .select(col("n_pos"), col("n_neg"),
          round((col("rank_sum") - col("n_pos").cast("double") *
            (col("n_pos") + 1) / 2) /
            (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"))
    }),

    "q170_gini" -> ((s, dir) => {
      // engagement concentration: Gini over per-user total value via the
      // two-phase global rank (no single ordering task) plus the top-10%
      // share — the "how skewed is the corpus toward heavy users" audit.
      val totals = events(s, dir)
        .groupBy(col("user_id")).agg(sum(col("value")).as("t"))
      val ranked = graft.ops.PrefixSum.globalRank(totals,
        Seq(col("t"), col("user_id")), "rk")
      val n = totals.agg(count(lit(1)).as("n_users"), sum(col("t")).as("total"))
      ranked.crossJoin(broadcast(n))
        .groupBy(col("n_users"), col("total"))
        .agg(
          round(lit(2.0) * sum(col("rk") * col("t")) /
            (col("n_users") * col("total")) -
            (col("n_users") + 1).cast("double") / col("n_users"), 6)
            .as("gini"),
          round(sum(when(col("rk") > col("n_users") * 0.9, col("t"))
            .otherwise(0.0)) / col("total"), 6).as("top_decile_share"))
        .select(col("n_users"), round(col("total"), 4).as("total"),
          col("gini"), col("top_decile_share"))
    }),

    "q171_window_gallery" -> ((s, dir) => {
      // ranking-window gallery as identical SQL text on both engines:
      // dense_rank/cume_dist are tie-stable by definition, nth_value runs
      // over an explicit full frame with a total order.
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(windowGallerySql)
    }),

    "q172_equidepth_hist" -> ((s, dir) => {
      // equal-mass deciles of extended price: equi-depth complement of the
      // equi-width q103 — one percentile aggregate for all 9 edges, bin
      // assignment by strict-compare count against the broadcast array.
      graft.ops.Profile.equiDepthHistogram(
          t(s, dir, "lineitem").select(
            col("l_extendedprice").cast("double").as("v")), "v", 10)
        .orderBy(col("bucket"))
    }),

    "q173_vocab_drift" -> ((s, dir) => {
      // vocabulary drift between corpus halves (doc_id parity): KL(P||Q)
      // over add-1-smoothed unigram distributions on the union vocab,
      // plus the top-15 tokens by rounded KL contribution — the
      // token-space twin of numeric PSI (q137).
      val toks = t(s, dir, "documents")
        .select((col("doc_id") % 2 === 0).as("is_p"),
          explode(TF.normTokens(col("text"))).as("tok"))
      val counts = toks.groupBy(col("tok"))
        .agg(sum(when(col("is_p"), 1L).otherwise(0L)).as("cp"),
          sum(when(!col("is_p"), 1L).otherwise(0L)).as("cq"))
      val tot = counts.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"),
        count(lit(1)).as("v"))
      val sc = counts.crossJoin(broadcast(tot))
        .withColumn("p", (col("cp") + 1).cast("double") / (col("np") + col("v")))
        .withColumn("q", (col("cq") + 1).cast("double") / (col("nq") + col("v")))
        .withColumn("contrib", round(col("p") * log(col("p") / col("q")), 8))
      val kl = sc.agg(round(sum(col("p") * log(col("p") / col("q"))), 6)
        .as("kl_total"))
      sc.withColumn("rank", row_number().over(
          Window.orderBy(col("contrib").desc, col("tok"))).cast("long"))
        .filter(col("rank") <= 15)
        .crossJoin(broadcast(kl))
        .select(col("rank"), col("tok"), col("cp"), col("cq"),
          col("contrib"), col("kl_total"))
        .orderBy(col("rank"))
    }),

    "q174_audio_decode" -> ((s, dir) => {
      // REAL audio decode through the multimodal seam: planted RIFF/WAVE
      // PCM tones (pure-JDK synth + parse — the audio twin of the q31/q117
      // ImageIO path) decoded back to rate/duration/RMS and checked
      // against the planted truth; non-audio payloads take the flagged
      // deterministic fallback. Output = invariant metric row.
      import s.implicits._
      val amps = Seq(0.25, 0.5, 0.9)
      val rates = Seq(8000, 16000, 44100)
      val planted = (0 until 24).map { i =>
        val rate = rates(i % 3); val millis = 100 * (1 + i % 2)
        val amp = amps((i / 3) % 3)
        (i.toLong, rate, millis, amp,
          graft.llm.Multimodal.sineWav(rate, millis, 200.0 + 37 * i, amp))
      }
      val fakes = (24 until 30).map(i =>
        (i.toLong, 0, 0, 0.0, s"not audio payload $i".getBytes("UTF-8")))
      val df = (planted ++ fakes)
        .toDF("id", "rate", "millis", "amp", "payload")
      val dec = graft.llm.Multimodal.decodeAudioMetaKeyed(df, "id", "payload")
      df.select(col("id"), col("rate"), col("millis"), col("amp"))
        .join(dec, Seq("id"))
        .agg(count(lit(1)).as("n_payloads"),
          sum(when(col("is_real"), 1L).otherwise(0L)).as("n_real"),
          sum(when(col("is_real") && col("sample_rate") === col("rate") &&
            col("channels") === 1 && col("bits") === 16, 1L).otherwise(0L))
            .as("n_rate_ok"),
          sum(when(col("is_real") && col("duration_ms") === col("millis"),
            1L).otherwise(0L)).as("n_dur_ok"),
          sum(when(col("is_real") &&
            abs(col("rms_milli") - round(col("amp") * lit(1000.0) /
              math.sqrt(2.0))) <= 20, 1L).otherwise(0L)).as("n_rms_ok"),
          sum(when(!col("is_real"), 1L).otherwise(0L)).as("n_fake_flagged"))
    }),

    "q175_acf" -> ((s, dir) => {
      // autocorrelation of the daily engagement series at lags 1..3. The
      // day-level reduction happens in a hash aggregate FIRST (series
      // length is calendar-bounded, not corpus-bounded), the index comes
      // from the two-phase global rank, and each lag is an equi-join on
      // the shifted index — no window over raw events, no O(n²).
      import s.implicits._
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("y"))
      val idx = graft.ops.PrefixSum.globalRank(daily, Seq(col("day")), "i")
        .select(col("i"), col("y"))
      val st = idx.agg(count(lit(1)).cast("double").as("n"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
        .select((col("sy") / col("n")).as("mu"),
          (col("syy") - col("sy") * col("sy") / col("n")).as("denom"))
      val shifted = idx.crossJoin(broadcast(Seq(1, 2, 3).toDF("lag")))
        .select(col("lag"), (col("i") + col("lag")).as("i"),
          col("y").as("y_lag"))
      idx.join(shifted, Seq("i"))
        .crossJoin(broadcast(st))
        .groupBy(col("lag"), col("mu"), col("denom"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("y") - col("mu")) * (col("y_lag") - col("mu"))).as("num"))
        .select(col("lag"), col("n_pairs"),
          round(col("num") / col("denom"), 6).as("acf"))
        .orderBy(col("lag"))
    }),

    "q176_cusum" -> ((s, dir) => {
      // CUSUM changepoint over the daily revenue series: S_i = cum_i −
      // i·mean, built from integer cents so the running state is EXACT
      // long arithmetic (engine-portable; floats appear only in the final
      // statistic, computed from identical longs on both engines). The
      // two-phase prefix sum keeps every task range-partition-bounded;
      // the argmax is a bounded top-1, not a global sort.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"))
      val idx = graft.ops.PrefixSum.globalRank(daily, Seq(col("day")), "i")
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        idx.withColumn("__g", lit(1)), "__g", "day", col("cents"),
        "cum_cents")
      val st = daily.agg(sum(col("cents")).cast("double").as("tot"),
        count(lit(1)).cast("double").as("n"))
      cum.crossJoin(broadcast(st))
        .withColumn("s", col("cum_cents").cast("double") / 100.0 -
          col("i").cast("double") * (col("tot") / 100.0) / col("n"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("i").as("day_idx"),
          round(abs(col("s")), 4).as("abs_cusum"),
          round(col("s"), 4).as("cusum"))
        .orderBy(col("abs_cusum").desc, col("day"))
        .limit(1)
    }),

    "q177_kaplan_meier" -> ((s, dir) => {
      // Kaplan-Meier churn survival over customer order lifespans:
      // duration = days first→last order, churn event = last order >90
      // days before the corpus end (else right-censored). Risk sets are
      // ONE suffix count over the distinct-duration table (calendar-
      // bounded, so the product window is safe at any customer count);
      // the product-limit estimator is exp(Σ ln((n−d)/n)) over event
      // times — integer-derived ratios, 6-dp parity holds cross-engine.
      val maxD = t(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
      val cust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first"),
          max(col("o_orderdate")).as("last"))
        .crossJoin(broadcast(maxD))
        .select(datediff(col("last"), col("first")).cast("long").as("dur"),
          (datediff(col("mx"), col("last")) > 90).as("event"))
      val byDur = cust.groupBy(col("dur"))
        .agg(count(lit(1)).as("c_all"),
          sum(when(col("event"), 1L).otherwise(0L)).as("d_events"))
      val tot = byDur.agg(sum(col("c_all")).as("n_total"))
      val risk = graft.ops.PrefixSum.groupedRunningSum(
          byDur.withColumn("__g", lit(1)), "__g", "dur", col("c_all"),
          "cum_all")
        .crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_total") - (col("cum_all") - col("c_all")))
      // n_risk == d_events can only happen at the maximal duration (no
      // one outlives it) — excluded so ln stays finite on both engines.
      val w = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, 0)
      risk.filter(col("d_events") > 0 && col("n_risk") > col("d_events"))
        .withColumn("survival", round(exp(sum(log(
          (col("n_risk") - col("d_events")).cast("double") /
            col("n_risk").cast("double"))).over(w)), 6))
        .select(col("dur").as("duration_days"), col("n_risk"),
          col("d_events"), col("survival"))
        .orderBy(col("duration_days"))
    }),

    "q178_rfm" -> ((s, dir) => {
      // RFM segmentation with PORTABLE quintiles: monetary in exact
      // integer cents (double sums would wobble the sort at quintile
      // boundaries), ranks from the two-phase global rank (no
      // whole-table NTILE window), and the quintile as explicit integer
      // arithmetic 1 + (rank−1)·5 div n — identical on any engine,
      // every task range-partition-bounded at any customer count.
      val maxD = t(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
      val cust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last"),
          count(lit(1)).as("freq"),
          sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"))
        .crossJoin(broadcast(maxD))
        .select(col("o_custkey"),
          datediff(col("mx"), col("last")).cast("long").as("recency"),
          col("freq"), col("cents"))
      val tot = cust.agg(count(lit(1)).as("n_cust"))
      def quint(df: DataFrame, rankCol: String, out: String) =
        df.crossJoin(broadcast(tot))
          // `div`, not `/`: Spark's `/` on longs yields DOUBLE
          .withColumn(out, expr(s"1 + (($rankCol - 1) * 5) div n_cust"))
          .drop(rankCol, "n_cust")
      var scored = graft.ops.PrefixSum.globalRank(cust,
        Seq(col("recency"), col("o_custkey")), "rr")
      scored = quint(scored, "rr", "r_q")
      scored = quint(graft.ops.PrefixSum.globalRank(scored,
        Seq(-col("freq"), col("o_custkey")), "fr"), "fr", "f_q")
      scored = quint(graft.ops.PrefixSum.globalRank(scored,
        Seq(-col("cents"), col("o_custkey")), "mr"), "mr", "m_q")
      scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("cents")).cast("double") / 100.0, 2)
            .as("monetary_total"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    }),

    "q179_two_proportion" -> ((s, dir) => {
      // two-proportion z-test: high-value order rate, BUILDING vs
      // MACHINERY customers. ONE aggregate pass over the fact join; the
      // statistic is computed from four integers so both engines see
      // identical doubles.
      val hv = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select((col("c_mktsegment") === "BUILDING").as("is_a"),
          (col("o_totalprice") > 150000).as("hit"))
      hv.agg(
          sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("is_a") && col("hit"), 1L).otherwise(0L)).as("x_a"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(!col("is_a") && col("hit"), 1L).otherwise(0L)).as("x_b"))
        .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          round(col("x_a").cast("double") / col("n_a"), 6).as("p_a"),
          round(col("x_b").cast("double") / col("n_b"), 6).as("p_b"),
          round((col("x_a").cast("double") / col("n_a") -
              col("x_b").cast("double") / col("n_b")) /
            sqrt(((col("x_a") + col("x_b")).cast("double") /
                (col("n_a") + col("n_b"))) *
              (lit(1.0) - (col("x_a") + col("x_b")).cast("double") /
                (col("n_a") + col("n_b"))) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4)
            .as("z"))
    }),

    "q180_simpson" -> ((s, dir) => {
      // Simpson's-paradox audit: does the BUILDING-vs-MACHINERY
      // high-value rate gap hold inside every order-priority stratum, or
      // does pooling reverse it? Counts-only per stratum + a pooled
      // 'ALL' row; the reversal flag is integer-derived (rate
      // comparison via cross-multiplication — no float division in the
      // decision).
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("o_orderpriority").as("stratum"),
          (col("c_mktsegment") === "BUILDING").as("is_a"),
          (col("o_totalprice") > 150000).as("hit"))
      val per = base.groupBy(col("stratum"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("is_a") && col("hit"), 1L).otherwise(0L)).as("x_a"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(!col("is_a") && col("hit"), 1L).otherwise(0L)).as("x_b"))
      val pooled = per.agg(sum(col("n_a")).as("n_a"),
          sum(col("x_a")).as("x_a"), sum(col("n_b")).as("n_b"),
          sum(col("x_b")).as("x_b"))
        .withColumn("stratum", lit("ALL"))
        .select(col("stratum"), col("n_a"), col("x_a"), col("n_b"),
          col("x_b"))
      per.select(col("stratum"), col("n_a"), col("x_a"), col("n_b"),
          col("x_b"))
        .unionByName(pooled)
        .select(col("stratum"), col("n_a"), col("x_a"), col("n_b"),
          col("x_b"),
          round(col("x_a").cast("double") / col("n_a"), 6).as("rate_a"),
          round(col("x_b").cast("double") / col("n_b"), 6).as("rate_b"),
          // a leads iff x_a·n_b > x_b·n_a — exact cross-multiply in
          // decimal so the comparison can't overflow long at any count
          (col("x_a").cast("decimal(20,0)") * col("n_b").cast("decimal(20,0)") >
            col("x_b").cast("decimal(20,0)") * col("n_a").cast("decimal(20,0)"))
            .as("a_leads"))
        .orderBy(col("stratum"))
    }),

    "q181_snm_blocking" -> ((s, dir) => {
      // sorted-neighborhood ER blocking — the classic alternative when
      // key-blocking (q157's first-token blocks) skews: ONE global sort
      // via the two-phase rank, then candidate pairs are the w=2 index
      // neighbors (a shifted equi-join, so candidate count is exactly
      // w·n — bounded by construction, no hot block can go quadratic).
      // Scores come from the native codegen'd Jaro-Winkler; the oracle
      // re-scores with DuckDB's independent implementation.
      import s.implicits._
      val names = t(s, dir, "part").select(col("p_name")).distinct()
      val idx = graft.ops.PrefixSum.globalRank(names,
        Seq(col("p_name")), "i")
      val shifted = idx.crossJoin(broadcast(Seq(1, 2).toDF("off")))
        .select((col("i") + col("off")).as("i"),
          col("p_name").as("name_a"))
      idx.select(col("i"), col("p_name").as("name_b"))
        .join(shifted, Seq("i"))
        .withColumn("jw", round(graft.expressions.TextExpressions
          .jaroWinkler(col("name_a"), col("name_b")), 6))
        .filter(col("jw") >= lit(0.88))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("jw").desc, col("name_a"), col("name_b")))
          .cast("long"))
        .filter(col("rank") <= 15)
        .select(col("name_a"), col("name_b"), col("jw"), col("rank"))
        .orderBy(col("rank"))
    }),

    "q182_weekday_chi2" -> ((s, dir) => {
      // order-volume seasonality: weekday profile + chi-square uniformity
      // terms. The weekday index is PORTABLE day-count arithmetic from a
      // known Monday epoch (engine dayofweek() conventions differ); all
      // floats derive from integer counts.
      val dow = t(s, dir, "orders")
        .select((datediff(col("o_orderdate"), lit("1990-01-01"))
          .cast("long") % 7).as("dow_idx"))
        .groupBy(col("dow_idx"))
        .agg(count(lit(1)).as("n_orders"))
      val tot = dow.agg(sum(col("n_orders")).cast("double").as("n"))
      dow.crossJoin(broadcast(tot))
        .select(col("dow_idx"), col("n_orders"),
          round(col("n") / 7.0, 2).as("expected"),
          round(pow(col("n_orders").cast("double") - col("n") / 7.0, 2.0) /
            (col("n") / 7.0), 4).as("chi2_term"))
        .orderBy(col("dow_idx"))
    }),

    "q183_fk_integrity" -> ((s, dir) => {
      // referential-integrity audit over the warehouse FK graph: orphan
      // counts via anti-joins (each one a shuffle or broadcast join on
      // the FK key — the anti side never materializes the match). Small
      // dimension parents (nation) broadcast; fact-to-fact edges shuffle
      // on the key as they must.
      def edge(name: String, child: DataFrame, key: String,
               parent: DataFrame, pkey: String, bcast: Boolean) = {
        val p0 = parent.select(col(pkey)).distinct()
        val pp = if (bcast) broadcast(p0) else p0
        val orphans = child.select(col(key))
          .join(pp, col(key) === col(pkey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(orphans)
          .select(lit(name).as("fk_edge"), col("n_child"),
            col("n_orphans"))
      }
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val p = t(s, dir, "part"); val n = t(s, dir, "nation")
      edge("customer.nation", c, "c_nationkey", n, "n_nationkey", bcast = true)
        .unionByName(edge("lineitem.orders", li, "l_orderkey", o,
          "o_orderkey", bcast = false))
        .unionByName(edge("lineitem.part", li, "l_partkey", p,
          "p_partkey", bcast = false))
        .unionByName(edge("lineitem.supplier", li, "l_suppkey", su,
          "s_suppkey", bcast = false))
        .unionByName(edge("orders.customer", o, "o_custkey", c,
          "c_custkey", bcast = false))
        .unionByName(edge("supplier.nation", su, "s_nationkey", n,
          "n_nationkey", bcast = true))
        .orderBy(col("fk_edge"))
    }),

    "q184_burst_days" -> ((s, dir) => {
      // burst detection: days whose event count spikes vs the TRAILING
      // 28-day window (current day excluded — no self-inflation). The
      // rolling stats run over the calendar-bounded daily table (the
      // heavy reduction already happened in the hash aggregate), and
      // mean/σ derive from integer count sums, so both engines see
      // identical doubles. Top-10 by rounded z with day tiebreak.
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("day")).rowsBetween(-28, -1)
      daily
        .withColumn("n_win", count(col("c")).over(w))
        .withColumn("s1", sum(col("c")).over(w))
        .withColumn("s2", sum(col("c") * col("c")).over(w))
        .filter(col("n_win") >= 14)
        .withColumn("mu", col("s1").cast("double") / col("n_win"))
        .withColumn("var",
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("n_win")) /
            col("n_win"))
        .filter(col("var") > 0)
        .withColumn("z", round((col("c").cast("double") - col("mu")) /
          sqrt(col("var")), 4))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("z").desc, col("day"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("c").as("n_events"), round(col("mu"), 4).as("mu_28"),
          col("z"), col("rank"))
        .orderBy(col("rank"))
    }),

    "q185_sentence_stats" -> ((s, dir) => {
      // per-language sentence profile: [.!?]+ segmentation, whitespace
      // word counts, averaged per doc then per language. Fragment
      // filtering (trim non-empty) is explicit on BOTH engines because
      // split() edge semantics around trailing separators differ.
      val frags = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), "[.!?]+")).as("frag"))
        .withColumn("frag", trim(col("frag")))
        .filter(length(col("frag")) > 0)
        .withColumn("n_words", size(split(col("frag"), "\\s+")).cast("long"))
      val perDoc = frags.groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_sent"), sum(col("n_words")).as("n_words"))
      perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("n_sent")).cast("double") / count(lit(1)), 4)
            .as("avg_sentences"),
          round(sum(col("n_words")).cast("double") / sum(col("n_sent")), 4)
            .as("words_per_sentence"))
        .orderBy(col("lang"))
    }),

    "q186_yoy_growth" -> ((s, dir) => {
      // year-over-year revenue growth: yearly totals in exact integer
      // cents, growth = self-join on year−1 (a tiny broadcast — years
      // are calendar-bounded) — the float appears only in the final
      // ratio, from identical longs on both engines.
      val yearly = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"),
          count(lit(1)).as("n_orders"))
      yearly.join(broadcast(yearly.select((col("yr") + 1).as("yr"),
          col("cents").as("prev_cents"))), Seq("yr"), "left")
        .select(col("yr"), col("n_orders"),
          round(col("cents").cast("double") / 100.0, 2).as("revenue"),
          round((col("cents") - col("prev_cents")).cast("double") /
            col("prev_cents").cast("double") * 100.0, 4).as("yoy_pct"))
        .orderBy(col("yr"))
    }),

    "q187_stickiness" -> ((s, dir) => {
      // DAU/MAU stickiness per month: two exact distinct-count
      // reductions (day-level and month-level) joined on the month —
      // counts stay integers until the final ratios.
      val ev = events(s, dir)
        .select(date_format(col("ts"), "yyyy-MM").as("month"),
          to_date(col("ts")).as("day"), col("user_id"))
      val dau = ev.select(col("month"), col("day"), col("user_id"))
        .distinct()
        .groupBy(col("month"), col("day"))
        .agg(count(lit(1)).as("dau"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("dau_sum"))
      val mau = ev.select(col("month"), col("user_id")).distinct()
        .groupBy(col("month")).agg(count(lit(1)).as("mau"))
      dau.join(mau, Seq("month"))
        .select(col("month"), col("n_days"), col("mau"),
          round(col("dau_sum").cast("double") / col("n_days"), 4)
            .as("avg_dau"),
          round(col("dau_sum").cast("double") / col("n_days") /
            col("mau"), 4).as("stickiness"))
        .orderBy(col("month"))
    }),

    "q188_weighted_quantiles" -> ((s, dir) => {
      // quantity-weighted price quantiles: values collapse to the
      // distinct-cents table first (hash agg), cumulative weights via the
      // two-phase prefix sum, and each quantile is the min value whose
      // cumulative weight clears an INTEGER ceil threshold — no float
      // compare in the cut decision, portable at any scale.
      import s.implicits._
      val pts = t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") * 100 + 0.5).as("cents"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("cents")).agg(sum(col("w")).as("cw"))
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        pts.withColumn("__g", lit(1)), "__g", "cents", col("cw"), "cum_w")
      val tot = pts.agg(sum(col("cw")).as("tw"))
      val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
        .toDF("q_label", "num", "den")
      val thr = broadcast(qs.crossJoin(tot)
        .select(col("q_label"),
          expr("(tw * num + den - 1) div den").as("thr")))
      cum.crossJoin(thr)
        .filter(col("cum_w") >= col("thr"))
        .groupBy(col("q_label"))
        .agg(round(min(col("cents")).cast("double") / 100.0, 2)
          .as("weighted_price"))
        .orderBy(col("q_label"))
    }),

    "q189_zipf_slope" -> ((s, dir) => {
      // Zipf exponent of the corpus token distribution: frequency ranks
      // from the two-phase global rank over the token-count table, slope
      // of ln(freq) vs ln(rank) on the top 1000 by closed-form least
      // squares (ONE aggregate) — a one-row corpus-health gauge next to
      // the drift (q173) and entropy (q165) signals.
      val tok = t(s, dir, "documents")
        .select(explode(TF.normTokens(col("text"))).as("tokn"))
        .groupBy(col("tokn")).agg(count(lit(1)).as("freq"))
      val ranked = graft.ops.PrefixSum.globalRank(tok,
          Seq(-col("freq"), col("tokn")), "rank")
        .filter(col("rank") <= 1000)
        .select(log(col("rank").cast("double")).as("x"),
          log(col("freq").cast("double")).as("y"))
      ranked.agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n").cast("long").as("n_tokens"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("zipf_slope"),
          round((col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
             (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"),
            6).as("intercept"))
    }),

    "q190_ngram_novelty" -> ((s, dir) => {
      // train/test 5-gram novelty — the generalization/memorization gauge:
      // what fraction of the held-out half's distinct 5-grams never occur
      // in the training half. Engine side ships ONLY 8-byte gram hashes
      // (shuffle rows are (flag, hash)); the oracle rebuilds the same sets
      // from the STRING grams — a cross-representation check.
      val side = t(s, dir, "documents")
        .select((col("doc_id") % 2 === 0).as("is_train"),
          explode(graft.expressions.TextExpressions.ngramHashes(TF.normTokens(col("text")), 5)).as("g"))
        .distinct()
      side.groupBy(col("g"))
        .agg(max(when(col("is_train"), 1L).otherwise(0L)).as("in_train"),
          max(when(!col("is_train"), 1L).otherwise(0L)).as("in_test"))
        .agg(sum(col("in_train")).as("n_train_grams"),
          sum(col("in_test")).as("n_test_grams"),
          sum(when(col("in_test") === 1 && col("in_train") === 0, 1L)
            .otherwise(0L)).as("n_novel"))
        .select(col("n_train_grams"), col("n_test_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_test_grams"), 6)
            .as("novelty_rate"))
    }),

    "q191_template_coverage" -> ((s, dir) => {
      // boilerplate/template detection: 5-grams shared by >=3 documents
      // are "template" grams; a document's coverage is the share of its
      // DISTINCT grams that are template. Only (doc_id, hash) rows
      // shuffle; the df threshold is absolute (planted near-dup families
      // hold it across scale factors, max df is fixture-bounded).
      val grams = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.expressions.TextExpressions.ngramHashes(TF.normTokens(col("text")), 5)).as("g"))
        .distinct()
      val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val cov = grams.join(df, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_boiler"))
        .withColumn("coverage",
          col("n_boiler").cast("double") / col("n_grams"))
      cov.agg(count(lit(1)).as("n_docs"),
          sum(when(col("coverage") >= 0.5, 1L).otherwise(0L))
            .as("n_flagged"),
          round(sum(col("coverage")) / count(lit(1)), 6)
            .as("avg_coverage"),
          sum(col("n_boiler")).as("n_boiler_hits"))
        .select(col("n_docs"), col("n_flagged"), col("n_boiler_hits"),
          col("avg_coverage"))
    }),

    "q192_price_elasticity" -> ((s, dir) => {
      // per-brand demand elasticity: closed-form least squares of
      // ln(quantity) on ln(unit price) — the grouped log-log variant of
      // the q166 trend machinery, ONE aggregate pass after the part join
      // (broadcast: parts are dimension-sized).
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity").cast("double").as("q"),
          (col("l_extendedprice") / col("l_quantity")).as("up"))
        .filter(col("q") > 0 && col("up") > 0)
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), log(col("q")).as("y"),
          log(col("up")).as("x"))
      li.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("p_brand"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("elasticity"))
        .orderBy(col("p_brand"))
    }),

    "q193_hhi_concentration" -> ((s, dir) => {
      // market-concentration audit: Herfindahl index of supplier revenue
      // share within each nation. Shares come from exact integer cents
      // (two hash aggregates), so HHI is identical doubles on both
      // engines; the nation dim broadcasts.
      val bySupp = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)).as("cents"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
      val byNation = bySupp.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("cents")).as("tot"))
      bySupp.join(broadcast(byNation), Seq("s_nationkey"))
        .groupBy(col("s_nationkey"), col("n_suppliers"))
        .agg(round(sum(pow(col("cents").cast("double") /
          col("tot").cast("double"), 2.0)), 6).as("hhi"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n_suppliers"), col("hhi"))
        .orderBy(col("n_name"))
    }),

    "q194_interpurchase" -> ((s, dir) => {
      // inter-purchase interval profile: per-customer consecutive-order
      // gaps via a PARTITIONED lag window (key-bounded tasks), then exact
      // global percentiles of the integer gap-days — the single counts
      // buffer percentile, interpolation semantics shared by both
      // engines (q44 precedent).
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"))
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(datediff(col("o_orderdate"), col("prev")).cast("long")
          .as("gap"))
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap, array(0.25D, 0.5D, 0.75D))").as("ps"))
        .select(col("n_gaps"),
          round(element_at(col("ps"), 1), 4).as("p25"),
          round(element_at(col("ps"), 2), 4).as("p50"),
          round(element_at(col("ps"), 3), 4).as("p75"))
    }),

    "q195_cohort_ltv" -> ((s, dir) => {
      // cohort lifetime value: customers grouped by first-order year,
      // revenue in exact integer cents; two reductions, no windows.
      val firstYr = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(year(min(col("o_orderdate"))).cast("long").as("cohort"),
          sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"))
      firstYr.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("cents")).cast("double") / 100.0, 2)
            .as("revenue"),
          round(sum(col("cents")).cast("double") / 100.0 /
            count(lit(1)), 2).as("ltv_per_customer"))
        .orderBy(col("cohort"))
    }),

    "q196_ship_lag" -> ((s, dir) => {
      // fulfillment latency: order→ship lag in days per order priority —
      // the fact-fact key join shuffles once on the order key, then the
      // integer gap-days reduce per priority (count/avg/max + exact
      // median via the shared-buffer percentile).
      val lag0 = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lag_days"))
      lag0.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("lag_days")).cast("double") / count(lit(1)), 4)
            .as("avg_lag"),
          expr("percentile(lag_days, 0.5D)").as("med0"),
          max(col("lag_days")).as("max_lag"))
        .select(col("o_orderpriority"), col("n_lines"), col("avg_lag"),
          round(col("med0"), 4).as("median_lag"), col("max_lag"))
        .orderBy(col("o_orderpriority"))
    }),

    "q197_abc_analysis" -> ((s, dir) => {
      // ABC inventory classification: parts ranked by revenue, class cut
      // at 80% / 95% of CUMULATIVE revenue share — prefix sums in exact
      // integer cents with the class decision as an integer
      // cross-multiply (cum·100 vs threshold·total), no float compares.
      val byPart = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)).as("cents"))
      val ranked = graft.ops.PrefixSum.globalRank(byPart,
        Seq(-col("cents"), col("l_partkey")), "r")
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        ranked.withColumn("__g", lit(1)), "__g", "r", col("cents"),
        "cum_cents")
      val tot = byPart.agg(sum(col("cents")).as("tot"))
      cum.crossJoin(broadcast(tot))
        .withColumn("abc_class",
          when(col("cum_cents").cast("decimal(25,0)") * 100 <=
              col("tot").cast("decimal(25,0)") * 80, "A")
            .when(col("cum_cents").cast("decimal(25,0)") * 100 <=
              col("tot").cast("decimal(25,0)") * 95, "B")
            .otherwise("C"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"),
          round(sum(col("cents")).cast("double") / 100.0, 2)
            .as("revenue"))
        .orderBy(col("abc_class"))
    }),

    "q198_return_rate" -> ((s, dir) => {
      // per-brand return rate with a Wilson 95% interval — the
      // skew-robust CI for proportions; everything derives from two
      // integer counts per brand, so both engines compute identical
      // doubles. Broadcast dim join, one reduction.
      val z = 1.96
      val base = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("x"))
      val p = col("x").cast("double") / col("n")
      val nD = col("n").cast("double")
      val denom = lit(1.0) + lit(z * z) / nD
      val center = p + lit(z * z) / (nD * 2)
      val spread = sqrt(p * (lit(1.0) - p) / nD +
        lit(z * z) / (nD * nD * 4)) * lit(z)
      base.select(col("p_brand"), col("n"), col("x"),
          round(p, 6).as("rate"),
          round((center - spread) / denom, 6).as("wilson_lo"),
          round((center + spread) / denom, 6).as("wilson_hi"))
        .orderBy(col("p_brand"))
    }),

    "q199_dup_families" -> ((s, dir) => {
      // exact-duplicate family-size histogram: family = identical text,
      // histogram = families per size — the SHAPE of duplication, not
      // just the rate (q50 reports the rate). Two hash aggregates; at
      // scale the first keys on the 8-byte fingerprint (q19 machinery)
      // instead of the full text — the string key here keeps the oracle
      // byte-exact.
      t(s, dir, "documents")
        .groupBy(col("text")).agg(count(lit(1)).as("family_size"))
        .groupBy(col("family_size"))
        .agg(count(lit(1)).as("n_families"))
        .select(col("family_size"), col("n_families"),
          (col("family_size") * col("n_families")).as("n_docs"))
        .orderBy(col("family_size"))
    }),

    "q200_filter_funnel" -> ((s, dir) => {
      // the training-data cleaning funnel: cumulative survivors after
      // each gate (length band → language → quality → exact dedup) in
      // ONE aggregate pass over the scored corpus — conditional sums
      // plus a distinct-on-survivors count, then stack() to rows. The
      // per-rule drop report is the pipeline-ops view of q50's composed
      // gate.
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TF.tokenCount(col("text")).cast("long"))
        .withColumn("lang_pred", TF.langIdHeuristic(col("text")))
        .withColumn("quality", TF.qualityScore(col("text")))
      val c1 = col("n_tokens").between(10, 10000)
      val c2 = c1 && col("lang_pred") === "en"
      val c3 = c2 && col("quality") >= 0.5
      docs.agg(count(lit(1)).as("n0"),
          sum(when(c1, 1L).otherwise(0L)).as("s1"),
          sum(when(c2, 1L).otherwise(0L)).as("s2"),
          sum(when(c3, 1L).otherwise(0L)).as("s3"),
          countDistinct(when(c3, col("text"))).as("s4"))
        .select(expr(
          """stack(5,
            |  0L, 'all', n0, 0L,
            |  1L, 'length_band', s1, n0 - s1,
            |  2L, 'lang_en', s2, s1 - s2,
            |  3L, 'quality', s3, s2 - s3,
            |  4L, 'exact_dedup', s4, s3 - s4)
            |  AS (stage, rule, n_surviving, n_dropped)""".stripMargin))
        .orderBy(col("stage"))
    }),

    "q201_rep_aware_sample" -> ((s, dir) => {
      // repetition-aware downsampling: each exact-duplicate family keeps
      // ceil(sqrt(size)) members — the soft-dedup recipe between "keep
      // everything" and q19's "keep one", damping over-represented
      // boilerplate while preserving that it WAS repeated. Survivors are
      // chosen by the portable keyHash draw, so the same docs survive on
      // any engine or cluster layout. The testdata corpus is all-distinct,
      // so duplicate families are planted deterministically (keyHash-selected
      // docs copied under shifted ids: sizes 1, 3 and 6); one window shuffle
      // keyed on the family — the 8-byte fingerprint at scale, the string
      // key here keeps the oracle byte-exact.
      val d  = t(s, dir, "documents").select(col("doc_id"), col("text"), col("n_chars"))
      val h  = pmod(graft.ops.Sampling.keyHash(col("doc_id")), lit(10L))
      def cp(off: Long, cap: Long) = d.filter(h < cap)
        .select((col("doc_id") + off).as("doc_id"), col("text"), col("n_chars"))
      val corpus = d.union(cp(300000L, 4L)).union(cp(400000L, 4L))
        .union(cp(500000L, 2L)).union(cp(600000L, 2L)).union(cp(700000L, 2L))
      val w  = Window.partitionBy(col("text"))
      val wr = w.orderBy(graft.ops.Sampling.keyHash(col("doc_id")), col("doc_id"))
      corpus
        .withColumn("fs", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(wr).cast("long"))
        .withColumn("keep",
          col("rn") <= ceil(sqrt(col("fs").cast("double"))).cast("long"))
        .groupBy(col("text"), col("fs"))
        .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
          sum(when(col("keep"), col("n_chars"))).as("ck"),
          sum(col("n_chars")).as("ca"))
        .groupBy(col("fs").as("family_size"))
        .agg(count(lit(1)).as("n_families"),
          sum(col("fs")).as("n_docs"),
          sum(col("kept")).as("kept_docs"),
          sum(col("ck")).as("chars_kept"),
          sum(col("ca")).as("chars_total"))
        .orderBy(col("family_size"))
    }),

    "q202_woe_iv" -> ((s, dir) => {
      // weight-of-evidence / information-value feature screening against
      // the return-flag label — the classic scorecard gauge of which
      // features separate returned from kept lines. One stacked pass,
      // one (feature, bin) shuffle of counts only; per-feature totals and
      // the IV sum ride a window over the bounded post-aggregate bin table
      // (<= ~30 rows regardless of input scale). Smoothing +0.5 per bin
      // keeps ln finite on empty cells; woe/iv rounded at 6 dp (cross-
      // engine ln parity holds there on these integer-derived shares).
      val binned = t(s, dir, "lineitem").select(
        (col("l_returnflag") === "R").as("bad"),
        expr("""stack(4,
          |  'quantity_band', concat('q', cast(floor((l_quantity - 1) / 10.0) as string)),
          |  'discount_pct',  concat('d', cast(floor(l_discount * 100 + 0.5) as string)),
          |  'tax_pct',       concat('t', cast(floor(l_tax * 100 + 0.5) as string)),
          |  'price_band',    concat('p', cast(least(floor(l_extendedprice / 20000.0), 4L) as string)))
          |  AS (feature, bin)""".stripMargin))
      val w = Window.partitionBy(col("feature"))
      binned.groupBy(col("feature"), col("bin"))
        .agg(sum(when(!col("bad"), 1L).otherwise(0L)).as("n_good"),
          sum(when(col("bad"), 1L).otherwise(0L)).as("n_bad"))
        .withColumn("gs", (col("n_good") + lit(0.5)) / sum(col("n_good")).over(w))
        .withColumn("bs", (col("n_bad") + lit(0.5)) / sum(col("n_bad")).over(w))
        .withColumn("woe_raw", log(col("gs") / col("bs")))
        .withColumn("iv",
          round(sum((col("gs") - col("bs")) * col("woe_raw")).over(w), 6))
        .select(col("feature"), col("bin"), col("n_good"), col("n_bad"),
          round(col("woe_raw"), 6).as("woe"), col("iv"))
        .orderBy(col("feature"), col("bin"))
    }),

    "q203_attribution" -> ((s, dir) => {
      // multi-touch marketing attribution: every purchase credits the
      // non-purchase events ("touches") of the same user in the 7 days up
      // to it — first-touch and last-touch as whole conversions, linear as
      // 1/n split across the path. The conversion-touch pair join is an
      // equi-join on user_id with a range predicate (per-user pair count is
      // bounded by activity, not corpus size); path positions come from
      // windows keyed on the conversion id. Time arithmetic in exact
      // microseconds on both engines.
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("cid"), col("user_id").as("cu"),
          col("us").as("cus"))
      val touch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("tu"), col("event_id").as("tid"),
          col("event_type").as("channel"), col("us").as("tus"))
      val w = Window.partitionBy(col("cid"))
      conv.join(touch, col("cu") === col("tu") &&
          col("tus") <= col("cus") &&
          col("tus") > col("cus") - lit(604800000000L))
        .withColumn("rna", row_number().over(w.orderBy(col("tus"), col("tid"))))
        .withColumn("rnd", row_number().over(
          w.orderBy(col("tus").desc, col("tid").desc)))
        .withColumn("nt", count(lit(1)).over(w))
        .groupBy(col("channel"))
        .agg(sum(when(col("rna") === 1, 1L).otherwise(0L)).as("first_touch"),
          sum(when(col("rnd") === 1, 1L).otherwise(0L)).as("last_touch"),
          round(sum(lit(1.0) / col("nt")), 4).as("linear_credit"),
          count(lit(1)).as("n_touches"))
        .orderBy(col("channel"))
    }),

    "q204_kcore" -> ((s, dir) => {
      // 2-core peeling trajectory of the item-transition graph (q134's
      // edge construction, symmetrized): how much of the graph is load-
      // bearing structure vs fringe chains — the degeneracy audit dense-
      // subgraph miners start from. Six fixed peel rounds, each one degree
      // aggregate + two semi-joins on 8-byte ids, checkpoint-truncated;
      // the oracle replays the rounds unrolled as plain SQL.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      val edges = ev.withColumn("src", lag(col("item"), 1).over(byUser))
        .filter(col("src").isNotNull && col("item").isNotNull &&
          col("src") =!= col("item"))
        .select(col("src"), col("item").as("dst"))
      graft.ops.Graph.kCorePeel(edges, k = 2, nRounds = 6)
        .withColumn("converged", col("converged").cast("long"))
    }),

    "q205_bfs_hops" -> ((s, dir) => {
      // BFS hop-distance histogram from the smallest item over the same
      // undirected item graph — 8 rounds of integer min-plus relaxation
      // (Bellman-Ford with unit weights): how tightly the item space is
      // connected, and the reachable-radius profile. State is |V| 16-byte
      // rows, one state-edge join per round.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
      val edges = ev.withColumn("src", lag(col("item"), 1).over(byUser))
        .filter(col("src").isNotNull && col("item").isNotNull &&
          col("src") =!= col("item"))
        .select(col("src"), col("item").as("dst"))
      graft.ops.Graph.bfsDistances(edges, nRounds = 8)
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("dist"))
    }),

    "q206_peak_concurrency" -> ((s, dir) => {
      // sweep-line peak concurrency: each event opens a 60-second activity
      // interval; per day, the maximum number of simultaneously open
      // intervals. Interval ends sort before starts at the same instant
      // (half-open semantics) via the key encoding t*2+{0 end,1 start};
      // the global running sum is the two-phase PrefixSum — NO single-
      // partition window anywhere, every task bounded by the range-
      // partition size. The classic ops capacity gauge.
      val ev = events(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      val sweep = ev.select((col("us") * 2 + 1).as("key"), lit(1L).as("delta"))
        .unionByName(ev.select(((col("us") + 60000000L) * 2).as("key"),
          lit(-1L).as("delta")))
      val perKey = sweep.groupBy(col("key"))
        .agg(sum(col("delta")).as("d"),
          sum(when(col("delta") > 0, 1L).otherwise(0L)).as("starts"))
        .withColumn("g", lit(1))
      PrefixSum.groupedRunningSum(perKey, "g", "key", col("d"), "run")
        .withColumn("day",
          date_format(timestamp_micros(expr("key div 2")), "yyyy-MM-dd"))
        .groupBy(col("day"))
        .agg(max(col("run")).as("peak"), sum(col("starts")).as("n_starts"))
        .orderBy(col("day"))
    }),

    "q207_ewma_forecast" -> ((s, dir) => {
      // exponential-smoothing forecast backtest: per event type, predict
      // each day's total value from the previous 20 calendar days with
      // truncated-EWMA weights (1-a)^age (a=0.3, weights renormalized over
      // the observed window) and score MAE against the naive carry-forward
      // of the last observed day. The window join is bounded (<= 20 prior
      // rows per scored day) and keyed on (type, day) — per-key state never
      // grows with corpus size. The standard "is my smoother better than
      // persistence" capacity-planning gauge.
      val daily = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("event_type"), expr("us div 86400000000").as("day_num"))
        .agg(sum(col("value")).as("v"))
      val byType = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      val scored = daily
        .withColumn("naive", lag(col("v"), 1).over(byType))
        .filter(col("naive").isNotNull)
        .select(col("event_type"), col("day_num").as("d"),
          col("v").as("actual"), col("naive"))
      val prior = daily.select(col("event_type"), col("day_num").as("i"),
        col("v").as("xi"))
      // explode the 20-day lookback into (type, i) equi-join keys: the join
      // is linear (20 rows per scored day), not a per-type day x day cross
      scored.withColumn("i", explode(expr("sequence(d - 20, d - 1)")))
        .join(prior, Seq("event_type", "i"))
        .withColumn("w", pow(lit(0.7), (col("d") - 1 - col("i")).cast("double")))
        .groupBy(col("event_type"), col("d"), col("actual"), col("naive"))
        .agg((sum(col("w") * col("xi")) / sum(col("w"))).as("f"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          round(avg(abs(col("f") - col("actual"))), 4).as("mae_ewma"),
          round(avg(abs(col("naive") - col("actual"))), 4).as("mae_naive"))
        .orderBy(col("event_type"))
    }),

    "q208_golden_record" -> ((s, dir) => {
      // MDM survivorship: the same customer arrives from three source
      // systems with conflicting/missing fields (variants planted
      // deterministically by keyHash — sys2 updates the segment but loses
      // name/balance, sys3 updates name/balance but loses the segment);
      // the golden record takes, per FIELD, the newest non-null value
      // (first_value IGNORE NULLS over sys DESC, full-partition frame)
      // plus per-field provenance. One window shuffle on the entity key;
      // output bounded to a deterministic 1-in-20 key sample.
      val base = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal"))
      val h = pmod(graft.ops.Sampling.keyHash(col("c_custkey")), lit(10L))
      val v1 = base.select(col("c_custkey"), lit(1L).as("sys"),
        col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      val v2 = base.filter(h < 5).select(col("c_custkey"), lit(2L).as("sys"),
        lit(null).cast("string").as("c_name"),
        concat(lit("UPDATED "), col("c_mktsegment")).as("c_mktsegment"),
        lit(null).cast("double").as("c_acctbal"))
      val v3 = base.filter(h < 2).select(col("c_custkey"), lit(3L).as("sys"),
        concat(lit("MERGED "), col("c_name")).as("c_name"),
        lit(null).cast("string").as("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("sys").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      def newest(c: String) = first(col(c), ignoreNulls = true).over(w)
      def src(c: String) =
        first(when(col(c).isNotNull, col("sys")), ignoreNulls = true).over(w)
      v1.unionByName(v2).unionByName(v3)
        .withColumn("g_name", newest("c_name"))
        .withColumn("g_segment", newest("c_mktsegment"))
        .withColumn("g_acctbal", newest("c_acctbal"))
        .withColumn("name_src", src("c_name"))
        .withColumn("seg_src", src("c_mktsegment"))
        .withColumn("bal_src", src("c_acctbal"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("c_custkey")).orderBy(col("sys").desc)))
        .filter(col("rn") === 1 &&
          pmod(graft.ops.Sampling.keyHash(col("c_custkey")), lit(20L)) === 0)
        .select(col("c_custkey"), col("g_name"), col("g_segment"),
          round(col("g_acctbal"), 2).as("g_acctbal"),
          col("name_src"), col("seg_src"), col("bal_src"))
        .orderBy(col("c_custkey"))
    }),

    "q209_theil_sen" -> ((s, dir) => {
      // robust per-brand revenue trend: Theil-Sen slope (median of all
      // pairwise monthly slopes) next to the OLS slope from the q166
      // closed form — the robust/parametric pair for spike-contaminated
      // series. Monthly cents are EXACT integers, so every pairwise slope
      // is an identical double on any engine and the interpolated median
      // is deterministic; the pair join is per-brand over <= ~84 monthly
      // rows (bounded state, shuffle on the brand key only).
      val monthly = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
            .cast("long").as("m"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val a = monthly.select(col("p_brand"), col("m").as("m1"), col("cents").as("y1"))
      val b = monthly.select(col("p_brand"), col("m").as("m2"), col("cents").as("y2"))
      val ts = a.join(b, Seq("p_brand")).filter(col("m1") < col("m2"))
        .withColumn("slope",
          (col("y2") - col("y1")).cast("double") /
            (col("m2") - col("m1")).cast("double"))
        .groupBy(col("p_brand"))
        .agg(expr("percentile(slope, 0.5)").as("ts_slope"))
      val ols = monthly.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_months"), sum(col("m")).as("sx"),
          sum(col("cents")).as("sy"), sum(col("m") * col("cents")).as("sxy"),
          sum(col("m") * col("m")).as("sxx"))
        .select(col("p_brand"), col("n_months"),
          ((col("n_months") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n_months") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("ols_raw"))
      ts.join(ols, Seq("p_brand"))
        .select(col("p_brand"), col("n_months"),
          round(col("ts_slope"), 4).as("ts_slope"),
          round(col("ols_raw"), 4).as("ols_slope"))
        .orderBy(col("p_brand"))
    }),

    "q210_copurchase" -> ((s, dir) => {
      // market-basket brand affinity: for every brand pair bought in the
      // same order, support (co-orders) and lift vs independence. The
      // self-join is keyed on the ORDER key, so the pair blow-up is bounded
      // by basket size (<= lines per order), never corpus size; everything
      // after the distinct is counts-only. Lift factors are divided as
      // doubles term-by-term (counts < 2^53 stay exact, no long overflow
      // at any scale).
      val baskets = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .distinct()
        .persist()  // 4 downstream uses (pair self-join x2, brand counts, total)
      val nOrders = baskets.agg(
        countDistinct(col("ok")).cast("double").as("n_orders"))
      val brandN = baskets.groupBy(col("b")).agg(count(lit(1)).as("n"))
      val pairs = baskets.as("x")
        .join(baskets.as("y"), col("x.ok") === col("y.ok") &&
          col("x.b") < col("y.b"))
        .groupBy(col("x.b").as("b1"), col("y.b").as("b2"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(brandN.select(col("b").as("b1"), col("n").as("n_a"))), "b1")
        .join(broadcast(brandN.select(col("b").as("b2"), col("n").as("n_b"))), "b2")
        .crossJoin(broadcast(nOrders))
        .select(col("b1"), col("b2"), col("n_ab"),
          round(col("n_ab").cast("double") * col("n_orders") /
            (col("n_a").cast("double") * col("n_b").cast("double")), 4)
            .as("lift"))
        .orderBy(col("n_ab").desc, col("b1"), col("b2"))
        .limit(20)
    }),

    "q211_rev_rec" -> ((s, dir) => {
      // deferred revenue recognition: each order's total (exact cents) is
      // recognized over 3 calendar months starting at the order month —
      // cents div 3 per month, the remainder cents landing one-per-month
      // from the first. A 3-way explode then one counts-only aggregate on
      // the month index; integer arithmetic end-to-end so any engine sums
      // to the identical cent.
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"),
          ((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("m0"))
        .withColumn("i", explode(sequence(lit(0L), lit(2L))))
        .select((col("m0") + col("i")).as("month_idx"),
          (expr("cents div 3") +
            when(col("i") < pmod(col("cents"), lit(3L)), lit(1L))
              .otherwise(lit(0L))).as("amt"))
        .groupBy(col("month_idx"))
        .agg(sum(col("amt")).as("recognized_cents"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("month_idx"))
    }),

    "q265_mde_power" -> ((s, dir) => {
      // experiment-design pre-flight: the minimum detectable effect for
      // the q179-style two-proportion test at the CURRENT segment sizes,
      // at 80% and 90% power (z constants literal) — the number that says
      // whether running the test is worth it. One conditional aggregate.
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(when(col("c_mktsegment") === "BUILDING", 1).otherwise(0)
          .as("arm"),
          when(col("c_acctbal") > 5000.0, 1L).otherwise(0L).as("hit"))
      c.agg(
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n2"),
          sum(col("hit")).as("hits"), count(lit(1)).as("n"))
        .select(col("n1"), col("n2"),
          round(col("hits").cast("double") / col("n").cast("double"), 6)
            .as("pooled_rate"),
          round(lit(1.96 + 0.8416) *
            sqrt((col("hits").cast("double") / col("n").cast("double")) *
              (lit(1.0) - col("hits").cast("double") / col("n").cast("double")) *
              (lit(1.0) / col("n1").cast("double") +
                lit(1.0) / col("n2").cast("double"))), 6).as("mde_80"),
          round(lit(1.96 + 1.2816) *
            sqrt((col("hits").cast("double") / col("n").cast("double")) *
              (lit(1.0) - col("hits").cast("double") / col("n").cast("double")) *
              (lit(1.0) / col("n1").cast("double") +
                lit(1.0) / col("n2").cast("double"))), 6).as("mde_90"))
    }),

    "q266_design_effect" -> ((s, dir) => {
      // clustered-sampling design effect: user-level clustering of event
      // values via one-way ANOVA — ICC from between/within mean squares
      // (unequal cluster sizes use the n0 correction), DEFF = 1+(n0-1)ICC.
      // Two counts-only phases: per-user moments, then one closed-form
      // reduction.
      val u = events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("double").as("ni"), sum(col("value")).as("si"),
          sum(col("value") * col("value")).as("qi"))
      u.agg(sum(col("ni")).as("nn"), count(lit(1)).cast("double").as("k"),
          sum(col("ni") * col("ni")).as("n2"), sum(col("si")).as("s"),
          sum(col("qi")).as("q"),
          sum(col("si") * col("si") / col("ni")).as("sb"))
        .select(col("nn").cast("long").as("n_events"),
          col("k").cast("long").as("n_users"),
          ((col("q") - col("sb")) / (col("nn") - col("k"))).as("msw"),
          ((col("sb") - col("s") * col("s") / col("nn")) / (col("k") - 1))
            .as("msb"),
          ((col("nn") - col("n2") / col("nn")) / (col("k") - 1)).as("n0"))
        .select(col("n_events"), col("n_users"), round(col("n0"), 4).as("n0"),
          round((col("msb") - col("msw")) /
            (col("msb") + (col("n0") - 1) * col("msw")), 6).as("icc"),
          round(lit(1.0) + (col("n0") - 1) *
            ((col("msb") - col("msw")) /
              (col("msb") + (col("n0") - 1) * col("msw"))), 4).as("deff"))
    }),

    "q267_neyman_allocation" -> ((s, dir) => {
      // stratified-sampling design: Neyman allocation of a 100-doc budget
      // across languages proportional to N_l * sd_l (sd from EXACT integer
      // n_chars sums, so both engines derive identical doubles). One
      // per-stratum aggregate + a broadcast normalizer.
      val st = t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
          sum(col("n_chars") * col("n_chars")).as("q"))
        .withColumn("sd", sqrt((col("q") - col("s") * col("s") /
          col("n")).cast("double") / (col("n") - 1).cast("double")))
      val tot = st.agg(sum(col("n").cast("double") * col("sd")).as("z"))
      st.crossJoin(broadcast(tot))
        .select(col("lang"), col("n"), round(col("sd"), 4).as("sd"),
          round(col("n").cast("double") * col("sd") / col("z"), 6)
            .as("neyman_share"),
          expr("CAST(floor(100 * (CAST(n AS DOUBLE) * sd / z) + 0.5) AS BIGINT)")
            .as("alloc_100"))
        .orderBy(col("lang"))
    }),

    "q268_spearman" -> ((s, dir) => {
      // rank-correlation cousin of Kendall q263: Spearman rho between
      // per-supplier revenue and shipped quantity. Both rankings run
      // through the two-phase global ranker on (exact integer measure,
      // suppkey) so the total order — and hence every rank difference —
      // is integer-identical on any engine; rho = 1 - 6*sum(d^2) /
      // (n(n^2-1)) from exact longs, floats only in the final division.
      val per = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(expr("CAST(floor(l_extendedprice * " +
          "(1 - l_discount) * 100 + 0.5) AS BIGINT)")).as("rev_cents"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .persist()  // feeds both rankings
      val rx = graft.ops.PrefixSum.globalRank(per,
          Seq(col("rev_cents").desc, col("l_suppkey")), "rx")
        .select(col("l_suppkey"), col("rx"))
      val ry = graft.ops.PrefixSum.globalRank(
          per.select(col("l_suppkey"), col("qty")),
          Seq(col("qty").desc, col("l_suppkey")), "ry")
        .select(col("l_suppkey").as("sk"), col("ry"))
      rx.join(ry, col("l_suppkey") === col("sk"))
        .agg(count(lit(1)).as("n"),
          sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("d2"))
        .select(col("n"), col("d2").as("sum_d2"),
          round(lit(1.0) - lit(6.0) * col("d2").cast("double") /
            (col("n").cast("double") *
              (col("n").cast("double") * col("n").cast("double") - 1.0)), 6)
            .as("spearman_rho"))
    }),

    "q269_welch_ttest" -> ((s, dir) => {
      // Welch's unequal-variance t-test on account balance between the
      // BUILDING and MACHINERY segments: moments from exact integer cents
      // (sum, sum-of-squares as longs) so both engines derive identical
      // doubles; t-statistic + Welch-Satterthwaite degrees of freedom in
      // one conditional aggregate — the mean-scale companion of the
      // two-proportion z gauge (q179) and the MDE pre-flight (q265).
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(when(col("c_mktsegment") === "BUILDING", 1).otherwise(0)
          .as("arm"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
      c.agg(
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s1"),
          sum(when(col("arm") === 1, col("cents") * col("cents"))
            .otherwise(0L)).as("q1"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s2"),
          sum(when(col("arm") === 0, col("cents") * col("cents"))
            .otherwise(0L)).as("q2"))
        .select(col("n1"), col("n2"),
          (col("s1").cast("double") / col("n1")).as("m1"),
          (col("s2").cast("double") / col("n2")).as("m2"),
          ((col("q1").cast("double") - col("s1").cast("double") *
            col("s1").cast("double") / col("n1")) / (col("n1") - 1))
            .as("v1"),
          ((col("q2").cast("double") - col("s2").cast("double") *
            col("s2").cast("double") / col("n2")) / (col("n2") - 1))
            .as("v2"))
        .select(col("n1"), col("n2"),
          round(col("m1") / 100.0, 4).as("mean_building"),
          round(col("m2") / 100.0, 4).as("mean_machinery"),
          round((col("m1") - col("m2")) /
            sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 6)
            .as("welch_t"),
          round(pow(col("v1") / col("n1") + col("v2") / col("n2"), 2.0) /
            (pow(col("v1") / col("n1"), 2.0) / (col("n1") - 1) +
              pow(col("v2") / col("n2"), 2.0) / (col("n2") - 1)), 2)
            .as("welch_df"))
    }),

    "q270_js_divergence" -> ((s, dir) => {
      // distribution-drift gauge: Jensen-Shannon divergence between the
      // language mix of the even-doc_id and odd-doc_id corpus halves.
      // One joint conditional aggregate per lang (0-count terms contribute
      // 0 by the p*ln(p/m) limit), totals folded back as a 1-row
      // broadcast; exact integer counts -> identical doubles. Bounded by
      // |langs|, symmetric and finite unlike raw KL.
      val per = t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("doc_id") % 2 =!= 0, 1L).otherwise(0L)).as("cb"))
        .persist()  // feeds the totals row and the per-lang terms
      val tot = per.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val terms = per.crossJoin(broadcast(tot))
        .select((col("ca").cast("double") / col("na")).as("p"),
          (col("cb").cast("double") / col("nb")).as("q"))
        .select(col("p"), col("q"),
          ((col("p") + col("q")) / 2.0).as("m"))
        .select(
          when(col("p") > 0.0, col("p") * log(col("p") / col("m")))
            .otherwise(0.0).as("tp"),
          when(col("q") > 0.0, col("q") * log(col("q") / col("m")))
            .otherwise(0.0).as("tq"))
      terms.agg(count(lit(1)).as("n_langs"),
          round((sum(col("tp")) + sum(col("tq"))) / 2.0, 6).as("js_nats"))
        .select(col("n_langs"), col("js_nats"),
          round(col("js_nats") / math.log(2.0), 6).as("js_bits"))
    }),

    "q271_bh_fdr" -> ((s, dir) => {
      // multiple-testing control: per-segment two-proportion z-tests
      // (segment vs rest, hit = acctbal > 5000) -> normal p-values via the
      // Abramowitz-Stegun 7.1.26 erf polynomial (LITERAL constants, so
      // both engines evaluate the identical expression tree) ->
      // Benjamini-Hochberg at alpha = 0.10: reject p_(i) <= i/m * alpha up
      // to the largest satisfying rank. Counts are one conditional
      // aggregate; the BH cutoff folds back as a 1-row broadcast.
      val tot = t(s, dir, "customer")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(when(col("c_acctbal") > 5000.0, 1L).otherwise(0L))
            .cast("double").as("h"))
      val per = t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("double").as("n1"),
          sum(when(col("c_acctbal") > 5000.0, 1L).otherwise(0L))
            .cast("double").as("h1"))
        .crossJoin(broadcast(tot))
        .select(col("c_mktsegment"), col("n1"),
          (col("h") / col("n")).as("pp"),
          ((col("h1") / col("n1") - (col("h") - col("h1")) /
            (col("n") - col("n1"))) /
            sqrt((col("h") / col("n")) * (lit(1.0) - col("h") / col("n")) *
              (lit(1.0) / col("n1") +
                lit(1.0) / (col("n") - col("n1"))))).as("z"))
      // p = 2*(1 - Phi(|z|)) = 1 - erf(|z|/sqrt(2)), and with the A&S
      // 7.1.26 polynomial erf(x) ~= 1 - poly(t)*exp(-x^2) that collapses
      // to p = poly(t)*exp(-x^2) — computed DIRECTLY (not via 1-(1-...),
      // which double-rounds small p) with left-associated products so the
      // oracle's expression tree is bit-identical.
      val x = abs(col("z")) / math.sqrt(2.0)
      val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val withP = per.select(col("c_mktsegment"), col("z"),
          ((lit(0.254829592) * tt - lit(0.284496736) *
            tt * tt + lit(1.421413741) * tt * tt * tt - lit(1.453152027) *
            tt * tt * tt * tt + lit(1.061405429) * tt * tt * tt * tt * tt) *
            exp(-x * x)).as("p"))
      val ranked = graft.ops.PrefixSum.globalRank(withP,
          Seq(col("p"), col("c_mktsegment")), "rk")
        .withColumn("m", lit(5.0))
        .withColumn("bh_crit", col("rk").cast("double") / col("m") * 0.10)
        .persist()  // feeds the cutoff row and the per-test verdicts
      val cutoff = ranked.filter(col("p") <= col("bh_crit"))
        .agg(coalesce(max(col("rk")), lit(0L)).as("k"))
      ranked.crossJoin(broadcast(cutoff))
        .select(col("c_mktsegment"), round(col("z"), 4).as("z"),
          round(col("p"), 6).as("p_two_sided"), col("rk").as("p_rank"),
          round(col("bh_crit"), 4).as("bh_crit"),
          (col("rk") <= col("k")).as("rejected"))
        .orderBy(col("c_mktsegment"))
    }),

    "q272_burstiness" -> ((s, dir) => {
      // traffic-shape gauge: per-event-type burstiness B = (sd - mean) /
      // (sd + mean) of per-user inter-arrival times (B -> -1 periodic,
      // 0 Poisson, +1 bursty). Gaps in EXACT integer minutes (micros div,
      // no overflow under ANSI at any sf) from a per-(user,type) lag
      // window — partitioned by the stream key, never a global sort;
      // moments from exact long sums, floats only in the final statistic.
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"),
          lag(col("ts"), 1).over(w).as("prev_ts"))
        .filter(col("prev_ts").isNotNull)
        .select(col("event_type"),
          expr("(unix_micros(ts) - unix_micros(prev_ts)) div 60000000")
            .as("gap_min"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap_min")).as("sg"),
          sum(col("gap_min") * col("gap_min")).as("qg"))
        .filter(col("n_gaps") > 1)
        .select(col("event_type"), col("n_gaps"),
          (col("sg").cast("double") / col("n_gaps")).as("mu"),
          sqrt((col("qg").cast("double") - col("sg").cast("double") *
            col("sg").cast("double") / col("n_gaps")) /
            (col("n_gaps") - 1)).as("sd"))
        .select(col("event_type"), col("n_gaps"),
          round(col("mu"), 4).as("mean_gap_min"),
          round(col("sd"), 4).as("sd_gap_min"),
          round((col("sd") - col("mu")) / (col("sd") + col("mu")), 6)
            .as("burstiness"))
        .orderBy(col("event_type"))
    }),

    "q273_cramers_v" -> ((s, dir) => {
      // categorical-association audit: Cramér's V between customer nation
      // and market segment. Joint counts partial-aggregate once; margins
      // RE-AGGREGATE the 125-row joint table (no second scan); the full
      // r x c grid (zero cells contribute their expected count) comes from
      // a margin cross join left-joined back to the observed cells — all
      // broadcast-sized. Exact integer counts -> identical doubles.
      val joint = t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("o"))
        .persist()  // margins + observed lookup both read it
      val rm = joint.groupBy(col("c_nationkey"))
        .agg(sum(col("o")).as("rn"))
      val cm = joint.groupBy(col("c_mktsegment"))
        .agg(sum(col("o")).as("cn"))
      val tot = joint.agg(sum(col("o")).cast("double").as("n"),
        countDistinct(col("c_nationkey")).as("r"),
        countDistinct(col("c_mktsegment")).as("c"))
      val grid = rm.crossJoin(cm)
        .join(joint, Seq("c_nationkey", "c_mktsegment"), "left")
        .crossJoin(broadcast(tot))
        .select(col("n"), col("r"), col("c"),
          coalesce(col("o"), lit(0L)).cast("double").as("obs"),
          (col("rn").cast("double") * col("cn").cast("double") / col("n"))
            .as("e"))
      grid.agg(first(col("n")).cast("long").as("n"),
          first(col("r")).as("n_nations"), first(col("c")).as("n_segments"),
          sum((col("obs") - col("e")) * (col("obs") - col("e")) / col("e"))
            .as("chi2"),
          first((col("r") - 1) * (col("c") - 1)).as("dof"))
        .select(col("n"), col("n_nations"), col("n_segments"), col("dof"),
          round(col("chi2"), 4).as("chi2"),
          round(sqrt(col("chi2") / (col("n").cast("double") *
            least(col("n_nations") - 1, col("n_segments") - 1)
              .cast("double"))), 6).as("cramers_v"))
    }),

    "q274_heaps_law" -> ((s, dir) => {
      // vocabulary-growth law: Heaps exponent beta (V ~ K * N^beta) from
      // 10 corpus checkpoints in doc_id order. The token table collapses
      // to per-doc counts and per-token FIRST-occurrence docs (two partial
      // aggs, no re-scan); each checkpoint's (N, V) then comes from a
      // 10-row broadcast grid joined against those bounded count tables —
      // cumulative work without any global running state. ln-ln OLS
      // closed form, integer checkpoint arithmetic ((k*n+9) div 10) so
      // both engines pick identical cut docs. Companion to Zipf q189.
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(TF.normTokens(col("text"))).as("tokn"))
        .persist()  // per-doc counts + first-occurrence both read it
      val nd = t(s, dir, "documents").agg(count(lit(1)).as("nd"))
      val ranked = graft.ops.PrefixSum.globalRank(
        t(s, dir, "documents").select(col("doc_id")),
        Seq(col("doc_id")), "rk")
      val cps = s.range(1, 11).toDF("k")
        .crossJoin(broadcast(nd))
        .select(col("k"), expr("(k * nd + 9) div 10").as("cp_rk"))
        .join(ranked, col("cp_rk") === col("rk"))
        .select(col("k"), col("doc_id").as("cp"))
      val dt = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("tc"))
      val ft = tok.groupBy(col("tokn")).agg(min(col("doc_id")).as("fd"))
      val nk = dt.crossJoin(broadcast(cps))
        .filter(col("doc_id") <= col("cp"))
        .groupBy(col("k")).agg(sum(col("tc")).as("nn"))
      val vk = ft.crossJoin(broadcast(cps))
        .filter(col("fd") <= col("cp"))
        .groupBy(col("k")).agg(count(lit(1)).as("vv"))
      nk.join(broadcast(vk), "k")
        .select(log(col("nn").cast("double")).as("x"),
          log(col("vv").cast("double")).as("y"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n").cast("long").as("n_points"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("heaps_beta"),
          round(exp((col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
             (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n")),
            4).as("heaps_k"))
    }),

    "q275_hurst_exponent" -> ((s, dir) => {
      // long-range-dependence gauge: Hurst exponent of the daily revenue
      // series by the aggregated-variance method — variance of block-mean
      // revenue at block sizes m in {1,2,4,8,16}, slope of ln Var(m) vs
      // ln m = 2H-2. Daily cents collapse to whole units and are CENTERED
      // by the integer global mean (shift leaves variance unchanged)
      // before squaring, so block moments stay exact longs far from
      // overflow; the day-grain series is calendar-bounded (~90 rows), so
      // its index window is fine. Incomplete trailing blocks are dropped.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS " +
          "BIGINT)) div 100 AS BIGINT)").as("units"))
      val st = daily.agg(sum(col("units")).as("tot"),
        count(lit(1)).as("n"))
      val idx = daily
        .withColumn("i", row_number().over(Window.orderBy(col("day")))
          .cast("long"))
        .crossJoin(broadcast(st))
        .select(col("i"), (col("units") - expr("tot div n")).as("c"))
      val blocks = idx
        .select(col("i"), col("c"),
          explode(array(lit(1L), lit(2L), lit(4L), lit(8L), lit(16L)))
            .as("m"))
        .groupBy(col("m"), expr("(i - 1) div m").as("blk"))
        .agg(count(lit(1)).as("cnt"), sum(col("c")).as("bs"))
        .filter(col("cnt") === col("m"))
      blocks.groupBy(col("m"))
        .agg(count(lit(1)).as("kb"), sum(col("bs")).as("ss"),
          sum(col("bs") * col("bs")).as("qq"))
        .select(log(col("m").cast("double")).as("x"),
          log(((col("qq").cast("double") - col("ss").cast("double") *
            col("ss").cast("double") / col("kb")) / (col("kb") - 1)) /
            (col("m").cast("double") * col("m").cast("double"))).as("y"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n").cast("long").as("n_scales"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("var_slope"),
          round(lit(1.0) + ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))) / 2.0, 4)
            .as("hurst_h"))
    }),

    "q276_runs_test" -> ((s, dir) => {
      // Wald-Wolfowitz runs test for randomness of the daily revenue
      // series around its mean: above/below decided by the EXACT integer
      // comparison cents*n > total (no rational mean materialized), runs
      // counted from a lag over the calendar-bounded day series, then the
      // closed-form normal approximation z = (R - mu_R)/sigma_R from the
      // integer (n1, n2) counts — floats only in the final statistic.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS " +
          "BIGINT)) AS BIGINT)").as("cents"))
      val st = daily.agg(sum(col("cents")).as("tot"),
        count(lit(1)).as("n"))
      val signed = daily.crossJoin(broadcast(st))
        .select(col("day"), col("n"),
          when(col("cents") * col("n") > col("tot"), 1L).otherwise(0L)
            .as("above"))
      val runs = signed
        .withColumn("prev",
          lag(col("above"), 1).over(Window.orderBy(col("day"))))
        .agg(first(col("n")).as("n_days"),
          sum(col("above")).as("n1"),
          (first(col("n")) - sum(col("above"))).as("n2"),
          (sum(when(col("prev").isNull ||
            col("prev") =!= col("above"), 1L).otherwise(0L))).as("r"))
      runs
        .select(col("n_days"), col("n1"), col("n2"), col("r").as("runs"),
          (lit(1.0) + lit(2.0) * col("n1") * col("n2") /
            col("n_days").cast("double")).as("mu"),
          (lit(2.0) * col("n1") * col("n2") *
            (lit(2.0) * col("n1") * col("n2") - col("n_days")) /
            (col("n_days").cast("double") * col("n_days") *
              (col("n_days") - 1))).as("s2"))
        .select(col("n_days"), col("n1"), col("n2"), col("runs"),
          round(col("mu"), 4).as("expected_runs"),
          round((col("runs").cast("double") - col("mu")) / sqrt(col("s2")),
            6).as("z"))
    }),

    "q277_dsir_weights" -> ((s, dir) => {
      // DSIR-style data selection (importance resampling over unigram LM
      // features, Xie et al. 2023 — public method): add-1-smoothed unigram
      // models of the target domain (lang='en') and the raw pool over the
      // shared >=5-count vocabulary; every raw-pool doc scored by its
      // length-normalized log-likelihood ratio; per-language keep rates at
      // the w>0 gate. The vocab/LLR table is a df-bounded aggregate and
      // the scoring pass is one token equi-join (AQE broadcasts it at this
      // scale; at 100 TB it degrades gracefully to a shuffle hash join) —
      // no pairwise work anywhere.
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), (col("lang") === "en").as("tgt"),
          explode(TF.normTokens(col("text"))).as("tok"))
      val counts = toks.groupBy(col("tok"))
        .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
          sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr"))
        .filter(col("ct") + col("cr") >= 5)
      val sums = counts.agg(count(lit(1)).as("v"), sum(col("ct")).as("nt"),
        sum(col("cr")).as("nr"))
      val llr = counts.crossJoin(broadcast(sums))
        .select(col("tok"),
          (log((col("ct") + 1).cast("double") / (col("nt") + col("v"))) -
            log((col("cr") + 1).cast("double") / (col("nr") + col("v"))))
            .as("llr"))
      val scored = toks.filter(!col("tgt"))
        .groupBy(col("doc_id"), col("lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .join(llr, Seq("tok"))
        .groupBy(col("doc_id"), col("lang"))
        .agg((sum(col("c") * col("llr")) / sum(col("c"))).as("w"))
      scored.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_keep"),
          round(avg(col("w")), 6).as("avg_w"))
        .orderBy(col("lang"))
    }),

    "q278_mann_whitney" -> ((s, dir) => {
      // Mann-Whitney U (Wilcoxon rank-sum) comparing BUILDING vs
      // MACHINERY order values — the distribution-free two-sample test.
      // Exact tied-rank machinery in integers: group by exact cents,
      // cumulative counts via the two-phase prefix sum (no global
      // window), average ranks carried as 2x-scaled BIGINTs; floats only
      // in the final tie-corrected normal approximation. Also reports the
      // rank-biserial AUC effect size (U / (n_a * n_b)).
      val pool = t(s, dir, "orders")
        .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))
            .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
          col("o_custkey") === col("c_custkey"))
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"),
          (col("c_mktsegment") === "BUILDING").as("is_a"))
      val byVal = pool.groupBy(col("cents"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"),
          count(lit(1)).as("cnt"))
      val cum = PrefixSum.groupedRunningSum(
        byVal.withColumn("g", lit(1)), "g", "cents", col("cnt"), "run")
      cum.agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
          sum(col("na") *
            (lit(2) * (col("run") - col("cnt")) + col("cnt") + 1)).as("rs2"),
          sum(col("cnt") * col("cnt") * col("cnt") - col("cnt"))
            .as("tie_term"))
        .select(col("n_a"), col("n_b"),
          (col("rs2") - col("n_a") * (col("n_a") + 1)).as("u2"),
          col("tie_term"))
        .select(col("n_a"), col("n_b"), col("u2"), col("tie_term"),
          round(col("u2") / lit(2.0) / (col("n_a") * col("n_b")), 6)
            .as("auc"),
          round((col("u2") / lit(2.0) -
              col("n_a") * col("n_b") / lit(2.0)) /
            sqrt(col("n_a") * col("n_b") / lit(12.0) *
              ((col("n_a") + col("n_b") + 1) - col("tie_term") /
                ((col("n_a") + col("n_b")).cast("double") *
                  (col("n_a") + col("n_b") - 1)))), 6).as("z"))
    }),

    "q279_periodogram" -> ((s, dir) => {
      // Discrete-Fourier periodogram of the daily order-count series —
      // the spectral seasonality detector (annual harmonic near k=7 for
      // this ~6.6-year calendar). Residuals are exact integers scaled by
      // D (y_t = D*n_t - total); the day x frequency expansion is
      // calendar-bounded (D<=2400 rows regardless of SF — the only
      // data-sized pass is the daily aggregate); powers are rounded
      // BEFORE the top-5 ranking so float trig can't reorder near-ties
      // across engines. Day index comes from the two-phase global ranker.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      val idx = PrefixSum.globalRank(daily, Seq(col("day")), "tpos")
      val st = idx.agg(count(lit(1)).as("d"), sum(col("n")).as("tot"))
      val ks = s.range(1, 367).select(col("id").as("k"))
      val terms = idx.crossJoin(broadcast(st))
        .select(col("tpos"), col("d"),
          (col("n") * col("d") - col("tot")).as("y"))
        .crossJoin(broadcast(ks))
        .select(col("k"), col("d"),
          (col("y").cast("double") / col("d")).as("yc"),
          (lit(2 * math.Pi) * col("k") * col("tpos") / col("d"))
            .as("theta"))
      terms.groupBy(col("k"))
        .agg(first(col("d")).as("d"),
          sum(col("yc") * cos(col("theta"))).as("a"),
          sum(col("yc") * sin(col("theta"))).as("b"))
        .select(col("k"),
          round(col("d").cast("double") / col("k"), 2).as("period_days"),
          round((col("a") * col("a") + col("b") * col("b")) * 2 / col("d"),
            2).as("pwr"))
        .orderBy(col("pwr").desc, col("k")).limit(5)
    }),

    "q280_logrank_test" -> ((s, dir) => {
      // Log-rank test comparing the q177 churn-survival curves of the
      // BUILDING vs MACHINERY segments: per distinct duration, at-risk
      // counts for each group from the same two-phase prefix-sum
      // machinery (chained — one pass for the pooled count, one for the
      // group count), then O-E and the hypergeometric variance summed
      // into the chi-square. Everything is integer ratios until the
      // final statistics; the duration table is calendar-bounded.
      val maxD = t(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
      val cust = t(s, dir, "orders")
        .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))
            .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"), col("c_mktsegment"))
        .agg(min(col("o_orderdate")).as("first"),
          max(col("o_orderdate")).as("last"))
        .crossJoin(broadcast(maxD))
        .select(datediff(col("last"), col("first")).cast("long").as("dur"),
          (datediff(col("mx"), col("last")) > 90).as("event"),
          (col("c_mktsegment") === "BUILDING").as("is_a"))
      val byDur = cust.groupBy(col("dur"))
        .agg(count(lit(1)).as("c_all"),
          sum(when(col("event"), 1L).otherwise(0L)).as("d_all"),
          sum(when(col("is_a"), 1L).otherwise(0L)).as("c_a"),
          sum(when(col("is_a") && col("event"), 1L).otherwise(0L))
            .as("d_a"))
        .withColumn("__g", lit(1))
      val cum = PrefixSum.groupedRunningSum(
        PrefixSum.groupedRunningSum(byDur, "__g", "dur", col("c_all"),
          "cum_all"), "__g", "dur", col("c_a"), "cum_a")
      val tot = byDur.agg(sum(col("c_all")).as("n_total"),
        sum(col("c_a")).as("n_a_total"))
      val risk = cum.crossJoin(broadcast(tot))
        .select(col("dur"), col("d_all"), col("d_a"),
          col("n_a_total"), (col("n_total") - col("n_a_total")).as("n_b_total"),
          (col("n_total") - (col("cum_all") - col("c_all"))).as("n_r"),
          (col("n_a_total") - (col("cum_a") - col("c_a"))).as("n_ra"))
        .filter(col("d_all") > 0 && col("n_r") > 1)
      risk.agg(first(col("n_a_total")).as("n_a"),
          first(col("n_b_total")).as("n_b"),
          sum(col("d_a")).as("observed_a"),
          sum(col("d_all") * col("n_ra") / col("n_r").cast("double"))
            .as("e1"),
          sum(col("d_all") * (col("n_ra") / col("n_r").cast("double")) *
            (lit(1.0) - col("n_ra") / col("n_r").cast("double")) *
            (col("n_r") - col("d_all")) / (col("n_r") - 1)).as("v1"))
        .select(col("n_a"), col("n_b"), col("observed_a"),
          round(col("e1"), 4).as("expected_a"),
          round(pow(col("observed_a") - col("e1"), 2) / col("v1"), 4)
            .as("chi2"),
          round((col("observed_a") - col("e1")) / sqrt(col("v1")), 4)
            .as("z"))
    }),

    "q281_modularity" -> ((s, dir) => {
      // Newman modularity of the co-purchase graph under the brand
      // partition — "do parts of the same brand co-occur in orders more
      // than chance": per-brand Q contribution w_intra/W - (K_c/2W)^2.
      // Edges come from the q210-style basket-bounded self-join (pairs
      // within one order only — never a global cross product); degrees
      // and intra-community weights are one pass over the symmetric
      // endpoint expansion. Brand dimension broadcasts.
      val items = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val brands = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val e0 = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
          Seq("l_orderkey"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("w"))
      val eb = e0
        .join(broadcast(brands.select(col("p_partkey").as("p1"),
          col("p_brand").as("b1"))), Seq("p1"))
        .join(broadcast(brands.select(col("p_partkey").as("p2"),
          col("p_brand").as("b2"))), Seq("p2"))
      val ends = eb.select(col("b1").as("b"), col("b2").as("other"),
          col("w"))
        .unionAll(eb.select(col("b2").as("b"), col("b1").as("other"),
          col("w")))
      val wTot = e0.agg(sum(col("w")).as("w_total"))
      ends.groupBy(col("b"))
        .agg(sum(col("w")).as("k_c"),
          sum(when(col("b") === col("other"), col("w")).otherwise(0L))
            .as("intra2"))
        .crossJoin(broadcast(wTot))
        .select(col("b").as("p_brand"), col("k_c"),
          (col("intra2") / lit(2)).cast("long").as("w_intra"),
          round(col("intra2") / (lit(2.0) * col("w_total")) -
            pow(col("k_c") / (lit(2.0) * col("w_total")), 2), 6)
            .as("q_contrib"))
        .orderBy(col("p_brand"))
    }),

    "q282_abc_xyz" -> ((s, dir) => {
      // ABC-XYZ inventory matrix: parts classed by cumulative revenue
      // share (A<=80%, B<=95%, C) x monthly-demand variability
      // (X: CV<=0.5, Y: CV<=1, Z). Every class decision is EXACT integer
      // arithmetic — revenue cuts as 5*cum<=4*tot / 20*cum<=19*tot over
      // the two-phase rank + prefix sum, CV cuts as 4*(M*SS-S^2)<=S^2
      // with zero months included implicitly (S, SS over observed
      // months, denominator M = corpus months) — so no float can flip a
      // class at any scale.
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          date_trunc("month", col("l_shipdate")).as("mth"),
          expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("qty"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
      val monthly = li.groupBy(col("l_partkey"), col("mth"))
        .agg(sum(col("qty")).as("s_m"), sum(col("cents")).as("c_m"))
      val months = li.agg(countDistinct(col("mth")).as("m"))
      val parts = monthly.groupBy(col("l_partkey"))
        .agg(sum(col("s_m")).as("s"),
          sum(col("s_m") * col("s_m")).as("ss"),
          sum(col("c_m")).as("cents"))
      val ranked = PrefixSum.groupedRunningSum(
        PrefixSum.globalRank(parts,
            Seq(col("cents").desc, col("l_partkey")), "rk")
          .withColumn("__g", lit(1)),
        "__g", "rk", col("cents"), "cum")
      val tot = parts.agg(sum(col("cents")).as("ctot"))
      ranked.crossJoin(broadcast(tot)).crossJoin(broadcast(months))
        .select(
          when(lit(5) * col("cum") <= lit(4) * col("ctot"), "A")
            .when(lit(20) * col("cum") <= lit(19) * col("ctot"), "B")
            .otherwise("C").as("abc"),
          when(lit(4) * (col("m") * col("ss") - col("s") * col("s")) <=
              col("s") * col("s"), "X")
            .when(col("m") * col("ss") - col("s") * col("s") <=
              col("s") * col("s"), "Y")
            .otherwise("Z").as("xyz"),
          col("cents"))
        .groupBy(col("abc"), col("xyz"))
        .agg(count(lit(1)).as("n_parts"), sum(col("cents"))
          .as("revenue_cents"))
        .orderBy(col("abc"), col("xyz"))
    }),

    "q283_newsvendor" -> ((s, dir) => {
      // Newsvendor stocking levels per brand: Q* = the 75% critical
      // fractile (underage 3 : overage 1) of the daily-demand
      // distribution, picked EXACTLY as the smallest q with 4*cum >= 3*n
      // over per-brand cumulative counts (grouped two-phase prefix sum —
      // the group key rides the range partitioner, so a mega-brand can't
      // funnel one task), then the expected daily mismatch cost at Q*
      // from one integer join-back pass. Floats only in the final
      // per-day average.
      val daily = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), to_date(col("l_shipdate")).as("day"))
        .agg(sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("d"))
      val byVal = daily.groupBy(col("p_brand"), col("d"))
        .agg(count(lit(1)).as("cnt"))
      val cum = PrefixSum.groupedRunningSum(byVal, "p_brand", "d",
        col("cnt"), "cum")
      val n = daily.groupBy(col("p_brand")).agg(count(lit(1)).as("n_days"))
      val qstar = cum.join(n, Seq("p_brand"))
        .filter(lit(4) * col("cum") >= lit(3) * col("n_days"))
        .groupBy(col("p_brand")).agg(min(col("d")).as("q_star"))
      byVal.join(qstar, Seq("p_brand"))
        .groupBy(col("p_brand"))
        .agg(first(col("q_star")).as("q_star"),
          sum(col("cnt")).as("n_days"),
          sum(col("cnt") * (lit(3) * greatest(col("d") - col("q_star"),
            lit(0L)) + greatest(col("q_star") - col("d"), lit(0L))))
            .as("cost_total"))
        .select(col("p_brand"), col("n_days"), col("q_star"),
          round(col("cost_total") / col("n_days").cast("double"), 4)
            .as("avg_daily_cost"))
        .orderBy(col("p_brand"))
    }),

    "q284_gumbel_returns" -> ((s, dir) => {
      // Extreme-value sizing: Gumbel fit over monthly maxima of daily
      // revenue (block maxima, method of moments — beta = s*sqrt(6)/pi,
      // mu = xbar - 0.57721...*beta), then the 12- and 60-month return
      // levels mu - beta*ln(-ln(1-1/T)). Maxima are exact integer
      // dollars (cents div 100 so squares can't overflow at any SF);
      // the block table is calendar-bounded, so every float is a fixed
      // expression over exact longs — bit-stable across engines.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS " +
          "BIGINT)) AS BIGINT)").as("cents"))
      val blocks = daily
        .groupBy(date_trunc("month", col("day")).as("mth"))
        .agg(max(expr("cents div 100")).as("mx"))
      blocks.agg(count(lit(1)).as("n"), sum(col("mx")).as("s"),
          sum(col("mx") * col("mx")).as("ss"))
        .select(col("n"),
          (col("s").cast("double") / col("n")).as("xbar"),
          sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double") /
            (col("n").cast("double") * (col("n") - 1))).as("sd"))
        .select(col("n").as("n_blocks"),
          (col("sd") * sqrt(lit(6.0)) / lit(math.Pi)).as("beta"),
          col("xbar"))
        .select(col("n_blocks"),
          (col("xbar") - lit(0.5772156649015329) * col("beta")).as("mu"),
          col("beta"))
        .select(col("n_blocks"), round(col("mu"), 2).as("gumbel_mu"),
          round(col("beta"), 2).as("gumbel_beta"),
          round(col("mu") - col("beta") *
            log(-log(lit(1.0) - lit(1.0) / 12)), 2).as("rl_12mo"),
          round(col("mu") - col("beta") *
            log(-log(lit(1.0) - lit(1.0) / 60)), 2).as("rl_60mo"))
    }),

    "q285_rdd" -> ((s, dir) => {
      // Sharp regression discontinuity at acctbal = 0: local linear fits
      // on each side of the cutoff (bandwidth 1000 dollars), effect =
      // the jump between the two intercepts. Running variable in exact
      // integer cents, outcome = per-customer order count; the per-side
      // OLS closed form runs over exact long sums (magnitudes bounded so
      // nothing overflows), so the division is the only float — one
      // aggregate pass, no iteration.
      val y = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      val side = t(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("x"))
        .filter(col("x") >= -100000 && col("x") < 100000)
        .join(y, col("c_custkey") === col("o_custkey"), "left")
        .select((col("x") >= 0).as("right"), col("x"),
          coalesce(col("cnt"), lit(0L)).as("yv"))
      val fits = side.groupBy(col("right"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("yv")).as("sy"), sum(col("x") * col("yv")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("right"), col("n"),
          ((col("sy").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sxy")) /
            (col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx"))).as("icpt"),
          ((col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
            (col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx"))).as("slope"))
      val l = fits.filter(!col("right"))
        .select(col("n").as("n_left"), col("icpt").as("il"),
          col("slope").as("sl"))
      val r = fits.filter(col("right"))
        .select(col("n").as("n_right"), col("icpt").as("ir"),
          col("slope").as("sr"))
      l.crossJoin(r)
        .select(col("n_left"), col("n_right"),
          round(col("il"), 4).as("intercept_left"),
          round(col("ir"), 4).as("intercept_right"),
          round(lit(1e7) * col("sl"), 4).as("slope_left_e7"),
          round(lit(1e7) * col("sr"), 4).as("slope_right_e7"),
          round(col("ir") - col("il"), 4).as("rd_effect"))
    }),

    "q286_littles_law" -> ((s, dir) => {
      // Little's law consistency gauge over 30-min-gap sessions: exact
      // time-averaged concurrency L (session-microseconds over the span)
      // vs the hourly point-sampled estimate ops dashboards actually
      // compute. The sampler is a sweep-line union (start +1 / end -1 /
      // mark 0 rows, tie priority start<end<mark so a mark counts
      // [start, end) sessions) — one prefix-sum pass, never a
      // sessions x marks join; the mark grid is span-bounded.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val sess = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(byUser).isNull ||
            col("us") - lag(col("us"), 1).over(byUser) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("s0"), max(col("us")).as("s1"))
      val span = sess.agg(min(col("s0")).as("smin"),
        max(col("s1")).as("smax"), count(lit(1)).as("n_sess"),
        sum(col("s1") - col("s0")).as("dur_us"))
      val marks = span.select(explode(sequence(
          expr("(smin + 3599999999L) div 3600000000L"),
          expr("smax div 3600000000L"))).as("h"))
        .select((col("h") * 3600000000L).as("us"), lit(2L).as("pri"),
          lit(0L).as("delta"))
      val deltas = sess
        .select(col("s0").as("us"), lit(0L).as("pri"), lit(1L).as("delta"))
        .unionAll(sess.select(col("s1").as("us"), lit(1L).as("pri"),
          lit(-1L).as("delta")))
      val swept = PrefixSum.groupedRunningSum(
        marks.unionAll(deltas)
          .select((col("us") * 4 + col("pri")).as("k"), col("pri"),
            col("delta"))
          .withColumn("__g", lit(1)),
        "__g", "k", col("delta"), "open")
      val sampled = swept.filter(col("pri") === 2)
        .agg(count(lit(1)).as("n_marks"),
          avg(col("open").cast("double")).as("l_sampled"))
      span.crossJoin(broadcast(sampled))
        .select(col("n_sess").as("n_sessions"),
          round((col("smax") - col("smin")) / lit(3.6e9), 2)
            .as("span_hours"),
          round(col("n_sess") * lit(3.6e9) /
            (col("smax") - col("smin")).cast("double"), 4)
            .as("lambda_per_hr"),
          round(col("dur_us") / (col("n_sess") * lit(6e7)), 4)
            .as("w_minutes"),
          round(col("dur_us") / (col("smax") - col("smin")).cast("double"),
            4).as("l_exact"),
          round(col("l_sampled"), 4).as("l_sampled"))
    }),

    "q287_shapley_attribution" -> ((s, dir) => {
      // Game-theoretic channel attribution: Shapley values of the four
      // non-purchase channels, coalition value v(S) = purchases by users
      // whose touch-set is contained in S. Users collapse to a 4-bit
      // mask (16 cells), so the subset lattice, marginal contributions
      // and 4! permutation weights are all exact integers over a
      // broadcast-sized table — phi is a single rational rounded at the
      // end. One data-sized pass (the per-user mask aggregate).
      val users = events(s, dir)
        .select(col("user_id"),
          when(col("event_type") === "click", 1L)
            .when(col("event_type") === "error", 2L)
            .when(col("event_type") === "signup", 4L)
            .when(col("event_type") === "view", 8L)
            .otherwise(0L).as("chan"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("purch"))
        .groupBy(col("user_id"))
        .agg(expr("bit_or(chan)").as("mask"), max(col("purch")).as("cv"))
      val cells = users.groupBy(col("mask"))
        .agg(count(lit(1)).as("n_users"), sum(col("cv")).as("conv"))
      val subsets = s.range(0, 16).select(col("id").as("smask"))
      val v = subsets.join(broadcast(cells),
          expr("(mask & smask) = mask"), "left")
        .groupBy(col("smask"))
        .agg(coalesce(sum(col("conv")), lit(0L)).as("v"))
      val channels = s.range(0, 4)
        .select(element_at(array(lit("click"), lit("error"), lit("signup"),
          lit("view")), (col("id") + 1).cast("int")).as("channel"),
          when(col("id") === 0, 1L).when(col("id") === 1, 2L)
            .when(col("id") === 2, 4L).otherwise(8L).as("bit"))
      val vs = v.select(col("smask"), col("v").as("v_s"))
      val vsc = v.select(col("smask").as("cmask"), col("v").as("v_sc"))
      channels.crossJoin(broadcast(vs))
        .filter(col("smask").bitwiseAND(col("bit")) === 0)
        .join(broadcast(vsc),
          col("cmask") === col("smask").bitwiseOR(col("bit")))
        .withColumn("wnum",
          when(expr("bit_count(smask)") === 0, 6L)
            .when(expr("bit_count(smask)") === 3, 6L).otherwise(2L))
        .groupBy(col("channel"))
        .agg(round(sum((col("v_sc") - col("v_s")) * col("wnum")) /
          lit(24.0), 6).as("shapley_conversions"))
        .orderBy(col("channel"))
    }),

    "q288_ipf_raking" -> ((s, dir) => {
      // Survey raking (iterative proportional fitting): the positive-
      // balance customer subsample is raked to the FULL population's
      // segment and region margins, three unrolled IPF rounds over the
      // 5x5 cell table (bounded — everything after the two data-sized
      // counting passes is broadcast arithmetic). Scaling order and
      // operand order are fixed (w * margin / total) so the float
      // trajectory is identical on any engine.
      val geo = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_mktsegment").as("seg"), col("r_name").as("reg"),
          col("c_acctbal"))
      // ONE data pass builds the 5x5 cell table (population + sample
      // counts); margins and every IPF scaling total are WINDOW sums
      // over that bounded table — a single linear lineage with 25-row
      // exchanges, no join/broadcast stages per round (the join-per-
      // round formulation spent seconds on stage scheduling alone).
      val popCell = geo.groupBy(col("seg"), col("reg"))
        .agg(count(lit(1)).as("n_pop"),
          sum(when(col("c_acctbal") > 0, 1L).otherwise(0L))
            .as("n_sample"))
      val wSeg = Window.partitionBy(col("seg"))
      val wReg = Window.partitionBy(col("reg"))
      val cells0 = popCell
        .withColumn("p_seg", sum(col("n_pop")).over(wSeg))
        .withColumn("p_reg", sum(col("n_pop")).over(wReg))
        .filter(col("n_sample") > 0)
        .withColumn("w", lit(1.0))
      val raked = (1 to 3).foldLeft(cells0) { (c, _) =>
        c.withColumn("w", col("w") * col("p_seg") /
            sum(col("n_sample") * col("w")).over(wSeg))
          .withColumn("w", col("w") * col("p_reg") /
            sum(col("n_sample") * col("w")).over(wReg))
      }
      raked
        .select(col("seg").as("c_mktsegment"), col("reg").as("r_name"),
          col("n_sample"), col("n_pop"), round(col("w"), 6).as("weight"),
          round(col("n_sample") * col("w"), 2).as("weighted_n"))
        .orderBy(col("c_mktsegment"), col("r_name"))
    }),

    "q289_iv_wald" -> ((s, dir) => {
      // Instrumental-variable Wald estimator, completing the causal
      // gallery (q229 IPW, q230 DiD, q285 RDD): binary instrument
      // z = even nation, treatment x = heavy buyer (>5 orders), outcome
      // y = lifetime spend. beta_IV = ITT_y / first-stage — every group
      // moment is an exact integer sum, the two divisions are the only
      // floats, fixed operand order on both engines. One aggregate pass
      // after the customer-order rollup.
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"),
          sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("cents"))
      val base = t(s, dir, "customer")
        .select(col("c_custkey"), (col("c_nationkey") % 2 === 0).as("z"))
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("z"),
          when(coalesce(col("n_ord"), lit(0L)) > 5, 1L).otherwise(0L)
            .as("x"),
          coalesce(col("cents"), lit(0L)).as("y"))
      val g = base.groupBy(col("z"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"))
      val z1 = g.filter(col("z"))
        .select(col("n").as("n1"), col("sx").as("sx1"), col("sy").as("sy1"))
      val z0 = g.filter(!col("z"))
        .select(col("n").as("n0"), col("sx").as("sx0"), col("sy").as("sy0"))
      z1.crossJoin(z0)
        .select(col("n1").as("n_z1"), col("n0").as("n_z0"),
          round(col("sy1").cast("double") / col("n1") -
            col("sy0").cast("double") / col("n0"), 4).as("itt_y_cents"),
          round(col("sx1").cast("double") / col("n1") -
            col("sx0").cast("double") / col("n0"), 6).as("first_stage"),
          round((col("sy1").cast("double") / col("n1") -
              col("sy0").cast("double") / col("n0")) /
            (col("sx1").cast("double") / col("n1") -
              col("sx0").cast("double") / col("n0")), 4)
            .as("beta_iv_cents"))
    }),

    "q290_item_cf" -> ((s, dir) => {
      // Item-item collaborative filtering: cosine similarity
      // co/sqrt(pop_i*pop_j) over order-basket co-occurrence, top-3
      // neighbors for the 10 most popular parts. The pair pass is the
      // q210 basket-bounded self-join (never a global cross product);
      // popularity and target selection are exact integer ranks; the
      // neighbor ranking orders by ROUNDED cosine with integer
      // tie-breaks so float sqrt can't reorder candidates across
      // engines. The neighbor window is bounded (10 targets).
      val items = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pop = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("pop"))
      val targets = PrefixSum.globalRank(pop,
          Seq(col("pop").desc, col("l_partkey")), "prk")
        .filter(col("prk") <= 10)
        .select(col("l_partkey").as("tgt"), col("pop").as("pop_t"))
      val co = items.select(col("l_orderkey"), col("l_partkey").as("tgt"))
        .join(broadcast(targets), Seq("tgt"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("nbr")),
          Seq("l_orderkey"))
        .filter(col("nbr") =!= col("tgt"))
        .groupBy(col("tgt"), col("pop_t"), col("nbr"))
        .agg(count(lit(1)).as("co"))
      val scored = co.join(pop.select(col("l_partkey").as("nbr"),
          col("pop").as("pop_n")), Seq("nbr"))
        .select(col("tgt"), col("nbr"), col("co"), col("pop_t"),
          col("pop_n"),
          round(col("co") / sqrt((col("pop_t") * col("pop_n"))
            .cast("double")), 6).as("cosine"))
      val w = Window.partitionBy(col("tgt"))
        .orderBy(col("cosine").desc, col("co").desc, col("nbr"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("tgt").as("p_partkey"), col("rank"),
          col("nbr").as("neighbor"), col("co"), col("cosine"))
        .orderBy(col("p_partkey"), col("rank"))
    }),

    "q291_block_bootstrap" -> ((s, dir) => {
      // Moving-block bootstrap CI for mean daily revenue: 200 replicates
      // of 24 length-7 blocks, block starts from an explicit 31-bit LCG
      // on (rep, block) — identical integer arithmetic on any engine, so
      // the "randomness" is reproducible and oracle-checkable. Replicate
      // sums stay exact BIGINTs; the CI bounds are picked by integer
      // rank over (sum, rep), so no float ever decides an ordering. The
      // only data-sized pass is the daily aggregate + the position
      // equi-join (200*168 bounded rows).
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS " +
          "BIGINT)) AS BIGINT)").as("cents"))
      val idx = PrefixSum.globalRank(daily, Seq(col("day")), "tpos")
      val st = idx.agg(count(lit(1)).as("nd"))
      val pos = s.range(1, 201).select(col("id").as("rep"))
        .crossJoin(s.range(0, 24).select(col("id").as("k")))
        .crossJoin(broadcast(st))
        .select(col("rep"), expr(
          "1 + ((1103515245 * (rep * 1009 + k * 9176) + 12345) % " +
            "2147483648) % (nd - 6)").as("start"))
      val expand = pos
        .crossJoin(s.range(0, 7).select(col("id").as("off")))
        .select(col("rep"), (col("start") + col("off")).as("tpos"))
      val repSums = expand.join(idx.select(col("tpos"), col("cents")),
          Seq("tpos"))
        .groupBy(col("rep"))
        .agg(sum(col("cents")).as("sc"), count(lit(1)).as("nb"))
      // 200 bounded rows: a plain window is safe here by construction
      val rk = repSums.withColumn("rn",
        row_number().over(Window.orderBy(col("sc"), col("rep"))))
      val ci = rk.agg(
        sum(when(col("rn") === 10, col("sc"))).as("lo"),
        sum(when(col("rn") === 191, col("sc"))).as("hi"),
        sum(col("sc")).as("tot"), count(lit(1)).as("n_reps"),
        first(col("nb")).as("nb"))
      ci.crossJoin(broadcast(st))
        .select(col("nd").as("n_days"), col("n_reps"),
          round(col("tot") / (col("n_reps") * col("nb") * lit(100.0)), 2)
            .as("boot_mean_daily"),
          round(col("lo") / (col("nb") * lit(100.0)), 2).as("ci5_daily"),
          round(col("hi") / (col("nb") * lit(100.0)), 2).as("ci95_daily"))
    }),

    "q292_decision_stump" -> ((s, dir) => {
      // Decision-stump induction — the single CART split step: candidate
      // thresholds are the exact acctbal deciles (integer ranks i*n div
      // 10 from the two-phase ranker), each scored by Gini gain for the
      // heavy-buyer target via one conditional-aggregate pass over the
      // broadcast threshold set (9 rows — the data never self-joins).
      // Gains are rounded before the top-3 ranking; counts stay exact.
      val y = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"))
      val base = t(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("x"))
        .join(y, col("c_custkey") === col("o_custkey"), "left")
        .select(col("x"),
          when(coalesce(col("n_ord"), lit(0L)) > 5, 1L).otherwise(0L)
            .as("yv"))
      val ranked = PrefixSum.globalRank(base,
        Seq(col("x"), col("yv"), monotonically_increasing_id()), "rk")
      val n = base.agg(count(lit(1)).as("n"), sum(col("yv")).as("pos"))
      val cuts = ranked.crossJoin(broadcast(n))
        .join(broadcast(s.range(1, 10).select(col("id").as("i"))),
          col("rk") === expr("(i * n) div 10"))
        .select(col("x").as("thr")).distinct()
      val splits = base.crossJoin(broadcast(cuts))
        .groupBy(col("thr"))
        .agg(sum(when(col("x") <= col("thr"), 1L).otherwise(0L))
            .as("n_l"),
          sum(when(col("x") <= col("thr"), col("yv")).otherwise(0L))
            .as("p_l"))
      val scored = splits.crossJoin(broadcast(n))
        .select(col("thr"), col("n_l"), col("p_l"),
          (col("n") - col("n_l")).as("n_r"),
          (col("pos") - col("p_l")).as("p_r"), col("n"), col("pos"))
        .filter(col("n_l") > 0 && col("n_r") > 0)
        .select(col("thr"), col("n_l"), col("p_l"), col("n_r"),
          col("p_r"),
          round(
            (lit(1.0) -
              pow(col("pos").cast("double") / col("n"), 2) -
              pow((col("n") - col("pos")).cast("double") / col("n"), 2)) -
            (col("n_l") * (lit(1.0) -
                pow(col("p_l").cast("double") / col("n_l"), 2) -
                pow((col("n_l") - col("p_l")).cast("double") / col("n_l"),
                  2)) +
              col("n_r") * (lit(1.0) -
                pow(col("p_r").cast("double") / col("n_r"), 2) -
                pow((col("n_r") - col("p_r")).cast("double") / col("n_r"),
                  2))) / col("n"), 6).as("gini_gain"))
      // bounded candidate set (<=9 rows): plain window is safe
      scored.withColumn("rank", row_number().over(
          Window.orderBy(col("gini_gain").desc, col("thr"))).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("rank"), col("thr").as("threshold_cents"),
          col("n_l"), col("p_l"), col("n_r"), col("p_r"),
          col("gini_gain"))
        .orderBy(col("rank"))
    }),

    "q293_energy_distance" -> ((s, dir) => {
      // Energy distance between the ASIA and EUROPE acctbal
      // distributions: 2E|X-Y| - E|X-X'| - E|Y-Y'|, with every pairwise
      // |x-y| sum computed EXACTLY in integers from value-grouped
      // prefix sums (the sorted-ranks identity - no pair enumeration,
      // one chained two-phase prefix-sum pass over the distinct-value
      // table), so the only floats are the three final divisions.
      // Complements KS (q168), JS (q270) and Mann-Whitney (q278).
      val geo = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .select(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
          .as("v"), (col("r_name") === "ASIA").as("is_a"))
      val byVal = geo.groupBy(col("v"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
        .withColumn("__g", lit(1))
      val cum = Seq[(org.apache.spark.sql.Column, String)](
        (col("ca"), "cca"), (col("cb"), "ccb"),
        (col("v") * col("ca"), "sva"), (col("v") * col("cb"), "svb"))
        .foldLeft(byVal) { case (df, (v, out)) =>
          PrefixSum.groupedRunningSum(df, "__g", "v", v, out)
        }
      val terms = cum.select(col("v"), col("ca"), col("cb"),
        (col("cca") - col("ca")).as("ka"), (col("ccb") - col("cb")).as("kb"),
        (col("sva") - col("v") * col("ca")).as("ta"),
        (col("svb") - col("v") * col("cb")).as("tb"))
      terms.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
          sum(col("ca") * (col("v") * col("kb") - col("tb")) +
            col("cb") * (col("v") * col("ka") - col("ta"))).as("sab"),
          sum(col("ca") * (col("v") * col("ka") - col("ta"))).as("saa"),
          sum(col("cb") * (col("v") * col("kb") - col("tb"))).as("sbb"))
        .select(col("n_a"), col("n_b"),
          round(col("sab") / (col("n_a") * col("n_b")).cast("double"), 4)
            .as("e_xy"),
          round(lit(2.0) * col("saa") /
            (col("n_a") * col("n_a")).cast("double"), 4).as("e_xx"),
          round(lit(2.0) * col("sbb") /
            (col("n_b") * col("n_b")).cast("double"), 4).as("e_yy"),
          round(lit(2.0) * col("sab") /
              (col("n_a") * col("n_b")).cast("double") -
            lit(2.0) * col("saa") /
              (col("n_a") * col("n_a")).cast("double") -
            lit(2.0) * col("sbb") /
              (col("n_b") * col("n_b")).cast("double"), 4)
            .as("energy_dist"))
    }),

    "q294_cuped" -> ((s, dir) => {
      // CUPED variance reduction for the events A/B harness (treatment =
      // even user_id): per-user pre-period (first 15 days) spend is the
      // covariate, theta = cov(pre,post)/var(pre) from exact integer-
      // cent sums, adjusted effect = raw ATE - theta * pre-period
      // imbalance, plus the corr^2 variance-reduction factor. One
      // user-level aggregate; every moment is an exact BIGINT.
      val ev = events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("CAST(floor(value + 0.5) AS BIGINT)").as("dol"))
      val t0 = ev.agg(min(col("us")).as("smin"))
      val users = ev.crossJoin(broadcast(t0))
        .select(col("user_id"),
          when(col("us") < col("smin") + 1296000000000L, col("dol"))
            .otherwise(0L).as("pre"),
          when(col("us") >= col("smin") + 1296000000000L, col("dol"))
            .otherwise(0L).as("post"))
        .groupBy(col("user_id"))
        .agg(sum(col("pre")).as("pre"), sum(col("post")).as("post"))
        .select((col("user_id") % 2 === 0).as("treat"), col("pre"),
          col("post"))
      val mom = users.agg(count(lit(1)).as("n"),
        sum(col("pre")).as("sp"), sum(col("post")).as("sq"),
        sum(col("pre") * col("pre")).as("spp"),
        sum(col("post") * col("post")).as("sqq"),
        sum(col("pre") * col("post")).as("spq"),
        sum(when(col("treat"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("treat"), col("pre")).otherwise(0L)).as("spt"),
        sum(when(col("treat"), col("post")).otherwise(0L)).as("sqt"))
      mom.select(col("nt").as("n_treat"),
          (col("n") - col("nt")).as("n_ctrl"),
          ((col("n") * col("spq") - col("sp") * col("sq")).cast("double") /
            (col("n") * col("spp") - col("sp") * col("sp"))).as("theta"),
          ((col("n") * col("spq") - col("sp") * col("sq")).cast("double") *
            (col("n") * col("spq") - col("sp") * col("sq")) /
            ((col("n") * col("spp") - col("sp") * col("sp"))
              .cast("double") *
              (col("n") * col("sqq") - col("sq") * col("sq"))))
            .as("r2"),
          (col("sqt").cast("double") / col("nt") -
            (col("sq") - col("sqt")).cast("double") /
              (col("n") - col("nt"))).as("ate_raw"),
          (col("spt").cast("double") / col("nt") -
            (col("sp") - col("spt")).cast("double") /
              (col("n") - col("nt"))).as("pre_imb"))
        .select(col("n_treat"), col("n_ctrl"),
          round(col("theta"), 6).as("theta"),
          round(col("r2"), 6).as("var_reduction"),
          round(col("ate_raw"), 2).as("ate_raw_dollars"),
          round(col("ate_raw") - col("theta") * col("pre_imb"), 2)
            .as("ate_cuped_dollars"))
    }),

    "q295_mediation" -> ((s, dir) => {
      // Causal mediation (product-of-coefficients): does account balance
      // drive spend THROUGH order frequency? a = slope(M~X), (b, c') from
      // the closed-form two-regressor OLS of Y on (M, X), indirect = a*b,
      // plus the proportion mediated. All centered moments are exact
      // BIGINTs (x in dollars, y in kilodollars so n*sums stay in long
      // range at any SF); the regression algebra is fixed-order doubles
      // over those exact sums. One aggregate pass.
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("m"),
          sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("ydol"))
      val base = t(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(floor(c_acctbal + 0.5) AS BIGINT)").as("x"))
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("x"), coalesce(col("m"), lit(0L)).as("m"),
          expr("coalesce(ydol, 0L) div 1000L").as("y"))
      val mom = base.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("m")).as("sm"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("m") * col("m")).as("smm"),
        sum(col("x") * col("m")).as("sxm"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("m") * col("y")).as("smy"))
      val c = mom.select(col("n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("cxx"),
        (col("n") * col("smm") - col("sm") * col("sm")).as("cmm"),
        (col("n") * col("sxm") - col("sx") * col("sm")).as("cxm"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cxy"),
        (col("n") * col("smy") - col("sm") * col("sy")).as("cmy"))
      c.select(col("n"),
          (col("cxm").cast("double") / col("cxx")).as("a"),
          ((col("cxx").cast("double") * col("cmy") -
            col("cxm").cast("double") * col("cxy")) /
            (col("cxx").cast("double") * col("cmm") -
              col("cxm").cast("double") * col("cxm"))).as("b"),
          ((col("cmm").cast("double") * col("cxy") -
            col("cxm").cast("double") * col("cmy")) /
            (col("cxx").cast("double") * col("cmm") -
              col("cxm").cast("double") * col("cxm"))).as("cp"),
          (col("cxy").cast("double") / col("cxx")).as("ctot"))
        .select(col("n"), round(col("a"), 6).as("a_mx"),
          round(col("b"), 6).as("b_ym"),
          round(col("cp"), 6).as("direct"),
          round(col("ctot"), 6).as("total"),
          round(col("a") * col("b"), 6).as("indirect"),
          round(col("a") * col("b") / col("ctot"), 4)
            .as("prop_mediated"))
    }),

    "q296_empirical_bayes" -> ((s, dir) => {
      // Empirical-Bayes shrinkage ranking (beta-binomial): per-part
      // return rates shrunk toward the corpus prior fitted by method of
      // moments on the raw rates, so low-volume parts can't top the
      // ranking on noise. Counts are exact integers; the prior and the
      // shrunk rates are fixed-order doubles rounded BEFORE the top-5
      // ordering (integer tie-breaks). Two aggregate passes, no joins
      // beyond the broadcast prior.
      val parts = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returns"))
        .filter(col("n_lines") >= 5)
      val prior = parts
        .select((col("n_returns").cast("double") / col("n_lines"))
          .as("r"))
        .agg(count(lit(1)).as("np"), avg(col("r")).as("mu"),
          (sum(col("r") * col("r")) / count(lit(1))).as("m2"))
        .select(col("np"), col("mu"),
          (col("m2") - col("mu") * col("mu")).as("v"))
        .select(col("np"), col("mu"),
          (col("mu") * (lit(1.0) - col("mu")) / col("v") - 1).as("k"))
        .select(col("np"), (col("mu") * col("k")).as("alpha"),
          ((lit(1.0) - col("mu")) * col("k")).as("beta"))
      val shrunk = parts.crossJoin(broadcast(prior))
        .select(col("l_partkey"), col("n_lines"), col("n_returns"),
          round(col("n_returns").cast("double") / col("n_lines"), 6)
            .as("raw_rate"),
          round((col("n_returns") + col("alpha")) /
            (col("n_lines") + col("alpha") + col("beta")), 6)
            .as("shrunk_rate"),
          round(col("alpha"), 4).as("prior_alpha"),
          round(col("beta"), 4).as("prior_beta"))
      PrefixSum.globalRank(shrunk,
          Seq(col("shrunk_rate").desc, col("n_lines").desc,
            col("l_partkey")), "rk")
        .filter(col("rk") <= 5)
        .select(col("rk").as("rank"), col("l_partkey"), col("n_lines"),
          col("n_returns"), col("raw_rate"), col("shrunk_rate"),
          col("prior_alpha"), col("prior_beta"))
        .orderBy(col("rank"))
    }),

    "q297_overdispersion" -> ((s, dir) => {
      // Poisson overdispersion audit of daily event counts per type:
      // index of dispersion s^2/mean from exact integer day-count
      // moments — the count-data QA gate (index >> 1 means a Poisson
      // rate model or Poisson-based alerting threshold is wrong for
      // that stream). One grouped aggregate over the per-day rollup.
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total"),
          sum(col("c") * col("c")).as("ss"))
        .select(col("event_type"), col("n_days"), col("total"),
          round(col("total").cast("double") / col("n_days"), 4)
            .as("mean_per_day"),
          round((col("n_days") * col("ss") - col("total") * col("total"))
            .cast("double") /
            (col("n_days").cast("double") * (col("n_days") - 1)), 4)
            .as("variance"),
          round((col("n_days") * col("ss") - col("total") * col("total"))
            .cast("double") /
            (col("n_days").cast("double") * (col("n_days") - 1)) /
            (col("total").cast("double") / col("n_days")), 4)
            .as("dispersion_index"))
        .orderBy(col("event_type"))
    }),

    "q298_pca_2d" -> ((s, dir) => {
      // Closed-form 2-D PCA of (account balance, lifetime spend): the
      // covariance eigenpair from trace/determinant, explained-variance
      // ratio and the first-PC angle 0.5*atan2(2cxy, cxx-cyy). Centered
      // moments are exact BIGINTs (dollar/kilodollar units keep n*sums
      // in long range at any SF, as q295); everything after is a fixed
      // float expression over those exact longs. One aggregate pass.
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("ydol"))
      val base = t(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(floor(c_acctbal + 0.5) AS BIGINT)").as("x"))
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("x"), expr("coalesce(ydol, 0L) div 1000L").as("y"))
      val mom = base.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val c = mom.select(col("n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("cxx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("cyy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cxy"))
      c.select(col("n"), col("cxx"), col("cyy"), col("cxy"),
          sqrt(pow(col("cxx").cast("double") - col("cyy"), 2) +
            lit(4.0) * col("cxy") * col("cxy")).as("disc"),
          (col("n").cast("double") * (col("n") - 1)).as("den"))
        .select(col("n"),
          round(col("cxy") / sqrt(col("cxx").cast("double") * col("cyy")),
            6).as("corr"),
          round(((col("cxx") + col("cyy")) + col("disc")) /
            (lit(2.0) * col("den")), 4).as("lambda1"),
          round(((col("cxx") + col("cyy")) - col("disc")) /
            (lit(2.0) * col("den")), 4).as("lambda2"),
          round(((col("cxx") + col("cyy")) + col("disc")) /
            (lit(2.0) * (col("cxx") + col("cyy")).cast("double")), 6)
            .as("evr1"),
          round(lit(0.5) * atan2(lit(2.0) * col("cxy"),
            (col("cxx") - col("cyy")).cast("double")) *
            lit(180.0 / math.Pi), 4).as("pc1_angle_deg"))
    }),

    "q299_morans_i" -> ((s, dir) => {
      // Moran's I network autocorrelation: do brands that co-occur in
      // orders have similar price points? Weights = the q281 co-purchase
      // brand graph (off-diagonal), attribute = brand mean line price.
      // The only data-sized passes are the basket pair join and the
      // brand rollup; the I statistic itself runs over the bounded
      // brand x brand table. Expected value -1/(N-1) reported alongside.
      val li = t(s, dir, "lineitem")
      val brands = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val attr = li
        .join(broadcast(brands), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS " +
          "BIGINT)")).cast("double") /
          (count(lit(1)) * lit(100.0))).as("price"))
      val xbar = attr.agg(avg(col("price")).as("mu"),
        count(lit(1)).as("nb"))
      val z = attr.crossJoin(broadcast(xbar))
        .select(col("p_brand"), (col("price") - col("mu")).as("z"),
          col("nb"))
      val items = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      val pairs = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
          Seq("l_orderkey"))
        .filter(col("p1") < col("p2"))
        .join(broadcast(brands.select(col("p_partkey").as("p1"),
          col("p_brand").as("b1"))), Seq("p1"))
        .join(broadcast(brands.select(col("p_partkey").as("p2"),
          col("p_brand").as("b2"))), Seq("p2"))
        .filter(col("b1") =!= col("b2"))
        .groupBy(col("b1"), col("b2")).agg(count(lit(1)).as("w"))
      val cross = pairs
        .join(broadcast(z.select(col("p_brand").as("b1"),
          col("z").as("z1"))), Seq("b1"))
        .join(broadcast(z.select(col("p_brand").as("b2"),
          col("z").as("z2"), col("nb"))), Seq("b2"))
        .agg(first(col("nb")).as("nb"),
          (lit(2.0) * sum(col("w"))).as("sw"),
          (lit(2.0) * sum(col("w") * col("z1") * col("z2"))).as("wzz"))
      val den = z.agg(sum(col("z") * col("z")).as("zz"))
      cross.crossJoin(broadcast(den))
        .select(col("nb").as("n_brands"),
          col("sw").cast("long").as("sum_w"),
          round(col("nb") * col("wzz") / (col("sw") * col("zz")), 4)
            .as("morans_i"),
          round(lit(-1.0) / (col("nb") - 1), 4).as("expected_i"))
    }),

    "q300_winners_curse" -> ((s, dir) => {
      // Winner's-curse audit for "pick the best segment" decisions: the
      // top segment by split-A mean order value (orderkey parity split)
      // is re-measured honestly on split B — the gap is the
      // post-selection optimism a naive dashboard ships. Means are exact
      // integer-cent sums divided once; the argmax runs over the five
      // bounded segment rows.
      val seg = t(s, dir, "orders")
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          (col("o_orderkey") % 2 === 0).as("in_a"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
      val bySplit = seg.groupBy(col("segment"))
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("in_a"), col("cents")).otherwise(0L)).as("s_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(!col("in_a"), col("cents")).otherwise(0L)).as("s_b"))
        .select(col("segment"), col("n_a"), col("n_b"),
          (col("s_a").cast("double") / col("n_a")).as("mean_a"),
          (col("s_b").cast("double") / col("n_b")).as("mean_b"))
      // 5 bounded segment rows: plain window is safe
      bySplit.withColumn("rk", row_number().over(
          Window.orderBy(col("mean_a").desc, col("segment"))).cast("long"))
        .filter(col("rk") === 1)
        .select(col("segment").as("winner_segment"), col("n_a"),
          col("n_b"), round(col("mean_a"), 2).as("mean_a_cents"),
          round(col("mean_b"), 2).as("mean_b_cents"),
          round(col("mean_a") - col("mean_b"), 2).as("optimism_cents"))
    }),

    "q301_conformal" -> ((s, dir) => {
      // Split-conformal prediction interval for order value: per-segment
      // mean fitted on the calibration half (orderkey parity), the 90%
      // residual quantile picked at the EXACT integer rank
      // ceil(0.9*(n+1)) via the two-phase ranker, honest coverage
      // measured on the other half. Residuals are doubles but derive
      // from identical exact sums on both engines, so ranks and the
      // coverage comparison agree bit-for-bit.
      val seg = t(s, dir, "orders")
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("sg"),
          (col("o_orderkey") % 2 === 0).as("cal"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
      val model = seg.filter(col("cal")).groupBy(col("sg"))
        .agg((sum(col("cents")).cast("double") / count(lit(1))).as("m"))
      val resid = seg.join(broadcast(model), Seq("sg"))
        .select(col("o_orderkey"), col("cal"),
          abs(col("cents") - col("m")).as("r"))
      val calR = resid.filter(col("cal"))
      val nc = calR.agg(count(lit(1)).as("n_cal"))
      val qhat = PrefixSum.globalRank(calR,
          Seq(col("r"), col("o_orderkey")), "rk")
        .crossJoin(broadcast(nc))
        .filter(col("rk") === expr("(9 * (n_cal + 1) + 9) div 10"))
        .select(col("n_cal"), col("r").as("qhat"))
      resid.filter(!col("cal")).crossJoin(broadcast(qhat))
        .agg(first(col("n_cal")).as("n_cal"),
          count(lit(1)).as("n_test"),
          round(first(col("qhat")), 2).as("qhat_cents"),
          round(avg(when(col("r") <= col("qhat"), 1.0).otherwise(0.0)), 4)
            .as("coverage"))
    }),

    "q302_wasserstein" -> ((s, dir) => {
      // Exact 1-D Wasserstein (earth-mover) distance between the ASIA
      // and EUROPE acctbal distributions: integral |F_a - F_b| as
      // Sum |CA*nb - CB*na| * (v_next - v) over the distinct-value
      // table — EXACT integers until one final division by na*nb (the
      // transport-cost companion to q293's energy distance). Value gaps
      // come from a rank self-join (two-phase ranker), never a global
      // lead window.
      val geo = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .select(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
          .as("v"), (col("r_name") === "ASIA").as("is_a"))
      val byVal = geo.groupBy(col("v"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
        .withColumn("__g", lit(1))
      val cum = PrefixSum.groupedRunningSum(
        PrefixSum.groupedRunningSum(byVal, "__g", "v", col("ca"), "cca"),
        "__g", "v", col("cb"), "ccb")
      val ranked = PrefixSum.globalRank(cum, Seq(col("v")), "rk")
      val nxt = ranked.select((col("rk") - 1).as("rk"), col("v").as("vn"))
      val tot = byVal.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      ranked.join(nxt, Seq("rk"))
        .crossJoin(broadcast(tot))
        .agg(first(col("na")).as("n_a"), first(col("nb")).as("n_b"),
          sum(abs(col("cca") * col("nb") - col("ccb") * col("na")) *
            (col("vn") - col("v"))).as("num"))
        .select(col("n_a"), col("n_b"),
          round(col("num") / (col("n_a") * col("n_b")).cast("double") /
            lit(100.0), 4).as("w1_dollars"))
    }),

    "q303_term_burstiness" -> ((s, dir) => {
      // Church-Gale term burstiness: for the 10 highest-frequency terms,
      // observed document frequency vs the Poisson prediction
      // D*(1-exp(-cf/D)) — burstiness below 1 means occurrences CLUMP
      // into few documents (adaptation), the corpus-linguistics signal
      // behind df-based boilerplate filters. One token explode + one
      // per-term aggregate; ranking by exact integer (cf, term).
      val docs = t(s, dir, "documents")
      val nD = docs.agg(count(lit(1)).as("d"))
      val terms = docs
        .select(col("doc_id"), explode(TF.normTokens(col("text")))
          .as("term"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("term"))
        .agg(sum(col("c")).as("cf"), count(lit(1)).as("df"))
      PrefixSum.globalRank(terms, Seq(col("cf").desc, col("term")), "rk")
        .filter(col("rk") <= 10)
        .crossJoin(broadcast(nD))
        .select(col("rk").as("rank"), col("term"), col("cf"), col("df"),
          round(col("cf").cast("double") / col("df"), 4)
            .as("adaptation"),
          round(col("d") * (lit(1.0) -
            exp(-col("cf").cast("double") / col("d"))), 2).as("df_pred"),
          round(col("d") * (lit(1.0) -
            exp(-col("cf").cast("double") / col("d"))) / col("df"), 4)
            .as("burstiness"))
        .orderBy(col("rank"))
    }),

    "q304_circular_stats" -> ((s, dir) => {
      // Circular statistics of event time-of-day: mean direction and
      // resultant length on the 24 h circle per event type, plus the
      // Rayleigh uniformity test (z = nR^2, p ~ exp(-z)) — the correct
      // way to average times that wrap at midnight (a 23:00/01:00 mix
      // averages to 00:00, not 12:00). Angles from exact integer
      // minute-of-day; one aggregate pass per type.
      val ev = events(s, dir)
        .select(col("event_type"),
          (expr("(unix_micros(ts) div 60000000) % 1440"))
            .as("m"))
        .select(col("event_type"),
          (lit(2 * math.Pi) * col("m") / lit(1440.0)).as("theta"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cos(col("theta"))).as("c"),
          sum(sin(col("theta"))).as("ss"))
        .select(col("event_type"), col("n"),
          (sqrt(col("c") * col("c") + col("ss") * col("ss")) / col("n"))
            .as("r"),
          atan2(col("ss"), col("c")).as("ang"))
        .select(col("event_type"), col("n"), round(col("r"), 6)
            .as("resultant_r"),
          round((when(col("ang") < 0, col("ang") + lit(2 * math.Pi))
            .otherwise(col("ang")) * lit(24.0 / (2 * math.Pi))), 4)
            .as("mean_hour"),
          round(col("n") * col("r") * col("r"), 4).as("rayleigh_z"),
          round(exp(-col("n") * col("r") * col("r")), 6).as("p_uniform"))
        .orderBy(col("event_type"))
    }),

    "q305_twfe" -> ((s, dir) => {
      // Two-way fixed-effects (within) estimator on the brand x year
      // revenue/quantity panel: double-demeaned ln-ln slope — the
      // workhorse panel elasticity with brand and year effects swept
      // out. The panel is bounded (|brands| x |years|), so the demeaning
      // means are window sums over it (q288 pattern); the only
      // data-sized pass is the panel rollup in exact integer cents.
      val panel = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS " +
          "BIGINT)")).as("cents"),
          sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("qty"))
        .select(col("p_brand"), col("yr"),
          log(col("cents").cast("double")).as("y"),
          log(col("qty").cast("double")).as("x"))
      val wB = Window.partitionBy(col("p_brand"))
      val wY = Window.partitionBy(col("yr"))
      val g = panel.agg(avg(col("y")).as("gy"), avg(col("x")).as("gx"),
        count(lit(1)).as("n_cells"))
      val dm = panel
        .withColumn("by_", avg(col("y")).over(wB))
        .withColumn("bx", avg(col("x")).over(wB))
        .withColumn("yy", avg(col("y")).over(wY))
        .withColumn("yx", avg(col("x")).over(wY))
        .crossJoin(broadcast(g))
        .select(col("n_cells"),
          (col("y") - col("by_") - col("yy") + col("gy")).as("yt"),
          (col("x") - col("bx") - col("yx") + col("gx")).as("xt"))
      dm.groupBy(col("n_cells"))
        .agg(sum(col("xt") * col("yt")).as("sxy"),
          sum(col("xt") * col("xt")).as("sxx"),
          sum(col("yt") * col("yt")).as("syy"))
        .select(col("n_cells"),
          round(col("sxy") / col("sxx"), 6).as("twfe_slope"),
          round(col("sxy") * col("sxy") / (col("sxx") * col("syy")), 6)
            .as("within_r2"))
    }),

    "q306_root_cause" -> ((s, dir) => {
      // Adtributor-style root-cause attribution for a month-over-month
      // revenue move (1995-07 -> 1995-08): per dimension value
      // (segment and region, stacked), explanatory power
      // (a_i - f_i)/(A - F) and the pointwise Jensen-Shannon surprise
      // between composition shares. Dimension tables are bounded; the
      // data-sized passes are the two monthly rollups in exact cents.
      val geo = t(s, dir, "orders")
        .filter(expr("o_orderdate >= TIMESTAMP '1995-07-01 00:00:00' " +
          "AND o_orderdate < TIMESTAMP '1995-09-01 00:00:00'"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_mktsegment").as("seg"), col("r_name").as("reg"),
          (month(col("o_orderdate")) === 7).as("before"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
      val stacked = geo
        .select(lit("segment").as("dimension"), col("seg").as("value"),
          col("before"), col("cents"))
        .unionAll(geo.select(lit("region").as("dimension"),
          col("reg").as("value"), col("before"), col("cents")))
      val cells = stacked.groupBy(col("dimension"), col("value"))
        .agg(sum(when(col("before"), col("cents")).otherwise(0L))
            .as("f"),
          sum(when(!col("before"), col("cents")).otherwise(0L)).as("a"))
      val wD = Window.partitionBy(col("dimension"))
      cells
        .withColumn("tf", sum(col("f")).over(wD))
        .withColumn("ta", sum(col("a")).over(wD))
        .select(col("dimension"), col("value"), col("f").as("f_cents"),
          col("a").as("a_cents"),
          round((col("a") - col("f")).cast("double") /
            (col("ta") - col("tf")), 4).as("explanatory_power"),
          round(
            (when(col("f") === 0, lit(0.0)).otherwise(
              col("f").cast("double") / col("tf") *
              log(lit(2.0) * (col("f").cast("double") / col("tf")) /
                (col("f").cast("double") / col("tf") +
                  col("a").cast("double") / col("ta")))) +
             when(col("a") === 0, lit(0.0)).otherwise(
              col("a").cast("double") / col("ta") *
              log(lit(2.0) * (col("a").cast("double") / col("ta")) /
                (col("f").cast("double") / col("tf") +
                  col("a").cast("double") / col("ta"))))) * lit(0.5), 6)
            .as("js_surprise"))
        .orderBy(col("dimension"), col("value"))
    }),

    "q307_gravity_model" -> ((s, dir) => {
      // Trade-gravity regression on the customer-nation x supplier-
      // nation flow matrix: ln(flow) on (ln origin mass, ln destination
      // mass) via the closed-form two-regressor OLS (q295 machinery).
      // Masses are window sums over the bounded nation x nation cell
      // table; the only data-sized pass is the flow rollup in exact
      // cents. The textbook b1~b2~1 gravity shape is the check.
      val flows = t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").as("cn")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").as("sn"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("cn"), col("sn"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS " +
          "BIGINT)")).as("cents"))
      val wC = Window.partitionBy(col("cn"))
      val wS = Window.partitionBy(col("sn"))
      val cells = flows
        .withColumn("mc", sum(col("cents")).over(wC))
        .withColumn("ms", sum(col("cents")).over(wS))
        .select(log(col("cents").cast("double")).as("y"),
          log(col("mc").cast("double")).as("x1"),
          log(col("ms").cast("double")).as("x2"))
      val mom = cells.agg(count(lit(1)).as("n"),
        avg(col("y")).as("my"), avg(col("x1")).as("m1"),
        avg(col("x2")).as("m2"),
        (sum(col("x1") * col("x1")) / count(lit(1))).as("e11"),
        (sum(col("x2") * col("x2")) / count(lit(1))).as("e22"),
        (sum(col("x1") * col("x2")) / count(lit(1))).as("e12"),
        (sum(col("x1") * col("y")) / count(lit(1))).as("e1y"),
        (sum(col("x2") * col("y")) / count(lit(1))).as("e2y"))
      val c = mom.select(col("n"), col("my"), col("m1"), col("m2"),
        (col("e11") - col("m1") * col("m1")).as("c11"),
        (col("e22") - col("m2") * col("m2")).as("c22"),
        (col("e12") - col("m1") * col("m2")).as("c12"),
        (col("e1y") - col("m1") * col("my")).as("c1y"),
        (col("e2y") - col("m2") * col("my")).as("c2y"))
      c.select(col("n").as("n_cells"),
          ((col("c22") * col("c1y") - col("c12") * col("c2y")) /
            (col("c11") * col("c22") - col("c12") * col("c12")))
            .as("b1"),
          ((col("c11") * col("c2y") - col("c12") * col("c1y")) /
            (col("c11") * col("c22") - col("c12") * col("c12")))
            .as("b2"), col("my"), col("m1"), col("m2"))
        .select(col("n_cells"), round(col("b1"), 6).as("beta_origin"),
          round(col("b2"), 6).as("beta_dest"),
          round(col("my") - col("b1") * col("m1") -
            col("b2") * col("m2"), 4).as("intercept"))
    }),

    "q308_chain_ladder" -> ((s, dir) => {
      // Actuarial chain-ladder on the order-cohort x ship-lag
      // development triangle: cumulative cents C(cohort, dev) via a
      // per-cohort window over the bounded dev axis, volume-weighted
      // link factors f_j from every (j, j+1) pair both observable at
      // the calendar edge, and the cumulative-to-ultimate product per
      // dev. Exact integers until the factor divisions; the triangle
      // itself is calendar-bounded.
      val base = t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("coh"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) -
            year(col("o_orderdate")) * 12 - month(col("o_orderdate")))
            .cast("long").as("dev"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
        // the synthetic ship dates carry outlier lags (incl. negative);
        // a development triangle is defined on the 0..6-month window
        .filter(col("dev") >= 0 && col("dev") <= 6)
      val tri = base.groupBy(col("coh"), col("dev"))
        .agg(sum(col("cents")).as("x"))
      val mx = base.agg(max(col("coh") + col("dev")).as("mcal"))
      // per-cohort dev axis is bounded (ship lag <= a few months)
      val wCum = Window.partitionBy(col("coh")).orderBy(col("dev"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = tri.withColumn("c", sum(col("x")).over(wCum))
      val nxt = cum.select(col("coh"), (col("dev") - 1).as("dev"),
        col("c").as("c_next"))
      val fac = cum.join(nxt, Seq("coh", "dev"))
        .crossJoin(broadcast(mx))
        .filter(col("coh") + col("dev") + 1 <= col("mcal"))
        .groupBy(col("dev"))
        .agg(count(lit(1)).as("n_cohorts"), sum(col("c")).as("sc"),
          sum(col("c_next")).as("sn"))
        .select(col("dev"), col("n_cohorts"),
          (col("sn").cast("double") / col("sc")).as("f"))
      // bounded dev rows: suffix product via ln-sum window
      fac.withColumn("cum_to_ult",
          exp(sum(log(col("f"))).over(
            Window.orderBy(col("dev").desc)
              .rowsBetween(Window.unboundedPreceding, 0))))
        .select(col("dev").as("dev_month"), col("n_cohorts"),
          round(col("f"), 6).as("link_factor"),
          round(col("cum_to_ult"), 6).as("to_ultimate"))
        .orderBy(col("dev_month"))
    }),

    "q309_rake_keywords" -> ((s, dir) => {
      // RAKE keyword extraction: candidate phrases are maximal stopword-
      // free token runs (gaps-and-islands via a running stopword count),
      // word score = degree/frequency over phrase co-occurrence, phrase
      // score = sum of member word scores; global top-10. Per-doc
      // windows are document-bounded; word scores are exact-integer
      // ratios; the final ranking orders by the ROUNDED score with
      // string/id tie-breaks.
      val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in",
        "is", "on", "for", "with", "as", "by", "at", "it", "this",
        "that", "be", "are", "was", "from")
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TF.normTokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("is_stop", col("tok").isInCollection(stop))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val words = toks
        .withColumn("run",
          sum(when(col("is_stop"), 1L).otherwise(0L)).over(wDoc))
        .filter(!col("is_stop"))
      val wRun = Window.partitionBy(col("doc_id"), col("run"))
      val withLen = words.withColumn("plen", count(lit(1)).over(wRun))
      val wscore = withLen.groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .select(col("tok"),
          (col("deg").cast("double") / col("freq")).as("ws"))
      val phrases = withLen.join(wscore, Seq("tok"))
        .groupBy(col("doc_id"), col("run"))
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("phrase"),
          count(lit(1)).as("n_words"), sum(col("ws")).as("score"))
      PrefixSum.globalRank(
          phrases.withColumn("score_r", round(col("score"), 4)),
          Seq(col("score_r").desc, col("phrase"), col("doc_id"),
            col("run")), "rk")
        .filter(col("rk") <= 10)
        .select(col("rk").as("rank"), col("phrase"), col("doc_id"),
          col("n_words"), col("score_r").as("score"))
        .orderBy(col("rank"))
    }),

    "q310_control_chart" -> ((s, dir) => {
      // Shewhart X-bar/R control chart over weekly subgroups (n=7) of
      // daily revenue: centerline and A2/D4 limits from the published
      // n=7 constants, out-of-control and range-violation counts.
      // Subgroup stats stay exact integers (weekly totals, integer
      // ranges); the limits are fixed-order doubles, so the violation
      // comparisons agree across engines. Calendar-bounded week table.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS " +
          "BIGINT)) AS BIGINT)").as("cents"))
      val d0 = daily.agg(min(col("day")).as("dmin"))
      val weeks = daily.crossJoin(broadcast(d0))
        .select(expr("datediff(day, dmin) div 7").as("wk"), col("cents"))
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("nd"), sum(col("cents")).as("tot"),
          (max(col("cents")) - min(col("cents"))).as("r"))
        .filter(col("nd") === 7)
      val lims = weeks.agg(count(lit(1)).as("n_weeks"),
          (sum(col("tot")).cast("double") /
            (count(lit(1)) * 7)).as("xbb"),
          (sum(col("r")).cast("double") / count(lit(1))).as("rbar"))
        .select(col("n_weeks"), col("xbb"), col("rbar"),
          (col("xbb") + lit(0.419) * col("rbar")).as("ucl"),
          (col("xbb") - lit(0.419) * col("rbar")).as("lcl"),
          (lit(1.924) * col("rbar")).as("ucl_r"))
      weeks.crossJoin(broadcast(lims))
        .agg(first(col("n_weeks")).as("n_weeks"),
          round(first(col("xbb")) / 100, 2).as("center_daily"),
          round(first(col("ucl")) / 100, 2).as("ucl_daily"),
          round(first(col("lcl")) / 100, 2).as("lcl_daily"),
          sum(when(col("tot").cast("double") > lit(7.0) * col("ucl"),
            1L).otherwise(0L)).as("n_above"),
          sum(when(col("tot").cast("double") < lit(7.0) * col("lcl"),
            1L).otherwise(0L)).as("n_below"),
          sum(when(col("r").cast("double") > col("ucl_r"), 1L)
            .otherwise(0L)).as("n_range_viol"))
    }),

    "q311_fairness_audit" -> ((s, dir) => {
      // Group-fairness audit of the "balance above median" heavy-buyer
      // screen across regions: per-region selection rate (demographic
      // parity), TPR and FPR (equalized odds), with the corpus-wide
      // max-min parity gap as a constant column via a window over the
      // bounded region rows. Median threshold from the exact integer
      // rank n div 2; every rate is an exact-count ratio.
      val y = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"))
      val geo = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("x"))
      val nTot = geo.agg(count(lit(1)).as("n"))
      val med = PrefixSum.globalRank(geo,
          Seq(col("x"), col("c_custkey")), "rk")
        .crossJoin(broadcast(nTot))
        .filter(col("rk") === expr("n div 2"))
        .select(col("x").as("thr"))
      val base = geo.crossJoin(broadcast(med))
        .join(y, col("c_custkey") === col("o_custkey"), "left")
        .select(col("r_name"), (col("x") > col("thr")).as("pred"),
          (coalesce(col("n_ord"), lit(0L)) > 5).as("pos"))
      val byG = base.groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred"), 1L).otherwise(0L)).as("sel"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(col("pred") && col("pos"), 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("pred") && !col("pos"), 1L).otherwise(0L))
            .as("fp"))
        .select(col("r_name"), col("n"),
          (col("sel").cast("double") / col("n")).as("sr"),
          when(col("np") === 0, lit(null))
            .otherwise(col("tp").cast("double") / col("np")).as("tpr"),
          when(col("n") === col("np"), lit(null))
            .otherwise(col("fp").cast("double") /
              (col("n") - col("np"))).as("fpr"))
      // bounded region rows: whole-set window for the corpus gap
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      byG.select(col("r_name"), col("n"), round(col("sr"), 6)
            .as("selection_rate"),
          round(col("tpr"), 6).as("tpr"), round(col("fpr"), 6).as("fpr"),
          round(max(col("sr")).over(wAll) - min(col("sr")).over(wAll), 6)
            .as("parity_gap"))
        .orderBy(col("r_name"))
    }),

    "q312_mobility_matrix" -> ((s, dir) => {
      // Customer spend-quintile transition matrix 1995 -> 1996 with the
      // Shorrocks mobility index (k - trace)/(k-1): quintiles per year
      // from exact global ranks (q178 arithmetic: 1 + (rank-1)*5 div n),
      // transitions over customers active both years, row shares and
      // the trace via windows over the bounded 5x5 matrix.
      val yearly = t(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      def quintiles(yr: Int): DataFrame = {
        val sub = yearly.filter(col("yr") === yr)
        val n = sub.agg(count(lit(1)).as("n"))
        PrefixSum.globalRank(sub,
            Seq(col("cents").desc, col("o_custkey")), "rk")
          .crossJoin(broadcast(n))
          .select(col("o_custkey"),
            expr("1 + ((rk - 1) * 5) div n").as(s"q$yr"))
      }
      val both = quintiles(1995).join(quintiles(1996), "o_custkey")
      val cells = both.groupBy(col("q1995"), col("q1996"))
        .agg(count(lit(1)).as("n"))
      val wRow = Window.partitionBy(col("q1995"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      cells
        .withColumn("share",
          col("n").cast("double") / sum(col("n")).over(wRow))
        .withColumn("mobility", round((lit(5.0) -
          sum(when(col("q1995") === col("q1996"), col("share"))
            .otherwise(0.0)).over(wAll)) / 4, 6))
        .select(col("q1995"), col("q1996"), col("n"),
          round(col("share"), 4).as("share"), col("mobility"))
        .orderBy(col("q1995"), col("q1996"))
    }),

    "q313_threshold_opt" -> ((s, dir) => {
      // Decision-threshold optimization for the balance -> heavy-buyer
      // screen: sweep EVERY distinct score as a cut via prefix sums
      // over the value-grouped table (no per-threshold rescan), pick
      // the F1-optimal and Youden-J-optimal operating points. Counts
      // are exact; objectives are rounded before the argmax ranking so
      // float division can't flip the winner across engines.
      val y = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"))
      val base = t(s, dir, "customer")
        .select(col("c_custkey"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("x"))
        .join(y, col("c_custkey") === col("o_custkey"), "left")
        .select(col("x"),
          when(coalesce(col("n_ord"), lit(0L)) > 5, 1L).otherwise(0L)
            .as("pos"))
      val byVal = base.groupBy(col("x"))
        .agg(count(lit(1)).as("nv"), sum(col("pos")).as("pv"))
        .withColumn("__g", lit(1))
      val cum = PrefixSum.groupedRunningSum(
        PrefixSum.groupedRunningSum(byVal, "__g", "x", col("nv"), "cn"),
        "__g", "x", col("pv"), "cp")
      val tot = byVal.agg(sum(col("nv")).as("n"), sum(col("pv")).as("p"))
      val pts = cum.crossJoin(broadcast(tot))
        .select(col("x").as("thr"),
          (col("p") - col("cp")).as("tp"),
          ((col("n") - col("cn")) - (col("p") - col("cp"))).as("fp"),
          col("cp").as("fn"), col("n"), col("p"))
        .select(col("thr"), col("tp"), col("fp"), col("fn"),
          round(lit(2.0) * col("tp") /
            (lit(2.0) * col("tp") + col("fp") + col("fn")), 6).as("f1"),
          round(col("tp").cast("double") / col("p") -
            col("fp").cast("double") / (col("n") - col("p")), 6).as("j"))
      val bestF1 = PrefixSum.globalRank(pts,
          Seq(col("f1").desc, col("thr")), "rk")
        .filter(col("rk") === 1)
        .select(col("thr").as("f1_threshold_cents"), col("f1"),
          col("tp"), col("fp"), col("fn"))
      val bestJ = PrefixSum.globalRank(pts,
          Seq(col("j").desc, col("thr")), "rk")
        .filter(col("rk") === 1)
        .select(col("thr").as("youden_threshold_cents"),
          col("j").as("youden_j"))
      bestF1.crossJoin(bestJ)
    }),

    "q314_records_test" -> ((s, dir) => {
      // Records test for i.i.d.-ness of daily revenue: the number of
      // running-maximum record days vs the H_n = sum 1/k expectation
      // (variance sum 1/k - 1/k^2) — record-value theory says trends
      // inflate the count. Running max over the calendar-bounded day
      // series; harmonic sums from the exact day index, one pass.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS " +
          "BIGINT)) AS BIGINT)").as("cents"))
      // calendar-bounded series: a global ordered window is safe here
      val wPrev = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val idx = PrefixSum.globalRank(daily, Seq(col("day")), "k")
        .withColumn("isrec",
          when(col("cents") > coalesce(max(col("cents")).over(wPrev),
            lit(Long.MinValue)), 1L).otherwise(0L))
      idx.agg(count(lit(1)).as("n_days"),
          sum(col("isrec")).as("n_records"),
          sum(lit(1.0) / col("k")).as("h"),
          sum(lit(1.0) / col("k") -
            lit(1.0) / (col("k") * col("k"))).as("v"),
          max(when(col("isrec") === 1, col("day"))).as("last_record_day"))
        .select(col("n_days"), col("n_records"),
          round(col("h"), 4).as("expected_records"),
          round((col("n_records") - col("h")) / sqrt(col("v")), 4)
            .as("z"),
          date_format(col("last_record_day"), "yyyy-MM-dd")
            .as("last_record_day"))
    }),

    "q315_erlang_c" -> ((s, dir) => {
      // Erlang-C staffing table from the event arrival stream: offered
      // load A = lambda * 3-minute mean handle time, wait probability
      // and average speed of answer for 1..10 agents — the queueing-
      // theory capacity planner. The only data-sized pass is the
      // arrival-count aggregate; the c x k factorial expansion is a
      // bounded 55-row grid (Spark/DuckDB share exact factorial and
      // pow semantics at these magnitudes).
      val span = events(s, dir)
        .agg(count(lit(1)).as("ne"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("span_us"))
        .select((col("ne") * lit(3.6e9) / col("span_us"))
          .as("lam_hr"))
        .select(col("lam_hr"), (col("lam_hr") * lit(0.05)).as("a"))
      val cs = s.range(1, 11).select(col("id").as("c"))
      val ks = s.range(0, 10).select(col("id").as("k"))
      val sums = cs.join(ks, col("k") < col("c"))
        .crossJoin(broadcast(span))
        .select(col("c"), col("a"),
          (pow(col("a"), col("k").cast("double")) /
            factorial(col("k").cast("int")).cast("double")).as("term"))
        .groupBy(col("c"), col("a"))
        .agg(sum(col("term")).as("s0"))
      sums
        .select(col("c"), col("a"), col("s0"),
          (pow(col("a"), col("c").cast("double")) /
            factorial(col("c").cast("int")).cast("double")).as("tc"),
          (col("a") / col("c").cast("double")).as("rho"))
        .filter(col("rho") < 1)
        .select(col("c"), round(col("a"), 4).as("offered_erlangs"),
          round(col("rho"), 4).as("rho"),
          round(col("tc") / ((lit(1.0) - col("rho")) * col("s0") +
            col("tc")), 6).as("p_wait"),
          round(col("tc") / ((lit(1.0) - col("rho")) * col("s0") +
            col("tc")) * lit(3.0) /
            (col("c").cast("double") - col("a")), 6).as("asa_minutes"))
        .orderBy(col("c"))
    }),

    "q316_esd_outliers" -> ((s, dir) => {
      // Generalized-ESD (Grubbs-iterated) outlier hunt on monthly
      // revenue: three unrolled rounds, each recomputing mean/sd from
      // exact integer-dollar moments, scoring R = max|v-mean|/sd and
      // removing the winner (values in exact integer kilodollars so
      // squares stay in long range at any SF). The month table is
      // calendar-bounded, so
      // every round is broadcast arithmetic; deviations are identical
      // float expressions on both engines, rounded before the argmax.
      val monthly = t(s, dir, "orders")
        .groupBy((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).cast("long").as("mid"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS " +
          "BIGINT)) div 100000 AS BIGINT)").as("v"))
      def esdRound(df: DataFrame, i: Int): (DataFrame, DataFrame) = {
        val st = df.agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("v") * col("v")).as("ss"))
        val scored = df.crossJoin(broadcast(st))
          .select(col("mid"), col("v"),
            round(abs(col("v") - col("s").cast("double") / col("n")) /
              sqrt((col("n") * col("ss") - col("s") * col("s"))
                .cast("double") /
                (col("n").cast("double") * (col("n") - 1))), 6)
              .as("r_stat"))
        val ranked = PrefixSum.globalRank(scored,
          Seq(col("r_stat").desc, col("mid")), "rk")
        (ranked.filter(col("rk") === 1)
          .select(lit(i.toLong).as("round"), col("mid").as("month_id"),
            col("v").as("value_kusd"), col("r_stat")),
          ranked.filter(col("rk") =!= 1).select(col("mid"), col("v")))
      }
      val (o1, r1) = esdRound(monthly, 1)
      val (o2, r2) = esdRound(r1, 2)
      val (o3, _) = esdRound(r2, 3)
      o1.unionAll(o2).unionAll(o3).orderBy(col("round"))
    }),

    "q317_quantile_norm" -> ((s, dir) => {
      // Quantile normalization (the batch-effect corrector): each
      // region's acctbal deciles are mapped onto the cross-region mean
      // decile curve; the report is the per-(region, decile) shift.
      // Per-region ranks come from the grouped two-phase prefix sum
      // over a synthesized unique order key (no region-sized window
      // task); decile picks are exact integer ranks.
      val geo = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("x"),
          col("c_custkey"))
        // unique in-group order key; custkey < 2^24 at these SFs
        .select(col("r_name"), col("x"),
          (col("x") * lit(16777216L) + col("c_custkey")).as("ok"))
      val ranked = PrefixSum.groupedRunningSum(
        geo.withColumn("one", lit(1L)), "r_name", "ok", col("one"), "rk")
      val nR = geo.groupBy(col("r_name")).agg(count(lit(1)).as("nr"))
      val cuts = ranked.join(broadcast(nR), Seq("r_name"))
        .join(broadcast(s.range(1, 10).select(col("id").as("d"))),
          col("rk") === expr("(d * nr) div 10"))
        .select(col("r_name"), col("d"), col("x"))
      val target = cuts.groupBy(col("d"))
        .agg((sum(col("x")).cast("double") / count(lit(1))).as("tgt"))
      cuts.join(broadcast(target), Seq("d"))
        .select(col("r_name"), col("d").as("decile"),
          round(col("x") / lit(100.0), 2).as("value_dollars"),
          round(col("tgt") / 100, 2).as("target_dollars"),
          round((col("x") - col("tgt")) / 100, 2).as("shift_dollars"))
        .orderBy(col("r_name"), col("decile"))
    }),

    "q318_order_reconciliation" -> ((s, dir) => {
      // Finance reconciliation audit: recompute each order's total from
      // its lines (extprice * (1-disc) * (1+tax), rounded to cents per
      // line) and diff against o_totalprice. One grouped pass; the
      // worst offender is picked by rounded relative gap with an
      // integer tie-break. The header-vs-detail mismatch census every
      // billing pipeline needs.
      val lines = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount) * " +
          "(1 + l_tax) * 100 + 0.5) AS BIGINT)")).as("calc"))
      val recon = t(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("stated"))
        .join(lines, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("stated"),
          (col("calc") - col("stated")).as("gap"),
          round(abs(col("calc") - col("stated")).cast("double") /
            col("stated"), 6).as("rel_gap"))
      val summary = recon.agg(count(lit(1)).as("n_orders"),
        sum(when(col("gap") === 0, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("rel_gap") > 0.01, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(abs(col("gap"))).as("total_abs_gap_cents"))
      val worst = PrefixSum.globalRank(recon,
          Seq(col("rel_gap").desc, col("o_orderkey")), "rk")
        .filter(col("rk") === 1)
        .select(col("o_orderkey").as("worst_orderkey"),
          col("rel_gap").as("worst_rel_gap"))
      summary.crossJoin(broadcast(worst))
    }),

    "q319_kruskal_wallis" -> ((s, dir) => {
      // Kruskal-Wallis k-sample rank test: do the five market segments
      // draw acctbal from one distribution? Tied average ranks stay
      // exact integers (ar2 = 2*cumBefore + cnt + 1) over the
      // value-grouped table, per-segment rank sums are one aggregate,
      // and the tie-corrected H with its closed-form df=4 chi-square
      // survival exp(-x/2)(1+x/2) is broadcast arithmetic. The prefix
      // sum is the two-phase ranker — no data-sized window task.
      val base = t(s, dir, "customer")
        .select(col("c_mktsegment").as("sg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
      val byVS = base.groupBy(col("v"), col("sg"))
        .agg(count(lit(1)).as("c"))
      val byV = byVS.groupBy(col("v")).agg(sum(col("c")).as("cv"))
        .withColumn("__g", lit(1))
      val cum = PrefixSum.groupedRunningSum(byV, "__g", "v", col("cv"),
          "run")
        .select(col("v"), col("cv"), (col("run") - col("cv")).as("bef"))
      val perSeg = byVS.join(cum, Seq("v"))
        .select(col("sg"), col("c"),
          (lit(2L) * col("bef") + col("cv") + lit(1L)).as("ar2"))
        .groupBy(col("sg"))
        .agg(sum(col("c")).as("n_g"), sum(col("c") * col("ar2")).as("r2"))
      val ties = cum.agg(
        sum(col("cv") * col("cv") * col("cv") - col("cv")).as("tc"))
      val stat = perSeg
        .agg(sum(col("n_g")).as("n"),
          sum(col("r2").cast("double") * col("r2") /
            (lit(4.0) * col("n_g"))).as("sr"))
        .crossJoin(broadcast(ties))
        .select(col("n").as("n_total"),
          ((lit(12.0) / (col("n").cast("double") * (col("n") + 1)) *
            col("sr") - lit(3.0) * (col("n") + 1)) /
            (lit(1.0) - col("tc").cast("double") /
              (col("n") * col("n") * col("n") - col("n")))).as("hc"))
        .select(col("n_total"), round(col("hc"), 4).as("h_tied"),
          round(exp(-col("hc") / 2) * (lit(1.0) + col("hc") / 2), 6)
            .as("p_value"))
      perSeg.crossJoin(broadcast(stat))
        .select(col("sg").as("segment"), col("n_g").as("n"),
          round(col("r2").cast("double") / (lit(2.0) * col("n_g")), 2)
            .as("mean_rank"),
          col("n_total"), col("h_tied"), col("p_value"))
        .orderBy(col("segment"))
    }),

    "q320_spatial_grid_join" -> ((s, dir) => {
      // Grid-bucketed spatial radius join — the scale-safe point-radius
      // pattern: deterministic LCG coordinates on a 1M x 1M integer
      // grid, cell id = coord div radius, the SMALL side (suppliers)
      // expanded to its 3x3 neighbor cells, equi-join on the cell id,
      // then an EXACT integer dx^2+dy^2 <= r^2 verify. No cross join at
      // any scale: the shuffle key is the cell, candidate volume is
      // bounded by local density, and the 9x expansion rides the
      // smaller side only.
      val r = 40000L
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("ck"),
          pmod(col("c_custkey") * 1103515245L + 12345L, lit(1000000L))
            .as("x"),
          pmod(col("c_custkey") * 69069L + 1L, lit(1000000L)).as("y"))
        .withColumn("cx", expr(s"x div $r"))
        .withColumn("cy", expr(s"y div $r"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey").as("sk"),
          pmod(col("s_suppkey") * 48271L + 99991L, lit(1000000L))
            .as("sx"),
          pmod(col("s_suppkey") * 16807L + 12347L, lit(1000000L))
            .as("sy"))
      val offs = s.range(-1, 2).select(col("id").as("dx"))
        .crossJoin(s.range(-1, 2).select(col("id").as("dy")))
      val supx = supp.crossJoin(broadcast(offs))
        .select(col("sk"), col("sx"), col("sy"),
          (expr(s"sx div $r") + col("dx")).as("cx"),
          (expr(s"sy div $r") + col("dy")).as("cy"))
      val pairs = cust.join(supx, Seq("cx", "cy"))
        .select(col("ck"), col("sk"),
          ((col("x") - col("sx")) * (col("x") - col("sx")) +
            (col("y") - col("sy")) * (col("y") - col("sy"))).as("d2"))
        .filter(col("d2") <= lit(r * r))
      val summary = pairs.agg(count(lit(1)).as("n_pairs"),
        round(avg(sqrt(col("d2").cast("double"))), 2).as("avg_dist"))
      PrefixSum.globalRank(pairs,
          Seq(col("d2"), col("ck"), col("sk")), "rk")
        .filter(col("rk") <= 5)
        .crossJoin(broadcast(summary))
        .select(col("rk").as("rank"), col("ck").as("custkey"),
          col("sk").as("suppkey"),
          round(sqrt(col("d2").cast("double")), 2).as("dist"),
          col("n_pairs"), col("avg_dist"))
        .orderBy(col("rank"))
    }),

    "q321_poisson_bootstrap" -> ((s, dir) => {
      // Poisson bootstrap — the bootstrap that scales: instead of
      // resampling passes, every row draws an independent Poisson(1)
      // weight per replicate (inverse CDF over a 31-bit LCG uniform
      // computed with exact integer arithmetic on both engines), so 200
      // replicates are one map-side explode + one partial-aggregating
      // pass; nothing data-sized is ever re-shuffled per replicate.
      // The replicate table is 200 bounded rows; the 95% CI is an exact
      // rank pick over it (u = m/2^31 is exact in double: power-of-two
      // denominator).
      val pois = "CASE WHEN u < 0.36787944117144233 THEN 0 " +
        "WHEN u < 0.7357588823428847 THEN 1 " +
        "WHEN u < 0.9196986029286058 THEN 2 " +
        "WHEN u < 0.9810118431238462 THEN 3 " +
        "WHEN u < 0.9963401531726563 THEN 4 " +
        "WHEN u < 0.9994058151824183 THEN 5 " +
        "WHEN u < 0.9999167588507119 THEN 6 " +
        "WHEN u < 0.9999897508033253 THEN 7 " +
        "WHEN u < 0.9999988805718283 THEN 8 ELSE 9 END"
      val base = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("cents"))
      val perRep = base
        .withColumn("rep", explode(expr("sequence(0, 199)")))
        .withColumn("u",
          pmod(col("k") * 1103515245L + col("rep") * 40503L + 12345L,
            lit(2147483648L)).cast("double") / lit(2.147483648e9))
        .withColumn("w", expr(pois).cast("long"))
        .groupBy(col("rep"))
        .agg(sum(col("w") * col("cents")).as("sw"),
          sum(col("w")).as("m"))
        .select(col("rep"),
          round(col("sw").cast("double") / col("m") / 100.0, 4)
            .as("mean_d"))
      // 200 bounded replicate rows: plain window is safe
      val ranked = perRep.withColumn("rk", row_number().over(
        Window.orderBy(col("mean_d"), col("rep"))).cast("long"))
      val lo = ranked.filter(col("rk") === 5)
        .select(col("mean_d").as("ci_lo_dollars"))
      val hi = ranked.filter(col("rk") === 196)
        .select(col("mean_d").as("ci_hi_dollars"))
      base.agg(count(lit(1)).as("n_orders"),
          round(sum(col("cents")).cast("double") / count(lit(1)) / 100.0,
            4).as("mean_dollars"))
        .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
    }),

    "q322_isotonic_pava" -> ((s, dir) => {
      // Isotonic regression (pool-adjacent-violators) of P(order has
      // >= 4 lines) on the order-value bin, via the exact minimax
      // identity g(k) = max_{i<=k} min_{j>=k} avg(i,j) over the 20-bin
      // table — the entire PAVA solve is bounded-grid arithmetic on
      // exact integer prefix sums; only the per-order line count ever
      // touches data-sized rows. The monotone fit is what a
      // score-calibration layer ships when raw bin rates zig-zag.
      val lines = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("nl"))
      val base = t(s, dir, "orders")
        .join(lines, col("o_orderkey") === col("l_orderkey"))
        .select(least(lit(19L),
            expr("CAST(floor(o_totalprice / 25000) AS BIGINT)")).as("b"),
          when(col("nl") >= 4, 1L).otherwise(0L).as("y"))
      val bins = base.groupBy(col("b"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("yy"))
      // 20 bounded bin rows: plain windows are safe
      val w = Window.orderBy(col("b"))
      val cum = bins.withColumn("cn", sum(col("n")).over(w))
        .withColumn("cy", sum(col("yy")).over(w))
      val pairs = cum.select(col("b").as("i"),
          (col("cn") - col("n")).as("bn"), (col("cy") - col("yy")).as("by"))
        .join(cum.select(col("b").as("j"), col("cn"), col("cy")),
          col("i") <= col("j"))
        .select(col("i"), col("j"),
          ((col("cy") - col("by")).cast("double") /
            (col("cn") - col("bn"))).as("a"))
      val iso = bins.select(col("b").as("k"))
        .join(pairs, col("i") <= col("k") && col("k") <= col("j"))
        .groupBy(col("k"), col("i")).agg(min(col("a")).as("ma"))
        .groupBy(col("k")).agg(max(col("ma")).as("g"))
      bins.join(iso, col("b") === col("k"))
        .select(col("b").as("bin"), col("n"), col("yy").as("events"),
          round(col("yy").cast("double") / col("n"), 4).as("raw_rate"),
          round(col("g"), 4).as("iso_rate"))
        .orderBy(col("bin"))
    }),

    "q323_durbin_watson" -> ((s, dir) => {
      // Durbin-Watson serial-correlation test on the residuals of the
      // daily-revenue-vs-time OLS line: slope/intercept from exact
      // integer moments (dollars x day index), residual lag over the
      // calendar-bounded day table, DW = sum (e_t - e_{t-1})^2 /
      // sum e_t^2 with rho ~ 1 - DW/2. The autocorrelation gauge every
      // trend regression should report before anyone trusts its SEs.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) " +
          "AS BIGINT)").as("rev"))
      // calendar-bounded day table: plain windows are safe
      val idx = daily.withColumn("tt",
        row_number().over(Window.orderBy(col("d"))).cast("long"))
      val mom = idx.agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
        sum(col("tt") * col("tt")).as("stt"), sum(col("rev")).as("sy"),
        sum(col("tt") * col("rev")).as("sty"))
        .select(col("n"),
          ((col("n") * col("sty") - col("st") * col("sy")).cast("double") /
            (col("n") * col("stt") - col("st") * col("st"))).as("beta"),
          col("st"), col("sy"))
        .select(col("n"), col("beta"),
          ((col("sy") - col("beta") * col("st")) / col("n").cast("double"))
            .as("alpha"))
      val resid = idx.crossJoin(broadcast(mom))
        .select(col("tt"), col("n"),
          (col("rev").cast("double") - col("alpha") -
            col("beta") * col("tt")).as("e"),
          col("beta"))
      val lagged = resid.withColumn("ep",
        lag(col("e"), 1).over(Window.orderBy(col("tt"))))
      lagged.agg(first(col("n")).as("n_days"),
          round(first(col("beta")), 2).as("slope_per_day"),
          (sum(when(col("ep").isNotNull,
            (col("e") - col("ep")) * (col("e") - col("ep")))
            .otherwise(0.0)) / sum(col("e") * col("e"))).as("dw"))
        .select(col("n_days"), col("slope_per_day"),
          round(col("dw"), 4).as("dw"),
          round(lit(1.0) - col("dw") / 2, 4).as("rho_lag1"))
    }),

    "q324_cochran_armitage" -> ((s, dir) => {
      // Cochran-Armitage trend test: does the fraction of fully-shipped
      // ('F') orders TREND across the five ordered priority levels?
      // Chi-square-on-the-grid ignores the ordering; CA weights each
      // level by its rank score and is the standard dose-response
      // screen. T* = N*sum(w*y) - Y*sum(w*n) stays exact integer; the
      // single z division happens once in double with fixed operand
      // order on both engines.
      val cat = t(s, dir, "orders")
        .select(expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)")
            .as("k"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_k"), sum(col("y")).as("y_k"))
      val stat = cat.agg(sum(col("n_k")).as("n"), sum(col("y_k")).as("yy"),
          sum(col("k") * col("n_k")).as("swn"),
          sum(col("k") * col("y_k")).as("swy"),
          sum(col("k") * col("k") * col("n_k")).as("swwn"))
        .select(col("n").as("n_total"),
          (col("n") * col("swy") - col("yy") * col("swn")).as("tstar"),
          (col("yy").cast("double") * (col("n") - col("yy")) *
            (col("n").cast("double") * col("swwn") -
              col("swn").cast("double") * col("swn"))).as("vstar"))
        .select(col("n_total"),
          round(col("tstar").cast("double") *
            sqrt(col("n_total").cast("double") / col("vstar")), 4)
            .as("z_trend"),
          round(col("tstar").cast("double") * col("tstar") *
            col("n_total") / col("vstar"), 4).as("z2"))
      cat.crossJoin(broadcast(stat))
        .select(col("k").as("priority"), col("n_k").as("n"),
          round(col("y_k").cast("double") / col("n_k"), 4).as("rate_f"),
          col("n_total"), col("z_trend"), col("z2"))
        .orderBy(col("priority"))
    }),

    "q325_ratio_delta" -> ((s, dir) => {
      // Delta-method CI for a RATIO metric (dollars per order at the
      // customer grain) — the experimentation-platform staple: naive
      // per-order SEs are wrong because orders cluster within
      // customers; the delta method propagates customer-level
      // (x, y) = (spend, orders) covariance into Var(sum x / sum y).
      // All six moments are exact integers per segment; the variance
      // assembly happens once in double with fixed operand order.
      val perCust = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("sg"), col("c_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("x"),
          count(lit(1)).as("y"))
      val mom = perCust.groupBy(col("sg"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      mom.select(col("sg"), col("n"),
          (col("sx").cast("double") / col("sy")).as("r"),
          ((col("n").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx")) /
            (col("n").cast("double") * (col("n") - 1))).as("vx"),
          ((col("n").cast("double") * col("syy") -
            col("sy").cast("double") * col("sy")) /
            (col("n").cast("double") * (col("n") - 1))).as("vy"),
          ((col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
            (col("n").cast("double") * (col("n") - 1))).as("cxy"),
          (col("sy").cast("double") / col("n")).as("muy"))
        .select(col("sg"), col("n"), col("r"),
          sqrt((col("vx") - lit(2.0) * col("r") * col("cxy") +
            col("r") * col("r") * col("vy")) /
            (col("n") * col("muy") * col("muy"))).as("se"))
        .select(col("sg").as("segment"), col("n").as("n_cust"),
          round(col("r"), 4).as("dollars_per_order"),
          round(col("se"), 4).as("se"),
          round(col("r") - lit(1.96) * col("se"), 4).as("ci_lo"),
          round(col("r") + lit(1.96) * col("se"), 4).as("ci_hi"))
        .orderBy(col("segment"))
    }),

    "q326_pettitt" -> ((s, dir) => {
      // Pettitt change-point test on daily revenue: U_t = 2*sum(r_i,
      // i<=t) - t(n+1) with tied AVERAGE ranks kept exact via the
      // 2x-scaled integer trick (ar2 = 2*cumBefore + cnt + 1, summed
      // once per day), K = max|U_t|, p = 2exp(-6K^2/(n^3+n^2)). The
      // day table is calendar-bounded so every window is safe; the
      // only data-sized pass is the daily aggregate.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) " +
          "AS BIGINT)").as("rev"))
      // calendar-bounded: plain windows safe below
      val byV = daily.groupBy(col("rev")).agg(count(lit(1)).as("cv"))
        .withColumn("bef",
          coalesce(sum(col("cv")).over(Window.orderBy(col("rev"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("rev"),
          (lit(2L) * col("bef") + col("cv") + lit(1L)).as("ar2"))
      val u = daily.join(byV, Seq("rev"))
        .withColumn("t", row_number().over(Window.orderBy(col("d")))
          .cast("long"))
        .withColumn("cum", sum(col("ar2")).over(Window.orderBy(col("d"))))
      val n = daily.agg(count(lit(1)).as("n"))
      val ut = u.crossJoin(broadcast(n))
        .filter(col("t") < col("n"))
        .select(col("d"), col("n"),
          (col("cum") - col("t") * (col("n") + 1)).as("u_t"))
      PrefixSum.globalRank(ut,
          Seq(abs(col("u_t")).desc, col("d")), "rk")
        .filter(col("rk") === 1)
        .select(col("n").as("n_days"),
          date_format(col("d"), "yyyy-MM-dd").as("change_date"),
          abs(col("u_t")).as("k_stat"),
          round(lit(2.0) * exp(lit(-6.0) * abs(col("u_t")).cast("double")
            * abs(col("u_t")) /
            (col("n").cast("double") * col("n") * col("n") +
              col("n").cast("double") * col("n"))), 6).as("p_value"))
    }),

    "q327_theil_decomposition" -> ((s, dir) => {
      // Theil-T inequality of customer spend, DECOMPOSED into between-
      // nation and within-nation parts — the additivity Gini lacks and
      // the reason Theil is the inequality-audit workhorse. Per-nation
      // T_g = sum(x ln x)/(X_g) - ln(mu_g) needs only three per-group
      // aggregates; the between term is bounded-grid arithmetic over
      // the 25 nation rows.
      val spend = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("x"))
        .filter(col("x") > 0)
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nat"), col("x"))
      val perNat = spend.groupBy(col("nat"))
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("xg"),
          sum(col("x").cast("double") * log(col("x").cast("double")))
            .as("xlx"))
        .select(col("nat"), col("ng"), col("xg"),
          (col("xlx") / col("xg") -
            log(col("xg").cast("double") / col("ng"))).as("tg"))
      val tot = perNat.agg(sum(col("ng")).as("n"), sum(col("xg")).as("xx"))
      val parts = perNat.crossJoin(broadcast(tot))
        .select(col("nat"), col("ng"), col("xg"), col("tg"),
          (col("xg").cast("double") / col("xx")).as("share"),
          ((col("xg").cast("double") / col("xx")) *
            log((col("xg").cast("double") / col("xx")) /
              (col("ng").cast("double") / col("n")))).as("btw_term"),
          ((col("xg").cast("double") / col("xx")) * col("tg"))
            .as("win_term"))
      val stat = parts.agg(
          round(sum(col("btw_term")), 6).as("theil_between"),
          round(sum(col("win_term")), 6).as("theil_within_total"))
        .select(col("theil_between"), col("theil_within_total"),
          round(col("theil_between") + col("theil_within_total"), 6)
            .as("theil_total"))
      parts.crossJoin(broadcast(stat))
        .select(col("nat").as("nation"), col("ng").as("n_cust"),
          round(col("share"), 4).as("spend_share"),
          round(col("tg"), 6).as("theil_within"),
          col("theil_between"), col("theil_within_total"),
          col("theil_total"))
        .orderBy(col("nation"))
    }),

    "q328_mcnemar" -> ((s, dir) => {
      // McNemar's paired test: did the population of ACTIVE customers
      // change between 1995 and 1996? The unit is the customer (its
      // two years are the matched pair), so only the DISCORDANT cells
      // b (active 95, quiet 96) and c (quiet 95, active 96) carry
      // information. Continuity-corrected chi2 = (|b-c|-1)^2/(b+c);
      // p via the A&S 7.1.26 erf polynomial at x = sqrt(stat/2)
      // (chi2 df=1 survival = 1 - erf(sqrt(x/2))). One grouped pass
      // over orders, then scalar arithmetic.
      val flags = t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(when(year(col("o_orderdate")) === 1995, 1L)
            .otherwise(0L)).as("a95"),
            sum(when(year(col("o_orderdate")) === 1996, 1L)
              .otherwise(0L)).as("a96")),
          col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("a95"), lit(0L)).as("a95"),
          coalesce(col("a96"), lit(0L)).as("a96"))
      val cells = flags.agg(count(lit(1)).as("n_cust"),
        sum(when(col("a95") > 0 && col("a96") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("a95") === 0 && col("a96") > 0, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("a95") > 0 && col("a96") > 0, 1L).otherwise(0L))
          .as("both_active"))
      val withStat = cells.withColumn("stat",
        (abs(col("b") - col("c")) - 1).cast("double") *
          (abs(col("b") - col("c")) - 1) / (col("b") + col("c")))
      val x = sqrt(col("stat") / 2)
      val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      withStat.select(col("n_cust"), col("b").as("lost_95"),
        col("c").as("gained_96"), col("both_active"),
        round(col("stat"), 4).as("chi2_cc"),
        round((lit(0.254829592) * tt - lit(0.284496736) * tt * tt +
          lit(1.421413741) * tt * tt * tt - lit(1.453152027) *
          tt * tt * tt * tt + lit(1.061405429) * tt * tt * tt * tt * tt) *
          exp(-x * x), 6).as("p_value"))
    }),

    "q329_cramer_von_mises" -> ((s, dir) => {
      // Two-sample Cramer-von-Mises on the ASIA-vs-EUROPE acctbal
      // fixture (the L2 companion to q302's L1 Wasserstein and q168's
      // sup-norm KS): T = nm/(n+m)^2 * sum over all N points of
      // (F_n - G_m)^2, computed over the value-grouped table with the
      // same exact-integer prefix-sum CDFs — (CA*m - CB*n)^2 squares
      // once in double, weighted by the value's multiplicity.
      val geo = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .select(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
          .as("v"), (col("r_name") === "ASIA").as("is_a"))
      val byVal = geo.groupBy(col("v"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
        .withColumn("__g", lit(1))
      val cum = PrefixSum.groupedRunningSum(
        PrefixSum.groupedRunningSum(byVal, "__g", "v", col("ca"), "cca"),
        "__g", "v", col("cb"), "ccb")
      val tot = byVal.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        .agg(first(col("na")).as("n_asia"), first(col("nb")).as("n_europe"),
          sum((col("cca").cast("double") * col("nb") -
            col("ccb").cast("double") * col("na")) *
            (col("cca").cast("double") * col("nb") -
              col("ccb").cast("double") * col("na")) *
            (col("ca") + col("cb"))).as("u"))
        .select(col("n_asia"), col("n_europe"),
          round(col("u") /
            (col("n_asia").cast("double") * col("n_europe")) /
            ((col("n_asia") + col("n_europe")).cast("double") *
              (col("n_asia") + col("n_europe"))), 6).as("t_stat"))
    }),

    "q330_haar_variance" -> ((s, dir) => {
      // Haar wavelet variance of daily revenue — the multi-resolution
      // energy split (which time scales carry the variation?) behind
      // scalogram anomaly detectors. For level j the detail energy is
      // sum over complete 2^j-day blocks of (S_left - S_right)^2 / 2^j
      // with S exact integer half-block sums; the day axis is
      // calendar-bounded so all eight levels are unions of tiny
      // aggregates over one shared daily table.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) " +
          "AS BIGINT)").as("rev"))
        // calendar-bounded: plain window safe
        .withColumn("t",
          (row_number().over(Window.orderBy(col("d"))) - 1).cast("long"))
        .persist()
      val nDays = daily.agg(count(lit(1)).as("nd"))
      val levels = (1 to 8).map { j =>
        val span = 1L << j
        val half = 1L << (j - 1)
        daily.crossJoin(broadcast(nDays))
          .filter(col("t") < expr(s"(nd div $span) * $span"))
          .groupBy(expr(s"t div $span").as("blk"))
          .agg(sum(when(pmod(col("t"), lit(span)) < half, col("rev"))
            .otherwise(0L)).as("sl"),
            sum(when(pmod(col("t"), lit(span)) >= half, col("rev"))
              .otherwise(0L)).as("sr"))
          .agg(count(lit(1)).as("n_blocks"),
            sum((col("sl") - col("sr")).cast("double") *
              (col("sl") - col("sr")) / span).as("energy"))
          .select(lit(j.toLong).as("level"), col("n_blocks"),
            col("energy"))
      }.reduce(_.unionAll(_))
      val totE = levels.agg(sum(col("energy")).as("te"))
      levels.crossJoin(broadcast(totE))
        .select(col("level"), col("n_blocks"),
          round(col("energy") / 1.0e6, 2).as("energy_musd2"),
          round(col("energy") / col("te"), 4).as("energy_share"))
        .orderBy(col("level"))
    }),

    "q331_caliper_matching" -> ((s, dir) => {
      // Nearest-neighbor caliper matching (with replacement) on a
      // balancing score — the observational-causal workhorse: every
      // BUILDING-segment customer is matched to its nearest
      // other-segment control within a $10 acctbal caliper, then ATT =
      // mean(treated spend - matched control spend). The 1-D analogue
      // of q320's grid join: bucket = score div caliper, the TREATED
      // side (the small one) expands to 3 neighbor buckets, candidates
      // equi-join on the bucket, argmin by exact integer
      // (|score diff|, control key) via one min(struct) aggregate — no
      // sort, no data-sized window, no cross join.
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("sp"))
      val cust = t(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey").as("ck"),
          (col("c_mktsegment") === "BUILDING").as("treated"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"),
          coalesce(col("sp"), lit(0L)).as("outcome"))
      val controls = cust.filter(!col("treated"))
        .select(expr("v div 1000").as("bk"), col("v").as("cv"),
          col("ck").as("cck"), col("outcome").as("cout"))
      val treated = cust.filter(col("treated"))
      val expanded = treated
        .crossJoin(broadcast(s.range(-1, 2).select(col("id").as("off"))))
        .select(col("ck"), col("v"), col("outcome"),
          (expr("v div 1000") + col("off")).as("bk"))
      val best = expanded.join(controls, Seq("bk"))
        .filter(abs(col("v") - col("cv")) <= 1000)
        .groupBy(col("ck"), col("v"), col("outcome"))
        .agg(min(struct(abs(col("v") - col("cv")).as("ad"),
          col("cck"), col("cout"))).as("m"))
        .select(col("ck"), col("outcome"),
          col("m.ad").as("ad"), col("m.cout").as("cout"))
      val nT = treated.agg(count(lit(1)).as("n_treated"))
      best.agg(count(lit(1)).as("n_matched"),
          round(avg((col("outcome") - col("cout")).cast("double")), 2)
            .as("att_dollars"),
          round(avg(col("ad").cast("double")) / 100, 4)
            .as("mean_score_gap_dollars"))
        .crossJoin(broadcast(nT))
        .select(col("n_treated"), col("n_matched"),
          round(col("n_matched").cast("double") / col("n_treated"), 4)
            .as("match_rate"),
          col("att_dollars"), col("mean_score_gap_dollars"))
    }),

    "q332_granger" -> ((s, dir) => {
      // 1-lag Granger causality between weekly EUROPE and ASIA revenue,
      // both directions: F-test of adding the other region's lag to the
      // own-lag AR(1). Weeks are exact integer day-diff buckets (no
      // engine-specific week-of-year), the regressor matrix lives on
      // the calendar-bounded week table, and the two-regressor solve is
      // the closed-form Cramer arithmetic over exact centered moments
      // (kilodollar units keep every long in range); only the final
      // determinant products run in double.
      val weekly = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(datediff(to_date(col("o_orderdate")),
            to_date(lit("1992-01-01"))).cast("long").as("wd"),
          col("r_name"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) " +
          "div 1000 AS BIGINT)").as("kd"))
        .groupBy(expr("wd div 7").as("w"))
        .agg(sum(when(col("r_name") === "ASIA", col("kd"))
          .otherwise(0L)).as("asia"),
          sum(when(col("r_name") === "EUROPE", col("kd"))
            .otherwise(0L)).as("europe"))
      // calendar-bounded week table: plain window safe
      val lagged = weekly
        .withColumn("asia_l", lag(col("asia"), 1)
          .over(Window.orderBy(col("w"))))
        .withColumn("europe_l", lag(col("europe"), 1)
          .over(Window.orderBy(col("w"))))
        .filter(col("asia_l").isNotNull)
      def granger(yc: String, ylc: String, xlc: String, dirn: String) = {
        val m = lagged.agg(count(lit(1)).as("n"),
          sum(col(yc)).as("sy"), sum(col(ylc)).as("su"),
          sum(col(xlc)).as("sv"),
          sum(col(ylc) * col(ylc)).as("suu"),
          sum(col(xlc) * col(xlc)).as("svv"),
          sum(col(ylc) * col(xlc)).as("suv"),
          sum(col(ylc) * col(yc)).as("suy"),
          sum(col(xlc) * col(yc)).as("svy"),
          sum(col(yc) * col(yc)).as("syy"))
        m.select(col("n"),
            (col("n") * col("suu") - col("su") * col("su")).as("cuu"),
            (col("n") * col("svv") - col("sv") * col("sv")).as("cvv"),
            (col("n") * col("suv") - col("su") * col("sv")).as("cuv"),
            (col("n") * col("suy") - col("su") * col("sy")).as("cuy"),
            (col("n") * col("svy") - col("sv") * col("sy")).as("cvy"),
            (col("n") * col("syy") - col("sy") * col("sy")).as("cyy"))
          .select(col("n"),
            ((col("cvv").cast("double") * col("cuy") -
              col("cuv").cast("double") * col("cvy")) /
              (col("cuu").cast("double") * col("cvv") -
                col("cuv").cast("double") * col("cuv"))).as("b"),
            ((col("cuu").cast("double") * col("cvy") -
              col("cuv").cast("double") * col("cuy")) /
              (col("cuu").cast("double") * col("cvv") -
                col("cuv").cast("double") * col("cuv"))).as("c"),
            col("cuy"), col("cvy"), col("cyy"), col("cuu"))
          .select(col("n"),
            lit(dirn).as("direction"), col("b"), col("c"),
            ((col("cyy") - col("b") * col("cuy") - col("c") * col("cvy"))
              / col("n").cast("double")).as("rss_u"),
            ((col("cyy") - col("cuy").cast("double") * col("cuy") /
              col("cuu")) / col("n").cast("double")).as("rss_r"))
          .select(col("direction"), col("n").as("n_weeks"),
            round(col("b"), 4).as("own_lag_coef"),
            round(col("c"), 4).as("cross_lag_coef"),
            round((col("rss_r") - col("rss_u")) /
              (col("rss_u") / (col("n") - 3)), 4).as("f_stat"))
      }
      granger("asia", "asia_l", "europe_l", "europe_to_asia")
        .unionAll(
          granger("europe", "europe_l", "asia_l", "asia_to_europe"))
        .orderBy(col("direction"))
    }),

    "q333_fellegi_sunter" -> ((s, dir) => {
      // Fellegi-Sunter probabilistic record linkage: candidate pairs
      // (key-blocked, bounded fan-out) are reduced to an agreement
      // PATTERN over three fields (nation, segment, balance within
      // $10), each pattern scored by the sum of log2(m/u) /
      // log2((1-m)/(1-u)) field weights. The u-probabilities are NOT
      // guessed: nation/segment come exactly from the marginal counts,
      // and the balance-band u from a 1-D bucket join over the
      // value-grouped table (the q320 pattern, so no O(N^2) pass).
      // Output is the 8-row pattern table every linkage engine ships.
      val cust = t(s, dir, "customer").select(col("c_custkey").as("ck"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
      val n = cust.agg(count(lit(1)).as("n"))
      val uNat = cust.groupBy(col("nat")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1)).as("agree"))
        .crossJoin(broadcast(n))
        .select((col("agree").cast("double") /
          (col("n").cast("double") * (col("n") - 1))).as("u_nat"))
      val uSeg = cust.groupBy(col("seg")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1)).as("agree"))
        .crossJoin(broadcast(n))
        .select((col("agree").cast("double") /
          (col("n").cast("double") * (col("n") - 1))).as("u_seg"))
      val vals = cust.groupBy(col("v")).agg(count(lit(1)).as("c"))
      val uBal = vals
        .crossJoin(broadcast(s.range(-1, 2).select(col("id").as("off"))))
        .select(col("v"), col("c"), (expr("v div 1000") + col("off"))
          .as("bk"))
        .join(vals.select(expr("v div 1000").as("bk"), col("v").as("w"),
          col("c").as("cw")), Seq("bk"))
        .filter(abs(col("v") - col("w")) <= 1000)
        .agg(sum(col("c") * col("cw")).as("inband"))
        .crossJoin(broadcast(n))
        .select(((col("inband") - col("n")).cast("double") /
          (col("n").cast("double") * (col("n") - 1))).as("u_bal"))
      val us = uNat.crossJoin(uSeg).crossJoin(uBal)
      val pairs = cust.withColumn("bk", expr("ck div 10"))
        .as("a")
        .join(cust.withColumn("bk", expr("ck div 10")).as("b"),
          col("a.bk") === col("b.bk") &&
            col("a.ck") < col("b.ck"))
        .select((col("a.nat") === col("b.nat")).as("na"),
          (col("a.seg") === col("b.seg")).as("sa"),
          (abs(col("a.v") - col("b.v")) <= 1000).as("ba"))
      val patterns = pairs.groupBy(col("na"), col("sa"), col("ba"))
        .agg(count(lit(1)).as("n_pairs"))
      def fw(agree: Column, m: Double, u: Column) =
        when(agree, log(lit(m) / u)).otherwise(
          log((lit(1.0) - m) / (lit(1.0) - u)))
      patterns.crossJoin(broadcast(us))
        .select(col("na").as("nation_agree"),
          col("sa").as("segment_agree"), col("ba").as("balance_agree"),
          col("n_pairs"),
          round(col("u_nat"), 6).as("u_nation"),
          round(col("u_bal"), 6).as("u_balance"),
          round(fw(col("na"), 0.95, col("u_nat")) +
            fw(col("sa"), 0.90, col("u_seg")) +
            fw(col("ba"), 0.85, col("u_bal")), 4).as("weight"))
        .withColumn("decision",
          when(col("weight") >= 4.0, "match")
            .when(col("weight") >= -2.0, "possible")
            .otherwise("non_match"))
        .orderBy(col("nation_agree"), col("segment_agree"),
          col("balance_agree"))
    }),

    "q334_dtw" -> ((s, dir) => {
      // Dynamic time warping between the 1995 and 1996 monthly revenue
      // curves — the shape-aware series distance. The 12x12 DP is
      // folded COLUMN BY COLUMN via the identity D(i,j) = CS_j(i) +
      // min_{k<=i}(E(k) - CS_j(k-1)) with E(k) = min(D(k,j-1),
      // D(k-1,j-1)): each of the 11 unrolled steps is two windows over
      // a 12-row frame, so the whole warp is bounded-grid arithmetic
      // in exact integer kilodollars; only the monthly aggregate
      // touches data-sized rows.
      def monthly(yr: Int, idx: String, v: String) =
        t(s, dir, "orders")
          .filter(year(col("o_orderdate")) === yr)
          .groupBy(month(col("o_orderdate")).cast("long").as(idx))
          .agg(expr("CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) " +
            "div 1000 AS BIGINT)").as(v))
      val cost = monthly(1995, "i", "va")
        .crossJoin(monthly(1996, "j", "vb"))
        .select(col("i"), col("j"),
          abs(col("va") - col("vb")).as("c"))
        .persist()
      // 12-row frames: plain windows safe throughout
      val w = Window.orderBy(col("i"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
      var d = cost.filter(col("j") === 1)
        .withColumn("d", sum(col("c")).over(wRun))
        .select(col("i"), col("d"))
      for (j <- 2 to 12) {
        val e = d.withColumn("dl", lag(col("d"), 1).over(w))
          .select(col("i"),
            least(col("d"), coalesce(col("dl"), col("d"))).as("e"))
        d = cost.filter(col("j") === j)
          .withColumn("cs", sum(col("c")).over(wRun))
          .join(e, Seq("i"))
          .withColumn("rm",
            min(col("e") - col("cs") + col("c")).over(wRun))
          .select(col("i"), (col("cs") + col("rm")).as("d"))
      }
      d.filter(col("i") === 12)
        .select(lit(12L).as("n_months"), col("d").as("dtw_kusd"))
    }),

    "q335_binary_segmentation" -> ((s, dir) => {
      // Binary segmentation, two rounds: the first split minimizes
      // total SSE of daily revenue (exact integer prefix sums S1/S2 in
      // kilodollars; only the per-candidate division runs in double,
      // rounded before the argmin), the second split re-scans BOTH
      // sides with the first boundary fixed. The classic multiple-
      // change-point scheme on top of one shared cumulative table —
      // day axis calendar-bounded, data touched once.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) " +
          "div 1000 AS BIGINT)").as("y"))
      // calendar-bounded: plain windows safe
      val w = Window.orderBy(col("d"))
      val cum = daily
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("s1", sum(col("y")).over(w))
        .withColumn("s2", sum(col("y") * col("y")).over(w))
        .persist()
      val tot = cum.agg(max(col("t")).as("n"), max(col("s1")).as("g1"),
        max(col("s2")).as("g2"))
      def seg(s2b: Column, s2a: Column, s1b: Column, s1a: Column,
              len: Column) =
        (s2b - s2a).cast("double") -
          (s1b - s1a).cast("double") * (s1b - s1a) / len
      val c1 = cum.crossJoin(broadcast(tot)).filter(col("t") < col("n"))
        .select(col("d"), col("t"), col("n"), col("g1"), col("g2"),
          round(seg(col("s2"), lit(0L), col("s1"), lit(0L), col("t")) +
            seg(col("g2"), col("s2"), col("g1"), col("s1"),
              col("n") - col("t")), 4).as("sse"))
      val best1 = PrefixSum.globalRank(c1, Seq(col("sse"), col("t")), "rk")
        .filter(col("rk") === 1)
        .select(col("t").as("t1"), col("d").as("d1"),
          col("sse").as("sse1"))
      val t1row = cum.join(broadcast(best1), col("t") === col("t1"))
        .select(col("t1"), col("s1").as("p1"), col("s2").as("p2"))
      val c2 = cum.crossJoin(broadcast(tot))
        .crossJoin(broadcast(t1row))
        .filter(col("t") < col("n") && col("t") =!= col("t1"))
        .select(col("d"), col("t"), col("t1"),
          round(when(col("t") < col("t1"),
            seg(col("s2"), lit(0L), col("s1"), lit(0L), col("t")) +
              seg(col("p2"), col("s2"), col("p1"), col("s1"),
                col("t1") - col("t")) +
              seg(col("g2"), col("p2"), col("g1"), col("p1"),
                col("n") - col("t1")))
          .otherwise(
            seg(col("p2"), lit(0L), col("p1"), lit(0L), col("t1")) +
              seg(col("s2"), col("p2"), col("s1"), col("p1"),
                col("t") - col("t1")) +
              seg(col("g2"), col("s2"), col("g1"), col("s1"),
                col("n") - col("t"))), 4).as("sse"))
      val best2 = PrefixSum.globalRank(c2, Seq(col("sse"), col("t")), "rk")
        .filter(col("rk") === 1)
        .select(col("t").as("t2"), col("d").as("d2"),
          col("sse").as("sse2"))
      val sse0 = tot.select(col("n"),
        round(seg(col("g2"), lit(0L), col("g1"), lit(0L), col("n")), 4)
          .as("sse0"))
      sse0.crossJoin(broadcast(best1)).crossJoin(broadcast(best2))
        .select(col("n").as("n_days"),
          date_format(least(col("d1"), col("d2")), "yyyy-MM-dd")
            .as("change_1"),
          date_format(greatest(col("d1"), col("d2")), "yyyy-MM-dd")
            .as("change_2"),
          col("sse0"), col("sse1"), col("sse2"),
          round(lit(1.0) - col("sse2") / col("sse0"), 6)
            .as("var_explained"))
    }),

    "q336_anova_f" -> ((s, dir) => {
      // One-way ANOVA F across the five market segments on acctbal —
      // the parametric companion to q319's Kruskal-Wallis. SSB/SSW
      // assemble from per-group exact integer moments (sum, sumsq,
      // count) in one partial-aggregating pass; eta^2 gives the effect
      // size and the df-4 chi-square survival of 4F the large-sample
      // p. Everything after the group aggregate is broadcast
      // arithmetic.
      val g = t(s, dir, "customer")
        .select(col("c_mktsegment").as("sg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
        .groupBy(col("sg"))
        .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg1"),
          sum(col("v") * col("v")).as("sg2"))
      val stat = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(col("sg1")).as("s1"), sum(col("sg2")).as("s2"),
          sum(col("sg1").cast("double") * col("sg1") / col("ng"))
            .as("sb"))
        .select(col("k"), col("n"),
          (col("sb") - col("s1").cast("double") * col("s1") / col("n"))
            .as("ssb"),
          (col("s2").cast("double") - col("sb")).as("ssw"))
        .select(col("k"), col("n"), col("ssb"), col("ssw"),
          ((col("ssb") / (col("k") - 1)) /
            (col("ssw") / (col("n") - col("k")))).as("f"))
      val x = col("f") * 4
      stat.select(col("n").as("n_cust"), col("k").as("k_groups"),
        round(col("f"), 4).as("f_stat"),
        round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta_sq"),
        round(exp(-x / 2) * (lit(1.0) + x / 2), 6).as("p_approx"))
    }),

    "q337_brown_forsythe" -> ((s, dir) => {
      // Brown-Forsythe variance-homogeneity test (Levene with MEDIAN
      // centers — robust to the heavy tails that wreck the plain
      // F-ratio): per-segment medians picked at the exact integer rank
      // (ng+1) div 2 via the grouped two-phase prefix sum, deviations
      // |v - med| stay exact integers, then the one-way ANOVA assembly
      // of q336 runs on the deviations. The gatekeeper to trusting any
      // pooled-variance test.
      val base = t(s, dir, "customer")
        .select(col("c_mktsegment").as("sg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"),
          col("c_custkey"))
        .select(col("sg"), col("v"),
          (col("v") * lit(16777216L) + col("c_custkey")).as("ok"))
      val ranked = PrefixSum.groupedRunningSum(
        base.withColumn("one", lit(1L)), "sg", "ok", col("one"), "rk")
      val ngs = base.groupBy(col("sg")).agg(count(lit(1)).as("ng"))
      val med = ranked.join(broadcast(ngs), Seq("sg"))
        .filter(col("rk") === expr("(ng + 1) div 2"))
        .select(col("sg"), col("v").as("med"))
      val g = base.join(broadcast(med), Seq("sg"))
        .select(col("sg"), abs(col("v") - col("med")).as("z"))
        .groupBy(col("sg"))
        .agg(count(lit(1)).as("ng"), sum(col("z")).as("sg1"),
          sum(col("z") * col("z")).as("sg2"))
      val stat = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(col("sg1")).as("s1"), sum(col("sg2")).as("s2"),
          sum(col("sg1").cast("double") * col("sg1") / col("ng"))
            .as("sb"))
        .select(col("k"), col("n"),
          (col("sb") - col("s1").cast("double") * col("s1") / col("n"))
            .as("ssb"),
          (col("s2").cast("double") - col("sb")).as("ssw"))
        .select(col("k"), col("n"),
          ((col("ssb") / (col("k") - 1)) /
            (col("ssw") / (col("n") - col("k")))).as("f"))
      val x = col("f") * 4
      stat.select(col("n").as("n_cust"), col("k").as("k_groups"),
        round(col("f"), 4).as("w_stat"),
        round(exp(-x / 2) * (lit(1.0) + x / 2), 6).as("p_approx"))
    }),

    "q338_tukey_hsd" -> ((s, dir) => {
      // Tukey HSD post-hoc: after q336's ANOVA says "segments differ",
      // WHICH pairs differ? The studentized-range q for all 10 segment
      // pairs from one set of per-group exact moments plus the pooled
      // MSE — the bounded 5x5 pair grid is broadcast arithmetic, and
      // the df=inf k=5 critical value 3.86 flags significance.
      val g = t(s, dir, "customer")
        .select(col("c_mktsegment").as("sg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
        .groupBy(col("sg"))
        .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg1"),
          sum(col("v") * col("v")).as("sg2"))
      val mse = g.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
          sum(col("sg2")).as("s2"),
          sum(col("sg1").cast("double") * col("sg1") / col("ng"))
            .as("sb"))
        .select(((col("s2").cast("double") - col("sb")) /
          (col("n") - col("k")).cast("double")).as("mse"))
      g.select(col("sg").as("seg_a"), col("ng").as("na"),
          (col("sg1").cast("double") / col("ng")).as("ma"))
        .join(g.select(col("sg").as("seg_b"), col("ng").as("nb"),
          (col("sg1").cast("double") / col("ng")).as("mb")),
          col("seg_a") < col("seg_b"))
        .crossJoin(broadcast(mse))
        .select(col("seg_a"), col("seg_b"),
          round((col("ma") - col("mb")) / 100, 2).as("mean_diff_dollars"),
          round((col("ma") - col("mb")) /
            sqrt(col("mse") / 2 *
              (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4)
            .as("q_stat"))
        .withColumn("significant", abs(col("q_stat")) > 3.86)
        .orderBy(col("seg_a"), col("seg_b"))
    }),

    "q339_bland_altman" -> ((s, dir) => {
      // Bland-Altman agreement between the stated order total and the
      // line-rebuilt total (q318's reconciliation fixture, asked the
      // method-comparison way): bias = mean difference, 95% limits of
      // agreement = bias +/- 1.96 sd, and the share of orders outside
      // their own limits. Moments are exact integer cents in one
      // grouped pass; the limits comparison re-uses the same frame.
      val diffs = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount) * " +
          "(1 + l_tax) * 100 + 0.5) AS BIGINT)")).as("calc"))
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("stated")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("calc") - col("stated")).as("diff"))
      // diff^2 can pass 2^63 at scale: accumulate the square sum as
      // DECIMAL(38,0) (exact, overflow-free) and go double only once
      val mom = diffs.agg(count(lit(1)).as("n"), sum(col("diff")).as("s1"),
          sum(col("diff").cast("decimal(19,0)") *
            col("diff").cast("decimal(19,0)")).as("s2"))
        .select(col("n"),
          (col("s1").cast("double") / col("n")).as("bias"),
          sqrt((col("n").cast("double") * col("s2").cast("double") -
            col("s1").cast("double") * col("s1")) /
            (col("n").cast("double") * (col("n") - 1))).as("sd"))
      diffs.crossJoin(broadcast(mom))
        .agg(first(col("n")).as("n_orders"),
          round(first(col("bias")), 4).as("bias_cents"),
          round(first(col("bias")) - lit(1.96) * first(col("sd")), 4)
            .as("loa_lo_cents"),
          round(first(col("bias")) + lit(1.96) * first(col("sd")), 4)
            .as("loa_hi_cents"),
          round(avg(when(col("diff") < col("bias") - lit(1.96) * col("sd"),
            1.0).when(col("diff") > col("bias") + lit(1.96) * col("sd"),
            1.0).otherwise(0.0)), 6).as("frac_outside"))
    }),

    "q340_markov_attribution" -> ((s, dir) => {
      // Markov removal-effect attribution — the data-driven multi-touch
      // model (vs q203's positional rules): user journeys up to first
      // purchase become a 6-state transition matrix, conversion
      // probability from 'start' is solved by a 20-step fixed-point
      // fold, and each channel's credit is how much conversion DROPS
      // when its state is redirected to 'null'. All five scenarios
      // (base + 4 removals) ride ONE bounded wide frame (5 rows x 25
      // prob columns) whose iteration is pure fixed-operand-order
      // column arithmetic — deterministic on both engines; only the
      // journey extraction touches data-sized rows (per-user windows,
      // bounded by activity).
      val chans = Seq("click", "view", "signup", "error")
      val ev = events(s, dir).select(col("user_id"),
        col("event_type").as("et"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      val minp = ev.filter(col("et") === "purchase")
        .groupBy(col("user_id")).agg(min(col("us")).as("mp"))
      val touches = ev.join(minp, Seq("user_id"), "left")
        .filter(col("et") =!= "purchase" &&
          (col("mp").isNull || col("us") < col("mp")))
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val seq0 = touches
        .withColumn("rn", row_number().over(wU).cast("long"))
        .withColumn("nt",
          count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .withColumn("nx", lead(col("et"), 1).over(wU))
        .withColumn("conv", col("mp").isNotNull)
      val trans = seq0.filter(col("rn") === 1)
          .select(lit("start").as("f"), col("et").as("tt"))
        .unionAll(seq0.filter(col("nx").isNotNull)
          .select(col("et").as("f"), col("nx").as("tt")))
        .unionAll(seq0.filter(col("rn") === col("nt"))
          .select(col("et").as("f"),
            when(col("conv"), "conv").otherwise("null").as("tt")))
        .unionAll(minp.join(touches.select(col("user_id")).distinct(),
            Seq("user_id"), "left_anti")
          .select(lit("start").as("f"), lit("conv").as("tt")))
        .groupBy(col("f"), col("tt")).agg(count(lit(1)).as("c"))
      val probs = trans
        .join(trans.groupBy(col("f")).agg(sum(col("c")).as("tot")),
          Seq("f"))
        .select(col("f"), col("tt"),
          (col("c").cast("double") / col("tot")).as("p"))
      val scens = ("base" +: chans)
        .map(c => s.range(1).select(lit(c).as("scen")))
        .reduce(_.unionAll(_))
      val redirected = scens.crossJoin(probs)
        .select(col("scen"), col("f"),
          when(col("tt") === col("scen"), "null").otherwise(col("tt"))
            .as("tt"), col("p"))
      val froms = "start" +: chans
      val tos = chans :+ "conv"
      val aggs = froms.flatMap(f => tos.map(tt =>
        sum(when(col("f") === f && col("tt") === tt, col("p"))
          .otherwise(0.0)).as(s"t_${f}_$tt")))
      var cur = redirected.groupBy(col("scen"))
        .agg(aggs.head, aggs.tail: _*)
      chans.foreach(c => cur = cur.withColumn(s"p_$c", lit(0.0)))
      for (_ <- 1 to 20) {
        val keep = col("scen") +:
          froms.flatMap(f => tos.map(tt => col(s"t_${f}_$tt")))
        val ps = chans.map { c =>
          chans.foldLeft(col(s"t_${c}_conv"))((acc, d) =>
            acc + col(s"t_${c}_$d") * col(s"p_$d")).as(s"p_$c")
        }
        cur = cur.select(keep ++ ps: _*)
      }
      val fin = cur.select(col("scen"),
        chans.foldLeft(col("t_start_conv"))((acc, d) =>
          acc + col(s"t_start_$d") * col(s"p_$d")).as("p_start"))
      val wideF = fin.groupBy()
        .agg(sum(when(col("scen") === "base", col("p_start"))
          .otherwise(0.0)).as("p_base"),
          chans.map(c => sum(when(col("scen") === c, col("p_start"))
            .otherwise(0.0)).as(s"p_rm_$c")): _*)
      val withRe = chans.foldLeft(wideF)((df, c) =>
        df.withColumn(s"re_$c",
          (col("p_base") - col(s"p_rm_$c")) / col("p_base")))
      val nJ = ev.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_journeys"))
      withRe
        .withColumn("re_sum", chans.map(c => col(s"re_$c"))
          .reduce(_ + _))
        .crossJoin(broadcast(nJ))
        .select(Seq(col("n_journeys"),
          round(col("p_base"), 6).as("base_cvr")) ++
          chans.map(c => round(col(s"re_$c"), 6).as(s"re_$c")) ++
          chans.map(c => round(col(s"re_$c") / col("re_sum"), 6)
            .as(s"share_$c")): _*)
    }),

    "q341_qini_uplift" -> ((s, dir) => {
      // Qini curve + coefficient — the uplift-model report card:
      // customers ranked by the targeting score (acctbal, descending
      // exact global rank), split into deciles, with the incremental
      // conversions cyt - cyc*cnt/cnc accumulated down the ranking
      // against the random-targeting diagonal. Counts stay exact
      // integers through the cumulative table; the trapezoid area runs
      // over 10 bounded rows in rank order on both engines.
      val y96 = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey")).distinct()
      val base = t(s, dir, "customer")
        .join(y96, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey").as("ck"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"),
          (col("c_custkey") % 2 === 0).as("tr"),
          when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("y"))
      val n = base.agg(count(lit(1)).as("n"))
      val dec = PrefixSum.globalRank(base,
          Seq(col("v").desc, col("ck")), "rk")
        .crossJoin(broadcast(n))
        .select(expr("CAST(1 + ((rk - 1) * 10) div n AS BIGINT)")
          .as("decile"), col("tr"), col("y"), col("n"))
      val per = dec.groupBy(col("decile"))
        .agg(first(col("n")).as("n"),
          sum(when(col("tr"), 1L).otherwise(0L)).as("nt"),
          sum(when(!col("tr"), 1L).otherwise(0L)).as("nc"),
          sum(when(col("tr"), col("y")).otherwise(0L)).as("yt"),
          sum(when(!col("tr"), col("y")).otherwise(0L)).as("yc"))
      // 10 bounded decile rows: plain windows safe
      val w = Window.orderBy(col("decile"))
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val cum = per
        .withColumn("cnt", sum(col("nt")).over(w))
        .withColumn("cnc", sum(col("nc")).over(w))
        .withColumn("cyt", sum(col("yt")).over(w))
        .withColumn("cyc", sum(col("yc")).over(w))
        .withColumn("qini", col("cyt").cast("double") -
          col("cyc").cast("double") * col("cnt") / col("cnc"))
        .withColumn("x", (col("cnt") + col("cnc")).cast("double") /
          col("n"))
      val curve = cum
        .withColumn("ql", coalesce(lag(col("qini"), 1).over(w), lit(0.0)))
        .withColumn("xl", coalesce(lag(col("x"), 1).over(w), lit(0.0)))
        .withColumn("contrib",
          (col("qini") + col("ql")) / 2 * (col("x") - col("xl")))
        .withColumn("area", sum(col("contrib")).over(wAll))
        .withColumn("u_total",
          sum(when(col("decile") === 10, col("qini")).otherwise(0.0))
            .over(wAll))
      curve.select(col("decile"), col("nt").as("n_t"),
          col("nc").as("n_c"), col("yt").as("y_t"), col("yc").as("y_c"),
          round(col("qini"), 4).as("qini_k"),
          round(col("area"), 4).as("qini_area"),
          round(col("area") - col("u_total") / 2, 4).as("qini_coef"))
        .orderBy(col("decile"))
    }),

    "q342_friedman" -> ((s, dir) => {
      // Friedman test on the complete nation x segment block design
      // (cell value = total acctbal cents, absent cells exactly 0):
      // within-block tied AVERAGE ranks via pair counting over the
      // bounded 5-cell blocks (ar2 = 2*less + eq + 1 stays integer),
      // chi2_F = 12/(bk(k+1)) * sum R_j^2 - 3b(k+1) on the halved rank
      // sums, df=4 survival in closed form. The repeated-measures
      // answer to q319's independent-samples Kruskal-Wallis.
      val segs = t(s, dir, "customer").select(col("c_mktsegment"))
        .distinct().select(col("c_mktsegment").as("seg"))
      val grid = t(s, dir, "nation")
        .select(col("n_nationkey").as("nk")).crossJoin(broadcast(segs))
      val sums = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"))
        .agg(sum(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"))
          .as("sv"))
      val cells = grid.join(sums, Seq("nk", "seg"), "left")
        .select(col("nk"), col("seg"), coalesce(col("sv"), lit(0L))
          .as("v"))
      val ranked = cells.as("a")
        .join(cells.as("b"), col("a.nk") === col("b.nk"))
        .groupBy(col("a.nk").as("nk"), col("a.seg").as("seg"))
        .agg((lit(2L) * sum(when(col("b.v") < col("a.v"), 1L)
          .otherwise(0L)) +
          sum(when(col("b.v") === col("a.v"), 1L).otherwise(0L)) + 1L)
          .as("ar2"))
      val perSeg = ranked.groupBy(col("seg"))
        .agg(sum(col("ar2")).as("r2"))
      val bk = cells.agg(
        countDistinct(col("nk")).as("b"),
        countDistinct(col("seg")).as("k"))
      val stat = perSeg.agg(sum(col("r2") * col("r2")).as("sr2"))
        .crossJoin(broadcast(bk))
        .select(col("b"), col("k"),
          (lit(12.0) / (col("b").cast("double") * col("k") *
            (col("k") + 1)) * (col("sr2").cast("double") / 4) -
            lit(3.0) * col("b") * (col("k") + 1)).as("chi2"))
        .select(col("b").as("n_blocks"), col("k").as("k_treatments"),
          round(col("chi2"), 4).as("chi2_f"),
          round(exp(-col("chi2") / 2) * (lit(1.0) + col("chi2") / 2), 6)
            .as("p_value"))
      perSeg.crossJoin(broadcast(stat))
        .select(col("seg").as("segment"),
          round(col("r2").cast("double") /
            (lit(2.0) * col("n_blocks")), 2).as("mean_rank"),
          col("n_blocks"), col("k_treatments"), col("chi2_f"),
          col("p_value"))
        .orderBy(col("segment"))
    }),

    "q343_smd_balance" -> ((s, dir) => {
      // Covariate-balance audit (the "love plot" table) for q331's
      // caliper matching: standardized mean differences of acctbal,
      // order count and spend between BUILDING-segment customers and
      // controls, BEFORE matching (raw populations) and AFTER (matched
      // pairs, with replacement). All moments are exact integers; the
      // matching core is the same bucket join + min(struct) argmin.
      // SMD < 0.1 after matching is the standard pass bar.
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("sp"),
          count(lit(1)).as("no"))
      val cust = t(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey").as("ck"),
          (col("c_mktsegment") === "BUILDING").as("treated"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"),
          coalesce(col("sp"), lit(0L)).as("x_spend"),
          coalesce(col("no"), lit(0L)).as("x_orders"))
      val controls = cust.filter(!col("treated"))
        .select(expr("v div 1000").as("bk"), col("v").as("cv"),
          col("ck").as("cck"), col("x_spend").as("c_spend"),
          col("x_orders").as("c_orders"))
      val matched = cust.filter(col("treated"))
        .crossJoin(broadcast(s.range(-1, 2).select(col("id").as("off"))))
        .select(col("ck"), col("v"), col("x_spend"), col("x_orders"),
          (expr("v div 1000") + col("off")).as("bk"))
        .join(controls, Seq("bk"))
        .filter(abs(col("v") - col("cv")) <= 1000)
        .groupBy(col("ck"), col("v"), col("x_spend"), col("x_orders"))
        .agg(min(struct(abs(col("v") - col("cv")).as("ad"), col("cck"),
          col("cv").as("mcv"), col("c_spend").as("mcs"),
          col("c_orders").as("mco"))).as("m"))
      def mom(df: DataFrame, c: Column, pre: String) =
        df.agg(count(lit(1)).as(s"${pre}_n"), sum(c).as(s"${pre}_s1"),
          sum(c.cast("decimal(19,0)") * c.cast("decimal(19,0)"))
            .as(s"${pre}_s2"))
      def smd(tn: Column, ts1: Column, ts2: Column,
              cn: Column, cs1: Column, cs2: Column) = {
        val mt = ts1.cast("double") / tn
        val mc = cs1.cast("double") / cn
        val vt = (tn.cast("double") * ts2.cast("double") -
          ts1.cast("double") * ts1) / (tn.cast("double") * (tn - 1))
        val vc = (cn.cast("double") * cs2.cast("double") -
          cs1.cast("double") * cs1) / (cn.cast("double") * (cn - 1))
        (mt - mc) / sqrt((vt + vc) / 2)
      }
      val tAll = cust.filter(col("treated"))
      val cAll = cust.filter(!col("treated"))
      val wide = Seq(
        ("acctbal", col("v"), col("m.mcv")),
        ("orders", col("x_orders"), col("m.mco")),
        ("spend", col("x_spend"), col("m.mcs"))).map { case (nm, rc, mc) =>
        mom(tAll, rc, "tb").crossJoin(mom(cAll, rc, "cb"))
          .crossJoin(mom(matched, rc, "ta"))
          .crossJoin(mom(matched, mc, "ca"))
          .select(lit(nm).as("covariate"),
            round(smd(col("tb_n"), col("tb_s1"), col("tb_s2"),
              col("cb_n"), col("cb_s1"), col("cb_s2")), 4)
              .as("smd_before"),
            round(smd(col("ta_n"), col("ta_s1"), col("ta_s2"),
              col("ca_n"), col("ca_s1"), col("ca_s2")), 4)
              .as("smd_after"))
      }.reduce(_.unionAll(_))
      wide.select(col("covariate"), col("smd_before"), col("smd_after"),
          round(lit(1.0) - abs(col("smd_after")) / abs(col("smd_before")),
            4).as("reduction"))
        .orderBy(col("covariate"))
    }),

    "q344_process_capability" -> ((s, dir) => {
      // Process-capability indices Cp/Cpk on the order-reconciliation
      // gap (q339's fixture) against a +/-$1.00 spec: the
      // manufacturing-quality lens on a billing pipeline. Moments are
      // exact (decimal square sum), the normal out-of-spec prediction
      // uses the A&S 7.1.26 erf polynomial, and observed ppm is an
      // exact integer count.
      val diffs = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount) * " +
          "(1 + l_tax) * 100 + 0.5) AS BIGINT)")).as("calc"))
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("stated")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("calc") - col("stated")).as("diff"))
      val lim = 100.0
      val mom = diffs.agg(count(lit(1)).as("n"), sum(col("diff")).as("s1"),
          sum(col("diff").cast("decimal(19,0)") *
            col("diff").cast("decimal(19,0)")).as("s2"),
          sum(when(abs(col("diff")) > lim, 1L).otherwise(0L)).as("oos"))
        .select(col("n"), col("oos"),
          (col("s1").cast("double") / col("n")).as("mu"),
          sqrt((col("n").cast("double") * col("s2").cast("double") -
            col("s1").cast("double") * col("s1")) /
            (col("n").cast("double") * (col("n") - 1))).as("sd"))
      def phiTail(z: Column) = {
        // upper-tail 1 - Phi(z) for z >= 0 via A&S erf polynomial
        val x = z / math.sqrt(2.0)
        val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
        (lit(0.254829592) * tt - lit(0.284496736) * tt * tt +
          lit(1.421413741) * tt * tt * tt - lit(1.453152027) *
          tt * tt * tt * tt + lit(1.061405429) * tt * tt * tt * tt * tt) *
          exp(-x * x) / 2
      }
      mom.select(col("n").as("n_orders"),
        round(col("mu"), 4).as("mean_gap_cents"),
        round(col("sd"), 4).as("sd_cents"),
        round(lit(2 * lim) / (col("sd") * 6), 4).as("cp"),
        round(least(lit(lim) - col("mu"), col("mu") + lim) /
          (col("sd") * 3), 4).as("cpk"),
        round(col("oos").cast("double") / col("n") * 1e6, 2)
          .as("ppm_observed"),
        round((phiTail((lit(lim) - col("mu")) / col("sd")) +
          phiTail((col("mu") + lim) / col("sd"))) * 1e6, 2)
          .as("ppm_normal_pred"))
    }),

    "q345_wald_sprt" -> ((s, dir) => {
      // Wald sequential probability ratio test replayed over the daily
      // order stream: H0 p=0.32 vs H1 p=0.34 on the fully-shipped
      // share, alpha = beta = 0.05. The log-likelihood-ratio walk is a
      // prefix sum over the calendar-bounded day table; the verdict is
      // the FIRST day the walk leaves (ln(0.05/0.95), ln(19)) — the
      // always-valid early-stopping monitor dashboards pretend to be.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("nd"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("x"))
      // calendar-bounded: plain window safe
      val llr = daily
        .withColumn("inc",
          col("x") * math.log(0.34 / 0.32) +
            (col("nd") - col("x")) * math.log(0.66 / 0.68))
        .withColumn("cum", sum(col("inc")).over(Window.orderBy(col("d"))))
      val a = math.log(0.95 / 0.05)
      val b = math.log(0.05 / 0.95)
      val ends = llr.agg(count(lit(1)).as("n_days"),
        min(when(col("cum") >= a, col("d"))).as("d_up"),
        min(when(col("cum") <= b, col("d"))).as("d_dn"),
        round(sum(col("inc")), 4).as("llr_final"))
      ends.select(col("n_days"),
        date_format(col("d_up"), "yyyy-MM-dd").as("first_h1_cross"),
        date_format(col("d_dn"), "yyyy-MM-dd").as("first_h0_cross"),
        when(col("d_up").isNull && col("d_dn").isNull, "continue")
          .when(col("d_dn").isNull || (col("d_up").isNotNull &&
            col("d_up") < col("d_dn")), "accept_h1")
          .otherwise("accept_h0").as("decision"),
        col("llr_final"))
    }),

    "q346_cindex" -> ((s, dir) => {
      // Harrell's concordance index for "order frequency predicts
      // churn survival" on q177's lifespan fixture — WITHOUT pair
      // enumeration: units collapse to the (duration x score) grid
      // (calendar-bounded x activity-bounded), per-score suffix counts
      // over duration give "outlived" tallies, a bounded prefix along
      // the score axis splits them into concordant / tied / discordant,
      // and every pair count stays an exact integer product until the
      // final division. The survival-model AUC, at any corpus size.
      val maxD = t(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
      val units = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first"),
          max(col("o_orderdate")).as("last"), count(lit(1)).as("no"))
        .crossJoin(broadcast(maxD))
        .select(datediff(col("last"), col("first")).cast("long")
            .as("dur"),
          (datediff(col("mx"), col("last")) > 90).as("event"),
          least(col("no"), lit(60L)).as("sc"))
      val cells = units.groupBy(col("dur"), col("sc"))
        .agg(count(lit(1)).as("c_all"),
          sum(when(col("event"), 1L).otherwise(0L)).as("d_ev"))
      val grid = cells.select(col("dur")).distinct()
        .crossJoin(cells.select(col("sc")).distinct())
        .join(cells, Seq("dur", "sc"), "left")
        .select(col("dur"), col("sc"),
          coalesce(col("c_all"), lit(0L)).as("cnt"),
          coalesce(col("d_ev"), lit(0L)).as("d_ev"))
      val scTot = grid.groupBy(col("sc")).agg(sum(col("cnt")).as("tot"))
      val withSuf = PrefixSum.groupedRunningSum(grid, "sc", "dur",
          col("cnt"), "run")
        .join(broadcast(scTot), Seq("sc"))
        .withColumn("s_gt", col("tot") - col("run"))
      // score axis bounded (<=60 values): per-dur window safe
      val wSc = Window.partitionBy(col("dur")).orderBy(col("sc"))
      val split = withSuf
        .withColumn("p_lt", coalesce(sum(col("s_gt")).over(
          wSc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("t_all", sum(col("s_gt")).over(
          wSc.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      split.filter(col("d_ev") > 0)
        .agg(sum(col("d_ev") *
            (col("t_all") - col("p_lt") - col("s_gt"))).as("conc"),
          sum(col("d_ev") * col("s_gt")).as("tied"),
          sum(col("d_ev") * col("p_lt")).as("disc"),
          sum(col("d_ev") * col("t_all")).as("comparable"))
        .select(col("conc"), col("tied"), col("disc"), col("comparable"),
          round((col("conc").cast("double") +
            lit(0.5) * col("tied")) / col("comparable"), 6).as("c_index"))
    }),

    "q347_tost_equivalence" -> ((s, dir) => {
      // TOST equivalence test: are BUILDING and MACHINERY mean order
      // values equivalent within +/-$5000? Two one-sided z tests
      // against the margins — the regulatory-grade way to CLAIM "no
      // difference" (a big p on a t-test never does). Exact integer
      // dollar moments per segment; the A&S erf polynomial turns each
      // z into its one-sided p; verdict at alpha 0.05.
      val g = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select((col("c_mktsegment") === "BUILDING").as("is_a"),
          expr("CAST(floor(o_totalprice) AS BIGINT)").as("v"))
        .groupBy(col("is_a"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
          sum(col("v") * col("v")).as("s2"))
      val wide = g.agg(
        sum(when(col("is_a"), col("n")).otherwise(0L)).as("na"),
        sum(when(col("is_a"), col("s1")).otherwise(0L)).as("sa1"),
        sum(when(col("is_a"), col("s2")).otherwise(0L)).as("sa2"),
        sum(when(!col("is_a"), col("n")).otherwise(0L)).as("nb"),
        sum(when(!col("is_a"), col("s1")).otherwise(0L)).as("sb1"),
        sum(when(!col("is_a"), col("s2")).otherwise(0L)).as("sb2"))
      def v(n: Column, s1: Column, s2: Column) =
        (n.cast("double") * s2.cast("double") -
          s1.cast("double") * s1) / (n.cast("double") * (n - 1))
      val base = wide.select(col("na"), col("nb"),
          (col("sa1").cast("double") / col("na") -
            col("sb1").cast("double") / col("nb")).as("diff"),
          sqrt(v(col("na"), col("sa1"), col("sa2")) / col("na") +
            v(col("nb"), col("sb1"), col("sb2")) / col("nb")).as("se"))
      def pUpper(z: Column) = {
        // one-sided upper-tail p for a NEGATIVE-or-any z: 1 - Phi(z)
        // computed as erfc-half via A&S on |z|, reflected for z < 0
        val x = abs(z) / math.sqrt(2.0)
        val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
        val half = (lit(0.254829592) * tt - lit(0.284496736) * tt * tt +
          lit(1.421413741) * tt * tt * tt - lit(1.453152027) *
          tt * tt * tt * tt + lit(1.061405429) * tt * tt * tt * tt * tt) *
          exp(-x * x) / 2
        when(z >= 0, half).otherwise(lit(1.0) - half)
      }
      val margin = 5000.0
      base.select(col("na").as("n_building"), col("nb").as("n_machinery"),
          round(col("diff"), 2).as("diff_dollars"),
          round(col("se"), 2).as("se"),
          round(pUpper((col("diff") + margin) / col("se")), 6)
            .as("p_lower"),
          round(pUpper((lit(margin) - col("diff")) / col("se")), 6)
            .as("p_upper"))
        .withColumn("p_tost", greatest(col("p_lower"), col("p_upper")))
        .withColumn("equivalent", col("p_tost") < 0.05)
    }),

    "q348_rmst" -> ((s, dir) => {
      // Restricted mean survival time at tau = 365 days over q177's
      // Kaplan-Meier churn curve: the area under S(t) up to tau — the
      // "average retained days in year one" number execs actually want
      // from a survival model. Step integration over the bounded
      // event-time table: width x S(previous step), plus the tail
      // rectangle to tau; S is the same exact-ratio product-limit
      // prefix.
      val maxD = t(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
      val cust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first"),
          max(col("o_orderdate")).as("last"))
        .crossJoin(broadcast(maxD))
        .select(datediff(col("last"), col("first")).cast("long")
          .as("dur"),
          (datediff(col("mx"), col("last")) > 90).as("event"))
      val byDur = cust.groupBy(col("dur"))
        .agg(count(lit(1)).as("c_all"),
          sum(when(col("event"), 1L).otherwise(0L)).as("d_events"))
      val tot = byDur.agg(sum(col("c_all")).as("n_total"))
      val risk = PrefixSum.groupedRunningSum(
          byDur.withColumn("__g", lit(1)), "__g", "dur", col("c_all"),
          "cum_all")
        .crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_total") - (col("cum_all") - col("c_all")))
      val w = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val surv = risk
        .filter(col("d_events") > 0 && col("n_risk") > col("d_events"))
        .withColumn("s", exp(sum(log(
          (col("n_risk") - col("d_events")).cast("double") /
            col("n_risk").cast("double"))).over(w)))
        .filter(col("dur") <= 365)
      val steps = surv
        .withColumn("pd", coalesce(lag(col("dur"), 1)
          .over(Window.orderBy(col("dur"))), lit(0L)))
        .withColumn("ps", coalesce(lag(col("s"), 1)
          .over(Window.orderBy(col("dur"))), lit(1.0)))
        .withColumn("contrib",
          col("ps") * (col("dur") - col("pd")).cast("double"))
      steps.agg(count(lit(1)).as("n_steps"),
          sum(col("contrib")).as("area"),
          max(col("dur")).as("last_t"))
        .crossJoin(broadcast(surv
          .withColumn("rk", row_number().over(
            Window.orderBy(col("dur").desc)).cast("long"))
          .filter(col("rk") === 1).select(col("s").as("s_last"))))
        .select(lit(365L).as("tau_days"), col("n_steps"),
          round(col("area") +
            col("s_last") * (lit(365L) - col("last_t")).cast("double"),
            4).as("rmst_days"))
    }),

    "q349_capture_recapture" -> ((s, dir) => {
      // Lincoln-Petersen / Chapman capture-recapture: estimate the
      // active customer population from two "captures" (ordered in
      // 1995, ordered in 1996) and the recapture overlap — the
      // ecology-grade estimator for "how many users do we really
      // have" when any one window undercounts. Exact integer counts,
      // Chapman's bias-corrected point estimate and its closed-form
      // SE, compared against the directly-observed population.
      val flags = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(when(year(col("o_orderdate")) === 1995, 1L)
          .otherwise(0L)).as("a"),
          max(when(year(col("o_orderdate")) === 1996, 1L)
            .otherwise(0L)).as("b"))
      flags.agg(count(lit(1)).as("n_ever"),
          sum(col("a")).as("n1"), sum(col("b")).as("n2"),
          sum(col("a") * col("b")).as("m"))
        .select(col("n_ever"), col("n1"), col("n2"), col("m"),
          round((col("n1") + 1).cast("double") * (col("n2") + 1) /
            (col("m") + 1) - 1, 2).as("n_hat_chapman"),
          round(sqrt((col("n1") + 1).cast("double") * (col("n2") + 1) *
            (col("n1") - col("m")) * (col("n2") - col("m")) /
            ((col("m") + 1).cast("double") * (col("m") + 1) *
              (col("m") + 2))), 2).as("se"))
    }),

    "q350_xirr_bisection" -> ((s, dir) => {
      // IRR per market segment via 30-step bisection — the finance
      // closer for the 350-query surface: treat each segment's 1996-H2
      // revenue as the investment and its 12 monthly 1997 revenues as
      // returns, and solve NPV(r) = 0 for the monthly rate. The cash
      // flows pivot to a WIDE 5-row frame (13 exact-kilodollar
      // columns), so every bisection step is one fixed-operand-order
      // NPV expression + interval update — pure column arithmetic,
      // deterministic on both engines (q340's fold pattern).
      val seg = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      val c0 = seg.filter(year(col("o_orderdate")) === 1996 &&
          month(col("o_orderdate")) >= 7)
        .groupBy(col("c_mktsegment").as("sg"))
        .agg(expr("CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) " +
          "div 1000 AS BIGINT)").as("c0"))
      val months = (1 to 12).map(mm =>
        sum(when(month(col("o_orderdate")) === mm,
          expr("CAST(floor(o_totalprice) AS BIGINT)")).otherwise(0L))
          .as(s"raw$mm"))
      val cf = seg.filter(year(col("o_orderdate")) === 1997)
        .groupBy(col("c_mktsegment").as("sg"))
        .agg(months.head, months.tail: _*)
        .select(col("sg") +: (1 to 12).map(mm =>
          expr(s"CAST(raw$mm div 1000 AS BIGINT)").as(s"cf$mm")): _*)
      def npv(r: Column) = (1 to 12).foldLeft(col("c0").cast("double")
          * -1.0)((acc, mm) =>
        acc + col(s"cf$mm") / pow(r + 1.0, mm.toDouble))
      // ONE projection per bisection step (a withColumn chain would put
      // ~6 nodes per step into analysis — the q288 stage-count lesson)
      val carry = col("sg") +: col("c0") +:
        (1 to 12).map(mm => col(s"cf$mm"))
      var cur = c0.join(cf, Seq("sg"))
        .select(carry :+ lit(0.0).as("lo") :+ lit(1.0).as("hi"): _*)
      for (k <- 1 to 30) {
        val mid = (col("lo") + col("hi")) / 2
        cur = cur.select(carry :+
          when(npv(mid) > 0, mid).otherwise(col("lo")).as("lo") :+
          when(npv(mid) > 0, col("hi")).otherwise(mid).as("hi"): _*)
        // truncate the plan: CollapseProject would otherwise inline the
        // interval recurrence into one exponentially-growing expression
        if (k % 10 == 0) cur = cur.localCheckpoint()
      }
      cur.select(col("sg").as("segment"), col("c0").as("c0_kusd"),
          (1 to 12).map(mm => col(s"cf$mm")).reduce(_ + _)
            .as("total_return_kusd"),
          round((col("lo") + col("hi")) / 2, 8).as("irr_monthly"))
        .withColumn("irr_annual",
          round(pow(col("irr_monthly") + 1.0, 12.0) - 1.0, 6))
        .orderBy(col("segment"))
    }),

    "q262_hill_tail" -> ((s, dir) => {
      // heavy-tail diagnosis: the Hill estimator over the top 100 order
      // values — gamma = mean ln(x_i / x_ref) against the rank-101
      // reference, tail index alpha = 1/gamma. Ranking runs through the
      // two-phase global ranker on (exact cents desc, key) so the top
      // set is total-ordered on any engine.
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val ranked = graft.ops.PrefixSum.globalRank(o,
        Seq(col("cents").desc, col("o_orderkey")), "rk")
        .filter(col("rk") <= 101)
        .persist()  // reference row + the top-100 aggregate
      val ref = ranked.filter(col("rk") === 101)
        .select(col("cents").as("ref_cents"))
      ranked.filter(col("rk") <= 100)
        .crossJoin(broadcast(ref))
        .agg(count(lit(1)).as("k"),
          first(col("ref_cents")).as("x_ref_cents"),
          avg(log(col("cents").cast("double") / col("ref_cents").cast("double")))
            .as("gamma_raw"))
        .select(col("k"), col("x_ref_cents"),
          round(col("gamma_raw"), 6).as("hill_gamma"),
          round(lit(1.0) / col("gamma_raw"), 4).as("tail_alpha"))
    }),

    "q263_kendall_tau" -> ((s, dir) => {
      // rank stability: Kendall's tau between brand revenue rankings in
      // 1995 and 1996 — concordant minus discordant brand pairs over the
      // bounded brand table (RBO's classic cousin, q161). Exact cents,
      // total-ordered ranks, one self-join over <= |brands|^2 rows.
      val byYear = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")).isin(1995, 1996))
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val w = Window.partitionBy(col("yr"))
        .orderBy(col("cents").desc, col("p_brand"))
      val rk = byYear.withColumn("r", row_number().over(w))
      val r95 = rk.filter(col("yr") === 1995)
        .select(col("p_brand"), col("r").as("ra"))
      val r96 = rk.filter(col("yr") === 1996)
        .select(col("p_brand"), col("r").as("rb"))
      val both = r95.join(r96, "p_brand").persist()
      val x = both.select(col("p_brand").as("b1"), col("ra").as("ra1"),
        col("rb").as("rb1"))
      val y = both.select(col("p_brand").as("b2"), col("ra").as("ra2"),
        col("rb").as("rb2"))
      x.join(y, col("b1") < col("b2"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when((col("ra1") - col("ra2")) * (col("rb1") - col("rb2")) > 0,
            1L).otherwise(0L)).as("concordant"),
          sum(when((col("ra1") - col("ra2")) * (col("rb1") - col("rb2")) < 0,
            1L).otherwise(0L)).as("discordant"))
        .select(col("n_pairs"), col("concordant"), col("discordant"),
          round((col("concordant") - col("discordant")).cast("double") /
            col("n_pairs").cast("double"), 6).as("kendall_tau"))
    }),

    "q264_weighted_ess" -> ((s, dir) => {
      // effective sample size under the q233 temperature-0.5 language
      // weights: ESS = (Σw)²/Σw² — how much of the corpus the rebalanced
      // mixture actually uses. Weights broadcast per language; one
      // weighted aggregate.
      val cnt = t(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).cast("double").as("nn"),
        sum(sqrt(col("n").cast("double"))).as("ssq"))
      val wts = cnt.crossJoin(broadcast(tot))
        .select(col("lang"),
          (col("nn") / col("ssq") / sqrt(col("n").cast("double"))).as("w"))
      t(s, dir, "documents").select(col("lang"))
        .join(broadcast(wts), "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sw"),
          sum(col("w") * col("w")).as("sww"))
        .select(col("n_docs"),
          round(col("sw") * col("sw") / col("sww"), 4).as("ess"),
          round(col("sw") * col("sw") / col("sww") /
            col("n_docs").cast("double"), 6).as("ess_ratio"))
    }),

    "q259_seasonal_naive" -> ((s, dir) => {
      // forecast-baseline shootout: same-day-last-week (seasonal naive)
      // vs yesterday (naive) MAE per event type, over days where both
      // baselines exist — the sanity check that tells you whether q207's
      // smoother beats the cheapest seasonal memory. Per-type lag windows
      // over the calendar-bounded daily table.
      val daily = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("event_type"), expr("us div 86400000000").as("d"))
        .agg(sum(col("value")).as("v"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      daily
        .withColumn("naive", lag(col("v"), 1).over(w))
        .withColumn("snaive", lag(col("v"), 7).over(w))
        .filter(col("naive").isNotNull && col("snaive").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          round(avg(abs(col("v") - col("naive"))), 4).as("mae_naive"),
          round(avg(abs(col("v") - col("snaive"))), 4).as("mae_snaive"))
        .withColumn("snaive_better",
          when(col("mae_snaive") < col("mae_naive"), 1L).otherwise(0L))
        .orderBy(col("event_type"))
    }),

    "q260_cohen_kappa" -> ((s, dir) => {
      // inter-labeler agreement: two weak labelers (lang tag vs printable-
      // ASCII ratio) scored with Cohen's kappa — observed agreement
      // corrected for chance from the marginals, all from ONE confusion-
      // count aggregate. The ASCII class is the literal [ -~] range,
      // identical in Java regex and RE2.
      val lab = t(s, dir, "documents")
        .select(when(col("lang") === "en", 1).otherwise(0).as("a"),
          when(length(regexp_replace(col("text"), "[^ -~]", ""))
            .cast("double") / length(col("text")).cast("double") > 0.9, 1)
            .otherwise(0).as("b"))
      lab.agg(count(lit(1)).as("n"),
          sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L)).as("n11"),
          sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)).as("n10"),
          sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L)).as("n01"),
          sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L)).as("n00"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          round((col("n11") + col("n00")).cast("double") / col("n").cast("double"),
            6).as("po"),
          round(((col("n11") + col("n10")).cast("double") *
            (col("n11") + col("n01")).cast("double") +
            (col("n01") + col("n00")).cast("double") *
            (col("n10") + col("n00")).cast("double")) /
            (col("n").cast("double") * col("n").cast("double")), 6).as("pe"))
        .withColumn("kappa", round((col("po") - col("pe")) /
          (lit(1.0) - col("pe")), 6))
    }),

    "q261_gain_curve" -> ((s, dir) => {
      // cumulative-gains table for the q138 classifier: corpus ranked by
      // ROUNDED score (6 dp — unrounded ulp ties would let engines
      // disagree on the decile boundary), deciles via the two-phase
      // global ranker (no whole-table window), cumulative positive share
      // and lift per decile.
      val (feat, cols) = classifierFeatures(s, dir)
      val wts = graft.ops.LinearModel.logisticGd(feat, cols, "y",
        lr = 0.5, nIter = 3)
      val len = length(col("text")).cast("double")
      val scored = t(s, dir, "documents").select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        round(lit(1.0) / (lit(1.0) + exp(-(lit(wts(0)) +
          lit(wts(1)) * (len / 100.0) +
          lit(wts(2)) * ((len - length(regexp_replace(col("text"), " ", ""))
            .cast("double")) / len) +
          lit(wts(3)) * ((len - length(regexp_replace(col("text"), "[0-9]", ""))
            .cast("double")) / len)))), 6).as("p"))
      val ranked = graft.ops.PrefixSum.globalRank(scored,
        Seq(col("p").desc, col("doc_id")), "rk")
      val tot = ranked.agg(count(lit(1)).as("nt"), sum(col("y")).as("pt"))
      val byDec = ranked.crossJoin(broadcast(tot))
        .withColumn("decile", expr("((rk - 1) * 10) div nt"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
          first(col("nt")).as("nt"), first(col("pt")).as("pt"))
      val wc = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDec
        .withColumn("cum_n", sum(col("n")).over(wc))
        .withColumn("cum_pos", sum(col("n_pos")).over(wc))
        .select(col("decile"), col("n"), col("n_pos"),
          round(col("cum_pos").cast("double") / col("pt").cast("double"), 6)
            .as("cum_gain"),
          round((col("cum_pos").cast("double") / col("cum_n").cast("double")) /
            (col("pt").cast("double") / col("nt").cast("double")), 4)
            .as("lift"))
        .orderBy(col("decile"))
    }),

    "q256_precedence_matrix" -> ((s, dir) => {
      // directional precedence: for each event-type pair, on how many
      // user-days does A's first occurrence precede B's? First-occurrence
      // frame keyed (user, day, type), pair self-join bounded by types²
      // per user-day, exact microsecond compares with ties reported —
      // the order-of-operations evidence behind funnel hypotheses.
      val ft = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("user_id"), expr("us div 86400000000").as("d"),
          col("event_type"))
        .agg(min(col("us")).as("fus"))
        .persist()  // both sides of the pair self-join
      val a = ft.select(col("user_id"), col("d"), col("event_type").as("t1"),
        col("fus").as("us1"))
      val b = ft.select(col("user_id"), col("d"), col("event_type").as("t2"),
        col("fus").as("us2"))
      a.join(b, Seq("user_id", "d")).filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("n_userdays"),
          sum(when(col("us1") < col("us2"), 1L).otherwise(0L)).as("t1_first"),
          sum(when(col("us1") > col("us2"), 1L).otherwise(0L)).as("t2_first"),
          sum(when(col("us1") === col("us2"), 1L).otherwise(0L)).as("ties"))
        .withColumn("t1_share",
          round(col("t1_first").cast("double") /
            col("n_userdays").cast("double"), 4))
        .orderBy(col("t1"), col("t2"))
    }),

    "q257_price_endings" -> ((s, dir) => {
      // psychological-pricing audit: the distribution of retail-price
      // cent endings (.99 spikes and friends) with per-ending chi-square
      // terms against uniform — Benford's charm-price cousin (q156).
      // Counts only; top 10 endings by frequency.
      val e = t(s, dir, "part")
        .select(pmod(expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)"),
          lit(100L)).as("ending"))
        .groupBy(col("ending")).agg(count(lit(1)).as("n"))
      val tot = e.agg(sum(col("n")).cast("double").as("nt"))
      e.crossJoin(broadcast(tot))
        .select(col("ending"), col("n"),
          round(col("n").cast("double") / col("nt"), 6).as("share"),
          round(pow(col("n").cast("double") - col("nt") / 100.0, 2) /
            (col("nt") / 100.0), 4).as("chi2_term"))
        .orderBy(col("n").desc, col("ending"))
        .limit(10)
    }),

    "q258_breach_streaks" -> ((s, dir) => {
      // gaps-and-islands on the revenue calendar: longest consecutive run
      // of days below 80% of the mean daily take. Island id = d - rank
      // among below-days (the classic idiom), windows over the
      // calendar-bounded daily table only; earliest-start tiebreak.
      val daily = t(s, dir, "orders")
        .groupBy(expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
          .as("d"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
        .persist()  // threshold scalar + the flagged series
      val thr = daily.agg((avg(col("cents")) * 0.8).as("thr"))
      val below = daily.crossJoin(broadcast(thr))
        .filter(col("cents").cast("double") < col("thr"))
      val isl = below
        .withColumn("grp", col("d") - row_number().over(Window.orderBy(col("d"))))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"),
          max(col("d")).as("end_d"))
      val nTot = below.agg(count(lit(1)).as("n_below_days"))
        .crossJoin(isl.agg(count(lit(1)).as("n_streaks")))
      isl.orderBy(col("len").desc, col("start_d")).limit(1)
        .crossJoin(broadcast(nTot))
        .select(col("n_below_days"), col("n_streaks"),
          col("len").as("max_streak_len"), col("start_d"), col("end_d"))
    }),

    "q254_revenue_waterfall" -> ((s, dir) => {
      // FP&A waterfall: the 1995→1996 revenue delta decomposed into price,
      // volume, and cross effects over parts traded in BOTH years —
      // price = Σ q95·Δp, volume = Σ p95·Δq, cross = Σ Δp·Δq, an exact
      // algebraic identity with the matched total. One (part, year)
      // aggregate, a part-keyed self-join of the two year slices, one
      // closed-form reduction.
      val py = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")).isin(1995, 1996))
        .groupBy(col("l_partkey").as("pk"),
          year(col("l_shipdate")).as("yr"))
        .agg(sum(col("l_quantity")).as("q"),
          sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .cast("double").as("c"))
        .withColumn("p", col("c") / col("q"))
        .persist()  // both year slices
      val a = py.filter(col("yr") === 1995)
        .select(col("pk"), col("q").as("q0"), col("c").as("c0"),
          col("p").as("p0"))
      val b = py.filter(col("yr") === 1996)
        .select(col("pk"), col("q").as("q1"), col("c").as("c1"),
          col("p").as("p1"))
      a.join(b, "pk")
        .agg(count(lit(1)).as("n_parts"),
          round(sum(col("c1") - col("c0")) / 100.0, 2).as("delta_total"),
          round(sum(col("q0") * (col("p1") - col("p0"))) / 100.0, 2)
            .as("price_effect"),
          round(sum(col("p0") * (col("q1") - col("q0"))) / 100.0, 2)
            .as("volume_effect"),
          round(sum((col("p1") - col("p0")) * (col("q1") - col("q0"))) / 100.0,
            2).as("cross_effect"))
    }),

    "q255_dkw_band" -> ((s, dir) => {
      // distribution-free CI on the median: the DKW inequality puts the
      // true median inside the empirical quantiles at 0.5 ± ε, ε =
      // sqrt(ln(2/α)/2n). ε varies per brand, so the band quantiles are
      // discrete rank lookups (conditional min/max over the ranked price
      // table — engine percentile() requires a CONSTANT fraction), all
      // from one brand-partitioned window.
      val pr = t(s, dir, "part")
        .select(col("p_brand"), col("p_retailprice").as("v"))
      val ranked = pr
        .withColumn("rk", row_number().over(Window.partitionBy(col("p_brand"))
          .orderBy(col("v"))))
      val nn = ranked.groupBy(col("p_brand"))
        .agg(max(col("rk")).cast("long").as("n"))
      ranked.join(broadcast(nn), "p_brand")
        .withColumn("eps", sqrt(log(lit(2.0) / 0.05) /
          (lit(2.0) * col("n").cast("double"))))
        .withColumn("lo_k", greatest(lit(1L),
          ceil((lit(0.5) - col("eps")) * col("n").cast("double")).cast("long")))
        .withColumn("hi_k", least(col("n").cast("long"),
          ceil((lit(0.5) + col("eps")) * col("n").cast("double")).cast("long")))
        .groupBy(col("p_brand"))
        .agg(first(col("n")).as("n"),
          round(first(col("eps")), 6).as("dkw_eps"),
          min(when(col("rk") >= col("lo_k"), col("v"))).as("band_lo"),
          max(when(col("rk") <= col("hi_k"), col("v"))).as("band_hi"),
          round(expr("percentile(v, 0.5)"), 4).as("median"))
        .orderBy(col("p_brand"))
    }),

    "q251_array_gallery" -> ((s, dir) => {
      // higher-order array-function parity gallery over the embedding
      // column: slice + fold (aggregate), zip_with against the reversed
      // vector, array max — the lambda-function surface a vector pipeline
      // leans on, each reduced per label so the output is bounded. Floats
      // widen to double BEFORE any arithmetic on both engines.
      t(s, dir, "embeddings")
        .select(col("label"),
          expr("aggregate(slice(embedding, 1, 4), CAST(0.0 AS DOUBLE), " +
            "(a, x) -> a + CAST(x AS DOUBLE))").as("head4_sum"),
          expr("aggregate(zip_with(embedding, reverse(embedding), " +
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("rev_dot"),
          expr("CAST(array_max(embedding) AS DOUBLE)").as("mx"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("head4_sum")), 6).as("avg_head4_sum"),
          round(avg(col("rev_dot")), 6).as("avg_rev_dot"),
          round(avg(col("mx")), 6).as("avg_max"))
        .orderBy(col("label"))
    }),

    "q252_path_entropy" -> ((s, dir) => {
      // behavioral diversity by activity level: per-user Shannon entropy
      // of the event-type mix, averaged within log2 activity buckets —
      // do heavy users do more kinds of things? Two counts-only
      // aggregates ((user, type) then user) and one bounded bucket
      // rollup; entropy from exact integer counts.
      val ut = events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val ent = ut.groupBy(col("user_id"))
        .agg(sum(col("c")).as("n"),
          (log(sum(col("c")).cast("double")) -
            sum(col("c").cast("double") * log(col("c").cast("double"))) /
              sum(col("c")).cast("double")).as("h"))
      ent.withColumn("bucket", floor(log2(col("n").cast("double")))
          .cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_users"),
          round(avg(col("n").cast("double")), 4).as("avg_events"),
          round(avg(col("h")), 6).as("avg_entropy"))
        .orderBy(col("bucket"))
    }),

    "q253_drawdown" -> ((s, dir) => {
      // max drawdown of the daily order-revenue series: running peak via
      // a prefix-max window over the calendar-bounded daily table (exact
      // cents), drawdown depth and the day it bottoms. Top-1 selection
      // with a day tiebreak, following the q176 CUSUM argmax contract.
      val daily = t(s, dir, "orders")
        .groupBy(expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
          .as("d"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("peak", max(col("cents")).over(w))
        .withColumn("dd", col("peak") - col("cents"))
        .orderBy(col("dd").desc, col("d"))
        .limit(1)
        .select(col("d").as("trough_day"),
          col("peak").as("peak_cents"), col("cents").as("trough_cents"),
          col("dd").as("drawdown_cents"),
          round(col("dd").cast("double") / col("peak").cast("double"), 6)
            .as("drawdown_frac"))
    }),

    "q249_semantics_gallery" -> ((s, dir) => {
      // cross-engine semantics gallery — the traps a portability layer
      // must spell out, each asserted as a data-derived metric: NULL join
      // keys never match; GROUP BY folds NULLs into one group; negative
      // modulo needs pmod (engine % signs differ from mathematical mod);
      // integer division toward zero vs floor MUST be spelled as explicit
      // trunc()/floor() — native operators disagree AND unary-minus
      // precedence flips `-7 // 2` to -(7//2); out-of-range substring is
      // '' not NULL; least() skips NULLs on both engines.
      import s.implicits._
      val c = t(s, dir, "customer")
        .select(expr("nullif(c_nationkey, 3)").as("nk"))
      val joinMatches = c.join(broadcast(t(s, dir, "nation")),
          col("nk") === col("n_nationkey"))
        .agg(count(lit(1)).as("v"))
        .select(lit("null_keys_drop_from_join").as("metric"), col("v"))
      val groups = c.groupBy(col("nk")).agg(count(lit(1)))
        .agg(count(lit(1)).as("v"))
        .select(lit("null_forms_one_group").as("metric"), col("v"))
      val sup = t(s, dir, "supplier")
      val scalarTraps = sup.agg(
          max(pmod(lit(-7), lit(3))).cast("long").as("pmod_neg"),
          max(expr("-7 div 2")).cast("long").as("trunc_div_neg"),
          max(floor(lit(-7.0) / 2.0)).cast("long").as("floor_div_neg"),
          sum(when(expr("substring(s_name, 100, 10)") === "", 1L)
            .otherwise(0L)).as("oob_substr_empty"),
          sum(when(least(expr("nullif(s_nationkey, s_nationkey)"),
            col("s_nationkey")).isNotNull, 1L).otherwise(0L))
            .as("least_skips_null"))
      def m(label: String, cname: String) = scalarTraps
        .select(lit(label).as("metric"), col(cname).as("v"))
      joinMatches.unionByName(groups)
        .unionByName(m("pmod_negative", "pmod_neg"))
        .unionByName(m("trunc_div_negative", "trunc_div_neg"))
        .unionByName(m("floor_div_negative", "floor_div_neg"))
        .unionByName(m("oob_substring_is_empty", "oob_substr_empty"))
        .unionByName(m("least_skips_nulls", "least_skips_null"))
        .orderBy(col("metric"))
    }),

    "q250_release_manifest" -> ((s, dir) => {
      // corpus release manifest (the data card a training run pins): per
      // table, row count, key cardinality, uniqueness flag, and key
      // range — one aggregate per table, ten stacked rows. The capstone
      // "what exactly shipped" artifact.
      def card(name: String, df: DataFrame, key: String): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(col(key)).as("n_distinct_key"),
            min(col(key)).cast("long").as("min_key"),
            max(col(key)).cast("long").as("max_key"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("n_distinct_key"),
            when(col("n_rows") === col("n_distinct_key"), 1L).otherwise(0L)
              .as("key_unique"),
            col("min_key"), col("max_key"))
      card("region", t(s, dir, "region"), "r_regionkey")
        .unionByName(card("nation", t(s, dir, "nation"), "n_nationkey"))
        .unionByName(card("customer", t(s, dir, "customer"), "c_custkey"))
        .unionByName(card("supplier", t(s, dir, "supplier"), "s_suppkey"))
        .unionByName(card("part", t(s, dir, "part"), "p_partkey"))
        .unionByName(card("orders", t(s, dir, "orders"), "o_orderkey"))
        .unionByName(card("lineitem", t(s, dir, "lineitem"), "l_orderkey"))
        .unionByName(card("events", t(s, dir, "events"), "event_id"))
        .unionByName(card("documents", t(s, dir, "documents"), "doc_id"))
        .unionByName(card("embeddings", t(s, dir, "embeddings"), "vec_id"))
        .orderBy(col("table_name"))
    }),

    "q246_storage_tiering" -> ((s, dir) => {
      // lifecycle tiering plan: month partitions classed hot (< 1y old),
      // warm (< 2y), cold by age against the corpus max day, with row and
      // estimated byte volumes per tier (fixed widths + measured string
      // bytes). The month-stats table is calendar-bounded; the tier
      // decision is pure integer arithmetic.
      val li = t(s, dir, "lineitem")
        .select(((year(col("l_shipdate")) - 1992) * 12 +
          month(col("l_shipdate")) - 1).cast("long").as("mpart"),
          expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS LONG) div 86400")
            .as("d"),
          (lit(68L) + octet_length(col("l_returnflag")).cast("long") +
            octet_length(col("l_linestatus")).cast("long")).as("bytes"))
      val parts = li.groupBy(col("mpart"))
        .agg(count(lit(1)).as("rows"), sum(col("bytes")).as("est_bytes"),
          max(col("d")).as("dpart_max"))
      val gmax = parts.agg(max(col("dpart_max")).as("dmax"))
      parts.crossJoin(broadcast(gmax))
        .withColumn("age_days", col("dmax") - col("dpart_max"))
        .withColumn("tier", when(col("age_days") <= 365, "hot")
          .when(col("age_days") <= 730, "warm").otherwise("cold"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_partitions"), sum(col("rows")).as("rows"),
          sum(col("est_bytes")).as("est_bytes"),
          min(col("age_days")).as("min_age_days"),
          max(col("age_days")).as("max_age_days"))
        .orderBy(col("tier"))
    }),

    "q247_embedding_drift" -> ((s, dir) => {
      // vector-space drift: per label, the cosine between the centroid of
      // even-id vectors and odd-id vectors, plus the norm ratio — the
      // embedding twin of numeric PSI (q137) and token KL (q173). The
      // explode is |vectors| x 64 dims but reduces immediately to a
      // (label, dim) aggregate; the final reduction is per label.
      val e = t(s, dir, "embeddings")
        .select(col("label"), pmod(col("vec_id"), lit(2L)).as("half"),
          posexplode(col("embedding")))
        .select(col("label"), col("half"), col("pos").as("i"),
          col("col").cast("double").as("v"))
      val cent = e.groupBy(col("label"), col("i"))
        .agg(avg(when(col("half") === 0, col("v"))).as("ca"),
          avg(when(col("half") === 1, col("v"))).as("cb"))
      val cnt = t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(sum(when(pmod(col("vec_id"), lit(2L)) === 0, 1L).otherwise(0L))
            .as("n_even"),
          sum(when(pmod(col("vec_id"), lit(2L)) === 1, 1L).otherwise(0L))
            .as("n_odd"))
      cent.groupBy(col("label"))
        .agg(sum(col("ca") * col("cb")).as("dot"),
          sum(col("ca") * col("ca")).as("na"),
          sum(col("cb") * col("cb")).as("nb"))
        .join(broadcast(cnt), "label")
        .select(col("label"), col("n_even"), col("n_odd"),
          round(col("dot") / sqrt(col("na") * col("nb")), 6)
            .as("centroid_cosine"),
          round(sqrt(col("na") / col("nb")), 6).as("norm_ratio"))
        .orderBy(col("label"))
    }),

    "q248_survivor_policy" -> ((s, dir) => {
      // dedup survivorship policy comparison on planted 2-member families
      // (original + clipped copy): keep-min-id vs keep-best-quality. The
      // quality delta is real (clipping changes the score), so the report
      // shows how much quality a naive min-id policy leaves behind. One
      // family-keyed aggregate; comparisons on ROUNDED quality so the
      // differing-family count is engine-stable.
      val docs = docsWithNearDups(s, dir)
        .select(col("doc_id"), pmod(col("doc_id"), lit(100000L)).as("fam"),
          TF.qualityScore(col("text")).as("quality"))
      docs.groupBy(col("fam"))
        .agg(min(struct(col("doc_id"), col("quality"))).as("minid"),
          max(col("quality")).as("best_q"), count(lit(1)).as("sz"))
        .select(col("fam"), col("sz"),
          col("minid").getField("quality").as("minid_q"), col("best_q"))
        .agg(count(lit(1)).as("n_families"),
          sum(when(round(col("best_q"), 6) > round(col("minid_q"), 6), 1L)
            .otherwise(0L)).as("n_differing"),
          round(avg(col("minid_q")), 6).as("avg_q_minid"),
          round(avg(col("best_q")), 6).as("avg_q_best"),
          round(avg(col("best_q") - col("minid_q")), 6).as("avg_gain"))
    }),

    "q243_seasonality_strength" -> ((s, dir) => {
      // STL-style strength measures per event type: trend strength =
      // 1 - var(detrended)/var(series), seasonal strength =
      // 1 - var(residual)/var(detrended), from the q216 decomposition
      // run per type (windows partitioned by type over the calendar-
      // bounded daily table; dow means join back broadcast).
      val daily = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("event_type"), expr("us div 86400000000").as("d"))
        .agg(sum(col("value")).as("v"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rowsBetween(-3, 3)
      val detr = daily
        .withColumn("trend", avg(col("v")).over(w))
        .withColumn("wn", count(lit(1)).over(w))
        .filter(col("wn") === 7)
        .select(col("event_type"), col("v"),
          pmod(col("d") + 3, lit(7L)).as("dow"),
          (col("v") - col("trend")).as("detr"))
        .persist()  // dow means + the strength aggregate
      val dowMean = detr.groupBy(col("event_type"), col("dow"))
        .agg(avg(col("detr")).as("sdow"))
      detr.join(broadcast(dowMean), Seq("event_type", "dow"))
        .withColumn("resid", col("detr") - col("sdow"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          (avg(col("v") * col("v")) - avg(col("v")) * avg(col("v")))
            .as("var_v"),
          (avg(col("detr") * col("detr")) - avg(col("detr")) * avg(col("detr")))
            .as("var_d"),
          (avg(col("resid") * col("resid")) - avg(col("resid")) * avg(col("resid")))
            .as("var_r"))
        .select(col("event_type"), col("n_days"),
          round(greatest(lit(0.0), lit(1.0) - col("var_d") / col("var_v")), 4)
            .as("trend_strength"),
          round(greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_d")), 4)
            .as("seasonal_strength"))
        .orderBy(col("event_type"))
    }),

    "q244_uncertainty_sample" -> ((s, dir) => {
      // active-learning selection: the 20 docs the q138 classifier is
      // least sure about (|p - 0.5| smallest). The model trains in 3
      // one-aggregate GD epochs; scoring broadcasts the 4 learned
      // coefficients as literals, so selection is one scan + bounded
      // top-k. Margins are rounded BEFORE ordering so the cut is
      // engine-stable.
      val (feat, cols) = classifierFeatures(s, dir)
      val wts = graft.ops.LinearModel.logisticGd(feat, cols, "y",
        lr = 0.5, nIter = 3)
      val len = length(col("text")).cast("double")
      val scored = t(s, dir, "documents").select(col("doc_id"),
        (lit(wts(0)) + lit(wts(1)) * (len / 100.0) +
          lit(wts(2)) * ((len - length(regexp_replace(col("text"), " ", ""))
            .cast("double")) / len) +
          lit(wts(3)) * ((len - length(regexp_replace(col("text"), "[0-9]", ""))
            .cast("double")) / len)).as("logit"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("logit")))).as("p"))
      scored.select(col("doc_id"), round(col("p"), 6).as("p"),
          round(abs(col("p") - 0.5), 6).as("margin"))
        .orderBy(col("margin"), col("doc_id"))
        .limit(20)
    }),

    "q245_broadcast_advisor" -> ((s, dir) => {
      // broadcast-join advisor: estimated in-memory bytes per dimension
      // table (fixed-width columns + measured string octet lengths) vs
      // the 10 MB auto-broadcast threshold. One aggregate per table,
      // five stacked advice rows — the planner input you check before
      // forcing a join strategy.
      def advise(name: String, df: DataFrame, fixed: Int,
                 strCols: Seq[String]): DataFrame = {
        val strBytes = strCols.map(c => octet_length(col(c)).cast("long"))
          .reduceOption(_ + _).getOrElse(lit(0L))
        df.agg(count(lit(1)).as("n_rows"),
            sum(strBytes + fixed.toLong).as("est_bytes"))
          .select(lit(name).as("table_name"), col("n_rows"), col("est_bytes"),
            when(col("est_bytes") < 10485760L, 1L).otherwise(0L)
              .as("broadcastable"))
      }
      advise("region", t(s, dir, "region"), 4, Seq("r_name"))
        .unionByName(advise("nation", t(s, dir, "nation"), 8, Seq("n_name")))
        .unionByName(advise("supplier", t(s, dir, "supplier"), 20,
          Seq("s_name")))
        .unionByName(advise("customer", t(s, dir, "customer"), 20,
          Seq("c_name", "c_mktsegment")))
        .unionByName(advise("part", t(s, dir, "part"), 20,
          Seq("p_name", "p_brand", "p_type")))
        .orderBy(col("table_name"))
    }),

    "q240_zonemap_prune" -> ((s, dir) => {
      // zone-map pruning estimator: per month partition, (min, max, rows)
      // stats; for three date-range predicates, how many partitions a
      // stats-pruned scan touches and how many rows it saves vs the
      // actual match count. Epoch-day arithmetic end-to-end (bounds are
      // precomputed day numbers: 1994 = [8766, 9130], 1995H1 =
      // [9131, 9311], 1996-03 = [9556, 9586]). The stats table is
      // month-bounded; everything after is broadcast-grid counts.
      import s.implicits._
      val o = t(s, dir, "orders")
        .select(((year(col("o_orderdate")) - 1992) * 12 +
          month(col("o_orderdate")) - 1).as("mpart"),
          expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
            .as("d"))
        .persist()  // zone-map stats + actual match counts
      val zones = o.groupBy(col("mpart"))
        .agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"),
          count(lit(1)).as("rows"))
      val preds = Seq(("y1994", 8766L, 9130L), ("h1_1995", 9131L, 9311L),
        ("m1996_03", 9556L, 9586L)).toDF("pred", "lo", "hi")
      val scan = zones.crossJoin(broadcast(preds))
        .groupBy(col("pred"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("partitions_total"),
          sum(when(col("dmin") <= col("hi") && col("dmax") >= col("lo"), 1L)
            .otherwise(0L)).as("partitions_scanned"),
          sum(when(col("dmin") <= col("hi") && col("dmax") >= col("lo"),
            col("rows")).otherwise(0L)).as("rows_scanned"),
          sum(col("rows")).as("rows_total"))
      val actual = o.crossJoin(broadcast(preds))
        .filter(col("d") >= col("lo") && col("d") <= col("hi"))
        .groupBy(col("pred")).agg(count(lit(1)).as("rows_matching"))
      scan.join(actual, "pred")
        .select(col("pred"), col("partitions_total"),
          col("partitions_scanned"), col("rows_total"), col("rows_scanned"),
          col("rows_matching"),
          round(lit(1.0) - col("rows_scanned").cast("double") /
            col("rows_total").cast("double"), 6).as("prune_ratio"))
        .orderBy(col("pred"))
    }),

    "q241_join_fanout" -> ((s, dir) => {
      // join-multiplicity audit for the four warehouse FK edges: per
      // parent key the child match count (zero-match parents included via
      // left join), then avg/p99/max fan-out — the numbers that predict
      // join output size and AQE skew handling. Two counts-only phases
      // per edge.
      def edge(name: String, parent: DataFrame, pk: String,
               child: DataFrame, fk: String): DataFrame = {
        val cc = child.groupBy(col(fk).as("k")).agg(count(lit(1)).as("c"))
        parent.select(col(pk).as("k"))
          .join(cc, Seq("k"), "left")
          .select(coalesce(col("c"), lit(0L)).as("c"))
          .agg(count(lit(1)).as("n_parents"),
            sum(when(col("c") === 0, 1L).otherwise(0L)).as("n_childless"),
            round(avg(col("c").cast("double")), 4).as("avg_fanout"),
            expr("CAST(percentile(c, 0.99) AS DOUBLE)").as("p99_raw"),
            max(col("c")).as("max_fanout"))
          .select(lit(name).as("edge"), col("n_parents"), col("n_childless"),
            col("avg_fanout"), round(col("p99_raw"), 4).as("p99_fanout"),
            col("max_fanout"))
      }
      val li = t(s, dir, "lineitem")
      edge("orders_lineitem", t(s, dir, "orders"), "o_orderkey", li, "l_orderkey")
        .unionByName(edge("part_lineitem", t(s, dir, "part"), "p_partkey",
          li, "l_partkey"))
        .unionByName(edge("supplier_lineitem", t(s, dir, "supplier"),
          "s_suppkey", li, "l_suppkey"))
        .unionByName(edge("customer_orders", t(s, dir, "customer"),
          "c_custkey", t(s, dir, "orders"), "o_custkey"))
        .orderBy(col("edge"))
    }),

    "q242_rolling_retention" -> ((s, dir) => {
      // classic day-k retention (k = 1, 7, 28): a user counts as retained
      // if active exactly on first_day + k; eligibility requires the
      // horizon to fit the corpus. Distinct (user, day) activity and the
      // per-user first day are each one aggregate; the retention check is
      // an equi-join on (user, day+k) — no window over raw events.
      import s.implicits._
      val act = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), expr("us div 86400000000").as("d"))
        .distinct()
        .persist()  // first-day aggregate + the day+k probe side
      val first = act.groupBy(col("user_id")).agg(min(col("d")).as("f"))
      val dmax = act.agg(max(col("d")).as("dmax"))
      val ks = Seq(1L, 7L, 28L).toDF("k")
      val elig = first.crossJoin(broadcast(ks))
        .crossJoin(broadcast(dmax))
        .filter(col("f") + col("k") <= col("dmax"))
      val probe = act.select(col("user_id").as("uid2"), col("d").as("dk"))
      elig.join(probe,
          col("user_id") === col("uid2") &&
            col("dk") === col("f") + col("k"), "left")
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_eligible"),
          sum(when(col("dk").isNotNull, 1L).otherwise(0L)).as("n_retained"),
          round(avg(when(col("dk").isNotNull, 1.0).otherwise(0.0)), 6)
            .as("retention_rate"))
        .orderBy(col("k"))
    }),

    "q237_ordered_set_aggs" -> ((s, dir) => {
      // ordered-set aggregates with PORTABLE tie semantics: builtin mode()
      // and percentile_disc() tie-break differently across engines, so
      // both are spelled as two-phase reductions over the per-value count
      // table — mode = (count desc, value asc) argmax, discrete median =
      // smallest value whose doubled cumulative count reaches n. Counts
      // only after the first aggregate.
      val cnt = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rf"), col("l_quantity").as("q"))
        .agg(count(lit(1)).as("c"))
        .persist()  // mode argmax + cumulative median pass
      val wRank = Window.partitionBy(col("rf"))
        .orderBy(col("c").desc, col("q"))
      val mode = cnt.withColumn("rn", row_number().over(wRank))
        .filter(col("rn") === 1)
        .select(col("rf"), col("q").as("mode_qty"))
      val wCum = Window.partitionBy(col("rf")).orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = cnt.groupBy(col("rf")).agg(sum(col("c")).as("n"))
      val med = cnt.withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(tot), "rf")
        .filter(col("cum") * 2 >= col("n"))
        .groupBy(col("rf")).agg(min(col("q")).as("median_disc"))
      tot.join(mode, "rf").join(med, "rf")
        .select(col("rf"), col("n"), col("mode_qty"), col("median_disc"))
        .orderBy(col("rf"))
    }),

    "q238_calendar_gallery" -> ((s, dir) => {
      // calendar-function parity gallery: per order month, quarter (pure
      // arithmetic — engine quarter() conventions are safe but arithmetic
      // is self-evident), days-in-month via last_day, day-of-year of the
      // 1st, ISO week of the 15th (mid-month dodges year-boundary ISO
      // divergence). The frame is the bounded month table, one aggregate
      // ahead of the date math.
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"))
        .select(col("y"), col("m"), col("n_orders"),
          ((col("m") + 2) / 3).cast("int").as("quarter"),
          dayofmonth(last_day(make_date(col("y"), col("m"), lit(1))))
            .as("days_in_month"),
          dayofyear(make_date(col("y"), col("m"), lit(1))).as("doy_first"),
          weekofyear(make_date(col("y"), col("m"), lit(15))).as("iso_week_mid"))
        .orderBy(col("y"), col("m"))
    }),

    "q239_scd2_amplification" -> ((s, dir) => {
      // warehouse-economics gauge: SCD2 history rows vs daily full
      // snapshots for the user-type dimension. Snapshot volume has a
      // closed form (each user contributes max_day - first_day + 1 rows),
      // so no day explode; SCD2 rows come from the same change-collapse
      // the q95 history uses. One user-keyed shuffle + broadcast scalars.
      val ev = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_type"), col("us"),
          expr("us div 86400000000").as("d"), col("event_id"))
        .persist()  // change-collapse + span scalar + per-user first-day
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val scd2 = ev
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .agg(sum(when(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"), 1L).otherwise(0L))
          .as("scd2_rows"))
      val span = ev.agg(max(col("d")).as("dmax"))
      val snap = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
        .crossJoin(broadcast(span))
        .agg(count(lit(1)).as("n_users"),
          sum(col("dmax") - col("d0") + 1).as("snapshot_rows"))
      snap.crossJoin(broadcast(scd2))
        .select(col("n_users"), col("scd2_rows"), col("snapshot_rows"),
          round(col("snapshot_rows").cast("double") /
            col("scd2_rows").cast("double"), 4).as("amplification"))
    }),

    "q234_bom_rollup" -> ((s, dir) => {
      // hierarchy rollup without recursion: ancestors of a part are its
      // decimal prefixes (pk div 10^k), so the whole bill-of-materials
      // rollup is ONE 6-row broadcast explode + one aggregate — counts
      // and exact-cents cost per ancestor node, top 20 by subtree size.
      // The closed-form ancestor join replaces an iterative climb at any
      // scale (depth is log10-bounded).
      import s.implicits._
      val levels = Seq(1 -> 10L, 2 -> 100L, 3 -> 1000L, 4 -> 10000L,
        5 -> 100000L, 6 -> 1000000L).toDF("k", "divisor")
      t(s, dir, "part")
        .select(col("p_partkey").as("pk"),
          expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("cents"))
        .crossJoin(broadcast(levels))
        .withColumn("anc", expr("pk div divisor"))
        .filter(col("anc") > 0)
        .groupBy(col("anc"))
        .agg(count(lit(1)).as("n_desc"), sum(col("cents")).as("cost_cents"))
        .orderBy(col("n_desc").desc, col("anc"))
        .limit(20)
    }),

    "q235_dp_counts" -> ((s, dir) => {
      // differential-privacy noise gauge with a DETERMINISTIC Laplace
      // draw: u from the portable keyHash of the language's rank (strings
      // never hashed — engine string hashes differ), noise = -b*sign(u-½)*
      // ln(1-2|u-½|) at b=10 (ε=0.1 per count). Both engines reproduce
      // the exact noisy value, so the privacy/utility table is
      // oracle-checkable — the point is the bookkeeping, not secrecy.
      val cnt = t(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("lang"))
      cnt.withColumn("lid", row_number().over(w).cast("long"))
        .withColumn("u",
          (graft.ops.Sampling.keyHash(col("lid")) + 0.5) / lit(4294967296.0))
        .withColumn("lap", lit(-10.0) * signum(col("u") - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)))
        .select(col("lang"), col("n"),
          round(col("n") + col("lap"), 4).as("noisy_n"),
          round(abs(col("lap")), 4).as("abs_err"))
        .orderBy(col("lang"))
    }),

    "q236_ndcg" -> ((s, dir) => {
      // retrieval quality eval: BM25 top-10 scored against exact
      // contains-all-terms relevance labels — P@10 and NDCG@10 per query,
      // IDCG from the true relevant count. Labels come from the same
      // posting join the ranker uses (term-keyed, bounded), never a scan
      // of docs x queries.
      import s.implicits._
      val queries = Seq(
        (1L, "spark window agg"),
        (2L, "vector scan batch"),
        (3L, "customer stream query")).toDF("query_id", "query_text")
      val docs = t(s, dir, "documents")
      val ranked = Search.bm25TopK(docs, "text", "doc_id", queries, 10)
      val qt = queries.select(col("query_id"), explode(expr(
        "array_distinct(filter(split(lower(query_text), '[^a-z0-9]+'), x -> x <> ''))"))
        .as("term"))
      val nq = qt.groupBy(col("query_id")).agg(count(lit(1)).as("n_terms"))
      val dt = docs.select(col("doc_id"), explode(expr(
        "array_distinct(filter(split(lower(text), '[^a-z0-9]+'), x -> x <> ''))"))
        .as("term"))
      val rel = qt.join(dt, "term")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("nmatch"))
        .join(broadcast(nq), "query_id")
        .filter(col("nmatch") === col("n_terms"))
        .select(col("query_id"), col("doc_id"), lit(1).as("rel"))
        .persist()  // totals + the top-10 join
      val ntot = rel.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_relevant"))
      val dcg = ranked.join(rel, Seq("query_id", "doc_id"), "left")
        .withColumn("r", coalesce(col("rel"), lit(0)).cast("double"))
        .groupBy(col("query_id"))
        .agg(sum(col("r")).as("n_hits"),
          sum(col("r") / log2(col("rank").cast("double") + 1.0)).as("dcg"))
      val idcg = ntot
        .withColumn("i", explode(expr("sequence(1L, least(10L, n_relevant))")))
        .groupBy(col("query_id"), col("n_relevant"))
        .agg(sum(lit(1.0) / log2(col("i").cast("double") + 1.0)).as("idcg"))
      dcg.join(idcg, "query_id")
        .select(col("query_id"), col("n_relevant"),
          round(col("n_hits") / 10.0, 4).as("p_at_10"),
          round(when(col("idcg") > 0, col("dcg") / col("idcg"))
            .otherwise(lit(0.0)), 4).as("ndcg_at_10"))
        .orderBy(col("query_id"))
    }),

    "q231_string_agg" -> ((s, dir) => {
      // ordered list/string aggregation parity: collect_list is
      // UNORDERED in a distributed engine — the portable contract is
      // sort_array before rendering (vs DuckDB's string_agg ORDER BY).
      // One nation-key shuffle; list size bounded by suppliers-per-nation.
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          concat_ws(",", sort_array(collect_list(col("s_name"))))
            .as("supplier_csv"),
          round(sum(col("s_acctbal")), 2).as("total_bal"))
        .orderBy(col("n_name"))
    }),

    "q232_span_corruption" -> ((s, dir) => {
      // T5-style span-corruption bookkeeping: tokens partitioned into
      // 20-token blocks, one 3-token mask per full block, span offset
      // drawn per (doc, block) from the portable keyHash — so mask count,
      // sentinel count, AND the exact offset checksum are all engine-
      // reproducible. The per-block explode is bounded by nt/20, and the
      // final shape is one per-language aggregate.
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(expr("regexp_extract_all(text, '[^ ]+', 0)")).cast("long")
            .as("nt"))
        .withColumn("n_blocks", expr("nt div 20"))
        .persist()  // block explode + the per-doc join-back
      val blocks = d.filter(col("n_blocks") > 0)
        .withColumn("b", explode(expr("sequence(0L, n_blocks - 1)")))
        .select(col("doc_id"), col("lang"),
          pmod(graft.ops.Sampling.keyHash(col("doc_id") * lit(131L) + col("b")),
            lit(18L)).as("off"))
      val perDoc = blocks.groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_spans"), sum(col("off")).as("off_sum"))
      d.join(perDoc.select(col("doc_id"), col("n_spans"), col("off_sum")),
          Seq("doc_id"), "left")
        .select(col("lang"), col("nt"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("off_sum"), lit(0L)).as("off_sum"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"),
          sum(col("n_spans")).as("total_sentinels"),
          sum(col("n_spans") * 3).as("masked_tokens"),
          round(sum(col("n_spans") * 3).cast("double") /
            sum(col("nt")).cast("double"), 6).as("mask_frac"),
          sum(col("off_sum")).as("offset_checksum"))
        .orderBy(col("lang"))
    }),

    "q233_class_reweight" -> ((s, dir) => {
      // class-imbalance reweighting for the language mix: weights
      // proportional to 1/sqrt(n) normalized so the weighted corpus size
      // equals N — the standard temperature-0.5 rebalance — with the
      // before/after share table. Counts-only aggregate + one broadcast
      // normalization scalar.
      val cnt = t(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).cast("double").as("nn"),
        sum(sqrt(col("n").cast("double"))).as("ssq"))
      cnt.crossJoin(broadcast(tot))
        .select(col("lang"), col("n"),
          round(col("nn") / col("ssq") / sqrt(col("n").cast("double")), 6)
            .as("weight"),
          round(col("n").cast("double") / col("nn"), 6).as("share_before"),
          round(sqrt(col("n").cast("double")) / col("ssq"), 6)
            .as("share_after"))
        .orderBy(col("lang"))
    }),

    "q228_predicate_correlation" -> ((s, dir) => {
      // CBO-statistics gauge: actual conjunctive selectivity vs the
      // independence-assumption estimate for three predicate pairs — the
      // correlation factor an optimizer would need multi-column stats to
      // see. All six indicators + three conjunctions ride ONE scan/
      // aggregate; the report is three stacked rows.
      val li = t(s, dir, "lineitem")
      val a = li.agg(
        count(lit(1)).cast("double").as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .cast("double").as("a1"),
        sum(when(col("l_linestatus") === "F", 1L).otherwise(0L))
          .cast("double").as("b1"),
        sum(when(col("l_returnflag") === "R" && col("l_linestatus") === "F",
          1L).otherwise(0L)).cast("double").as("ab1"),
        sum(when(year(col("l_shipdate")) >= 1995, 1L).otherwise(0L))
          .cast("double").as("a2"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L))
          .cast("double").as("b2"),
        sum(when(year(col("l_shipdate")) >= 1995 && col("l_quantity") > 25,
          1L).otherwise(0L)).cast("double").as("ab2"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L))
          .cast("double").as("a3"),
        sum(when(col("l_tax") > 0.04, 1L).otherwise(0L))
          .cast("double").as("b3"),
        sum(when(col("l_discount") > 0.05 && col("l_tax") > 0.04, 1L)
          .otherwise(0L)).cast("double").as("ab3"))
      def row(label: String, sa: String, sb: String, sab: String) =
        a.select(lit(label).as("predicate_pair"),
          round(col(sa) / col("n"), 6).as("sel_a"),
          round(col(sb) / col("n"), 6).as("sel_b"),
          round(col(sab) / col("n"), 6).as("sel_actual"),
          round(col(sa) * col(sb) / (col("n") * col("n")), 6).as("sel_indep"),
          round(col(sab) * col("n") / (col(sa) * col(sb)), 4)
            .as("corr_factor"))
      row("returnflag_linestatus", "a1", "b1", "ab1")
        .unionByName(row("shipyear_quantity", "a2", "b2", "ab2"))
        .unionByName(row("discount_tax", "a3", "b3", "ab3"))
        .orderBy(col("predicate_pair"))
    }),

    "q229_ipw_balance" -> ((s, dir) => {
      // inverse-propensity weighting balance check: treatment = deep
      // discount, covariate = quantity, propensity = treated share within
      // (returnflag, linestatus) strata. Standardized mean difference
      // before vs after weighting — the causal-analysis pre-flight. One
      // stratum aggregate (broadcast back, <= 6 rows) then one weighted
      // aggregate; weighted moments from Σw/Σwx/Σwx² (quantity is O(50),
      // no cancellation regime).
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          when(col("l_discount") >= 0.06, 1).otherwise(0).as("tr"),
          col("l_quantity").as("x"))
      val strata = li.groupBy(col("rf"), col("ls"))
        .agg(avg(col("tr").cast("double")).as("e"))
      val wted = li.join(broadcast(strata), Seq("rf", "ls"))
        .filter(col("e") > 0 && col("e") < 1)
        .withColumn("w", when(col("tr") === 1, lit(1.0) / col("e"))
          .otherwise(lit(1.0) / (lit(1.0) - col("e"))))
      val m = wted.agg(
        sum(when(col("tr") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("tr") === 0, 1L).otherwise(0L)).as("n_c"),
        avg(when(col("tr") === 1, col("x"))).as("mt"),
        avg(when(col("tr") === 0, col("x"))).as("mc"),
        avg(when(col("tr") === 1, col("x") * col("x"))).as("st"),
        avg(when(col("tr") === 0, col("x") * col("x"))).as("sc"),
        sum(when(col("tr") === 1, col("w"))).as("wt"),
        sum(when(col("tr") === 0, col("w"))).as("wc"),
        sum(when(col("tr") === 1, col("w") * col("x"))).as("wxt"),
        sum(when(col("tr") === 0, col("w") * col("x"))).as("wxc"),
        sum(when(col("tr") === 1, col("w") * col("x") * col("x"))).as("wxxt"),
        sum(when(col("tr") === 0, col("w") * col("x") * col("x"))).as("wxxc"))
      m.select(col("n_t"), col("n_c"),
        round((col("mt") - col("mc")) /
          sqrt(((col("st") - col("mt") * col("mt")) +
            (col("sc") - col("mc") * col("mc"))) / 2.0), 4).as("smd_before"),
        round((col("wxt") / col("wt") - col("wxc") / col("wc")) /
          sqrt(((col("wxxt") / col("wt") -
            (col("wxt") / col("wt")) * (col("wxt") / col("wt"))) +
            (col("wxxc") / col("wc") -
              (col("wxc") / col("wc")) * (col("wxc") / col("wc")))) / 2.0), 4)
          .as("smd_after"))
    }),

    "q230_did" -> ((s, dir) => {
      // difference-in-differences: ASIA-nation customers (treated) vs rest,
      // order values before/after the 1995 policy year — four cell means
      // from exact cents in ONE conditional aggregate after broadcast dim
      // joins, DiD and its pooled SE in closed form.
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"),
          when(col("r_name") === "ASIA", 1).otherwise(0).as("treat"))
      val o = t(s, dir, "orders")
        .select(col("o_custkey"),
          when(year(col("o_orderdate")) >= 1995, 1).otherwise(0).as("post"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .cast("double").as("cents"))
        .join(cust, col("o_custkey") === col("c_custkey"))
      def cell(t0: Int, p0: Int, c: String) =
        when(col("treat") === t0 && col("post") === p0, col(c))
      val m = o.agg(
        count(when(col("treat") === 1 && col("post") === 1, 1L)).as("n_t1"),
        count(when(col("treat") === 1 && col("post") === 0, 1L)).as("n_t0"),
        count(when(col("treat") === 0 && col("post") === 1, 1L)).as("n_c1"),
        count(when(col("treat") === 0 && col("post") === 0, 1L)).as("n_c0"),
        avg(cell(1, 1, "cents")).as("m_t1"), avg(cell(1, 0, "cents")).as("m_t0"),
        avg(cell(0, 1, "cents")).as("m_c1"), avg(cell(0, 0, "cents")).as("m_c0"),
        avg(cell(1, 1, "cents") * cell(1, 1, "cents")).as("s_t1"),
        avg(cell(1, 0, "cents") * cell(1, 0, "cents")).as("s_t0"),
        avg(cell(0, 1, "cents") * cell(0, 1, "cents")).as("s_c1"),
        avg(cell(0, 0, "cents") * cell(0, 0, "cents")).as("s_c0"))
      def v(mm: String, ss: String, nn: String) =
        (col(ss) - col(mm) * col(mm)) * col(nn).cast("double") /
          (col(nn) - 1).cast("double") / col(nn).cast("double")
      m.select(col("n_t1"), col("n_t0"), col("n_c1"), col("n_c0"),
        round(col("m_t1") / 100.0, 4).as("mean_treat_post"),
        round(col("m_t0") / 100.0, 4).as("mean_treat_pre"),
        round(col("m_c1") / 100.0, 4).as("mean_ctrl_post"),
        round(col("m_c0") / 100.0, 4).as("mean_ctrl_pre"),
        round((col("m_t1") - col("m_t0") - (col("m_c1") - col("m_c0"))) / 100.0,
          4).as("did"),
        round(sqrt(v("m_t1", "s_t1", "n_t1") + v("m_t0", "s_t0", "n_t0") +
          v("m_c1", "s_c1", "n_c1") + v("m_c0", "s_c0", "n_c0")) / 100.0, 4)
          .as("did_se"))
    }),

    "q225_dedup_threshold_curve" -> ((s, dir) => {
      // dedup operating curve: how many candidate pairs and distinct
      // member docs survive each similarity threshold — the table you read
      // before committing a cluster-merge cutoff. Pair-bounded counts only
      // (the pair set is the df-filtered n-gram join, never O(n^2)).
      import s.implicits._
      val pairs = Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("j"))
        .persist()  // one pair generation, six threshold slices
      val grid = Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8).toDF("thresh")
      val st = pairs.crossJoin(broadcast(grid)).filter(col("j") >= col("thresh"))
      val np = st.groupBy(col("thresh")).agg(count(lit(1)).as("n_pairs"))
      val nd = st.select(col("thresh"),
          explode(array(col("idA"), col("idB"))).as("id"))
        .groupBy(col("thresh")).agg(countDistinct(col("id")).as("n_docs"))
      np.join(nd, "thresh").orderBy(col("thresh"))
    }),

    "q226_sequential_ab" -> ((s, dir) => {
      // sequential-testing peeking curve: users hash-split A/B, the
      // two-sample z for mean event value recomputed at each day from
      // CUMULATIVE prefix sums (one day-grain window over the calendar-
      // bounded daily aggregate — never over raw events). The curve shows
      // what peeking does to a fixed-horizon test.
      val ev = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(expr("us div 86400000000").as("d"),
          pmod(graft.ops.Sampling.keyHash(col("user_id")), lit(2L)).as("arm"),
          col("value").as("v"))
      val daily = ev.groupBy(col("d"))
        .agg(sum(when(col("arm") === 0, col("v"))).as("sa"),
          sum(when(col("arm") === 0, col("v") * col("v"))).as("ssa"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1, col("v"))).as("sb"),
          sum(when(col("arm") === 1, col("v") * col("v"))).as("ssb"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("d"), sum(col("sa")).over(w).as("csa"),
          sum(col("ssa")).over(w).as("cssa"), sum(col("na")).over(w).as("cna"),
          sum(col("sb")).over(w).as("csb"), sum(col("ssb")).over(w).as("cssb"),
          sum(col("nb")).over(w).as("cnb"))
        .filter(col("cna") > 1 && col("cnb") > 1)
        .select(col("d"), (col("cna") + col("cnb")).as("n_total"),
          round((col("csa") / col("cna") - col("csb") / col("cnb")) /
            sqrt(
              (col("cssa") - col("csa") * col("csa") / col("cna")) /
                (col("cna") - 1) / col("cna") +
              (col("cssb") - col("csb") * col("csb") / col("cnb")) /
                (col("cnb") - 1) / col("cnb")), 4).as("z"))
        .orderBy(col("d"))
    }),

    "q227_watermark_sim" -> ((s, dir) => {
      // allowed-lateness decision table: for candidate watermark delays,
      // the fraction of each type's events a streaming job would drop —
      // q222's lateness measurement crossed with a 5-row broadcast grid,
      // one counts-only aggregate.
      import s.implicits._
      val ev = events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val late = ev.withColumn("late_s",
        (max(col("us")).over(w) - col("us")).cast("double") / lit(1e6))
      val grid = Seq(0L, 30L, 60L, 300L, 900L).toDF("delay_s")
      late.crossJoin(broadcast(grid))
        .groupBy(col("event_type"), col("delay_s"))
        .agg(sum(when(col("late_s") > col("delay_s").cast("double"), 1L)
            .otherwise(0L)).as("n_dropped"),
          round(avg(when(col("late_s") > col("delay_s").cast("double"), 1.0)
            .otherwise(0.0)), 6).as("drop_rate"))
        .orderBy(col("event_type"), col("delay_s"))
    }),

    "q222_late_arrival" -> ((s, dir) => {
      // out-of-orderness profile — the measurement that sizes a streaming
      // watermark: replay each type's events in arrival order (event_id),
      // track the running max timestamp, and score every event's lateness
      // against it. Per-type windows only (bounded by type cardinality,
      // never a global sort); percentile parity with quantile_cont is the
      // established q44 contract.
      val ev = events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("late_s",
          (max(col("us")).over(w) - col("us")).cast("double") / lit(1e6))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(avg(when(col("late_s") > 0, 1.0).otherwise(0.0)), 4)
            .as("pct_late"),
          round(expr("percentile(late_s, 0.95)"), 4).as("p95_late_s"),
          round(max(col("late_s")), 4).as("max_late_s"))
        .orderBy(col("event_type"))
    }),

    "q223_lsh_planner" -> ((s, dir) => {
      // LSH parameter planner: for each (bands, rows-per-band) config, the
      // s-curve collision probability 1-(1-j^r)^b integrated over the
      // corpus's MEASURED pair-similarity distribution — expected candidate
      // volume vs recall on the high-sim (>= 0.5) stratum. Reuses the exact
      // df-filtered n-gram pair machinery; the grid is 6 broadcast rows, so
      // the whole planner is one counts-only aggregate over pairs x grid.
      import s.implicits._
      val pairs = Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), "text",
          "doc_id", n = 3, threshold = 0.3, maxShingleFreq = 400)
        .select(round(col("jaccard"), 6).as("j"))
      val grid = Seq((4, 4), (8, 4), (8, 8), (16, 4), (16, 8), (32, 4))
        .toDF("bands", "rpb")
      pairs.crossJoin(broadcast(grid))
        .withColumn("p", lit(1.0) -
          pow(lit(1.0) - pow(col("j"), col("rpb").cast("double")),
            col("bands").cast("double")))
        .groupBy(col("bands"), col("rpb"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("p")), 2).as("exp_cands"),
          sum(when(col("j") >= 0.5, 1L).otherwise(0L)).as("n_pairs_05"),
          round(sum(when(col("j") >= 0.5, col("p"))) /
            sum(when(col("j") >= 0.5, 1.0)), 4).as("recall_05"))
        .orderBy(col("bands"), col("rpb"))
    }),

    "q224_encoding_audit" -> ((s, dir) => {
      // storage-layout encodability audit: per column, the distinct ratio
      // (dictionary-encodability) and mean run length in the table's
      // physical sort (RLE-ability), runs counted within each order's
      // line sequence — a per-order window, never a global sort. Counts
      // only; values are compared in their NATIVE type (a string cast
      // would couple the audit to engine float formatting).
      // (l_orderkey, l_linenumber) is NOT unique in this generator — the
      // window order must extend to (partkey, suppkey) to be total, or the
      // run counts become engine-tie-order-dependent
      val li = t(s, dir, "lineitem")
      def audit(c: String): DataFrame = {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col(c).as("v"))
          .withColumn("prev", lag(col("v"), 1).over(w))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("v")).as("n_distinct"),
            sum(when(col("prev").isNull || col("prev") =!= col("v"), 1L)
              .otherwise(0L)).as("n_runs"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_distinct"),
            round(col("n_distinct").cast("double") / col("n_rows").cast("double"), 6)
              .as("distinct_ratio"),
            round(col("n_rows").cast("double") / col("n_runs").cast("double"), 4)
              .as("avg_run_len"))
      }
      audit("l_returnflag").unionByName(audit("l_linestatus"))
        .unionByName(audit("l_quantity")).unionByName(audit("l_partkey"))
        .orderBy(col("column_name"))
    }),

    "q219_readability" -> ((s, dir) => {
      // Flesch reading-ease profile per language: words as letter runs,
      // sentences as terminal-punctuation marks (clamped >= 1), syllables
      // approximated as vowel groups — every count from
      // regexp_extract_all with an EXPLICIT group 0 (Spark defaults to
      // group 1, DuckDB to 0; the shared dialect is spelled out). One
      // narrow projection then one aggregate per language.
      t(s, dir, "documents")
        .select(col("lang"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).as("w"),
          greatest(size(expr("regexp_extract_all(text, '[.!?]', 0)")), lit(1))
            .as("snt"),
          size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
            .as("syl"))
        .filter(col("w") > 0)
        .withColumn("flesch",
          lit(206.835) - lit(1.015) * col("w").cast("double") / col("snt").cast("double") -
            lit(84.6) * col("syl").cast("double") / col("w").cast("double"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("w").cast("double") / col("snt").cast("double")), 4)
            .as("words_per_sentence"),
          round(avg(col("syl").cast("double") / col("w").cast("double")), 4)
            .as("syllables_per_word"),
          round(avg(col("flesch")), 4).as("avg_flesch"))
        .orderBy(col("lang"))
    }),

    "q220_price_index" -> ((s, dir) => {
      // Laspeyres price index by ship year: base-year (corpus minimum)
      // part quantities weight each later year's unit prices, index_t =
      // sum(p_t q_0) / sum(p_0 q_0) over parts present in both years.
      // One (part, year) aggregate, the base-year slice joined back by
      // part key, one counts+sums pass per year — no row ever carries
      // more than its own part's state.
      val py = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"),
          year(col("l_shipdate")).cast("long").as("yr"))
        .agg((sum(col("l_extendedprice")) / sum(col("l_quantity"))).as("p"),
          sum(col("l_quantity")).as("q"))
        .persist()  // base-year slice + per-year pass (one lineitem scan)
      val y0 = py.agg(min(col("yr")).as("base_yr"))
      val base = py.crossJoin(broadcast(y0))
        .filter(col("yr") === col("base_yr"))
        .select(col("pk"), col("p").as("p0"), col("q").as("q0"))
      py.join(base, "pk")
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n_parts"),
          round(sum(col("p") * col("q0")) / sum(col("p0") * col("q0")), 4)
            .as("laspeyres"))
        .orderBy(col("yr"))
    }),

    "q221_calendar_anomalies" -> ((s, dir) => {
      // calendar anomaly screen: each day's total scored against its
      // day-of-week baseline (mean/sd over the whole series, portable
      // epoch-day dow arithmetic); top 10 |z| days. The baseline join is
      // 7 broadcast rows; the series is calendar-bounded.
      val daily = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(expr("us div 86400000000").as("d"))
        .agg(sum(col("value")).as("v"))
        .withColumn("dow", pmod(col("d") + 3, lit(7L)))
        .persist()  // baseline aggregate + the scored join
      val base = daily.groupBy(col("dow"))
        .agg(avg(col("v")).as("mu"),
          sqrt(avg(col("v") * col("v")) - avg(col("v")) * avg(col("v")))
            .as("sd"))
      daily.join(broadcast(base), "dow")
        .filter(col("sd") > 0)
        .select(col("d"), col("dow"), round(col("v"), 2).as("v"),
          round((col("v") - col("mu")) / col("sd"), 4).as("z"))
        .orderBy(abs(col("z")).desc, col("d"))
        .limit(10)
    }),

    "q216_seasonal_decompose" -> ((s, dir) => {
      // classical additive decomposition of the daily event-value series:
      // trend = centered 7-day moving average (full windows only),
      // seasonal = day-of-week mean of the detrended series, residual sd
      // per dow. The dow comes from pure epoch-day arithmetic ((d+3)%7,
      // Monday=0) — engine dayofweek() conventions differ, integer math
      // doesn't. The global window runs over the DAILY series (calendar-
      // bounded, ~tens of rows), never over raw events.
      val daily = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(expr("us div 86400000000").as("d"))
        .agg(sum(col("value")).as("v"))
      val w = Window.orderBy(col("d")).rowsBetween(-3, 3)
      val detr = daily
        .withColumn("trend", avg(col("v")).over(w))
        .withColumn("wn", count(lit(1)).over(w))
        .filter(col("wn") === 7)
        .select(pmod(col("d") + 3, lit(7L)).as("dow"),
          (col("v") - col("trend")).as("detr"))
        .persist()  // dow means + residual pass
      val dowMean = detr.groupBy(col("dow"))
        .agg(avg(col("detr")).as("seasonal"), count(lit(1)).as("n_days"))
      detr.join(broadcast(dowMean), "dow")
        .groupBy(col("dow"))
        .agg(first(col("n_days")).as("n_days"),
          round(first(col("seasonal")), 4).as("seasonal"),
          round(sqrt(avg((col("detr") - col("seasonal")) *
            (col("detr") - col("seasonal")))), 4).as("resid_sd"))
        .orderBy(col("dow"))
    }),

    "q217_jackknife_ci" -> ((s, dir) => {
      // delete-one-bucket jackknife CI for the mean order value: 50
      // deterministic hash buckets, leave-one-out means from (bucket sum,
      // bucket n) against broadcast totals, SE = sqrt((B-1)/B * sum
      // (m_i - mbar)^2). Two counts-only aggregate phases and a broadcast
      // scalar — the resampling classic with zero data re-shuffles, exact
      // cents until the final divisions.
      val b = t(s, dir, "orders")
        .select(pmod(graft.ops.Sampling.keyHash(col("o_orderkey")), lit(50L))
          .as("bk"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy(col("bk"))
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
        .persist()  // totals + leave-one-out rows (one orders scan, not two)
      val tot = b.agg(sum(col("s")).as("st"), sum(col("n")).as("nt"),
        count(lit(1)).as("nb"))
      val loo = b.crossJoin(broadcast(tot))
        .select(col("st"), col("nt"), col("nb"),
          ((col("st") - col("s")).cast("double") /
            (col("nt") - col("n")).cast("double")).as("m_i"))
      // centered sum of squares (mbar broadcast back) — the uncentered
      // sq - B*mbar^2 form cancels catastrophically when the loo spread is
      // tiny relative to the mean and flips the 4th decimal across engines
      val mb = loo.agg(avg(col("m_i")).as("mbar"))
      loo.crossJoin(broadcast(mb))
        .groupBy(col("st"), col("nt"), col("nb"))
        .agg(sum((col("m_i") - col("mbar")) * (col("m_i") - col("mbar")))
          .as("ss"))
        .select(col("nt").as("n_orders"),
          round(col("st").cast("double") / col("nt").cast("double") / 100.0, 4)
            .as("mean_value"),
          round(sqrt((col("nb") - 1).cast("double") / col("nb").cast("double") *
            col("ss")) / 100.0, 4)
            .as("jk_se"))
        .select(col("n_orders"), col("mean_value"), col("jk_se"),
          round(col("mean_value") - lit(1.96) * col("jk_se"), 4).as("ci_lo"),
          round(col("mean_value") + lit(1.96) * col("jk_se"), 4).as("ci_hi"))
    }),

    "q218_assortativity" -> ((s, dir) => {
      // degree assortativity of the customer-supplier purchase graph: do
      // high-degree customers buy from high-degree suppliers? Distinct
      // edge list from one join, per-side degree counts, then Pearson r
      // over edge endpoint degrees in ONE closed-form aggregate. Degrees
      // join back by key (broadcast-sized dims at this sf, shuffle joins
      // at scale) — integer sums stay exact throughout.
      val edges = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct()
        .persist()  // degree counts x2 + the edge-level join
      val dc = edges.groupBy(col("c")).agg(count(lit(1)).as("dc"))
      val ds = edges.groupBy(col("sp")).agg(count(lit(1)).as("ds"))
      edges.join(dc, "c").join(ds, "sp")
        .agg(count(lit(1)).as("n_edges"),
          countDistinct(col("c")).as("n_cust"),
          countDistinct(col("sp")).as("n_supp"),
          sum(col("dc")).as("sx"), sum(col("ds")).as("sy"),
          sum(col("dc") * col("ds")).as("sxy"),
          sum(col("dc") * col("dc")).as("sxx"),
          sum(col("ds") * col("ds")).as("syy"))
        .select(col("n_edges"), col("n_cust"), col("n_supp"),
          round((col("n_edges") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            sqrt((col("n_edges") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n_edges") * col("syy") - col("sy") * col("sy"))
                .cast("double")), 4).as("assortativity"))
    }),

    "q213_ccf" -> ((s, dir) => {
      // cross-correlogram: Pearson correlation between every ordered pair
      // of event-type daily-total series at lags 0..5 (does type A lead
      // type B?). The lag join is an equi-join on the SHIFTED day index —
      // |lags| x |days| x |type-pairs| rows, never corpus-sized — and each
      // correlation is one closed-form aggregate of exact daily sums.
      val daily = events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("event_type"), expr("us div 86400000000").as("d"))
        .agg(sum(col("value")).as("v"))
        .persist()  // both sides of the lag join
      val lags = s.range(6).select(col("id").as("lag_d"))
      val a = daily.select(col("event_type").as("t1"), col("d"), col("v").as("x"))
      val b = daily.select(col("event_type").as("t2"), col("d").as("db"),
        col("v").as("y"))
      a.crossJoin(broadcast(lags))
        .join(b, col("db") === col("d") + col("lag_d"))
        .filter(col("t1") =!= col("t2"))
        .groupBy(col("t1"), col("t2"), col("lag_d"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("t1"), col("t2"), col("lag_d"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r"))
        .orderBy(col("t1"), col("t2"), col("lag_d"))
    }),

    "q214_croston" -> ((s, dir) => {
      // Croston intermittent-demand forecast at the part grain: weekly
      // demand is sparse per part, so the estimate is mean nonzero demand
      // size z over mean inter-demand interval p (= weeks span / n active
      // weeks), next to the dense naive mean. One (part, week) aggregate
      // then one per-part aggregate — bounded state, counts-only shuffles;
      // output a deterministic 1-in-50 key sample.
      val weekly = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"),
          ((year(col("l_shipdate")) - 1992) * 53 + weekofyear(col("l_shipdate")))
            .cast("long").as("wk"))
        .agg(sum(col("l_quantity")).as("q"))
        .persist()  // span scalar + per-part rollup
      val span = weekly.agg((max(col("wk")) - min(col("wk")) + 1)
        .cast("double").as("total_weeks"))
      weekly.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_active"), sum(col("q")).as("total_q"),
          avg(col("q")).as("z"))
        .crossJoin(broadcast(span))
        .select(col("l_partkey"), col("n_active"),
          round(col("z"), 4).as("z"),
          round(col("total_weeks") / col("n_active").cast("double"), 4).as("p"),
          round(col("z") * col("n_active").cast("double") / col("total_weeks"), 4)
            .as("croston_f"),
          round(col("total_q") / col("total_weeks"), 4).as("naive_f"))
        .filter(pmod(graft.ops.Sampling.keyHash(col("l_partkey")), lit(50L)) === 0)
        .orderBy(col("l_partkey"))
    }),

    "q215_skew_audit" -> ((s, dir) => {
      // join-key skew report — the pre-flight for SkewJoin/AQE decisions:
      // for each candidate join key, the per-key count distribution (p50/
      // p99/max), the top-key share, and the salt factor that would level
      // the hottest key to the median task. Two counts-only phases: per-key
      // counts (partial aggs absorb the skew being measured), then one
      // bounded stats row per audited key column.
      def audit(df: DataFrame, key: String): DataFrame = {
        val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        counts.agg(
          count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          expr("CAST(percentile(c, 0.5) AS DOUBLE)").as("p50"),
          expr("CAST(percentile(c, 0.99) AS DOUBLE)").as("p99"),
          max(col("c")).as("max_c"))
          .select(lit(key).as("key_col"), col("n_keys"), col("n_rows"),
            col("p50"), col("p99"), col("max_c"),
            round(col("max_c").cast("double") / col("n_rows").cast("double"), 6)
              .as("top_share"),
            ceil(col("max_c").cast("double") / col("p50")).cast("long")
              .as("salt_factor"))
      }
      val li = t(s, dir, "lineitem")
      audit(li, "l_partkey")
        .unionByName(audit(li, "l_suppkey"))
        .unionByName(audit(t(s, dir, "orders"), "o_custkey"))
        .orderBy(col("key_col"))
    }),

    "q212_minhash_setsim" -> ((s, dir) => {
      // sketch-accuracy gauge: per event-type pair, the k=64 minwise
      // estimate of user-set Jaccard next to the exact value. Signatures
      // are ONE number per (type, seed) — 64 seeds x |types| rows of
      // state regardless of corpus size — and the exact side self-joins
      // on user_id (each user carries <= |types| rows, so the pair fan-out
      // is bounded per key). The hash is the engine's portable keyHash,
      // seed-mixed additively, so DuckDB reproduces every signature bit.
      val ue = events(s, dir)
        .select(col("event_type").as("et"), col("user_id").as("u"))
        .distinct()
        .persist()  // feeds signatures, per-type counts, and the exact self-join
      val seeds = s.range(64).select(col("id").as("sd"))
      val mh = ue.crossJoin(broadcast(seeds))
        .select(col("et"), col("sd"),
          graft.ops.Sampling.keyHash(col("u") + col("sd") * lit(1000003L))
            .as("h"))
        .groupBy(col("et"), col("sd")).agg(min(col("h")).as("mn"))
        .persist()  // both sides of the signature self-join
      val est = mh.as("a")
        .join(mh.as("b"), col("a.sd") === col("b.sd") &&
          col("a.et") < col("b.et"))
        .groupBy(col("a.et").as("t1"), col("b.et").as("t2"))
        .agg((sum(when(col("a.mn") === col("b.mn"), 1L).otherwise(0L))
          .cast("double") / lit(64.0)).as("est_raw"))
      val cnt = ue.groupBy(col("et")).agg(count(lit(1)).as("n"))
      val inter = ue.as("x")
        .join(ue.as("y"), col("x.u") === col("y.u") &&
          col("x.et") < col("y.et"))
        .groupBy(col("x.et").as("t1"), col("y.et").as("t2"))
        .agg(count(lit(1)).as("n_ab"))
      inter
        .join(broadcast(cnt.select(col("et").as("t1"), col("n").as("n1"))), "t1")
        .join(broadcast(cnt.select(col("et").as("t2"), col("n").as("n2"))), "t2")
        .join(est, Seq("t1", "t2"))
        .select(col("t1"), col("t2"), col("n_ab"),
          round(col("n_ab").cast("double") /
            (col("n1") + col("n2") - col("n_ab")).cast("double"), 4)
            .as("exact_jaccard"),
          round(col("est_raw"), 4).as("minhash_est"))
        .orderBy(col("t1"), col("t2"))
    }),

    "q99_quantile_filter" -> ((s, dir) => {
      // per-language top-20% quality cut (exact percent_rank semantics —
      // the cut point is a rational, never a float threshold; the
      // filter-only approx scale path is proven equivalent-at-accuracy in
      // SamplingSpec).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TF.qualityScore(col("text")).as("quality"))
      Sampling.topQuantileByGroup(docs, "lang", "quality", "doc_id", 0.8)
        .select(col("doc_id"), col("lang"),
          round(col("quality"), 6).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "q63_weighted_sample" -> ((s, dir) => {
      // quality-weighted deterministic sampling: each doc kept with
      // probability quality/2, decided by the stable key hash — the
      // data-mixing primitive (upweight clean text) with layout- and
      // engine-independent reproducibility. quality is a per-row scalar
      // composite of integer-derived ratios, so both engines compute the
      // identical double and the floor() cut agrees bitwise.
      val docs = t(s, dir, "documents")
        .withColumn("quality", TF.qualityScore(col("text")))
      docs.filter(pmod(graft.ops.Sampling.keyHash(col("doc_id")), lit(10000)) <
          floor(col("quality") * lit(5000)))
        .select(col("doc_id"), col("lang"), round(col("quality"), 6).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "q64_token_budget" -> ((s, dir) => {
      // per-language token-budget packing: take documents in (quality desc,
      // doc_id) order until the cumulative token count exceeds the budget —
      // the data-mixture assembly step. Ranked on the ROUNDED quality so
      // the oracle's ordering can't diverge on last-ulp differences. At
      // corpus scale the budget cut means only each language's head sorts;
      // a pre-filter on an approximate quality threshold bounds the window
      // input before the per-language sort.
      val budget = 3000L
      val docs = t(s, dir, "documents")
        .withColumn("quality_r", round(TF.qualityScore(col("text")), 6))
        .withColumn("n_tokens", TF.tokenCount(col("text")).cast("long"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality_r").desc, col("doc_id"))
      docs.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= budget)
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    "q59_repetition" -> ((s, dir) => {
      // repetition-based quality signals (duplicate-ngram fraction + most
      // frequent token share) — the boilerplate/looping-text filters every
      // training-data pipeline applies
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), TF.normTokens(col("text")).as("toks"),
          round(TF.dupNgramFrac(col("text"), 3), 6).as("dup_3gram_frac"))
      val top = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("maxc"), sum(col("c")).as("total"))
        .select(col("doc_id"),
          round(col("maxc").cast("double") / col("total").cast("double"), 6)
            .as("top_token_frac"))
      toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
          col("dup_3gram_frac"))
        .join(top, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    "q60_pii_redact" -> ((s, dir) => {
      // regex PII scrub: the fixture has no natural PII, so each doc is
      // deterministically augmented with an email (+ a phone for even ids),
      // then redacted; output = match count + scrubbed text
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit(" or +1-555-010"), pmod(col("doc_id"), lit(10)).cast("string")))
            .otherwise(lit("")),
          lit(" now")).as("aug"))
      aug.select(col("doc_id"),
          TF.piiCount(col("aug")).as("n_pii"),
          TF.redactPii(col("aug")).as("redacted"))
        .orderBy(col("doc_id"))
    }),

    "q61_contamination" -> ((s, dir) => {
      // benchmark-contamination screen: corpus docs sharing >= 5 distinct
      // word 3-grams with a "benchmark" set (docs 0-49 stand in) get
      // flagged — the n-gram-overlap decontamination step of a training
      // pipeline. Pure 8-byte gram-hash equi-join; the benchmark posting
      // list is the small side.
      val grams = t(s, dir, "documents").select(col("doc_id"),
        explode(array_distinct(
          graft.expressions.TextExpressions.ngramHashes(
            TF.normTokens(col("text")), 3))).as("g"))
      val bench = grams.filter(col("doc_id") < 50).select(col("g")).distinct()
      grams.filter(col("doc_id") >= 50)
        .join(bench, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5)
        .orderBy(col("doc_id"))
    }),

    // ---- events: windowed + sessionized analytics -----------------------
    "q29_events_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).cast("long").as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    }),

    "q30_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
        .orderBy(col("user_id"))
    }),

    // ---- multimodal plumbing -------------------------------------------
    "q31_multimodal_stats" -> ((s, dir) => {
      val withBin = Multimodal.withBinaryPayload(t(s, dir, "documents"), "text")
      Multimodal.withPayloadStats(withBin, "payload")
        .groupBy(col("source"))
        .agg(sum(col("n_bytes")).as("total_bytes"), count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    "q62_frame_sample" -> ((s, dir) => {
      // video-style frame sampling over opaque binary payloads: n evenly
      // spaced fixed-size slices per payload, with the frame index — the
      // access pattern a real codec binding plugs into (llm.Multimodal).
      // The operator slices BYTES; DuckDB can only slice characters, so the
      // query restricts to docs where char length == byte length (pure
      // ASCII) — making the byte/char equivalence structural rather than a
      // property of the current fixture.
      val withBin = Multimodal.withBinaryPayload(
        t(s, dir, "documents")
          .filter(col("doc_id") < 100 &&
            length(col("text")) === octet_length(col("text"))), "text")
      Multimodal.frameSample(withBin, "payload", n = 4, frameBytes = 16)
        .select(col("doc_id"), col("frame_idx"),
          decode(col("frame"), "UTF-8").as("frame_str"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // ---- I/O surface: round trips through the engine's file tables ------
    "q32_orc_roundtrip" -> ((s, dir) => {
      // lineitem -> snappy ORC -> read back -> aggregate (SURVEY.md A4/A5/A21)
      val path = s"${sys.props("java.io.tmpdir")}/graft_q32_orc"
      // repartition before write: a filtered slice should not fan out into
      // one tiny file per input partition (small-files discipline), and
      // repartition (unlike coalesce) keeps the scan+filter fully parallel
      val src = t(s, dir, "lineitem").filter(col("l_shipdate") >= lit("1996-01-01"))
        .repartition(4)
      graft.io.OrcTable(path).write(src, options = Map("compression" -> "snappy"))
      graft.io.OrcTable(path).read(s)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    "q33_text_roundtrip" -> ((s, dir) => {
      // customer -> pipe-delimited text -> read with DDL schema (A9, TextDelimited)
      val path = s"${sys.props("java.io.tmpdir")}/graft_q33_text"
      val tbl = graft.io.TextTable(path,
        graft.io.SchemaSpec.Ddl(
          "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"),
        delimiter = "|")
      tbl.write(t(s, dir, "customer").repartition(4))
      tbl.read(s)
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("c_acctbal")), 2).as("sum_bal"), count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    "q34_partition_prune" -> ((s, dir) => {
      // write partitioned by derived year, read back pruned via the
      // reference's filter-string grammar (A11/A12)
      val path = s"${sys.props("java.io.tmpdir")}/graft_q34_part"
      // one file per partition value: repartition on the partition column
      // before a partitionBy write (the layout a partitioned table wants)
      t(s, dir, "orders").withColumn("yr", year(col("o_orderdate")))
        .repartition(col("yr"))
        .write.mode("overwrite").partitionBy("yr").parquet(path)
      s.read.parquet(path)
        .filter(graft.catalog.PartitionFilter.parse("yr=1995 or yr=1996"))
        .countBy(Seq("o_orderpriority"), "n_orders")
    }),

    "q35_coln_convention" -> ((s, dir) => {
      // _colN naming for unnamed outputs (A8)
      t(s, dir, "documents").select(col("lang"))
        .withDefaultColNames
        .countBy(Seq("_col0"))
    }),

    "q68_rcfile_roundtrip" -> ((s, dir) => {
      // A1/A2: Hive RCFile sink+scan over the reference's full type spread
      // (RCFile.java:256-301) — derive one column per Hive physical type
      // from nation, insertByName into a STORED AS RCFILE table, read back
      // through the Hive SerDe, and project to oracle-comparable types. The
      // oracle recomputes the same derivations straight from nation.parquet,
      // so ANY serde lossiness (truncation, tz shift, decimal rescale,
      // binary mangling) breaks the hash.
      s.sql("CREATE DATABASE IF NOT EXISTS graft_ck")
      s.sql("DROP TABLE IF EXISTS graft_ck.q68_rc")
      s.sql("""CREATE TABLE graft_ck.q68_rc (
          n_nationkey INT, tiny_v TINYINT, small_v SMALLINT, big_v BIGINT,
          fl_v FLOAT, dbl_v DOUBLE, dec_v DECIMAL(12,2), flag BOOLEAN,
          blob BINARY, comment_s STRING, ts TIMESTAMP) STORED AS RCFILE""")
      val src = t(s, dir, "nation").select(
        col("n_nationkey"),
        col("n_nationkey").cast("tinyint").as("tiny_v"),
        (col("n_nationkey") * 100).cast("smallint").as("small_v"),
        (col("n_nationkey").cast("long") * 1000000007L).as("big_v"),
        // 0.25/0.125 steps are exact in binary fp: float == double on read-back
        (col("n_nationkey") * 0.25).cast("float").as("fl_v"),
        (col("n_nationkey") * 0.125 + length(col("n_name"))).as("dbl_v"),
        ((col("n_nationkey") * 123 + 45).cast("decimal(10,0)") / 100)
          .cast("decimal(12,2)").as("dec_v"),
        (pmod(col("n_nationkey"), lit(2)) === 0).as("flag"),
        encode(col("n_name"), "UTF-8").as("blob"),
        concat(col("n_name"), lit(" | nation #"), col("n_nationkey"))
          .as("comment_s"),
        to_timestamp(date_add(lit("1995-01-01").cast("date"), col("n_nationkey")))
          .as("ts"))
      graft.catalog.CatalogTable("graft_ck", "q68_rc").insertByName(src)
      s.table("graft_ck.q68_rc").select(
        col("n_nationkey").cast("long").as("n_nationkey"),
        col("tiny_v").cast("long").as("tiny_v"),
        col("small_v").cast("long").as("small_v"),
        col("big_v"),
        col("fl_v").cast("double").as("fl_v"),
        col("dbl_v"),
        col("dec_v").cast("double").as("dec_v"),
        col("flag"),
        col("blob").cast("string").as("blob_str"),
        col("comment_s"),
        col("ts").cast("long").as("ts_epoch"))
        .orderBy(col("n_nationkey"))
    }),

    "q69_dynpart_insert" -> ((s, dir) => {
      // A15: by-name alignment with null-fill + dynamic MULTI-partition
      // insert in one commit (DefaultHCatScheme.java:120-149): the input
      // arrives with columns out of order, one extra column, one table
      // column missing (null-filled), and rows spanning all 5 priorities.
      s.sql("CREATE DATABASE IF NOT EXISTS graft_ck")
      s.sql("DROP TABLE IF EXISTS graft_ck.q69_part")
      s.sql("""CREATE TABLE graft_ck.q69_part (
          o_orderkey BIGINT, o_totalprice DOUBLE, missing_col STRING,
          o_orderpriority STRING)
        USING parquet PARTITIONED BY (o_orderpriority)""")
      s.conf.set("hive.exec.dynamic.partition.mode", "nonstrict")
      val src = t(s, dir, "orders").filter(col("o_orderkey") < 5000)
        .select(col("o_orderpriority"), col("o_totalprice"),
          col("o_orderkey"), lit("junk").as("extra_col"))
      graft.catalog.CatalogTable("graft_ck", "q69_part").insertByName(src)
      s.table("graft_ck.q69_part")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          count(col("missing_col")).as("n_filled"))
        .orderBy(col("o_orderpriority"))
    }),

    "q70_relocate_readback" -> ((s, dir) => {
      // A16: external write + commit-time ALTER TABLE SET LOCATION
      // (HCatTap.java:184-195), then a catalog read from the new location —
      // the read-back is what proves the repoint committed.
      s.sql("CREATE DATABASE IF NOT EXISTS graft_ck")
      s.sql("DROP TABLE IF EXISTS graft_ck.q70_reloc")
      s.sql("""CREATE TABLE graft_ck.q70_reloc (
          c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE) USING parquet""")
      val path = scratchDir("q70_reloc")
      val ct = graft.catalog.CatalogTable("graft_ck", "q70_reloc")
      ct.writeAndRelocate(
        t(s, dir, "customer").filter(col("c_custkey") <= 100)
          .select(col("c_custkey").cast("long").as("c_custkey"),
            col("c_name"), col("c_acctbal")),
        path)
      ct.read(s)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    "q71_regex_exclusion" -> ((s, dir) => {
      // A13: regex file exclusion (`hive-tap.path.partition.file.ignore-regex`,
      // CascadingHCatUtil.java:114-138) proved end-to-end: a decoy parquet
      // file matching the regex sits inside the directory with a full copy
      // of the data — including it would double every count, so oracle
      // equality IS the exclusion proof.
      val root = scratchDir("q71_excl")
      val src = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      src.write.mode("overwrite").parquet(s"$root/data")
      src.write.mode("overwrite").parquet(s"$root/decoy")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/decoy"))
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (st, i) =>
          fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(s"$root/data/copy_$i.parquet"))
        }
      graft.catalog.CatalogTable
        .readExcluding(s, s"$root/data", "parquet", ".*copy_.*")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("s_acctbal")), 2).as("sum_bal"))
        .orderBy(col("s_nationkey"))
    }),

    "q74_compaction" -> ((s, dir) => {
      // small-files compaction (staging + swap): 24 tiny files rewritten to
      // ceil(bytes/target) = 1. The oracle recomputes the aggregate straight
      // from supplier — a lost or duplicated row in the rewrite breaks the
      // hash; the observed file-count contraction rides along as a flag.
      val root = scratchDir("q74_comp")
      val data = s"$root/supplier"
      t(s, dir, "supplier").repartition(24).write.parquet(data)
      val before = graft.io.Compaction.dataFileCount(s, data)
      val bytes  = graft.io.Compaction.dataBytes(s, data)
      val after  = graft.io.Compaction.compact(s, data, "parquet", targetBytes = bytes)
      s.read.parquet(data)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("sum_bal"))
        .withColumn("compacted_to_one_file",
          lit(if (after == 1 && before > 1) 1L else 0L))
        .orderBy(col("s_nationkey"))
    }),

    "q75_typed_source" -> ((s, dir) => {
      // A20: typed case-class Dataset round trip through the ORC source —
      // the Scalding-style typed surface over the same files.
      import s.implicits._
      val path = scratchDir("q75_typed") + "/supplier_orc"
      val src = t(s, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("int").as("s_nationkey"),
          col("s_acctbal").cast("double").as("s_acctbal"))
        .as[SupplierTyped]
      graft.io.TypedSources.writeOrc(src, path)
      graft.io.TypedSources.orc[SupplierTyped](s, path)
        .filter(col("s_acctbal") > 0)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("sum_bal"))
        .orderBy(col("s_nationkey"))
    }),

    "q36_stream_windowed" -> ((s, dir) => {
      // the streaming transform applied in batch mode (same plan shape)
      graft.streaming.EventStreams
        .windowedStats(events(s, dir), "1 hour", "1 hour", "2 hours")
        .select(col("window_start").cast("long").as("window_start"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    "q53_sample_by_key" -> ((s, dir) => {
      // key-stable 10% sample of documents: same docs selected on any
      // engine/layout (ops.Sampling)
      graft.ops.Sampling.sampleByKey(t(s, dir, "documents"), "doc_id", 10)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "q54_stratified_sample" -> ((s, dir) => {
      // at most 5 docs per language, chosen deterministically by key hash
      graft.ops.Sampling.stratifiedSample(
          t(s, dir, "documents"), "lang", "doc_id", 5)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    "q51_outer_join" -> ((s, dir) => {
      // full outer: nations present in customers vs suppliers, null-safe
      val cn = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, col("nk") === col("snk"), "full_outer")
        .select(coalesce(col("nk"), col("snk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    "q52_window_analytic" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          first(col("o_orderkey")).over(wf).as("first_key"),
          last(col("o_orderkey")).over(wf).as("last_key"),
          count(lit(1)).over(wf).as("n_in_group"),
          round(max(col("o_totalprice")).over(wf) - min(col("o_totalprice")).over(wf), 2)
            .as("price_range"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q50_corpus_filter" -> ((s, dir) => {
      // the composed training-data gate: quality threshold + language
      // selection + length band, then per-source survival stats
      val docs = t(s, dir, "documents")
        .withColumn("quality", TF.qualityScore(col("text")))
        .withColumn("lang_pred", TF.langIdHeuristic(col("text")))
        .withColumn("n_tokens", TF.tokenCount(col("text")).cast("long"))
      docs
        .filter(col("quality") >= 0.5 && col("lang_pred") === "en" &&
          col("n_tokens").between(10, 10000))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          round(avg(col("quality")), 6).as("avg_quality"),
          sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("source"))
    }),

    "q49_json_parse" -> ((s, dir) => {
      // from_json over the events props column (A18's inverse direction)
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), graft.schema.HiveDdl.parse("k INT"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    "q47_setops_all" -> ((s, dir) => {
      // multiset set ops (ALL variants keep duplicates)
      val a = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      a.intersectAll(b).countBy(Seq("nk"), "n_inter")
    }),

    "q48_tfidf" -> ((s, dir) => {
      // top term per document by TF-IDF; ranked on the ROUNDED score so the
      // oracle's ranking can't diverge on last-ulp log() differences
      val scores = TF.tfidf(t(s, dir, "documents"), "text", "doc_id")
        .withColumn("tfidf_r", round(col("tfidf"), 6))
      val w = Window.partitionBy(col("doc"))
        .orderBy(col("tfidf_r").desc, col("term"))
      scores
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc").as("doc_id"), col("term").as("top_term"),
          col("tf"), col("tfidf_r").as("tfidf"))
        .orderBy(col("doc_id"))
    }),

    "q43_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"))
        .orderBy(col("l_returnflag"))
    }),

    "q66_hll_distinct" -> ((s, dir) => {
      // HyperLogLog distinct counts as the scale path for exact
      // count_distinct (bounded sketch state vs a full dedup shuffle).
      // Exact values are DuckDB-oracled; the sketch's relative-error flags
      // are deterministically 1 (same hashes, same merge result regardless
      // of order — HLL registers are a max, which commutes).
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
        .select(col("l_returnflag"), col("exact_parts"),
          when(abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * 0.05, 1L).otherwise(0L).as("approx_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    "q67_bloom_blocklist" -> ((s, dir) => {
      // Bloom-filter membership as a pre-join/blocklist filter: build the
      // filter from supplier keys, pre-filter lineitem with might_contain,
      // then verify with the exact join. Blooms have NO false negatives,
      // so every true match survives the pre-filter (missed_true_rows = 0
      // by construction); n_true_rows is DuckDB-recomputable; the
      // candidate set is a superset (flag pinned 1). This is the manual
      // form of the runtime bloom pruning GraftSession enables globally.
      GraftFunctions.register(s)
      val suppKeys = t(s, dir, "supplier")
        .filter(col("s_nationkey") === 7).select(col("s_suppkey"))
      suppKeys.agg(expr("graft_bloom_agg(s_suppkey, 1000L, 8000L)").as("bf"))
        .createOrReplaceTempView("graft_q67_bloom")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      // scalar subquery: the bloom binary is computed once and broadcast
      // into the codegen'd might_contain predicate on the probe side
      val cand = li.filter(expr(
          "graft_bloom_might_contain((SELECT bf FROM graft_q67_bloom), l_suppkey)"))
        .select(col("l_orderkey"), col("l_suppkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val trueRows = li.join(broadcast(suppKeys),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val missed = trueRows.exceptAll(cand)
        .agg(count(lit(1)).as("value"))
        .select(lit("missed_true_rows").as("metric"), col("value"))
      val nTrue = trueRows.agg(count(lit(1)).as("value"))
        .select(lit("n_true_rows").as("metric"), col("value"))
      val superset = cand.agg(count(lit(1)).as("nc"))
        .crossJoin(trueRows.agg(count(lit(1)).as("nt")))
        .select(lit("candidates_cover_true").as("metric"),
          when(col("nc") >= col("nt"), 1L).otherwise(0L).as("value"))
      missed.union(nTrue).union(superset).orderBy(col("metric"))
    }),

    "q44_percentiles" -> ((s, dir) => {
      // one percentile aggregate for all three quantiles: a single counts
      // buffer per group instead of three (3x the state, heavy GC)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p90"),
          round(element_at(col("ps"), 3), 4).as("p99"))
        .orderBy(col("l_returnflag"))
    }),

    "q55_approx_percentiles" -> ((s, dir) => {
      // scale path for q44: approx_percentile's quantile sketch keeps
      // bounded O(1/eps) state per group, where exact percentile buffers
      // every value (fine as oracle at sf0.1, unbounded memory at 100x).
      // The sketch's rank-error bound holds under any partial-merge order,
      // so the within-tolerance flags are deterministically 1; exact values
      // are oracled via DuckDB quantile_cont.
      val agged = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("ex"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)")
            .as("ap"))
      def okCol(i: Int) = when(
        abs(element_at(col("ap"), i) - element_at(col("ex"), i)) <=
          element_at(col("ex"), i) * 0.01, 1L).otherwise(0L)
      agged.select(col("l_returnflag"),
          round(element_at(col("ex"), 1), 4).as("p50"),
          round(element_at(col("ex"), 2), 4).as("p90"),
          round(element_at(col("ex"), 3), 4).as("p99"),
          okCol(1).as("p50_ok"), okCol(2).as("p90_ok"), okCol(3).as("p99_ok"))
        .orderBy(col("l_returnflag"))
    }),

    "q45_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 10).as("name_prefix"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"))
        .orderBy(col("p_partkey"))
    }),

    "q46_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dom"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("days_since"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .orderBy(col("o_orderkey"))
    }),

    "q41_topk_agg" -> ((s, dir) => {
      // bounded top-k as a partial-aggregating UDAF, not a window: only k
      // rows per group per partition reach the shuffle (ops.TopK)
      graft.ops.TopK.perGroup(
          t(s, dir, "orders").withColumn("pay", col("o_orderpriority")),
          "o_custkey", "o_totalprice", "o_orderkey", "pay", k = 3)
        .select(col("group").as("o_custkey"),
          round(col("score"), 2).as("o_totalprice"),
          col("tie").as("o_orderkey"),
          col("payload").as("o_orderpriority"), col("rank"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    "q42_sql_cosine" -> ((s, dir) => {
      // engine expressions called from plain SQL (GraftFunctions / A17 analog)
      GraftFunctions.register(s)
      t(s, dir, "embeddings").filter(col("vec_id") < 20)
        .createOrReplaceTempView("graft_emb_v")
      s.sql("""
        SELECT a.vec_id AS idA, b.vec_id AS idB,
               round(graft_cosine(a.embedding, b.embedding), 6) AS cosine
        FROM graft_emb_v a JOIN graft_emb_v b ON a.vec_id < b.vec_id
        ORDER BY idA, idB""")
    }),

    "q40_asof_join" -> ((s, dir) => {
      // for each event, the user's most recent order at event time —
      // aggregation form: partial max_by before the shuffle instead of a
      // full sort-window over the join output
      graft.ops.AsofJoin.backwardAgg(
          events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
          t(s, dir, "orders"),
          leftKey = "user_id", rightKey = "o_custkey",
          leftId = "event_id", leftTs = "ts", rightTs = "o_orderdate",
          rightTie = "o_orderkey",
          pick = Seq("o_orderkey" -> "last_orderkey",
            "o_orderdate" -> "last_orderdate_ts"),
          carryCols = Seq("user_id"))
        .select(col("event_id"), col("user_id"),
          col("last_orderkey"),
          date_format(col("last_orderdate_ts"), "yyyy-MM-dd").as("last_orderdate"))
        .orderBy(col("event_id"))
    }),

    "q57_asof_outer" -> ((s, dir) => {
      // LEFT-OUTER as-of: every event appears once; events whose user has
      // no qualifying order carry nulls (ops.AsofJoin.backwardOuterAgg).
      // The right side is date-restricted so the no-match path is actually
      // exercised (every user has SOME pre-2024 order in the fixture).
      graft.ops.AsofJoin.backwardOuterAgg(
          events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
          t(s, dir, "orders").filter(col("o_orderdate") >= lit("1998-07-01")),
          leftKey = "user_id", rightKey = "o_custkey",
          leftId = "event_id", leftTs = "ts", rightTs = "o_orderdate",
          rightTie = "o_orderkey",
          pick = Seq("o_orderkey" -> "last_orderkey",
            "o_orderdate" -> "last_orderdate_ts"),
          carryCols = Seq("user_id"))
        .select(col("event_id"), col("user_id"),
          col("last_orderkey"),
          date_format(col("last_orderdate_ts"), "yyyy-MM-dd").as("last_orderdate"))
        .orderBy(col("event_id"))
    }),

    "q38_range_join" -> ((s, dir) => {
      // non-equi (theta) join: price bands as an inline dimension ->
      // BroadcastNestedLoopJoin picks it up automatically
      val bands = s.range(0, 6).select(
        (col("id") * 100000).cast("double").as("lo"),
        ((col("id") + 1) * 100000).cast("double").as("hi"),
        concat(lit("band"), col("id")).as("band"))
      t(s, dir, "orders")
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("band"))
    }),

    "q39_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q56_json_nested" -> ((s, dir) => {
      // A18 breadth: LIST-of-STRUCT / MAP / nested STRUCT / null rendering
      // (the reference's SerDeUtils.getJSONString walks the same value
      // categories; uniontype has no Spark analog — SURVEY.md §1.3.4).
      // ignoreNullFields=false == the reference's explicit null rendering.
      val sups = t(s, dir, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"), col("s_name"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("s_nationkey")).orderBy(col("s_suppkey"))))
        .filter(col("rn") <= 3)
        .groupBy(col("s_nationkey"))
        .agg(sort_array(collect_list(
          struct(col("s_suppkey").as("id"), col("s_name").as("sname")))).as("sups"))
      t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .join(sups, col("n_nationkey") === col("s_nationkey"), "left")
        .select(col("n_nationkey"),
          to_json(struct(
            col("n_name").as("name"),
            struct(col("n_regionkey").as("rk"), col("r_name").as("rname"))
              .as("region"),
            col("sups"),
            map(lit("name_len"), length(col("n_name")).cast("long"))
              .as("meta"),
            when(col("n_regionkey") < 2, col("n_name")).as("alt_name")),
            Map("ignoreNullFields" -> "false")).as("js"))
        .orderBy(col("n_nationkey"))
    }),

    "q37_json_render" -> ((s, dir) => {
      // nested-value JSON rendering (A18: SerDeUtils.getJSONString ->
      // to_json over struct)
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey")))
            .as("js"))
        .orderBy(col("n_nationkey"))
    }),

    "q351_var_es" -> ((s, dir) => {
      // Historical 95% Value-at-Risk + expected shortfall on the
      // day-over-day revenue change, plus the Cornish-Fisher
      // moment-adjusted VaR. Changes stay EXACT integer cents through
      // the diff (the adjacent-index equi-join off the two-phase global
      // rank — no global window); the tail cut is an exact rank
      // k = ceil(0.05 n), so VaR is a real observed loss, not an
      // interpolated float. Moments for Cornish-Fisher are plain double
      // sums over the calendar-bounded diff series (engine-identical
      // IEEE ops, rounded outputs).
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"))
      val idx = graft.ops.PrefixSum.globalRank(daily, Seq(col("day")), "i")
        .select(col("i"), col("cents"))
      val diffs = idx.join(
          idx.select((col("i") + 1).as("i"), col("cents").as("prev")),
          Seq("i"))
        .select(col("i"), (col("cents") - col("prev")).as("d"))
      val ranked = graft.ops.PrefixSum.globalRank(
        diffs, Seq(col("d"), col("i")), "rk")
      val st = diffs
        .select((col("d").cast("double") / 100.0).as("x"))
        .agg(count(lit(1)).cast("double").as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
        .select(col("n"), (col("s1") / col("n")).as("m"),
          col("s2"), col("s3"), col("s4"))
        .select(col("n"), col("m"),
          (col("s2") / col("n") - col("m") * col("m")).as("v2"),
          (col("s3") / col("n") - lit(3) * col("m") * col("s2") / col("n") +
            lit(2) * col("m") * col("m") * col("m")).as("m3"),
          (col("s4") / col("n") - lit(4) * col("m") * col("s3") / col("n") +
            lit(6) * col("m") * col("m") * col("s2") / col("n") -
            lit(3) * col("m") * col("m") * col("m") * col("m")).as("m4"))
        .select(col("n"), col("m"), sqrt(col("v2")).as("sd"),
          (col("m3") / pow(col("v2"), 1.5)).as("g1"),
          (col("m4") / (col("v2") * col("v2")) - 3).as("g2"))
      val z = lit(-1.6448536269514722)
      val cf = st.select(col("n"), col("m"), col("sd"), col("g1"),
          col("g2"),
          (z + (z * z - 1) * col("g1") / 6 +
            (z * z * z - lit(3) * z) * col("g2") / 24 -
            (lit(2) * z * z * z - lit(5) * z) * col("g1") * col("g1") / 36)
            .as("zcf"))
      val tail = ranked.crossJoin(broadcast(
          diffs.agg(count(lit(1)).as("nd")).select(col("nd"),
            expr("(nd + 19) div 20").as("k"))))
        .filter(col("rk") <= col("k"))
        .groupBy(col("nd"))
        .agg(max(col("d")).as("var_cents"),
          avg(col("d").cast("double")).as("es_cents"))
      tail.crossJoin(broadcast(cf))
        .select(col("nd").as("n_diffs"),
          round(-col("var_cents").cast("double") / 100.0, 2).as("var95"),
          round(-col("es_cents") / 100.0, 2).as("es95"),
          round(-(col("m") + col("zcf") * col("sd")), 2).as("cf_var95"),
          round(col("g1"), 4).as("skew"),
          round(col("g2"), 4).as("ex_kurt"))
    }),

    "q352_sharpe_sortino" -> ((s, dir) => {
      // Risk-adjusted return report per event type: Sharpe and Sortino
      // ratios of the daily value-flow changes. The day reduction is a
      // hash aggregate first; per-type adjacent diffs come from the
      // grouped two-phase prefix rank (no per-type window over raw
      // events); downside deviation uses only the negative diffs —
      // the asymmetry Sortino exists to capture. Annualized by
      // sqrt(252) convention.
      val daily = events(s, dir)
        .groupBy(col("event_type").as("et"), to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("y"))
      val idx = graft.ops.PrefixSum.groupedRunningSum(
        daily.withColumn("one", lit(1L)), "et", "day", col("one"), "i")
        .select(col("et"), col("i"), col("y"))
      val diffs = idx.join(
          idx.select(col("et"), (col("i") + 1).as("i"), col("y").as("prev")),
          Seq("et", "i"))
        .select(col("et"), (col("y") - col("prev")).as("d"))
      diffs.groupBy(col("et"))
        .agg(count(lit(1)).as("n_diffs"), sum(col("d")).as("s1"),
          sum(col("d") * col("d")).as("s2"),
          sum(when(col("d") < 0, col("d") * col("d")).otherwise(0.0))
            .as("sneg"))
        .select(col("et"), col("n_diffs"),
          (col("s1") / col("n_diffs")).as("m"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n_diffs")) /
            (col("n_diffs") - 1)).as("sd"),
          sqrt(col("sneg") / col("n_diffs")).as("dd"))
        .select(col("et"), col("n_diffs"),
          round(col("m"), 2).as("mean_diff"),
          round(col("m") / col("sd") * sqrt(lit(252.0)), 4).as("sharpe"),
          round(col("m") / col("dd") * sqrt(lit(252.0)), 4).as("sortino"))
        .orderBy(col("et"))
    }),

    "q353_mann_kendall" -> ((s, dir) => {
      // Mann-Kendall trend test + Sen's slope over weekly revenue: the
      // nonparametric "is there a monotone trend" answer (q176's CUSUM
      // finds WHERE the level shifts; this says WHETHER it drifts).
      // S and the tie-corrected variance are exact integers from the
      // week-pair sign table (weeks are calendar-bounded, so the pair
      // join is bounded, never corpus-sized); Sen's slope is the exact
      // median pair slope — slopes quantized to integer micro-dollars
      // per week via IEEE-identical double ops so both engines rank
      // the same longs.
      val weekly = t(s, dir, "orders")
        .groupBy((datediff(to_date(col("o_orderdate")),
          lit("1992-01-01")).cast("long") / lit(7L)).cast("long").as("wk"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("c"))
      val pairs = weekly.as("a").join(weekly.as("b"),
          col("a.wk") < col("b.wk"))
        .select(col("a.wk").as("w1"), col("b.wk").as("w2"),
          (col("b.c") - col("a.c")).as("dv"),
          (col("b.wk") - col("a.wk")).as("dt"))
      val sstat = pairs.agg(sum(signum(col("dv").cast("double"))
          .cast("long")).as("s_stat"), count(lit(1)).as("m"))
      val nties = weekly.groupBy(col("c")).agg(count(lit(1)).as("tc"))
        .agg(sum(col("tc")).as("n"),
          sum(col("tc") * (col("tc") - 1) * (lit(2) * col("tc") + 5))
            .as("tcor"))
      val slopes = pairs.select(col("w1"), col("w2"),
        floor(lit(1000000.0) * col("dv").cast("double") /
          (lit(100.0) * col("dt").cast("double"))).cast("long").as("sl"))
      val ranked = graft.ops.PrefixSum.globalRank(
        slopes, Seq(col("sl"), col("w1"), col("w2")), "rk")
      val med = ranked.crossJoin(broadcast(
          slopes.agg(count(lit(1)).as("mm"))))
        .filter(col("rk") === expr("(mm + 1) div 2") ||
          col("rk") === expr("(mm + 2) div 2"))
        .agg(avg(col("sl").cast("double")).as("med_micro"))
      sstat.crossJoin(broadcast(nties)).crossJoin(broadcast(med))
        .select(col("n").as("n_weeks"), col("s_stat"),
          ((col("n").cast("double") * (col("n") - 1) *
            (lit(2) * col("n") + 5) - col("tcor")) / 18.0).as("var_s"),
          col("med_micro"))
        .select(col("n_weeks"), col("s_stat"),
          round(col("var_s"), 2).as("var_s"),
          round((col("s_stat") -
            signum(col("s_stat").cast("double"))) /
            sqrt(col("var_s")), 4).as("z"),
          round(col("med_micro") / 1000000.0, 4).as("sen_slope"))
        .select(col("n_weeks"), col("s_stat"), col("var_s"), col("z"),
          col("sen_slope"),
          when(col("z") > 1.96, "increasing")
            .when(col("z") < -1.96, "decreasing")
            .otherwise("no_trend").as("trend"))
    }),

    "q354_ljung_box" -> ((s, dir) => {
      // Ljung-Box portmanteau whiteness test on the daily engagement
      // series at lags 1..10 — "is there ANY autocorrelation left"
      // (q175 reports the individual r_k; this pools them into one
      // decision statistic). Same shifted-index equi-join machinery;
      // the df=10 chi-square survival has the exact even-df closed
      // form exp(-x/2)*sum_{j<5}(x/2)^j/j! — no incomplete-gamma
      // library dependence to drift cross-engine.
      import s.implicits._
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("y"))
      val idx = graft.ops.PrefixSum.globalRank(daily, Seq(col("day")), "i")
        .select(col("i"), col("y"))
      val st = idx.agg(count(lit(1)).cast("double").as("n"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
        .select(col("n"), (col("sy") / col("n")).as("mu"),
          (col("syy") - col("sy") * col("sy") / col("n")).as("denom"))
      val shifted = idx.crossJoin(broadcast((1 to 10).toDF("lag")))
        .select(col("lag"), (col("i") + col("lag")).as("i"),
          col("y").as("y_lag"))
      val rks = idx.join(shifted, Seq("i"))
        .crossJoin(broadcast(st))
        .groupBy(col("lag"), col("n"), col("mu"), col("denom"))
        .agg(sum((col("y") - col("mu")) * (col("y_lag") - col("mu")))
          .as("num"))
        .select(col("lag"), col("n"),
          (col("num") / col("denom")).as("r"))
      val qs = rks
        .select(col("n"), (col("r") * col("r") /
          (col("n") - col("lag"))).as("term"))
        .groupBy(col("n"))
        .agg(sum(col("term")).as("tsum"))
        .select(col("n"),
          (col("n") * (col("n") + 2) * col("tsum")).as("q"))
      val h = col("q") / 2
      qs.select(col("n").cast("long").as("n_days"),
        round(col("q"), 4).as("q_stat"),
        round(exp(-h) * (lit(1.0) + h + h * h / 2 + h * h * h / 6 +
          h * h * h * h / 24), 6).as("p_approx"))
    }),

    "q355_bartlett" -> ((s, dir) => {
      // Bartlett's variance-homogeneity test across the five market
      // segments — the parametric (normal-theory) counterpart of
      // q337's Brown-Forsythe: more powerful when normality holds,
      // fragile when it doesn't, so the pair together brackets the
      // pooled-variance assumption. Group variances come from the same
      // exact integer moment pass as q336; ln() drift is absorbed by
      // the rounded outputs.
      val g = t(s, dir, "customer")
        .select(col("c_mktsegment").as("sg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
        .groupBy(col("sg"))
        .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg1"),
          sum(col("v") * col("v")).as("sg2"))
        .select(col("ng"),
          ((col("sg2").cast("double") -
            col("sg1").cast("double") * col("sg1") / col("ng")) /
            (col("ng") - 1)).as("s2"))
      val stat = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum((col("ng") - 1) * col("s2")).as("ssw"),
          sum((col("ng") - 1) * log(col("s2"))).as("sln"),
          sum(lit(1.0) / (col("ng") - 1)).as("sinv"),
          max(col("s2")).as("vmax"), min(col("s2")).as("vmin"))
        .select(col("k"), col("n"), col("vmax"), col("vmin"),
          (col("ssw") / (col("n") - col("k"))).as("sp2"),
          col("sln"), col("sinv"))
        .select(col("k"), col("n"), col("vmax"), col("vmin"),
          (((col("n") - col("k")) * log(col("sp2")) - col("sln")) /
            (lit(1.0) + (col("sinv") - lit(1.0) / (col("n") - col("k"))) /
              (lit(3.0) * (col("k") - 1)))).as("chi2"))
      val x = col("chi2")
      stat.select(col("n").as("n_cust"), col("k").as("k_groups"),
        round(col("vmax") / col("vmin"), 4).as("var_ratio"),
        round(col("chi2"), 4).as("bartlett_chi2"),
        round(exp(-x / 2) * (lit(1.0) + x / 2), 6).as("p_approx"))
    }),

    "q356_cochran_q" -> ((s, dir) => {
      // Cochran's Q: do the event types differ in HIGH-VALUE reach
      // (value > 95), treating each user as their own block (the
      // repeated-measures cousin of the chi-square homogeneity test —
      // it conditions out per-user activity levels entirely)?
      // x_ij = user i logged a value>95 event of type j; everything is
      // exact integer arithmetic on the deduped (user, type) presence
      // table until the final two divisions. Plain presence would be
      // degenerate here (every user touches every type — denominator
      // 0); the threshold restores per-block variation.
      val ut = events(s, dir)
        .filter(col("value") > 95)
        .select(col("user_id").as("u"), col("event_type").as("et"))
        .distinct()
      val gj = ut.groupBy(col("et")).agg(count(lit(1)).as("g"))
        .agg(count(lit(1)).as("k"), sum(col("g")).as("sg"),
          sum(col("g") * col("g")).as("sg2"))
      val li = ut.groupBy(col("u")).agg(count(lit(1)).as("l"))
        .agg(count(lit(1)).as("n_users"), sum(col("l")).as("sl"),
          sum(col("l") * col("l")).as("sl2"))
      gj.crossJoin(broadcast(li))
        .select(col("n_users"), col("k").as("k_types"),
          ((col("k") - 1).cast("double") *
            (col("k") * col("sg2") - col("sg") * col("sg")) /
            (col("k") * col("sl") - col("sl2"))).as("q"))
        .select(col("n_users"), col("k_types"),
          round(col("q"), 4).as("q_stat"),
          round(exp(-col("q") / 2) * (lit(1.0) + col("q") / 2), 6)
            .as("p_approx"))
    }),

    "q357_mood_median" -> ((s, dir) => {
      // Mood's median test across order priorities: counts above/at-or-
      // below the GLOBAL median only — maximally robust (uses one bit
      // per row), the coarse cross-check on q319's rank-sum
      // Kruskal-Wallis. The grand median is picked at the exact rank
      // via the two-phase global ranker; the chi-square assembles from
      // exact integer cell counts vs margin-product expectations.
      val base = t(s, dir, "orders")
        .select(col("o_orderpriority").as("pr"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
          col("o_orderkey").as("ok"))
      val ranked = graft.ops.PrefixSum.globalRank(
        base, Seq(col("v"), col("ok")), "rk")
      val med = ranked.crossJoin(broadcast(
          base.agg(count(lit(1)).as("n"))))
        .filter(col("rk") === expr("(n + 1) div 2"))
        .select(col("v").as("med"))
      val cells = base.crossJoin(broadcast(med))
        .groupBy(col("pr"))
        .agg(count(lit(1)).as("ng"),
          sum(when(col("v") > col("med"), 1L).otherwise(0L)).as("above"))
      val tots = cells.agg(sum(col("ng")).as("n"),
        sum(col("above")).as("ta"))
      val chi = cells.crossJoin(broadcast(tots))
        .select(col("pr"), col("ng"), col("above"),
          (col("ng").cast("double") * col("ta") / col("n")).as("ea"),
          (col("ng").cast("double") * (col("n") - col("ta")) / col("n"))
            .as("eb"))
        .select(col("pr"), col("ng"), col("above"),
          ((col("above") - col("ea")) * (col("above") - col("ea")) /
            col("ea") +
           ((col("ng") - col("above")) - col("eb")) *
            ((col("ng") - col("above")) - col("eb")) / col("eb"))
            .as("contrib"))
      val stat = chi.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("contrib")).as("chi2"))
      val x = col("chi2")
      stat.select(col("n").as("n_orders"), col("k").as("k_groups"),
        round(col("chi2"), 4).as("chi2"),
        round(exp(-x / 2) * (lit(1.0) + x / 2), 6).as("p_approx"))
    }),

    "q358_jonckheere" -> ((s, dir) => {
      // Jonckheere-Terpstra ordered-alternative test: does quantity
      // trend UPWARD across line numbers 1..7 (an a-priori ordering
      // Kruskal-Wallis q319 cannot use)? The pairwise Mann-Whitney
      // counts never enumerate row pairs: per-(group, value) counts on
      // the bounded 7x50 grid, suffix counts via the grid window
      // (350 broadcast-sized rows), 2J kept exact integer (ties count
      // once, x2 scaling). The tie-corrected variance's cubic terms run
      // in doubles — exact inputs, identical IEEE ops both engines,
      // and overflow-safe where BIGINT cubes of corpus counts are not.
      val base = t(s, dir, "lineitem")
        .select(col("l_linenumber").cast("long").as("grp"),
          col("l_quantity").cast("long").as("v"))
      val gv = base.groupBy(col("grp"), col("v"))
        .agg(count(lit(1)).as("c"))
      val ng = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
      // suffix count of group g strictly above value v, on the bounded
      // grid (|grid| = groups x distinct quantities — window is fine)
      val wsuf = Window.partitionBy(col("grp")).orderBy(col("v"))
        .rowsBetween(1, Window.unboundedFollowing)
      // GT must be defined on the FULL value grid (group i may hold
      // values group j never takes — those rows still beat all of j's
      // smaller values), so zero-fill the grid before the suffix scan.
      val grid = base.select(col("v")).distinct()
        .crossJoin(ng.select(col("grp")))
      val gvFull = grid.join(gv, Seq("grp", "v"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val sufFull = gvFull.withColumn("gt",
        coalesce(sum(col("c")).over(wsuf), lit(0L)))
      val j2full = gv.as("a").join(sufFull.as("b"),
          col("a.grp") < col("b.grp") && col("a.v") === col("b.v"))
        .agg(sum(col("a.c") * (lit(2) * col("b.gt") + col("b.c")))
          .as("j2"))
      val nstats = ng.agg(sum(col("n")).as("nn"),
        sum(col("n").cast("double") * (col("n") - 1) *
          (lit(2) * col("n") + 5)).as("t2g"),
        sum(col("n").cast("double") * (col("n") - 1) * (col("n") - 2))
          .as("t3g"),
        sum(col("n").cast("double") * (col("n") - 1)).as("t1g"),
        sum(col("n").cast("double") * col("n")).as("sn2"))
      val tstats = base.groupBy(col("v")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t").cast("double") * (col("t") - 1) *
            (lit(2) * col("t") + 5)).as("t2v"),
          sum(col("t").cast("double") * (col("t") - 1) * (col("t") - 2))
            .as("t3v"),
          sum(col("t").cast("double") * (col("t") - 1)).as("t1v"))
      j2full.crossJoin(broadcast(nstats)).crossJoin(broadcast(tstats))
        .select(col("nn").as("n_rows"), col("j2"),
          ((col("nn").cast("double") * col("nn") - col("sn2")) / 2)
            .as("mean2"),
          (((col("nn").cast("double") * (col("nn") - 1) *
              (lit(2) * col("nn") + 5) - col("t2g") - col("t2v")) / 72 +
            col("t3g") * col("t3v") /
              (lit(36.0) * col("nn") * (col("nn") - 1) * (col("nn") - 2)) +
            col("t1g") * col("t1v") /
              (lit(8.0) * col("nn") * (col("nn") - 1))) * 4).as("var4"))
        .select(col("n_rows"), col("j2"),
          round((col("j2") - col("mean2")) / sqrt(col("var4")), 4)
            .as("z"))
        .select(col("n_rows"), col("j2"), col("z"),
          when(col("z") > 1.96, "increasing")
            .when(col("z") < -1.96, "decreasing")
            .otherwise("no_trend").as("trend"))
    }),

    "q359_brier_murphy" -> ((s, dir) => {
      // Murphy decomposition of the q138 classifier's Brier score:
      // reliability (calibration error — what q144 plots), resolution
      // (how much the bins separate outcomes), uncertainty (the
      // no-skill floor). Shares classifierFeatures + the GD trainer
      // with q138/q144 so the decomposition audits EXACTLY that model;
      // one scored-corpus pass + one bounded 10-bin aggregate.
      val (feat, cols) = classifierFeatures(s, dir)
      val w = graft.ops.LinearModel.logisticGd(feat, cols, "y",
        lr = 0.5, nIter = 3)
      val z = cols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
        .reduce(_ + _)
      val scored = feat
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-z)))
        .withColumn("bin", least(floor(col("p") * 10), lit(9))
          .cast("long"))
      val tot = scored.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum((col("p") - col("y")) * (col("p") - col("y"))).as("sq"))
      val bins = scored.groupBy(col("bin"))
        .agg(count(lit(1)).as("nk"), sum(col("p")).as("sp"),
          sum(col("y")).as("syk"))
      val dec = bins.crossJoin(broadcast(tot))
        .select(col("n"), col("sy"), col("sq"),
          (col("nk") * (col("sp") / col("nk") - col("syk") / col("nk")) *
            (col("sp") / col("nk") - col("syk") / col("nk"))).as("relk"),
          (col("nk") * (col("syk") / col("nk") - col("sy") / col("n")) *
            (col("syk") / col("nk") - col("sy") / col("n"))).as("resk"))
        .groupBy(col("n"), col("sy"), col("sq"))
        .agg(sum(col("relk")).as("rel"), sum(col("resk")).as("res"))
        .select(col("n"), (col("sq") / col("n")).as("brier"),
          (col("rel") / col("n")).as("rel"),
          (col("res") / col("n")).as("res"),
          ((col("sy") / col("n")) * (lit(1.0) - col("sy") / col("n")))
            .as("unc"))
      dec.select(col("n").as("n_docs"), round(col("brier"), 6).as("brier"),
        round(col("rel"), 6).as("reliability"),
        round(col("res"), 6).as("resolution"),
        round(col("unc"), 6).as("uncertainty"),
        round(col("brier") - (col("rel") - col("res") + col("unc")), 6)
          .as("decomp_gap"))
    }),

    "q360_ipw_ate" -> ((s, dir) => {
      // Inverse-propensity-weighted ATE with EXACT stratum propensities
      // (nation x segment cells): effect of a funded account
      // (acctbal > 0) on total order spend. Off-support strata
      // (propensity 0 or 1) are dropped and counted — the positivity
      // violation every IPW pipeline must surface, not hide. Hajek
      // normalization; weights are rationals from integer cell counts,
      // so both engines compute identical doubles.
      val spend = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("yc"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("sg"),
          when(col("c_acctbal") > 0, 1L).otherwise(0L).as("tr"))
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("nk"), col("sg"), col("tr"),
          coalesce(col("yc"), lit(0L)).as("y"))
      val strata = cust.groupBy(col("nk"), col("sg"))
        .agg(count(lit(1)).as("ns"), sum(col("tr")).as("nt"))
      val kept = strata.filter(col("nt") > 0 && col("nt") < col("ns"))
        .withColumn("e", col("nt").cast("double") / col("ns"))
      val dropped = strata.filter(col("nt") === 0 ||
        col("nt") === col("ns"))
      val wtd = cust.join(broadcast(kept.select(col("nk"), col("sg"),
          col("e"))), Seq("nk", "sg"))
        .select(col("tr"), col("y"),
          when(col("tr") === 1, lit(1.0) / col("e"))
            .otherwise(lit(1.0) / (lit(1.0) - col("e"))).as("w"))
      val eff = wtd.agg(count(lit(1)).as("n_cust"),
          sum(when(col("tr") === 1, col("w")).otherwise(0.0)).as("wt"),
          sum(when(col("tr") === 1, col("w") * col("y")).otherwise(0.0))
            .as("wty"),
          sum(when(col("tr") === 0, col("w")).otherwise(0.0)).as("wc"),
          sum(when(col("tr") === 0, col("w") * col("y")).otherwise(0.0))
            .as("wcy"),
          sum(col("tr")).as("ntr"),
          sum(when(col("tr") === 1, col("y")).otherwise(0L)).as("syt"),
          sum(when(col("tr") === 0, col("y")).otherwise(0L)).as("syc"))
      eff.crossJoin(broadcast(kept.agg(count(lit(1)).as("n_strata"))))
        .crossJoin(broadcast(dropped.agg(count(lit(1)).as("n_dropped"))))
        .select(col("n_cust"), col("n_strata"), col("n_dropped"),
          round((col("wty") / col("wt") - col("wcy") / col("wc")) / 100.0,
            2).as("ate_ipw"),
          round((col("syt").cast("double") / col("ntr") -
            col("syc").cast("double") / (col("n_cust") - col("ntr"))) /
            100.0, 2).as("ate_naive"))
    }),

    "q361_horvitz_thompson" -> ((s, dir) => {
      // Horvitz-Thompson total from a deterministic PPS Poisson sample:
      // orders sampled with probability proportional to price (capped
      // at 1), the estimator reconstructs the TOTAL LINEITEM COUNT from
      // the sample alone — unequal-probability design where q53's
      // uniform Bernoulli would waste budget on small orders. Inclusion
      // is keyHash-deterministic (identical longs both engines), so the
      // "random" sample is exactly reproducible anywhere.
      val x = t(s, dir, "orders")
        .select(col("o_orderkey").as("ok"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("x"))
      val tot = x.agg(sum(col("x")).as("tx"), count(lit(1)).as("no"))
      val li = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      val samp = x.crossJoin(broadcast(tot))
        .withColumn("pi", least(lit(1.0),
          col("x").cast("double") * 2000.0 / col("tx")))
        .withColumn("u", (Sampling.keyHash(col("ok")) + 0.5) /
          4294967296.0)
        .filter(col("u") < col("pi"))
        .join(li, col("ok") === col("l_orderkey"))
      val truth = li.agg(sum(col("cnt")).as("true_total"))
      samp.agg(count(lit(1)).as("n_sampled"),
          sum(col("cnt").cast("double") / col("pi")).as("ht"))
        .crossJoin(broadcast(truth))
        .select(col("n_sampled"), round(col("ht"), 2).as("ht_est"),
          col("true_total"),
          round(abs(col("ht") - col("true_total")) /
            col("true_total"), 4).as("rel_err"))
    }),

    "q362_lilliefors" -> ((s, dir) => {
      // Lilliefors (KS with ESTIMATED mean/sd) normality test on
      // account balances: the gatekeeper for every z/t-based query in
      // the gallery (q336/q347/q325 all assume roughly normal errors).
      // ECDF steps at exact two-phase global ranks, Phi via the A&S
      // erf polynomial with reflection; D is a max — no float
      // summation order anywhere.
      val base = t(s, dir, "customer")
        .select(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
          .as("v"), col("c_custkey").as("ck"))
      val mom = base.agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
          sum(col("v") * col("v")).as("s2"))
        .select(col("n"), (col("s1").cast("double") / col("n") / 100.0)
          .as("m"),
          (sqrt((col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("n")) /
            (col("n") - 1)) / 100.0).as("sd"))
      val ranked = graft.ops.PrefixSum.globalRank(
        base, Seq(col("v"), col("ck")), "i")
      val zed = ranked.crossJoin(broadcast(mom))
        .withColumn("z", (col("v").cast("double") / 100.0 - col("m")) /
          col("sd"))
      val xq = abs(col("z")) / math.sqrt(2.0)
      val tq = lit(1.0) / (lit(1.0) + lit(0.3275911) * xq)
      val tail = (lit(0.254829592) * tq - lit(0.284496736) * tq * tq +
        lit(1.421413741) * tq * tq * tq - lit(1.453152027) *
        tq * tq * tq * tq + lit(1.061405429) * tq * tq * tq * tq * tq) *
        exp(-xq * xq) / 2
      val phid = zed.withColumn("phi",
        when(col("z") >= 0, lit(1.0) - tail).otherwise(tail))
      phid
        .select(greatest(
            col("i").cast("double") / col("n") - col("phi"),
            col("phi") - (col("i") - 1).cast("double") / col("n"))
          .as("gap"), col("n"))
        .groupBy(col("n")).agg(max(col("gap")).as("d"))
        .select(col("n").as("n_cust"), round(col("d"), 6).as("d_stat"),
          round(lit(0.886) / sqrt(col("n").cast("double")), 6)
            .as("crit_05"),
          (col("d") > lit(0.886) / sqrt(col("n").cast("double")))
            .as("rejected"))
    }),

    "q363_yule_walker_ar2" -> ((s, dir) => {
      // AR(2) fit on daily revenue via Yule-Walker (closed form from
      // the q175-style r1/r2 — no optimizer), then an in-sample
      // one-step backtest vs naive persistence. The honest question
      // for every autoregressive claim: does the fitted memory BEAT
      // just repeating yesterday? Series is calendar-bounded; dollars
      // (not cents) keep the double square sums well-conditioned.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0)
          .cast("double").as("y"))
      val idx = graft.ops.PrefixSum.globalRank(daily, Seq(col("day")), "i")
        .select(col("i"), col("y"))
      val st = idx.agg(count(lit(1)).cast("double").as("n"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
        .select(col("n"), (col("sy") / col("n")).as("mu"),
          (col("syy") - col("sy") * col("sy") / col("n")).as("denom"))
      val l1 = idx.select((col("i") + 1).as("i"), col("y").as("y1"))
      val l2 = idx.select((col("i") + 2).as("i"), col("y").as("y2"))
      val tri = idx.join(l1, Seq("i")).join(l2, Seq("i"))
      val rs = tri.crossJoin(broadcast(st))
        .groupBy(col("n"), col("mu"), col("denom"))
        .agg(sum((col("y") - col("mu")) * (col("y1") - col("mu")))
            .as("n1"),
          sum((col("y") - col("mu")) * (col("y2") - col("mu"))).as("n2"))
        .select(col("n"), col("mu"), (col("n1") / col("denom")).as("r1"),
          (col("n2") / col("denom")).as("r2"))
        .select(col("n"), col("mu"), col("r1"), col("r2"),
          (col("r1") * (lit(1.0) - col("r2")) /
            (lit(1.0) - col("r1") * col("r1"))).as("p1"),
          ((col("r2") - col("r1") * col("r1")) /
            (lit(1.0) - col("r1") * col("r1"))).as("p2"))
      val bt = tri.crossJoin(broadcast(rs))
        .select(col("y"), col("y1"),
          (col("mu") + col("p1") * (col("y1") - col("mu")) +
            col("p2") * (col("y2") - col("mu"))).as("yhat"))
        .agg(count(lit(1)).as("n_steps"),
          sqrt(avg((col("y") - col("yhat")) * (col("y") - col("yhat"))))
            .as("rmse_ar2"),
          sqrt(avg((col("y") - col("y1")) * (col("y") - col("y1"))))
            .as("rmse_naive"))
      bt.crossJoin(broadcast(rs.select(col("n"), col("p1"), col("p2"))))
        .select(col("n").cast("long").as("n_days"), col("n_steps"),
          round(col("p1"), 6).as("phi1"), round(col("p2"), 6).as("phi2"),
          round(col("rmse_ar2"), 2).as("rmse_ar2"),
          round(col("rmse_naive"), 2).as("rmse_naive"))
    }),

    "q364_holt_trend" -> ((s, dir) => {
      // Holt double-exponential smoothing over the 27-quarter revenue
      // series (alpha .3, beta .1): level+trend state folded
      // column-by-column on a ONE-row wide frame — 26 fixed-operand
      // steps, plan truncated every 10 (q350's barrier lesson), with
      // the one-step absolute error accumulated inside the same fold.
      // The recurrence is inherently sequential; making the frame wide
      // makes each step pure scalar arithmetic, identical on any
      // engine.
      val qidx = expr(
        "(year(o_orderdate) - 1992) * 4 + (month(o_orderdate) - 1) div 3")
      val aggs = (0 to 26).map(k =>
        (sum(when(qidx === k,
          expr("CAST(floor(o_totalprice) AS BIGINT)")).otherwise(0L)) /
          1000.0).cast("double").as(s"y$k"))
      val wide = t(s, dir, "orders").agg(aggs.head, aggs.tail: _*)
      val ys = (0 to 26).map(k => col(s"y$k"))
      var cur = wide.select(ys :+ col("y0").as("l") :+
        (col("y1") - col("y0")).as("b") :+ lit(0.0).as("sae"): _*)
      for (tt <- 1 to 26) {
        val pred = col("l") + col("b")
        val l2 = lit(0.3) * col(s"y$tt") + lit(0.7) * pred
        cur = cur.select(ys :+ l2.as("l") :+
          (lit(0.1) * (l2 - col("l")) + lit(0.9) * col("b")).as("b") :+
          (col("sae") + abs(col(s"y$tt") - pred)).as("sae"): _*)
        if (tt % 10 == 0) cur = cur.localCheckpoint()
      }
      cur.select(lit(27L).as("n_quarters"),
        round(col("l"), 2).as("level_kusd"),
        round(col("b"), 2).as("trend_kusd"),
        round(col("l") + col("b"), 2).as("forecast_kusd"),
        round(col("sae") / 26.0, 2).as("mae_kusd"))
    }),

    "q365_pacf" -> ((s, dir) => {
      // Partial autocorrelation at lags 1..5 of the daily engagement
      // series via the Durbin-Levinson recursion — the AR-order
      // selector q175's raw ACF can't provide (ACF of an AR(1) decays
      // forever; PACF cuts off). The recursion runs unrolled on a
      // ONE-row frame of r1..r5 — five bounded steps of scalar
      // arithmetic after one shifted-index aggregate.
      import s.implicits._
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("y"))
      val idx = graft.ops.PrefixSum.globalRank(daily, Seq(col("day")), "i")
        .select(col("i"), col("y"))
      val st = idx.agg(count(lit(1)).cast("double").as("n"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
        .select((col("sy") / col("n")).as("mu"),
          (col("syy") - col("sy") * col("sy") / col("n")).as("denom"))
      val shifted = idx.crossJoin(broadcast((1 to 5).toDF("lag")))
        .select(col("lag"), (col("i") + col("lag")).as("i"),
          col("y").as("y_lag"))
      val rw = idx.join(shifted, Seq("i"))
        .crossJoin(broadcast(st))
        .groupBy(col("lag"), col("denom"), col("mu"))
        .agg(sum((col("y") - col("mu")) * (col("y_lag") - col("mu")))
          .as("num"))
        .select(col("lag"), (col("num") / col("denom")).as("r"))
      val rexprs = (1 to 5).map(k =>
        max(when(col("lag") === k, col("r"))).as(s"r$k"))
      val rrow = rw.agg(rexprs.head, rexprs.tail: _*)
      val s2 = rrow.select(col("r1"), col("r2"), col("r3"), col("r4"),
        col("r5"), col("r1").as("p11"))
      val s3 = s2.select(col("*"),
          ((col("r2") - col("p11") * col("r1")) /
            (lit(1.0) - col("p11") * col("r1"))).as("p22"))
        .select(col("*"),
          (col("p11") - col("p22") * col("p11")).as("p21"))
      val s4 = s3.select(col("*"),
          ((col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
            (lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2")))
            .as("p33"))
        .select(col("*"),
          (col("p21") - col("p33") * col("p22")).as("p31"),
          (col("p22") - col("p33") * col("p21")).as("p32"))
      val s5 = s4.select(col("*"),
          ((col("r4") - col("p31") * col("r3") - col("p32") * col("r2") -
            col("p33") * col("r1")) /
            (lit(1.0) - col("p31") * col("r1") - col("p32") * col("r2") -
              col("p33") * col("r3"))).as("p44"))
        .select(col("*"),
          (col("p31") - col("p44") * col("p33")).as("p41"),
          (col("p32") - col("p44") * col("p32")).as("p42"),
          (col("p33") - col("p44") * col("p31")).as("p43"))
      val s6 = s5.select(col("*"),
        ((col("r5") - col("p41") * col("r4") - col("p42") * col("r3") -
          col("p43") * col("r2") - col("p44") * col("r1")) /
          (lit(1.0) - col("p41") * col("r1") - col("p42") * col("r2") -
            col("p43") * col("r3") - col("p44") * col("r4"))).as("p55"))
      s6.select(round(col("p11"), 6).as("pacf_1"),
        round(col("p22"), 6).as("pacf_2"),
        round(col("p33"), 6).as("pacf_3"),
        round(col("p44"), 6).as("pacf_4"),
        round(col("p55"), 6).as("pacf_5"))
    }),

    "q366_permutation_entropy" -> ((s, dir) => {
      // Permutation entropy (order-3 ordinal patterns) of daily
      // revenue: complexity of the series' SHAPE, blind to amplitude —
      // regular seasonality scores low, noise scores ~1. Patterns are
      // 3-bit comparison codes over exact integer cents (ties resolve
      // identically on any engine); entropy normalized by ln 6.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("c"))
      val idx = graft.ops.PrefixSum.globalRank(daily, Seq(col("day")), "i")
        .select(col("i"), col("c"))
      val tri = idx
        .join(idx.select((col("i") - 1).as("i"), col("c").as("c1")),
          Seq("i"))
        .join(idx.select((col("i") - 2).as("i"), col("c").as("c2")),
          Seq("i"))
      val coded = tri.select(
        (when(col("c1") > col("c"), 4).otherwise(0) +
         when(col("c2") > col("c"), 2).otherwise(0) +
         when(col("c2") > col("c1"), 1).otherwise(0)).cast("long")
          .as("code"))
      val cnt = coded.groupBy(col("code")).agg(count(lit(1)).as("k"))
      val tot = cnt.agg(sum(col("k")).as("n"),
        count(lit(1)).as("n_patterns"))
      val ent = cnt.crossJoin(broadcast(tot))
        .select(col("n"), col("n_patterns"), col("code"), col("k"),
          (col("k").cast("double") / col("n")).as("p"))
      val top = ent.orderBy(col("k").desc, col("code")).limit(1)
        .select(col("code").as("top_code"),
          round(col("p"), 4).as("top_share"))
      ent.groupBy(col("n"), col("n_patterns"))
        .agg((-sum(col("p") * log(col("p"))) / math.log(6.0))
          .as("h"))
        .crossJoin(broadcast(top))
        .select(col("n").as("n_triples"), col("n_patterns"),
          round(col("h"), 6).as("h_norm"), col("top_code"),
          col("top_share"))
    }),

    "q367_silhouette" -> ((s, dir) => {
      // Centroid (simplified) silhouette of the embedding corpus
      // against its LABELS-as-clusters: a = distance to own centroid,
      // b = nearest other centroid — the label-quality audit for the
      // q247 drift/q76 semantic-dedup cell machinery. The vector x
      // centroid scoring is one (dim)-keyed join that partial-aggs
      // straight back to (vector, label) — the |corpus| x |labels|
      // distance table never carries vectors, only scalars.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("i"),
          col("col").cast("double").as("v"))
      val cent = e.groupBy(col("label").as("cl"), col("i"))
        .agg(avg(col("v")).as("c"))
      val d2 = e.join(broadcast(cent), Seq("i"))
        .groupBy(col("vec_id"), col("label"), col("cl"))
        .agg(sum((col("v") - col("c")) * (col("v") - col("c")))
          .as("dd"))
      val ab = d2.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("label") === col("cl"), sqrt(col("dd"))))
            .as("a"),
          min(when(col("label") =!= col("cl"), sqrt(col("dd"))))
            .as("b"))
      ab.select(col("label"),
          ((col("b") - col("a")) / greatest(col("a"), col("b")))
            .as("sil"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("sil")), 4).as("mean_sil"))
        .orderBy(col("label"))
    }),

    "q368_davies_bouldin" -> ((s, dir) => {
      // Davies-Bouldin index over the same label clusters: scatter
      // S_i (mean member-to-centroid distance) vs centroid separation
      // M_ij; DB = mean over clusters of the worst (S_i+S_j)/M_ij.
      // Everything after the two centroid passes runs on the bounded
      // 10x10 label grid.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("i"),
          col("col").cast("double").as("v"))
      val cent = e.groupBy(col("label"), col("i"))
        .agg(avg(col("v")).as("c"))
      val scat = e.join(broadcast(cent), Seq("label", "i"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sqrt(sum((col("v") - col("c")) * (col("v") - col("c"))))
          .as("d"))
        .groupBy(col("label"))
        .agg(avg(col("d")).as("sc"))
      val cd = cent.as("x").join(cent.as("y"),
          col("x.i") === col("y.i") && col("x.label") =!= col("y.label"))
        .groupBy(col("x.label").as("la"), col("y.label").as("lb"))
        .agg(sqrt(sum((col("x.c") - col("y.c")) *
          (col("x.c") - col("y.c")))).as("m"))
      val rij = cd
        .join(broadcast(scat.select(col("label").as("la"),
          col("sc").as("sa"))), Seq("la"))
        .join(broadcast(scat.select(col("label").as("lb"),
          col("sc").as("sb"))), Seq("lb"))
        .select(col("la"), col("lb"),
          ((col("sa") + col("sb")) / col("m")).as("r"))
      val worst = rij.groupBy(col("la")).agg(max(col("r")).as("rmax"))
      val top = rij.orderBy(round(col("r"), 6).desc, col("la"),
          col("lb")).limit(1)
        .select(col("la").as("worst_a"), col("lb").as("worst_b"))
      worst.agg(count(lit(1)).as("n_labels"),
          round(avg(col("rmax")), 4).as("db_index"))
        .crossJoin(broadcast(top))
    }),

    "q369_eoq_safety_stock" -> ((s, dir) => {
      // Inventory policy per brand: EOQ from annual demand (sqrt
      // formula), safety stock and reorder point from ZERO-FILLED
      // weekly demand variability at a 2-week lead time (skipping the
      // zero weeks would understate sigma exactly for the slow movers
      // that need it most). Exact integer quantity sums; the week grid
      // is calendar-bounded so the fill join is grid-sized.
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          (datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
            .cast("long") / lit(7L)).cast("long").as("wk"),
          col("l_quantity").cast("long").as("q"))
      val wkq = li.groupBy(col("brand"), col("wk"))
        .agg(sum(col("q")).as("wq"))
      val grid = li.select(col("wk")).distinct()
        .crossJoin(li.select(col("brand")).distinct())
      val filled = grid.join(wkq, Seq("brand", "wk"), "left")
        .withColumn("wq", coalesce(col("wq"), lit(0L)))
      val st = filled.groupBy(col("brand"))
        .agg(count(lit(1)).as("nw"), sum(col("wq")).as("s1"),
          sum(col("wq") * col("wq")).as("s2"))
        .select(col("brand"), col("nw"),
          (col("s1").cast("double") / col("nw")).as("mw"),
          sqrt((col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("nw")) /
            (col("nw") - 1)).as("sdw"),
          (col("s1").cast("double") * 52.0 / col("nw")).as("d_annual"))
      st.select(col("brand"), col("nw").as("n_weeks"),
          round(col("d_annual"), 1).as("d_annual"),
          round(sqrt(lit(2.0) * col("d_annual") * 100.0 / 2.0), 2)
            .as("eoq"),
          round(lit(1.6448536269514722) * col("sdw") *
            sqrt(lit(2.0)), 2).as("safety_stock"),
          round(col("mw") * 2.0 + lit(1.6448536269514722) * col("sdw") *
            sqrt(lit(2.0)), 2).as("reorder_point"))
        .orderBy(col("brand"))
    }),

    "q370_bass_diffusion" -> ((s, dir) => {
      // Bass diffusion fit on weekly customer adoption (first-order
      // week): the discrete-OLS estimation n(t) = a + b N(t-1) +
      // c N(t-1)^2, solved in closed form via Cramer on the 3x3 normal
      // equations. Moment sums run in DECIMAL(38,0) — N^4-scale terms
      // overflow BIGINT and would drift as doubles; decimals keep both
      // engines bit-identical until the one cast before the solve.
      // Innovation p, imitation q and market size m come from the
      // quadratic's roots (guarded: reported only when c < 0).
      val firsts = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min((datediff(to_date(col("o_orderdate")),
          lit("1992-01-01")).cast("long") / lit(7L)).cast("long"))
          .as("wk"))
      val adopt = firsts.groupBy(col("wk"))
        .agg(count(lit(1)).as("nt"))
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        adopt.withColumn("__g", lit(1)), "__g", "wk", col("nt"), "cumn")
        .select(col("wk"), col("nt"), (col("cumn") - col("nt")).as("nprev"))
      val d = "decimal(18,0)"
      val mo = cum.agg(count(lit(1)).as("nw"),
          sum(col("nprev").cast(d)).as("sx"),
          sum((col("nprev") * col("nprev")).cast(d)).as("sx2"),
          sum((col("nprev") * col("nprev")).cast(d) *
            col("nprev").cast(d)).as("sx3"),
          sum((col("nprev") * col("nprev")).cast(d) *
            (col("nprev") * col("nprev")).cast(d)).as("sx4"),
          sum(col("nt").cast(d)).as("sy"),
          sum((col("nt") * col("nprev")).cast(d)).as("sxy"),
          sum((col("nt") * col("nprev")).cast(d) * col("nprev").cast(d))
            .as("sx2y"))
      // Cramer on [[n,sx,sx2],[sx,sx2,sx3],[sx2,sx3,sx4]] [a b c]' =
      // [sy, sxy, sx2y]' — all doubles from identical decimal inputs
      val sol = mo.select(col("nw"),
          col("nw").cast("double").as("m00"),
          col("sx").cast("double").as("m01"),
          col("sx2").cast("double").as("m02"),
          col("sx3").cast("double").as("m13"),
          col("sx4").cast("double").as("m23"),
          col("sy").cast("double").as("b0"),
          col("sxy").cast("double").as("b1"),
          col("sx2y").cast("double").as("b2"))
      def det3(a11: Column, a12: Column, a13: Column,
               a21: Column, a22: Column, a23: Column,
               a31: Column, a32: Column, a33: Column): Column =
        a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
          a13 * (a21 * a32 - a22 * a31)
      val (m00, m01, m02) = (col("m00"), col("m01"), col("m02"))
      val (m13, m23) = (col("m13"), col("m23"))
      val (b0, b1, b2) = (col("b0"), col("b1"), col("b2"))
      val dd = det3(m00, m01, m02, m01, m02, m13, m02, m13, m23)
      val da = det3(b0, m01, m02, b1, m02, m13, b2, m13, m23)
      val db = det3(m00, b0, m02, m01, b1, m13, m02, b2, m23)
      val dc = det3(m00, m01, b0, m01, m02, b1, m02, m13, b2)
      val abc = sol.select(col("nw").as("n_weeks"),
        (da / dd).as("a"), (db / dd).as("b"), (dc / dd).as("c"))
      abc.select(col("n_weeks"), round(col("a"), 4).as("a"),
        round(col("b"), 6).as("b"), round(col("c"), 8).as("c"),
        when(col("c") < 0, round((-col("b") -
          sqrt(col("b") * col("b") - lit(4.0) * col("a") * col("c"))) /
          (lit(2.0) * col("c")), 1)).as("m_est"),
        when(col("c") < 0, round(col("a") / ((-col("b") -
          sqrt(col("b") * col("b") - lit(4.0) * col("a") * col("c"))) /
          (lit(2.0) * col("c"))), 6)).as("p_innov"),
        when(col("c") < 0, round(-col("c") * ((-col("b") -
          sqrt(col("b") * col("b") - lit(4.0) * col("a") * col("c"))) /
          (lit(2.0) * col("c"))), 6)).as("q_imit"))
    }),

    "q371_page_trend" -> ((s, dir) => {
      // Page's L trend test on the q342 nation x segment block design,
      // with treatments in the a-priori ALPHABETICAL segment order —
      // the ordered-alternative Friedman (what Jonckheere q358 is to
      // Kruskal-Wallis q319). Within-block tied average ranks stay
      // integer as ar2 = 2*rank; L2 = 2L = sum j*ar2 is exact; the
      // no-tie normal approximation is used knowingly (ties are rare
      // on cent-level cell sums, and both engines compute identically).
      val segs = t(s, dir, "customer").select(col("c_mktsegment"))
        .distinct().select(col("c_mktsegment").as("seg"))
      val segIdx = graft.ops.PrefixSum.globalRank(
        segs, Seq(col("seg")), "j")
      val grid = t(s, dir, "nation")
        .select(col("n_nationkey").as("nk")).crossJoin(broadcast(segs))
      val sums = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"))
        .agg(sum(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"))
          .as("sv"))
      val cells = grid.join(sums, Seq("nk", "seg"), "left")
        .select(col("nk"), col("seg"), coalesce(col("sv"), lit(0L))
          .as("v"))
      val ranked = cells.as("a")
        .join(cells.as("b"), col("a.nk") === col("b.nk"))
        .groupBy(col("a.nk").as("nk"), col("a.seg").as("seg"))
        .agg((lit(2L) * sum(when(col("b.v") < col("a.v"), 1L)
          .otherwise(0L)) +
          sum(when(col("b.v") === col("a.v"), 1L).otherwise(0L)) + 1L)
          .as("ar2"))
      val l2 = ranked.join(broadcast(segIdx), Seq("seg"))
        .agg(sum(col("j") * col("ar2")).as("l2"))
      val bk = cells.agg(countDistinct(col("nk")).as("b"),
        countDistinct(col("seg")).as("k"))
      l2.crossJoin(broadcast(bk))
        .select(col("b").as("n_blocks"), col("k").as("k_treatments"),
          col("l2"),
          ((col("l2") - col("b").cast("double") * col("k") *
            (col("k") + 1) * (col("k") + 1) / 2) /
            sqrt(col("b").cast("double") * col("k") * col("k") *
              (col("k") + 1) * (col("k") + 1) * (col("k") - 1) / 36))
            .as("zr"))
        .select(col("n_blocks"), col("k_treatments"), col("l2"),
          round(col("zr"), 4).as("z"),
          when(col("zr") > 1.645, "upward_trend")
            .when(col("zr") < -1.645, "downward_trend")
            .otherwise("no_trend").as("verdict"))
    }),

    "q372_ansari_bradley" -> ((s, dir) => {
      // Ansari-Bradley dispersion test: did order-value SPREAD change
      // from 1995 to 1996 (same location family as Mann-Whitney q278
      // tests, but scoring extremeness a_i = min(rk, n+1-rk) instead
      // of position)? Pooled exact ranks via the two-phase ranker;
      // the AB statistic is an exact integer score sum; parity-split
      // closed-form moments (even/odd n differ).
      val base = t(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .select(when(year(col("o_orderdate")) === 1995, 1L).otherwise(0L)
          .as("ga"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
          col("o_orderkey").as("ok"))
      val ranked = graft.ops.PrefixSum.globalRank(
        base, Seq(col("v"), col("ok")), "rk")
      val nn = base.agg(count(lit(1)).as("n"), sum(col("ga")).as("na"))
      val ab = ranked.crossJoin(broadcast(nn))
        .select(col("ga"), col("n"), col("na"),
          least(col("rk"), col("n") + 1 - col("rk")).as("sc"))
        .groupBy(col("n"), col("na"))
        .agg(sum(col("ga") * col("sc")).as("ab"))
        .select(col("n"), col("na"), (col("n") - col("na")).as("nb"),
          col("ab"))
      ab.select(col("na").as("n_1995"), col("nb").as("n_1996"),
          col("ab").as("ab_stat"),
          when(pmod(col("n"), lit(2L)) === 0,
            (col("ab") - col("na").cast("double") * (col("n") + 2) / 4) /
            sqrt(col("na").cast("double") * col("nb") * (col("n") + 2) *
              (col("n") - 2) / (lit(48.0) * (col("n") - 1))))
          .otherwise(
            (col("ab") - col("na").cast("double") * (col("n") + 1) *
              (col("n") + 1) / (lit(4.0) * col("n"))) /
            sqrt(col("na").cast("double") * col("nb") * (col("n") + 1) *
              (lit(3.0) + col("n").cast("double") * col("n")) /
              (lit(48.0) * col("n").cast("double") * col("n"))))
            .as("zr"))
        .select(col("n_1995"), col("n_1996"), col("ab_stat"),
          round(col("zr"), 4).as("z"),
          when(col("zr") > 1.96, "less_dispersed_1995")
            .when(col("zr") < -1.96, "more_dispersed_1995")
            .otherwise("no_change").as("verdict"))
    }),

    "q373_chow_test" -> ((s, dir) => {
      // Chow structural-break F on the daily-revenue time trend at
      // 1995-01-01: fit OLS on each side and pooled, compare SSRs —
      // "did the line itself change" (q176's CUSUM locates a level
      // shift; this tests slope+intercept jointly at a KNOWN break).
      // df1=2 makes the F survival exact: (1 + 2F/m)^(-m/2). t is the
      // plain epoch-day (no ranking pass needed); y in dollars keeps
      // double sums conditioned.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0)
          .cast("double").as("y"))
        .select(datediff(col("day"), lit("1992-01-01")).cast("double")
          .as("tt"), col("y"),
          when(col("day") < "1995-01-01", 1L).otherwise(2L).as("seg"))
      def ssr(grouped: DataFrame): DataFrame = grouped
        .select(col("g"), col("n"),
          (col("syy") - col("sy") * col("sy") / col("n") -
            (col("sty") - col("st") * col("sy") / col("n")) *
            (col("sty") - col("st") * col("sy") / col("n")) /
            (col("stt") - col("st") * col("st") / col("n"))).as("ssr"))
      val parts = ssr(daily.groupBy(col("seg").as("g"))
        .agg(count(lit(1)).cast("double").as("n"), sum(col("tt")).as("st"),
          sum(col("tt") * col("tt")).as("stt"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("tt") * col("y")).as("sty")))
      val pooled = ssr(daily.withColumn("g", lit(0L)).groupBy(col("g"))
        .agg(count(lit(1)).cast("double").as("n"), sum(col("tt")).as("st"),
          sum(col("tt") * col("tt")).as("stt"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("tt") * col("y")).as("sty")))
      val agg = parts.agg(sum(col("ssr")).as("ssr12"),
        sum(col("n")).as("n"))
      agg.crossJoin(broadcast(pooled.select(col("ssr").as("ssrp"))))
        .select(col("n").cast("long").as("n_days"),
          round(col("ssrp") / 1e6, 2).as("ssr_pooled_m"),
          round(col("ssr12") / 1e6, 2).as("ssr_split_m"),
          (((col("ssrp") - col("ssr12")) / 2) /
            (col("ssr12") / (col("n") - 4))).as("f"))
        .select(col("n_days"), col("ssr_pooled_m"), col("ssr_split_m"),
          round(col("f"), 4).as("chow_f"),
          round(pow(lit(1.0) + lit(2) * col("f") /
            (col("n_days").cast("double") - 4),
            -(col("n_days").cast("double") - 4) / 2), 6).as("p_value"))
    }),

    "q374_breusch_pagan" -> ((s, dir) => {
      // Breusch-Pagan heteroskedasticity test on the daily-revenue
      // trend residuals (regress e^2 on t, LM = n R^2): does variance
      // itself drift over time — the assumption q323's Durbin-Watson
      // and every OLS standard error lean on. Two passes: moments,
      // then residual moments against t; chi2 df=1 survival via the
      // A&S erf polynomial.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0)
          .cast("double").as("y"))
        .select(datediff(col("day"), lit("1992-01-01")).cast("double")
          .as("tt"), col("y"))
      val mo = daily.agg(count(lit(1)).cast("double").as("n"),
          sum(col("tt")).as("st"), sum(col("tt") * col("tt")).as("stt"),
          sum(col("y")).as("sy"), sum(col("tt") * col("y")).as("sty"))
        .select(col("n"),
          ((col("sty") - col("st") * col("sy") / col("n")) /
            (col("stt") - col("st") * col("st") / col("n"))).as("beta"),
          col("st"), col("sy"))
        .select(col("n"), col("beta"),
          ((col("sy") - col("beta") * col("st")) / col("n")).as("alpha"))
      val res = daily.crossJoin(broadcast(mo))
        .select(col("tt"),
          (col("y") - col("alpha") - col("beta") * col("tt")).as("e"))
        .select(col("tt"), (col("e") * col("e")).as("u"))
      val lm = res.agg(count(lit(1)).cast("double").as("n"),
          sum(col("tt")).as("st"), sum(col("tt") * col("tt")).as("stt"),
          sum(col("u")).as("su"), sum(col("u") * col("u")).as("suu"),
          sum(col("tt") * col("u")).as("stu"))
        .select(col("n"),
          ((col("stu") - col("st") * col("su") / col("n")) *
            (col("stu") - col("st") * col("su") / col("n")) /
            ((col("stt") - col("st") * col("st") / col("n")) *
             (col("suu") - col("su") * col("su") / col("n"))))
            .as("r2"))
        .select(col("n"), (col("n") * col("r2")).as("lm"))
      val xs = sqrt(col("lm")) / math.sqrt(2.0)
      val ts = lit(1.0) / (lit(1.0) + lit(0.3275911) * xs)
      lm.select(col("n").cast("long").as("n_days"),
        round(col("lm"), 4).as("lm_stat"),
        round((lit(0.254829592) * ts - lit(0.284496736) * ts * ts +
          lit(1.421413741) * ts * ts * ts - lit(1.453152027) *
          ts * ts * ts * ts + lit(1.061405429) * ts * ts * ts * ts * ts) *
          exp(-xs * xs), 6).as("p_value"))
    }),

    "q375_jarque_bera" -> ((s, dir) => {
      // Jarque-Bera normality on the same trend residuals: skewness +
      // excess kurtosis jointly, chi2 df=2 survival EXACTLY exp(-x/2)
      // — the moment-based cross-check on q362's ECDF-based
      // Lilliefors (they reject for different shapes of
      // non-normality).
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0)
          .cast("double").as("y"))
        .select(datediff(col("day"), lit("1992-01-01")).cast("double")
          .as("tt"), col("y"))
      val mo = daily.agg(count(lit(1)).cast("double").as("n"),
          sum(col("tt")).as("st"), sum(col("tt") * col("tt")).as("stt"),
          sum(col("y")).as("sy"), sum(col("tt") * col("y")).as("sty"))
        .select(col("n"),
          ((col("sty") - col("st") * col("sy") / col("n")) /
            (col("stt") - col("st") * col("st") / col("n"))).as("beta"),
          col("st"), col("sy"))
        .select(col("n"), col("beta"),
          ((col("sy") - col("beta") * col("st")) / col("n")).as("alpha"))
      val res = daily.crossJoin(broadcast(mo))
        .select((col("y") - col("alpha") - col("beta") * col("tt"))
          .as("e"))
      val jb = res.agg(count(lit(1)).cast("double").as("n"),
          sum(col("e")).as("s1"), sum(col("e") * col("e")).as("s2"),
          sum(col("e") * col("e") * col("e")).as("s3"),
          sum(col("e") * col("e") * col("e") * col("e")).as("s4"))
        .select(col("n"), (col("s2") / col("n")).as("v2"),
          (col("s3") / col("n")).as("m3"), (col("s4") / col("n")).as("m4"))
        .select(col("n"),
          (col("m3") / pow(col("v2"), 1.5)).as("g1"),
          (col("m4") / (col("v2") * col("v2")) - 3).as("g2"))
        .select(col("n"), col("g1"), col("g2"),
          (col("n") / 6 * (col("g1") * col("g1") +
            col("g2") * col("g2") / 4)).as("jb"))
      jb.select(col("n").cast("long").as("n_days"),
        round(col("g1"), 4).as("skew"),
        round(col("g2"), 4).as("ex_kurt"),
        round(col("jb"), 4).as("jb_stat"),
        round(exp(-col("jb") / 2), 6).as("p_value"))
    }),

    "q376_cooks_distance" -> ((s, dir) => {
      // Influence audit for the daily-revenue trend: Cook's distance
      // per day (residual x leverage), top-5 by rounded D — which
      // single days most bend the fitted line (the per-point companion
      // to q373's global break test). Leverage is closed-form for
      // simple regression; ranking on ROUNDED D + day keeps the top-5
      // engine-stable.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0)
          .cast("double").as("y"))
        .select(col("day"),
          datediff(col("day"), lit("1992-01-01")).cast("double")
            .as("tt"), col("y"))
      val mo = daily.agg(count(lit(1)).cast("double").as("n"),
          sum(col("tt")).as("st"), sum(col("tt") * col("tt")).as("stt"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
          sum(col("tt") * col("y")).as("sty"))
        .select(col("n"), col("st"), col("stt"),
          ((col("sty") - col("st") * col("sy") / col("n")) /
            (col("stt") - col("st") * col("st") / col("n"))).as("beta"),
          col("sy"), col("syy"), col("sty"))
        .select(col("n"), col("beta"),
          ((col("sy") - col("beta") * col("st")) / col("n")).as("alpha"),
          (col("st") / col("n")).as("tbar"),
          (col("stt") - col("st") * col("st") / col("n")).as("sxx"),
          ((col("syy") - col("sy") * col("sy") / col("n") -
            (col("sty") - col("st") * col("sy") / col("n")) *
            (col("sty") - col("st") * col("sy") / col("n")) /
            (col("stt") - col("st") * col("st") / col("n"))) /
            (col("n") - 2)).as("s2"))
      daily.crossJoin(broadcast(mo))
        .select(col("day"), col("tt"),
          (col("y") - col("alpha") - col("beta") * col("tt")).as("e"),
          (lit(1.0) / col("n") +
            (col("tt") - col("tbar")) * (col("tt") - col("tbar")) /
            col("sxx")).as("h"), col("s2"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("e"), 2).as("residual"),
          round(col("h"), 6).as("leverage"),
          round(col("e") * col("e") / (lit(2.0) * col("s2")) *
            col("h") / ((lit(1.0) - col("h")) * (lit(1.0) - col("h"))),
            6).as("cooks_d"))
        .orderBy(col("cooks_d").desc, col("day"))
        .limit(5)
    }),

    "q377_rouge1" -> ((s, dir) => {
      // ROUGE-1 (unigram multiset overlap) between each original doc
      // and its planted mutated copy — the reference-based overlap
      // eval LLM pipelines run on generated vs gold text; here the
      // planted family pairs give a known gold alignment. Clipped
      // counts = min(ref, cand) per (family, term); all counts exact
      // integers, BM25's tokenizer dialect (q94) on both engines.
      val toks = docsWithNearDups(s, dir)
        .select(pmod(col("doc_id"), lit(100000L)).as("fam"),
          when(col("doc_id") < 100000L, lit("ref")).otherwise(lit("cand"))
            .as("side"),
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
        .filter(col("term") =!= "")
      val cnt = toks.groupBy(col("fam"), col("side"), col("term"))
        .agg(count(lit(1)).as("c"))
      val lens = toks.groupBy(col("fam"), col("side"))
        .agg(count(lit(1)).as("len"))
      val ov = cnt.filter(col("side") === "ref")
        .select(col("fam"), col("term"), col("c").as("cr"))
        .join(cnt.filter(col("side") === "cand")
          .select(col("fam"), col("term"), col("c").as("cc")),
          Seq("fam", "term"))
        .groupBy(col("fam"))
        .agg(sum(least(col("cr"), col("cc"))).as("ov"))
      val per = lens.filter(col("side") === "ref")
        .select(col("fam"), col("len").as("lr"))
        .join(lens.filter(col("side") === "cand")
          .select(col("fam"), col("len").as("lc")), Seq("fam"))
        .join(ov, Seq("fam"), "left")
        .withColumn("ov", coalesce(col("ov"), lit(0L)))
        .select(col("fam"),
          (col("ov").cast("double") / col("lr")).as("r"),
          (col("ov").cast("double") / col("lc")).as("p"))
        .select(col("fam"), col("r"), col("p"),
          when(col("r") + col("p") > 0,
            lit(2.0) * col("r") * col("p") / (col("r") + col("p")))
            .otherwise(0.0).as("f1"))
      per.agg(count(lit(1)).as("n_pairs"),
        round(avg(col("r")), 4).as("avg_recall"),
        round(avg(col("p")), 4).as("avg_precision"),
        round(avg(col("f1")), 4).as("avg_f1"))
    }),

    "q378_bleu2" -> ((s, dir) => {
      // Corpus-level BLEU-2 of the mutated copies against their
      // originals: clipped unigram+bigram precision with the brevity
      // penalty — the order-sensitive companion to q377's bag-of-words
      // ROUGE (a shuffled copy keeps ROUGE-1 but loses bigrams).
      // Bigrams come from the positional token index (posexplode), so
      // candidate n-gram totals are exact.
      val toks = docsWithNearDups(s, dir)
        .select(pmod(col("doc_id"), lit(100000L)).as("fam"),
          when(col("doc_id") < 100000L, lit("ref")).otherwise(lit("cand"))
            .as("side"),
          posexplode(filter(split(lower(col("text")), "[^a-z0-9]+"),
            x => x =!= "")))
        .select(col("fam"), col("side"), col("pos").as("i"),
          col("col").as("term"))
      def grams(n: Int): DataFrame =
        if (n == 1) toks.select(col("fam"), col("side"), col("term"))
        else toks.as("a").join(toks.as("b"),
            col("a.fam") === col("b.fam") &&
            col("a.side") === col("b.side") &&
            col("b.i") === col("a.i") + 1)
          .select(col("a.fam").as("fam"), col("a.side").as("side"),
            concat_ws(" ", col("a.term"), col("b.term")).as("term"))
      def clipped(g: DataFrame): DataFrame = {
        val c = g.groupBy(col("fam"), col("side"), col("term"))
          .agg(count(lit(1)).as("c"))
        c.filter(col("side") === "ref")
          .select(col("fam"), col("term"), col("c").as("cr"))
          .join(c.filter(col("side") === "cand")
            .select(col("fam"), col("term"), col("c").as("cc")),
            Seq("fam", "term"))
          .agg(sum(least(col("cr"), col("cc"))).as("m"))
      }
      val tot = toks.groupBy(col("side"))
        .agg(count(lit(1)).as("t"), countDistinct(col("fam")).as("nf"))
      val t1c = tot.filter(col("side") === "cand")
        .select(col("t").as("t1"), col("nf"))
      val t1r = tot.filter(col("side") === "ref")
        .select(col("t").as("tr"))
      val t2 = grams(2).filter(col("side") === "cand")
        .agg(count(lit(1)).as("t2"))
      clipped(grams(1)).withColumnRenamed("m", "m1")
        .crossJoin(broadcast(clipped(grams(2))
          .withColumnRenamed("m", "m2")))
        .crossJoin(broadcast(t1c)).crossJoin(broadcast(t1r))
        .crossJoin(broadcast(t2))
        .select(col("nf").as("n_pairs"),
          (col("m1").cast("double") / col("t1")).as("p1"),
          (col("m2").cast("double") / col("t2")).as("p2"),
          least(lit(1.0), exp(lit(1.0) -
            col("tr").cast("double") / col("t1"))).as("bp"))
        .select(col("n_pairs"), round(col("p1"), 4).as("p1"),
          round(col("p2"), 4).as("p2"), round(col("bp"), 4).as("bp"),
          round(col("bp") *
            exp(lit(0.5) * log(col("p1")) + lit(0.5) * log(col("p2"))),
            4).as("bleu2"))
    }),

    "q379_fd_discovery" -> ((s, dir) => {
      // Functional-dependency discovery over the orders schema: for
      // every directed attribute pair A -> B, count the A-groups with
      // more than one distinct B (zero = the FD holds exactly). The
      // classic profiling primitive behind key detection and
      // normalization advice — one grouped countDistinct pass per LHS,
      // never a pairwise row join. Finds o_orderkey -> * (the key)
      // among the 20 candidates; everything else reports its exact
      // violating-group count.
      val attrs = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_orderdate")
      val df = t(s, dir, "orders")
        .select(attrs.map(col): _*)
      val parts = attrs.map { a =>
        val others = attrs.filterNot(_ == a)
        val g2 = df.groupBy(col(a))
          .agg(countDistinct(col(others.head)).as(s"d_${others.head}"),
            others.tail.map(b => countDistinct(col(b)).as(s"d_$b")): _*)
        val viols = g2.agg(
          sum(when(col(s"d_${others.head}") > 1, 1L).otherwise(0L))
            .as(s"v_${others.head}"),
          others.tail.map(b =>
            sum(when(col(s"d_$b") > 1, 1L).otherwise(0L)).as(s"v_$b")): _*)
        viols.select(others.map(b =>
          struct(lit(a).as("lhs"), lit(b).as("rhs"),
            col(s"v_$b").as("nv")).as(s"s_$b")): _*)
          .select(explode(array(others.map(b => col(s"s_$b")): _*))
            .as("r"))
          .select(col("r.lhs").as("lhs"), col("r.rhs").as("rhs"),
            col("r.nv").as("n_violating_groups"))
      }
      parts.reduce(_ unionAll _)
        .withColumn("holds", col("n_violating_groups") === 0)
        .orderBy(col("lhs"), col("rhs"))
    }),

    "q380_ind_discovery" -> ((s, dir) => {
      // Inclusion-dependency discovery (the cross-table FD sibling):
      // is every distinct value of column A present in column B —
      // the foreign-key candidate test, run as distinct-project +
      // anti-join counts, never a row-level join. The candidate list
      // covers the real TPC-H FKs plus one deliberately false
      // direction (customers without orders).
      def ind(name: String, lhs: DataFrame, lc: String,
              rhs: DataFrame, rc: String): DataFrame = {
        val l = lhs.select(col(lc).cast("long").as("v")).distinct()
        val r = rhs.select(col(rc).cast("long").as("v")).distinct()
        l.join(r, Seq("v"), "left_anti")
          .agg(count(lit(1)).as("n_missing"))
          .crossJoin(broadcast(l.agg(count(lit(1)).as("n_distinct_lhs"))))
          .select(lit(name).as("candidate"), col("n_distinct_lhs"),
            col("n_missing"), (col("n_missing") === 0).as("holds"))
      }
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val l = t(s, dir, "lineitem"); val n = t(s, dir, "nation")
      val su = t(s, dir, "supplier"); val r = t(s, dir, "region")
      Seq(
        ind("o_custkey<=c_custkey", o, "o_custkey", c, "c_custkey"),
        ind("l_orderkey<=o_orderkey", l, "l_orderkey", o, "o_orderkey"),
        ind("c_nationkey<=n_nationkey", c, "c_nationkey", n,
          "n_nationkey"),
        ind("s_nationkey<=n_nationkey", su, "s_nationkey", n,
          "n_nationkey"),
        ind("n_regionkey<=r_regionkey", n, "n_regionkey", r,
          "r_regionkey"),
        ind("c_custkey<=o_custkey", c, "c_custkey", o, "o_custkey"))
        .reduce(_ unionAll _)
        .orderBy(col("candidate"))
    }),

    "q381_tree_rollup" -> ((s, dir) => {
      // Hierarchical subtree rollup over the implied div-10 customer
      // tree (parent(x) = x div 10): subtree totals for every internal
      // node WITHOUT recursion — each row explodes to its <= 7
      // ancestors (depth is digit-bounded), one hash aggregate does
      // the whole tree. The scale-correct form of the recursive-CTE
      // org-chart rollup: depth-bounded explode beats iteration at
      // any corpus size. Top-10 internal nodes by exact subtree cents.
      import s.implicits._
      val base = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("ck"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
      val pows = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L)
        .toDF("p")
      val anc = base.crossJoin(broadcast(pows))
        .select(expr("ck div p").as("node"), col("v"),
          when(col("p") === 1, 0L).otherwise(1L).as("is_desc"))
        .filter(col("node") > 0)
      val roll = anc.groupBy(col("node"))
        .agg(sum(col("v")).as("subtree_cents"),
          sum(col("is_desc")).as("n_desc"))
        .filter(col("n_desc") > 0)
      roll.orderBy(col("subtree_cents").desc, col("node")).limit(10)
        .select(col("node"), col("n_desc"),
          round(col("subtree_cents").cast("double") / 100.0, 2)
            .as("subtree_dollars"))
    }),

    "q382_late_events" -> ((s, dir) => {
      // Watermark replay in batch: with arrival order = event_id and a
      // 1-hour watermark (max event time seen so far minus 1h), which
      // events would streaming ingestion drop as late? The prefix MAX
      // over arrival order runs two-phase like PrefixSum (range
      // partition -> per-partition window keyed by partition id ->
      // broadcast per-partition offsets) — no global-order window
      // task at any scale. Exact microsecond arithmetic both engines.
      val ev = events(s, dir)
        .select(col("event_id").as("id"), col("event_type").as("et"),
          unix_micros(col("ts")).as("tsu"))
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val ranged = ev.repartitionByRange(p, col("id"))
        .withColumn("__pid", spark_partition_id())
        .persist()
      val offs = ranged.groupBy(col("__pid"))
        .agg(max(col("tsu")).as("pmax"))
      val wOff = Window.orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = offs
        .withColumn("__off", max(col("pmax")).over(wOff))
        .select(col("__pid"), col("__off"))
      val wRun = Window.partitionBy(col("__pid")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val marked = ranged
        .withColumn("__run", max(col("tsu")).over(wRun))
        .join(broadcast(offsets), Seq("__pid"))
        .withColumn("wm", greatest(coalesce(col("__run"), lit(Long.MinValue)),
          coalesce(col("__off"), lit(Long.MinValue))) - 3600000000L)
        .withColumn("late",
          when(col("__run").isNull && col("__off").isNull, 0L)
            .otherwise(when(col("tsu") < col("wm"), 1L).otherwise(0L)))
      marked.groupBy(col("et"))
        .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"))
        .select(col("et"), col("n_events"), col("n_late"),
          round(col("n_late").cast("double") / col("n_events"), 4)
            .as("late_share"))
        .orderBy(col("et"))
    }),

    "q383_weighted_median" -> ((s, dir) => {
      // Weighted median unit price per return flag (weights =
      // quantities): the "typical traded price" a plain median
      // misstates when line sizes vary. Grouped two-phase prefix sums
      // over the (price, key)-ordered weights; the median is the first
      // row where 2*cumweight >= total — exact integer arithmetic end
      // to end.
      val base = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("fl"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"),
          col("l_quantity").cast("long").as("w"),
          (expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)") *
            lit(17179869184L) + col("l_orderkey") * 8 +
            col("l_linenumber")).as("ok"))
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        base, "fl", "ok", col("w"), "cw")
      val tot = base.groupBy(col("fl")).agg(sum(col("w")).as("tw"))
      cum.join(broadcast(tot), Seq("fl"))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("fl"), col("tw"))
        .agg(min(col("cents")).as("med_cents"))
        .select(col("fl").as("returnflag"), col("tw").as("total_weight"),
          round(col("med_cents").cast("double") / 100.0, 2)
            .as("weighted_median_price"))
        .orderBy(col("returnflag"))
    }),

    "q384_overdispersion" -> ((s, dir) => {
      // Count-data overdispersion report per event type on the
      // ZERO-FILLED user x type grid (skipping inactive users is the
      // classic way to fake Poisson-ness): dispersion index, observed
      // vs Poisson-predicted zero share, and the method-of-moments
      // negative-binomial size when variance exceeds the mean — the
      // "is a Poisson model even admissible" gate for rate modeling.
      val ev = events(s, dir)
        .select(col("user_id").as("u"), col("event_type").as("et"))
      val cnts = ev.groupBy(col("u"), col("et")).agg(count(lit(1)).as("c"))
      val grid = ev.select(col("u")).distinct()
        .crossJoin(ev.select(col("et")).distinct())
      val filled = grid.join(cnts, Seq("u", "et"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      filled.groupBy(col("et"))
        .agg(count(lit(1)).as("n_users"), sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"),
          sum(when(col("c") === 0, 1L).otherwise(0L)).as("z"))
        .select(col("et"), col("n_users"),
          (col("s1").cast("double") / col("n_users")).as("m"),
          ((col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("n_users")) /
            (col("n_users") - 1)).as("v"),
          (col("z").cast("double") / col("n_users")).as("z_obs"))
        .select(col("et"), col("n_users"), round(col("m"), 4).as("mean"),
          round(col("v"), 4).as("variance"),
          round(col("v") / col("m"), 4).as("dispersion"),
          round(col("z_obs"), 4).as("zero_share_obs"),
          round(exp(-col("m")), 6).as("zero_share_poisson"),
          when(col("v") > col("m"),
            round(col("m") * col("m") / (col("v") - col("m")), 4))
            .as("nb_size"))
        .orderBy(col("et"))
    }),

    "q385_gumbel_maxima" -> ((s, dir) => {
      // Gumbel fit on weekly maximum order values (block maxima,
      // method of moments): location/scale from the calendar-bounded
      // maxima series, and the 99% return level — "the weekly max to
      // expect once per 100 weeks". The extreme-value companion to
      // q262's Hill tail index (maxima vs tail-ratio view).
      val wk = t(s, dir, "orders")
        .groupBy((datediff(to_date(col("o_orderdate")),
          lit("1992-01-01")).cast("long") / lit(7L)).cast("long")
          .as("wk"))
        .agg(max(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("mx"))
      val st = wk.agg(count(lit(1)).as("nw"), sum(col("mx")).as("s1"),
          sum(col("mx") * col("mx")).as("s2"))
        .select(col("nw"),
          (col("s1").cast("double") / col("nw") / 100.0).as("m"),
          (sqrt((col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("nw")) /
            (col("nw") - 1)) / 100.0).as("sd"))
      st.select(col("nw").as("n_weeks"),
          (col("sd") * math.sqrt(6.0) / math.Pi).as("beta"),
          col("m"), col("sd"))
        .select(col("n_weeks"),
          (col("m") - lit(0.5772156649015329) * col("beta")).as("mu"),
          col("beta"))
        .select(col("n_weeks"), round(col("mu"), 2).as("gumbel_mu"),
          round(col("beta"), 2).as("gumbel_beta"),
          round(col("mu") - col("beta") *
            log(-log(lit(0.99))), 2).as("return_level_p99"))
    }),

    "q386_pot_gpd" -> ((s, dir) => {
      // Peaks-over-threshold: excesses above the EXACT p95 rank of
      // order value, generalized-Pareto shape/scale by method of
      // moments, and the extrapolated 99.9% quantile — the POT view
      // that uses every tail point (q385's block maxima throw away
      // all but the weekly winner). Threshold at an exact rank keeps
      // the excess set engine-identical.
      val o = t(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("v"), col("o_orderkey").as("ok"))
      val ranked = graft.ops.PrefixSum.globalRank(
        o, Seq(col("v"), col("ok")), "rk")
      val nn = o.agg(count(lit(1)).as("n"))
      val thr = ranked.crossJoin(broadcast(nn))
        .filter(col("rk") === expr("(n * 95 + 99) div 100"))
        .select(col("v").as("u"), col("n"))
      val exc = o.crossJoin(broadcast(thr))
        .filter(col("v") > col("u"))
        .select(((col("v") - col("u")).cast("double") / 100.0).as("e"),
          col("u"), col("n"))
      val st = exc.groupBy(col("u"), col("n"))
        .agg(count(lit(1)).as("nu"), avg(col("e")).as("me"),
          sum(col("e") * col("e")).as("s2"))
        .select(col("u"), col("n"), col("nu"), col("me"),
          ((col("s2") - col("nu") * col("me") * col("me")) /
            (col("nu") - 1)).as("ve"))
        .select(col("u"), col("n"), col("nu"), col("me"),
          (lit(0.5) * (lit(1.0) - col("me") * col("me") / col("ve")))
            .as("xi"),
          (lit(0.5) * col("me") *
            (col("me") * col("me") / col("ve") + 1)).as("beta"))
      st.select(round(col("u").cast("double") / 100.0, 2)
            .as("threshold_p95"),
          col("nu").as("n_excesses"), round(col("xi"), 4).as("gpd_xi"),
          round(col("beta"), 2).as("gpd_beta"),
          round(col("u").cast("double") / 100.0 + col("beta") /
            col("xi") * (pow(col("n").cast("double") / col("nu") *
              0.001, -col("xi")) - 1), 2).as("q999_est"))
    }),

    "q387_robust_location" -> ((s, dir) => {
      // Robust central tendency of order value: 5% trimmed mean (drop
      // both tails) and 5% winsorized mean (clamp to the exact cut
      // values) vs the raw mean — how much heavy tails move the
      // headline average. Exact rank cuts; all sums stay integer
      // cents until the final divisions.
      val o = t(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("v"), col("o_orderkey").as("ok"))
      val ranked = graft.ops.PrefixSum.globalRank(
        o, Seq(col("v"), col("ok")), "rk")
        .crossJoin(broadcast(o.agg(count(lit(1)).as("n"))))
        .withColumn("k", expr("(n * 5) div 100"))
      val cuts = ranked
        .filter(col("rk") === col("k") + 1 ||
          col("rk") === col("n") - col("k"))
        .groupBy(col("n"), col("k"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val agg = ranked.crossJoin(broadcast(cuts.select(col("lo"),
          col("hi"))))
        .agg(count(lit(1)).as("n_orders"), sum(col("v")).as("sraw"),
          sum(when(col("rk") > col("k") &&
            col("rk") <= col("n") - col("k"), col("v")).otherwise(0L))
            .as("strim"),
          sum(when(col("rk") > col("k") &&
            col("rk") <= col("n") - col("k"), 1L).otherwise(0L))
            .as("ntrim"),
          sum(greatest(least(col("v"), col("hi")), col("lo")))
            .as("swin"))
      agg.select(col("n_orders"),
        round(col("sraw").cast("double") / col("n_orders") / 100.0, 2)
          .as("mean_raw"),
        round(col("strim").cast("double") / col("ntrim") / 100.0, 2)
          .as("mean_trimmed5"),
        round(col("swin").cast("double") / col("n_orders") / 100.0, 2)
          .as("mean_winsorized5"))
    }),

    "q388_octile_shape" -> ((s, dir) => {
      // Quantile-based robust shape: Bowley (quartile) skewness and
      // Moors (octile) kurtosis of order value — outlier-immune where
      // q351's moment skew/kurtosis saturate on heavy tails. All
      // eight octiles picked at exact ceil(i*n/8) ranks in one
      // conditional pass.
      val o = t(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("v"), col("o_orderkey").as("ok"))
      val ranked = graft.ops.PrefixSum.globalRank(
        o, Seq(col("v"), col("ok")), "rk")
        .crossJoin(broadcast(o.agg(count(lit(1)).as("n"))))
      val oct = ranked.agg(
        max(col("n")).as("n"),
        (1 to 7).map(i =>
          max(when(col("rk") === expr(s"(n * $i + 7) div 8"), col("v")))
            .as(s"e$i")): _*)
      oct.select(col("n").as("n_orders"),
        round((col("e6") + col("e2") - lit(2) * col("e4"))
          .cast("double") /
          (col("e6") - col("e2")), 4).as("bowley_skew"),
        round(((col("e7") - col("e5")) + (col("e3") - col("e1")))
          .cast("double") /
          (col("e6") - col("e2")), 4).as("moors_kurtosis"))
    }),

    "q389_imputation_audit" -> ((s, dir) => {
      // Imputation quality audit with a KNOWN ground truth: mask 20%
      // of balances missing by deterministic key hash, impute from the
      // (nation, segment) cell mean of the OBSERVED rows (global-mean
      // fallback), score MAE and bias against the held-out truth.
      // The "how much does group imputation actually buy" report every
      // data-repair pipeline should ship with.
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("sg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"),
          (pmod(Sampling.keyHash(col("c_custkey")), lit(10L)) < 2)
            .as("miss"))
      val obs = base.filter(!col("miss"))
      val cell = obs.groupBy(col("nk"), col("sg"))
        .agg((sum(col("v")).cast("double") / count(lit(1))).as("cm"))
      val glob = obs.agg((sum(col("v")).cast("double") / count(lit(1)))
        .as("gm"))
      base.filter(col("miss"))
        .join(broadcast(cell), Seq("nk", "sg"), "left")
        .crossJoin(broadcast(glob))
        .select(col("v"), coalesce(col("cm"), col("gm")).as("grp"),
          col("gm"))
        .agg(count(lit(1)).as("n_missing"),
          avg(abs(col("grp") - col("v"))).as("mae_g"),
          avg(col("grp") - col("v")).as("bias_g"),
          avg(abs(col("gm") - col("v"))).as("mae_gl"))
        .select(col("n_missing"),
          round(col("mae_g") / 100.0, 2).as("mae_group"),
          round(col("bias_g") / 100.0, 2).as("bias_group"),
          round(col("mae_gl") / 100.0, 2).as("mae_global"))
    }),

    "q390_k_anonymity" -> ((s, dir) => {
      // k-anonymity / l-diversity audit: quasi-identifier = (nation,
      // exact acctbal decile), sensitive attribute = market segment.
      // Reports the smallest QI group (k), the share of customers in
      // groups below k=5 (re-identifiable), and the share of groups
      // with a single sensitive value (attribute disclosure even at
      // high k). Deciles from the two-phase global rank — exact, so
      // the QI partition is engine-identical.
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("sg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
      val ranked = graft.ops.PrefixSum.globalRank(
        base, Seq(col("v"), col("ck")), "rk")
        .crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
        .withColumn("dec", expr("((rk - 1) * 10) div n"))
      val grp = ranked.groupBy(col("nk"), col("dec"))
        .agg(count(lit(1)).as("sz"), countDistinct(col("sg")).as("l"))
      grp.agg(count(lit(1)).as("n_groups"), sum(col("sz")).as("n_rows"),
          min(col("sz")).as("k_min"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0L))
            .as("rows_lt5"),
          min(col("l")).as("l_min"),
          sum(when(col("l") < 2, 1L).otherwise(0L)).as("groups_l1"))
        .select(col("n_groups"), col("n_rows"), col("k_min"),
          round(col("rows_lt5").cast("double") / col("n_rows"), 4)
            .as("share_rows_below_k5"),
          col("l_min"),
          round(col("groups_l1").cast("double") / col("n_groups"), 4)
            .as("share_groups_l1"))
    }),

    "q391_holt_winters" -> ((s, dir) => {
      // Additive Holt-Winters (season length 4) over the 27-quarter
      // revenue series — q364's Holt plus a seasonal state vector,
      // folded the same way: 23 fixed-operand steps on a ONE-row wide
      // frame, checkpoint barriers, one-step MAE accumulated in-fold.
      // Each step touches exactly one seasonal slot (the step index is
      // a literal, so the update compiles to plain column arithmetic).
      val qidx = expr(
        "(year(o_orderdate) - 1992) * 4 + (month(o_orderdate) - 1) div 3")
      val aggs = (0 to 26).map(k =>
        (sum(when(qidx === k,
          expr("CAST(floor(o_totalprice) AS BIGINT)")).otherwise(0L)) /
          1000.0).cast("double").as(s"y$k"))
      val wide = t(s, dir, "orders").agg(aggs.head, aggs.tail: _*)
      val ys = (0 to 26).map(k => col(s"y$k"))
      val initL = (col("y0") + col("y1") + col("y2") + col("y3")) / 4
      val initB = ((col("y4") + col("y5") + col("y6") + col("y7")) / 4 -
        (col("y0") + col("y1") + col("y2") + col("y3")) / 4) / 4
      var cur = wide.select(ys ++ Seq(initL.as("l"), initB.as("b"),
        (col("y0") - initL).as("s0"), (col("y1") - initL).as("s1"),
        (col("y2") - initL).as("s2"), (col("y3") - initL).as("s3"),
        lit(0.0).as("sae")): _*)
      val carry = ys
      for (tt <- 4 to 26) {
        val sj = s"s${tt % 4}"
        val pred = col("l") + col("b") + col(sj)
        val l2 = lit(0.3) * (col(s"y$tt") - col(sj)) +
          lit(0.7) * (col("l") + col("b"))
        val others = Seq(0, 1, 2, 3).filterNot(_ == tt % 4)
          .map(j => col(s"s$j"))
        cur = cur.select(carry ++ Seq(l2.as("l"),
          (lit(0.1) * (l2 - col("l")) + lit(0.9) * col("b")).as("b"),
          (lit(0.2) * (col(s"y$tt") - l2) + lit(0.8) * col(sj)).as(sj))
          ++ others ++
          Seq((col("sae") + abs(col(s"y$tt") - pred)).as("sae")): _*)
        if (tt % 8 == 0) cur = cur.localCheckpoint()
      }
      cur.select(lit(27L).as("n_quarters"),
        round(col("l"), 2).as("level_kusd"),
        round(col("b"), 2).as("trend_kusd"),
        round(col("l") + col("b") + col("s3"), 2).as("forecast_kusd"),
        round(col("sae") / 23.0, 2).as("mae_kusd"))
    }),

    "q392_cliffs_delta" -> ((s, dir) => {
      // Cliff's delta effect size between 1995 and 1996 order values —
      // the magnitude companion to rank TESTS (q278 says "different",
      // this says "by how much", robustly): P(X>Y) - P(X<Y) computed
      // from value-grouped counts + grouped prefix sums over the
      // shared value grid. No pair enumeration at any scale; exact
      // integers until the two final divisions.
      val base = t(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"))
      val cnt = base.groupBy(col("yr"), col("v"))
        .agg(count(lit(1)).as("c"))
      val grid = base.select(col("v")).distinct()
        .crossJoin(base.select(col("yr")).distinct())
      val filled = grid.join(cnt, Seq("yr", "v"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val cum = graft.ops.PrefixSum.groupedRunningSum(
        filled, "yr", "v", col("c"), "cum")
      val c96 = cum.filter(col("yr") === 1996)
        .select(col("v"), col("c").as("c96"), col("cum").as("cum96"))
      val c95 = cnt.filter(col("yr") === 1995)
        .select(col("v"), col("c").as("c95"))
      val tots = base.groupBy(col("yr")).agg(count(lit(1)).as("n"))
      val n95 = tots.filter(col("yr") === 1995).select(col("n").as("n95"))
      val n96 = tots.filter(col("yr") === 1996).select(col("n").as("n96"))
      c95.join(c96, Seq("v"))
        .crossJoin(broadcast(n96))
        .agg(sum(col("c95") * (col("cum96") - col("c96"))).as("gt"),
          sum(col("c95") * (col("n96") - col("cum96"))).as("lt"),
          sum(col("c95") * col("c96")).as("eq"))
        .crossJoin(broadcast(n95)).crossJoin(broadcast(n96))
        .select(col("n95"), col("n96"),
          round((col("gt") - col("lt")).cast("double") /
            (col("n95").cast("double") * col("n96")), 6)
            .as("cliffs_delta"),
          round((col("gt").cast("double") + lit(0.5) * col("eq")) /
            (col("n95").cast("double") * col("n96")), 4)
            .as("p_superiority"))
    }),

    "q393_g_test" -> ((s, dir) => {
      // G-test (log-likelihood-ratio chi-square) of segment x order-
      // priority independence: 2*sum O*ln(O*N/(R*C)) over the bounded
      // 5x5 table — additive across cells where Pearson's chi2 is not
      // (the property that makes G the right base for q152-style MI
      // decompositions; in fact G = 2N*MI). Exact integer margins;
      // df=16 survival in the even-df closed form.
      val cells = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("sg"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("sg"), col("o_orderpriority").as("pr"))
        .agg(count(lit(1)).as("o"))
      val rows = cells.groupBy(col("sg")).agg(sum(col("o")).as("r"))
      val cols_ = cells.groupBy(col("pr")).agg(sum(col("o")).as("c"))
      val nn = cells.agg(sum(col("o")).as("n"))
      val g = cells.join(broadcast(rows), Seq("sg"))
        .join(broadcast(cols_), Seq("pr"))
        .crossJoin(broadcast(nn))
        .agg(count(lit(1)).as("n_cells"), max(col("n")).as("n"),
          (lit(2.0) * sum(col("o") * log(col("o").cast("double") *
            col("n") / (col("r").cast("double") * col("c"))))).as("g"))
      val h = col("g") / 2
      val ser = (0 to 7).map(j =>
        pow(h, j.toDouble) / (1 to j).map(_.toDouble).product)
        .reduce(_ + _)
      g.select(col("n").as("n_orders"), col("n_cells"),
        round(col("g"), 4).as("g_stat"),
        round(exp(-h) * ser, 6).as("p_approx"))
    }),

    "q394_weibull_fit" -> ((s, dir) => {
      // Weibull fit of customer lifespans by median-rank regression:
      // ln(-ln(1-F)) on ln(duration) with Bernard's approximation
      // F_i = (i-0.3)/(n+0.4) at exact global ranks — the standard
      // reliability-engineering estimator, closed-form and
      // deterministic where MLE iteration is not. Shape < 1 reads as
      // infant-mortality churn, > 1 as wear-out.
      val durs = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
          .cast("long").as("dur"))
        .filter(col("dur") > 0)
      val ranked = graft.ops.PrefixSum.globalRank(
        durs, Seq(col("dur"), col("o_custkey")), "i")
        .crossJoin(broadcast(durs.agg(count(lit(1)).as("n"))))
      val pts = ranked.select(log(col("dur").cast("double")).as("x"),
        log(-log(lit(1.0) - (col("i").cast("double") - 0.3) /
          (col("n").cast("double") + 0.4))).as("y"))
      val fit = pts.agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
        .select(col("n"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n"))).as("k"),
          col("sx"), col("sy"))
        .select(col("n"), col("k"),
          ((col("sy") - col("k") * col("sx")) / col("n")).as("b"))
      fit.select(col("n").cast("long").as("n_cust"),
        round(col("k"), 4).as("weibull_shape"),
        round(exp(-col("b") / col("k")), 2).as("weibull_scale_days"),
        round(exp(-col("b") / col("k")) *
          pow(lit(math.log(2.0)), lit(1.0) / col("k")), 2)
          .as("median_days"))
    }),

    "q395_proportion_cis" -> ((s, dir) => {
      // Three confidence intervals for the per-segment high-balance
      // share: Wald (the one everyone uses), Wilson (the one that
      // works), Agresti-Coull (the compromise) — side by side so the
      // Wald undercoverage near the boundary is visible in the data,
      // not a textbook footnote. Closed forms from exact integer
      // (n, x) per segment.
      val z = lit(1.959963984540054)
      val base = t(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c_acctbal") > 5000, 1L).otherwise(0L)).as("x"))
        .select(col("segment"), col("n"), col("x"),
          (col("x").cast("double") / col("n")).as("p"))
      base.select(col("segment"), col("n"), col("x"),
          round(col("p"), 4).as("p_hat"),
          round(col("p") - z * sqrt(col("p") * (lit(1.0) - col("p")) /
            col("n")), 4).as("wald_lo"),
          round(col("p") + z * sqrt(col("p") * (lit(1.0) - col("p")) /
            col("n")), 4).as("wald_hi"),
          round((col("p") + z * z / (lit(2) * col("n")) -
            z * sqrt(col("p") * (lit(1.0) - col("p")) / col("n") +
              z * z / (lit(4.0) * col("n") * col("n")))) /
            (lit(1.0) + z * z / col("n")), 4).as("wilson_lo"),
          round((col("p") + z * z / (lit(2) * col("n")) +
            z * sqrt(col("p") * (lit(1.0) - col("p")) / col("n") +
              z * z / (lit(4.0) * col("n") * col("n")))) /
            (lit(1.0) + z * z / col("n")), 4).as("wilson_hi"),
          round((col("x") + z * z / 2) / (col("n") + z * z) -
            z * sqrt(((col("x") + z * z / 2) / (col("n") + z * z)) *
              (lit(1.0) - (col("x") + z * z / 2) / (col("n") + z * z)) /
              (col("n") + z * z)), 4).as("ac_lo"),
          round((col("x") + z * z / 2) / (col("n") + z * z) +
            z * sqrt(((col("x") + z * z / 2) / (col("n") + z * z)) *
              (lit(1.0) - (col("x") + z * z / 2) / (col("n") + z * z)) /
              (col("n") + z * z)), 4).as("ac_hi"))
        .orderBy(col("segment"))
    }),

    "q396_james_stein" -> ((s, dir) => {
      // James-Stein shrinkage of per-brand mean prices toward the
      // grand mean: the estimator that DOMINATES per-group averages
      // whenever there are >= 4 groups — the principled version of
      // "don't trust small-sample brand averages". Shrink factor from
      // the average variance of the means; everything from exact
      // integer cent moments.
      val g = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("ng"),
          sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .as("s1"),
          sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)" +
            " * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .as("s2"))
        .select(col("brand"), col("ng"),
          (col("s1").cast("double") / col("ng")).as("xb"),
          ((col("s2").cast("double") -
            col("s1").cast("double") * col("s1") / col("ng")) /
            (col("ng") - 1) / col("ng")).as("vm"))
      val st = g.agg(count(lit(1)).as("k"),
          (sum(col("xb")) / count(lit(1))).as("gm"),
          avg(col("vm")).as("vbar"))
      val dev = g.crossJoin(broadcast(st))
        .agg(max(col("k")).as("k"), max(col("gm")).as("gm"),
          max(col("vbar")).as("vbar"),
          sum((col("xb") - col("gm")) * (col("xb") - col("gm")))
            .as("ss"))
        .select(col("k"), col("gm"),
          greatest(lit(0.0), lit(1.0) -
            (col("k") - 3).cast("double") * col("vbar") / col("ss"))
            .as("c"))
      g.crossJoin(broadcast(dev))
        .select(col("brand"), col("ng"),
          round(col("xb") / 100.0, 2).as("mean_raw"),
          round((col("gm") + col("c") * (col("xb") - col("gm"))) / 100.0,
            2).as("mean_shrunk"),
          round(col("c"), 6).as("shrink_factor"))
        .orderBy(col("brand"))
    })
  )

  /** One SQL text, two engines — q130 runs it verbatim in Spark and the
    * oracle runs it verbatim in DuckDB (explicit NULLS FIRST because the
    * engines' default null sort order differs).
    */
  private val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
      |  l_linestatus ASC NULLS FIRST""".stripMargin

  /** TPC-H Q17-shape correlated SCALAR subquery (identical text on both
    * engines; Catalyst decorrelates it into an aggregate + join — see
    * PLANS_r3). l_quantity is integral, so each group's avg is exact in
    * double on any engine and the `<` cut can't sit on a float boundary.
    */
  /** q171: identical ANSI text on both engines — the ranking-window
    * gallery (dense_rank / cume_dist over a TIES-heavy order key, both
    * well-defined under ties; nth_value over an explicit full frame with
    * a total order). Completes window coverage next to row_number/rank
    * (q08/q09), RANGE frames (q104), IGNORE NULLS last_value (q96).
    */
  private val windowGallerySql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(dense_rank() OVER wp AS BIGINT) AS priority_rank,
      |  round(cume_dist() OVER wp, 6) AS priority_cume,
      |  nth_value(o_orderkey, 2) OVER wf AS second_order_key
      |FROM orders
      |WHERE o_custkey <= 100
      |WINDOW
      |  wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  private val correlatedScalarSql: String =
    """SELECT p.p_brand,
      |  round(sum(l.l_extendedprice) / 7.0, 2) AS avg_weekly,
      |  count(*) AS n_small
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_quantity < (
      |  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |  WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p.p_brand
      |ORDER BY p.p_brand""".stripMargin

  /** TPC-H Q21-shape EXISTS / NOT EXISTS chain (sole-blame supplier per
    * returned order), reformulated on the columns this fixture carries
    * (returnflag instead of receipt lateness). Identical text on both
    * engines; Catalyst turns the pair into semi/anti joins.
    */
  private val existsChainSql: String =
    """SELECT s.s_name, count(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name
      |LIMIT 20""".stripMargin

  // --- DuckDB oracles ------------------------------------------------------

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Shared doc-normalization SQL fragments (must mirror TextFunctions). */
  private val toksSql  = """list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)"""
  private val ntoksSql = """list_filter(string_split_regex(lower(regexp_replace(text, '[^\p{L}\p{N}\s]', ' ', 'g')), '\s+'), x -> len(x) > 0)"""

  /** CTE chain ending in `pairs(idA, idB, jaccard)` — the n-gram Jaccard
    * near-dup pair graph over docsWithNearDups (must mirror
    * Dedup.ngramJaccardPairs with n=3, threshold 0.3, maxShingleFreq 400).
    * Shared by q25 (the pair list) and q65 (connected components over it).
    */
  private val ngramPairsCtes: String =
    s"""docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, substr(text, 21) FROM documents),
       |norm AS (SELECT doc_id, $ntoksSql AS ntoks FROM docs),
       |grams AS (SELECT doc_id,
       |    list_distinct(CASE WHEN len(ntoks) < 3 THEN []
       |      ELSE list_transform(range(len(ntoks) - 2),
       |             i -> ntoks[i+1] || ' ' || ntoks[i+2] || ' ' || ntoks[i+3]) END) AS gs
       |  FROM norm),
       |posting AS (SELECT doc_id, unnest(gs) AS g FROM grams),
       |rare AS (SELECT g FROM (SELECT g, count(*) AS c FROM posting GROUP BY g)
       |         WHERE c BETWEEN 2 AND 400),
       |rp AS (SELECT p.doc_id, p.g FROM posting p JOIN rare USING (g)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM rp GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
       |          FROM rp a JOIN rp b USING (g) WHERE a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (
       |  SELECT idA, idB, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON idA = sa.doc_id
       |  JOIN sizes sb ON idB = sb.doc_id
       |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.3)""".stripMargin

  /** CTE chain `b -> m -> q` computing the per-doc quality score (must
    * mirror TextFunctions.qualityScore exactly, same op order — the q21
    * oracle proves parity to 6 dp). `q` exposes (doc_id{extraCols}, ntok,
    * quality).
    */
  private def qualityCteSql(extraCols: String,
                            source: String = "documents"): String =
    s"""WITH b AS (
       |  SELECT doc_id$extraCols, text, $toksSql AS toks, $ntoksSql AS ntoks FROM $source),
       |m AS (
       |  SELECT doc_id$extraCols,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / length(text) END AS pr,
       |    CASE WHEN len(ntoks) = 0 THEN 0.0
       |         ELSE len(list_filter(ntoks, x -> list_contains(${sqlList(TF.StopwordsEn)}, x))) * 1.0 / len(ntoks) END AS sw,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END AS mtl,
       |    length(text) AS n, len(toks) AS ntok
       |  FROM b),
       |q AS (
       |  SELECT doc_id$extraCols, ntok,
       |    least(sw * 4.0, 1.0) * 0.4 + greatest(1.0 - pr * 4.0, 0.0) * 0.3
       |    + (CASE WHEN n BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.25 END) * 0.15
       |    + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.25 END) * 0.15 AS quality
       |  FROM m)""".stripMargin

  /** Full BM25 recompute in DuckDB over `documents` for a literal VALUES
    * query set — shared by q94 (ad-hoc) and q116 (served through the
    * persisted index; scoring must be layout-independent).
    */
  /** BM25 CTE chain ending at `ranked(query_id, doc_id, score_micro,
    * rank)` — shared by the bm25 oracles and the hybrid-RRF oracle.
    */
  private def bm25Ctes(queryValues: String): String =
    s"""q(query_id, query_text) AS (VALUES $queryValues),
       |tk AS (SELECT doc_id, term FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
       |    FROM documents) WHERE term <> ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
       |post AS (SELECT term, doc_id, count(*) AS tf FROM tk GROUP BY 1, 2),
       |stats AS (SELECT (SELECT count(DISTINCT doc_id) FROM tk) AS n_docs,
       |                 (SELECT count(*) FROM tk) AS total_toks),
       |qt AS (SELECT DISTINCT query_id, term FROM (
       |    SELECT query_id,
       |      unnest(string_split_regex(lower(query_text), '[^a-z0-9]+')) AS term
       |    FROM q) WHERE term <> ''),
       |dfreq AS (SELECT term, count(*) AS df FROM post
       |          WHERE term IN (SELECT term FROM qt) GROUP BY term),
       |contrib AS (
       |  SELECT qt.query_id, p.doc_id,
       |    CAST(round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |      ((p.tf * (1.2 + 1.0)) / (p.tf + 1.2 * ((1.0 - 0.75) +
       |        (0.75 * dl.dl) / ((s.total_toks * 1.0) / (s.n_docs * 1.0)))))
       |      * 1000000.0, 0) AS BIGINT) AS micro
       |  FROM post p
       |  JOIN qt ON p.term = qt.term
       |  JOIN dfreq d ON p.term = d.term
       |  JOIN dl ON p.doc_id = dl.doc_id
       |  CROSS JOIN stats s),
       |scored AS (SELECT query_id, doc_id, sum(micro) AS score_micro
       |           FROM contrib GROUP BY 1, 2),
       |ranked AS (SELECT query_id, doc_id, score_micro,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micro DESC, doc_id) AS rank FROM scored)""".stripMargin

  private def bm25OracleSql(queryValues: String): String =
    s"""WITH ${bm25Ctes(queryValues)}
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  score_micro / 1000000.0 AS score, rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** One unrolled logistic-GD epoch for the q138/q144 oracles: gradient
    * g`i` under weights w`i-1`, update w`i`. Mirrors
    * LinearModel.logisticGd's epoch exactly (lr 0.5, gradient / n).
    */
  private def lrStepSql(i: Int): String = {
    val prev = s"w${i - 1}_"
    val sig = "1.0/(1.0+exp(-(w.w0*f0+w.w1*f1+w.w2*f2+w.w3*f3)))"
    val grads = (0 to 3)
      .map(j => s"    sum(($sig - y)*f$j)/count(*) AS g$j").mkString(",\n")
    val upds = (0 to 3).map(j => s"w.w$j - 0.5*g.g$j AS w$j").mkString(", ")
    s"g${i}_ AS (SELECT\n$grads\n  FROM feat, $prev w),\n" +
      s"w${i}_ AS (SELECT $upds FROM $prev w, g${i}_ g)"
  }

  /** Shared q138/q144 CTE chain: the classifier feature frame, 3 unrolled
    * GD epochs, and the final per-row scores. Must mirror
    * [[classifierFeatures]] + LinearModel exactly.
    */
  private val lrCtes: String =
    s"""feat AS (SELECT 1.0 AS f0,
       |    CAST(len(text) AS DOUBLE)/100.0 AS f1,
       |    CAST(len(text) - len(replace(text, ' ', '')) AS DOUBLE)
       |      / CAST(len(text) AS DOUBLE) AS f2,
       |    CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
       |      / CAST(len(text) AS DOUBLE) AS f3,
       |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |w0_ AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |${(1 to 3).map(lrStepSql).mkString(",\n")},
       |scored AS (SELECT y,
       |    1.0/(1.0+exp(-(w.w0*f0+w.w1*f1+w.w2*f2+w.w3*f3))) AS p
       |  FROM feat, w3_ w)""".stripMargin

  /** One unrolled PageRank iteration for the q134 oracle: p`cur` from
    * p`prev`. The dangling-mass subquery and the incoming-contribution
    * aggregate mirror Graph.pageRank's round exactly.
    */
  private def prIterSql(cur: Int, prev: Int): String =
    s"""p$cur AS (
       |  SELECT n.node,
       |    (1 - 0.85) / nn.n + 0.85 * (COALESCE(inc.s, 0) + dang.m / nn.n) AS pr
       |  FROM nodes n
       |  CROSS JOIN nn
       |  CROSS JOIN (SELECT COALESCE(sum(p.pr), 0) AS m FROM p$prev p
       |              LEFT JOIN outw o ON p.node = o.src WHERE o.src IS NULL) dang
       |  LEFT JOIN (SELECT c.dst AS node, sum(c.frac * p.pr) AS s
       |             FROM contrib c JOIN p$prev p ON c.src = p.node
       |             GROUP BY c.dst) inc ON inc.node = n.node)""".stripMargin

  /** The q138/q144 classifier's feature frame: engine-portable per-doc
    * numerics (bias, scaled length, space ratio, digit ratio) + the
    * lang=='en' label. Shared so the calibration query bins EXACTLY the
    * model the training query learned.
    */
  private def classifierFeatures(s: SparkSession, dir: String)
      : (DataFrame, Seq[String]) = {
    val len = length(col("text")).cast("double")
    val feat = t(s, dir, "documents").select(
      lit(1.0).as("f_bias"),
      (len / 100.0).as("f_len"),
      ((len - length(regexp_replace(col("text"), " ", "")).cast("double")) / len)
        .as("f_space"),
      ((len - length(regexp_replace(col("text"), "[0-9]", "")).cast("double")) / len)
        .as("f_digit"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    (feat, Seq("f_bias", "f_len", "f_space", "f_digit"))
  }

  /** One unrolled greedy max-cover round for the q139 oracle: gains over
    * tokens not yet in c`i-1`, argmax w`i` (ties -> smaller id), covered
    * set c`i`. Mirrors Selection.greedyMaxCover's round exactly.
    */
  private def coverRoundSql(i: Int): String =
    if (i == 1)
      """r1 AS (SELECT id, count(*) AS gain FROM terms GROUP BY id),
        |w1 AS (SELECT id, gain FROM r1 ORDER BY gain DESC, id LIMIT 1),
        |c1 AS (SELECT DISTINCT t.item FROM terms t JOIN w1 ON t.id = w1.id)"""
        .stripMargin
    else
      s"""r$i AS (SELECT t.id, count(*) AS gain FROM terms t
         |  LEFT JOIN c${i - 1} c ON t.item = c.item
         |  WHERE c.item IS NULL GROUP BY t.id),
         |w$i AS (SELECT id, gain FROM r$i ORDER BY gain DESC, id LIMIT 1),
         |c$i AS (SELECT item FROM c${i - 1} UNION
         |        SELECT t.item FROM terms t JOIN w$i ON t.id = w$i.id)"""
        .stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_sum" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_topk_join" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_join5_agg" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q07_broadcast_agg" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q08_window_topk" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, "rank"
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS "rank"
        |      FROM orders) r
        |WHERE "rank" <= 3 ORDER BY o_custkey, "rank"""".stripMargin,

    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q10_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q11_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY coalesce(r_name, 'ALL'), coalesce(n_name, 'ALL')""".stripMargin,

    "q12_setops" ->
      """SELECT nk FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |  UNION
        |  SELECT DISTINCT s_nationkey AS nk FROM supplier
        |  EXCEPT
        |  SELECT n_nationkey AS nk FROM nation WHERE n_regionkey = 0
        |) ORDER BY nk""".stripMargin,

    "q13_sort_limit" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q14_remove_where" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE (p_size > 30 OR p_brand LIKE 'Brand#4%') IS NOT TRUE
        |ORDER BY p_partkey""".stripMargin,

    "q15_coerce" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(l_orderkey AS VARCHAR) AS l_orderkey_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q16_identity_select" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey""",

    "q17_countby" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS "count"
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q18_wordcount" ->
      """SELECT token, count(*) AS "count"
        |FROM (SELECT unnest(string_split_regex(text, '[ \[\]\(\),.]')) AS token
        |      FROM documents) u
        |GROUP BY token ORDER BY token""".stripMargin,

    "q19_dedup_exact" ->
      s"""WITH n AS (SELECT doc_id,
         |  array_to_string($ntoksSql, ' ') AS norm FROM documents)
         |SELECT min(doc_id) AS keep_id, count(*) AS n_dups
         |FROM n GROUP BY norm ORDER BY keep_id""".stripMargin,

    "q20_token_stats" ->
      s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens, n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_text_quality" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, $toksSql AS toks, $ntoksSql AS ntoks FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / length(text) END AS pr,
         |    CASE WHEN len(ntoks) = 0 THEN 0.0
         |         ELSE len(list_filter(ntoks, x -> list_contains(${sqlList(TF.StopwordsEn)}, x))) * 1.0 / len(ntoks) END AS sw,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END AS mtl,
         |    length(text) AS n
         |  FROM b)
         |SELECT doc_id,
         |  round(pr, 6) AS punct_ratio,
         |  round(sw, 6) AS stopword_ratio,
         |  round(mtl, 6) AS mean_token_len,
         |  round(least(sw * 4.0, 1.0) * 0.4 + greatest(1.0 - pr * 4.0, 0.0) * 0.3
         |    + (CASE WHEN n BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.25 END) * 0.15
         |    + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.25 END) * 0.15, 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    "q22_lang_id" -> {
      val scores = TF.LangMarkers.map { case (lang, markers) =>
        s"len(list_filter(ntoks, x -> list_contains(${sqlList(markers)}, x))) AS s_$lang"
      }.mkString(",\n    ")
      val langs = TF.LangMarkers.map(_._1)
      val m     = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
      s"""WITH b AS (SELECT doc_id, $ntoksSql AS ntoks FROM documents),
         |sc AS (SELECT doc_id,
         |    ${scores}
         |  FROM b),
         |mm AS (SELECT doc_id, $m AS m, * FROM sc)
         |SELECT doc_id,
         |  CASE WHEN m = 0 THEN 'und' $cases END AS lang_pred
         |FROM mm ORDER BY doc_id""".stripMargin
    },

    // q23/q24: the Spark query emits deterministic self-check metrics (the
    // LSH/blocked pair set diffed against the in-Spark exact scan); the
    // oracle pins their required values. DuckDB cannot recompute the hash
    // pipeline itself — the containment check inside the query is the proof.
    "q23_minhash_pairs" ->
      """SELECT 'lsh_minus_exact_pairs' AS metric, CAST(0 AS BIGINT) AS value
        |UNION ALL SELECT 'pairs_nonempty', CAST(1 AS BIGINT)
        |UNION ALL SELECT 'recall_pct_ge_90', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q24_simhash_pairs" ->
      """SELECT 'blocked_minus_exact_pairs' AS metric, CAST(0 AS BIGINT) AS value
        |UNION ALL SELECT 'dropped_bucket_rows', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'exact_minus_blocked_pairs', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'pairs_nonempty', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q25_ngram_jaccard" ->
      s"""WITH $ngramPairsCtes
         |SELECT idA, idB, jaccard FROM pairs ORDER BY idA, idB""".stripMargin,

    "q65_dup_clusters" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT idA AS id FROM pairs UNION ALL SELECT idB FROM pairs)),
         |edges AS (SELECT idA AS a, idB AS b FROM pairs
         |          UNION SELECT idB, idA FROM pairs),
         |reach(src, dst) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
         |SELECT src AS doc_id, min(dst) AS component
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    "q122_leakage_safe_split" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT idA AS id FROM pairs UNION ALL SELECT idB FROM pairs)),
         |edges AS (SELECT idA AS a, idB AS b FROM pairs
         |          UNION SELECT idB, idA FROM pairs),
         |reach(src, dst) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS component
         |         FROM reach GROUP BY src),
         |lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster
         |        FROM docs d LEFT JOIN comp c USING (doc_id)),
         |s AS (SELECT doc_id, cluster,
         |  CASE WHEN (${graft.ops.Sampling.keyHashSql("cluster")}) % 100 < 80 THEN 0
         |       WHEN (${graft.ops.Sampling.keyHashSql("cluster")}) % 100 < 90 THEN 1
         |       ELSE 2 END AS split,
         |  CASE WHEN (${graft.ops.Sampling.keyHashSql("doc_id")}) % 100 < 80 THEN 0
         |       WHEN (${graft.ops.Sampling.keyHashSql("doc_id")}) % 100 < 90 THEN 1
         |       ELSE 2 END AS naive_split
         |  FROM lab)
         |SELECT split, count(*) AS n_docs,
         |  count(DISTINCT cluster) AS n_clusters,
         |  CAST(sum(CASE WHEN naive_split <> split THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_moved_vs_naive
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q92_training_order" ->
      s"""SELECT doc_id,
         |  row_number() OVER (
         |    ORDER BY ${graft.ops.Sampling.keyHashSql("xor(doc_id, 7)")},
         |      doc_id) AS pos
         |FROM documents ORDER BY pos""".stripMargin,

    "q93_markup_strip" ->
      s"""WITH h AS (SELECT doc_id,
         |  '<html><head><title>' || source ||
         |  '</title><style>p{margin:0}</style></head><body><!-- nav -->' ||
         |  '<h1>Doc &#39;' || CAST(doc_id AS VARCHAR) ||
         |  '&#39;</h1>' || chr(10) || '<p>' || substr(text, 1, 200) ||
         |  '</p>' || chr(10) ||
         |  '<script type="text/javascript">var x=1;</script>' ||
         |  '<p>Q&amp;A&nbsp;&lt;here&gt;</p></body></html>' AS html
         |  FROM documents)
         |SELECT doc_id, ${TF.stripMarkupSql("html")} AS clean
         |FROM h ORDER BY doc_id""".stripMargin,

    "q94_bm25_search" -> bm25OracleSql(
      "(1, 'spark window agg'), (2, 'vector scan batch'), (3, 'customer stream query')"),

    "q116_bm25_index" -> bm25OracleSql(
      "(1, 'merge batch row'), (2, 'filter group vector'), (3, 'slow table scan')"),

    "q95_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |ch AS (SELECT * FROM e WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS valid_from,
        |  CAST(floor(extract(epoch FROM lead(ts) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS valid_to,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
        |    AS is_current
        |FROM ch ORDER BY user_id, version""".stripMargin,

    "q96_gap_fill" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    round(avg(value), 4) AS v, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |         FROM b GROUP BY user_id),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        |  FROM span),
        |j AS (SELECT g.user_id, g.bucket, b.v, coalesce(b.n, 0) AS n,
        |        coalesce(b.n, 0) = 0 AS is_gap
        |      FROM grid g LEFT JOIN b
        |        ON g.user_id = b.user_id AND g.bucket = b.bucket)
        |SELECT user_id, CAST(extract(epoch FROM bucket) AS BIGINT) AS hour_ts,
        |  v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |  n, is_gap
        |FROM j ORDER BY user_id, hour_ts""".stripMargin,

    "q97_url_canonical" ->
      s"""WITH u AS (
         |  SELECT source, 'HTTPS://WWW.' || upper(source) ||
         |    '.Example.COM:443/docs/' || CAST(doc_id AS VARCHAR) ||
         |    '/?utm_source=feed&b=2&a=1#frag' AS url
         |  FROM documents
         |  UNION ALL
         |  SELECT source, 'https://' || source || '.example.com/docs/' ||
         |    CAST(doc_id AS VARCHAR) || '?a=1&b=2&utm_campaign=x' AS url
         |  FROM documents),
         |c AS (SELECT source, ${UF.canonicalizeUrlSql("url")} AS canon FROM u)
         |SELECT source, count(*) AS n_urls,
         |  count(DISTINCT canon) AS n_canonical, min(canon) AS sample_canon
         |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q98_zorder_value" ->
      s"""SELECT o_orderkey,
         |  ${ZOrder.zValueSql("(o_custkey % 4096)",
            "(CAST(floor(o_totalprice / 100) AS BIGINT) % 4096)", 12)} AS zval
         |FROM orders ORDER BY zval, o_orderkey""".stripMargin,

    "q100_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage_name,
        |  count(*) AS n_users, CAST(NULL AS DOUBLE) AS avg_secs_from_prev
        |FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*),
        |  round(avg(epoch(s2.t) - epoch(s1.t)), 2)
        |FROM s2 JOIN s1 USING (user_id)
        |UNION ALL
        |SELECT 3, 'purchase', count(*),
        |  round(avg(epoch(s3.t) - epoch(s2.t)), 2)
        |FROM s3 JOIN s2 USING (user_id)
        |ORDER BY stage_idx""".stripMargin,

    "q101_retention" ->
      """WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        |           FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
        |SELECT CAST(floor(extract(epoch FROM cohort_week)) AS BIGINT) AS cohort_week,
        |  CAST((extract(epoch FROM week) - extract(epoch FROM cohort_week))
        |    / 604800 AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q102_oov_rate" ->
      """WITH tk AS (SELECT doc_id, term FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        |    FROM documents) WHERE term <> ''),
        |v AS (SELECT term FROM (
        |    SELECT term, row_number() OVER (ORDER BY count(*) DESC, term) AS rn
        |    FROM tk GROUP BY term) WHERE rn <= 20)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(CASE WHEN v.term IS NULL THEN 1.0 ELSE 0.0 END), 6)
        |    AS oov_rate
        |FROM tk LEFT JOIN v ON tk.term = v.term
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q103_histogram" ->
      """WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |           FROM orders),
        |b AS (SELECT least(19, CAST(floor((o_totalprice - s.lo) /
        |    (CASE WHEN s.hi = s.lo THEN 1.0 ELSE s.hi - s.lo END) * 20)
        |    AS BIGINT)) AS bucket
        |  FROM orders, s),
        |cnt AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
        |g AS (SELECT range AS bucket FROM range(20))
        |SELECT g.bucket,
        |  round(s.lo + g.bucket * (s.hi - s.lo) / 20, 4) AS lo,
        |  round(s.lo + (g.bucket + 1) * (s.hi - s.lo) / 20, 4) AS hi,
        |  coalesce(cnt.n, 0) AS n
        |FROM g LEFT JOIN cnt USING (bucket) CROSS JOIN s
        |ORDER BY g.bucket""".stripMargin,

    "q104_rolling_window" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(floor(extract(epoch FROM o_orderdate)) AS BIGINT) AS order_ts,
        |  round(o_totalprice, 2) AS price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(floor(extract(epoch FROM o_orderdate)) AS BIGINT)
        |    RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW), 2) AS rolling_7d
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q105_schema_evolution" ->
      """SELECT CAST(1 AS BIGINT) AS gen, n_nationkey, n_name,
        |  CAST(NULL AS BIGINT) AS n_regionkey
        |FROM nation
        |UNION ALL
        |SELECT 2, n_nationkey, n_name, CAST(n_regionkey AS BIGINT)
        |FROM nation
        |ORDER BY gen, n_nationkey""".stripMargin,

    "q106_forget_delete" ->
      """SELECT event_type, count(*) AS n_kept,
        |  count(DISTINCT user_id) AS n_users
        |FROM events WHERE user_id % 7 <> 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q107_countmin" ->
      """WITH tk AS (SELECT term FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        |    FROM documents) WHERE term <> '')
        |SELECT least(100, count(DISTINCT term)) AS n_checked,
        |  CAST(0 AS BIGINT) AS n_underestimates,
        |  CAST(0 AS BIGINT) AS n_over_bound
        |FROM tk""".stripMargin,

    "q108_quantile_bins" ->
      s"""${qualityCteSql(", lang")}
         |SELECT doc_id, lang,
         |  CAST(ntile(10) OVER (PARTITION BY lang
         |    ORDER BY quality, doc_id) AS BIGINT) AS bin
         |FROM q ORDER BY doc_id""".stripMargin,

    "q109_tokenize_ids" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS ts
        |  FROM documents),
        |tk AS (SELECT doc_id, unnest(ts) AS term,
        |         unnest(range(len(ts))) AS pos
        |       FROM toks),
        |v AS (SELECT term,
        |    row_number() OVER (ORDER BY count(*) DESC, term) AS id
        |  FROM tk GROUP BY term)
        |SELECT doc_id,
        |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos) AS ids,
        |  count(*) AS n_tokens
        |FROM tk JOIN v USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q110_funnel_windowed" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t
        |    AND epoch(e.ts) <= epoch(s1.t) + 259200 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |    AND epoch(e.ts) <= epoch(s2.t) + 259200 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage_name,
        |  count(*) AS n_users, CAST(NULL AS DOUBLE) AS avg_secs_from_prev
        |FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*),
        |  round(avg(epoch(s2.t) - epoch(s1.t)), 2)
        |FROM s2 JOIN s1 USING (user_id)
        |UNION ALL
        |SELECT 3, 'purchase', count(*),
        |  round(avg(epoch(s3.t) - epoch(s2.t)), 2)
        |FROM s3 JOIN s2 USING (user_id)
        |ORDER BY stage_idx""".stripMargin,

    "q111_agg_merge" ->
      """SELECT
        |  CAST(floor(extract(epoch FROM date_trunc('month', o_orderdate)))
        |    AS BIGINT) AS month_ts,
        |  o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 10000 AS BIGINT)
        |    * 1.0 / count(*)) / 10000.0 AS avg_price
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q112_shard_plan" ->
      s"""WITH n AS (SELECT doc_id, len($ntoksSql) AS ntok FROM documents),
         |r AS (SELECT doc_id, ntok,
         |    sum(ntok) OVER (ORDER BY ${Sampling.keyHashSql("xor(doc_id, 13)")},
         |      doc_id) AS cum,
         |    row_number() OVER (ORDER BY ${Sampling.keyHashSql("xor(doc_id, 13)")},
         |      doc_id) AS pos
         |  FROM n)
         |SELECT CAST(floor((cum - ntok) / 5000.0) AS BIGINT) AS shard_id,
         |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  min(pos) AS first_pos, max(pos) AS last_pos
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q113_corpus_report" ->
      s"""${qualityCteSql(", lang, source")},
         |d AS (SELECT source, count(*) - count(DISTINCT text) AS n_dup_docs
         |      FROM documents GROUP BY source)
         |SELECT q.source, count(*) AS n_docs,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  round(avg(quality), 6) AS avg_quality,
         |  count(DISTINCT lang) AS n_langs,
         |  min(d.n_dup_docs) AS n_dup_docs
         |FROM q JOIN d ON q.source = d.source
         |GROUP BY q.source ORDER BY q.source""".stripMargin,

    "q114_pipeline_e2e" ->
      s"""${qualityCteSql(", lang")},
         |cut AS (
         |  SELECT x.doc_id, ntok FROM (
         |    SELECT doc_id, ntok,
         |      percent_rank() OVER (PARTITION BY lang
         |        ORDER BY quality, doc_id) AS pr
         |    FROM q) x WHERE pr >= 0.8),
         |ded AS (
         |  SELECT c.doc_id, c.ntok FROM cut c JOIN (
         |    SELECT min(d.doc_id) AS doc_id
         |    FROM cut JOIN documents d USING (doc_id)
         |    GROUP BY d.text) k ON c.doc_id = k.doc_id),
         |r AS (SELECT doc_id, ntok,
         |    sum(ntok) OVER (ORDER BY ${Sampling.keyHashSql("xor(doc_id, 29)")},
         |      doc_id) AS cum
         |  FROM ded)
         |SELECT CAST(floor((cum - ntok) / 5000.0) AS BIGINT) AS shard_id,
         |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q115_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
        |    unnest(regexp_extract_all(text, '[\s\S]')) AS c
        |  FROM documents),
        |f AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |nn AS (SELECT doc_id, sum(cnt) AS n FROM f GROUP BY doc_id),
        |e AS (SELECT f.doc_id,
        |    -sum((cnt * 1.0 / n) * ln(cnt * 1.0 / n)) AS ent
        |  FROM f JOIN nn USING (doc_id) GROUP BY f.doc_id)
        |SELECT d.doc_id, round(coalesce(e.ent, 0.0), 6) AS entropy,
        |  round(coalesce(e.ent, 0.0), 6) < 3.0 AS low_entropy
        |FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q117_image_neardup" ->
      """SELECT CAST(2 * least(40, (SELECT count(*) FROM documents)) AS BIGINT)
        |    AS n_payloads,
        |  true AS blocked_eq_exact,
        |  true AS planted_all_found""".stripMargin,

    "q118_table_diff" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |nxt AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.5
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        |  FROM base WHERE o_orderkey % 101 = 0),
        |j AS (SELECT
        |    CASE WHEN b.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN b.o_custkey IS DISTINCT FROM n.o_custkey
        |           OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
        |           THEN 'changed'
        |         ELSE 'unchanged' END AS change_type
        |  FROM base b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey)
        |SELECT change_type, count(*) AS n FROM j
        |GROUP BY change_type ORDER BY change_type""".stripMargin,

    "q119_table_diff_pruned" ->
      """WITH base AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS k,
        |    round(sum(l_quantity), 2) AS qty
        |  FROM lineitem GROUP BY 1),
        |nxt AS (
        |  SELECT k, CASE WHEN k % 89 = 0 THEN qty + 5.0
        |                 ELSE qty END AS qty
        |  FROM base WHERE k % 211 <> 0),
        |j AS (SELECT
        |    CASE WHEN b.k IS NULL THEN 'added'
        |         WHEN n.k IS NULL THEN 'removed'
        |         WHEN b.qty IS DISTINCT FROM n.qty THEN 'changed'
        |         ELSE 'unchanged' END AS change_type
        |  FROM base b FULL OUTER JOIN nxt n ON b.k = n.k)
        |SELECT change_type, count(*) AS n FROM j
        |GROUP BY change_type HAVING count(*) > 0
        |ORDER BY change_type""".stripMargin,

    "q123_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_custkey + CASE WHEN o_orderkey % 1000 = 7
        |      THEN 1000000 ELSE 0 END AS c_custkey,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |         WHEN o_orderkey % 10 < 5 THEN 'U' ELSE 'I' END AS op,
        |    'upd_' || CAST(o_orderkey AS VARCHAR) AS c_name,
        |    round(o_totalprice, 2) AS c_acctbal
        |  FROM orders),
        |latest AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY seq DESC) AS rn FROM log) WHERE rn = 1),
        |base AS (SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
        |         FROM customer)
        |SELECT coalesce(b.c_custkey, l.c_custkey) AS c_custkey,
        |  CASE WHEN l.op IS NOT NULL THEN l.c_name ELSE b.c_name END AS c_name,
        |  CASE WHEN l.op IS NOT NULL THEN l.c_acctbal ELSE b.c_acctbal END
        |    AS c_acctbal
        |FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
        |WHERE l.op IS DISTINCT FROM 'D'
        |ORDER BY c_custkey""".stripMargin,

    "q124_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n_rows
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING count(*) >= 10
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q126_bpe_train" ->
      s"""WITH w AS (SELECT unnest($toksSql) AS word FROM documents)
         |SELECT 'distinct_words' AS metric,
         |  (SELECT CAST(count(DISTINCT word) AS BIGINT) FROM w) AS value
         |UNION ALL SELECT 'merge_freqs_nonincreasing', CAST(1 AS BIGINT)
         |UNION ALL SELECT 'merges_learned', CAST(12 AS BIGINT)
         |UNION ALL SELECT 'merges_match_reference', CAST(12 AS BIGINT)
         |UNION ALL SELECT 'total_word_occurrences',
         |  (SELECT CAST(count(*) AS BIGINT) FROM w)
         |ORDER BY metric""".stripMargin,

    "q127_bpe_encode" ->
      """SELECT 'docs_encoded' AS metric,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS value
        |UNION ALL SELECT 'docs_match_reference',
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents)
        |UNION ALL SELECT 'tokens_bounded_by_chars_plus_words',
        |  CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q128_hybrid_rrf" ->
      s"""WITH ${bm25Ctes(
             "(1, 'spark window agg'), (2, 'vector scan batch'), (3, 'customer stream query')")},
         |bm AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank
         |       FROM ranked WHERE rank <= 10),
         |e AS (SELECT vec_id,
         |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |      FROM embeddings),
         |cs AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |        CASE WHEN sqrt(list_dot_product(q.v, q.v)) *
         |                  sqrt(list_dot_product(c.v, c.v)) = 0 THEN 0.0
         |             ELSE list_dot_product(q.v, c.v) /
         |               (sqrt(list_dot_product(q.v, q.v)) *
         |                sqrt(list_dot_product(c.v, c.v))) END AS cosine
         |       FROM e q JOIN e c
         |         ON q.vec_id IN (1, 2, 3) AND q.vec_id <> c.vec_id),
         |cr AS (SELECT query_id, doc_id,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, doc_id) AS rank FROM cs),
         |sem AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank
         |        FROM cr WHERE rank <= 10),
         |u AS (SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM bm
         |      UNION ALL
         |      SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM sem),
         |g AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
         |        count(*) AS n_systems FROM u GROUP BY 1, 2),
         |f AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rrf_micro DESC, doc_id) AS rank FROM g)
         |SELECT query_id, doc_id, rrf_micro, n_systems, rank
         |FROM f WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q131_pq_ann" ->
      """SELECT 'codes_per_vector' AS metric, CAST(8 AS BIGINT) AS value
        |UNION ALL SELECT 'n_queries',
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id < 20)
        |UNION ALL SELECT 'n_vectors',
        |  (SELECT CAST(count(*) + 20 AS BIGINT) FROM embeddings)
        |UNION ALL SELECT 'top1_planted_recall_pct_ge_90', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q132_ivfpq_ann" ->
      """SELECT 'n_cells' AS metric, CAST(32 AS BIGINT) AS value
        |UNION ALL SELECT 'n_queries',
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id < 20)
        |UNION ALL SELECT 'probe_fraction_pct', CAST(25 AS BIGINT)
        |UNION ALL SELECT 'top1_planted_recall_pct_ge_90', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q133_negative_sample" ->
      s"""WITH c AS (SELECT doc_id,
         |    (${graft.ops.Sampling.keyHashSql("doc_id")}) % 8 AS b,
         |    (${graft.ops.Sampling.keyHashSql("doc_id")}) AS h
         |  FROM documents),
         |q AS (SELECT doc_id AS query_id,
         |    (${graft.ops.Sampling.keyHashSql("doc_id")}) % 8 AS b
         |  FROM documents WHERE doc_id < 10),
         |j AS (SELECT q.query_id, c.doc_id AS neg_id, c.h
         |      FROM q JOIN c USING (b) WHERE c.doc_id <> q.query_id),
         |r AS (SELECT query_id, neg_id,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY h, neg_id) AS rank FROM j)
         |SELECT query_id, neg_id, rank FROM r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q134_pagerank" ->
      s"""WITH ev AS (SELECT user_id, event_id, ts,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS item FROM events),
         |sq AS (SELECT item,
         |    lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
         |  FROM ev),
         |edges AS (SELECT src, item AS dst, CAST(count(*) AS DOUBLE) AS w
         |  FROM sq WHERE src IS NOT NULL AND src <> item GROUP BY src, item),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
         |contrib AS (SELECT e.src, e.dst, e.w / o.ow AS frac
         |  FROM edges e JOIN outw o USING (src)),
         |p0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn),
         |${(1 to 5).map(i => prIterSql(i, i - 1)).mkString(",\n")},
         |deg AS (SELECT n.node, COALESCE(i.d, 0) AS in_deg,
         |    COALESCE(o.d, 0) AS out_deg
         |  FROM nodes n
         |  LEFT JOIN (SELECT dst AS node, count(*) AS d FROM edges
         |             GROUP BY dst) i ON i.node = n.node
         |  LEFT JOIN (SELECT src AS node, count(*) AS d FROM edges
         |             GROUP BY src) o ON o.node = n.node)
         |SELECT p5.node, round(p5.pr * 1000, 6) AS pr_permille,
         |  CAST(deg.in_deg AS BIGINT) AS in_deg,
         |  CAST(deg.out_deg AS BIGINT) AS out_deg
         |FROM p5 JOIN deg USING (node) ORDER BY p5.node""".stripMargin,

    "q135_mad_outliers" ->
      """WITH med AS (SELECT event_type, median(value) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, median(ad) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN d.ad > 3 * 1.4826 * m.mad
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(min(d.med), 6) AS med, round(min(m.mad), 6) AS mad,
        |  round(max(d.ad), 6) AS max_abs_dev
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q136_dim_stats" ->
      """WITH u AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings)
        |SELECT CAST(pos AS BIGINT) AS dim, count(*) AS n,
        |  round(avg(x), 6) AS mean_x, round(stddev_pop(x), 6) AS std_x,
        |  round(min(x), 6) AS min_x, round(max(x), 6) AS max_x
        |FROM u GROUP BY pos ORDER BY dim""".stripMargin,

    "q137_drift_psi" ->
      """WITH src AS (SELECT event_type, value, event_id % 2 AS side
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type,
        |    CAST(greatest(least(floor(
        |      CASE WHEN side = 1 THEN value * 1.25 ELSE value END / 25.0),
        |      9), 0) AS INT) AS bin, side
        |  FROM src),
        |c AS (SELECT event_type, bin,
        |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cr,
        |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cc
        |  FROM b GROUP BY event_type, bin),
        |t AS (SELECT event_type, bin, cr, cc,
        |    sum(cr) OVER (PARTITION BY event_type) AS nr,
        |    sum(cc) OVER (PARTITION BY event_type) AS nc
        |  FROM c),
        |p AS (SELECT event_type, nr, nc,
        |    ((cr + 0.5)/(nr + 5.0) - (cc + 0.5)/(nc + 5.0)) *
        |      ln(((cr + 0.5)/(nr + 5.0)) / ((cc + 0.5)/(nc + 5.0))) AS term
        |  FROM t)
        |SELECT event_type, CAST(min(nr) AS BIGINT) AS n_ref,
        |  CAST(min(nc) AS BIGINT) AS n_cur, round(sum(term), 6) AS psi
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q138_quality_classifier" ->
      s"""WITH $lrCtes,
        |ev AS (SELECT avg(-(y*ln(p) + (1.0-y)*ln(1.0-p))) AS log_loss,
        |    avg(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) AS acc
        |  FROM scored)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS coef_id, 'f_bias' AS feature,
        |    round(w0, 6) AS weight FROM w3_
        |  UNION ALL SELECT 1, 'f_len', round(w1, 6) FROM w3_
        |  UNION ALL SELECT 2, 'f_space', round(w2, 6) FROM w3_
        |  UNION ALL SELECT 3, 'f_digit', round(w3, 6) FROM w3_
        |  UNION ALL SELECT 4, '__log_loss', round(log_loss, 6) FROM ev
        |  UNION ALL SELECT 5, '__accuracy', round(acc, 6) FROM ev
        |) ORDER BY coef_id""".stripMargin,

    "q139_coverage_select" ->
      s"""WITH terms AS (SELECT DISTINCT id, item FROM (
         |    SELECT id, unnest(CASE WHEN len(ntoks) < 3 THEN []
         |      ELSE list_transform(range(len(ntoks) - 2),
         |        i -> ntoks[i+1] || ' ' || ntoks[i+2] || ' ' || ntoks[i+3])
         |      END) AS item
         |    FROM (SELECT doc_id AS id, $ntoksSql AS ntoks FROM documents))),
         |${(1 to 5).map(coverRoundSql).mkString(",\n")}
         |SELECT round, id AS doc_id, gain,
         |  CAST(sum(gain) OVER (ORDER BY round) AS BIGINT) AS covered_total
         |FROM (
         |  SELECT CAST(1 AS BIGINT) AS round, id, gain FROM w1
         |  UNION ALL SELECT 2, id, gain FROM w2
         |  UNION ALL SELECT 3, id, gain FROM w3
         |  UNION ALL SELECT 4, id, gain FROM w4
         |  UNION ALL SELECT 5, id, gain FROM w5
         |) ORDER BY round""".stripMargin,

    "q140_exact_stratified" ->
      s"""WITH counts AS (SELECT lang, count(*) AS cnt
         |  FROM documents GROUP BY lang),
         |q AS (SELECT lang, cnt, sum(cnt) OVER () AS total,
         |    (100 * cnt) // sum(cnt) OVER () AS base,
         |    100 * cnt - ((100 * cnt) // sum(cnt) OVER ()) * sum(cnt) OVER ()
         |      AS rem
         |  FROM counts),
         |q2 AS (SELECT lang, base,
         |    row_number() OVER (ORDER BY rem DESC, lang) AS rrank,
         |    100 - sum(base) OVER () AS leftover
         |  FROM q),
         |quotas AS (SELECT lang,
         |    base + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END AS quota
         |  FROM q2),
         |ranked AS (SELECT d.lang, d.doc_id,
         |    row_number() OVER (PARTITION BY d.lang
         |      ORDER BY ${graft.ops.Sampling.keyHashSql("d.doc_id")}, d.doc_id)
         |      AS rk
         |  FROM documents d)
         |SELECT r.lang, r.doc_id FROM ranked r JOIN quotas USING (lang)
         |WHERE r.rk <= quota ORDER BY r.lang, r.doc_id""".stripMargin,

    "q141_join_size" ->
      s"""WITH ca AS (SELECT o_orderkey AS key, count(*) AS ca
         |  FROM orders GROUP BY 1),
         |cb AS (SELECT l_orderkey AS key, count(*) AS cb
         |  FROM lineitem GROUP BY 1),
         |j AS (SELECT key, ca.ca * cb.cb AS p FROM ca JOIN cb USING (key))
         |SELECT count(*) AS n_common_keys,
         |  CAST(sum(p) AS BIGINT) AS join_rows,
         |  CAST(sum(CASE WHEN (${graft.ops.Sampling.keyHashSql("key")}) % 8 = 0
         |           THEN p ELSE 0 END) * 8 AS BIGINT) AS est_join_rows,
         |  CAST(max(p) AS BIGINT) AS max_per_key,
         |  round(avg(p), 6) AS avg_per_key
         |FROM j""".stripMargin,

    "q142_label_prop" ->
      s"""WITH $ngramPairsCtes,
         |edges AS (SELECT idA AS a, idB AS b FROM pairs
         |          UNION SELECT idB, idA FROM pairs),
         |seeds AS (SELECT doc_id AS id, lang AS label FROM documents),
         |v1 AS (SELECT e.b AS id, s.label, count(*) AS c
         |       FROM edges e JOIN seeds s ON e.a = s.id
         |       WHERE e.b NOT IN (SELECT id FROM seeds)
         |       GROUP BY e.b, s.label),
         |w1 AS (SELECT id, label FROM (
         |       SELECT id, label, row_number() OVER (PARTITION BY id
         |         ORDER BY c DESC, label) AS rn FROM v1) WHERE rn = 1),
         |lab1 AS (SELECT id, label FROM seeds
         |         UNION ALL SELECT id, label FROM w1),
         |v2 AS (SELECT e.b AS id, l.label, count(*) AS c
         |       FROM edges e JOIN lab1 l ON e.a = l.id
         |       WHERE e.b NOT IN (SELECT id FROM lab1)
         |       GROUP BY e.b, l.label),
         |w2 AS (SELECT id, label FROM (
         |       SELECT id, label, row_number() OVER (PARTITION BY id
         |         ORDER BY c DESC, label) AS rn FROM v2) WHERE rn = 1)
         |SELECT doc_id, label, round FROM (
         |  SELECT id AS doc_id, label, CAST(1 AS BIGINT) AS round FROM w1
         |  UNION ALL SELECT id, label, 2 FROM w2)
         |ORDER BY doc_id""".stripMargin,

    "q143_pmi_bigrams" ->
      s"""WITH norm AS (SELECT $ntoksSql AS ntoks FROM documents),
         |uni AS (SELECT w, count(*) AS c_w FROM (
         |    SELECT unnest(ntoks) AS w FROM norm) GROUP BY w),
         |big AS (SELECT w1, w2, count(*) AS c_bigram FROM (
         |    SELECT ntoks[i+1] AS w1, ntoks[i+2] AS w2
         |    FROM norm, unnest(range(len(ntoks) - 1)) AS u(i)) GROUP BY w1, w2),
         |tot AS (SELECT (SELECT sum(c_w) FROM uni) AS n_tokens,
         |               (SELECT sum(c_bigram) FROM big) AS n_bigrams),
         |sc AS (SELECT b.w1, b.w2, b.c_bigram,
         |    round(ln((b.c_bigram * 1.0 / t.n_bigrams) /
         |      ((u1.c_w * 1.0 / t.n_tokens) * (u2.c_w * 1.0 / t.n_tokens))), 6)
         |      AS pmi
         |  FROM big b CROSS JOIN tot t
         |  JOIN uni u1 ON b.w1 = u1.w
         |  JOIN uni u2 ON b.w2 = u2.w
         |  WHERE b.c_bigram >= 5),
         |r AS (SELECT w1, w2, c_bigram, pmi,
         |    row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM sc)
         |SELECT w1, w2, c_bigram, pmi, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q144_calibration" ->
      s"""WITH $lrCtes
         |SELECT CAST(greatest(least(floor(p * 10), 9), 0) AS BIGINT) AS bin,
         |  count(*) AS n, round(avg(p), 6) AS avg_p,
         |  round(avg(y), 6) AS frac_pos
         |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin,

    "q145_weighted_wor" ->
      s"""${qualityCteSql(", lang")}
         |SELECT doc_id, lang, round(quality, 6) AS quality, rank FROM (
         |  SELECT doc_id, lang, quality,
         |    CAST(row_number() OVER (ORDER BY
         |      round(ln(((${graft.ops.Sampling.keyHashSql("doc_id")}) + 0.5)
         |          / 4294967296.0) / (quality + 0.1), 6) DESC,
         |      doc_id) AS BIGINT) AS rank
         |  FROM q) r
         |WHERE rank <= 30 ORDER BY rank""".stripMargin,

    "q146_correlated_scalar" -> correlatedScalarSql,

    "q147_exists_chain" -> existsChainSql,

    "q171_window_gallery" -> windowGallerySql,

    "q174_audio_decode" ->
      """SELECT CAST(30 AS BIGINT) AS n_payloads, CAST(24 AS BIGINT) AS n_real,
        |  CAST(24 AS BIGINT) AS n_rate_ok, CAST(24 AS BIGINT) AS n_dur_ok,
        |  CAST(24 AS BIGINT) AS n_rms_ok,
        |  CAST(6 AS BIGINT) AS n_fake_flagged""".stripMargin,

    "q175_acf" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS y
        |  FROM events GROUP BY 1),
        |ix AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    y FROM daily),
        |st AS (SELECT sum(y) / count(*) AS mu,
        |    sum(y * y) - sum(y) * sum(y) / count(*) AS denom FROM ix),
        |lg AS (SELECT unnest([1, 2, 3]) AS lag),
        |pr AS (SELECT l.lag, a.y AS y, b.y AS y_lag
        |  FROM ix a CROSS JOIN lg l JOIN ix b ON a.i = b.i + l.lag)
        |SELECT p.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(sum((p.y - st.mu) * (p.y_lag - st.mu)) / min(st.denom), 6)
        |    AS acf
        |FROM pr p CROSS JOIN st GROUP BY 1 ORDER BY 1""".stripMargin,

    "q176_cusum" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |ix AS (SELECT day, cents,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(sum(cents) OVER (ORDER BY day) AS BIGINT) AS cum_cents
        |  FROM daily),
        |st AS (SELECT CAST(sum(cents) AS DOUBLE) AS tot,
        |    CAST(count(*) AS DOUBLE) AS n FROM daily),
        |sc AS (SELECT day, i AS day_idx,
        |    CAST(cum_cents AS DOUBLE) / 100.0 -
        |      CAST(i AS DOUBLE) * (tot / 100.0) / n AS s
        |  FROM ix CROSS JOIN st)
        |SELECT CAST(day AS VARCHAR) AS day, day_idx,
        |  round(abs(s), 4) AS abs_cusum, round(s, 4) AS cusum
        |FROM sc ORDER BY abs_cusum DESC, day LIMIT 1""".stripMargin,

    "q177_kaplan_meier" ->
      """WITH mx AS (SELECT max(o_orderdate) AS mx FROM orders),
        |cust AS (SELECT
        |    CAST(date_diff('day', min(o_orderdate), max(o_orderdate))
        |      AS BIGINT) AS dur,
        |    date_diff('day', max(o_orderdate), min(mx.mx)) > 90 AS event
        |  FROM orders CROSS JOIN mx GROUP BY o_custkey),
        |byd AS (SELECT dur, CAST(count(*) AS BIGINT) AS c_all,
        |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_events
        |  FROM cust GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_total FROM byd),
        |cum AS (SELECT *, CAST(sum(c_all) OVER (ORDER BY dur) AS BIGINT)
        |    AS cum_all FROM byd),
        |risk AS (SELECT dur, c_all, d_events,
        |    n_total - (cum_all - c_all) AS n_risk FROM cum CROSS JOIN tot),
        |ev AS (SELECT dur, n_risk, d_events FROM risk
        |  WHERE d_events > 0 AND n_risk > d_events)
        |SELECT dur AS duration_days, n_risk, d_events,
        |  round(exp(sum(ln(CAST(n_risk - d_events AS DOUBLE) /
        |    CAST(n_risk AS DOUBLE))) OVER (ORDER BY dur)), 6) AS survival
        |FROM ev ORDER BY duration_days""".stripMargin,

    "q199_dup_families" ->
      """WITH fam AS (SELECT text, CAST(count(*) AS BIGINT) AS family_size
        |  FROM documents GROUP BY text)
        |SELECT family_size, CAST(count(*) AS BIGINT) AS n_families,
        |  CAST(family_size * count(*) AS BIGINT) AS n_docs
        |FROM fam GROUP BY 1 ORDER BY family_size""".stripMargin,

    "q200_filter_funnel" -> {
      val scores = TF.LangMarkers.map { case (lang, markers) =>
        s"len(list_filter(ntoks, x -> list_contains(${sqlList(markers)}, x))) AS s_$lang"
      }.mkString(",\n    ")
      val langs = TF.LangMarkers.map(_._1)
      val mx    = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = mm THEN '$l'").mkString(" ")
      s"""WITH b AS (SELECT doc_id, text, $toksSql AS toks,
         |    $ntoksSql AS ntoks FROM documents),
         |m0 AS (SELECT doc_id, text,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / length(text) END AS pr,
         |    CASE WHEN len(ntoks) = 0 THEN 0.0
         |         ELSE len(list_filter(ntoks, x -> list_contains(${sqlList(TF.StopwordsEn)}, x))) * 1.0 / len(ntoks) END AS sw,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END AS mtl,
         |    length(text) AS n, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    $scores
         |  FROM b),
         |m1 AS (SELECT doc_id, text, n_tokens,
         |    least(sw * 4.0, 1.0) * 0.4 + greatest(1.0 - pr * 4.0, 0.0) * 0.3
         |      + (CASE WHEN n BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.25 END) * 0.15
         |      + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.25 END) * 0.15 AS quality,
         |    $mx AS mm, ${langs.map(l => s"s_$l").mkString(", ")}
         |  FROM m0),
         |m2 AS (SELECT doc_id, text, n_tokens, quality,
         |    CASE WHEN mm = 0 THEN 'und' $cases END AS lang_pred
         |  FROM m1),
         |fl AS (SELECT text,
         |    n_tokens BETWEEN 10 AND 10000 AS c1,
         |    n_tokens BETWEEN 10 AND 10000 AND lang_pred = 'en' AS c2,
         |    n_tokens BETWEEN 10 AND 10000 AND lang_pred = 'en'
         |      AND quality >= 0.5 AS c3
         |  FROM m2),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         |    CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         |    CAST(count(DISTINCT CASE WHEN c3 THEN text END) AS BIGINT)
         |      AS s4
         |  FROM fl)
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage, 'all' AS rule,
         |    n0 AS n_surviving, CAST(0 AS BIGINT) AS n_dropped FROM a
         |  UNION ALL SELECT 1, 'length_band', s1, n0 - s1 FROM a
         |  UNION ALL SELECT 2, 'lang_en', s2, s1 - s2 FROM a
         |  UNION ALL SELECT 3, 'quality', s3, s2 - s3 FROM a
         |  UNION ALL SELECT 4, 'exact_dedup', s4, s3 - s4 FROM a)
         |ORDER BY stage""".stripMargin
    },

    "q196_ship_lag" ->
      """WITH g AS (SELECT o_orderpriority,
        |    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
        |      AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |  round(CAST(sum(lag_days) AS DOUBLE) / count(*), 4) AS avg_lag,
        |  round(quantile_cont(lag_days, 0.5), 4) AS median_lag,
        |  CAST(max(lag_days) AS BIGINT) AS max_lag
        |FROM g GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q197_abc_analysis" ->
      """WITH byp AS (SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |rk AS (SELECT cents, CAST(row_number() OVER (
        |    ORDER BY cents DESC, l_partkey) AS BIGINT) AS r FROM byp),
        |cum AS (SELECT cents, CAST(sum(cents) OVER (ORDER BY r) AS BIGINT)
        |    AS cum_cents FROM rk),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM byp),
        |cl AS (SELECT cents,
        |    CASE WHEN CAST(cum_cents AS HUGEINT) * 100 <=
        |        CAST(tot AS HUGEINT) * 80 THEN 'A'
        |      WHEN CAST(cum_cents AS HUGEINT) * 100 <=
        |        CAST(tot AS HUGEINT) * 95 THEN 'B'
        |      ELSE 'C' END AS abc_class
        |  FROM cum CROSS JOIN tot)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue
        |FROM cl GROUP BY 1 ORDER BY abc_class""".stripMargin,

    "q198_return_rate" ->
      """WITH b AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT p_brand, n, x,
        |  round(CAST(x AS DOUBLE) / n, 6) AS rate,
        |  round(((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)) -
        |    1.96 * sqrt((CAST(x AS DOUBLE) / n) * (1 - CAST(x AS DOUBLE) / n)
        |      / n + 1.96 * 1.96 / (4.0 * n * n))) /
        |    (1 + 1.96 * 1.96 / n), 6) AS wilson_lo,
        |  round(((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)) +
        |    1.96 * sqrt((CAST(x AS DOUBLE) / n) * (1 - CAST(x AS DOUBLE) / n)
        |      / n + 1.96 * 1.96 / (4.0 * n * n))) /
        |    (1 + 1.96 * 1.96 / n), 6) AS wilson_hi
        |FROM b ORDER BY p_brand""".stripMargin,

    "q193_hhi_concentration" ->
      """WITH bys AS (SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |sn AS (SELECT s_nationkey, cents FROM bys
        |  JOIN supplier ON l_suppkey = s_suppkey),
        |byn AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |    CAST(sum(cents) AS BIGINT) AS tot FROM sn GROUP BY 1),
        |h AS (SELECT sn.s_nationkey, byn.n_suppliers,
        |    round(sum(pow(CAST(sn.cents AS DOUBLE) / CAST(byn.tot AS DOUBLE),
        |      2)), 6) AS hhi
        |  FROM sn JOIN byn USING (s_nationkey) GROUP BY 1, 2)
        |SELECT n_name, n_suppliers, hhi FROM h
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,

    "q194_interpurchase" ->
      """WITH g AS (SELECT CAST(date_diff('day',
        |      lag(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate), o_orderdate) AS BIGINT) AS gap
        |  FROM orders),
        |k AS (SELECT gap FROM g WHERE gap IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_gaps,
        |  round(quantile_cont(gap, 0.25), 4) AS p25,
        |  round(quantile_cont(gap, 0.5), 4) AS p50,
        |  round(quantile_cont(gap, 0.75), 4) AS p75
        |FROM k""".stripMargin,

    "q195_cohort_ltv" ->
      """WITH f AS (SELECT o_custkey,
        |    CAST(year(min(o_orderdate)) AS BIGINT) AS cohort,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0 / count(*), 2)
        |    AS ltv_per_customer
        |FROM f GROUP BY 1 ORDER BY cohort""".stripMargin,

    "q190_ngram_novelty" ->
      s"""WITH norm AS (SELECT doc_id, $ntoksSql AS ntoks FROM documents),
        |grams AS (SELECT doc_id % 2 = 0 AS is_train,
        |    unnest(list_distinct(CASE WHEN len(ntoks) < 5 THEN []
        |      ELSE list_transform(range(len(ntoks) - 4),
        |        i -> ntoks[i+1] || ' ' || ntoks[i+2] || ' ' || ntoks[i+3]
        |          || ' ' || ntoks[i+4] || ' ' || ntoks[i+5]) END)) AS g
        |  FROM norm),
        |side AS (SELECT DISTINCT is_train, g FROM grams),
        |fl AS (SELECT g,
        |    max(CASE WHEN is_train THEN 1 ELSE 0 END) AS in_train,
        |    max(CASE WHEN NOT is_train THEN 1 ELSE 0 END) AS in_test
        |  FROM side GROUP BY 1),
        |a AS (SELECT CAST(sum(in_train) AS BIGINT) AS n_train_grams,
        |    CAST(sum(in_test) AS BIGINT) AS n_test_grams,
        |    CAST(sum(CASE WHEN in_test = 1 AND in_train = 0 THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_novel
        |  FROM fl)
        |SELECT n_train_grams, n_test_grams, n_novel,
        |  round(CAST(n_novel AS DOUBLE) / n_test_grams, 6) AS novelty_rate
        |FROM a""".stripMargin,

    "q191_template_coverage" ->
      s"""WITH norm AS (SELECT doc_id, $ntoksSql AS ntoks FROM documents),
        |grams AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id,
        |    unnest(list_distinct(CASE WHEN len(ntoks) < 5 THEN []
        |      ELSE list_transform(range(len(ntoks) - 4),
        |        i -> ntoks[i+1] || ' ' || ntoks[i+2] || ' ' || ntoks[i+3]
        |          || ' ' || ntoks[i+4] || ' ' || ntoks[i+5]) END)) AS g
        |  FROM norm)),
        |df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM grams
        |  GROUP BY 1),
        |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_boiler
        |  FROM grams JOIN df USING (g) GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN CAST(n_boiler AS DOUBLE) / n_grams >= 0.5
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(sum(n_boiler) AS BIGINT) AS n_boiler_hits,
        |  round(sum(CAST(n_boiler AS DOUBLE) / n_grams) / count(*), 6)
        |    AS avg_coverage
        |FROM cov""".stripMargin,

    "q192_price_elasticity" ->
      """WITH b AS (SELECT p_brand,
        |    ln(CAST(l_quantity AS DOUBLE)) AS y,
        |    ln(l_extendedprice / l_quantity) AS x
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_quantity > 0 AND l_extendedprice / l_quantity > 0),
        |a AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx
        |  FROM b GROUP BY 1)
        |SELECT p_brand, n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |    AS elasticity
        |FROM a ORDER BY p_brand""".stripMargin,

    "q187_stickiness" ->
      """WITH ev AS (SELECT strftime(ts, '%Y-%m') AS month,
        |    CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT month, n_days, dau_sum FROM (
        |  SELECT month, CAST(count(*) AS BIGINT) AS n_days,
        |      CAST(sum(dau) AS BIGINT) AS dau_sum
        |    FROM (SELECT month, day, CAST(count(DISTINCT user_id) AS BIGINT)
        |        AS dau FROM ev GROUP BY 1, 2)
        |    GROUP BY 1)),
        |mau AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM ev GROUP BY 1)
        |SELECT d.month, d.n_days, m.mau,
        |  round(CAST(d.dau_sum AS DOUBLE) / d.n_days, 4) AS avg_dau,
        |  round(CAST(d.dau_sum AS DOUBLE) / d.n_days / m.mau, 4)
        |    AS stickiness
        |FROM dau d JOIN mau m USING (month) ORDER BY month""".stripMargin,

    "q188_weighted_quantiles" ->
      """WITH pts AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
        |      AS BIGINT) AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS cw
        |  FROM lineitem GROUP BY 1),
        |cum AS (SELECT cents, CAST(sum(cw) OVER (ORDER BY cents) AS BIGINT)
        |    AS cum_w FROM pts),
        |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS tw FROM pts),
        |qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
        |    ('p99', 99, 100)) AS v(q_label, num, den)),
        |thr AS (SELECT q_label, (tw * num + den - 1) // den AS thr
        |  FROM qs CROSS JOIN tot)
        |SELECT q_label,
        |  round(CAST(min(cents) AS DOUBLE) / 100.0, 2) AS weighted_price
        |FROM cum CROSS JOIN thr WHERE cum_w >= thr
        |GROUP BY 1 ORDER BY q_label""".stripMargin,

    "q189_zipf_slope" ->
      """WITH tok AS (SELECT unnest(string_split_regex(lower(text),
        |      '[^a-z0-9]+')) AS tokn FROM documents),
        |tc AS (SELECT tokn, CAST(count(*) AS BIGINT) AS freq FROM tok
        |  WHERE tokn <> '' GROUP BY 1),
        |rk AS (SELECT freq, CAST(row_number() OVER (
        |    ORDER BY freq DESC, tokn) AS BIGINT) AS rank FROM tc),
        |xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x,
        |    ln(CAST(freq AS DOUBLE)) AS y FROM rk WHERE rank <= 1000),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_tokens,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |    AS zipf_slope,
        |  round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n,
        |    6) AS intercept
        |FROM a""".stripMargin,

    "q184_burst_days" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |r AS (SELECT day, c,
        |    count(c) OVER w AS n_win,
        |    sum(c) OVER w AS s1,
        |    sum(c * c) OVER w AS s2
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 28 PRECEDING
        |    AND 1 PRECEDING)),
        |st AS (SELECT day, c, n_win,
        |    CAST(s1 AS DOUBLE) / n_win AS mu,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_win) / n_win
        |      AS var
        |  FROM r WHERE n_win >= 14),
        |z AS (SELECT day, c,
        |    round(mu, 4) AS mu_28,
        |    round((CAST(c AS DOUBLE) - mu) / sqrt(var), 4) AS z
        |  FROM st WHERE var > 0),
        |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY z DESC, day)
        |    AS BIGINT) AS rank FROM z)
        |SELECT CAST(day AS VARCHAR) AS day, c AS n_events, mu_28, z, rank
        |FROM rk WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q185_sentence_stats" ->
      """WITH frags AS (SELECT doc_id, lang,
        |    trim(unnest(string_split_regex(text, '[.!?]+'))) AS frag
        |  FROM documents),
        |keep AS (SELECT doc_id, lang, frag,
        |    CAST(len(string_split_regex(frag, '\s+')) AS BIGINT) AS n_words
        |  FROM frags WHERE length(frag) > 0),
        |per AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_sent,
        |    CAST(sum(n_words) AS BIGINT) AS n_words
        |  FROM keep GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(n_sent) AS DOUBLE) / count(*), 4) AS avg_sentences,
        |  round(CAST(sum(n_words) AS DOUBLE) / sum(n_sent), 4)
        |    AS words_per_sentence
        |FROM per GROUP BY 1 ORDER BY lang""".stripMargin,

    "q186_yoy_growth" ->
      """WITH yearly AS (SELECT
        |    CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT a.yr, a.n_orders,
        |  round(CAST(a.cents AS DOUBLE) / 100.0, 2) AS revenue,
        |  round(CAST(a.cents - b.cents AS DOUBLE) /
        |    CAST(b.cents AS DOUBLE) * 100.0, 4) AS yoy_pct
        |FROM yearly a LEFT JOIN yearly b ON a.yr = b.yr + 1
        |ORDER BY a.yr""".stripMargin,

    "q181_snm_blocking" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |ix AS (SELECT p_name,
        |    CAST(row_number() OVER (ORDER BY p_name) AS BIGINT) AS i
        |  FROM names),
        |off AS (SELECT unnest([1, 2]) AS off),
        |pr AS (SELECT a.p_name AS name_a, b.p_name AS name_b
        |  FROM ix a CROSS JOIN off o JOIN ix b ON b.i = a.i + o.off),
        |sc AS (SELECT name_a, name_b,
        |    round(jaro_winkler_similarity(name_a, name_b), 6) AS jw
        |  FROM pr),
        |m AS (SELECT *, CAST(row_number() OVER (
        |    ORDER BY jw DESC, name_a, name_b) AS BIGINT) AS rank
        |  FROM sc WHERE jw >= 0.88)
        |SELECT name_a, name_b, jw, rank FROM m
        |WHERE rank <= 15 ORDER BY rank""".stripMargin,

    "q182_weekday_chi2" ->
      """WITH d AS (SELECT
        |    CAST(date_diff('day', DATE '1990-01-01', o_orderdate)
        |      AS BIGINT) % 7 AS dow_idx
        |  FROM orders),
        |g AS (SELECT dow_idx, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_orders) AS DOUBLE) AS n FROM g)
        |SELECT dow_idx, n_orders, round(n / 7.0, 2) AS expected,
        |  round(pow(CAST(n_orders AS DOUBLE) - n / 7.0, 2) / (n / 7.0), 4)
        |    AS chi2_term
        |FROM g CROSS JOIN tot ORDER BY dow_idx""".stripMargin,

    "q183_fk_integrity" ->
      """SELECT 'customer.nation' AS fk_edge,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_child,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |     WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
        |    AS n_orphans
        |UNION ALL SELECT 'lineitem.orders',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |UNION ALL SELECT 'lineitem.part',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
        |UNION ALL SELECT 'lineitem.supplier',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
        |UNION ALL SELECT 'orders.customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |UNION ALL SELECT 'supplier.nation',
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier
        |     WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))
        |ORDER BY fk_edge""".stripMargin,

    "q178_rfm" ->
      """WITH mx AS (SELECT max(o_orderdate) AS mx FROM orders),
        |cust AS (SELECT o_custkey,
        |    CAST(date_diff('day', max(o_orderdate), min(mx.mx)) AS BIGINT)
        |      AS recency,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders CROSS JOIN mx GROUP BY o_custkey),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM cust),
        |rk AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY recency, o_custkey) AS BIGINT)
        |      AS rr,
        |    CAST(row_number() OVER (ORDER BY freq DESC, o_custkey)
        |      AS BIGINT) AS fr,
        |    CAST(row_number() OVER (ORDER BY cents DESC, o_custkey)
        |      AS BIGINT) AS mr
        |  FROM cust),
        |qs AS (SELECT cents,
        |    1 + (rr - 1) * 5 // n_cust AS r_q,
        |    1 + (fr - 1) * 5 // n_cust AS f_q,
        |    1 + (mr - 1) * 5 // n_cust AS m_q
        |  FROM rk CROSS JOIN tot)
        |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS monetary_total
        |FROM qs GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q179_two_proportion" ->
      """WITH b AS (SELECT c_mktsegment = 'BUILDING' AS is_a,
        |    o_totalprice > 150000 AS hit
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN is_a AND hit THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x_a,
        |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN NOT is_a AND hit THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_b
        |  FROM b)
        |SELECT n_a, x_a, n_b, x_b,
        |  round(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a,
        |  round(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b,
        |  round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
        |    sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |      (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |      (1.0 / n_a + 1.0 / n_b)), 4) AS z
        |FROM a""".stripMargin,

    "q180_simpson" ->
      """WITH b AS (SELECT o_orderpriority AS stratum,
        |    c_mktsegment = 'BUILDING' AS is_a,
        |    o_totalprice > 150000 AS hit
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |per AS (SELECT stratum,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN is_a AND hit THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x_a,
        |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN NOT is_a AND hit THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_b
        |  FROM b GROUP BY 1),
        |allrows AS (SELECT stratum, n_a, x_a, n_b, x_b FROM per
        |  UNION ALL
        |  SELECT 'ALL', CAST(sum(n_a) AS BIGINT), CAST(sum(x_a) AS BIGINT),
        |    CAST(sum(n_b) AS BIGINT), CAST(sum(x_b) AS BIGINT) FROM per)
        |SELECT stratum, n_a, x_a, n_b, x_b,
        |  round(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_a,
        |  round(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_b,
        |  CAST(x_a AS HUGEINT) * CAST(n_b AS HUGEINT) >
        |    CAST(x_b AS HUGEINT) * CAST(n_a AS HUGEINT) AS a_leads
        |FROM allrows ORDER BY stratum""".stripMargin,

    "q172_equidepth_hist" ->
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
        |e AS (SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
        |    0.8, 0.9]) AS edges FROM b)
        |SELECT bucket, count(*) AS n, round(min(v), 4) AS min_v,
        |  round(max(v), 4) AS max_v
        |FROM (SELECT b.v, CAST(len(list_filter(e.edges, x -> b.v > x))
        |    AS BIGINT) AS bucket
        |  FROM b CROSS JOIN e)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q173_vocab_drift" ->
      s"""WITH norm AS (SELECT doc_id % 2 = 0 AS is_p, t.tok
         |  FROM (SELECT doc_id, $ntoksSql AS ntoks FROM documents),
         |    unnest(ntoks) AS t(tok)),
         |counts AS (SELECT tok,
         |    CAST(sum(CASE WHEN is_p THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         |    CAST(sum(CASE WHEN NOT is_p THEN 1 ELSE 0 END) AS BIGINT) AS cq
         |  FROM norm GROUP BY 1),
         |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
         |    CAST(sum(cq) AS BIGINT) AS nq, count(*) AS v FROM counts),
         |sc AS (SELECT c.tok, c.cp, c.cq,
         |    (c.cp + 1) * 1.0 / (t.np + t.v) AS p,
         |    (c.cq + 1) * 1.0 / (t.nq + t.v) AS q
         |  FROM counts c CROSS JOIN tot t),
         |kl AS (SELECT round(sum(p * ln(p / q)), 6) AS kl_total FROM sc),
         |r AS (SELECT tok, cp, cq, round(p * ln(p / q), 8) AS contrib,
         |    CAST(row_number() OVER (ORDER BY round(p * ln(p / q), 8) DESC,
         |      tok) AS BIGINT) AS rank
         |  FROM sc)
         |SELECT rank, tok, cp, cq, contrib, kl_total
         |FROM r CROSS JOIN kl WHERE rank <= 15 ORDER BY rank""".stripMargin,

    "q168_ks_test" ->
      s"""${qualityCteSql(", lang")},
         |pts AS (SELECT quality AS v,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ca,
         |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cb
         |  FROM q GROUP BY 1),
         |cumc AS (SELECT v, sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b
         |  FROM pts WINDOW w AS (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |totk AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
         |    CAST(sum(cb) AS BIGINT) AS nb FROM pts),
         |gapg AS (SELECT t.na, t.nb, cumc.v,
         |    round(abs(cum_a * 1.0 / t.na - cum_b * 1.0 / t.nb), 6) AS gap
         |  FROM cumc CROSS JOIN totk t),
         |ksm AS (SELECT na, nb, max(gap) AS ks FROM gapg GROUP BY 1, 2),
         |ksa AS (SELECT round(min(v), 6) AS ks_at FROM gapg JOIN ksm
         |  ON gapg.gap = ksm.ks)
         |SELECT na, nb, ks, ks_at FROM ksm CROSS JOIN ksa""".stripMargin,

    "q169_auc" ->
      s"""WITH $lrCtes,
         |pts AS (SELECT p,
         |    CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cpos,
         |    count(*) AS ctot FROM scored GROUP BY 1),
         |c AS (SELECT p, cpos, ctot, sum(ctot) OVER (ORDER BY p
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_t
         |  FROM pts),
         |rs AS (SELECT sum(cpos * (cum_t - (ctot - 1) / 2.0)) AS rank_sum
         |  FROM c),
         |tot AS (SELECT CAST(sum(cpos) AS BIGINT) AS n_pos,
         |    CAST(sum(ctot) - sum(cpos) AS BIGINT) AS n_neg FROM pts)
         |SELECT n_pos, n_neg,
         |  round((rank_sum - n_pos * (n_pos + 1) / 2.0) /
         |    (n_pos * 1.0 * n_neg), 6) AS auc
         |FROM rs CROSS JOIN tot""".stripMargin,

    "q170_gini" ->
      """WITH t AS (SELECT user_id, sum(value) AS t FROM events GROUP BY 1),
        |r AS (SELECT user_id, t, CAST(row_number() OVER (
        |    ORDER BY t, user_id) AS BIGINT) AS rk FROM t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users, sum(t) AS total
        |  FROM t)
        |SELECT n.n_users, round(n.total, 4) AS total,
        |  round(2.0 * sum(r.rk * r.t) / (n.n_users * n.total)
        |    - (n.n_users + 1) * 1.0 / n.n_users, 6) AS gini,
        |  round(sum(CASE WHEN r.rk > n.n_users * 0.9 THEN r.t ELSE 0 END)
        |    / n.total, 6) AS top_decile_share
        |FROM r CROSS JOIN n GROUP BY n.n_users, n.total""".stripMargin,

    "q165_entropy_rate" ->
      """WITH sq AS (SELECT event_type AS next,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |tr AS (SELECT prev, next, count(*) AS c FROM sq
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tr),
        |pt AS (SELECT prev, CAST(sum(c) AS BIGINT) AS cp FROM tr GROUP BY 1),
        |nt AS (SELECT next, CAST(sum(c) AS BIGINT) AS cn FROM tr GROUP BY 1),
        |hc AS (SELECT -sum((t.c * 1.0 / o.n) * ln(t.c * 1.0 / p.cp))
        |    AS h_cond
        |  FROM tr t JOIN pt p USING (prev) CROSS JOIN tot o),
        |hn AS (SELECT -sum((cn * 1.0 / o.n) * ln(cn * 1.0 / o.n)) AS h_next
        |  FROM nt CROSS JOIN tot o)
        |SELECT round(h_next, 6) AS h_next, round(h_cond, 6) AS h_cond,
        |  round(h_next - h_cond, 6) AS info_gain
        |FROM hn CROSS JOIN hc""".stripMargin,

    "q166_trend_slopes" ->
      """WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
        |b AS (SELECT event_type,
        |    (epoch_us(ts) - t0.t0) / 86400000000.0 AS x, value AS y
        |  FROM events CROSS JOIN t0),
        |a AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM b GROUP BY 1)
        |SELECT event_type, n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n,
        |    6) AS intercept
        |FROM a ORDER BY event_type""".stripMargin,

    "q167_correlations" ->
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_extendedprice AS DOUBLE) AS p,
        |    CAST(l_discount AS DOUBLE) AS d FROM lineitem),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(q) AS s_q, sum(p) AS s_p, sum(d) AS s_d,
        |    sum(q * q) AS s_q_q, sum(p * p) AS s_p_p, sum(d * d) AS s_d_d,
        |    sum(q * p) AS s_q_p, sum(q * d) AS s_q_d, sum(p * d) AS s_p_d
        |  FROM b)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((n * s_q_p - s_q * s_p) /
        |    sqrt((n * s_q_q - s_q * s_q) * (n * s_p_p - s_p * s_p)), 6)
        |    AS r_qty_price,
        |  round((n * s_q_d - s_q * s_d) /
        |    sqrt((n * s_q_q - s_q * s_q) * (n * s_d_d - s_d * s_d)), 6)
        |    AS r_qty_disc,
        |  round((n * s_p_d - s_p * s_d) /
        |    sqrt((n * s_p_p - s_p * s_p) * (n * s_d_d - s_d * s_d)), 6)
        |    AS r_price_disc
        |FROM a""".stripMargin,

    "q164_tfidf_pairs" ->
      """WITH docs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, substr(text, 21) FROM documents),
        |tok AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        |  FROM docs),
        |tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |nn AS (SELECT count(*) AS n FROM docs),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
        |  HAVING count(*) BETWEEN 2 AND 400),
        |w AS (SELECT t.term, t.doc_id, t.tf * ln(nn.n * 1.0 / d.df) AS w
        |  FROM tf t JOIN dft d USING (term) CROSS JOIN nn),
        |norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY 1),
        |dots AS (SELECT a.doc_id AS idA, b.doc_id AS idB,
        |    sum(a.w * b.w) AS dot
        |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (SELECT idA, idB,
        |    round(dot / (na.norm * nb.norm), 6) AS cosine
        |  FROM dots JOIN norms na ON idA = na.doc_id
        |  JOIN norms nb ON idB = nb.doc_id)
        |SELECT idA, idB, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    ORDER BY cosine DESC, idA, idB) AS BIGINT) AS rank
        |  FROM p WHERE cosine >= 0.5)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q163_markov_predict" ->
      """WITH s0 AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS cnt
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sq AS (SELECT *, rn <= floor(cnt * 0.8) AS is_train FROM s0
        |  WHERE prev IS NOT NULL),
        |model AS (SELECT prev, event_type AS next, count(*) AS c
        |  FROM sq WHERE is_train GROUP BY 1, 2),
        |pred AS (SELECT prev, next AS pred_next FROM (
        |  SELECT prev, next, row_number() OVER (PARTITION BY prev
        |    ORDER BY c DESC, next) AS r FROM model) WHERE r = 1),
        |trn AS (SELECT prev, CAST(sum(c) AS BIGINT) AS n_train FROM model
        |  GROUP BY 1)
        |SELECT sq.prev AS prev_type, p.pred_next, t.n_train,
        |  count(*) AS n_test,
        |  CAST(sum(CASE WHEN sq.event_type = p.pred_next THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  round(sum(CASE WHEN sq.event_type = p.pred_next THEN 1 ELSE 0 END)
        |    * 1.0 / count(*), 6) AS accuracy
        |FROM sq JOIN pred p ON sq.prev = p.prev
        |JOIN trn t ON sq.prev = t.prev
        |WHERE NOT sq.is_train
        |GROUP BY 1, 2, 3 ORDER BY prev_type""".stripMargin,

    "q162_pareto_frontier" ->
      s"""${qualityCteSql("")},
         |pts AS (SELECT quality AS x, ntok AS y, min(doc_id) AS min_id,
         |    count(*) AS n_rows FROM q GROUP BY 1, 2),
         |f AS (SELECT *, max(y) OVER (ORDER BY x DESC, y DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM pts)
         |SELECT round(x, 6) AS quality, y AS ntok, min_id AS min_doc,
         |  n_rows AS n_docs
         |FROM f WHERE pm IS NULL OR pm < y
         |ORDER BY quality DESC, ntok DESC, min_doc""".stripMargin,

    "q161_rbo" ->
      s"""WITH ${bm25Ctes(
             "(1, 'spark window agg'), (2, 'vector scan batch'), (3, 'customer stream query')")},
         |bm AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
         |        CAST(rank AS BIGINT) AS ra
         |       FROM ranked WHERE rank <= 10),
         |e AS (SELECT vec_id,
         |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |      FROM embeddings),
         |cs AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |        CASE WHEN sqrt(list_dot_product(q.v, q.v)) *
         |                  sqrt(list_dot_product(c.v, c.v)) = 0 THEN 0.0
         |             ELSE list_dot_product(q.v, c.v) /
         |               (sqrt(list_dot_product(q.v, q.v)) *
         |                sqrt(list_dot_product(c.v, c.v))) END AS cosine
         |       FROM e q JOIN e c
         |         ON q.vec_id IN (1, 2, 3) AND q.vec_id <> c.vec_id),
         |cr AS (SELECT query_id, doc_id,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, doc_id) AS rank FROM cs),
         |sem AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
         |        CAST(rank AS BIGINT) AS rb FROM cr WHERE rank <= 10),
         |sfx AS (SELECT d, sum(0.1 * pow(0.9, d - 1) / d) OVER (
         |        ORDER BY d DESC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suf
         |      FROM (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT)
         |              AS d)),
         |common AS (SELECT b.query_id, count(*) AS n_common,
         |        sum(s.suf) AS rbo
         |      FROM bm b JOIN sem m
         |        ON b.query_id = m.query_id AND b.doc_id = m.doc_id
         |      JOIN sfx s ON s.d = greatest(b.ra, m.rb)
         |      GROUP BY 1),
         |ql AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS query_id)
         |SELECT q.query_id, coalesce(c.n_common, 0) AS n_common,
         |  round(coalesce(c.rbo, 0), 6) AS rbo
         |FROM ql q LEFT JOIN common c ON q.query_id = c.query_id
         |ORDER BY q.query_id""".stripMargin,

    "q160_source_calibration" ->
      s"""${qualityCteSql(", source")},
         |r AS (SELECT doc_id, source, quality,
         |    percent_rank() OVER (ORDER BY quality, doc_id) AS pr FROM q)
         |SELECT source, count(*) AS n_docs,
         |  round(avg(quality), 6) AS avg_quality,
         |  round(avg(pr), 6) AS avg_pctile,
         |  round(min(pr), 6) AS min_pctile,
         |  round(max(pr), 6) AS max_pctile
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q159_hits" ->
      s"""WITH ev AS (SELECT user_id, event_id, ts,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS item FROM events),
         |sq AS (SELECT item,
         |    lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
         |  FROM ev),
         |e AS (SELECT DISTINCT src, item AS dst FROM sq
         |  WHERE src IS NOT NULL AND src <> item),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |a1r AS (SELECT dst AS node, CAST(count(*) AS DOUBLE) AS auth
         |  FROM e GROUP BY dst),
         |a1n AS (SELECT node, auth / (SELECT sqrt(sum(auth * auth)) FROM a1r)
         |    AS auth FROM a1r),
         |h1r AS (SELECT e.src AS node, sum(a.auth) AS hub
         |  FROM e JOIN a1n a ON e.dst = a.node GROUP BY e.src),
         |h1n AS (SELECT node, hub / (SELECT sqrt(sum(hub * hub)) FROM h1r)
         |    AS hub FROM h1r),
         |a2r AS (SELECT e.dst AS node, sum(h.hub) AS auth
         |  FROM e JOIN h1n h ON e.src = h.node GROUP BY e.dst),
         |a2n AS (SELECT node, auth / (SELECT sqrt(sum(auth * auth)) FROM a2r)
         |    AS auth FROM a2r),
         |h2r AS (SELECT e.src AS node, sum(a.auth) AS hub
         |  FROM e JOIN a2n a ON e.dst = a.node GROUP BY e.src),
         |h2n AS (SELECT node, hub / (SELECT sqrt(sum(hub * hub)) FROM h2r)
         |    AS hub FROM h2r),
         |fin AS (SELECT n.node, round(coalesce(a.auth, 0), 6) AS auth,
         |    round(coalesce(h.hub, 0), 6) AS hub
         |  FROM nodes n
         |  LEFT JOIN a2n a ON n.node = a.node
         |  LEFT JOIN h2n h ON n.node = h.node)
         |SELECT node, auth, hub, rank FROM (
         |  SELECT node, auth, hub, CAST(row_number() OVER (
         |    ORDER BY auth DESC, node) AS BIGINT) AS rank FROM fin)
         |WHERE rank <= 15 ORDER BY rank""".stripMargin,

    "q158_source_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source, t.tok
         |  FROM (SELECT source, $ntoksSql AS ntoks FROM documents),
         |    unnest(ntoks) AS t(tok)),
         |sizes AS (SELECT source, count(*) AS sz FROM st GROUP BY 1),
         |inter AS (SELECT a.source AS src_a, b.source AS src_b,
         |    count(*) AS i
         |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT i.src_a, i.src_b, i.i,
         |  round(i.i * 1.0 / (sa.sz + sb.sz - i.i), 6) AS jaccard
         |FROM inter i
         |JOIN sizes sa ON i.src_a = sa.source
         |JOIN sizes sb ON i.src_b = sb.source
         |ORDER BY src_a, src_b""".stripMargin,

    "q157_jaro_winkler_er" ->
      """WITH names AS (SELECT DISTINCT p_name,
        |    split_part(p_name, ' ', 1) AS blk FROM part),
        |pairs AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
        |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |  FROM names a JOIN names b
        |    ON a.blk = b.blk AND a.p_name < b.p_name)
        |SELECT name_a, name_b, jw, rank FROM (
        |  SELECT name_a, name_b, jw, CAST(row_number() OVER (
        |    ORDER BY jw DESC, name_a, name_b) AS BIGINT) AS rank
        |  FROM pairs WHERE jw >= 0.85)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q156_benford" ->
      """WITH c AS (SELECT event_type AS key,
        |    CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
        |      AS BIGINT) AS digit,
        |    count(*) AS n_d
        |  FROM events WHERE value >= 1 GROUP BY 1, 2),
        |tot AS (SELECT key, CAST(sum(n_d) AS BIGINT) AS n FROM c GROUP BY 1),
        |grid AS (SELECT t.key, t.n, g.digit FROM tot t,
        |  (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) AS digit) g)
        |SELECT g.key AS event_type, g.digit,
        |  coalesce(c.n_d, 0) AS n_d,
        |  round(coalesce(c.n_d, 0) * 1.0 / g.n, 6) AS obs_share,
        |  round(ln(1.0 + 1.0 / g.digit) / ln(10.0), 6) AS benford_p,
        |  round(pow(coalesce(c.n_d, 0) - g.n * (ln(1.0 + 1.0 / g.digit)
        |      / ln(10.0)), 2)
        |    / (g.n * (ln(1.0 + 1.0 / g.digit) / ln(10.0))), 6) AS chi2_term
        |FROM grid g LEFT JOIN c ON g.key = c.key AND g.digit = c.digit
        |ORDER BY event_type, g.digit""".stripMargin,

    "q155_winsorized" ->
      """WITH cuts AS (SELECT event_type,
        |    quantile_cont(value, 0.1) AS lo, quantile_cont(value, 0.9) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, count(e.value) AS n,
        |  round(avg(e.value), 4) AS mean,
        |  round(avg(greatest(least(e.value, c.hi), c.lo)), 4) AS wins_mean,
        |  round(avg(CASE WHEN e.value BETWEEN c.lo AND c.hi
        |    THEN e.value END), 4) AS trim_mean,
        |  CAST(sum(CASE WHEN e.value BETWEEN c.lo AND c.hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS trim_n,
        |  round(max(c.lo), 4) AS p_lo, round(max(c.hi), 4) AS p_hi
        |FROM events e JOIN cuts c USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q154_event_trigrams" ->
      """WITH runs AS (SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |counts AS (SELECT e1, e2, e3, count(*) AS cnt FROM runs
        |  WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
        |SELECT e1, e2, e3, cnt, share, rank FROM (
        |  SELECT c.e1, c.e2, c.e3, c.cnt,
        |    round(c.cnt * 1.0 / t.total, 6) AS share,
        |    CAST(row_number() OVER (ORDER BY c.cnt DESC, c.e1, c.e2, c.e3)
        |      AS BIGINT) AS rank
        |  FROM counts c CROSS JOIN tot t)
        |WHERE rank <= 15 ORDER BY rank""".stripMargin,

    "q153_triangles" ->
      s"""WITH $ngramPairsCtes,
         |e AS (SELECT idA AS a, idB AS b FROM pairs),
         |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w FROM e e1
         |  JOIN e e2 ON e1.b = e2.a
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |m AS (SELECT node, count(*) AS n_triangles FROM (
         |    SELECT unnest([u, v, w]) AS node FROM tri) GROUP BY node)
         |SELECT node AS doc_id, n_triangles, rank FROM (
         |  SELECT node, n_triangles, CAST(row_number() OVER (
         |    ORDER BY n_triangles DESC, node) AS BIGINT) AS rank FROM m)
         |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q151_decayed_engagement" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS t, value FROM events
        |  WHERE event_type = 'purchase'),
        |r AS (SELECT max(t) AS t_ref FROM p),
        |a AS (SELECT user_id,
        |    round(sum(value * exp(-(r.t_ref - t) / 604800000000.0)), 4)
        |      AS decayed_sum,
        |    count(*) AS n_events
        |  FROM p CROSS JOIN r GROUP BY user_id)
        |SELECT * FROM (SELECT user_id, decayed_sum, n_events,
        |    CAST(row_number() OVER (ORDER BY decayed_sum DESC, user_id)
        |      AS BIGINT) AS rank FROM a)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q152_mutual_info" ->
      """WITH joint AS (SELECT lang AS a, source AS b, count(*) AS n_ab
        |  FROM documents GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM joint
        |  GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM joint
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM joint),
        |ha AS (SELECT -sum((n_a * 1.0 / n) * ln(n_a * 1.0 / n)) AS h_a
        |  FROM ma CROSS JOIN tot),
        |hb AS (SELECT -sum((n_b * 1.0 / n) * ln(n_b * 1.0 / n)) AS h_b
        |  FROM mb CROSS JOIN tot),
        |mi AS (SELECT sum((j.n_ab * 1.0 / t.n) *
        |    ln((j.n_ab * 1.0 / t.n) /
        |       ((ma.n_a * 1.0 / t.n) * (mb.n_b * 1.0 / t.n)))) AS mi
        |  FROM joint j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot t)
        |SELECT round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
        |  round(mi, 6) AS mi,
        |  round(mi / sqrt(h_a * h_b), 6) AS nmi
        |FROM ha CROSS JOIN hb CROSS JOIN mi""".stripMargin,

    "q150_naive_bayes" ->
      s"""WITH norm AS (SELECT doc_id, lang, $ntoksSql AS ntoks FROM documents),
         |tr AS (SELECT * FROM norm WHERE doc_id % 5 < 4),
         |ev AS (SELECT * FROM norm WHERE doc_id % 5 = 4),
         |trt AS (SELECT lang AS cls, t.tok FROM tr, unnest(ntoks) AS t(tok)),
         |lt AS (SELECT cls, tok, count(*) AS c_ct FROM trt GROUP BY 1, 2),
         |totl AS (SELECT cls, CAST(sum(c_ct) AS BIGINT) AS tot_c FROM lt
         |  GROUP BY 1),
         |vocab AS (SELECT count(DISTINCT tok) AS v FROM lt),
         |clsd AS (SELECT lang AS cls, count(*) AS n_c FROM tr GROUP BY 1),
         |dd AS (SELECT CAST(sum(n_c) AS BIGINT) AS d FROM clsd),
         |stats AS (SELECT c.cls, ln(c.n_c * 1.0 / dd.d) AS logprior,
         |    ln(1.0 / (t.tot_c + v.v)) AS fallback
         |  FROM clsd c JOIN totl t USING (cls) CROSS JOIN dd CROSS JOIN vocab v),
         |evc AS (SELECT doc_id, t.tok, count(*) AS cnt
         |  FROM ev, unnest(ntoks) AS t(tok) GROUP BY 1, 2),
         |evtot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_cnt
         |  FROM evc GROUP BY 1),
         |adj AS (SELECT e.doc_id, m.cls, sum(e.cnt * ln(m.c_ct + 1)) AS adj
         |  FROM evc e JOIN lt m ON e.tok = m.tok GROUP BY 1, 2),
         |sc AS (SELECT b.doc_id, s.cls,
         |    round(s.logprior + b.total_cnt * s.fallback
         |      + coalesce(a.adj, 0), 6) AS score
         |  FROM evtot b CROSS JOIN stats s
         |  LEFT JOIN adj a ON a.doc_id = b.doc_id AND a.cls = s.cls),
         |pred AS (SELECT doc_id, cls AS pred_lang,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rn FROM sc)
         |SELECT e.lang AS true_lang, p.pred_lang, count(*) AS n
         |FROM ev e JOIN pred p ON e.doc_id = p.doc_id AND p.rn = 1
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q149_chi2_terms" ->
      s"""WITH norm AS (SELECT lang, $ntoksSql AS ntoks FROM documents),
         |pres AS (SELECT lang AS cls, t.term
         |  FROM norm, unnest(list_distinct(ntoks)) AS t(term)),
         |lt AS (SELECT cls, term, count(*) AS n_ct FROM pres GROUP BY 1, 2),
         |tok AS (SELECT term, CAST(sum(n_ct) AS BIGINT) AS n_t FROM lt
         |  GROUP BY 1 HAVING CAST(sum(n_ct) AS BIGINT) >= 5),
         |cls AS (SELECT lang AS cls, count(*) AS n_c FROM documents
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n_docs FROM cls),
         |sc AS (SELECT l.cls, l.term, l.n_ct,
         |    round(t2.n_docs *
         |      pow(l.n_ct * 1.0 * (t2.n_docs - c.n_c - (t.n_t - l.n_ct))
         |        - (t.n_t - l.n_ct) * 1.0 * (c.n_c - l.n_ct), 2)
         |      / (t.n_t * 1.0 * (t2.n_docs - t.n_t) * c.n_c *
         |         (t2.n_docs - c.n_c)), 6) AS chi2
         |  FROM lt l JOIN tok t USING (term) JOIN cls c USING (cls)
         |  CROSS JOIN tot t2
         |  WHERE t.n_t < t2.n_docs),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY cls
         |    ORDER BY chi2 DESC, term) AS BIGINT) AS rank FROM sc)
         |SELECT cls AS lang, term, n_ct, chi2, rank FROM r
         |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "q148_assoc_rules" ->
      """WITH b AS (SELECT DISTINCT user_id AS basket,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE props IS NOT NULL),
        |n AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
        |freq AS (SELECT item, count(*) AS c_item FROM b GROUP BY item
        |  HAVING count(*) >= ceil(0.2 * (SELECT n_baskets FROM n))),
        |fb AS (SELECT b.basket, b.item FROM b JOIN freq USING (item)),
        |pairs AS (SELECT x.item AS a, y.item AS b2, count(*) AS c_pair
        |  FROM fb x JOIN fb y ON x.basket = y.basket AND x.item < y.item
        |  GROUP BY 1, 2
        |  HAVING count(*) >= ceil(0.2 * (SELECT n_baskets FROM n))),
        |bidir AS (
        |  SELECT a AS antecedent, b2 AS consequent, c_pair FROM pairs
        |  UNION ALL SELECT b2, a, c_pair FROM pairs),
        |r AS (SELECT t.antecedent, t.consequent, t.c_pair,
        |    round(t.c_pair * 1.0 / n.n_baskets, 6) AS support,
        |    round(t.c_pair * 1.0 / fa.c_item, 6) AS confidence,
        |    round(n.n_baskets * 1.0 * t.c_pair /
        |      (fa.c_item * 1.0 * fc.c_item), 6) AS lift
        |  FROM bidir t CROSS JOIN n
        |  JOIN freq fa ON t.antecedent = fa.item
        |  JOIN freq fc ON t.consequent = fc.item)
        |SELECT * FROM (SELECT *, CAST(row_number() OVER (
        |    ORDER BY lift DESC, antecedent, consequent) AS BIGINT) AS rank
        |  FROM r)
        |WHERE rank <= 30 ORDER BY rank""".stripMargin,

    "q129_scd2_join" ->
      """WITH d AS (SELECT user_id, event_id, ts,
        |    CASE WHEN value >= 30.0 THEN 'high' ELSE 'low' END AS band
        |  FROM events WHERE event_type = 'view'),
        |e AS (SELECT user_id, event_id, ts, band,
        |    lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM d),
        |ch AS (SELECT * FROM e WHERE rn = 1 OR prev IS DISTINCT FROM band),
        |h AS (SELECT user_id, band, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
        |  FROM ch),
        |f AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id,
        |  CAST(floor(extract(epoch FROM f.ts)) AS BIGINT) AS fact_ts,
        |  h.band, h.version,
        |  CAST(floor(extract(epoch FROM h.valid_from)) AS BIGINT) AS valid_from
        |FROM f LEFT JOIN h ON f.user_id = h.user_id
        |  AND h.valid_from <= f.ts AND (h.valid_to IS NULL OR h.valid_to > f.ts)
        |ORDER BY f.event_id""".stripMargin,

    "q130_grouping_sets" -> groupingSetsSql,

    "q125_interval_join" ->
      """WITH a AS (SELECT event_id AS idA, epoch_us(ts) AS sA,
        |    epoch_us(ts) + 60000000 AS eA FROM events
        |  WHERE event_type = 'view'),
        |b AS (SELECT event_id AS idB, epoch_us(ts) AS sB,
        |    epoch_us(ts) + 60000000 AS eB FROM events
        |  WHERE event_type = 'click')
        |SELECT idA, idB, least(eA, eB) - greatest(sA, sB) AS overlap_us
        |FROM a JOIN b ON sA < eB AND sB < eA
        |ORDER BY idA, idB""".stripMargin,

    "q120_cluster_longest" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT idA AS id FROM pairs UNION ALL SELECT idB FROM pairs)),
         |edges AS (SELECT idA AS a, idB AS b FROM pairs
         |          UNION SELECT idB, idA FROM pairs),
         |reach(src, dst) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |labels AS (SELECT src AS id, min(dst) AS component
         |           FROM reach GROUP BY src),
         |mem AS (SELECT l.component, d.doc_id, len(d.text) AS len
         |        FROM labels l JOIN docs d ON l.id = d.doc_id),
         |rr AS (SELECT component, doc_id, len,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY len DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY component) AS n_members
         |  FROM mem)
         |SELECT component, doc_id AS keep_id, CAST(len AS BIGINT) AS keep_len,
         |  n_members
         |FROM rr WHERE rn = 1 ORDER BY component""".stripMargin,

    "q121_repeated_spans" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000, substr(text, 1, 200) || ' ' || substr(text, 1, 200)
         |  FROM documents WHERE doc_id % 7 = 0),
         |norm AS (SELECT doc_id, $ntoksSql AS ntoks FROM corpus),
         |w AS (SELECT doc_id, unnest(range(len(ntoks) - 7)) AS pos, ntoks
         |      FROM norm WHERE len(ntoks) >= 8),
         |g AS (SELECT doc_id, pos,
         |        array_to_string(ntoks[pos+1:pos+8], ' ') AS g FROM w),
         |dup AS (SELECT g FROM g GROUP BY g HAVING count(*) > 1),
         |dp AS (SELECT doc_id, pos FROM g JOIN dup USING (g)),
         |m AS (SELECT doc_id, pos,
         |        lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
         |        lag(pos)  OVER (PARTITION BY doc_id ORDER BY pos) AS prv
         |      FROM dp),
         |agg AS (SELECT doc_id, count(*) AS n_dup_windows,
         |        sum(CASE WHEN nxt IS NULL THEN 8
         |                 ELSE least(8, nxt - pos) END) AS covered,
         |        sum(CASE WHEN prv IS NULL OR pos - prv > 8
         |                 THEN 1 ELSE 0 END) AS n_spans
         |      FROM m GROUP BY doc_id)
         |SELECT n.doc_id, CAST(len(n.ntoks) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  round(coalesce(a.covered, 0) * 1.0 /
         |        greatest(len(n.ntoks), 1), 6) AS dup_frac
         |FROM norm n LEFT JOIN agg a USING (doc_id)
         |ORDER BY n.doc_id""".stripMargin,

    "q99_quantile_filter" ->
      s"""${qualityCteSql(", lang")},
         |r AS (SELECT doc_id, lang, quality,
         |    percent_rank() OVER (PARTITION BY lang
         |      ORDER BY quality, doc_id) AS pr
         |  FROM q)
         |SELECT doc_id, lang, round(quality, 6) AS quality
         |FROM r WHERE pr >= 0.8 ORDER BY doc_id""".stripMargin,

    "q63_weighted_sample" ->
      s"""${qualityCteSql(", lang")}
         |SELECT doc_id, lang, round(quality, 6) AS quality FROM q
         |WHERE (${graft.ops.Sampling.keyHashSql("doc_id")}) % 10000
         |      < floor(quality * 5000)
         |ORDER BY doc_id""".stripMargin,

    "q64_token_budget" ->
      s"""${qualityCteSql(", lang")}
         |SELECT lang, doc_id, CAST(ntok AS BIGINT) AS n_tokens,
         |  CAST(cum AS BIGINT) AS cum_tokens
         |FROM (
         |  SELECT lang, doc_id, ntok,
         |    sum(ntok) OVER (PARTITION BY lang
         |      ORDER BY round(quality, 6) DESC, doc_id) AS cum
         |  FROM q) c
         |WHERE cum <= 3000
         |ORDER BY lang, doc_id""".stripMargin,

    "q59_repetition" ->
      s"""WITH norm AS (SELECT doc_id, $ntoksSql AS ntoks FROM documents),
         |g AS (SELECT doc_id,
         |    CASE WHEN len(ntoks) < 3 THEN []
         |      ELSE list_transform(range(len(ntoks) - 2),
         |             i -> ntoks[i+1] || ' ' || ntoks[i+2] || ' ' || ntoks[i+3]) END AS gs
         |  FROM norm),
         |rep AS (SELECT doc_id, CASE WHEN len(gs) = 0 THEN 0.0
         |    ELSE round(1.0 - len(list_distinct(gs)) * 1.0 / len(gs), 6) END AS dup_3gram_frac
         |  FROM g),
         |tok AS (SELECT doc_id, unnest(ntoks) AS tok FROM norm),
         |cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
         |top AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_token_frac
         |  FROM cnt GROUP BY doc_id)
         |SELECT n.doc_id, CAST(len(n.ntoks) AS BIGINT) AS n_tokens,
         |  r.dup_3gram_frac, t.top_token_frac
         |FROM norm n JOIN rep r USING (doc_id) JOIN top t USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q60_pii_redact" ->
      """WITH aug AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
        |  CASE WHEN doc_id % 2 = 0
        |       THEN ' or +1-555-010' || CAST(doc_id % 10 AS VARCHAR) ELSE '' END ||
        |  ' now' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |       len(regexp_extract_all(
        |         regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
        |         '\+[0-9][0-9-]{7,}')) AS BIGINT) AS n_pii,
        |  regexp_replace(
        |    regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
        |    '\+[0-9][0-9-]{7,}', '[PII]', 'g') AS redacted
        |FROM aug ORDER BY doc_id""".stripMargin,

    "q61_contamination" ->
      s"""WITH norm AS (SELECT doc_id, $ntoksSql AS ntoks FROM documents),
         |g AS (SELECT doc_id,
         |    list_distinct(CASE WHEN len(ntoks) < 3 THEN []
         |      ELSE list_transform(range(len(ntoks) - 2),
         |             i -> ntoks[i+1] || ' ' || ntoks[i+2] || ' ' || ntoks[i+3]) END) AS gs
         |  FROM norm),
         |pg AS (SELECT doc_id, unnest(gs) AS g FROM g),
         |bench AS (SELECT DISTINCT g FROM pg WHERE doc_id < 50)
         |SELECT doc_id, count(*) AS n_shared
         |FROM pg JOIN bench USING (g)
         |WHERE doc_id >= 50
         |GROUP BY doc_id HAVING count(*) >= 5
         |ORDER BY doc_id""".stripMargin,

    "q26_embedding_dups" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |p AS (SELECT a.vec_id AS idA, b.vec_id AS idB,
        |        CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) = 0 THEN 0.0
        |             ELSE list_dot_product(a.v, b.v) /
        |                  (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) END AS cosine
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT idA, idB, round(cosine, 6) AS cosine FROM p
        |WHERE cosine >= 0.4 ORDER BY idA, idB""".stripMargin,

    "q58_embedding_dups_lsh" ->
      """SELECT 'lsh_minus_planted_pairs' AS metric, CAST(0 AS BIGINT) AS value
        |UNION ALL SELECT 'n_planted_pairs', CAST(count(*) AS BIGINT)
        |           FROM embeddings
        |UNION ALL SELECT 'planted_minus_lsh_pairs', CAST(0 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q27_knn_bruteforce" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        CASE WHEN sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)) = 0 THEN 0.0
        |             ELSE list_dot_product(q.v, c.v) /
        |                  (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) END AS cosine
        |      FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cosine DESC, neighbor_id) AS "rank"
        |      FROM s)
        |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, "rank"
        |FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,

    "q28_knn_lsh" ->
      """SELECT 'n_queries' AS metric,
        |  CAST(count(DISTINCT vec_id) AS BIGINT) AS value
        |FROM embeddings WHERE vec_id < 10
        |UNION ALL SELECT 'recall_pct_ge_90', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q72_knn_ivf" ->
      """SELECT 'n_queries' AS metric, CAST(count(*) AS BIGINT) AS value
        |FROM embeddings WHERE vec_id < 20
        |UNION ALL SELECT 'top1_recall_pct_ge_90', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q91_lm_perplexity" ->
      s"""WITH tk AS (SELECT doc_id, $ntoksSql AS toks FROM documents),
         |d AS (SELECT doc_id, toks FROM tk WHERE len(toks) >= 2),
         |bi AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |             FROM d)),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
         |v AS (SELECT count(DISTINCT w2) AS v FROM bi)
         |SELECT doc_id,
         |  round(avg(ln((c12 + 0.5) / (c1 + 0.5 * v))), 4) AS avg_logprob,
         |  CAST(count(*) AS BIGINT) AS n_bigrams
         |FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q89_fuzzy_join" ->
      s"""WITH p0 AS (SELECT doc_id,
         |    array_to_string(list_slice($ntoksSql, 1, 3), ' ') AS s
         |  FROM documents),
         |p AS (SELECT doc_id, s FROM p0
         |      UNION ALL
         |      SELECT doc_id + 100000,
         |        concat(substring(s, 1, 2), '~', substring(s, 4, 1000000))
         |      FROM p0)
         |SELECT a.doc_id AS idA, b.doc_id AS idB,
         |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
         |FROM p a JOIN p b ON a.doc_id < b.doc_id
         |WHERE levenshtein(a.s, b.s) <= 1
         |ORDER BY idA, idB""".stripMargin,

    "q90_embedding_dedup_clustered" ->
      """SELECT vec_id FROM embeddings ORDER BY vec_id""",

    "q88_quality_checks" ->
      """WITH dup AS (
        |  SELECT o_orderkey FROM orders
        |  UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 997 = 0),
        |dk AS (SELECT 'dup_key' AS "check", o_orderkey AS key,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM dup GROUP BY o_orderkey HAVING count(*) > 1),
        |bad AS (SELECT o_orderkey,
        |          CASE WHEN o_orderkey % 499 = 0 THEN o_custkey + 10000000
        |               ELSE o_custkey END AS ck
        |        FROM orders),
        |orph AS (SELECT 'orphan' AS "check", o_orderkey AS key,
        |           CAST(1 AS BIGINT) AS n
        |         FROM bad ANTI JOIN customer ON ck = c_custkey)
        |SELECT * FROM dk UNION ALL SELECT * FROM orph
        |ORDER BY "check", key""".stripMargin,

    "q86_temperature_mix" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |t AS (SELECT sum(n) AS total FROM c),
         |w AS (SELECT lang, n, sqrt(n * 1.0 / total) AS wg FROM c, t),
         |sw AS (SELECT sum(wg) AS s FROM w),
         |p AS (SELECT lang,
         |        CAST(least(100, round(100.0 * (wg / s) * total / n)) AS BIGINT)
         |          AS pct
         |      FROM w, sw, t)
         |SELECT doc_id, d.lang FROM documents d JOIN p USING (lang)
         |WHERE (${graft.ops.Sampling.keyHashSql("doc_id")}) % 100 < pct
         |ORDER BY doc_id""".stripMargin,

    "q87_doc_chunking" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |st AS (SELECT doc_id, toks,
         |         unnest(range(0, CAST(len(toks) AS BIGINT), 8)) AS s
         |       FROM d WHERE len(toks) > 0)
         |SELECT doc_id, CAST(s // 8 AS BIGINT) AS chunk_id,
         |  array_to_string(list_slice(toks, s + 1, s + 16), ' ') AS chunk_text,
         |  CAST(least(16, len(toks) - s) AS BIGINT) AS n_chunk_tokens
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "q83_incremental_dedup" ->
      """SELECT 'banded_minus_exact_pairs' AS metric, CAST(0 AS BIGINT) AS value
        |UNION ALL SELECT 'n_batch_docs', CAST(count(*) AS BIGINT)
        |           FROM documents WHERE doc_id < 50
        |UNION ALL SELECT 'recall_pct_ge_90', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q84_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($ntoksSql) AS tok FROM documents),
         |ex AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
         |tot AS (SELECT count(*) AS n FROM tk)
         |SELECT 'guaranteed_all_in_sketch' AS metric, CAST(1 AS BIGINT) AS value
         |UNION ALL SELECT 'n_guaranteed_heavy',
         |  CAST((SELECT count(*) FROM ex WHERE c * 33 > (SELECT n FROM tot)) AS BIGINT)
         |UNION ALL SELECT 'n_total_tokens', CAST((SELECT n FROM tot) AS BIGINT)
         |ORDER BY metric""".stripMargin,

    "q85_profile" ->
      """SELECT 'o_custkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_val,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_val FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderkey) AS BIGINT),
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT),
        |  CAST(min(o_orderkey) AS VARCHAR),
        |  CAST(max(o_orderkey) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderpriority) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  CAST(min(o_orderpriority) AS VARCHAR),
        |  CAST(max(o_orderpriority) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderstatus) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  CAST(min(o_orderstatus) AS VARCHAR),
        |  CAST(max(o_orderstatus) AS VARCHAR) FROM orders
        |ORDER BY "column"""".stripMargin,

    "q82_ivf_index" ->
      """SELECT 'n_queries' AS metric, CAST(count(*) AS BIGINT) AS value
        |FROM embeddings WHERE vec_id < 20
        |UNION ALL SELECT 'top1_recall_pct_ge_90', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q81_sequence_pack" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    CAST(len($toksSql) AS BIGINT) AS toks FROM documents),
         |c AS (SELECT doc_id, lang, toks,
         |    sum(toks) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
         |  FROM d),
         |x AS (SELECT lang, (cum - toks) // 512 AS seq_id, toks FROM c)
         |SELECT lang, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens
         |FROM x GROUP BY lang, seq_id
         |ORDER BY lang, seq_id""".stripMargin,

    "q79_random_projection" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |dp AS (SELECT a.vec_id,
        |         list_dot_product(a.v, b.v) /
        |           (sqrt(list_dot_product(a.v, a.v)) *
        |            sqrt(list_dot_product(b.v, b.v))) AS tc
        |       FROM e a JOIN e b ON b.vec_id = a.vec_id + 200
        |       WHERE a.vec_id < 50)
        |SELECT 'distant_separated_pct_ge_90' AS metric,
        |       CAST(1 AS BIGINT) AS value
        |UNION ALL SELECT 'n_distant', CAST(count(*) AS BIGINT)
        |           FROM dp WHERE tc < 0.5
        |UNION ALL SELECT 'n_planted', CAST(count(*) AS BIGINT)
        |           FROM embeddings WHERE vec_id < 20
        |UNION ALL SELECT 'planted_preserved_all', CAST(1 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q80_normalize_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(
        |    'Cafe' || chr(769) || '  ' || text || '  ' || chr(8491)
        |    || ' troke')), '\s+', ' ', 'g')) AS norm_text
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q78_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q77_line_dedup" ->
      """WITH d AS (SELECT doc_id,
        |    concat('== SHARED HEADER ==', chr(10), text, chr(10),
        |           '(c) shared footer') AS text FROM documents),
        |s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
        |l AS (SELECT doc_id, unnest(ls) AS line,
        |             unnest(range(1, len(ls) + 1)) AS pos FROM s),
        |b AS (SELECT line FROM l GROUP BY line
        |      HAVING count(DISTINCT doc_id) >= 5),
        |k AS (SELECT doc_id, line, pos FROM l ANTI JOIN b USING (line)),
        |a AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
        |        AS clean_text FROM k GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text
        |FROM d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q76_semantic_dedup" ->
      """SELECT 'dup_recall_pct_ge_90' AS metric, CAST(1 AS BIGINT) AS value
        |UNION ALL SELECT 'n_exact_dropped', CAST(count(*) AS BIGINT)
        |           FROM embeddings
        |UNION ALL SELECT 'sem_dropped_minus_exact_dropped', CAST(0 AS BIGINT)
        |ORDER BY metric""".stripMargin,

    "q73_embedding_quantize" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |q AS (SELECT vec_id, v, scale,
        |    list_transform(v, x -> CAST(round(x /
        |      (CASE WHEN scale = 0 THEN 1.0 ELSE scale END)) AS BIGINT)) AS codes
        |  FROM s)
        |SELECT vec_id, round(scale, 9) AS scale,
        |  CAST(list_sum(list_transform(codes, (c, i) -> c * i)) AS BIGINT)
        |    AS q_checksum,
        |  CASE WHEN list_max(list_transform(codes,
        |         (c, i) -> abs(c * scale - v[i]))) <= scale * 0.5000001
        |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS recon_ok
        |FROM q ORDER BY vec_id""".stripMargin,

    "q29_events_window" ->
      """SELECT CAST(extract(epoch FROM date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q30_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CASE WHEN prev_ts IS NULL
        |       OR extract(epoch FROM ts) - extract(epoch FROM prev_ts) > 1800
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q31_multimodal_stats" ->
      """SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q62_frame_sample" ->
      """WITH d AS (SELECT doc_id, text,
        |    greatest(len(text) // 4, 1) AS stride
        |  FROM documents
        |  WHERE doc_id < 100 AND len(text) = octet_length(encode(text)))
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  substr(text, CAST(i * stride + 1 AS INT), 16) AS frame_str
        |FROM d, unnest(range(4)) AS u(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q32_orc_roundtrip" ->
      """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q33_text_roundtrip" ->
      """SELECT c_mktsegment, round(sum(c_acctbal), 2) AS sum_bal, count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q34_partition_prune" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE extract(year FROM o_orderdate) IN (1995, 1996)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q35_coln_convention" ->
      """SELECT lang AS _col0, count(*) AS "count"
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q68_rcfile_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CAST(n_nationkey AS BIGINT) AS tiny_v,
        |  CAST(n_nationkey * 100 AS BIGINT) AS small_v,
        |  CAST(n_nationkey AS BIGINT) * 1000000007 AS big_v,
        |  CAST(CAST(n_nationkey * 0.25 AS FLOAT) AS DOUBLE) AS fl_v,
        |  n_nationkey * 0.125 + len(n_name) AS dbl_v,
        |  CAST(CAST(CAST(n_nationkey * 123 + 45 AS DECIMAL(10,0)) / 100
        |       AS DECIMAL(12,2)) AS DOUBLE) AS dec_v,
        |  n_nationkey % 2 = 0 AS flag,
        |  n_name AS blob_str,
        |  n_name || ' | nation #' || CAST(n_nationkey AS VARCHAR) AS comment_s,
        |  CAST(extract(epoch FROM
        |    CAST(DATE '1995-01-01' + n_nationkey * INTERVAL 1 DAY AS TIMESTAMP))
        |    AS BIGINT) AS ts_epoch
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q69_dynpart_insert" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  CAST(0 AS BIGINT) AS n_filled
        |FROM orders WHERE o_orderkey < 5000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q70_relocate_readback" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  round(c_acctbal, 2) AS c_acctbal
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,

    "q71_regex_exclusion" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q74_compaction" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal,
        |  CAST(1 AS BIGINT) AS compacted_to_one_file
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q75_typed_source" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal
        |FROM supplier WHERE s_acctbal > 0
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q36_stream_windowed" ->
      """SELECT CAST(extract(epoch FROM date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q56_json_nested" ->
      """WITH sup3 AS (
        |  SELECT s_nationkey,
        |    list(struct_pack(id := s_suppkey, sname := s_name)
        |         ORDER BY s_suppkey) AS sups
        |  FROM (SELECT s_nationkey, s_suppkey, s_name,
        |          row_number() OVER (PARTITION BY s_nationkey
        |                             ORDER BY s_suppkey) AS rn
        |        FROM supplier) WHERE rn <= 3 GROUP BY s_nationkey)
        |SELECT n_nationkey,
        |  to_json(struct_pack(
        |    name := n_name,
        |    region := struct_pack(rk := n_regionkey, rname := r_name),
        |    sups := sups,
        |    meta := MAP{'name_len': len(n_name)},
        |    alt_name := CASE WHEN n_regionkey < 2 THEN n_name ELSE NULL END
        |  ))::VARCHAR AS js
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |LEFT JOIN sup3 ON n_nationkey = s_nationkey
        |ORDER BY n_nationkey""".stripMargin,

    "q37_json_render" ->
      """SELECT n_nationkey,
        |  to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name,
        |                      n_regionkey := n_regionkey))::VARCHAR AS js
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q53_sample_by_key" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE (${graft.ops.Sampling.keyHashSql("doc_id")}) % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    "q54_stratified_sample" ->
      s"""SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${graft.ops.Sampling.keyHashSql("doc_id")}, doc_id) AS rn
         |  FROM documents) r
         |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,

    "q51_outer_join" ->
      """SELECT coalesce(nk, snk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS snk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON nk = snk
        |ORDER BY nationkey""".stripMargin,

    "q52_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  first_value(o_orderkey) OVER wf AS first_key,
        |  last_value(o_orderkey) OVER wf AS last_key,
        |  count(*) OVER wf AS n_in_group,
        |  round(max(o_totalprice) OVER wf - min(o_totalprice) OVER wf, 2) AS price_range
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q50_corpus_filter" -> {
      val langs = TF.LangMarkers.map(_._1)
      val scores = TF.LangMarkers.map { case (lang, markers) =>
        s"len(list_filter(ntoks, x -> list_contains(${sqlList(markers)}, x))) AS s_$lang"
      }.mkString(",\n    ")
      val m     = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
      s"""WITH b AS (
         |  SELECT doc_id, source, text, $toksSql AS toks, $ntoksSql AS ntoks FROM documents),
         |m0 AS (
         |  SELECT doc_id, source,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / length(text) END AS pr,
         |    CASE WHEN len(ntoks) = 0 THEN 0.0
         |         ELSE len(list_filter(ntoks, x -> list_contains(${sqlList(TF.StopwordsEn)}, x))) * 1.0 / len(ntoks) END AS sw,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks) END AS mtl,
         |    length(text) AS n, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    $scores
         |  FROM b),
         |m1 AS (
         |  SELECT doc_id, source, n_tokens,
         |    least(sw * 4.0, 1.0) * 0.4 + greatest(1.0 - pr * 4.0, 0.0) * 0.3
         |      + (CASE WHEN n BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.25 END) * 0.15
         |      + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.25 END) * 0.15 AS quality,
         |    $m AS mm, s_en, s_es, s_fr, s_de, s_zh
         |  FROM m0),
         |m2 AS (
         |  SELECT doc_id, source, n_tokens, quality,
         |    CASE WHEN mm = 0 THEN 'und' ${cases.replace("= m ", "= mm ")} END AS lang_pred
         |  FROM m1)
         |SELECT source, count(*) AS n_kept,
         |  round(avg(quality), 6) AS avg_quality,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM m2
         |WHERE quality >= 0.5 AND lang_pred = 'en' AND n_tokens BETWEEN 10 AND 10000
         |GROUP BY source ORDER BY source""".stripMargin
    },

    "q49_json_parse" ->
      """SELECT event_type,
        |  count(CAST(json_extract(props, '$.k') AS INT)) AS n_k,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q47_setops_all" ->
      """SELECT nk, count(*) AS n_inter FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nk FROM supplier
        |) GROUP BY nk ORDER BY nk""".stripMargin,

    "q48_tfidf" ->
      s"""WITH terms AS (
         |  SELECT doc_id AS doc, unnest($ntoksSql) AS term FROM documents),
         |tf AS (SELECT doc, term, count(*) AS tf FROM terms GROUP BY doc, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         |sc AS (SELECT doc, term, tf,
         |         round(tf * ln(n.n * 1.0 / df.df), 6) AS tfidf_r
         |       FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT doc, term, tf, tfidf_r,
         |        row_number() OVER (PARTITION BY doc
         |                           ORDER BY tfidf_r DESC, term) AS rn
         |      FROM sc)
         |SELECT doc AS doc_id, term AS top_term, tf, tfidf_r AS tfidf
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q43_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q66_hll_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(1 AS BIGINT) AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q67_bloom_blocklist" ->
      """SELECT 'candidates_cover_true' AS metric, CAST(1 AS BIGINT) AS value
        |UNION ALL SELECT 'missed_true_rows', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'n_true_rows', (
        |  SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 7))
        |ORDER BY metric""".stripMargin,

    "q44_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q55_approx_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok,
        |  CAST(1 AS BIGINT) AS p99_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q45_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  substr(p_name, 1, 10) AS name_prefix,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '/' || p_type AS brand_type,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q46_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(extract(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(extract(month FROM o_orderdate) AS INT) AS mon,
        |  CAST(extract(day FROM o_orderdate) AS INT) AS dom,
        |  CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) AS days_since,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q41_topk_agg" ->
      """SELECT o_custkey, round(o_totalprice, 2) AS o_totalprice, o_orderkey,
        |  o_orderpriority, "rank"
        |FROM (SELECT o_custkey, o_totalprice, o_orderkey, o_orderpriority,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS "rank"
        |      FROM orders) r
        |WHERE "rank" <= 3 ORDER BY o_custkey, "rank"""".stripMargin,

    "q42_sql_cosine" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings WHERE vec_id < 20)
        |SELECT a.vec_id AS idA, b.vec_id AS idB,
        |  round(CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) = 0 THEN 0.0
        |        ELSE list_dot_product(a.v, b.v) /
        |             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) END, 6) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |ORDER BY idA, idB""".stripMargin,

    "q40_asof_join" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey AS last_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q57_asof_outer" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |       AND o.o_orderdate >= DATE '1998-07-01')
        |SELECT event_id, user_id, o_orderkey AS last_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q38_range_join" ->
      """WITH bands AS (
        |  SELECT CAST(i * 100000 AS DOUBLE) AS lo,
        |         CAST((i + 1) * 100000 AS DOUBLE) AS hi,
        |         'band' || i AS band
        |  FROM range(0, 6) r(i))
        |SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q39_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY coalesce(l_returnflag, 'ALL'), coalesce(l_linestatus, 'ALL')""".stripMargin,

    "q201_rep_aware_sample" -> {
      val kh = graft.ops.Sampling.keyHashSql("doc_id")
      s"""WITH base AS (SELECT doc_id, text, n_chars FROM documents),
         |hsel AS (SELECT doc_id, text, n_chars, ($kh) % 10 AS h FROM base),
         |corpus AS (
         |  SELECT doc_id, text, n_chars FROM base
         |  UNION ALL SELECT doc_id + 300000, text, n_chars FROM hsel WHERE h < 4
         |  UNION ALL SELECT doc_id + 400000, text, n_chars FROM hsel WHERE h < 4
         |  UNION ALL SELECT doc_id + 500000, text, n_chars FROM hsel WHERE h < 2
         |  UNION ALL SELECT doc_id + 600000, text, n_chars FROM hsel WHERE h < 2
         |  UNION ALL SELECT doc_id + 700000, text, n_chars FROM hsel WHERE h < 2),
         |r AS (SELECT text, n_chars,
         |    CAST(count(*) OVER (PARTITION BY text) AS BIGINT) AS fs,
         |    CAST(row_number() OVER (PARTITION BY text
         |      ORDER BY ($kh), doc_id) AS BIGINT) AS rn
         |  FROM corpus),
         |k AS (SELECT text, fs, n_chars,
         |    CASE WHEN rn <= CAST(ceil(sqrt(CAST(fs AS DOUBLE))) AS BIGINT)
         |      THEN 1 ELSE 0 END AS keep
         |  FROM r),
         |fam AS (SELECT text, fs,
         |    CAST(sum(keep) AS BIGINT) AS kept,
         |    CAST(sum(CASE WHEN keep = 1 THEN n_chars END) AS BIGINT) AS ck,
         |    CAST(sum(n_chars) AS BIGINT) AS ca
         |  FROM k GROUP BY 1, 2)
         |SELECT fs AS family_size, CAST(count(*) AS BIGINT) AS n_families,
         |  CAST(sum(fs) AS BIGINT) AS n_docs,
         |  CAST(sum(kept) AS BIGINT) AS kept_docs,
         |  CAST(sum(ck) AS BIGINT) AS chars_kept,
         |  CAST(sum(ca) AS BIGINT) AS chars_total
         |FROM fam GROUP BY fs ORDER BY family_size""".stripMargin
    },

    "q202_woe_iv" -> {
      val bad = "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"
      s"""WITH raw AS (
         |  SELECT 'quantity_band' AS feature,
         |    'q' || CAST(CAST(floor((l_quantity - 1) / 10.0) AS BIGINT) AS VARCHAR) AS bin,
         |    $bad AS bad FROM lineitem
         |  UNION ALL SELECT 'discount_pct',
         |    'd' || CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS VARCHAR),
         |    $bad FROM lineitem
         |  UNION ALL SELECT 'tax_pct',
         |    't' || CAST(CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS VARCHAR),
         |    $bad FROM lineitem
         |  UNION ALL SELECT 'price_band',
         |    'p' || CAST(CAST(least(floor(l_extendedprice / 20000.0), 4) AS BIGINT) AS VARCHAR),
         |    $bad FROM lineitem),
         |c AS (SELECT feature, bin,
         |    CAST(sum(1 - bad) AS BIGINT) AS n_good,
         |    CAST(sum(bad) AS BIGINT) AS n_bad
         |  FROM raw GROUP BY 1, 2),
         |sh AS (SELECT feature, bin, n_good, n_bad,
         |    (CAST(n_good AS DOUBLE) + 0.5) /
         |      CAST(sum(n_good) OVER (PARTITION BY feature) AS DOUBLE) AS gs,
         |    (CAST(n_bad AS DOUBLE) + 0.5) /
         |      CAST(sum(n_bad) OVER (PARTITION BY feature) AS DOUBLE) AS bs
         |  FROM c),
         |y AS (SELECT feature, bin, n_good, n_bad, gs, bs, ln(gs / bs) AS woe_raw
         |  FROM sh)
         |SELECT feature, bin, n_good, n_bad, round(woe_raw, 6) AS woe,
         |  round(sum((gs - bs) * woe_raw) OVER (PARTITION BY feature), 6) AS iv
         |FROM y ORDER BY feature, bin""".stripMargin
    },

    "q203_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |c AS (SELECT event_id AS cid, user_id AS cu, us AS cus FROM ev
        |  WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id AS tu, event_id AS tid, event_type AS channel,
        |    us AS tus FROM ev WHERE event_type <> 'purchase'),
        |p AS (SELECT cid, channel, tid, tus FROM c JOIN tch ON cu = tu
        |  AND tus <= cus AND tus > cus - 604800000000),
        |r AS (SELECT channel,
        |    row_number() OVER (PARTITION BY cid ORDER BY tus, tid) AS rna,
        |    row_number() OVER (PARTITION BY cid ORDER BY tus DESC, tid DESC) AS rnd,
        |    count(*) OVER (PARTITION BY cid) AS nt
        |  FROM p)
        |SELECT channel,
        |  CAST(sum(CASE WHEN rna = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
        |  CAST(sum(CASE WHEN rnd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
        |  round(sum(CAST(1.0 AS DOUBLE) / nt), 4) AS linear_credit,
        |  CAST(count(*) AS BIGINT) AS n_touches
        |FROM r GROUP BY 1 ORDER BY channel""".stripMargin,

    "q204_kcore" -> {
      // the engine's six peel rounds, unrolled: round i keeps edges whose
      // both endpoints had degree >= 2 in round i-1's edge set
      val rounds = (1 to 6).map { i =>
        s"""dg$i AS MATERIALIZED (SELECT v, count(*) AS d FROM (
           |    SELECT src AS v FROM e${i - 1} UNION ALL SELECT dst FROM e${i - 1})
           |  GROUP BY 1),
           |kp$i AS MATERIALIZED (SELECT v FROM dg$i WHERE d >= 2),
           |e$i AS MATERIALIZED (SELECT src, dst FROM e${i - 1}
           |  WHERE src IN (SELECT v FROM kp$i) AND dst IN (SELECT v FROM kp$i))""".stripMargin
      }.mkString(",\n")
      val sums = (0 to 6).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS round,
           |    (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM (
           |       SELECT src AS v FROM e$i UNION ALL SELECT dst FROM e$i)) AS n_vertices,
           |    (SELECT CAST(count(*) AS BIGINT) FROM e$i) AS n_edges""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH ev AS (SELECT user_id, event_id, ts,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS item FROM events),
         |tr AS (SELECT item,
         |    lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
         |  FROM ev),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, item) AS src, greatest(src, item) AS dst
         |  FROM tr WHERE src IS NOT NULL AND item IS NOT NULL AND src <> item),
         |$rounds,
         |traj AS ($sums)
         |SELECT round, n_vertices, n_edges,
         |  CAST(CASE WHEN round > 0 AND n_edges = lag(n_edges) OVER (ORDER BY round)
         |    THEN 1 ELSE 0 END AS BIGINT) AS converged
         |FROM traj ORDER BY round""".stripMargin
    },

    "q205_bfs_hops" -> {
      // eight min-plus relaxation rounds, unrolled over the symmetrized
      // distinct edge list; source = smallest vertex id
      val rounds = (1 to 8).map { i =>
        s"""s$i AS MATERIALIZED (SELECT n, CAST(min(dist) AS BIGINT) AS dist FROM (
           |    SELECT n, dist FROM s${i - 1}
           |    UNION ALL SELECT e.dst AS n, st.dist + 1 AS dist
           |      FROM s${i - 1} st JOIN eu e ON e.src = st.n)
           |  GROUP BY n)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (SELECT user_id, event_id, ts,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS item FROM events),
         |tr AS (SELECT item,
         |    lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
         |  FROM ev),
         |ed AS MATERIALIZED (SELECT src, item AS dst FROM tr
         |  WHERE src IS NOT NULL AND item IS NOT NULL AND src <> item),
         |eu AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM ed
         |    UNION ALL SELECT dst AS src, src AS dst FROM ed)),
         |s0 AS (SELECT (SELECT min(src) FROM eu) AS n, CAST(0 AS BIGINT) AS dist),
         |$rounds
         |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM s8 GROUP BY dist ORDER BY dist""".stripMargin
    },

    "q206_peak_concurrency" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        |sw AS (SELECT us * 2 + 1 AS key, 1 AS delta FROM ev
        |  UNION ALL SELECT (us + 60000000) * 2, -1 FROM ev),
        |k AS (SELECT key, CAST(sum(delta) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS starts
        |  FROM sw GROUP BY 1),
        |r AS (SELECT key, starts,
        |    CAST(sum(d) OVER (ORDER BY key) AS BIGINT) AS run FROM k)
        |SELECT strftime(make_timestamp(key // 2), '%Y-%m-%d') AS day,
        |  CAST(max(run) AS BIGINT) AS peak,
        |  CAST(sum(starts) AS BIGINT) AS n_starts
        |FROM r GROUP BY 1 ORDER BY day""".stripMargin,

    "q207_ewma_forecast" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day_num, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |sc AS (SELECT event_type, day_num AS d, v AS actual,
        |    lag(v) OVER (PARTITION BY event_type ORDER BY day_num) AS naive
        |  FROM daily),
        |f AS (SELECT s.event_type, s.d, s.actual, s.naive,
        |    sum(pow(0.7, CAST(s.d - 1 - p.day_num AS DOUBLE)) * p.v) /
        |      sum(pow(0.7, CAST(s.d - 1 - p.day_num AS DOUBLE))) AS f
        |  FROM sc s JOIN daily p ON p.event_type = s.event_type
        |    AND p.day_num >= s.d - 20 AND p.day_num < s.d
        |  WHERE s.naive IS NOT NULL
        |  GROUP BY 1, 2, 3, 4)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  round(avg(abs(f - actual)), 4) AS mae_ewma,
        |  round(avg(abs(naive - actual)), 4) AS mae_naive
        |FROM f GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q208_golden_record" -> {
      val kh = graft.ops.Sampling.keyHashSql("c_custkey")
      s"""WITH base AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
         |    ($kh) % 10 AS h FROM customer),
         |v AS (SELECT c_custkey, CAST(1 AS BIGINT) AS sys, c_name,
         |    c_mktsegment, c_acctbal FROM base
         |  UNION ALL SELECT c_custkey, 2, NULL, 'UPDATED ' || c_mktsegment,
         |    NULL FROM base WHERE h < 5
         |  UNION ALL SELECT c_custkey, 3, 'MERGED ' || c_name, NULL,
         |    c_acctbal + 100.0 FROM base WHERE h < 2),
         |g AS (SELECT c_custkey, sys,
         |    first_value(c_name IGNORE NULLS) OVER wfull AS g_name,
         |    first_value(c_mktsegment IGNORE NULLS) OVER wfull AS g_segment,
         |    first_value(c_acctbal IGNORE NULLS) OVER wfull AS g_acctbal,
         |    first_value(CASE WHEN c_name IS NOT NULL THEN sys END
         |      IGNORE NULLS) OVER wfull AS name_src,
         |    first_value(CASE WHEN c_mktsegment IS NOT NULL THEN sys END
         |      IGNORE NULLS) OVER wfull AS seg_src,
         |    first_value(CASE WHEN c_acctbal IS NOT NULL THEN sys END
         |      IGNORE NULLS) OVER wfull AS bal_src,
         |    row_number() OVER (PARTITION BY c_custkey ORDER BY sys DESC) AS rn
         |  FROM v
         |  WINDOW wfull AS (PARTITION BY c_custkey ORDER BY sys DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |SELECT c_custkey, g_name, g_segment,
         |  round(g_acctbal, 2) AS g_acctbal,
         |  CAST(name_src AS BIGINT) AS name_src,
         |  CAST(seg_src AS BIGINT) AS seg_src,
         |  CAST(bal_src AS BIGINT) AS bal_src
         |FROM g WHERE rn = 1 AND ($kh) % 20 = 0
         |ORDER BY c_custkey""".stripMargin
    },

    "q209_theil_sen" ->
      """WITH monthly AS (SELECT p_brand,
        |    CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
        |      AS BIGINT) AS m,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        |tsj AS (SELECT a.p_brand, quantile_cont(
        |      CAST(b.cents - a.cents AS DOUBLE) / CAST(b.m - a.m AS DOUBLE),
        |      0.5) AS ts_slope
        |  FROM monthly a JOIN monthly b
        |    ON a.p_brand = b.p_brand AND a.m < b.m
        |  GROUP BY 1),
        |ols AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_months,
        |    CAST(sum(m) AS BIGINT) AS sx, CAST(sum(cents) AS BIGINT) AS sy,
        |    CAST(sum(m * cents) AS BIGINT) AS sxy,
        |    CAST(sum(m * m) AS BIGINT) AS sxx
        |  FROM monthly GROUP BY 1)
        |SELECT o.p_brand, o.n_months, round(t.ts_slope, 4) AS ts_slope,
        |  round(CAST(o.n_months * o.sxy - o.sx * o.sy AS DOUBLE) /
        |    CAST(o.n_months * o.sxx - o.sx * o.sx AS DOUBLE), 4) AS ols_slope
        |FROM ols o JOIN tsj t ON o.p_brand = t.p_brand
        |ORDER BY o.p_brand""".stripMargin,

    "q210_copurchase" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n_orders
        |  FROM baskets),
        |bn AS (SELECT b, CAST(count(*) AS BIGINT) AS nb FROM baskets
        |  GROUP BY 1),
        |pairs AS (SELECT x.b AS b1, y.b AS b2,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM baskets x JOIN baskets y ON x.ok = y.ok AND x.b < y.b
        |  GROUP BY 1, 2)
        |SELECT b1, b2, n_ab,
        |  round(CAST(n_ab AS DOUBLE) * n.n_orders /
        |    (CAST(a.nb AS DOUBLE) * CAST(c.nb AS DOUBLE)), 4) AS lift
        |FROM pairs JOIN bn a ON a.b = b1 JOIN bn c ON c.b = b2
        |  CROSS JOIN n
        |ORDER BY n_ab DESC, b1, b2 LIMIT 20""".stripMargin,

    "q211_rev_rec" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
        |      AS BIGINT) AS m0
        |  FROM orders),
        |sp AS (SELECT m0 + i AS month_idx,
        |    cents // 3 + CASE WHEN i < cents % 3 THEN 1 ELSE 0 END AS amt
        |  FROM o CROSS JOIN (SELECT CAST(range AS BIGINT) AS i
        |    FROM range(3)) t)
        |SELECT month_idx, CAST(sum(amt) AS BIGINT) AS recognized_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM sp GROUP BY 1 ORDER BY month_idx""".stripMargin,

    "q265_mde_power" ->
      """WITH c AS (SELECT
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm,
        |    CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END AS hit
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(hit) AS BIGINT) AS hits,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM c)
        |SELECT n1, n2,
        |  round(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pooled_rate,
        |  round((1.96 + 0.8416) * sqrt(
        |    (CAST(hits AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (1.0 - CAST(hits AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 6)
        |    AS mde_80,
        |  round((1.96 + 1.2816) * sqrt(
        |    (CAST(hits AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (1.0 - CAST(hits AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 6)
        |    AS mde_90
        |FROM m""".stripMargin,

    "q266_design_effect" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS ni,
        |    sum(value) AS si, sum(value * value) AS qi
        |  FROM events GROUP BY 1),
        |m AS (SELECT sum(ni) AS nn, CAST(count(*) AS DOUBLE) AS k,
        |    sum(ni * ni) AS n2, sum(si) AS s, sum(qi) AS q,
        |    sum(si * si / ni) AS sb
        |  FROM u),
        |d AS (SELECT CAST(nn AS BIGINT) AS n_events, CAST(k AS BIGINT)
        |      AS n_users,
        |    (q - sb) / (nn - k) AS msw,
        |    (sb - s * s / nn) / (k - 1) AS msb,
        |    (nn - n2 / nn) / (k - 1) AS n0
        |  FROM m)
        |SELECT n_events, n_users, round(n0, 4) AS n0,
        |  round((msb - msw) / (msb + (n0 - 1) * msw), 6) AS icc,
        |  round(1.0 + (n0 - 1) * ((msb - msw) / (msb + (n0 - 1) * msw)), 4)
        |    AS deff
        |FROM d""".stripMargin,

    "q267_neyman_allocation" ->
      """WITH st AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS q
        |  FROM documents GROUP BY 1),
        |sd AS (SELECT lang, n,
        |    sqrt(CAST(q - s * s / n AS DOUBLE) / CAST(n - 1 AS DOUBLE))
        |      AS sd
        |  FROM st),
        |tot AS (SELECT sum(CAST(n AS DOUBLE) * sd) AS z FROM sd)
        |SELECT lang, n, round(sd, 4) AS sd,
        |  round(CAST(n AS DOUBLE) * sd / z, 6) AS neyman_share,
        |  CAST(floor(100 * (CAST(n AS DOUBLE) * sd / z) + 0.5) AS BIGINT)
        |    AS alloc_100
        |FROM sd CROSS JOIN tot ORDER BY lang""".stripMargin,

    "q268_spearman" ->
      """WITH per AS (SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |      + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1),
        |rx AS (SELECT l_suppkey, CAST(row_number() OVER
        |    (ORDER BY rev_cents DESC, l_suppkey) AS BIGINT) AS rx FROM per),
        |ry AS (SELECT l_suppkey, CAST(row_number() OVER
        |    (ORDER BY qty DESC, l_suppkey) AS BIGINT) AS ry FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
        |  round(1.0 - 6.0 * CAST(sum((rx - ry) * (rx - ry)) AS DOUBLE) /
        |    (CAST(count(*) AS DOUBLE) *
        |      (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) - 1.0)),
        |    6) AS spearman_rho
        |FROM rx JOIN ry USING (l_suppkey)""".stripMargin,

    "q269_welch_ttest" ->
      """WITH c AS (SELECT
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)
        |      AS s1,
        |    CAST(sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END)
        |      AS BIGINT) AS q1,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT)
        |      AS s2,
        |    CAST(sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END)
        |      AS BIGINT) AS q2
        |  FROM c),
        |d AS (SELECT n1, n2,
        |    CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / n1) / (n1 - 1) AS v1,
        |    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / n2) / (n2 - 1) AS v2
        |  FROM m)
        |SELECT n1, n2,
        |  round(m1 / 100.0, 4) AS mean_building,
        |  round(m2 / 100.0, 4) AS mean_machinery,
        |  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS welch_t,
        |  round(pow(v1 / n1 + v2 / n2, 2.0) /
        |    (pow(v1 / n1, 2.0) / (n1 - 1) + pow(v2 / n2, 2.0) / (n2 - 1)),
        |    2) AS welch_df
        |FROM d""".stripMargin,

    "q270_js_divergence" ->
      """WITH per AS (SELECT lang,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM per),
        |pq AS (SELECT CAST(ca AS DOUBLE) / na AS p,
        |    CAST(cb AS DOUBLE) / nb AS q
        |  FROM per CROSS JOIN tot),
        |terms AS (SELECT
        |    CASE WHEN p > 0.0 THEN p * ln(p / ((p + q) / 2.0))
        |      ELSE 0.0 END AS tp,
        |    CASE WHEN q > 0.0 THEN q * ln(q / ((p + q) / 2.0))
        |      ELSE 0.0 END AS tq
        |  FROM pq),
        |j AS (SELECT CAST(count(*) AS BIGINT) AS n_langs,
        |    round((sum(tp) + sum(tq)) / 2.0, 6) AS js_nats FROM terms)
        |SELECT n_langs, js_nats, round(js_nats / ln(2.0), 6) AS js_bits
        |FROM j""".stripMargin,

    "q271_bh_fdr" ->
      """WITH tot AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS h
        |  FROM customer),
        |per AS (SELECT c_mktsegment, CAST(count(*) AS DOUBLE) AS n1,
        |    CAST(sum(CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS h1
        |  FROM customer GROUP BY 1),
        |z AS (SELECT c_mktsegment,
        |    (h1 / n1 - (h - h1) / (n - n1)) /
        |      sqrt((h / n) * (1.0 - h / n) * (1.0 / n1 + 1.0 / (n - n1)))
        |      AS z
        |  FROM per CROSS JOIN tot),
        |xt AS (SELECT c_mktsegment, z, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM z),
        |p AS (SELECT c_mktsegment, z,
        |    (0.254829592 * t - 0.284496736 * t * t
        |      + 1.421413741 * t * t * t - 1.453152027 * t * t * t * t
        |      + 1.061405429 * t * t * t * t * t) * exp(-x * x) AS p
        |  FROM xt),
        |ranked AS (SELECT c_mktsegment, z, p,
        |    CAST(row_number() OVER (ORDER BY p, c_mktsegment) AS BIGINT)
        |      AS rk
        |  FROM p),
        |cut AS (SELECT coalesce(max(CASE WHEN p <= CAST(rk AS DOUBLE) /
        |      5.0 * 0.10 THEN rk END), 0) AS k
        |  FROM ranked)
        |SELECT c_mktsegment, round(z, 4) AS z,
        |  round(p, 6) AS p_two_sided, rk AS p_rank,
        |  round(CAST(rk AS DOUBLE) / 5.0 * 0.10, 4) AS bh_crit,
        |  rk <= k AS rejected
        |FROM ranked CROSS JOIN cut ORDER BY c_mktsegment""".stripMargin,

    "q272_burstiness" ->
      """WITH g AS (SELECT event_type,
        |    (epoch_us(ts) - epoch_us(lag(ts, 1) OVER
        |      (PARTITION BY user_id, event_type ORDER BY ts, event_id)))
        |      // 60000000 AS gap_min
        |  FROM events),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(gap_min) AS BIGINT) AS sg,
        |    CAST(sum(gap_min * gap_min) AS BIGINT) AS qg
        |  FROM g WHERE gap_min IS NOT NULL GROUP BY 1
        |  HAVING count(*) > 1),
        |d AS (SELECT event_type, n_gaps,
        |    CAST(sg AS DOUBLE) / n_gaps AS mu,
        |    sqrt((CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) *
        |      CAST(sg AS DOUBLE) / n_gaps) / (n_gaps - 1)) AS sd
        |  FROM m)
        |SELECT event_type, n_gaps, round(mu, 4) AS mean_gap_min,
        |  round(sd, 4) AS sd_gap_min,
        |  round((sd - mu) / (sd + mu), 6) AS burstiness
        |FROM d ORDER BY event_type""".stripMargin,

    "q273_cramers_v" ->
      """WITH joint AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM customer GROUP BY 1, 2),
        |rm AS (SELECT c_nationkey, CAST(sum(o) AS BIGINT) AS rn
        |  FROM joint GROUP BY 1),
        |cm AS (SELECT c_mktsegment, CAST(sum(o) AS BIGINT) AS cn
        |  FROM joint GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n,
        |    CAST(count(DISTINCT c_nationkey) AS BIGINT) AS r,
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS c
        |  FROM joint),
        |grid AS (SELECT n, r, c,
        |    CAST(coalesce(o, 0) AS DOUBLE) AS obs,
        |    CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / n AS e
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN joint USING (c_nationkey, c_mktsegment)
        |  CROSS JOIN tot)
        |SELECT CAST(any_value(n) AS BIGINT) AS n,
        |  any_value(r) AS n_nations, any_value(c) AS n_segments,
        |  any_value((r - 1) * (c - 1)) AS dof,
        |  round(sum((obs - e) * (obs - e) / e), 4) AS chi2,
        |  round(sqrt(sum((obs - e) * (obs - e) / e) /
        |    (any_value(n) * CAST(least(any_value(r) - 1, any_value(c) - 1)
        |      AS DOUBLE))), 6) AS cramers_v
        |FROM grid""".stripMargin,

    "q274_heaps_law" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text),
        |      '[^a-z0-9]+')) AS tokn FROM documents),
        |tkc AS (SELECT doc_id, tokn FROM tok WHERE tokn <> ''),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |rkd AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id)
        |    AS BIGINT) AS rk FROM documents),
        |cps AS (SELECT CAST(x + 1 AS BIGINT) AS k, doc_id AS cp
        |  FROM range(10) t(x) CROSS JOIN nd
        |  JOIN rkd ON rkd.rk = (CAST(x + 1 AS BIGINT) * nd + 9) // 10),
        |dt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tc
        |  FROM tkc GROUP BY 1),
        |ft AS (SELECT tokn, CAST(min(doc_id) AS BIGINT) AS fd
        |  FROM tkc GROUP BY 1),
        |nk AS (SELECT k, CAST(sum(tc) AS BIGINT) AS nn
        |  FROM dt CROSS JOIN cps WHERE doc_id <= cp GROUP BY 1),
        |vk AS (SELECT k, CAST(count(*) AS BIGINT) AS vv
        |  FROM ft CROSS JOIN cps WHERE fd <= cp GROUP BY 1),
        |xy AS (SELECT ln(CAST(nn AS DOUBLE)) AS x,
        |    ln(CAST(vv AS DOUBLE)) AS y FROM nk JOIN vk USING (k)),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |    AS heaps_beta,
        |  round(exp((sy - sx * ((n * sxy - sx * sy) /
        |    (n * sxx - sx * sx))) / n), 4) AS heaps_k
        |FROM a""".stripMargin,

    "q275_hurst_exponent" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      // 100 AS BIGINT) AS units
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(sum(units) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS n FROM daily),
        |idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
        |      AS i, units - tot // n AS c
        |  FROM daily CROSS JOIN st),
        |blk AS (SELECT m, (i - 1) // m AS blk,
        |    CAST(count(*) AS BIGINT) AS cnt, CAST(sum(c) AS BIGINT) AS bs
        |  FROM idx CROSS JOIN (SELECT CAST(unnest([1, 2, 4, 8, 16])
        |    AS BIGINT) AS m) g
        |  GROUP BY 1, 2 HAVING count(*) = m),
        |vm AS (SELECT m, CAST(count(*) AS BIGINT) AS kb,
        |    CAST(sum(bs) AS BIGINT) AS ss,
        |    CAST(sum(bs * bs) AS BIGINT) AS qq
        |  FROM blk GROUP BY 1),
        |xy AS (SELECT ln(CAST(m AS DOUBLE)) AS x,
        |    ln(((CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) *
        |      CAST(ss AS DOUBLE) / kb) / (kb - 1)) /
        |      (CAST(m AS DOUBLE) * CAST(m AS DOUBLE))) AS y
        |  FROM vm),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_scales,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |    AS var_slope,
        |  round(1.0 + ((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 2.0,
        |    4) AS hurst_h
        |FROM a""".stripMargin,

    "q276_runs_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(sum(cents) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS n FROM daily),
        |sg AS (SELECT day, n,
        |    CASE WHEN cents * n > tot THEN 1 ELSE 0 END AS above
        |  FROM daily CROSS JOIN st),
        |lagged AS (SELECT n, above,
        |    lag(above, 1) OVER (ORDER BY day) AS prev
        |  FROM sg),
        |r AS (SELECT CAST(any_value(n) AS BIGINT) AS n_days,
        |    CAST(sum(above) AS BIGINT) AS n1,
        |    CAST(any_value(n) - sum(above) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN prev IS NULL OR prev <> above THEN 1
        |      ELSE 0 END) AS BIGINT) AS runs
        |  FROM lagged),
        |m AS (SELECT n_days, n1, n2, runs,
        |    1.0 + 2.0 * n1 * n2 / CAST(n_days AS DOUBLE) AS mu,
        |    2.0 * n1 * n2 * (2.0 * n1 * n2 - n_days) /
        |      (CAST(n_days AS DOUBLE) * n_days * (n_days - 1)) AS s2
        |  FROM r)
        |SELECT n_days, n1, n2, runs, round(mu, 4) AS expected_runs,
        |  round((CAST(runs AS DOUBLE) - mu) / sqrt(s2), 6) AS z
        |FROM m""".stripMargin,

    "q277_dsir_weights" ->
      s"""WITH toks AS (SELECT doc_id, lang, lang = 'en' AS tgt,
        |    unnest($ntoksSql) AS tok FROM documents),
        |counts AS (SELECT tok,
        |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS cr
        |  FROM toks GROUP BY 1 HAVING count(*) >= 5),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS v,
        |    CAST(sum(ct) AS BIGINT) AS nt,
        |    CAST(sum(cr) AS BIGINT) AS nr FROM counts),
        |llr AS (SELECT tok,
        |    ln(CAST(ct + 1 AS DOUBLE) / (nt + v)) -
        |      ln(CAST(cr + 1 AS DOUBLE) / (nr + v)) AS llr
        |  FROM counts CROSS JOIN sums),
        |dtc AS (SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM toks WHERE NOT tgt GROUP BY 1, 2, 3),
        |scored AS (SELECT doc_id, lang, sum(c * llr) / sum(c) AS w
        |  FROM dtc JOIN llr USING (tok) GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  round(avg(w), 6) AS avg_w
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,

    "q278_mann_whitney" ->
      """WITH pool AS (SELECT
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    c_mktsegment = 'BUILDING' AS is_a
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |byval AS (SELECT cents,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM pool GROUP BY 1),
        |cum AS (SELECT *, CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT)
        |    AS run FROM byval),
        |agg AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
        |    CAST(sum(nb) AS BIGINT) AS n_b,
        |    CAST(sum(na * (2 * (run - cnt) + cnt + 1)) AS BIGINT) AS rs2,
        |    CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
        |  FROM cum)
        |SELECT n_a, n_b,
        |  CAST(rs2 - n_a * (n_a + 1) AS BIGINT) AS u2, tie_term,
        |  round((rs2 - n_a * (n_a + 1)) / 2.0 / (n_a * n_b), 6) AS auc,
        |  round(((rs2 - n_a * (n_a + 1)) / 2.0 - n_a * n_b / 2.0) /
        |    sqrt(n_a * n_b / 12.0 * ((n_a + n_b + 1) -
        |      tie_term / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))),
        |    6) AS z
        |FROM agg""".stripMargin,

    "q279_periodogram" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
        |idx AS (SELECT n,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS tpos
        |  FROM daily),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS d,
        |    CAST(sum(n) AS BIGINT) AS tot FROM idx),
        |ks AS (SELECT CAST(unnest(range(1, 367)) AS BIGINT) AS k),
        |terms AS (SELECT k, d,
        |    CAST(n * d - tot AS DOUBLE) / d AS yc,
        |    2 * pi() * k * tpos / CAST(d AS DOUBLE) AS theta
        |  FROM idx CROSS JOIN st CROSS JOIN ks),
        |pw AS (SELECT k, any_value(d) AS d,
        |    sum(yc * cos(theta)) AS a, sum(yc * sin(theta)) AS b
        |  FROM terms GROUP BY 1)
        |SELECT k, round(CAST(d AS DOUBLE) / k, 2) AS period_days,
        |  round((a * a + b * b) * 2 / d, 2) AS pwr
        |FROM pw ORDER BY pwr DESC, k LIMIT 5""".stripMargin,

    "q280_logrank_test" ->
      """WITH mx AS (SELECT max(o_orderdate) AS mx FROM orders),
        |cust AS (SELECT o_custkey, c_mktsegment,
        |    CAST(datediff('day', min(o_orderdate), max(o_orderdate))
        |      AS BIGINT) AS dur,
        |    datediff('day', max(o_orderdate), any_value(mx.mx)) > 90
        |      AS event,
        |    c_mktsegment = 'BUILDING' AS is_a
        |  FROM orders JOIN customer ON o_custkey = c_custkey CROSS JOIN mx
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  GROUP BY o_custkey, c_mktsegment),
        |bydur AS (SELECT dur, CAST(count(*) AS BIGINT) AS c_all,
        |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_all,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN is_a AND event THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d_a
        |  FROM cust GROUP BY 1),
        |cum AS (SELECT *,
        |    CAST(sum(c_all) OVER (ORDER BY dur) AS BIGINT) AS cum_all,
        |    CAST(sum(c_a) OVER (ORDER BY dur) AS BIGINT) AS cum_a
        |  FROM bydur),
        |tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_total,
        |    CAST(sum(c_a) AS BIGINT) AS n_a_total FROM bydur),
        |risk AS (SELECT dur, d_all, d_a, n_a_total,
        |    n_total - n_a_total AS n_b_total,
        |    n_total - (cum_all - c_all) AS n_r,
        |    n_a_total - (cum_a - c_a) AS n_ra
        |  FROM cum CROSS JOIN tot
        |  WHERE d_all > 0 AND n_total - (cum_all - c_all) > 1),
        |agg AS (SELECT any_value(n_a_total) AS n_a,
        |    any_value(n_b_total) AS n_b,
        |    CAST(sum(d_a) AS BIGINT) AS observed_a,
        |    sum(d_all * n_ra / CAST(n_r AS DOUBLE)) AS e1,
        |    sum(d_all * (n_ra / CAST(n_r AS DOUBLE)) *
        |      (1.0 - n_ra / CAST(n_r AS DOUBLE)) *
        |      (n_r - d_all) / (n_r - 1)) AS v1
        |  FROM risk)
        |SELECT n_a, n_b, observed_a, round(e1, 4) AS expected_a,
        |  round(pow(observed_a - e1, 2) / v1, 4) AS chi2,
        |  round((observed_a - e1) / sqrt(v1), 4) AS z
        |FROM agg""".stripMargin,

    "q281_modularity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem),
        |e0 AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |eb AS (SELECT e0.*, ba.p_brand AS b1, bb.p_brand AS b2
        |  FROM e0 JOIN part ba ON p1 = ba.p_partkey
        |    JOIN part bb ON p2 = bb.p_partkey),
        |ends AS (SELECT b1 AS b, b2 AS other, w FROM eb
        |  UNION ALL SELECT b2 AS b, b1 AS other, w FROM eb),
        |wt AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM e0)
        |SELECT b AS p_brand, CAST(sum(w) AS BIGINT) AS k_c,
        |  CAST(sum(CASE WHEN b = other THEN w ELSE 0 END) / 2 AS BIGINT)
        |    AS w_intra,
        |  round(sum(CASE WHEN b = other THEN w ELSE 0 END) /
        |      (2.0 * any_value(w_total)) -
        |    pow(sum(w) / (2.0 * any_value(w_total)), 2), 6) AS q_contrib
        |FROM ends CROSS JOIN wt GROUP BY 1 ORDER BY 1""".stripMargin,

    "q282_abc_xyz" ->
      """WITH li AS (SELECT l_partkey,
        |    date_trunc('month', l_shipdate) AS mth,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |monthly AS (SELECT l_partkey, mth, CAST(sum(qty) AS BIGINT) AS s_m,
        |    CAST(sum(cents) AS BIGINT) AS c_m
        |  FROM li GROUP BY 1, 2),
        |months AS (SELECT CAST(count(DISTINCT mth) AS BIGINT) AS m
        |  FROM li),
        |parts AS (SELECT l_partkey, CAST(sum(s_m) AS BIGINT) AS s,
        |    CAST(sum(s_m * s_m) AS BIGINT) AS ss,
        |    CAST(sum(c_m) AS BIGINT) AS cents
        |  FROM monthly GROUP BY 1),
        |ranked AS (SELECT *, CAST(sum(cents)
        |      OVER (ORDER BY cents DESC, l_partkey) AS BIGINT) AS cum
        |  FROM parts),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS ctot FROM parts)
        |SELECT CASE WHEN 5 * cum <= 4 * ctot THEN 'A'
        |    WHEN 20 * cum <= 19 * ctot THEN 'B' ELSE 'C' END AS abc,
        |  CASE WHEN 4 * (m * ss - s * s) <= s * s THEN 'X'
        |    WHEN m * ss - s * s <= s * s THEN 'Y' ELSE 'Z' END AS xyz,
        |  CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM ranked CROSS JOIN tot CROSS JOIN months
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q316_esd_outliers" ->
      """WITH m0 AS (SELECT CAST(year(o_orderdate) * 100 +
        |      month(o_orderdate) AS BIGINT) AS mid,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      // 100000 AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    CAST(sum(v * v) AS BIGINT) AS ss FROM m0),
        |sc1 AS (SELECT mid, v, round(abs(v - CAST(s AS DOUBLE) / n) /
        |      sqrt(CAST(n * ss - s * s AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * (n - 1))), 6) AS r_stat,
        |    row_number() OVER (ORDER BY round(abs(v - CAST(s AS DOUBLE)
        |      / n) / sqrt(CAST(n * ss - s * s AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * (n - 1))), 6) DESC, mid) AS rk
        |  FROM m0 CROSS JOIN s1),
        |o1 AS (SELECT CAST(1 AS BIGINT) AS round, mid AS month_id,
        |    v AS value_kusd, r_stat FROM sc1 WHERE rk = 1),
        |m1 AS (SELECT mid, v FROM sc1 WHERE rk <> 1),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    CAST(sum(v * v) AS BIGINT) AS ss FROM m1),
        |sc2 AS (SELECT mid, v, round(abs(v - CAST(s AS DOUBLE) / n) /
        |      sqrt(CAST(n * ss - s * s AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * (n - 1))), 6) AS r_stat,
        |    row_number() OVER (ORDER BY round(abs(v - CAST(s AS DOUBLE)
        |      / n) / sqrt(CAST(n * ss - s * s AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * (n - 1))), 6) DESC, mid) AS rk
        |  FROM m1 CROSS JOIN s2),
        |o2 AS (SELECT CAST(2 AS BIGINT) AS round, mid, v, r_stat
        |  FROM sc2 WHERE rk = 1),
        |m2 AS (SELECT mid, v FROM sc2 WHERE rk <> 1),
        |s3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    CAST(sum(v * v) AS BIGINT) AS ss FROM m2),
        |sc3 AS (SELECT mid, v, round(abs(v - CAST(s AS DOUBLE) / n) /
        |      sqrt(CAST(n * ss - s * s AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * (n - 1))), 6) AS r_stat,
        |    row_number() OVER (ORDER BY round(abs(v - CAST(s AS DOUBLE)
        |      / n) / sqrt(CAST(n * ss - s * s AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * (n - 1))), 6) DESC, mid) AS rk
        |  FROM m2 CROSS JOIN s3),
        |o3 AS (SELECT CAST(3 AS BIGINT) AS round, mid, v, r_stat
        |  FROM sc3 WHERE rk = 1)
        |SELECT round, month_id, value_kusd, r_stat FROM o1
        |UNION ALL SELECT * FROM o2 UNION ALL SELECT * FROM o3
        |ORDER BY round""".stripMargin,

    "q317_quantile_norm" ->
      """WITH geo AS (SELECT r_name,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x,
        |    c_custkey
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |ranked AS (SELECT r_name, x,
        |    CAST(row_number() OVER (PARTITION BY r_name
        |      ORDER BY x * 16777216 + c_custkey) AS BIGINT) AS rk
        |  FROM geo),
        |nr AS (SELECT r_name, CAST(count(*) AS BIGINT) AS nr
        |  FROM geo GROUP BY 1),
        |cuts AS (SELECT r_name, d, x
        |  FROM ranked JOIN nr USING (r_name)
        |  JOIN (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS d)
        |    ON rk = (d * nr) // 10),
        |tgt AS (SELECT d, CAST(sum(x) AS DOUBLE) / count(*) AS tgt
        |  FROM cuts GROUP BY 1)
        |SELECT r_name, d AS decile,
        |  round(x / 100.0, 2) AS value_dollars,
        |  round(tgt / 100, 2) AS target_dollars,
        |  round((x - tgt) / 100, 2) AS shift_dollars
        |FROM cuts JOIN tgt USING (d)
        |ORDER BY r_name, decile""".stripMargin,

    "q318_order_reconciliation" ->
      """WITH lines AS (SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) *
        |      (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS calc
        |  FROM lineitem GROUP BY 1),
        |recon AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS stated,
        |    calc - CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      AS gap,
        |    round(CAST(abs(calc - CAST(floor(o_totalprice * 100 + 0.5)
        |      AS BIGINT)) AS DOUBLE) /
        |      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 6)
        |      AS rel_gap
        |  FROM orders JOIN lines ON o_orderkey = l_orderkey),
        |summary AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CASE WHEN gap = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_exact,
        |    CAST(sum(CASE WHEN rel_gap > 0.01 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_flagged,
        |    CAST(sum(abs(gap)) AS BIGINT) AS total_abs_gap_cents
        |  FROM recon),
        |worst AS (SELECT o_orderkey AS worst_orderkey,
        |    rel_gap AS worst_rel_gap
        |  FROM (SELECT *, row_number() OVER (ORDER BY rel_gap DESC,
        |      o_orderkey) AS rk FROM recon) WHERE rk = 1)
        |SELECT * FROM summary CROSS JOIN worst""".stripMargin,

    "q319_kruskal_wallis" ->
      """WITH base AS (SELECT c_mktsegment AS sg,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
        |  FROM customer),
        |byvs AS (SELECT v, sg, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |cum AS (SELECT v, cv,
        |    CAST(sum(cv) OVER (ORDER BY v) - cv AS BIGINT) AS bef
        |  FROM (SELECT v, CAST(sum(c) AS BIGINT) AS cv
        |    FROM byvs GROUP BY 1)),
        |perseg AS (SELECT sg, CAST(sum(c) AS BIGINT) AS n_g,
        |    CAST(sum(c * (2 * bef + cv + 1)) AS BIGINT) AS r2
        |  FROM byvs JOIN cum USING (v) GROUP BY 1),
        |ties AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tc
        |  FROM cum),
        |stat AS (SELECT n AS n_total, round(hc, 4) AS h_tied,
        |    round(exp(-hc / 2) * (1.0 + hc / 2), 6) AS p_value
        |  FROM (SELECT n,
        |      (12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sr
        |        - 3.0 * (n + 1)) /
        |      (1.0 - CAST(tc AS DOUBLE) / (n * n * n - n)) AS hc
        |    FROM (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |        sum(CAST(r2 AS DOUBLE) * r2 / (4.0 * n_g)) AS sr
        |      FROM perseg) CROSS JOIN ties))
        |SELECT sg AS segment, n_g AS n,
        |  round(CAST(r2 AS DOUBLE) / (2.0 * n_g), 2) AS mean_rank,
        |  n_total, h_tied, p_value
        |FROM perseg CROSS JOIN stat
        |ORDER BY segment""".stripMargin,

    "q320_spatial_grid_join" ->
      """WITH cust AS (SELECT c_custkey AS ck,
        |    (c_custkey * 1103515245 + 12345) % 1000000 AS x,
        |    (c_custkey * 69069 + 1) % 1000000 AS y
        |  FROM customer),
        |supp AS (SELECT s_suppkey AS sk,
        |    (s_suppkey * 48271 + 99991) % 1000000 AS sx,
        |    (s_suppkey * 16807 + 12347) % 1000000 AS sy
        |  FROM supplier),
        |offs AS (SELECT dx.range AS dx, dy.range AS dy
        |  FROM range(-1, 2) dx, range(-1, 2) dy),
        |supx AS (SELECT sk, sx, sy, sx // 40000 + dx AS cx,
        |    sy // 40000 + dy AS cy
        |  FROM supp CROSS JOIN offs),
        |pairs AS (SELECT ck, sk,
        |    (x - sx) * (x - sx) + (y - sy) * (y - sy) AS d2
        |  FROM cust JOIN supx
        |    ON x // 40000 = cx AND y // 40000 = cy
        |  WHERE (x - sx) * (x - sx) + (y - sy) * (y - sy)
        |    <= 1600000000),
        |summary AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    round(avg(sqrt(CAST(d2 AS DOUBLE))), 2) AS avg_dist
        |  FROM pairs)
        |SELECT rk AS rank, ck AS custkey, sk AS suppkey,
        |  round(sqrt(CAST(d2 AS DOUBLE)), 2) AS dist, n_pairs, avg_dist
        |FROM (SELECT *, CAST(row_number()
        |    OVER (ORDER BY d2, ck, sk) AS BIGINT) AS rk FROM pairs)
        |CROSS JOIN summary WHERE rk <= 5 ORDER BY rk""".stripMargin,

    "q321_poisson_bootstrap" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |reps AS (SELECT cents, r.range AS rep,
        |    CAST((k * 1103515245 + r.range * 40503 + 12345)
        |      % 2147483648 AS DOUBLE) / 2147483648.0 AS u
        |  FROM base CROSS JOIN range(0, 200) r),
        |wtd AS (SELECT rep, cents,
        |    CAST(CASE WHEN u < 0.36787944117144233 THEN 0
        |      WHEN u < 0.7357588823428847 THEN 1
        |      WHEN u < 0.9196986029286058 THEN 2
        |      WHEN u < 0.9810118431238462 THEN 3
        |      WHEN u < 0.9963401531726563 THEN 4
        |      WHEN u < 0.9994058151824183 THEN 5
        |      WHEN u < 0.9999167588507119 THEN 6
        |      WHEN u < 0.9999897508033253 THEN 7
        |      WHEN u < 0.9999988805718283 THEN 8 ELSE 9 END
        |      AS BIGINT) AS w
        |  FROM reps),
        |perrep AS (SELECT rep,
        |    round(CAST(sum(w * cents) AS DOUBLE) / sum(w) / 100.0, 4)
        |      AS mean_d
        |  FROM wtd GROUP BY 1),
        |ranked AS (SELECT mean_d, CAST(row_number()
        |    OVER (ORDER BY mean_d, rep) AS BIGINT) AS rk FROM perrep)
        |SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 4)
        |    AS mean_dollars,
        |  (SELECT mean_d FROM ranked WHERE rk = 5) AS ci_lo_dollars,
        |  (SELECT mean_d FROM ranked WHERE rk = 196) AS ci_hi_dollars
        |FROM base""".stripMargin,

    "q322_isotonic_pava" ->
      """WITH lines AS (SELECT l_orderkey, CAST(count(*) AS BIGINT)
        |    AS nl FROM lineitem GROUP BY 1),
        |base AS (SELECT least(19, CAST(floor(o_totalprice / 25000)
        |      AS BIGINT)) AS b,
        |    CASE WHEN nl >= 4 THEN 1 ELSE 0 END AS y
        |  FROM orders JOIN lines ON o_orderkey = l_orderkey),
        |bins AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS yy FROM base GROUP BY 1),
        |cum AS (SELECT b, n, yy,
        |    CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS cn,
        |    CAST(sum(yy) OVER (ORDER BY b) AS BIGINT) AS cy
        |  FROM bins),
        |pairs AS (SELECT l.b AS i, r.b AS j,
        |    CAST(r.cy - (l.cy - l.yy) AS DOUBLE) /
        |      (r.cn - (l.cn - l.n)) AS a
        |  FROM cum l JOIN cum r ON l.b <= r.b),
        |iso AS (SELECT k, max(ma) AS g FROM (
        |    SELECT bins.b AS k, i, min(a) AS ma
        |    FROM bins JOIN pairs ON i <= bins.b AND bins.b <= j
        |    GROUP BY 1, 2) GROUP BY 1)
        |SELECT b AS bin, n, yy AS events,
        |  round(CAST(yy AS DOUBLE) / n, 4) AS raw_rate,
        |  round(g, 4) AS iso_rate
        |FROM bins JOIN iso ON b = k ORDER BY bin""".stripMargin,

    "q323_durbin_watson" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT rev, CAST(row_number() OVER (ORDER BY d)
        |    AS BIGINT) AS tt FROM daily),
        |mom AS (SELECT n, beta, (sy - beta * st) / CAST(n AS DOUBLE)
        |    AS alpha
        |  FROM (SELECT n, st, sy,
        |      CAST(n * sty - st * sy AS DOUBLE) /
        |        (n * stt - st * st) AS beta
        |    FROM (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(tt) AS BIGINT) AS st,
        |        CAST(sum(tt * tt) AS BIGINT) AS stt,
        |        CAST(sum(rev) AS BIGINT) AS sy,
        |        CAST(sum(tt * rev) AS BIGINT) AS sty FROM idx))),
        |resid AS (SELECT tt, n, beta,
        |    CAST(rev AS DOUBLE) - alpha - beta * tt AS e
        |  FROM idx CROSS JOIN mom),
        |lagged AS (SELECT n, beta, e,
        |    lag(e, 1) OVER (ORDER BY tt) AS ep FROM resid),
        |dw AS (SELECT any_value(n) AS n_days,
        |    round(any_value(beta), 2) AS slope_per_day,
        |    sum(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep)
        |      ELSE 0.0 END) / sum(e * e) AS dw
        |  FROM lagged)
        |SELECT n_days, slope_per_day, round(dw, 4) AS dw,
        |  round(1.0 - dw / 2, 4) AS rho_lag1 FROM dw""".stripMargin,

    "q324_cochran_armitage" ->
      """WITH cat AS (SELECT
        |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_k,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y_k
        |  FROM orders GROUP BY 1),
        |stat AS (SELECT n_total,
        |    round(CAST(tstar AS DOUBLE) *
        |      sqrt(CAST(n_total AS DOUBLE) / vstar), 4) AS z_trend,
        |    round(CAST(tstar AS DOUBLE) * tstar * n_total / vstar, 4)
        |      AS z2
        |  FROM (SELECT n AS n_total,
        |      n * swy - yy * swn AS tstar,
        |      CAST(yy AS DOUBLE) * (n - yy) *
        |        (CAST(n AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn)
        |        AS vstar
        |    FROM (SELECT CAST(sum(n_k) AS BIGINT) AS n,
        |        CAST(sum(y_k) AS BIGINT) AS yy,
        |        CAST(sum(k * n_k) AS BIGINT) AS swn,
        |        CAST(sum(k * y_k) AS BIGINT) AS swy,
        |        CAST(sum(k * k * n_k) AS BIGINT) AS swwn FROM cat)))
        |SELECT k AS priority, n_k AS n,
        |  round(CAST(y_k AS DOUBLE) / n_k, 4) AS rate_f,
        |  n_total, z_trend, z2
        |FROM cat CROSS JOIN stat ORDER BY priority""".stripMargin,

    "q325_ratio_delta" ->
      """WITH percust AS (SELECT c_mktsegment AS sg, o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |mom AS (SELECT sg, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM percust GROUP BY 1),
        |var1 AS (SELECT sg, n, CAST(sx AS DOUBLE) / sy AS r,
        |    (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
        |      (CAST(n AS DOUBLE) * (n - 1)) AS vx,
        |    (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) /
        |      (CAST(n AS DOUBLE) * (n - 1)) AS vy,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |      (CAST(n AS DOUBLE) * (n - 1)) AS cxy,
        |    CAST(sy AS DOUBLE) / n AS muy
        |  FROM mom),
        |var2 AS (SELECT sg, n, r,
        |    sqrt((vx - 2.0 * r * cxy + r * r * vy) /
        |      (n * muy * muy)) AS se
        |  FROM var1)
        |SELECT sg AS segment, n AS n_cust,
        |  round(r, 4) AS dollars_per_order, round(se, 4) AS se,
        |  round(r - 1.96 * se, 4) AS ci_lo,
        |  round(r + 1.96 * se, 4) AS ci_hi
        |FROM var2 ORDER BY segment""".stripMargin,

    "q326_pettitt" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |byv AS (SELECT rev,
        |    2 * (CAST(sum(cv) OVER (ORDER BY rev) AS BIGINT) - cv)
        |      + cv + 1 AS ar2
        |  FROM (SELECT rev, CAST(count(*) AS BIGINT) AS cv
        |    FROM daily GROUP BY 1)),
        |u AS (SELECT d,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
        |    CAST(sum(ar2) OVER (ORDER BY d) AS BIGINT) AS cum
        |  FROM daily JOIN byv USING (rev)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |ut AS (SELECT d, n, cum - t * (n + 1) AS u_t
        |  FROM u CROSS JOIN nn WHERE t < n)
        |SELECT n AS n_days, strftime(d, '%Y-%m-%d') AS change_date,
        |  abs(u_t) AS k_stat,
        |  round(2.0 * exp(-6.0 * CAST(abs(u_t) AS DOUBLE) * abs(u_t) /
        |    (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)), 6)
        |    AS p_value
        |FROM (SELECT *, row_number()
        |    OVER (ORDER BY abs(u_t) DESC, d) AS rk FROM ut)
        |WHERE rk = 1""".stripMargin,

    "q327_theil_decomposition" ->
      """WITH spend AS (SELECT n_name AS nat, x FROM (
        |    SELECT o_custkey,
        |      CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |        AS x
        |    FROM orders GROUP BY 1) s
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE x > 0),
        |pernat AS (SELECT nat, ng, xg,
        |    xlx / xg - ln(CAST(xg AS DOUBLE) / ng) AS tg
        |  FROM (SELECT nat, CAST(count(*) AS BIGINT) AS ng,
        |      CAST(sum(x) AS BIGINT) AS xg,
        |      sum(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))) AS xlx
        |    FROM spend GROUP BY 1)),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(xg) AS BIGINT) AS xx FROM pernat),
        |parts AS (SELECT nat, ng, xg, tg,
        |    CAST(xg AS DOUBLE) / xx AS share,
        |    (CAST(xg AS DOUBLE) / xx) *
        |      ln((CAST(xg AS DOUBLE) / xx) / (CAST(ng AS DOUBLE) / n))
        |      AS btw_term,
        |    (CAST(xg AS DOUBLE) / xx) * tg AS win_term
        |  FROM pernat CROSS JOIN tot),
        |stat AS (SELECT theil_between, theil_within_total,
        |    round(theil_between + theil_within_total, 6) AS theil_total
        |  FROM (SELECT round(sum(btw_term), 6) AS theil_between,
        |      round(sum(win_term), 6) AS theil_within_total
        |    FROM parts))
        |SELECT nat AS nation, ng AS n_cust, round(share, 4)
        |    AS spend_share,
        |  round(tg, 6) AS theil_within, theil_between,
        |  theil_within_total, theil_total
        |FROM parts CROSS JOIN stat ORDER BY nation""".stripMargin,

    "q328_mcnemar" ->
      """WITH flags AS (SELECT
        |    coalesce(a95, 0) AS a95, coalesce(a96, 0) AS a96
        |  FROM customer LEFT JOIN (SELECT o_custkey,
        |      CAST(sum(CASE WHEN year(o_orderdate) = 1995 THEN 1
        |        ELSE 0 END) AS BIGINT) AS a95,
        |      CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN 1
        |        ELSE 0 END) AS BIGINT) AS a96
        |    FROM orders GROUP BY 1) o ON c_custkey = o_custkey),
        |cells AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(CASE WHEN a95 > 0 AND a96 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN a95 = 0 AND a96 > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN a95 > 0 AND a96 > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS both_active
        |  FROM flags),
        |st AS (SELECT *, CAST(abs(b - c) - 1 AS DOUBLE) *
        |    (abs(b - c) - 1) / (b + c) AS stat FROM cells),
        |ax AS (SELECT *, sqrt(stat / 2) AS x,
        |    1.0 / (1.0 + 0.3275911 * sqrt(stat / 2)) AS tt FROM st)
        |SELECT n_cust, b AS lost_95, c AS gained_96, both_active,
        |  round(stat, 4) AS chi2_cc,
        |  round((0.254829592 * tt - 0.284496736 * tt * tt +
        |    1.421413741 * tt * tt * tt - 1.453152027 * tt * tt * tt * tt
        |    + 1.061405429 * tt * tt * tt * tt * tt) * exp(-x * x), 6)
        |    AS p_value
        |FROM ax""".stripMargin,

    "q329_cramer_von_mises" ->
      """WITH geo AS (SELECT
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    r_name = 'ASIA' AS is_a
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name IN ('ASIA', 'EUROPE')),
        |byval AS (SELECT v,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM geo GROUP BY 1),
        |cum AS (SELECT v, ca, cb,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cca,
        |    CAST(sum(cb) OVER w AS BIGINT) AS ccb
        |  FROM byval WINDOW w AS (ORDER BY v)),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM byval),
        |uu AS (SELECT any_value(na) AS n_asia, any_value(nb)
        |      AS n_europe,
        |    sum((CAST(cca AS DOUBLE) * nb - CAST(ccb AS DOUBLE) * na) *
        |      (CAST(cca AS DOUBLE) * nb - CAST(ccb AS DOUBLE) * na) *
        |      (ca + cb)) AS u
        |  FROM cum CROSS JOIN tot)
        |SELECT n_asia, n_europe,
        |  round(u / (CAST(n_asia AS DOUBLE) * n_europe) /
        |    (CAST(n_asia + n_europe AS DOUBLE) * (n_asia + n_europe)),
        |    6) AS t_stat
        |FROM uu""".stripMargin,

    "q330_haar_variance" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT rev, CAST(row_number() OVER (ORDER BY d) - 1
        |    AS BIGINT) AS t FROM daily),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
        |lv AS (SELECT CAST(j.range AS BIGINT) AS level,
        |    CAST(power(2, j.range) AS BIGINT) AS span,
        |    CAST(power(2, j.range - 1) AS BIGINT) AS half
        |  FROM range(1, 9) j),
        |blocks AS (SELECT level, span, t // span AS blk,
        |    CAST(sum(CASE WHEN t % span < half THEN rev ELSE 0 END)
        |      AS BIGINT) AS sl,
        |    CAST(sum(CASE WHEN t % span >= half THEN rev ELSE 0 END)
        |      AS BIGINT) AS sr
        |  FROM idx CROSS JOIN lv CROSS JOIN nn
        |  WHERE t < (nd // span) * span
        |  GROUP BY 1, 2, 3),
        |levels AS (SELECT level, CAST(count(*) AS BIGINT) AS n_blocks,
        |    sum(CAST(sl - sr AS DOUBLE) * (sl - sr) / span) AS energy
        |  FROM blocks GROUP BY 1),
        |te AS (SELECT sum(energy) AS tot FROM levels)
        |SELECT level, n_blocks, round(energy / 1.0e6, 2)
        |    AS energy_musd2,
        |  round(energy / tot, 4) AS energy_share
        |FROM levels CROSS JOIN te ORDER BY level""".stripMargin,

    "q331_caliper_matching" ->
      """WITH spend AS (SELECT o_custkey, CAST(sum(CAST(floor(
        |      o_totalprice) AS BIGINT)) AS BIGINT) AS sp
        |  FROM orders GROUP BY 1),
        |cust AS (SELECT c_custkey AS ck,
        |    c_mktsegment = 'BUILDING' AS treated,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    coalesce(sp, 0) AS outcome
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |controls AS (SELECT v // 1000 AS bk, v AS cv, ck AS cck,
        |    outcome AS cout FROM cust WHERE NOT treated),
        |expanded AS (SELECT ck, v, outcome, v // 1000 + off.range AS bk
        |  FROM cust CROSS JOIN range(-1, 2) off WHERE treated),
        |pairs AS (SELECT ck, outcome, ad, cout FROM (
        |    SELECT ck, outcome, abs(v - cv) AS ad, cck, cout,
        |      row_number() OVER (PARTITION BY ck
        |        ORDER BY abs(v - cv), cck) AS rn
        |    FROM expanded JOIN controls USING (bk)
        |    WHERE abs(v - cv) <= 1000) WHERE rn = 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_treated
        |  FROM cust WHERE treated)
        |SELECT n_treated, CAST(count(*) AS BIGINT) AS n_matched,
        |  round(CAST(count(*) AS DOUBLE) / n_treated, 4) AS match_rate,
        |  round(avg(CAST(outcome - cout AS DOUBLE)), 2) AS att_dollars,
        |  round(avg(CAST(ad AS DOUBLE)) / 100, 4)
        |    AS mean_score_gap_dollars
        |FROM pairs CROSS JOIN nt
        |GROUP BY n_treated""".stripMargin,

    "q332_granger" ->
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS wd,
        |    r_name,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000
        |      AS BIGINT) AS kd
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name IN ('ASIA', 'EUROPE') GROUP BY 1, 2),
        |weekly AS (SELECT wd // 7 AS w,
        |    CAST(sum(CASE WHEN r_name = 'ASIA' THEN kd ELSE 0 END)
        |      AS BIGINT) AS asia,
        |    CAST(sum(CASE WHEN r_name = 'EUROPE' THEN kd ELSE 0 END)
        |      AS BIGINT) AS europe
        |  FROM daily GROUP BY 1),
        |lagged AS (SELECT * FROM (SELECT asia, europe,
        |    lag(asia) OVER (ORDER BY w) AS asia_l,
        |    lag(europe) OVER (ORDER BY w) AS europe_l
        |  FROM weekly) WHERE asia_l IS NOT NULL),
        |dirs AS (
        |  SELECT 'europe_to_asia' AS direction, asia AS y,
        |    asia_l AS u, europe_l AS v FROM lagged
        |  UNION ALL
        |  SELECT 'asia_to_europe' AS direction, europe AS y,
        |    europe_l AS u, asia_l AS v FROM lagged),
        |mom AS (SELECT direction, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(u) AS BIGINT) AS su,
        |    CAST(sum(v) AS BIGINT) AS sv,
        |    CAST(sum(u * u) AS BIGINT) AS suu,
        |    CAST(sum(v * v) AS BIGINT) AS svv,
        |    CAST(sum(u * v) AS BIGINT) AS suv,
        |    CAST(sum(u * y) AS BIGINT) AS suy,
        |    CAST(sum(v * y) AS BIGINT) AS svy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM dirs GROUP BY 1),
        |cen AS (SELECT direction, n,
        |    n * suu - su * su AS cuu, n * svv - sv * sv AS cvv,
        |    n * suv - su * sv AS cuv, n * suy - su * sy AS cuy,
        |    n * svy - sv * sy AS cvy, n * syy - sy * sy AS cyy
        |  FROM mom),
        |coefs AS (SELECT direction, n, cuy, cvy, cyy, cuu,
        |    (CAST(cvv AS DOUBLE) * cuy - CAST(cuv AS DOUBLE) * cvy) /
        |      (CAST(cuu AS DOUBLE) * cvv - CAST(cuv AS DOUBLE) * cuv)
        |      AS b,
        |    (CAST(cuu AS DOUBLE) * cvy - CAST(cuv AS DOUBLE) * cuy) /
        |      (CAST(cuu AS DOUBLE) * cvv - CAST(cuv AS DOUBLE) * cuv)
        |      AS c
        |  FROM cen),
        |rss AS (SELECT direction, n, b, c,
        |    (cyy - b * cuy - c * cvy) / CAST(n AS DOUBLE) AS rss_u,
        |    (cyy - CAST(cuy AS DOUBLE) * cuy / cuu) / CAST(n AS DOUBLE)
        |      AS rss_r
        |  FROM coefs)
        |SELECT direction, n AS n_weeks, round(b, 4) AS own_lag_coef,
        |  round(c, 4) AS cross_lag_coef,
        |  round((rss_r - rss_u) / (rss_u / (n - 3)), 4) AS f_stat
        |FROM rss ORDER BY direction""".stripMargin,

    "q333_fellegi_sunter" ->
      """WITH cust AS (SELECT c_custkey AS ck, c_nationkey AS nat,
        |    c_mktsegment AS seg,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
        |  FROM customer),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
        |unat AS (SELECT CAST(agree AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * (n - 1)) AS u_nat
        |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS agree
        |    FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM cust
        |      GROUP BY nat)) CROSS JOIN nn),
        |useg AS (SELECT CAST(agree AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * (n - 1)) AS u_seg
        |  FROM (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS agree
        |    FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM cust
        |      GROUP BY seg)) CROSS JOIN nn),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS c
        |  FROM cust GROUP BY 1),
        |ubal AS (SELECT CAST(inband - n AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * (n - 1)) AS u_bal
        |  FROM (SELECT CAST(sum(a.c * b.cw) AS BIGINT) AS inband
        |    FROM (SELECT v, c, v // 1000 + off.range AS bk
        |      FROM vals CROSS JOIN range(-1, 2) off) a
        |    JOIN (SELECT v // 1000 AS bk, v AS w, c AS cw
        |      FROM vals) b USING (bk)
        |    WHERE abs(a.v - b.w) <= 1000) CROSS JOIN nn),
        |us AS (SELECT * FROM unat CROSS JOIN useg CROSS JOIN ubal),
        |pairs AS (SELECT a.nat = b.nat AS na, a.seg = b.seg AS sa,
        |    abs(a.v - b.v) <= 1000 AS ba
        |  FROM (SELECT *, ck // 10 AS bk FROM cust) a
        |  JOIN (SELECT *, ck // 10 AS bk FROM cust) b
        |    ON a.bk = b.bk AND a.ck < b.ck),
        |patterns AS (SELECT na, sa, ba, CAST(count(*) AS BIGINT)
        |    AS n_pairs FROM pairs GROUP BY 1, 2, 3),
        |scored AS (SELECT na AS nation_agree, sa AS segment_agree,
        |    ba AS balance_agree, n_pairs,
        |    round(u_nat, 6) AS u_nation, round(u_bal, 6) AS u_balance,
        |    round(
        |      (CASE WHEN na THEN ln(0.95 / u_nat)
        |        ELSE ln((1.0 - 0.95) / (1.0 - u_nat)) END) +
        |      (CASE WHEN sa THEN ln(0.9 / u_seg)
        |        ELSE ln((1.0 - 0.9) / (1.0 - u_seg)) END) +
        |      (CASE WHEN ba THEN ln(0.85 / u_bal)
        |        ELSE ln((1.0 - 0.85) / (1.0 - u_bal)) END), 4)
        |      AS weight
        |  FROM patterns CROSS JOIN us)
        |SELECT *, CASE WHEN weight >= 4.0 THEN 'match'
        |    WHEN weight >= -2.0 THEN 'possible'
        |    ELSE 'non_match' END AS decision
        |FROM scored
        |ORDER BY nation_agree, segment_agree, balance_agree"""
        .stripMargin,

    "q334_dtw" -> {
      // the 11 column-fold steps are unrolled as generated CTEs — the
      // same bounded DP the engine runs, in DuckDB's own dialect
      val head =
        """WITH am AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS i,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000
          |      AS BIGINT) AS va
          |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
          |bm AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS j,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000
          |      AS BIGINT) AS vb
          |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
          |cost AS (SELECT i, j, abs(va - vb) AS c
          |  FROM am CROSS JOIN bm),
          |d1 AS (SELECT i, CAST(sum(c) OVER (ORDER BY i) AS BIGINT)
          |    AS d FROM cost WHERE j = 1)""".stripMargin
      val steps = (2 to 12).map { j =>
        s"""e$j AS (SELECT i, least(d, coalesce(lag(d)
           |    OVER (ORDER BY i), d)) AS e FROM d${j - 1}),
           |c$j AS (SELECT i, c, CAST(sum(c) OVER (ORDER BY i)
           |    AS BIGINT) AS cs FROM cost WHERE j = $j),
           |d$j AS (SELECT c$j.i AS i, cs + min(e - cs + c)
           |    OVER (ORDER BY c$j.i) AS d
           |  FROM c$j JOIN e$j ON c$j.i = e$j.i)""".stripMargin
      }.mkString(",\n")
      head + ",\n" + steps +
        "\nSELECT CAST(12 AS BIGINT) AS n_months, " +
        "CAST(d AS BIGINT) AS dtw_kusd FROM d12 WHERE i = 12"
    },

    "q335_binary_segmentation" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT d,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
        |    CAST(sum(y) OVER (ORDER BY d) AS BIGINT) AS s1,
        |    CAST(sum(y * y) OVER (ORDER BY d) AS BIGINT) AS s2
        |  FROM daily),
        |tot AS (SELECT max(t) AS n, max(s1) AS g1, max(s2) AS g2
        |  FROM cum),
        |c1 AS (SELECT d, t, n, g1, g2,
        |    round(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / t +
        |      (CAST(g2 - s2 AS DOUBLE) - CAST(g1 - s1 AS DOUBLE) *
        |        (g1 - s1) / (n - t)), 4) AS sse
        |  FROM cum CROSS JOIN tot WHERE t < n),
        |best1 AS (SELECT t AS t1, d AS d1, sse AS sse1 FROM (
        |    SELECT *, row_number() OVER (ORDER BY sse, t) AS rk
        |    FROM c1) WHERE rk = 1),
        |t1row AS (SELECT t1, d1, sse1, s1 AS p1, s2 AS p2
        |  FROM cum JOIN best1 ON t = t1),
        |c2 AS (SELECT d, t,
        |    round(CASE WHEN t < t1 THEN
        |      CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / t +
        |      (CAST(p2 - s2 AS DOUBLE) - CAST(p1 - s1 AS DOUBLE) *
        |        (p1 - s1) / (t1 - t)) +
        |      (CAST(g2 - p2 AS DOUBLE) - CAST(g1 - p1 AS DOUBLE) *
        |        (g1 - p1) / (n - t1))
        |    ELSE
        |      CAST(p2 AS DOUBLE) - CAST(p1 AS DOUBLE) * p1 / t1 +
        |      (CAST(s2 - p2 AS DOUBLE) - CAST(s1 - p1 AS DOUBLE) *
        |        (s1 - p1) / (t - t1)) +
        |      (CAST(g2 - s2 AS DOUBLE) - CAST(g1 - s1 AS DOUBLE) *
        |        (g1 - s1) / (n - t))
        |    END, 4) AS sse
        |  FROM cum CROSS JOIN tot CROSS JOIN t1row
        |  WHERE t < n AND t <> t1),
        |best2 AS (SELECT t AS t2, d AS d2, sse AS sse2 FROM (
        |    SELECT *, row_number() OVER (ORDER BY sse, t) AS rk
        |    FROM c2) WHERE rk = 1),
        |sse0 AS (SELECT n,
        |    round(CAST(g2 AS DOUBLE) - CAST(g1 AS DOUBLE) * g1 / n, 4)
        |      AS sse0
        |  FROM tot)
        |SELECT n AS n_days,
        |  strftime(least(d1, d2), '%Y-%m-%d') AS change_1,
        |  strftime(greatest(d1, d2), '%Y-%m-%d') AS change_2,
        |  sse0, sse1, sse2,
        |  round(1.0 - sse2 / sse0, 6) AS var_explained
        |FROM sse0 CROSS JOIN t1row CROSS JOIN best2""".stripMargin,

    "q336_anova_f" ->
      """WITH g AS (SELECT c_mktsegment AS sg,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sg1,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) *
        |      CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sg2
        |  FROM customer GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg1) AS BIGINT) AS s1,
        |    CAST(sum(sg2) AS BIGINT) AS s2,
        |    sum(CAST(sg1 AS DOUBLE) * sg1 / ng) AS sb
        |  FROM g),
        |ss AS (SELECT k, n,
        |    sb - CAST(s1 AS DOUBLE) * s1 / n AS ssb,
        |    CAST(s2 AS DOUBLE) - sb AS ssw
        |  FROM agg),
        |f AS (SELECT k, n, ssb, ssw,
        |    (ssb / (k - 1)) / (ssw / (n - k)) AS f FROM ss)
        |SELECT n AS n_cust, k AS k_groups, round(f, 4) AS f_stat,
        |  round(ssb / (ssb + ssw), 6) AS eta_sq,
        |  round(exp(-(f * 4) / 2) * (1.0 + (f * 4) / 2), 6)
        |    AS p_approx
        |FROM f""".stripMargin,

    "q337_brown_forsythe" ->
      """WITH base AS (SELECT c_mktsegment AS sg,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 16777216
        |      + c_custkey AS ok
        |  FROM customer),
        |ranked AS (SELECT sg, v, CAST(row_number()
        |    OVER (PARTITION BY sg ORDER BY ok) AS BIGINT) AS rk
        |  FROM base),
        |ngs AS (SELECT sg, CAST(count(*) AS BIGINT) AS ng
        |  FROM base GROUP BY 1),
        |med AS (SELECT sg, v AS med FROM ranked JOIN ngs USING (sg)
        |  WHERE rk = (ng + 1) // 2),
        |g AS (SELECT sg, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(abs(v - med)) AS BIGINT) AS sg1,
        |    CAST(sum(abs(v - med) * abs(v - med)) AS BIGINT) AS sg2
        |  FROM base JOIN med USING (sg) GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg1) AS BIGINT) AS s1,
        |    CAST(sum(sg2) AS BIGINT) AS s2,
        |    sum(CAST(sg1 AS DOUBLE) * sg1 / ng) AS sb
        |  FROM g),
        |f AS (SELECT k, n,
        |    ((sb - CAST(s1 AS DOUBLE) * s1 / n) / (k - 1)) /
        |      ((CAST(s2 AS DOUBLE) - sb) / (n - k)) AS f
        |  FROM agg)
        |SELECT n AS n_cust, k AS k_groups, round(f, 4) AS w_stat,
        |  round(exp(-(f * 4) / 2) * (1.0 + (f * 4) / 2), 6)
        |    AS p_approx
        |FROM f""".stripMargin,

    "q338_tukey_hsd" ->
      """WITH g AS (SELECT c_mktsegment AS sg,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sg1,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) *
        |      CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sg2
        |  FROM customer GROUP BY 1),
        |mse AS (SELECT (CAST(s2 AS DOUBLE) - sb) /
        |    CAST(n - k AS DOUBLE) AS mse
        |  FROM (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |      CAST(count(*) AS BIGINT) AS k,
        |      CAST(sum(sg2) AS BIGINT) AS s2,
        |      sum(CAST(sg1 AS DOUBLE) * sg1 / ng) AS sb FROM g))
        |SELECT a.sg AS seg_a, b.sg AS seg_b,
        |  round((CAST(a.sg1 AS DOUBLE) / a.ng -
        |    CAST(b.sg1 AS DOUBLE) / b.ng) / 100, 2)
        |    AS mean_diff_dollars,
        |  round((CAST(a.sg1 AS DOUBLE) / a.ng -
        |    CAST(b.sg1 AS DOUBLE) / b.ng) /
        |    sqrt(mse / 2 * (1.0 / a.ng + 1.0 / b.ng)), 4) AS q_stat,
        |  abs(round((CAST(a.sg1 AS DOUBLE) / a.ng -
        |    CAST(b.sg1 AS DOUBLE) / b.ng) /
        |    sqrt(mse / 2 * (1.0 / a.ng + 1.0 / b.ng)), 4)) > 3.86
        |    AS significant
        |FROM g a JOIN g b ON a.sg < b.sg CROSS JOIN mse
        |ORDER BY seg_a, seg_b""".stripMargin,

    "q339_bland_altman" ->
      """WITH diffs AS (SELECT calc - stated AS diff
        |  FROM (SELECT l_orderkey, CAST(sum(CAST(floor(
        |      l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
        |      + 0.5) AS BIGINT)) AS BIGINT) AS calc
        |    FROM lineitem GROUP BY 1) l
        |  JOIN (SELECT o_orderkey,
        |      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |        AS stated FROM orders) o
        |    ON l_orderkey = o_orderkey),
        |mom AS (SELECT n, CAST(s1 AS DOUBLE) / n AS bias,
        |    sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |      CAST(s1 AS DOUBLE) * s1) /
        |      (CAST(n AS DOUBLE) * (n - 1))) AS sd
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS n,
        |      CAST(sum(diff) AS BIGINT) AS s1,
        |      sum(CAST(diff AS HUGEINT) * diff) AS s2 FROM diffs))
        |SELECT any_value(n) AS n_orders,
        |  round(any_value(bias), 4) AS bias_cents,
        |  round(any_value(bias) - 1.96 * any_value(sd), 4)
        |    AS loa_lo_cents,
        |  round(any_value(bias) + 1.96 * any_value(sd), 4)
        |    AS loa_hi_cents,
        |  round(avg(CASE WHEN diff < bias - 1.96 * sd THEN 1.0
        |    WHEN diff > bias + 1.96 * sd THEN 1.0 ELSE 0.0 END), 6)
        |    AS frac_outside
        |FROM diffs CROSS JOIN mom""".stripMargin,

    "q340_markov_attribution" -> {
      // the 20 fixed-point steps and the 25-column wide matrix are
      // generated — identical fixed operand order to the engine's fold
      val chans = Seq("click", "view", "signup", "error")
      val froms = "start" +: chans
      val tos = chans :+ "conv"
      val tCols = froms.flatMap(f => tos.map(tt => s"t_${f}_$tt"))
        .mkString(", ")
      val aggCols = froms.flatMap(f => tos.map(tt =>
        s"sum(CASE WHEN f = '$f' AND tt = '$tt' THEN p ELSE 0.0 END)" +
          s" AS t_${f}_$tt")).mkString(",\n    ")
      val p0Cols = chans.map(c => s"0.0 AS p_$c").mkString(", ")
      val iters = (1 to 20).map { k =>
        val ps = chans.map { c =>
          chans.foldLeft(s"t_${c}_conv")((acc, d) =>
            s"$acc + t_${c}_$d * p_$d") + s" AS p_$c"
        }.mkString(",\n    ")
        s"p$k AS (SELECT scen, $tCols,\n    $ps FROM p${k - 1})"
      }.mkString(",\n")
      val pStart = chans.foldLeft("t_start_conv")((acc, d) =>
        s"$acc + t_start_$d * p_$d")
      val wideCols = ("sum(CASE WHEN scen = 'base' THEN p_start " +
        "ELSE 0.0 END) AS p_base") +: chans.map(c =>
        s"sum(CASE WHEN scen = '$c' THEN p_start ELSE 0.0 END)" +
          s" AS p_rm_$c")
      val reCols = chans.map(c =>
        s"(p_base - p_rm_$c) / p_base AS re_$c").mkString(", ")
      val reSum = chans.map(c => s"re_$c").mkString(" + ")
      val outCols = (chans.map(c => s"round(re_$c, 6) AS re_$c") ++
        chans.map(c => s"round(re_$c / ($reSum), 6) AS share_$c"))
        .mkString(",\n  ")
      s"""WITH ev AS (SELECT user_id, event_type AS et,
        |    epoch_us(ts) AS us, event_id FROM events),
        |minp AS (SELECT user_id, CAST(min(us) AS BIGINT) AS mp
        |  FROM ev WHERE et = 'purchase' GROUP BY 1),
        |touches AS (SELECT ev.user_id, et, us, event_id, mp
        |  FROM ev LEFT JOIN minp USING (user_id)
        |  WHERE et <> 'purchase' AND (mp IS NULL OR us < mp)),
        |seq AS (SELECT *, row_number() OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nt,
        |    lead(et) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id) AS nx,
        |    mp IS NOT NULL AS conv FROM touches),
        |tr AS (
        |  SELECT 'start' AS f, et AS tt FROM seq WHERE rn = 1
        |  UNION ALL SELECT et, nx FROM seq WHERE nx IS NOT NULL
        |  UNION ALL SELECT et, CASE WHEN conv THEN 'conv'
        |    ELSE 'null' END FROM seq WHERE rn = nt
        |  UNION ALL SELECT 'start', 'conv' FROM minp
        |    WHERE user_id NOT IN (SELECT user_id FROM touches)),
        |tc AS (SELECT f, tt, CAST(count(*) AS BIGINT) AS c
        |  FROM tr GROUP BY 1, 2),
        |probs AS (SELECT f, tt, CAST(c AS DOUBLE) / tot AS p
        |  FROM tc JOIN (SELECT f, CAST(sum(c) AS BIGINT) AS tot
        |    FROM tc GROUP BY 1) tots USING (f)),
        |scens AS (SELECT unnest(
        |    ['base', 'click', 'view', 'signup', 'error']) AS scen),
        |red AS (SELECT scen, f,
        |    CASE WHEN tt = scen THEN 'null' ELSE tt END AS tt, p
        |  FROM scens CROSS JOIN probs),
        |tw AS (SELECT scen,
        |    $aggCols
        |  FROM red GROUP BY 1),
        |p0 AS (SELECT *, $p0Cols FROM tw),
        |$iters,
        |fin AS (SELECT scen, $pStart AS p_start FROM p20),
        |wide AS (SELECT ${wideCols.mkString(",\n    ")} FROM fin),
        |re AS (SELECT p_base, $reCols FROM wide),
        |nj AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS n_journeys FROM events)
        |SELECT n_journeys, round(p_base, 6) AS base_cvr,
        |  $outCols
        |FROM re CROSS JOIN nj""".stripMargin
    },

    "q341_qini_uplift" ->
      """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1996),
        |base AS (SELECT c_custkey AS ck,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    c_custkey % 2 = 0 AS tr,
        |    CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
        |  FROM customer LEFT JOIN y96 ON c_custkey = o_custkey),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |dec AS (SELECT CAST(1 + (rk - 1) * 10 // n AS BIGINT)
        |      AS decile, tr, y, n
        |  FROM (SELECT *, CAST(row_number()
        |      OVER (ORDER BY v DESC, ck) AS BIGINT) AS rk FROM base)
        |    CROSS JOIN nn),
        |per AS (SELECT decile, any_value(n) AS n,
        |    CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nc,
        |    CAST(sum(CASE WHEN tr THEN y ELSE 0 END) AS BIGINT) AS yt,
        |    CAST(sum(CASE WHEN NOT tr THEN y ELSE 0 END) AS BIGINT)
        |      AS yc
        |  FROM dec GROUP BY 1),
        |cum AS (SELECT *,
        |    CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE) * cnt / cnc
        |      AS qini,
        |    CAST(cnt + cnc AS DOUBLE) / n AS x
        |  FROM (SELECT *,
        |      CAST(sum(nt) OVER w AS BIGINT) AS cnt,
        |      CAST(sum(nc) OVER w AS BIGINT) AS cnc,
        |      CAST(sum(yt) OVER w AS BIGINT) AS cyt,
        |      CAST(sum(yc) OVER w AS BIGINT) AS cyc
        |    FROM per WINDOW w AS (ORDER BY decile))),
        |curve AS (SELECT *,
        |    sum((qini + ql) / 2 * (x - xl)) OVER wa AS area,
        |    sum(CASE WHEN decile = 10 THEN qini ELSE 0.0 END) OVER wa
        |      AS u_total
        |  FROM (SELECT *,
        |      coalesce(lag(qini) OVER (ORDER BY decile), 0.0) AS ql,
        |      coalesce(lag(x) OVER (ORDER BY decile), 0.0) AS xl
        |    FROM cum)
        |  WINDOW wa AS (ORDER BY decile ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT decile, nt AS n_t, nc AS n_c, yt AS y_t, yc AS y_c,
        |  round(qini, 4) AS qini_k, round(area, 4) AS qini_area,
        |  round(area - u_total / 2, 4) AS qini_coef
        |FROM curve ORDER BY decile""".stripMargin,

    "q342_friedman" ->
      """WITH segs AS (SELECT DISTINCT c_mktsegment AS seg
        |  FROM customer),
        |grid AS (SELECT n_nationkey AS nk, seg
        |  FROM nation CROSS JOIN segs),
        |sums AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sv
        |  FROM customer GROUP BY 1, 2),
        |cells AS (SELECT nk, seg, coalesce(sv, 0) AS v
        |  FROM grid LEFT JOIN sums USING (nk, seg)),
        |ranked AS (SELECT a.nk, a.seg,
        |    2 * CAST(sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
        |      AS BIGINT) +
        |    CAST(sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END)
        |      AS BIGINT) + 1 AS ar2
        |  FROM cells a JOIN cells b ON a.nk = b.nk
        |  GROUP BY 1, 2),
        |perseg AS (SELECT seg, CAST(sum(ar2) AS BIGINT) AS r2
        |  FROM ranked GROUP BY 1),
        |bk AS (SELECT CAST(count(DISTINCT nk) AS BIGINT) AS b,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS k FROM cells),
        |stat AS (SELECT b AS n_blocks, k AS k_treatments,
        |    round(chi2, 4) AS chi2_f,
        |    round(exp(-chi2 / 2) * (1.0 + chi2 / 2), 6) AS p_value
        |  FROM (SELECT b, k,
        |      12.0 / (CAST(b AS DOUBLE) * k * (k + 1)) *
        |        (CAST(sr2 AS DOUBLE) / 4) - 3.0 * b * (k + 1) AS chi2
        |    FROM (SELECT CAST(sum(r2 * r2) AS BIGINT) AS sr2
        |      FROM perseg) CROSS JOIN bk))
        |SELECT seg AS segment,
        |  round(CAST(r2 AS DOUBLE) / (2.0 * n_blocks), 2) AS mean_rank,
        |  n_blocks, k_treatments, chi2_f, p_value
        |FROM perseg CROSS JOIN stat ORDER BY segment""".stripMargin,

    "q343_smd_balance" -> {
      // moment CTEs and SMD expressions generated per covariate —
      // identical operand order to the engine's smd() helper
      val covs = Seq(("acctbal", "v", "mcv"), ("orders", "x_orders",
        "mco"), ("spend", "x_spend", "mcs"))
      def momCte(tag: String, src: String, c: String) =
        s"$tag AS (SELECT CAST(count(*) AS BIGINT) AS ${tag}_n, " +
          s"CAST(sum($c) AS BIGINT) AS ${tag}_s1, " +
          s"sum(CAST($c AS HUGEINT) * $c) AS ${tag}_s2 FROM $src)"
      def smdExpr(t: String, c: String) =
        s"(CAST(${t}_s1 AS DOUBLE) / ${t}_n - " +
          s"CAST(${c}_s1 AS DOUBLE) / ${c}_n) / " +
          s"sqrt(((CAST(${t}_n AS DOUBLE) * CAST(${t}_s2 AS DOUBLE) - " +
          s"CAST(${t}_s1 AS DOUBLE) * ${t}_s1) / " +
          s"(CAST(${t}_n AS DOUBLE) * (${t}_n - 1)) + " +
          s"(CAST(${c}_n AS DOUBLE) * CAST(${c}_s2 AS DOUBLE) - " +
          s"CAST(${c}_s1 AS DOUBLE) * ${c}_s1) / " +
          s"(CAST(${c}_n AS DOUBLE) * (${c}_n - 1))) / 2)"
      val momCtes = covs.flatMap { case (nm, raw, m) => Seq(
        momCte(s"tb_$nm", "tall", raw), momCte(s"cb_$nm", "call", raw),
        momCte(s"ta_$nm", "matched", raw),
        momCte(s"ca_$nm", "matched", m))
      }.mkString(",\n")
      val rows = covs.map { case (nm, _, _) =>
        s"SELECT '$nm' AS covariate, " +
          s"round(${smdExpr(s"tb_$nm", s"cb_$nm")}, 4) AS smd_before, " +
          s"round(${smdExpr(s"ta_$nm", s"ca_$nm")}, 4) AS smd_after " +
          s"FROM tb_$nm CROSS JOIN cb_$nm CROSS JOIN ta_$nm " +
          s"CROSS JOIN ca_$nm"
      }.mkString("\nUNION ALL\n")
      s"""WITH spend AS (SELECT o_custkey, CAST(sum(CAST(floor(
        |      o_totalprice) AS BIGINT)) AS BIGINT) AS sp,
        |    CAST(count(*) AS BIGINT) AS no FROM orders GROUP BY 1),
        |cust AS (SELECT c_custkey AS ck,
        |    c_mktsegment = 'BUILDING' AS treated,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    coalesce(sp, 0) AS x_spend, coalesce(no, 0) AS x_orders
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |controls AS (SELECT v // 1000 AS bk, v AS cv, ck AS cck,
        |    x_spend AS c_spend, x_orders AS c_orders
        |  FROM cust WHERE NOT treated),
        |matched AS (SELECT ck, v, x_spend, x_orders, mcv, mcs, mco
        |  FROM (SELECT t.ck, t.v, t.x_spend, t.x_orders, c.cv AS mcv,
        |      c.c_spend AS mcs, c.c_orders AS mco,
        |      row_number() OVER (PARTITION BY t.ck
        |        ORDER BY abs(t.v - c.cv), c.cck) AS rn
        |    FROM (SELECT ck, v, x_spend, x_orders,
        |        v // 1000 + off.range AS bk
        |      FROM cust CROSS JOIN range(-1, 2) off WHERE treated) t
        |    JOIN controls c USING (bk)
        |    WHERE abs(t.v - c.cv) <= 1000) WHERE rn = 1),
        |tall AS (SELECT * FROM cust WHERE treated),
        |call AS (SELECT * FROM cust WHERE NOT treated),
        |$momCtes
        |SELECT covariate, smd_before, smd_after,
        |  round(1.0 - abs(smd_after) / abs(smd_before), 4)
        |    AS reduction
        |FROM ($rows)
        |ORDER BY covariate""".stripMargin
    },

    "q344_process_capability" ->
      """WITH diffs AS (SELECT calc - stated AS diff
        |  FROM (SELECT l_orderkey, CAST(sum(CAST(floor(
        |      l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
        |      + 0.5) AS BIGINT)) AS BIGINT) AS calc
        |    FROM lineitem GROUP BY 1) l
        |  JOIN (SELECT o_orderkey,
        |      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |        AS stated FROM orders) o
        |    ON l_orderkey = o_orderkey),
        |mom AS (SELECT n, oos, CAST(s1 AS DOUBLE) / n AS mu,
        |    sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
        |      CAST(s1 AS DOUBLE) * s1) /
        |      (CAST(n AS DOUBLE) * (n - 1))) AS sd
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS n,
        |      CAST(sum(diff) AS BIGINT) AS s1,
        |      sum(CAST(diff AS HUGEINT) * diff) AS s2,
        |      CAST(sum(CASE WHEN abs(diff) > 100.0 THEN 1 ELSE 0 END)
        |        AS BIGINT) AS oos FROM diffs)),
        |tails AS (SELECT *,
        |    (100.0 - mu) / sd / sqrt(2.0) AS xu,
        |    (mu + 100.0) / sd / sqrt(2.0) AS xl
        |  FROM mom),
        |poly AS (SELECT *,
        |    1.0 / (1.0 + 0.3275911 * xu) AS tu,
        |    1.0 / (1.0 + 0.3275911 * xl) AS tl
        |  FROM tails)
        |SELECT n AS n_orders, round(mu, 4) AS mean_gap_cents,
        |  round(sd, 4) AS sd_cents,
        |  round(200.0 / (6 * sd), 4) AS cp,
        |  round(least(100.0 - mu, mu + 100.0) / (3 * sd), 4) AS cpk,
        |  round(CAST(oos AS DOUBLE) / n * 1e6, 2) AS ppm_observed,
        |  round(((0.254829592 * tu - 0.284496736 * tu * tu +
        |    1.421413741 * tu * tu * tu - 1.453152027 * tu * tu * tu *
        |    tu + 1.061405429 * tu * tu * tu * tu * tu) *
        |    exp(-xu * xu) / 2 +
        |    (0.254829592 * tl - 0.284496736 * tl * tl +
        |    1.421413741 * tl * tl * tl - 1.453152027 * tl * tl * tl *
        |    tl + 1.061405429 * tl * tl * tl * tl * tl) *
        |    exp(-xl * xl) / 2) * 1e6, 2) AS ppm_normal_pred
        |FROM poly""".stripMargin,

    "q345_wald_sprt" -> {
      // LLR multipliers and boundaries interpolated as the SAME double
      // constants the engine uses — no cross-engine ln() dependence
      val c1 = math.log(0.34 / 0.32)
      val c2 = math.log(0.66 / 0.68)
      val ua = math.log(0.95 / 0.05)
      val ub = math.log(0.05 / 0.95)
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |llr AS (SELECT d, x * $c1 + (nd - x) * $c2 AS inc,
        |    sum(x * $c1 + (nd - x) * $c2) OVER (ORDER BY d) AS cum
        |  FROM daily),
        |ends AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    min(CASE WHEN cum >= $ua THEN d END) AS d_up,
        |    min(CASE WHEN cum <= $ub THEN d END) AS d_dn,
        |    round(sum(inc), 4) AS llr_final
        |  FROM llr)
        |SELECT n_days,
        |  strftime(d_up, '%Y-%m-%d') AS first_h1_cross,
        |  strftime(d_dn, '%Y-%m-%d') AS first_h0_cross,
        |  CASE WHEN d_up IS NULL AND d_dn IS NULL THEN 'continue'
        |    WHEN d_dn IS NULL OR (d_up IS NOT NULL AND d_up < d_dn)
        |    THEN 'accept_h1' ELSE 'accept_h0' END AS decision,
        |  llr_final
        |FROM ends""".stripMargin
    },

    "q346_cindex" ->
      """WITH maxd AS (SELECT max(o_orderdate) AS mx FROM orders),
        |units AS (SELECT
        |    date_diff('day', first, last) AS dur,
        |    date_diff('day', last, mx) > 90 AS event,
        |    least(no, 60) AS sc
        |  FROM (SELECT min(o_orderdate) AS first,
        |      max(o_orderdate) AS last, CAST(count(*) AS BIGINT) AS no
        |    FROM orders GROUP BY o_custkey) CROSS JOIN maxd),
        |cells AS (SELECT dur, sc, CAST(count(*) AS BIGINT) AS c_all,
        |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_ev
        |  FROM units GROUP BY 1, 2),
        |grid AS (SELECT d.dur, s.sc, coalesce(c_all, 0) AS cnt,
        |    coalesce(d_ev, 0) AS d_ev
        |  FROM (SELECT DISTINCT dur FROM cells) d
        |  CROSS JOIN (SELECT DISTINCT sc FROM cells) s
        |  LEFT JOIN cells ON d.dur = cells.dur AND s.sc = cells.sc),
        |suf AS (SELECT *,
        |    CAST(sum(cnt) OVER (PARTITION BY sc) -
        |      sum(cnt) OVER (PARTITION BY sc ORDER BY dur) AS BIGINT)
        |      AS s_gt
        |  FROM grid),
        |split AS (SELECT *,
        |    CAST(coalesce(sum(s_gt) OVER (PARTITION BY dur
        |      ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      1 PRECEDING), 0) AS BIGINT) AS p_lt,
        |    CAST(sum(s_gt) OVER (PARTITION BY dur) AS BIGINT) AS t_all
        |  FROM suf)
        |SELECT CAST(sum(d_ev * (t_all - p_lt - s_gt)) AS BIGINT)
        |    AS conc,
        |  CAST(sum(d_ev * s_gt) AS BIGINT) AS tied,
        |  CAST(sum(d_ev * p_lt) AS BIGINT) AS disc,
        |  CAST(sum(d_ev * t_all) AS BIGINT) AS comparable,
        |  round((CAST(sum(d_ev * (t_all - p_lt - s_gt)) AS DOUBLE) +
        |    0.5 * sum(d_ev * s_gt)) / sum(d_ev * t_all), 6) AS c_index
        |FROM split WHERE d_ev > 0""".stripMargin,

    "q347_tost_equivalence" ->
      """WITH g AS (SELECT c_mktsegment = 'BUILDING' AS is_a,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS s1,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT) *
        |      CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS s2
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  GROUP BY 1),
        |wide AS (SELECT
        |    CAST(sum(CASE WHEN is_a THEN n ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN is_a THEN s1 ELSE 0 END) AS BIGINT)
        |      AS sa1,
        |    CAST(sum(CASE WHEN is_a THEN s2 ELSE 0 END) AS BIGINT)
        |      AS sa2,
        |    CAST(sum(CASE WHEN NOT is_a THEN n ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN NOT is_a THEN s1 ELSE 0 END) AS BIGINT)
        |      AS sb1,
        |    CAST(sum(CASE WHEN NOT is_a THEN s2 ELSE 0 END) AS BIGINT)
        |      AS sb2
        |  FROM g),
        |base AS (SELECT na, nb,
        |    CAST(sa1 AS DOUBLE) / na - CAST(sb1 AS DOUBLE) / nb
        |      AS diff,
        |    sqrt((CAST(na AS DOUBLE) * CAST(sa2 AS DOUBLE) -
        |      CAST(sa1 AS DOUBLE) * sa1) /
        |      (CAST(na AS DOUBLE) * (na - 1)) / na +
        |      (CAST(nb AS DOUBLE) * CAST(sb2 AS DOUBLE) -
        |      CAST(sb1 AS DOUBLE) * sb1) /
        |      (CAST(nb AS DOUBLE) * (nb - 1)) / nb) AS se
        |  FROM wide),
        |zs AS (SELECT *, (diff + 5000.0) / se AS z1,
        |    (5000.0 - diff) / se AS z2 FROM base),
        |ps AS (SELECT *,
        |    abs(z1) / sqrt(2.0) AS x1, abs(z2) / sqrt(2.0) AS x2,
        |    1.0 / (1.0 + 0.3275911 * (abs(z1) / sqrt(2.0))) AS t1,
        |    1.0 / (1.0 + 0.3275911 * (abs(z2) / sqrt(2.0))) AS t2
        |  FROM zs),
        |pv AS (SELECT na, nb, diff, se,
        |    CASE WHEN z1 >= 0 THEN h1 ELSE 1.0 - h1 END AS p_lower,
        |    CASE WHEN z2 >= 0 THEN h2 ELSE 1.0 - h2 END AS p_upper
        |  FROM (SELECT *,
        |      (0.254829592 * t1 - 0.284496736 * t1 * t1 +
        |       1.421413741 * t1 * t1 * t1 - 1.453152027 * t1 * t1 *
        |       t1 * t1 + 1.061405429 * t1 * t1 * t1 * t1 * t1) *
        |       exp(-x1 * x1) / 2 AS h1,
        |      (0.254829592 * t2 - 0.284496736 * t2 * t2 +
        |       1.421413741 * t2 * t2 * t2 - 1.453152027 * t2 * t2 *
        |       t2 * t2 + 1.061405429 * t2 * t2 * t2 * t2 * t2) *
        |       exp(-x2 * x2) / 2 AS h2
        |    FROM ps))
        |SELECT na AS n_building, nb AS n_machinery,
        |  round(diff, 2) AS diff_dollars, round(se, 2) AS se,
        |  round(p_lower, 6) AS p_lower, round(p_upper, 6) AS p_upper,
        |  greatest(round(p_lower, 6), round(p_upper, 6)) AS p_tost,
        |  greatest(round(p_lower, 6), round(p_upper, 6)) < 0.05
        |    AS equivalent
        |FROM pv""".stripMargin,

    "q348_rmst" ->
      """WITH maxd AS (SELECT max(o_orderdate) AS mx FROM orders),
        |cust AS (SELECT date_diff('day', first, last) AS dur,
        |    date_diff('day', last, mx) > 90 AS event
        |  FROM (SELECT min(o_orderdate) AS first,
        |      max(o_orderdate) AS last
        |    FROM orders GROUP BY o_custkey) CROSS JOIN maxd),
        |bydur AS (SELECT dur, CAST(count(*) AS BIGINT) AS c_all,
        |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_events
        |  FROM cust GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_total
        |  FROM bydur),
        |risk AS (SELECT dur, d_events,
        |    n_total - (CAST(sum(c_all) OVER (ORDER BY dur) AS BIGINT)
        |      - c_all) AS n_risk
        |  FROM bydur CROSS JOIN tot),
        |surv AS (SELECT dur,
        |    exp(sum(ln(CAST(n_risk - d_events AS DOUBLE) / n_risk))
        |      OVER (ORDER BY dur)) AS s
        |  FROM risk WHERE d_events > 0 AND n_risk > d_events),
        |steps AS (SELECT dur, s,
        |    coalesce(lag(dur) OVER (ORDER BY dur), 0) AS pd,
        |    coalesce(lag(s) OVER (ORDER BY dur), 1.0) AS ps
        |  FROM surv WHERE dur <= 365),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_steps,
        |    sum(ps * CAST(dur - pd AS DOUBLE)) AS area,
        |    CAST(max(dur) AS BIGINT) AS last_t
        |  FROM steps),
        |slast AS (SELECT s AS s_last FROM steps
        |  ORDER BY dur DESC LIMIT 1)
        |SELECT CAST(365 AS BIGINT) AS tau_days, n_steps,
        |  round(area + s_last * CAST(365 - last_t AS DOUBLE), 4)
        |    AS rmst_days
        |FROM agg CROSS JOIN slast""".stripMargin,

    "q349_capture_recapture" ->
      """WITH flags AS (SELECT o_custkey,
        |    CAST(max(CASE WHEN year(o_orderdate) = 1995 THEN 1
        |      ELSE 0 END) AS BIGINT) AS a,
        |    CAST(max(CASE WHEN year(o_orderdate) = 1996 THEN 1
        |      ELSE 0 END) AS BIGINT) AS b
        |  FROM orders GROUP BY 1),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_ever,
        |    CAST(sum(a) AS BIGINT) AS n1,
        |    CAST(sum(b) AS BIGINT) AS n2,
        |    CAST(sum(a * b) AS BIGINT) AS m
        |  FROM flags)
        |SELECT n_ever, n1, n2, m,
        |  round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 2)
        |    AS n_hat_chapman,
        |  round(sqrt(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) * (n1 - m) *
        |    (n2 - m) / (CAST(m + 1 AS DOUBLE) * (m + 1) * (m + 2))),
        |    2) AS se
        |FROM c""".stripMargin,

    "q350_xirr_bisection" -> {
      // 30 generated bisection CTEs — the same fixed-operand NPV
      // expression and interval update the engine folds
      val npvExpr = (1 to 12).foldLeft("CAST(c0 AS DOUBLE) * -1.0")(
        (acc, mm) => s"$acc + cf$mm / power(mid + 1.0, $mm.0)")
      val cfCols = (1 to 12).map(mm => s"cf$mm").mkString(", ")
      val rawAggs = (1 to 12).map(mm =>
        s"CAST(sum(CASE WHEN month(o_orderdate) = $mm THEN " +
          s"CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) // 1000 " +
          s"AS BIGINT) AS cf$mm").mkString(",\n    ")
      val steps = (1 to 30).map { k =>
        s"""b$k AS (SELECT sg, c0, $cfCols,
           |    CASE WHEN pos THEN mid ELSE lo END AS lo,
           |    CASE WHEN pos THEN hi ELSE mid END AS hi
           |  FROM (SELECT *, ($npvExpr) > 0 AS pos
           |    FROM (SELECT *, (lo + hi) / 2 AS mid FROM b${k - 1})))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH seg AS (SELECT o_orderdate, o_totalprice, c_mktsegment
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |c0t AS (SELECT c_mktsegment AS sg,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000
        |      AS BIGINT) AS c0
        |  FROM seg WHERE year(o_orderdate) = 1996
        |    AND month(o_orderdate) >= 7 GROUP BY 1),
        |cf AS (SELECT c_mktsegment AS sg,
        |    $rawAggs
        |  FROM seg WHERE year(o_orderdate) = 1997 GROUP BY 1),
        |b0 AS (SELECT c0t.sg, c0, $cfCols, 0.0 AS lo, 1.0 AS hi
        |  FROM c0t JOIN cf ON c0t.sg = cf.sg),
        |$steps
        |SELECT sg AS segment, c0 AS c0_kusd,
        |  ${(1 to 12).map(mm => s"cf$mm").mkString(" + ")}
        |    AS total_return_kusd,
        |  round((lo + hi) / 2, 8) AS irr_monthly,
        |  round(power(round((lo + hi) / 2, 8) + 1.0, 12.0) - 1.0, 6)
        |    AS irr_annual
        |FROM b30 ORDER BY segment""".stripMargin
    },

    "q313_threshold_opt" ->
      """WITH y AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
        |  FROM orders GROUP BY 1),
        |base AS (SELECT
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x,
        |    CASE WHEN coalesce(n_ord, 0) > 5 THEN 1 ELSE 0 END AS pos
        |  FROM customer LEFT JOIN y ON c_custkey = o_custkey),
        |byval AS (SELECT x, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(pos) AS BIGINT) AS pv
        |  FROM base GROUP BY 1),
        |cum AS (SELECT x, CAST(sum(nv) OVER w AS BIGINT) AS cn,
        |    CAST(sum(pv) OVER w AS BIGINT) AS cp
        |  FROM byval WINDOW w AS (ORDER BY x)),
        |tot AS (SELECT CAST(sum(nv) AS BIGINT) AS n,
        |    CAST(sum(pv) AS BIGINT) AS p FROM byval),
        |pts AS (SELECT x AS thr, p - cp AS tp,
        |    (n - cn) - (p - cp) AS fp, cp AS fn,
        |    round(2.0 * (p - cp) /
        |      (2.0 * (p - cp) + ((n - cn) - (p - cp)) + cp), 6) AS f1,
        |    round(CAST(p - cp AS DOUBLE) / p -
        |      CAST((n - cn) - (p - cp) AS DOUBLE) / (n - p), 6) AS j
        |  FROM cum CROSS JOIN tot),
        |bf AS (SELECT thr AS f1_threshold_cents, f1, tp, fp, fn
        |  FROM (SELECT *, row_number() OVER (ORDER BY f1 DESC, thr)
        |      AS rk FROM pts) WHERE rk = 1),
        |bj AS (SELECT thr AS youden_threshold_cents, j AS youden_j
        |  FROM (SELECT *, row_number() OVER (ORDER BY j DESC, thr)
        |      AS rk FROM pts) WHERE rk = 1)
        |SELECT * FROM bf CROSS JOIN bj""".stripMargin,

    "q314_records_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT day, cents,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
        |    CASE WHEN cents > coalesce(max(cents) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      -9223372036854775808) THEN 1 ELSE 0 END AS isrec
        |  FROM daily)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(isrec) AS BIGINT) AS n_records,
        |  round(sum(1.0 / k), 4) AS expected_records,
        |  round((sum(isrec) - sum(1.0 / k)) /
        |    sqrt(sum(1.0 / k - 1.0 / (k * k))), 4) AS z,
        |  strftime(max(CASE WHEN isrec = 1 THEN day END), '%Y-%m-%d')
        |    AS last_record_day
        |FROM idx""".stripMargin,

    "q315_erlang_c" ->
      """WITH span AS (SELECT CAST(count(*) AS BIGINT) * 3.6e9 /
        |      (max(epoch_us(ts)) - min(epoch_us(ts))) AS lam_hr
        |  FROM events),
        |ld AS (SELECT lam_hr, lam_hr * 0.05 AS a FROM span),
        |cs AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS c),
        |ks AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS k),
        |sums AS (SELECT c, a, sum(pow(a, CAST(k AS DOUBLE)) /
        |      CAST(factorial(CAST(k AS INTEGER)) AS DOUBLE)) AS s0
        |  FROM cs JOIN ks ON k < c CROSS JOIN ld
        |  GROUP BY 1, 2),
        |pt AS (SELECT c, a, s0,
        |    pow(a, CAST(c AS DOUBLE)) /
        |      CAST(factorial(CAST(c AS INTEGER)) AS DOUBLE) AS tc,
        |    a / CAST(c AS DOUBLE) AS rho
        |  FROM sums)
        |SELECT c, round(a, 4) AS offered_erlangs, round(rho, 4) AS rho,
        |  round(tc / ((1.0 - rho) * s0 + tc), 6) AS p_wait,
        |  round(tc / ((1.0 - rho) * s0 + tc) * 3.0 /
        |    (CAST(c AS DOUBLE) - a), 6) AS asa_minutes
        |FROM pt WHERE rho < 1 ORDER BY c""".stripMargin,

    "q310_control_chart" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |d0 AS (SELECT min(day) AS dmin FROM daily),
        |weeks AS (SELECT datediff('day', dmin, day) // 7 AS wk,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(cents) AS BIGINT) AS tot,
        |    CAST(max(cents) - min(cents) AS BIGINT) AS r
        |  FROM daily CROSS JOIN d0 GROUP BY 1 HAVING count(*) = 7),
        |lims AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks,
        |    CAST(sum(tot) AS DOUBLE) / (count(*) * 7) AS xbb,
        |    CAST(sum(r) AS DOUBLE) / count(*) AS rbar
        |  FROM weeks),
        |l2 AS (SELECT n_weeks, xbb, rbar, xbb + 0.419 * rbar AS ucl,
        |    xbb - 0.419 * rbar AS lcl, 1.924 * rbar AS ucl_r FROM lims)
        |SELECT any_value(n_weeks) AS n_weeks,
        |  round(any_value(xbb) / 100, 2) AS center_daily,
        |  round(any_value(ucl) / 100, 2) AS ucl_daily,
        |  round(any_value(lcl) / 100, 2) AS lcl_daily,
        |  CAST(sum(CASE WHEN CAST(tot AS DOUBLE) > 7.0 * ucl THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(sum(CASE WHEN CAST(tot AS DOUBLE) < 7.0 * lcl THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_below,
        |  CAST(sum(CASE WHEN CAST(r AS DOUBLE) > ucl_r THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_range_viol
        |FROM weeks CROSS JOIN l2""".stripMargin,

    "q311_fairness_audit" ->
      """WITH y AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
        |  FROM orders GROUP BY 1),
        |geo AS (SELECT c_custkey, r_name,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM geo),
        |med AS (SELECT x AS thr FROM (
        |    SELECT x, CAST(row_number() OVER (ORDER BY x, c_custkey)
        |      AS BIGINT) AS rk FROM geo) CROSS JOIN nt
        |  WHERE rk = n // 2),
        |base AS (SELECT r_name, x > thr AS pred,
        |    coalesce(n_ord, 0) > 5 AS pos
        |  FROM geo CROSS JOIN med
        |  LEFT JOIN y ON c_custkey = o_custkey),
        |byg AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS DOUBLE) /
        |      count(*) AS sr,
        |    CASE WHEN sum(CASE WHEN pos THEN 1 ELSE 0 END) = 0
        |      THEN NULL ELSE
        |      CAST(sum(CASE WHEN pred AND pos THEN 1 ELSE 0 END)
        |        AS DOUBLE) /
        |      sum(CASE WHEN pos THEN 1 ELSE 0 END) END AS tpr,
        |    CASE WHEN count(*) = sum(CASE WHEN pos THEN 1 ELSE 0 END)
        |      THEN NULL ELSE
        |      CAST(sum(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END)
        |        AS DOUBLE) /
        |      (count(*) - sum(CASE WHEN pos THEN 1 ELSE 0 END)) END
        |      AS fpr
        |  FROM base GROUP BY 1)
        |SELECT r_name, n, round(sr, 6) AS selection_rate,
        |  round(tpr, 6) AS tpr, round(fpr, 6) AS fpr,
        |  round(max(sr) OVER () - min(sr) OVER (), 6) AS parity_gap
        |FROM byg ORDER BY 1""".stripMargin,

    "q312_mobility_matrix" ->
      """WITH yearly AS (SELECT o_custkey, year(o_orderdate) AS yr,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        |  GROUP BY 1, 2),
        |q95 AS (SELECT o_custkey, 1 + ((rk - 1) * 5) // n AS q1995
        |  FROM (SELECT o_custkey, CAST(row_number() OVER (ORDER BY
        |      cents DESC, o_custkey) AS BIGINT) AS rk
        |    FROM yearly WHERE yr = 1995)
        |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM yearly
        |    WHERE yr = 1995)),
        |q96 AS (SELECT o_custkey, 1 + ((rk - 1) * 5) // n AS q1996
        |  FROM (SELECT o_custkey, CAST(row_number() OVER (ORDER BY
        |      cents DESC, o_custkey) AS BIGINT) AS rk
        |    FROM yearly WHERE yr = 1996)
        |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM yearly
        |    WHERE yr = 1996)),
        |cells AS (SELECT q1995, q1996, CAST(count(*) AS BIGINT) AS n
        |  FROM q95 JOIN q96 USING (o_custkey) GROUP BY 1, 2),
        |sh AS (SELECT *, CAST(n AS DOUBLE) /
        |      sum(n) OVER (PARTITION BY q1995) AS share
        |  FROM cells)
        |SELECT q1995, q1996, n, round(share, 4) AS share,
        |  round((5.0 - sum(CASE WHEN q1995 = q1996 THEN share ELSE 0.0
        |    END) OVER ()) / 4, 6) AS mobility
        |FROM sh ORDER BY 1, 2""".stripMargin,

    "q307_gravity_model" ->
      """WITH flows AS (SELECT c_nationkey AS cn, s_nationkey AS sn,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |cells AS (SELECT ln(CAST(cents AS DOUBLE)) AS y,
        |    ln(CAST(sum(cents) OVER (PARTITION BY cn) AS DOUBLE)) AS x1,
        |    ln(CAST(sum(cents) OVER (PARTITION BY sn) AS DOUBLE)) AS x2
        |  FROM flows),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(y) AS my,
        |    avg(x1) AS m1, avg(x2) AS m2,
        |    sum(x1 * x1) / count(*) AS e11,
        |    sum(x2 * x2) / count(*) AS e22,
        |    sum(x1 * x2) / count(*) AS e12,
        |    sum(x1 * y) / count(*) AS e1y,
        |    sum(x2 * y) / count(*) AS e2y
        |  FROM cells),
        |c AS (SELECT n, my, m1, m2, e11 - m1 * m1 AS c11,
        |    e22 - m2 * m2 AS c22, e12 - m1 * m2 AS c12,
        |    e1y - m1 * my AS c1y, e2y - m2 * my AS c2y
        |  FROM mom),
        |sol AS (SELECT n, my, m1, m2,
        |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
        |  FROM c)
        |SELECT n AS n_cells, round(b1, 6) AS beta_origin,
        |  round(b2, 6) AS beta_dest,
        |  round(my - b1 * m1 - b2 * m2, 4) AS intercept
        |FROM sol""".stripMargin,

    "q308_chain_ladder" ->
      """WITH base AS (SELECT
        |    year(o_orderdate) * 12 + month(o_orderdate) AS coh,
        |    year(l_shipdate) * 12 + month(l_shipdate) -
        |      year(o_orderdate) * 12 - month(o_orderdate) AS dev,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |clip AS (SELECT CAST(coh AS BIGINT) AS coh,
        |    CAST(dev AS BIGINT) AS dev, cents FROM base
        |  WHERE dev BETWEEN 0 AND 6),
        |tri AS (SELECT coh, dev, CAST(sum(cents) AS BIGINT) AS x
        |  FROM clip GROUP BY 1, 2),
        |mx AS (SELECT CAST(max(coh + dev) AS BIGINT) AS mcal FROM clip),
        |cum AS (SELECT coh, dev, CAST(sum(x) OVER (PARTITION BY coh
        |      ORDER BY dev ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        |  FROM tri),
        |fac AS (SELECT a.dev, CAST(count(*) AS BIGINT) AS n_cohorts,
        |    CAST(sum(a.c) AS BIGINT) AS sc,
        |    CAST(sum(b.c) AS BIGINT) AS sn
        |  FROM cum a JOIN cum b ON a.coh = b.coh AND b.dev = a.dev + 1
        |  CROSS JOIN mx WHERE a.coh + a.dev + 1 <= mcal
        |  GROUP BY 1),
        |ff AS (SELECT dev, n_cohorts,
        |    CAST(sn AS DOUBLE) / sc AS f FROM fac)
        |SELECT dev AS dev_month, n_cohorts, round(f, 6) AS link_factor,
        |  round(exp(sum(ln(f)) OVER (ORDER BY dev DESC
        |    ROWS UNBOUNDED PRECEDING)), 6) AS to_ultimate
        |FROM ff ORDER BY 1""".stripMargin,

    "q309_rake_keywords" ->
      s"""WITH norm AS (SELECT doc_id, $ntoksSql AS ntoks
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(ntoks) AS tok,
        |    CAST(generate_subscripts(ntoks, 1) AS BIGINT) AS pos
        |  FROM norm),
        |marked AS (SELECT *, tok IN ('the', 'a', 'an', 'and', 'or',
        |    'of', 'to', 'in', 'is', 'on', 'for', 'with', 'as', 'by',
        |    'at', 'it', 'this', 'that', 'be', 'are', 'was', 'from')
        |    AS is_stop
        |  FROM toks),
        |runs AS (SELECT *, CAST(sum(CASE WHEN is_stop THEN 1 ELSE 0
        |      END) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM marked),
        |words AS (SELECT doc_id, pos, tok, run FROM runs
        |  WHERE NOT is_stop),
        |wl AS (SELECT *, CAST(count(*) OVER (PARTITION BY doc_id, run)
        |      AS BIGINT) AS plen
        |  FROM words),
        |ws AS (SELECT tok, CAST(sum(plen) AS DOUBLE) / count(*) AS ws
        |  FROM wl GROUP BY 1),
        |ph AS (SELECT doc_id, run,
        |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    CAST(count(*) AS BIGINT) AS n_words,
        |    round(sum(ws), 4) AS score_r
        |  FROM wl JOIN ws USING (tok) GROUP BY 1, 2)
        |SELECT rank, phrase, doc_id, n_words, score_r AS score
        |FROM (SELECT *, CAST(row_number() OVER (ORDER BY score_r DESC,
        |    phrase, doc_id, run) AS BIGINT) AS rank FROM ph)
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q304_circular_stats" ->
      """WITH ev AS (SELECT event_type,
        |    2 * pi() * ((epoch_us(ts) // 60000000) % 1440) / 1440.0
        |      AS theta
        |  FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(cos(theta)) AS c, sum(sin(theta)) AS ss
        |  FROM ev GROUP BY 1),
        |rr AS (SELECT event_type, n,
        |    sqrt(c * c + ss * ss) / n AS r, atan2(ss, c) AS ang
        |  FROM g)
        |SELECT event_type, n, round(r, 6) AS resultant_r,
        |  round((CASE WHEN ang < 0 THEN ang + 2 * pi() ELSE ang END) *
        |    (24.0 / (2 * pi())), 4) AS mean_hour,
        |  round(n * r * r, 4) AS rayleigh_z,
        |  round(exp(-(n * r * r)), 6) AS p_uniform
        |FROM rr ORDER BY 1""".stripMargin,

    "q305_twfe" ->
      """WITH panel AS (SELECT p_brand, year(l_shipdate) AS yr,
        |    ln(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
        |      AS BIGINT)) AS DOUBLE)) AS y,
        |    ln(CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
        |      AS DOUBLE)) AS x
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |g AS (SELECT avg(y) AS gy, avg(x) AS gx,
        |    CAST(count(*) AS BIGINT) AS n_cells FROM panel),
        |dm AS (SELECT n_cells,
        |    y - avg(y) OVER (PARTITION BY p_brand) -
        |      avg(y) OVER (PARTITION BY yr) + gy AS yt,
        |    x - avg(x) OVER (PARTITION BY p_brand) -
        |      avg(x) OVER (PARTITION BY yr) + gx AS xt
        |  FROM panel CROSS JOIN g)
        |SELECT n_cells, round(sum(xt * yt) / sum(xt * xt), 6)
        |    AS twfe_slope,
        |  round(sum(xt * yt) * sum(xt * yt) /
        |    (sum(xt * xt) * sum(yt * yt)), 6) AS within_r2
        |FROM dm GROUP BY 1""".stripMargin,

    "q306_root_cause" ->
      """WITH geo AS (SELECT c_mktsegment AS seg, r_name AS reg,
        |    month(o_orderdate) = 7 AS before,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1995-09-01 00:00:00'),
        |stacked AS (SELECT 'segment' AS dimension, seg AS value,
        |    before, cents FROM geo
        |  UNION ALL SELECT 'region', reg, before, cents FROM geo),
        |cells AS (SELECT dimension, value,
        |    CAST(sum(CASE WHEN before THEN cents ELSE 0 END) AS BIGINT)
        |      AS f,
        |    CAST(sum(CASE WHEN NOT before THEN cents ELSE 0 END)
        |      AS BIGINT) AS a
        |  FROM stacked GROUP BY 1, 2),
        |tt AS (SELECT *, CAST(sum(f) OVER (PARTITION BY dimension)
        |      AS BIGINT) AS tf,
        |    CAST(sum(a) OVER (PARTITION BY dimension) AS BIGINT) AS ta
        |  FROM cells)
        |SELECT dimension, value, f AS f_cents, a AS a_cents,
        |  round(CAST(a - f AS DOUBLE) / (ta - tf), 4)
        |    AS explanatory_power,
        |  round((CASE WHEN f = 0 THEN 0.0 ELSE
        |      CAST(f AS DOUBLE) / tf *
        |      ln(2.0 * (CAST(f AS DOUBLE) / tf) /
        |        (CAST(f AS DOUBLE) / tf + CAST(a AS DOUBLE) / ta)) END +
        |    CASE WHEN a = 0 THEN 0.0 ELSE
        |      CAST(a AS DOUBLE) / ta *
        |      ln(2.0 * (CAST(a AS DOUBLE) / ta) /
        |        (CAST(f AS DOUBLE) / tf + CAST(a AS DOUBLE) / ta)) END) *
        |    0.5, 6) AS js_surprise
        |FROM tt ORDER BY 1, 2""".stripMargin,

    "q301_conformal" ->
      """WITH seg AS (SELECT o_orderkey, c_mktsegment AS sg,
        |    o_orderkey % 2 = 0 AS cal,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |model AS (SELECT sg,
        |    CAST(sum(cents) AS DOUBLE) / count(*) AS m
        |  FROM seg WHERE cal GROUP BY 1),
        |resid AS (SELECT o_orderkey, cal, abs(cents - m) AS r
        |  FROM seg JOIN model USING (sg)),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM resid
        |  WHERE cal),
        |qhat AS (SELECT n_cal, r AS qhat FROM (
        |    SELECT r, CAST(row_number() OVER (ORDER BY r, o_orderkey)
        |      AS BIGINT) AS rk
        |    FROM resid WHERE cal) CROSS JOIN nc
        |  WHERE rk = (9 * (n_cal + 1) + 9) // 10)
        |SELECT any_value(n_cal) AS n_cal,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  round(any_value(qhat), 2) AS qhat_cents,
        |  round(avg(CASE WHEN r <= qhat THEN 1.0 ELSE 0.0 END), 4)
        |    AS coverage
        |FROM resid CROSS JOIN qhat WHERE NOT cal""".stripMargin,

    "q302_wasserstein" ->
      """WITH geo AS (SELECT
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    r_name = 'ASIA' AS is_a
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name IN ('ASIA', 'EUROPE')),
        |byval AS (SELECT v,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM geo GROUP BY 1),
        |cum AS (SELECT v,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cca,
        |    CAST(sum(cb) OVER w AS BIGINT) AS ccb,
        |    lead(v) OVER (ORDER BY v) AS vn
        |  FROM byval WINDOW w AS (ORDER BY v)),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM byval)
        |SELECT na AS n_a, nb AS n_b,
        |  round(CAST(sum(abs(cca * nb - ccb * na) * (vn - v)) AS DOUBLE)
        |    / (na * nb) / 100.0, 4) AS w1_dollars
        |FROM cum CROSS JOIN tot WHERE vn IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q303_term_burstiness" ->
      s"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS d
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest($ntoksSql) AS term
        |  FROM documents),
        |perdoc AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2),
        |terms AS (SELECT term, CAST(sum(c) AS BIGINT) AS cf,
        |    CAST(count(*) AS BIGINT) AS df
        |  FROM perdoc GROUP BY 1),
        |ranked AS (SELECT *, CAST(row_number()
        |      OVER (ORDER BY cf DESC, term) AS BIGINT) AS rank
        |  FROM terms)
        |SELECT rank, term, cf, df,
        |  round(CAST(cf AS DOUBLE) / df, 4) AS adaptation,
        |  round(d * (1.0 - exp(-(CAST(cf AS DOUBLE) / d))), 2)
        |    AS df_pred,
        |  round(d * (1.0 - exp(-(CAST(cf AS DOUBLE) / d))) / df, 4)
        |    AS burstiness
        |FROM ranked CROSS JOIN nd WHERE rank <= 10
        |ORDER BY rank""".stripMargin,

    "q298_pca_2d" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS ydol
        |  FROM orders GROUP BY 1),
        |base AS (SELECT
        |    CAST(floor(c_acctbal + 0.5) AS BIGINT) AS x,
        |    coalesce(ydol, 0) // 1000 AS y
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM base),
        |c AS (SELECT n, n * sxx - sx * sx AS cxx,
        |    n * syy - sy * sy AS cyy, n * sxy - sx * sy AS cxy
        |  FROM mom),
        |d AS (SELECT n, cxx, cyy, cxy,
        |    sqrt(pow(CAST(cxx AS DOUBLE) - cyy, 2) +
        |      4.0 * cxy * cxy) AS disc,
        |    CAST(n AS DOUBLE) * (n - 1) AS den
        |  FROM c)
        |SELECT n,
        |  round(cxy / sqrt(CAST(cxx AS DOUBLE) * cyy), 6) AS corr,
        |  round(((cxx + cyy) + disc) / (2.0 * den), 4) AS lambda1,
        |  round(((cxx + cyy) - disc) / (2.0 * den), 4) AS lambda2,
        |  round(((cxx + cyy) + disc) /
        |    (2.0 * CAST(cxx + cyy AS DOUBLE)), 6) AS evr1,
        |  round(0.5 * atan2(2.0 * cxy, CAST(cxx - cyy AS DOUBLE)) *
        |    (180.0 / pi()), 4) AS pc1_angle_deg
        |FROM d""".stripMargin,

    "q299_morans_i" ->
      """WITH attr AS (SELECT p_brand,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS DOUBLE) / (count(*) * 100.0) AS price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |xbar AS (SELECT avg(price) AS mu, CAST(count(*) AS BIGINT) AS nb
        |  FROM attr),
        |z AS (SELECT p_brand, price - mu AS z, nb
        |  FROM attr CROSS JOIN xbar),
        |items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (SELECT ba.p_brand AS b1, bb.p_brand AS b2,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  JOIN part ba ON a.l_partkey = ba.p_partkey
        |  JOIN part bb ON b.l_partkey = bb.p_partkey
        |  WHERE ba.p_brand <> bb.p_brand
        |  GROUP BY 1, 2),
        |cr AS (SELECT any_value(z2.nb) AS nb,
        |    2.0 * sum(w) AS sw,
        |    2.0 * sum(w * z1.z * z2.z) AS wzz
        |  FROM pairs JOIN z z1 ON b1 = z1.p_brand
        |  JOIN z z2 ON b2 = z2.p_brand),
        |den AS (SELECT sum(z * z) AS zz FROM z)
        |SELECT nb AS n_brands, CAST(sw AS BIGINT) AS sum_w,
        |  round(nb * wzz / (sw * zz), 4) AS morans_i,
        |  round(-1.0 / (nb - 1), 4) AS expected_i
        |FROM cr CROSS JOIN den""".stripMargin,

    "q300_winners_curse" ->
      """WITH seg AS (SELECT c_mktsegment AS segment,
        |    o_orderkey % 2 = 0 AS in_a,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |bysplit AS (SELECT segment,
        |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN in_a THEN cents ELSE 0 END) AS DOUBLE) /
        |      sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS mean_a,
        |    CAST(sum(CASE WHEN NOT in_a THEN cents ELSE 0 END)
        |        AS DOUBLE) /
        |      sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS mean_b
        |  FROM seg GROUP BY 1)
        |SELECT segment AS winner_segment, n_a, n_b,
        |  round(mean_a, 2) AS mean_a_cents,
        |  round(mean_b, 2) AS mean_b_cents,
        |  round(mean_a - mean_b, 2) AS optimism_cents
        |FROM (SELECT *, row_number() OVER (ORDER BY mean_a DESC,
        |    segment) AS rk FROM bysplit)
        |WHERE rk = 1""".stripMargin,

    "q295_mediation" ->
      """WITH spend AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS ydol
        |  FROM orders GROUP BY 1),
        |base AS (SELECT
        |    CAST(floor(c_acctbal + 0.5) AS BIGINT) AS x,
        |    CAST(coalesce(m, 0) AS BIGINT) AS m,
        |    coalesce(ydol, 0) // 1000 AS y
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(m) AS BIGINT) AS sm,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(m * m) AS BIGINT) AS smm,
        |    CAST(sum(x * m) AS BIGINT) AS sxm,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(m * y) AS BIGINT) AS smy
        |  FROM base),
        |c AS (SELECT n, n * sxx - sx * sx AS cxx,
        |    n * smm - sm * sm AS cmm, n * sxm - sx * sm AS cxm,
        |    n * sxy - sx * sy AS cxy, n * smy - sm * sy AS cmy
        |  FROM mom),
        |sol AS (SELECT n, CAST(cxm AS DOUBLE) / cxx AS a,
        |    (CAST(cxx AS DOUBLE) * cmy - CAST(cxm AS DOUBLE) * cxy) /
        |      (CAST(cxx AS DOUBLE) * cmm - CAST(cxm AS DOUBLE) * cxm)
        |      AS b,
        |    (CAST(cmm AS DOUBLE) * cxy - CAST(cxm AS DOUBLE) * cmy) /
        |      (CAST(cxx AS DOUBLE) * cmm - CAST(cxm AS DOUBLE) * cxm)
        |      AS cp,
        |    CAST(cxy AS DOUBLE) / cxx AS ctot
        |  FROM c)
        |SELECT n, round(a, 6) AS a_mx, round(b, 6) AS b_ym,
        |  round(cp, 6) AS direct, round(ctot, 6) AS total,
        |  round(a * b, 6) AS indirect,
        |  round(a * b / ctot, 4) AS prop_mediated
        |FROM sol""".stripMargin,

    "q296_empirical_bayes" ->
      """WITH parts AS (SELECT l_partkey,
        |    CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_returns
        |  FROM lineitem GROUP BY 1 HAVING count(*) >= 5),
        |rates AS (SELECT CAST(n_returns AS DOUBLE) / n_lines AS r
        |  FROM parts),
        |p0 AS (SELECT CAST(count(*) AS BIGINT) AS np, avg(r) AS mu,
        |    sum(r * r) / count(*) AS m2 FROM rates),
        |p1 AS (SELECT np, mu, m2 - mu * mu AS v FROM p0),
        |p2 AS (SELECT np, mu, mu * (1.0 - mu) / v - 1 AS k FROM p1),
        |prior AS (SELECT np, mu * k AS alpha, (1.0 - mu) * k AS beta
        |  FROM p2),
        |shrunk AS (SELECT l_partkey, n_lines, n_returns,
        |    round(CAST(n_returns AS DOUBLE) / n_lines, 6) AS raw_rate,
        |    round((n_returns + alpha) / (n_lines + alpha + beta), 6)
        |      AS shrunk_rate,
        |    round(alpha, 4) AS prior_alpha, round(beta, 4) AS prior_beta
        |  FROM parts CROSS JOIN prior)
        |SELECT rank, l_partkey, n_lines, n_returns, raw_rate,
        |  shrunk_rate, prior_alpha, prior_beta
        |FROM (SELECT *, CAST(row_number() OVER (ORDER BY shrunk_rate
        |    DESC, n_lines DESC, l_partkey) AS BIGINT) AS rank
        |  FROM shrunk)
        |WHERE rank <= 5 ORDER BY rank""".stripMargin,

    "q297_overdispersion" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS total,
        |    CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, total,
        |  round(CAST(total AS DOUBLE) / n_days, 4) AS mean_per_day,
        |  round(CAST(n_days * ss - total * total AS DOUBLE) /
        |    (CAST(n_days AS DOUBLE) * (n_days - 1)), 4) AS variance,
        |  round(CAST(n_days * ss - total * total AS DOUBLE) /
        |    (CAST(n_days AS DOUBLE) * (n_days - 1)) /
        |    (CAST(total AS DOUBLE) / n_days), 4) AS dispersion_index
        |FROM g ORDER BY 1""".stripMargin,

    "q292_decision_stump" ->
      """WITH y AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
        |  FROM orders GROUP BY 1),
        |base AS (SELECT
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x,
        |    CASE WHEN coalesce(n_ord, 0) > 5 THEN 1 ELSE 0 END AS yv
        |  FROM customer LEFT JOIN y ON c_custkey = o_custkey),
        |ranked AS (SELECT x,
        |    CAST(row_number() OVER (ORDER BY x, yv) AS BIGINT) AS rk
        |  FROM base),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(yv) AS BIGINT) AS pos FROM base),
        |cuts AS (SELECT DISTINCT x AS thr
        |  FROM ranked CROSS JOIN n
        |  JOIN (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS i)
        |    ON rk = (i * n) // 10),
        |splits AS (SELECT thr,
        |    CAST(sum(CASE WHEN x <= thr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_l,
        |    CAST(sum(CASE WHEN x <= thr THEN yv ELSE 0 END) AS BIGINT)
        |      AS p_l
        |  FROM base CROSS JOIN cuts GROUP BY 1),
        |scored AS (SELECT thr, n_l, p_l, n - n_l AS n_r,
        |    pos - p_l AS p_r,
        |    round((1.0 - pow(CAST(pos AS DOUBLE) / n, 2) -
        |        pow(CAST(n - pos AS DOUBLE) / n, 2)) -
        |      (n_l * (1.0 - pow(CAST(p_l AS DOUBLE) / n_l, 2) -
        |          pow(CAST(n_l - p_l AS DOUBLE) / n_l, 2)) +
        |        (n - n_l) * (1.0 -
        |          pow(CAST(pos - p_l AS DOUBLE) / (n - n_l), 2) -
        |          pow(CAST((n - n_l) - (pos - p_l) AS DOUBLE) /
        |            (n - n_l), 2))) / n, 6) AS gini_gain
        |  FROM splits CROSS JOIN n
        |  WHERE n_l > 0 AND n - n_l > 0)
        |SELECT rank, thr AS threshold_cents, n_l, p_l, n_r, p_r,
        |  gini_gain
        |FROM (SELECT *, CAST(row_number()
        |    OVER (ORDER BY gini_gain DESC, thr) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 3 ORDER BY rank""".stripMargin,

    "q293_energy_distance" ->
      """WITH geo AS (SELECT
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    r_name = 'ASIA' AS is_a
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name IN ('ASIA', 'EUROPE')),
        |byval AS (SELECT v,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM geo GROUP BY 1),
        |cum AS (SELECT *,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cca,
        |    CAST(sum(cb) OVER w AS BIGINT) AS ccb,
        |    CAST(sum(v * ca) OVER w AS BIGINT) AS sva,
        |    CAST(sum(v * cb) OVER w AS BIGINT) AS svb
        |  FROM byval WINDOW w AS (ORDER BY v)),
        |terms AS (SELECT v, ca, cb, cca - ca AS ka, ccb - cb AS kb,
        |    sva - v * ca AS ta, svb - v * cb AS tb FROM cum),
        |agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    CAST(sum(ca * (v * kb - tb) + cb * (v * ka - ta)) AS BIGINT)
        |      AS sab,
        |    CAST(sum(ca * (v * ka - ta)) AS BIGINT) AS saa,
        |    CAST(sum(cb * (v * kb - tb)) AS BIGINT) AS sbb
        |  FROM terms)
        |SELECT n_a, n_b,
        |  round(sab / CAST(n_a * n_b AS DOUBLE), 4) AS e_xy,
        |  round(2.0 * saa / CAST(n_a * n_a AS DOUBLE), 4) AS e_xx,
        |  round(2.0 * sbb / CAST(n_b * n_b AS DOUBLE), 4) AS e_yy,
        |  round(2.0 * sab / CAST(n_a * n_b AS DOUBLE) -
        |    2.0 * saa / CAST(n_a * n_a AS DOUBLE) -
        |    2.0 * sbb / CAST(n_b * n_b AS DOUBLE), 4) AS energy_dist
        |FROM agg""".stripMargin,

    "q294_cuped" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
        |    CAST(floor(value + 0.5) AS BIGINT) AS dol FROM events),
        |t0 AS (SELECT CAST(min(us) AS BIGINT) AS smin FROM ev),
        |users AS (SELECT user_id % 2 = 0 AS treat,
        |    CAST(sum(CASE WHEN us < smin + 1296000000000 THEN dol
        |      ELSE 0 END) AS BIGINT) AS pre,
        |    CAST(sum(CASE WHEN us >= smin + 1296000000000 THEN dol
        |      ELSE 0 END) AS BIGINT) AS post
        |  FROM ev CROSS JOIN t0 GROUP BY user_id),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(pre) AS BIGINT) AS sp,
        |    CAST(sum(post) AS BIGINT) AS sq,
        |    CAST(sum(pre * pre) AS BIGINT) AS spp,
        |    CAST(sum(post * post) AS BIGINT) AS sqq,
        |    CAST(sum(pre * post) AS BIGINT) AS spq,
        |    CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nt,
        |    CAST(sum(CASE WHEN treat THEN pre ELSE 0 END) AS BIGINT)
        |      AS spt,
        |    CAST(sum(CASE WHEN treat THEN post ELSE 0 END) AS BIGINT)
        |      AS sqt
        |  FROM users),
        |sol AS (SELECT nt AS n_treat, n - nt AS n_ctrl,
        |    CAST(n * spq - sp * sq AS DOUBLE) /
        |      (n * spp - sp * sp) AS theta,
        |    CAST(n * spq - sp * sq AS DOUBLE) *
        |      (n * spq - sp * sq) /
        |      (CAST(n * spp - sp * sp AS DOUBLE) *
        |        (n * sqq - sq * sq)) AS r2,
        |    CAST(sqt AS DOUBLE) / nt -
        |      CAST(sq - sqt AS DOUBLE) / (n - nt) AS ate_raw,
        |    CAST(spt AS DOUBLE) / nt -
        |      CAST(sp - spt AS DOUBLE) / (n - nt) AS pre_imb
        |  FROM mom)
        |SELECT n_treat, n_ctrl, round(theta, 6) AS theta,
        |  round(r2, 6) AS var_reduction,
        |  round(ate_raw, 2) AS ate_raw_dollars,
        |  round(ate_raw - theta * pre_imb, 2) AS ate_cuped_dollars
        |FROM sol""".stripMargin,

    "q289_iv_wald" ->
      """WITH spend AS (SELECT o_custkey, CAST(count(*) AS BIGINT)
        |      AS n_ord,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |base AS (SELECT c_nationkey % 2 = 0 AS z,
        |    CASE WHEN coalesce(n_ord, 0) > 5 THEN 1 ELSE 0 END AS x,
        |    CAST(coalesce(cents, 0) AS BIGINT) AS y
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |g AS (SELECT z, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
        |  FROM base GROUP BY 1)
        |SELECT z1.n AS n_z1, z0.n AS n_z0,
        |  round(CAST(z1.sy AS DOUBLE) / z1.n -
        |    CAST(z0.sy AS DOUBLE) / z0.n, 4) AS itt_y_cents,
        |  round(CAST(z1.sx AS DOUBLE) / z1.n -
        |    CAST(z0.sx AS DOUBLE) / z0.n, 6) AS first_stage,
        |  round((CAST(z1.sy AS DOUBLE) / z1.n -
        |      CAST(z0.sy AS DOUBLE) / z0.n) /
        |    (CAST(z1.sx AS DOUBLE) / z1.n -
        |      CAST(z0.sx AS DOUBLE) / z0.n), 4) AS beta_iv_cents
        |FROM (SELECT * FROM g WHERE z) z1
        |CROSS JOIN (SELECT * FROM g WHERE NOT z) z0""".stripMargin,

    "q290_item_cf" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem),
        |pop AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS pop
        |  FROM items GROUP BY 1),
        |targets AS (SELECT l_partkey AS tgt, pop AS pop_t FROM (
        |  SELECT *, row_number() OVER (ORDER BY pop DESC, l_partkey)
        |      AS prk
        |  FROM pop) WHERE prk <= 10),
        |co AS (SELECT t.tgt, t.pop_t, b.l_partkey AS nbr,
        |    CAST(count(*) AS BIGINT) AS co
        |  FROM items a JOIN targets t ON a.l_partkey = t.tgt
        |  JOIN items b ON a.l_orderkey = b.l_orderkey
        |    AND b.l_partkey <> t.tgt
        |  GROUP BY 1, 2, 3),
        |scored AS (SELECT tgt, nbr, co.co, pop_t, p.pop AS pop_n,
        |    round(co.co / sqrt(CAST(pop_t * p.pop AS DOUBLE)), 6)
        |      AS cosine
        |  FROM co JOIN pop p ON nbr = p.l_partkey)
        |SELECT tgt AS p_partkey, rank, nbr AS neighbor, co, cosine
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY tgt
        |    ORDER BY cosine DESC, co DESC, nbr) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 3 ORDER BY p_partkey, rank""".stripMargin,

    "q291_block_bootstrap" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT cents,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS tpos
        |  FROM daily),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM idx),
        |pos AS (SELECT rep,
        |    1 + ((1103515245 * (rep * 1009 + k * 9176) + 12345) %
        |      2147483648) % (nd - 6) AS start
        |  FROM (SELECT CAST(unnest(range(1, 201)) AS BIGINT) AS rep)
        |  CROSS JOIN (SELECT CAST(unnest(range(0, 24)) AS BIGINT) AS k)
        |  CROSS JOIN st),
        |expand AS (SELECT rep, start + off AS tpos
        |  FROM pos CROSS JOIN
        |    (SELECT CAST(unnest(range(0, 7)) AS BIGINT) AS off)),
        |repsums AS (SELECT rep, CAST(sum(cents) AS BIGINT) AS sc,
        |    CAST(count(*) AS BIGINT) AS nb
        |  FROM expand JOIN idx USING (tpos) GROUP BY 1),
        |rk AS (SELECT *, row_number() OVER (ORDER BY sc, rep) AS rn
        |  FROM repsums),
        |ci AS (SELECT CAST(sum(CASE WHEN rn = 10 THEN sc END) AS BIGINT)
        |      AS lo,
        |    CAST(sum(CASE WHEN rn = 191 THEN sc END) AS BIGINT) AS hi,
        |    CAST(sum(sc) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS n_reps,
        |    CAST(any_value(nb) AS BIGINT) AS nb
        |  FROM rk)
        |SELECT nd AS n_days, n_reps,
        |  round(tot / (n_reps * nb * 100.0), 2) AS boot_mean_daily,
        |  round(lo / (nb * 100.0), 2) AS ci5_daily,
        |  round(hi / (nb * 100.0), 2) AS ci95_daily
        |FROM ci CROSS JOIN st""".stripMargin,

    "q286_littles_law" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |  FROM events),
        |lagd AS (SELECT user_id, event_id, us,
        |    CASE WHEN lag(us, 1) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) IS NULL
        |      OR us - lag(us, 1) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM ev),
        |sid AS (SELECT user_id, us, CAST(sum(new_sess)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM lagd),
        |sess AS (SELECT user_id, sid, CAST(min(us) AS BIGINT) AS s0,
        |    CAST(max(us) AS BIGINT) AS s1
        |  FROM sid GROUP BY 1, 2),
        |span AS (SELECT CAST(min(s0) AS BIGINT) AS smin,
        |    CAST(max(s1) AS BIGINT) AS smax,
        |    CAST(count(*) AS BIGINT) AS n_sess,
        |    CAST(sum(s1 - s0) AS BIGINT) AS dur_us FROM sess),
        |marks AS (SELECT h * 3600000000 AS us, CAST(2 AS BIGINT) AS pri,
        |    CAST(0 AS BIGINT) AS delta
        |  FROM span, unnest(generate_series(
        |    (smin + 3599999999) // 3600000000,
        |    smax // 3600000000)) AS t(h)),
        |deltas AS (SELECT s0 AS us, CAST(0 AS BIGINT) AS pri,
        |    CAST(1 AS BIGINT) AS delta FROM sess
        |  UNION ALL SELECT s1, 1, -1 FROM sess),
        |swept AS (SELECT pri, CAST(sum(delta) OVER (ORDER BY us * 4 + pri
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open
        |  FROM (SELECT * FROM marks UNION ALL SELECT * FROM deltas)),
        |sampled AS (SELECT CAST(count(*) AS BIGINT) AS n_marks,
        |    avg(CAST(open AS DOUBLE)) AS l_sampled
        |  FROM swept WHERE pri = 2)
        |SELECT n_sess AS n_sessions,
        |  round((smax - smin) / 3.6e9, 2) AS span_hours,
        |  round(n_sess * 3.6e9 / CAST(smax - smin AS DOUBLE), 4)
        |    AS lambda_per_hr,
        |  round(dur_us / (n_sess * 6e7), 4) AS w_minutes,
        |  round(dur_us / CAST(smax - smin AS DOUBLE), 4) AS l_exact,
        |  round(l_sampled, 4) AS l_sampled
        |FROM span CROSS JOIN sampled""".stripMargin,

    "q287_shapley_attribution" ->
      """WITH users AS (SELECT user_id,
        |    CAST(bit_or(CASE event_type WHEN 'click' THEN 1
        |      WHEN 'error' THEN 2 WHEN 'signup' THEN 4
        |      WHEN 'view' THEN 8 ELSE 0 END) AS BIGINT) AS mask,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cv
        |  FROM events GROUP BY 1),
        |cells AS (SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(cv) AS BIGINT) AS conv FROM users GROUP BY 1),
        |subsets AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS smask),
        |v AS (SELECT smask,
        |    CAST(coalesce(sum(conv), 0) AS BIGINT) AS v
        |  FROM subsets LEFT JOIN cells ON (mask & smask) = mask
        |  GROUP BY 1),
        |channels AS (SELECT ['click', 'error', 'signup', 'view'][i + 1]
        |      AS channel, CAST(1 << i AS BIGINT) AS bit
        |  FROM (SELECT unnest(range(0, 4)) AS i)),
        |pairs AS (SELECT channel, vs.smask, vs.v AS v_s, vsc.v AS v_sc,
        |    CASE WHEN bit_count(vs.smask) IN (0, 3) THEN 6 ELSE 2 END
        |      AS wnum
        |  FROM channels JOIN v vs ON (vs.smask & bit) = 0
        |  JOIN v vsc ON vsc.smask = (vs.smask | bit))
        |SELECT channel,
        |  round(sum((v_sc - v_s) * wnum) / 24.0, 6)
        |    AS shapley_conversions
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q288_ipf_raking" ->
      """WITH geo AS (SELECT c_mktsegment AS seg, r_name AS reg, c_acctbal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |popseg AS (SELECT seg, CAST(count(*) AS BIGINT) AS p_seg
        |  FROM geo GROUP BY 1),
        |popreg AS (SELECT reg, CAST(count(*) AS BIGINT) AS p_reg
        |  FROM geo GROUP BY 1),
        |popcell AS (SELECT seg, reg, CAST(count(*) AS BIGINT) AS n_pop
        |  FROM geo GROUP BY 1, 2),
        |c0 AS (SELECT seg, reg, CAST(count(*) AS BIGINT) AS n_sample,
        |    1.0 AS w
        |  FROM geo WHERE c_acctbal > 0 GROUP BY 1, 2),
        |a1 AS (SELECT seg, sum(n_sample * w) AS t_seg FROM c0 GROUP BY 1),
        |c1 AS (SELECT c0.seg, reg, n_sample, w * p_seg / t_seg AS w
        |  FROM c0 JOIN a1 USING (seg) JOIN popseg USING (seg)),
        |b1 AS (SELECT reg, sum(n_sample * w) AS t_reg FROM c1 GROUP BY 1),
        |c2 AS (SELECT seg, c1.reg, n_sample, w * p_reg / t_reg AS w
        |  FROM c1 JOIN b1 USING (reg) JOIN popreg USING (reg)),
        |a2 AS (SELECT seg, sum(n_sample * w) AS t_seg FROM c2 GROUP BY 1),
        |c3 AS (SELECT c2.seg, reg, n_sample, w * p_seg / t_seg AS w
        |  FROM c2 JOIN a2 USING (seg) JOIN popseg USING (seg)),
        |b2 AS (SELECT reg, sum(n_sample * w) AS t_reg FROM c3 GROUP BY 1),
        |c4 AS (SELECT seg, c3.reg, n_sample, w * p_reg / t_reg AS w
        |  FROM c3 JOIN b2 USING (reg) JOIN popreg USING (reg)),
        |a3 AS (SELECT seg, sum(n_sample * w) AS t_seg FROM c4 GROUP BY 1),
        |c5 AS (SELECT c4.seg, reg, n_sample, w * p_seg / t_seg AS w
        |  FROM c4 JOIN a3 USING (seg) JOIN popseg USING (seg)),
        |b3 AS (SELECT reg, sum(n_sample * w) AS t_reg FROM c5 GROUP BY 1),
        |c6 AS (SELECT seg, c5.reg, n_sample, w * p_reg / t_reg AS w
        |  FROM c5 JOIN b3 USING (reg) JOIN popreg USING (reg))
        |SELECT seg AS c_mktsegment, reg AS r_name, n_sample, n_pop,
        |  round(w, 6) AS weight, round(n_sample * w, 2) AS weighted_n
        |FROM c6 JOIN popcell USING (seg, reg)
        |ORDER BY 1, 2""".stripMargin,

    "q283_newsvendor" ->
      """WITH daily AS (SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
        |      AS d
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |byval AS (SELECT p_brand, d, CAST(count(*) AS BIGINT) AS cnt
        |  FROM daily GROUP BY 1, 2),
        |cum AS (SELECT *, CAST(sum(cnt)
        |      OVER (PARTITION BY p_brand ORDER BY d) AS BIGINT) AS cum
        |  FROM byval),
        |n AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1),
        |qstar AS (SELECT p_brand, CAST(min(d) AS BIGINT) AS q_star
        |  FROM cum JOIN n USING (p_brand)
        |  WHERE 4 * cum >= 3 * n_days GROUP BY 1)
        |SELECT p_brand, CAST(sum(cnt) AS BIGINT) AS n_days,
        |  any_value(q_star) AS q_star,
        |  round(sum(cnt * (3 * greatest(d - q_star, 0) +
        |      greatest(q_star - d, 0))) / CAST(sum(cnt) AS DOUBLE), 4)
        |    AS avg_daily_cost
        |FROM byval JOIN qstar USING (p_brand)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q284_gumbel_returns" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |blocks AS (SELECT date_trunc('month', day) AS mth,
        |    CAST(max(cents // 100) AS BIGINT) AS mx
        |  FROM daily GROUP BY 1),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(mx) AS BIGINT) AS s,
        |    CAST(sum(mx * mx) AS BIGINT) AS ss FROM blocks),
        |fit0 AS (SELECT n, CAST(s AS DOUBLE) / n AS xbar,
        |    sqrt(CAST(n * ss - s * s AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * (n - 1))) AS sd
        |  FROM mom),
        |fit1 AS (SELECT n AS n_blocks, sd * sqrt(6.0) / pi() AS beta,
        |    xbar FROM fit0),
        |fit AS (SELECT n_blocks,
        |    xbar - 0.5772156649015329 * beta AS mu, beta FROM fit1)
        |SELECT n_blocks, round(mu, 2) AS gumbel_mu,
        |  round(beta, 2) AS gumbel_beta,
        |  round(mu - beta * ln(-ln(1.0 - 1.0 / 12)), 2) AS rl_12mo,
        |  round(mu - beta * ln(-ln(1.0 - 1.0 / 60)), 2) AS rl_60mo
        |FROM fit""".stripMargin,

    "q285_rdd" ->
      """WITH y AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |side AS (SELECT x >= 0 AS is_right, x,
        |    CAST(coalesce(cnt, 0) AS BIGINT) AS yv
        |  FROM (SELECT c_custkey,
        |      CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x
        |    FROM customer) c
        |  LEFT JOIN y ON c_custkey = o_custkey
        |  WHERE x >= -100000 AND x < 100000),
        |fits AS (SELECT is_right, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
        |    CAST(sum(x * yv) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM side GROUP BY 1),
        |sol AS (SELECT is_right, n,
        |    (CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy) /
        |      (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |      AS icpt,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |      (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |      AS slope
        |  FROM fits)
        |SELECT l.n AS n_left, r.n AS n_right,
        |  round(l.icpt, 4) AS intercept_left,
        |  round(r.icpt, 4) AS intercept_right,
        |  round(1e7 * l.slope, 4) AS slope_left_e7,
        |  round(1e7 * r.slope, 4) AS slope_right_e7,
        |  round(r.icpt - l.icpt, 4) AS rd_effect
        |FROM (SELECT * FROM sol WHERE NOT is_right) l
        |CROSS JOIN (SELECT * FROM sol WHERE is_right) r""".stripMargin,

    "q262_hill_tail" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT cents,
        |    CAST(row_number() OVER (ORDER BY cents DESC, o_orderkey)
        |      AS BIGINT) AS rk
        |  FROM o),
        |ref AS (SELECT cents AS ref_cents FROM r WHERE rk = 101)
        |SELECT CAST(count(*) AS BIGINT) AS k,
        |  any_value(ref_cents) AS x_ref_cents,
        |  round(avg(ln(CAST(cents AS DOUBLE) / CAST(ref_cents AS DOUBLE))),
        |    6) AS hill_gamma,
        |  round(1.0 / avg(ln(CAST(cents AS DOUBLE) /
        |    CAST(ref_cents AS DOUBLE))), 4) AS tail_alpha
        |FROM r CROSS JOIN ref WHERE rk <= 100""".stripMargin,

    "q263_kendall_tau" ->
      """WITH by_ AS (SELECT p_brand, year(l_shipdate) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) IN (1995, 1996) GROUP BY 1, 2),
        |rk AS (SELECT p_brand, yr,
        |    row_number() OVER (PARTITION BY yr ORDER BY cents DESC, p_brand)
        |      AS r
        |  FROM by_),
        |b AS (SELECT a.p_brand, a.r AS ra, c.r AS rb
        |  FROM rk a JOIN rk c ON a.p_brand = c.p_brand
        |  WHERE a.yr = 1995 AND c.yr = 1996)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1
        |    ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0 THEN 1
        |    ELSE 0 END) AS BIGINT) AS discordant,
        |  round(CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1
        |    ELSE 0 END) - sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
        |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS kendall_tau
        |FROM b x JOIN b y ON x.p_brand < y.p_brand""".stripMargin,

    "q264_weighted_ess" ->
      """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
        |    sum(sqrt(CAST(n AS DOUBLE))) AS ssq FROM cnt),
        |wts AS (SELECT lang, nn / ssq / sqrt(CAST(n AS DOUBLE)) AS w
        |  FROM cnt CROSS JOIN tot),
        |j AS (SELECT w FROM documents d JOIN wts ON wts.lang = d.lang)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  round(sum(w) * sum(w) / sum(w * w), 4) AS ess,
        |  round(sum(w) * sum(w) / sum(w * w) / CAST(count(*) AS DOUBLE), 6)
        |    AS ess_ratio
        |FROM j""".stripMargin,

    "q259_seasonal_naive" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |    sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, v,
        |    lag(v, 1) OVER w AS naive, lag(v, 7) OVER w AS snaive
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    round(avg(abs(v - naive)), 4) AS mae_naive,
        |    round(avg(abs(v - snaive)), 4) AS mae_snaive
        |  FROM l WHERE naive IS NOT NULL AND snaive IS NOT NULL
        |  GROUP BY 1)
        |SELECT event_type, n_days, mae_naive, mae_snaive,
        |  CASE WHEN mae_snaive < mae_naive THEN CAST(1 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS snaive_better
        |FROM g ORDER BY event_type""".stripMargin,

    "q260_cohen_kappa" ->
      """WITH lab AS (SELECT
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |    CASE WHEN CAST(length(regexp_replace(text, '[^ -~]', '', 'g'))
        |      AS DOUBLE) / CAST(length(text) AS DOUBLE) > 0.9 THEN 1
        |      ELSE 0 END AS b
        |  FROM documents),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n11,
        |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n10,
        |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n01,
        |    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n00
        |  FROM lab),
        |o AS (SELECT n, n11, n10, n01, n00,
        |    round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
        |    round((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
        |      CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe
        |  FROM m)
        |SELECT n, n11, n10, n01, n00, po, pe,
        |  round((po - pe) / (1.0 - pe), 6) AS kappa
        |FROM o""".stripMargin,

    "q261_gain_curve" ->
      s"""WITH $lrCtes,
         |featid AS (SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS y, 1.0 AS f0,
         |    CAST(len(text) AS DOUBLE)/100.0 AS f1,
         |    CAST(len(text) - len(replace(text, ' ', '')) AS DOUBLE)
         |      / CAST(len(text) AS DOUBLE) AS f2,
         |    CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
         |      AS DOUBLE) / CAST(len(text) AS DOUBLE) AS f3
         |  FROM documents),
         |si AS (SELECT doc_id, y,
         |    round(1.0/(1.0+exp(-(w.w0*f0+w.w1*f1+w.w2*f2+w.w3*f3))), 6)
         |      AS p
         |  FROM featid, w3_ w),
         |r AS (SELECT doc_id, y, p,
         |    CAST(row_number() OVER (ORDER BY p DESC, doc_id) AS BIGINT)
         |      AS rk
         |  FROM si),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt,
         |    CAST(sum(y) AS BIGINT) AS pt FROM r),
         |bd AS (SELECT ((rk - 1) * 10) // nt AS decile,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         |    any_value(nt) AS nt, any_value(pt) AS pt
         |  FROM r CROSS JOIN tot GROUP BY 1),
         |c AS (SELECT decile, n, n_pos, nt, pt,
         |    sum(n) OVER wd AS cum_n, sum(n_pos) OVER wd AS cum_pos
         |  FROM bd
         |  WINDOW wd AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW))
         |SELECT decile, n, n_pos,
         |  round(CAST(cum_pos AS DOUBLE) / CAST(pt AS DOUBLE), 6)
         |    AS cum_gain,
         |  round((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) /
         |    (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)), 4) AS lift
         |FROM c ORDER BY decile""".stripMargin,

    "q256_precedence_matrix" ->
      """WITH ft AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
        |    event_type, min(epoch_us(ts)) AS fus
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT a.event_type AS t1, b.event_type AS t2,
        |  CAST(count(*) AS BIGINT) AS n_userdays,
        |  CAST(sum(CASE WHEN a.fus < b.fus THEN 1 ELSE 0 END) AS BIGINT)
        |    AS t1_first,
        |  CAST(sum(CASE WHEN a.fus > b.fus THEN 1 ELSE 0 END) AS BIGINT)
        |    AS t2_first,
        |  CAST(sum(CASE WHEN a.fus = b.fus THEN 1 ELSE 0 END) AS BIGINT)
        |    AS ties,
        |  round(CAST(sum(CASE WHEN a.fus < b.fus THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS t1_share
        |FROM ft a JOIN ft b ON a.user_id = b.user_id AND a.d = b.d
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY t1, t2""".stripMargin,

    "q257_price_endings" ->
      """WITH e AS (SELECT
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) % 100
        |      AS ending,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt FROM e)
        |SELECT ending, n, round(CAST(n AS DOUBLE) / nt, 6) AS share,
        |  round(pow(CAST(n AS DOUBLE) - nt / 100.0, 2) / (nt / 100.0), 4)
        |    AS chi2_term
        |FROM e CROSS JOIN tot
        |ORDER BY n DESC, ending LIMIT 10""".stripMargin,

    "q258_breach_streaks" ->
      """WITH daily AS (SELECT
        |    CAST(floor(extract(epoch FROM o_orderdate)) AS BIGINT) // 86400
        |      AS d,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |thr AS (SELECT avg(cents) * 0.8 AS thr FROM daily),
        |below AS (SELECT d FROM daily CROSS JOIN thr
        |  WHERE CAST(cents AS DOUBLE) < thr),
        |isl AS (SELECT d - row_number() OVER (ORDER BY d) AS grp, d
        |  FROM below),
        |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS len,
        |    min(d) AS start_d, max(d) AS end_d
        |  FROM isl GROUP BY 1),
        |tops AS (SELECT * FROM g ORDER BY len DESC, start_d LIMIT 1),
        |nt AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM below)
        |    AS n_below_days,
        |  (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_streaks)
        |SELECT n_below_days, n_streaks, len AS max_streak_len, start_d,
        |  end_d
        |FROM tops CROSS JOIN nt""".stripMargin,

    "q254_revenue_waterfall" ->
      """WITH py AS (SELECT l_partkey AS pk, year(l_shipdate) AS yr,
        |    sum(l_quantity) AS q,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS DOUBLE) AS c
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
        |  GROUP BY 1, 2),
        |a AS (SELECT pk, q AS q0, c AS c0, c / q AS p0 FROM py
        |  WHERE yr = 1995),
        |b AS (SELECT pk, q AS q1, c AS c1, c / q AS p1 FROM py
        |  WHERE yr = 1996)
        |SELECT CAST(count(*) AS BIGINT) AS n_parts,
        |  round(sum(c1 - c0) / 100.0, 2) AS delta_total,
        |  round(sum(q0 * (p1 - p0)) / 100.0, 2) AS price_effect,
        |  round(sum(p0 * (q1 - q0)) / 100.0, 2) AS volume_effect,
        |  round(sum((p1 - p0) * (q1 - q0)) / 100.0, 2) AS cross_effect
        |FROM a JOIN b USING (pk)""".stripMargin,

    "q255_dkw_band" ->
      """WITH pr AS (SELECT p_brand, p_retailprice AS v FROM part),
        |r AS (SELECT p_brand, v, row_number() OVER (PARTITION BY p_brand
        |    ORDER BY v) AS rk
        |  FROM pr),
        |nn AS (SELECT p_brand, CAST(max(rk) AS BIGINT) AS n FROM r
        |  GROUP BY 1),
        |x AS (SELECT r.p_brand, r.v, r.rk, nn.n,
        |    sqrt(ln(2.0 / 0.05) / (2.0 * CAST(nn.n AS DOUBLE))) AS eps
        |  FROM r JOIN nn USING (p_brand)),
        |y AS (SELECT *, greatest(1,
        |    CAST(ceil((0.5 - eps) * CAST(n AS DOUBLE)) AS BIGINT)) AS lo_k,
        |    least(n, CAST(ceil((0.5 + eps) * CAST(n AS DOUBLE)) AS BIGINT))
        |      AS hi_k
        |  FROM x)
        |SELECT p_brand, any_value(n) AS n, round(any_value(eps), 6)
        |    AS dkw_eps,
        |  min(CASE WHEN rk >= lo_k THEN v END) AS band_lo,
        |  max(CASE WHEN rk <= hi_k THEN v END) AS band_hi,
        |  round(quantile_cont(v, 0.5), 4) AS median
        |FROM y GROUP BY 1 ORDER BY p_brand""".stripMargin,

    "q251_array_gallery" ->
      """SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(list_sum(list_transform(embedding[1:4],
        |    x -> CAST(x AS DOUBLE)))), 6) AS avg_head4_sum,
        |  round(avg(list_dot_product(
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE))))),
        |    6) AS avg_rev_dot,
        |  round(avg(CAST(list_max(embedding) AS DOUBLE)), 6) AS avg_max
        |FROM embeddings GROUP BY 1 ORDER BY label""".stripMargin,

    "q252_path_entropy" ->
      """WITH ut AS (SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ent AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    ln(CAST(sum(c) AS DOUBLE)) -
        |      sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) /
        |        CAST(sum(c) AS DOUBLE) AS h
        |  FROM ut GROUP BY 1)
        |SELECT CAST(floor(log2(CAST(n AS DOUBLE))) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  round(avg(CAST(n AS DOUBLE)), 4) AS avg_events,
        |  round(avg(h), 6) AS avg_entropy
        |FROM ent GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q253_drawdown" ->
      """WITH daily AS (SELECT
        |    CAST(floor(extract(epoch FROM o_orderdate)) AS BIGINT) // 86400
        |      AS d,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |p AS (SELECT d, cents,
        |    max(cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS peak
        |  FROM daily)
        |SELECT d AS trough_day, peak AS peak_cents, cents AS trough_cents,
        |  peak - cents AS drawdown_cents,
        |  round(CAST(peak - cents AS DOUBLE) / CAST(peak AS DOUBLE), 6)
        |    AS drawdown_frac
        |FROM p ORDER BY peak - cents DESC, d LIMIT 1""".stripMargin,

    "q249_semantics_gallery" ->
      """WITH c AS (SELECT nullif(c_nationkey, 3) AS nk FROM customer),
        |jm AS (SELECT 'null_keys_drop_from_join' AS metric,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM c JOIN nation ON nk = n_nationkey),
        |gp AS (SELECT 'null_forms_one_group',
        |    CAST(count(*) AS BIGINT)
        |  FROM (SELECT nk, count(*) FROM c GROUP BY nk)),
        |sc AS (SELECT
        |    CAST(((-7 % 3) + 3) % 3 AS BIGINT) AS pmod_neg,
        |    CAST(trunc(-7.0 / 2) AS BIGINT) AS trunc_div_neg,
        |    CAST(floor(-7.0 / 2) AS BIGINT) AS floor_div_neg,
        |    CAST(sum(CASE WHEN substr(s_name, 100, 10) = '' THEN 1
        |      ELSE 0 END) AS BIGINT) AS oob_substr_empty,
        |    CAST(sum(CASE WHEN least(nullif(s_nationkey, s_nationkey),
        |      s_nationkey) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS least_skips_null
        |  FROM supplier)
        |SELECT * FROM jm
        |UNION ALL SELECT * FROM gp
        |UNION ALL SELECT 'pmod_negative', pmod_neg FROM sc
        |UNION ALL SELECT 'trunc_div_negative', trunc_div_neg FROM sc
        |UNION ALL SELECT 'floor_div_negative', floor_div_neg FROM sc
        |UNION ALL SELECT 'oob_substring_is_empty', oob_substr_empty FROM sc
        |UNION ALL SELECT 'least_skips_nulls', least_skips_null FROM sc
        |ORDER BY metric""".stripMargin,

    "q250_release_manifest" -> {
      def cardSql(name: String, table: String, key: String): String =
        s"""SELECT '$name' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(count(DISTINCT $key) AS BIGINT) AS n_distinct_key,
           |    CASE WHEN count(*) = count(DISTINCT $key)
           |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
           |      AS key_unique,
           |    CAST(min($key) AS BIGINT) AS min_key,
           |    CAST(max($key) AS BIGINT) AS max_key
           |  FROM $table""".stripMargin
      Seq(cardSql("region", "region", "r_regionkey"),
        cardSql("nation", "nation", "n_nationkey"),
        cardSql("customer", "customer", "c_custkey"),
        cardSql("supplier", "supplier", "s_suppkey"),
        cardSql("part", "part", "p_partkey"),
        cardSql("orders", "orders", "o_orderkey"),
        cardSql("lineitem", "lineitem", "l_orderkey"),
        cardSql("events", "events", "event_id"),
        cardSql("documents", "documents", "doc_id"),
        cardSql("embeddings", "embeddings", "vec_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    "q246_storage_tiering" ->
      """WITH li AS (SELECT
        |    CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
        |      AS BIGINT) AS mpart,
        |    CAST(floor(extract(epoch FROM l_shipdate)) AS BIGINT) // 86400
        |      AS d,
        |    68 + strlen(l_returnflag) + strlen(l_linestatus) AS bytes
        |  FROM lineitem),
        |p AS (SELECT mpart, CAST(count(*) AS BIGINT) AS rows_,
        |    CAST(sum(bytes) AS BIGINT) AS est_bytes, max(d) AS dpm
        |  FROM li GROUP BY 1),
        |g AS (SELECT max(dpm) AS dmax FROM p),
        |tp AS (SELECT CASE WHEN dmax - dpm <= 365 THEN 'hot'
        |    WHEN dmax - dpm <= 730 THEN 'warm' ELSE 'cold' END AS tier,
        |    rows_, est_bytes, dmax - dpm AS age
        |  FROM p CROSS JOIN g)
        |SELECT tier, CAST(count(*) AS BIGINT) AS n_partitions,
        |  CAST(sum(rows_) AS BIGINT) AS "rows",
        |  CAST(sum(est_bytes) AS BIGINT) AS est_bytes,
        |  CAST(min(age) AS BIGINT) AS min_age_days,
        |  CAST(max(age) AS BIGINT) AS max_age_days
        |FROM tp GROUP BY 1 ORDER BY tier""".stripMargin,

    "q247_embedding_drift" ->
      """WITH e AS (SELECT label, vec_id % 2 AS half,
        |    CAST(unnest(embedding) AS DOUBLE) AS v,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |cent AS (SELECT label, i,
        |    avg(CASE WHEN half = 0 THEN v END) AS ca,
        |    avg(CASE WHEN half = 1 THEN v END) AS cb
        |  FROM e GROUP BY 1, 2),
        |cnt AS (SELECT label,
        |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_even,
        |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_odd
        |  FROM embeddings GROUP BY 1),
        |r AS (SELECT label, sum(ca * cb) AS dot, sum(ca * ca) AS na,
        |    sum(cb * cb) AS nb
        |  FROM cent GROUP BY 1)
        |SELECT r.label, c.n_even, c.n_odd,
        |  round(dot / sqrt(na * nb), 6) AS centroid_cosine,
        |  round(sqrt(na / nb), 6) AS norm_ratio
        |FROM r JOIN cnt c ON c.label = r.label ORDER BY r.label""".stripMargin,

    "q248_survivor_policy" ->
      s"""${qualityCteSql("",
             "(SELECT doc_id, text FROM documents UNION ALL " +
             "SELECT doc_id + 100000, substr(text, 21) FROM documents)")},
         |fam AS (SELECT doc_id % 100000 AS fam, doc_id, quality FROM q),
         |gg AS (SELECT fam, arg_min(quality, doc_id) AS minid_q,
         |    max(quality) AS best_q FROM fam GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_families,
         |  CAST(sum(CASE WHEN round(best_q, 6) > round(minid_q, 6)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_differing,
         |  round(avg(minid_q), 6) AS avg_q_minid,
         |  round(avg(best_q), 6) AS avg_q_best,
         |  round(avg(best_q - minid_q), 6) AS avg_gain
         |FROM gg""".stripMargin,

    "q243_seasonality_strength" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |    sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |tr AS (SELECT event_type, d, v,
        |    avg(v) OVER wt AS trend, count(*) OVER wt AS wn
        |  FROM daily
        |  WINDOW wt AS (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |detr AS (SELECT event_type, v, (d + 3) % 7 AS dow, v - trend AS detr
        |  FROM tr WHERE wn = 7),
        |dm AS (SELECT event_type, dow, avg(detr) AS sdow FROM detr
        |  GROUP BY 1, 2),
        |r AS (SELECT t.event_type, t.v, t.detr, t.detr - m.sdow AS resid
        |  FROM detr t JOIN dm m ON m.event_type = t.event_type
        |    AND m.dow = t.dow),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    avg(v * v) - avg(v) * avg(v) AS var_v,
        |    avg(detr * detr) - avg(detr) * avg(detr) AS var_d,
        |    avg(resid * resid) - avg(resid) * avg(resid) AS var_r
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_days,
        |  round(greatest(0.0, 1.0 - var_d / var_v), 4) AS trend_strength,
        |  round(greatest(0.0, 1.0 - var_r / var_d), 4) AS seasonal_strength
        |FROM g ORDER BY event_type""".stripMargin,

    "q244_uncertainty_sample" ->
      s"""WITH $lrCtes,
         |featid AS (SELECT doc_id, 1.0 AS f0,
         |    CAST(len(text) AS DOUBLE)/100.0 AS f1,
         |    CAST(len(text) - len(replace(text, ' ', '')) AS DOUBLE)
         |      / CAST(len(text) AS DOUBLE) AS f2,
         |    CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
         |      AS DOUBLE) / CAST(len(text) AS DOUBLE) AS f3
         |  FROM documents),
         |si AS (SELECT doc_id,
         |    1.0/(1.0+exp(-(w.w0*f0+w.w1*f1+w.w2*f2+w.w3*f3))) AS p
         |  FROM featid, w3_ w)
         |SELECT doc_id, round(p, 6) AS p,
         |  round(abs(p - 0.5), 6) AS margin
         |FROM si ORDER BY round(abs(p - 0.5), 6), doc_id
         |LIMIT 20""".stripMargin,

    "q245_broadcast_advisor" -> {
      def adviseSql(name: String, table: String, fixed: Int,
                    strCols: Seq[String]): String = {
        val sb = (strCols.map(c => s"strlen($c)") :+ fixed.toString)
          .mkString(" + ")
        s"""SELECT '$name' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(sum($sb) AS BIGINT) AS est_bytes,
           |    CASE WHEN CAST(sum($sb) AS BIGINT) < 10485760
           |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
           |      AS broadcastable
           |  FROM $table""".stripMargin
      }
      Seq(adviseSql("region", "region", 4, Seq("r_name")),
        adviseSql("nation", "nation", 8, Seq("n_name")),
        adviseSql("supplier", "supplier", 20, Seq("s_name")),
        adviseSql("customer", "customer", 20, Seq("c_name", "c_mktsegment")),
        adviseSql("part", "part", 20, Seq("p_name", "p_brand", "p_type")))
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    "q240_zonemap_prune" ->
      """WITH o AS (SELECT
        |    CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
        |      AS BIGINT) AS mpart,
        |    CAST(floor(extract(epoch FROM o_orderdate)) AS BIGINT) // 86400
        |      AS d
        |  FROM orders),
        |z AS (SELECT mpart, min(d) AS dmin, max(d) AS dmax,
        |    CAST(count(*) AS BIGINT) AS rows_
        |  FROM o GROUP BY 1),
        |preds AS (SELECT * FROM (VALUES ('y1994', 8766, 9130),
        |  ('h1_1995', 9131, 9311), ('m1996_03', 9556, 9586)) p(pred, lo, hi)),
        |scan AS (SELECT pred, lo, hi,
        |    CAST(count(*) AS BIGINT) AS partitions_total,
        |    CAST(sum(CASE WHEN dmin <= hi AND dmax >= lo THEN 1 ELSE 0 END)
        |      AS BIGINT) AS partitions_scanned,
        |    CAST(sum(CASE WHEN dmin <= hi AND dmax >= lo THEN rows_
        |      ELSE 0 END) AS BIGINT) AS rows_scanned,
        |    CAST(sum(rows_) AS BIGINT) AS rows_total
        |  FROM z CROSS JOIN preds GROUP BY 1, 2, 3),
        |act AS (SELECT pred, CAST(count(*) AS BIGINT) AS rows_matching
        |  FROM o CROSS JOIN preds WHERE d >= lo AND d <= hi GROUP BY 1)
        |SELECT s.pred, s.partitions_total, s.partitions_scanned,
        |  s.rows_total, s.rows_scanned, a.rows_matching,
        |  round(1.0 - CAST(s.rows_scanned AS DOUBLE) /
        |    CAST(s.rows_total AS DOUBLE), 6) AS prune_ratio
        |FROM scan s JOIN act a ON a.pred = s.pred
        |ORDER BY s.pred""".stripMargin,

    "q241_join_fanout" -> {
      def edgeSql(name: String, parent: String, pk: String,
                  child: String, fk: String): String =
        s"""SELECT '$name' AS edge, CAST(count(*) AS BIGINT) AS n_parents,
           |    CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_childless,
           |    round(avg(CAST(c AS DOUBLE)), 4) AS avg_fanout,
           |    round(quantile_cont(c, 0.99), 4) AS p99_fanout,
           |    CAST(max(c) AS BIGINT) AS max_fanout
           |  FROM (SELECT coalesce(cc.c, 0) AS c FROM $parent p
           |    LEFT JOIN (SELECT $fk AS k, CAST(count(*) AS BIGINT) AS c
           |      FROM $child GROUP BY 1) cc ON cc.k = p.$pk)""".stripMargin
      Seq(
        edgeSql("orders_lineitem", "orders", "o_orderkey",
          "lineitem", "l_orderkey"),
        edgeSql("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
        edgeSql("supplier_lineitem", "supplier", "s_suppkey",
          "lineitem", "l_suppkey"),
        edgeSql("customer_orders", "customer", "c_custkey",
          "orders", "o_custkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    "q242_rolling_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS d
        |  FROM events),
        |f AS (SELECT user_id, min(d) AS f FROM act GROUP BY 1),
        |mx AS (SELECT max(d) AS dmax FROM act),
        |ks AS (SELECT CAST(x AS BIGINT) AS k FROM (VALUES (1), (7), (28))
        |  t(x)),
        |elig AS (SELECT f.user_id, f.f, ks.k FROM f CROSS JOIN ks
        |  CROSS JOIN mx WHERE f.f + ks.k <= mx.dmax),
        |j AS (SELECT e.k, CASE WHEN a.user_id IS NOT NULL THEN 1 ELSE 0 END
        |    AS r
        |  FROM elig e LEFT JOIN act a
        |    ON a.user_id = e.user_id AND a.d = e.f + e.k)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_eligible,
        |  CAST(sum(r) AS BIGINT) AS n_retained,
        |  round(avg(CAST(r AS DOUBLE)), 6) AS retention_rate
        |FROM j GROUP BY 1 ORDER BY k""".stripMargin,

    "q237_ordered_set_aggs" ->
      """WITH cnt AS (SELECT l_returnflag AS rf, l_quantity AS q,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |md AS (SELECT rf, q AS mode_qty FROM (SELECT rf, q,
        |    row_number() OVER (PARTITION BY rf ORDER BY c DESC, q) AS rn
        |  FROM cnt) WHERE rn = 1),
        |tot AS (SELECT rf, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |cum AS (SELECT rf, q,
        |    sum(c) OVER (PARTITION BY rf ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cnt),
        |med AS (SELECT c2.rf, min(c2.q) AS median_disc
        |  FROM cum c2 JOIN tot ON tot.rf = c2.rf
        |  WHERE c2.cum * 2 >= tot.n GROUP BY 1)
        |SELECT tot.rf, tot.n, md.mode_qty, med.median_disc
        |FROM tot JOIN md ON md.rf = tot.rf JOIN med ON med.rf = tot.rf
        |ORDER BY tot.rf""".stripMargin,

    "q238_calendar_gallery" ->
      """WITH m AS (SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT CAST(y AS INT) AS y, CAST(m AS INT) AS m, n_orders,
        |  CAST((m + 2) // 3 AS INT) AS quarter,
        |  CAST(day(last_day(make_date(y, m, 1))) AS INT) AS days_in_month,
        |  CAST(dayofyear(make_date(y, m, 1)) AS INT) AS doy_first,
        |  CAST(weekofyear(make_date(y, m, 15)) AS INT) AS iso_week_mid
        |FROM m ORDER BY y, m""".stripMargin,

    "q239_scd2_amplification" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    epoch_us(ts) // 86400000000 AS d, event_id
        |  FROM events),
        |ch AS (SELECT CAST(sum(CASE WHEN prev_type IS NULL OR
        |      prev_type <> event_type THEN 1 ELSE 0 END) AS BIGINT)
        |    AS scd2_rows
        |  FROM (SELECT event_type, lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |    FROM ev)),
        |sp AS (SELECT max(d) AS dmax FROM ev),
        |u AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY 1),
        |sn AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(dmax - d0 + 1) AS BIGINT) AS snapshot_rows
        |  FROM u CROSS JOIN sp)
        |SELECT n_users, scd2_rows, snapshot_rows,
        |  round(CAST(snapshot_rows AS DOUBLE) / CAST(scd2_rows AS DOUBLE), 4)
        |    AS amplification
        |FROM sn CROSS JOIN ch""".stripMargin,

    "q234_bom_rollup" ->
      """WITH lv AS (SELECT * FROM (VALUES (1, 10), (2, 100), (3, 1000),
        |  (4, 10000), (5, 100000), (6, 1000000)) l(k, divisor)),
        |p AS (SELECT p_partkey AS pk,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM part)
        |SELECT pk // divisor AS anc, CAST(count(*) AS BIGINT) AS n_desc,
        |  CAST(sum(cents) AS BIGINT) AS cost_cents
        |FROM p CROSS JOIN lv WHERE pk // divisor > 0
        |GROUP BY 1 ORDER BY n_desc DESC, anc LIMIT 20""".stripMargin,

    "q235_dp_counts" -> {
      val kh = graft.ops.Sampling.keyHashSql("lid")
      s"""WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1),
         |l AS (SELECT lang, n,
         |    CAST(row_number() OVER (ORDER BY lang) AS BIGINT) AS lid
         |  FROM cnt),
         |u AS (SELECT lang, n, (($kh) + 0.5) / 4294967296.0 AS u FROM l),
         |lp AS (SELECT lang, n,
         |    -10.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS lap
         |  FROM u)
         |SELECT lang, n, round(n + lap, 4) AS noisy_n,
         |  round(abs(lap), 4) AS abs_err
         |FROM lp ORDER BY lang""".stripMargin
    },

    "q236_ndcg" -> {
      val qv = "(1, 'spark window agg'), (2, 'vector scan batch'), " +
        "(3, 'customer stream query')"
      s"""WITH ${bm25Ctes(qv)},
         |nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms
         |  FROM qt GROUP BY 1),
         |dterm AS (SELECT DISTINCT doc_id, term FROM tk),
         |rel AS (SELECT q2.query_id, d.doc_id
         |  FROM qt q2 JOIN dterm d USING (term)
         |  GROUP BY 1, 2
         |  HAVING count(*) = (SELECT n_terms FROM nq WHERE
         |    nq.query_id = q2.query_id)),
         |ntot AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
         |  FROM rel GROUP BY 1),
         |dcg AS (SELECT r.query_id,
         |    sum(CASE WHEN rl.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END)
         |      AS n_hits,
         |    sum(CASE WHEN rl.doc_id IS NOT NULL THEN
         |      1.0 / log2(CAST(r.rank AS DOUBLE) + 1.0) ELSE 0.0 END) AS dcg
         |  FROM ranked r LEFT JOIN rel rl
         |    ON rl.query_id = r.query_id AND rl.doc_id = r.doc_id
         |  WHERE r.rank <= 10 GROUP BY 1),
         |idcg AS (SELECT n.query_id, n.n_relevant,
         |    sum(1.0 / log2(CAST(i AS DOUBLE) + 1.0)) AS idcg
         |  FROM (SELECT query_id, n_relevant,
         |      unnest(generate_series(1, least(10, n_relevant))) AS i
         |    FROM ntot) n
         |  GROUP BY 1, 2)
         |SELECT CAST(d.query_id AS BIGINT) AS query_id, i.n_relevant,
         |  round(d.n_hits / 10.0, 4) AS p_at_10,
         |  round(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg ELSE 0.0 END, 4)
         |    AS ndcg_at_10
         |FROM dcg d JOIN idcg i ON i.query_id = d.query_id
         |ORDER BY query_id""".stripMargin
    },

    "q231_string_agg" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv,
        |  round(sum(s_acctbal), 2) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n_name""".stripMargin,

    "q232_span_corruption" -> {
      val kh = graft.ops.Sampling.keyHashSql("(doc_id * 131 + b)")
      s"""WITH d0 AS (SELECT doc_id, lang,
         |    CAST(len(regexp_extract_all(text, '[^ ]+', 0)) AS BIGINT)
         |      AS nt
         |  FROM documents),
         |d AS (SELECT doc_id, lang, nt, nt // 20 AS n_blocks FROM d0),
         |bx AS (SELECT doc_id,
         |    CAST(unnest(generate_series(0, n_blocks - 1)) AS BIGINT) AS b
         |  FROM d WHERE n_blocks > 0),
         |bl AS (SELECT doc_id, ($kh) % 18 AS off FROM bx),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(off) AS BIGINT) AS off_sum
         |  FROM bl GROUP BY 1)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS total_tokens,
         |  CAST(sum(coalesce(n_spans, 0)) AS BIGINT) AS total_sentinels,
         |  CAST(sum(coalesce(n_spans, 0) * 3) AS BIGINT) AS masked_tokens,
         |  round(CAST(sum(coalesce(n_spans, 0) * 3) AS DOUBLE) /
         |    CAST(sum(nt) AS DOUBLE), 6) AS mask_frac,
         |  CAST(sum(coalesce(off_sum, 0)) AS BIGINT) AS offset_checksum
         |FROM d LEFT JOIN pd USING (doc_id)
         |GROUP BY 1 ORDER BY lang""".stripMargin
    },

    "q233_class_reweight" ->
      """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
        |    sum(sqrt(CAST(n AS DOUBLE))) AS ssq FROM cnt)
        |SELECT lang, n,
        |  round(nn / ssq / sqrt(CAST(n AS DOUBLE)), 6) AS weight,
        |  round(CAST(n AS DOUBLE) / nn, 6) AS share_before,
        |  round(sqrt(CAST(n AS DOUBLE)) / ssq, 6) AS share_after
        |FROM cnt CROSS JOIN tot ORDER BY lang""".stripMargin,

    "q228_predicate_correlation" ->
      """WITH a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS a1,
        |    CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS b1,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F'
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS ab1,
        |    CAST(sum(CASE WHEN year(l_shipdate) >= 1995 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS a2,
        |    CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS b2,
        |    CAST(sum(CASE WHEN year(l_shipdate) >= 1995 AND l_quantity > 25
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS ab2,
        |    CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS a3,
        |    CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS b3,
        |    CAST(sum(CASE WHEN l_discount > 0.05 AND l_tax > 0.04
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS ab3
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'returnflag_linestatus' AS predicate_pair,
        |    round(a1 / n, 6) AS sel_a, round(b1 / n, 6) AS sel_b,
        |    round(ab1 / n, 6) AS sel_actual,
        |    round(a1 * b1 / (n * n), 6) AS sel_indep,
        |    round(ab1 * n / (a1 * b1), 4) AS corr_factor FROM a
        |  UNION ALL
        |  SELECT 'shipyear_quantity', round(a2 / n, 6), round(b2 / n, 6),
        |    round(ab2 / n, 6), round(a2 * b2 / (n * n), 6),
        |    round(ab2 * n / (a2 * b2), 4) FROM a
        |  UNION ALL
        |  SELECT 'discount_tax', round(a3 / n, 6), round(b3 / n, 6),
        |    round(ab3 / n, 6), round(a3 * b3 / (n * n), 6),
        |    round(ab3 * n / (a3 * b3), 4) FROM a)
        |ORDER BY predicate_pair""".stripMargin,

    "q229_ipw_balance" ->
      """WITH li AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END AS tr,
        |    l_quantity AS x
        |  FROM lineitem),
        |stt AS (SELECT rf, ls, avg(CAST(tr AS DOUBLE)) AS e FROM li
        |  GROUP BY 1, 2),
        |w AS (SELECT tr, x,
        |    CASE WHEN tr = 1 THEN 1.0 / e ELSE 1.0 / (1 - e) END AS w
        |  FROM li JOIN stt USING (rf, ls) WHERE e > 0 AND e < 1),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    avg(CASE WHEN tr = 1 THEN x END) AS mt,
        |    avg(CASE WHEN tr = 0 THEN x END) AS mc,
        |    avg(CASE WHEN tr = 1 THEN x * x END) AS qt,
        |    avg(CASE WHEN tr = 0 THEN x * x END) AS qc,
        |    sum(CASE WHEN tr = 1 THEN w END) AS wt,
        |    sum(CASE WHEN tr = 0 THEN w END) AS wc,
        |    sum(CASE WHEN tr = 1 THEN w * x END) AS wxt,
        |    sum(CASE WHEN tr = 0 THEN w * x END) AS wxc,
        |    sum(CASE WHEN tr = 1 THEN w * x * x END) AS wxxt,
        |    sum(CASE WHEN tr = 0 THEN w * x * x END) AS wxxc
        |  FROM w)
        |SELECT n_t, n_c,
        |  round((mt - mc) / sqrt(((qt - mt * mt) + (qc - mc * mc)) / 2.0), 4)
        |    AS smd_before,
        |  round((wxt / wt - wxc / wc) /
        |    sqrt(((wxxt / wt - (wxt / wt) * (wxt / wt)) +
        |      (wxxc / wc - (wxc / wc) * (wxc / wc))) / 2.0), 4)
        |    AS smd_after
        |FROM m""".stripMargin,

    "q230_did" ->
      """WITH cu AS (SELECT c_custkey,
        |    CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS treat
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey),
        |o AS (SELECT treat,
        |    CASE WHEN year(o_orderdate) >= 1995 THEN 1 ELSE 0 END AS post,
        |    CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE)
        |      AS cents
        |  FROM orders JOIN cu ON o_custkey = c_custkey),
        |m AS (SELECT
        |    CAST(count(CASE WHEN treat = 1 AND post = 1 THEN 1 END)
        |      AS BIGINT) AS n_t1,
        |    CAST(count(CASE WHEN treat = 1 AND post = 0 THEN 1 END)
        |      AS BIGINT) AS n_t0,
        |    CAST(count(CASE WHEN treat = 0 AND post = 1 THEN 1 END)
        |      AS BIGINT) AS n_c1,
        |    CAST(count(CASE WHEN treat = 0 AND post = 0 THEN 1 END)
        |      AS BIGINT) AS n_c0,
        |    avg(CASE WHEN treat = 1 AND post = 1 THEN cents END) AS m_t1,
        |    avg(CASE WHEN treat = 1 AND post = 0 THEN cents END) AS m_t0,
        |    avg(CASE WHEN treat = 0 AND post = 1 THEN cents END) AS m_c1,
        |    avg(CASE WHEN treat = 0 AND post = 0 THEN cents END) AS m_c0,
        |    avg(CASE WHEN treat = 1 AND post = 1 THEN cents * cents END)
        |      AS s_t1,
        |    avg(CASE WHEN treat = 1 AND post = 0 THEN cents * cents END)
        |      AS s_t0,
        |    avg(CASE WHEN treat = 0 AND post = 1 THEN cents * cents END)
        |      AS s_c1,
        |    avg(CASE WHEN treat = 0 AND post = 0 THEN cents * cents END)
        |      AS s_c0
        |  FROM o)
        |SELECT n_t1, n_t0, n_c1, n_c0,
        |  round(m_t1 / 100.0, 4) AS mean_treat_post,
        |  round(m_t0 / 100.0, 4) AS mean_treat_pre,
        |  round(m_c1 / 100.0, 4) AS mean_ctrl_post,
        |  round(m_c0 / 100.0, 4) AS mean_ctrl_pre,
        |  round((m_t1 - m_t0 - (m_c1 - m_c0)) / 100.0, 4) AS did,
        |  round(sqrt(
        |    (s_t1 - m_t1 * m_t1) * CAST(n_t1 AS DOUBLE) /
        |      CAST(n_t1 - 1 AS DOUBLE) / CAST(n_t1 AS DOUBLE) +
        |    (s_t0 - m_t0 * m_t0) * CAST(n_t0 AS DOUBLE) /
        |      CAST(n_t0 - 1 AS DOUBLE) / CAST(n_t0 AS DOUBLE) +
        |    (s_c1 - m_c1 * m_c1) * CAST(n_c1 AS DOUBLE) /
        |      CAST(n_c1 - 1 AS DOUBLE) / CAST(n_c1 AS DOUBLE) +
        |    (s_c0 - m_c0 * m_c0) * CAST(n_c0 AS DOUBLE) /
        |      CAST(n_c0 - 1 AS DOUBLE) / CAST(n_c0 AS DOUBLE)) / 100.0, 4)
        |    AS did_se
        |FROM m""".stripMargin,

    "q225_dedup_threshold_curve" ->
      s"""WITH $ngramPairsCtes,
         |pj AS (SELECT idA, idB, jaccard AS j FROM pairs),
         |grid AS (SELECT CAST(x AS DOUBLE) AS thresh FROM (VALUES (0.3),
         |  (0.4), (0.5), (0.6), (0.7), (0.8)) g(x)),
         |st AS (SELECT thresh, idA, idB FROM pj CROSS JOIN grid
         |  WHERE j >= thresh),
         |np AS (SELECT thresh, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM st GROUP BY 1),
         |nd AS (SELECT thresh, CAST(count(DISTINCT id) AS BIGINT) AS n_docs
         |  FROM (SELECT thresh, idA AS id FROM st
         |    UNION ALL SELECT thresh, idB FROM st)
         |  GROUP BY 1)
         |SELECT np.thresh, np.n_pairs, nd.n_docs
         |FROM np JOIN nd ON np.thresh = nd.thresh
         |ORDER BY np.thresh""".stripMargin,

    "q226_sequential_ab" -> {
      val kh = graft.ops.Sampling.keyHashSql("user_id")
      s"""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS d,
         |    ($kh) % 2 AS arm, value AS v
         |  FROM events),
         |daily AS (SELECT d,
         |    sum(CASE WHEN arm = 0 THEN v END) AS sa,
         |    sum(CASE WHEN arm = 0 THEN v * v END) AS ssa,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    sum(CASE WHEN arm = 1 THEN v END) AS sb,
         |    sum(CASE WHEN arm = 1 THEN v * v END) AS ssb,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM ev GROUP BY 1),
         |c AS (SELECT d,
         |    sum(sa) OVER wc AS csa, sum(ssa) OVER wc AS cssa,
         |    sum(na) OVER wc AS cna, sum(sb) OVER wc AS csb,
         |    sum(ssb) OVER wc AS cssb, sum(nb) OVER wc AS cnb
         |  FROM daily
         |  WINDOW wc AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    CURRENT ROW))
         |SELECT d, CAST(cna + cnb AS BIGINT) AS n_total,
         |  round((csa / cna - csb / cnb) /
         |    sqrt((cssa - csa * csa / cna) / (cna - 1) / cna +
         |      (cssb - csb * csb / cnb) / (cnb - 1) / cnb), 4) AS z
         |FROM c WHERE cna > 1 AND cnb > 1 ORDER BY d""".stripMargin
    },

    "q227_watermark_sim" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
        |  FROM events),
        |w AS (SELECT event_type, us,
        |    max(us) OVER (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
        |  FROM e),
        |l AS (SELECT event_type, CAST(wm - us AS DOUBLE) / 1e6 AS late_s
        |  FROM w),
        |grid AS (SELECT CAST(x AS BIGINT) AS delay_s
        |  FROM (VALUES (0), (30), (60), (300), (900)) g(x))
        |SELECT event_type, delay_s,
        |  CAST(sum(CASE WHEN late_s > CAST(delay_s AS DOUBLE) THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_dropped,
        |  round(avg(CASE WHEN late_s > CAST(delay_s AS DOUBLE) THEN 1.0
        |    ELSE 0.0 END), 6) AS drop_rate
        |FROM l CROSS JOIN grid
        |GROUP BY 1, 2 ORDER BY event_type, delay_s""".stripMargin,

    "q222_late_arrival" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
        |  FROM events),
        |w AS (SELECT event_type, us,
        |    max(us) OVER (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
        |  FROM e),
        |l AS (SELECT event_type, CAST(wm - us AS DOUBLE) / 1e6 AS late_s
        |  FROM w)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(avg(CASE WHEN late_s > 0 THEN 1.0 ELSE 0.0 END), 4)
        |    AS pct_late,
        |  round(quantile_cont(late_s, 0.95), 4) AS p95_late_s,
        |  round(max(late_s), 4) AS max_late_s
        |FROM l GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q223_lsh_planner" ->
      s"""WITH $ngramPairsCtes,
         |grid AS (SELECT * FROM (VALUES (4, 4), (8, 4), (8, 8), (16, 4),
         |  (16, 8), (32, 4)) g(bands, rpb)),
         |sc AS (SELECT bands, rpb, jaccard AS j,
         |    1 - pow(1 - pow(jaccard, CAST(rpb AS DOUBLE)),
         |      CAST(bands AS DOUBLE)) AS p
         |  FROM pairs CROSS JOIN grid)
         |SELECT bands, rpb, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(sum(p), 2) AS exp_cands,
         |  CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pairs_05,
         |  round(sum(CASE WHEN j >= 0.5 THEN p END) /
         |    sum(CASE WHEN j >= 0.5 THEN 1.0 END), 4) AS recall_05
         |FROM sc GROUP BY 1, 2 ORDER BY bands, rpb""".stripMargin,

    "q224_encoding_audit" -> {
      def auditSql(c: String): String =
        s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |    round(CAST(count(DISTINCT $c) AS DOUBLE) /
           |      CAST(count(*) AS DOUBLE), 6) AS distinct_ratio,
           |    round(CAST(count(*) AS DOUBLE) /
           |      CAST(sum(CASE WHEN prev IS NULL OR prev <> $c THEN 1
           |        ELSE 0 END) AS DOUBLE), 4) AS avg_run_len
           |  FROM (SELECT $c, lag($c) OVER (PARTITION BY l_orderkey
           |    ORDER BY l_linenumber, l_partkey, l_suppkey) AS prev
           |    FROM lineitem)""".stripMargin
      Seq("l_returnflag", "l_linestatus", "l_quantity", "l_partkey")
        .map(auditSql)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    "q219_readability" ->
      """WITH c AS (SELECT lang,
        |    len(regexp_extract_all(text, '[A-Za-z]+', 0)) AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]', 0)), 1) AS snt,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS syl
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(CAST(w AS DOUBLE) / CAST(snt AS DOUBLE)), 4)
        |    AS words_per_sentence,
        |  round(avg(CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)), 4)
        |    AS syllables_per_word,
        |  round(avg(206.835 - 1.015 * CAST(w AS DOUBLE) / CAST(snt AS DOUBLE)
        |    - 84.6 * CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)), 4)
        |    AS avg_flesch
        |FROM c WHERE w > 0 GROUP BY 1 ORDER BY lang""".stripMargin,

    "q220_price_index" ->
      """WITH py AS (SELECT l_partkey AS pk,
        |    CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    sum(l_extendedprice) / sum(l_quantity) AS p,
        |    sum(l_quantity) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |y0 AS (SELECT min(yr) AS base_yr FROM py),
        |base AS (SELECT pk, p AS p0, q AS q0 FROM py CROSS JOIN y0
        |  WHERE yr = base_yr)
        |SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(sum(p * q0) / sum(p0 * q0), 4) AS laspeyres
        |FROM py JOIN base USING (pk) GROUP BY 1 ORDER BY yr""".stripMargin,

    "q221_calendar_anomalies" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
        |    sum(value) AS v
        |  FROM events GROUP BY 1),
        |dd AS (SELECT d, v, (d + 3) % 7 AS dow FROM daily),
        |base AS (SELECT dow, avg(v) AS mu,
        |    sqrt(avg(v * v) - avg(v) * avg(v)) AS sd
        |  FROM dd GROUP BY 1)
        |SELECT d, dow, round(v, 2) AS v, round((v - mu) / sd, 4) AS z
        |FROM dd JOIN base USING (dow) WHERE sd > 0
        |ORDER BY abs((v - mu) / sd) DESC, d LIMIT 10""".stripMargin,

    "q216_seasonal_decompose" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
        |    sum(value) AS v
        |  FROM events GROUP BY 1),
        |tr AS (SELECT d, v,
        |    avg(v) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3
        |      FOLLOWING) AS trend,
        |    count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3
        |      FOLLOWING) AS wn
        |  FROM daily),
        |detr AS (SELECT (d + 3) % 7 AS dow, v - trend AS detr
        |  FROM tr WHERE wn = 7),
        |dm AS (SELECT dow, avg(detr) AS seasonal,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM detr GROUP BY 1)
        |SELECT t.dow, any_value(m.n_days) AS n_days,
        |  round(any_value(m.seasonal), 4) AS seasonal,
        |  round(sqrt(avg((t.detr - m.seasonal) * (t.detr - m.seasonal))), 4)
        |    AS resid_sd
        |FROM detr t JOIN dm m ON m.dow = t.dow
        |GROUP BY t.dow ORDER BY t.dow""".stripMargin,

    "q217_jackknife_ci" -> {
      val kh = graft.ops.Sampling.keyHashSql("o_orderkey")
      s"""WITH b AS (SELECT ($kh) % 50 AS bk,
         |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         |      AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT CAST(sum(s) AS BIGINT) AS st,
         |    CAST(sum(n) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS nb
         |  FROM b),
         |loo AS (SELECT st, nt, nb,
         |    CAST(st - s AS DOUBLE) / CAST(nt - n AS DOUBLE) AS m_i
         |  FROM b CROSS JOIN tot),
         |mb AS (SELECT avg(m_i) AS mbar FROM loo),
         |jk AS (SELECT st, nt, nb,
         |    sum((m_i - mbar) * (m_i - mbar)) AS ss
         |  FROM loo CROSS JOIN mb GROUP BY 1, 2, 3),
         |o AS (SELECT nt AS n_orders,
         |    round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) / 100.0, 4)
         |      AS mean_value,
         |    round(sqrt(CAST(nb - 1 AS DOUBLE) / CAST(nb AS DOUBLE) *
         |      ss) / 100.0, 4) AS jk_se
         |  FROM jk)
         |SELECT n_orders, mean_value, jk_se,
         |  round(mean_value - 1.96 * jk_se, 4) AS ci_lo,
         |  round(mean_value + 1.96 * jk_se, 4) AS ci_hi FROM o""".stripMargin
    },

    "q218_assortativity" ->
      """WITH edges AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |dc AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM edges
        |  GROUP BY 1),
        |ds AS (SELECT sp, CAST(count(*) AS BIGINT) AS ds FROM edges
        |  GROUP BY 1),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    CAST(count(DISTINCT e.c) AS BIGINT) AS n_cust,
        |    CAST(count(DISTINCT e.sp) AS BIGINT) AS n_supp,
        |    CAST(sum(dc.dc) AS BIGINT) AS sx,
        |    CAST(sum(ds.ds) AS BIGINT) AS sy,
        |    CAST(sum(dc.dc * ds.ds) AS BIGINT) AS sxy,
        |    CAST(sum(dc.dc * dc.dc) AS BIGINT) AS sxx,
        |    CAST(sum(ds.ds * ds.ds) AS BIGINT) AS syy
        |  FROM edges e JOIN dc ON dc.c = e.c JOIN ds ON ds.sp = e.sp)
        |SELECT n_edges, n_cust, n_supp,
        |  round(CAST(n_edges * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE) *
        |      CAST(n_edges * syy - sy * sy AS DOUBLE)), 4) AS assortativity
        |FROM g""".stripMargin,

    "q213_ccf" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT CAST(range AS BIGINT) AS lag_d FROM range(6)),
        |g AS (SELECT a.event_type AS t1, b.event_type AS t2, l.lag_d,
        |    CAST(count(*) AS BIGINT) AS n, sum(a.v) AS sx, sum(b.v) AS sy,
        |    sum(a.v * b.v) AS sxy, sum(a.v * a.v) AS sxx,
        |    sum(b.v * b.v) AS syy
        |  FROM daily a CROSS JOIN l JOIN daily b
        |    ON b.d = a.d + l.lag_d AND a.event_type <> b.event_type
        |  GROUP BY 1, 2, 3)
        |SELECT t1, t2, lag_d,
        |  round((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r
        |FROM g ORDER BY t1, t2, lag_d""".stripMargin,

    "q214_croston" -> {
      val kh = graft.ops.Sampling.keyHashSql("l_partkey")
      s"""WITH weekly AS (SELECT l_partkey,
         |    CAST((year(l_shipdate) - 1992) * 53 + weekofyear(l_shipdate)
         |      AS BIGINT) AS wk,
         |    sum(l_quantity) AS q
         |  FROM lineitem GROUP BY 1, 2),
         |span AS (SELECT CAST(max(wk) - min(wk) + 1 AS DOUBLE)
         |    AS total_weeks FROM weekly),
         |per AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_active,
         |    sum(q) AS total_q, avg(q) AS z
         |  FROM weekly GROUP BY 1)
         |SELECT l_partkey, n_active, round(z, 4) AS z,
         |  round(total_weeks / CAST(n_active AS DOUBLE), 4) AS p,
         |  round(z * CAST(n_active AS DOUBLE) / total_weeks, 4) AS croston_f,
         |  round(total_q / total_weeks, 4) AS naive_f
         |FROM per CROSS JOIN span
         |WHERE ($kh) % 50 = 0 ORDER BY l_partkey""".stripMargin
    },

    "q215_skew_audit" ->
      """WITH c1 AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |c2 AS (SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |c3 AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |s1 AS (SELECT 'l_partkey' AS key_col, CAST(count(*) AS BIGINT)
        |    AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |    quantile_cont(c, 0.5) AS p50, quantile_cont(c, 0.99) AS p99,
        |    CAST(max(c) AS BIGINT) AS max_c FROM c1),
        |s2 AS (SELECT 'l_suppkey', CAST(count(*) AS BIGINT),
        |    CAST(sum(c) AS BIGINT), quantile_cont(c, 0.5),
        |    quantile_cont(c, 0.99), CAST(max(c) AS BIGINT) FROM c2),
        |s3 AS (SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |    CAST(sum(c) AS BIGINT), quantile_cont(c, 0.5),
        |    quantile_cont(c, 0.99), CAST(max(c) AS BIGINT) FROM c3),
        |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |  UNION ALL SELECT * FROM s3)
        |SELECT key_col, n_keys, n_rows, p50, p99, max_c,
        |  round(CAST(max_c AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS top_share,
        |  CAST(ceil(CAST(max_c AS DOUBLE) / p50) AS BIGINT) AS salt_factor
        |FROM u ORDER BY key_col""".stripMargin,

    "q212_minhash_setsim" -> {
      val kh = graft.ops.Sampling.keyHashSql("(u + sd * 1000003)")
      s"""WITH ue AS (SELECT DISTINCT event_type AS et, user_id AS u
         |  FROM events),
         |seeds AS (SELECT CAST(range AS BIGINT) AS sd FROM range(64)),
         |mh AS (SELECT et, sd, min($kh) AS mn
         |  FROM ue CROSS JOIN seeds GROUP BY 1, 2),
         |est AS (SELECT a.et AS t1, b.et AS t2,
         |    CAST(sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS DOUBLE)
         |      / 64.0 AS est_raw
         |  FROM mh a JOIN mh b ON a.sd = b.sd AND a.et < b.et GROUP BY 1, 2),
         |cnt AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM ue GROUP BY 1),
         |inter AS (SELECT x.et AS t1, y.et AS t2,
         |    CAST(count(*) AS BIGINT) AS n_ab
         |  FROM ue x JOIN ue y ON x.u = y.u AND x.et < y.et GROUP BY 1, 2)
         |SELECT i.t1, i.t2, i.n_ab,
         |  round(CAST(i.n_ab AS DOUBLE) / CAST(c1.n + c2.n - i.n_ab AS DOUBLE),
         |    4) AS exact_jaccard,
         |  round(e.est_raw, 4) AS minhash_est
         |FROM inter i JOIN cnt c1 ON c1.et = i.t1 JOIN cnt c2 ON c2.et = i.t2
         |  JOIN est e ON e.t1 = i.t1 AND e.t2 = i.t2
         |ORDER BY i.t1, i.t2""".stripMargin
    },

    "q351_var_es" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |ix AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
        |    AS i, cents FROM daily),
        |df AS (SELECT a.i, a.cents - b.cents AS d
        |  FROM ix a JOIN ix b ON a.i = b.i + 1),
        |rk AS (SELECT d, CAST(row_number() OVER (ORDER BY d, i)
        |    AS BIGINT) AS rk FROM df),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(CAST(d AS DOUBLE) / 100.0) AS s1,
        |    sum((CAST(d AS DOUBLE) / 100.0) * (CAST(d AS DOUBLE) / 100.0))
        |      AS s2,
        |    sum((CAST(d AS DOUBLE) / 100.0) * (CAST(d AS DOUBLE) / 100.0)
        |      * (CAST(d AS DOUBLE) / 100.0)) AS s3,
        |    sum((CAST(d AS DOUBLE) / 100.0) * (CAST(d AS DOUBLE) / 100.0)
        |      * (CAST(d AS DOUBLE) / 100.0) * (CAST(d AS DOUBLE) / 100.0))
        |      AS s4
        |  FROM df),
        |mo AS (SELECT n, s1 / n AS m, s2, s3, s4 FROM st),
        |ce AS (SELECT n, m,
        |    s2 / n - m * m AS v2,
        |    s3 / n - 3 * m * s2 / n + 2 * m * m * m AS m3,
        |    s4 / n - 4 * m * s3 / n + 6 * m * m * s2 / n
        |      - 3 * m * m * m * m AS m4
        |  FROM mo),
        |sh AS (SELECT n, m, sqrt(v2) AS sd,
        |    m3 / pow(v2, 1.5) AS g1,
        |    m4 / (v2 * v2) - 3 AS g2
        |  FROM ce),
        |zc AS (SELECT CAST(-1.6448536269514722 AS DOUBLE) AS z),
        |cf AS (SELECT n, m, sd, g1, g2,
        |    z + (z * z - 1) * g1 / 6
        |      + (z * z * z - 3 * z) * g2 / 24
        |      - (2 * z * z * z - 5 * z) * g1 * g1 / 36 AS zcf
        |  FROM sh CROSS JOIN zc),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |    (CAST(count(*) AS BIGINT) + 19) // 20 AS k FROM df),
        |tl AS (SELECT min(kk.nd) AS nd,
        |    CAST(max(rk.d) AS BIGINT) AS var_cents,
        |    avg(CAST(rk.d AS DOUBLE)) AS es_cents
        |  FROM rk CROSS JOIN kk WHERE rk.rk <= kk.k)
        |SELECT tl.nd AS n_diffs,
        |  round(-CAST(tl.var_cents AS DOUBLE) / 100.0, 2) AS var95,
        |  round(-tl.es_cents / 100.0, 2) AS es95,
        |  round(-(cf.m + cf.zcf * cf.sd), 2) AS cf_var95,
        |  round(cf.g1, 4) AS skew, round(cf.g2, 4) AS ex_kurt
        |FROM tl CROSS JOIN cf""".stripMargin,

    "q352_sharpe_sortino" ->
      """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
        |    sum(value) AS y FROM events GROUP BY 1, 2),
        |ix AS (SELECT et, y, CAST(row_number()
        |    OVER (PARTITION BY et ORDER BY day) AS BIGINT) AS i
        |  FROM daily),
        |df AS (SELECT a.et, a.y - b.y AS d
        |  FROM ix a JOIN ix b ON a.et = b.et AND a.i = b.i + 1),
        |st AS (SELECT et, CAST(count(*) AS BIGINT) AS n_diffs,
        |    sum(d) AS s1, sum(d * d) AS s2,
        |    sum(CASE WHEN d < 0 THEN d * d ELSE 0.0 END) AS sneg
        |  FROM df GROUP BY 1),
        |mo AS (SELECT et, n_diffs, s1 / n_diffs AS m,
        |    sqrt((s2 - s1 * s1 / n_diffs) / (n_diffs - 1)) AS sd,
        |    sqrt(sneg / n_diffs) AS dd
        |  FROM st)
        |SELECT et, n_diffs, round(m, 2) AS mean_diff,
        |  round(m / sd * sqrt(252.0), 4) AS sharpe,
        |  round(m / dd * sqrt(252.0), 4) AS sortino
        |FROM mo ORDER BY et""".stripMargin,

    "q353_mann_kendall" ->
      """WITH weekly AS (SELECT
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) // 7 AS wk,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |pr AS (SELECT a.wk AS w1, b.wk AS w2, b.c - a.c AS dv,
        |    b.wk - a.wk AS dt
        |  FROM weekly a JOIN weekly b ON a.wk < b.wk),
        |ss AS (SELECT CAST(sum(CASE WHEN dv > 0 THEN 1
        |      WHEN dv < 0 THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
        |    CAST(count(*) AS BIGINT) AS m FROM pr),
        |ti AS (SELECT CAST(sum(tc) AS BIGINT) AS n,
        |    CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tcor
        |  FROM (SELECT c, CAST(count(*) AS BIGINT) AS tc
        |        FROM weekly GROUP BY 1)),
        |sl AS (SELECT w1, w2, CAST(floor(1000000.0 * CAST(dv AS DOUBLE)
        |    / (100.0 * CAST(dt AS DOUBLE))) AS BIGINT) AS sl FROM pr),
        |rk AS (SELECT sl, CAST(row_number()
        |    OVER (ORDER BY sl, w1, w2) AS BIGINT) AS rk FROM sl),
        |md AS (SELECT avg(CAST(rk.sl AS DOUBLE)) AS med_micro
        |  FROM rk CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS mm
        |                      FROM sl) t
        |  WHERE rk.rk = (t.mm + 1) // 2 OR rk.rk = (t.mm + 2) // 2),
        |vv AS (SELECT ti.n AS n_weeks, ss.s_stat,
        |    (CAST(ti.n AS DOUBLE) * (ti.n - 1) * (2 * ti.n + 5) - ti.tcor)
        |      / 18.0 AS var_s,
        |    md.med_micro
        |  FROM ss CROSS JOIN ti CROSS JOIN md),
        |zz AS (SELECT n_weeks, s_stat, round(var_s, 2) AS var_s,
        |    round((s_stat - CASE WHEN s_stat > 0 THEN 1.0
        |      WHEN s_stat < 0 THEN -1.0 ELSE 0.0 END) / sqrt(var_s), 4)
        |      AS z,
        |    round(med_micro / 1000000.0, 4) AS sen_slope
        |  FROM vv)
        |SELECT n_weeks, s_stat, var_s, z, sen_slope,
        |  CASE WHEN z > 1.96 THEN 'increasing'
        |       WHEN z < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM zz""".stripMargin,

    "q354_ljung_box" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS y
        |  FROM events GROUP BY 1),
        |ix AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
        |    AS i, y FROM daily),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(y) / count(*) AS mu,
        |    sum(y * y) - sum(y) * sum(y) / count(*) AS denom FROM ix),
        |lg AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]) AS lag),
        |pr AS (SELECT l.lag, a.y AS y, b.y AS y_lag
        |  FROM ix a CROSS JOIN lg l JOIN ix b ON a.i = b.i + l.lag),
        |rs AS (SELECT p.lag, min(st.n) AS n,
        |    sum((p.y - st.mu) * (p.y_lag - st.mu)) / min(st.denom) AS r
        |  FROM pr p CROSS JOIN st GROUP BY 1),
        |qq AS (SELECT min(n) AS n,
        |    min(n) * (min(n) + 2) * sum(r * r / (n - lag)) AS q
        |  FROM rs)
        |SELECT CAST(n AS BIGINT) AS n_days, round(q, 4) AS q_stat,
        |  round(exp(-q / 2) * (1.0 + q / 2 + (q / 2) * (q / 2) / 2
        |    + (q / 2) * (q / 2) * (q / 2) / 6
        |    + (q / 2) * (q / 2) * (q / 2) * (q / 2) / 24), 6) AS p_approx
        |FROM qq""".stripMargin,

    "q355_bartlett" ->
      """WITH g AS (SELECT c_mktsegment AS sg,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sg1,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) *
        |      CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sg2
        |  FROM customer GROUP BY 1),
        |vr AS (SELECT ng,
        |    (CAST(sg2 AS DOUBLE) - CAST(sg1 AS DOUBLE) * sg1 / ng)
        |      / (ng - 1) AS s2
        |  FROM g),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    sum((ng - 1) * s2) AS ssw,
        |    sum((ng - 1) * ln(s2)) AS sln,
        |    sum(1.0 / (ng - 1)) AS sinv,
        |    max(s2) AS vmax, min(s2) AS vmin
        |  FROM vr),
        |ch AS (SELECT k, n, vmax, vmin,
        |    ((n - k) * ln(ssw / (n - k)) - sln)
        |      / (1.0 + (sinv - 1.0 / (n - k)) / (3.0 * (k - 1))) AS chi2
        |  FROM agg)
        |SELECT n AS n_cust, k AS k_groups,
        |  round(vmax / vmin, 4) AS var_ratio,
        |  round(chi2, 4) AS bartlett_chi2,
        |  round(exp(-chi2 / 2) * (1.0 + chi2 / 2), 6) AS p_approx
        |FROM ch""".stripMargin,

    "q356_cochran_q" ->
      """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS et
        |  FROM events WHERE value > 95),
        |gj AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(g) AS BIGINT) AS sg,
        |    CAST(sum(g * g) AS BIGINT) AS sg2
        |  FROM (SELECT et, CAST(count(*) AS BIGINT) AS g
        |        FROM ut GROUP BY 1)),
        |li AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(l) AS BIGINT) AS sl,
        |    CAST(sum(l * l) AS BIGINT) AS sl2
        |  FROM (SELECT u, CAST(count(*) AS BIGINT) AS l
        |        FROM ut GROUP BY 1)),
        |qq AS (SELECT n_users, k AS k_types,
        |    CAST(k - 1 AS DOUBLE) * (k * sg2 - sg * sg)
        |      / (k * sl - sl2) AS q
        |  FROM gj CROSS JOIN li)
        |SELECT n_users, k_types, round(q, 4) AS q_stat,
        |  round(exp(-q / 2) * (1.0 + q / 2), 6) AS p_approx
        |FROM qq""".stripMargin,

    "q357_mood_median" ->
      """WITH base AS (SELECT o_orderpriority AS pr,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderkey AS ok
        |  FROM orders),
        |rk AS (SELECT v, CAST(row_number() OVER (ORDER BY v, ok)
        |    AS BIGINT) AS rk FROM base),
        |med AS (SELECT rk.v AS med FROM rk
        |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM base) t
        |  WHERE rk.rk = (t.n + 1) // 2),
        |cells AS (SELECT pr, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS above
        |  FROM base CROSS JOIN med GROUP BY 1),
        |tots AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(above) AS BIGINT) AS ta FROM cells),
        |chi AS (SELECT pr, ng, above,
        |    CAST(ng AS DOUBLE) * ta / n AS ea,
        |    CAST(ng AS DOUBLE) * (n - ta) / n AS eb
        |  FROM cells CROSS JOIN tots),
        |co AS (SELECT pr, ng, above,
        |    (above - ea) * (above - ea) / ea +
        |    ((ng - above) - eb) * ((ng - above) - eb) / eb AS contrib
        |  FROM chi),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n, sum(contrib) AS chi2 FROM co)
        |SELECT n AS n_orders, k AS k_groups, round(chi2, 4) AS chi2,
        |  round(exp(-chi2 / 2) * (1.0 + chi2 / 2), 6) AS p_approx
        |FROM st""".stripMargin,

    "q358_jonckheere" ->
      """WITH base AS (SELECT CAST(l_linenumber AS BIGINT) AS grp,
        |    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
        |gv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |ng AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
        |  FROM base GROUP BY 1),
        |grid AS (SELECT g.grp, d.v
        |  FROM (SELECT DISTINCT v FROM base) d
        |  CROSS JOIN (SELECT grp FROM ng) g),
        |gvf AS (SELECT grid.grp, grid.v, coalesce(gv.c, 0) AS c
        |  FROM grid LEFT JOIN gv ON grid.grp = gv.grp
        |    AND grid.v = gv.v),
        |suf AS (SELECT grp, v, c,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY grp ORDER BY v
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS gt
        |  FROM gvf),
        |jj AS (SELECT CAST(sum(a.c * (2 * b.gt + b.c)) AS BIGINT) AS j2
        |  FROM gv a JOIN suf b ON a.grp < b.grp AND a.v = b.v),
        |ns AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    sum(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)) AS t2g,
        |    sum(CAST(n AS DOUBLE) * (n - 1) * (n - 2)) AS t3g,
        |    sum(CAST(n AS DOUBLE) * (n - 1)) AS t1g,
        |    sum(CAST(n AS DOUBLE) * n) AS sn2
        |  FROM ng),
        |ts AS (SELECT
        |    sum(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)) AS t2v,
        |    sum(CAST(t AS DOUBLE) * (t - 1) * (t - 2)) AS t3v,
        |    sum(CAST(t AS DOUBLE) * (t - 1)) AS t1v
        |  FROM (SELECT v, CAST(count(*) AS BIGINT) AS t
        |        FROM base GROUP BY 1)),
        |zz AS (SELECT nn AS n_rows, j2,
        |    (CAST(nn AS DOUBLE) * nn - sn2) / 2 AS mean2,
        |    ((CAST(nn AS DOUBLE) * (nn - 1) * (2 * nn + 5)
        |        - t2g - t2v) / 72 +
        |      t3g * t3v / (36.0 * nn * (nn - 1) * (nn - 2)) +
        |      t1g * t1v / (8.0 * nn * (nn - 1))) * 4 AS var4
        |  FROM jj CROSS JOIN ns CROSS JOIN ts),
        |fz AS (SELECT n_rows, j2,
        |    round((j2 - mean2) / sqrt(var4), 4) AS z FROM zz)
        |SELECT n_rows, j2, z,
        |  CASE WHEN z > 1.96 THEN 'increasing'
        |       WHEN z < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM fz""".stripMargin,

    "q359_brier_murphy" ->
      s"""WITH $lrCtes,
         |bn AS (SELECT y, p,
         |    CAST(least(floor(p * 10), 9) AS BIGINT) AS bin FROM scored),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y) AS sy,
         |    sum((p - y) * (p - y)) AS sq FROM bn),
         |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS nk,
         |    sum(p) AS sp, sum(y) AS syk FROM bn GROUP BY 1),
         |dec AS (SELECT min(tot.n) AS n, min(tot.sy) AS sy,
         |    min(tot.sq) AS sq,
         |    sum(nk * (sp / nk - syk / nk) * (sp / nk - syk / nk)) AS rel,
         |    sum(nk * (syk / nk - tot.sy / tot.n)
         |      * (syk / nk - tot.sy / tot.n)) AS res
         |  FROM bins CROSS JOIN tot),
         |fin AS (SELECT n, sq / n AS brier, rel / n AS rel, res / n AS res,
         |    (sy / n) * (1.0 - sy / n) AS unc FROM dec)
         |SELECT n AS n_docs, round(brier, 6) AS brier,
         |  round(rel, 6) AS reliability, round(res, 6) AS resolution,
         |  round(unc, 6) AS uncertainty,
         |  round(brier - (rel - res + unc), 6) AS decomp_gap
         |FROM fin""".stripMargin,

    "q360_ipw_ate" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS yc
        |  FROM orders GROUP BY 1),
        |cust AS (SELECT c_nationkey AS nk, c_mktsegment AS sg,
        |    CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS tr,
        |    CAST(coalesce(yc, 0) AS BIGINT) AS y
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |strata AS (SELECT nk, sg, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(tr) AS BIGINT) AS nt
        |  FROM cust GROUP BY 1, 2),
        |kept AS (SELECT nk, sg, CAST(nt AS DOUBLE) / ns AS e
        |  FROM strata WHERE nt > 0 AND nt < ns),
        |wtd AS (SELECT tr, y,
        |    CASE WHEN tr = 1 THEN 1.0 / e ELSE 1.0 / (1.0 - e) END AS w
        |  FROM cust JOIN kept USING (nk, sg)),
        |eff AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |    sum(CASE WHEN tr = 1 THEN w ELSE 0.0 END) AS wt,
        |    sum(CASE WHEN tr = 1 THEN w * y ELSE 0.0 END) AS wty,
        |    sum(CASE WHEN tr = 0 THEN w ELSE 0.0 END) AS wc,
        |    sum(CASE WHEN tr = 0 THEN w * y ELSE 0.0 END) AS wcy,
        |    CAST(sum(tr) AS BIGINT) AS ntr,
        |    CAST(sum(CASE WHEN tr = 1 THEN y ELSE 0 END) AS BIGINT)
        |      AS syt,
        |    CAST(sum(CASE WHEN tr = 0 THEN y ELSE 0 END) AS BIGINT)
        |      AS syc
        |  FROM wtd),
        |ks AS (SELECT CAST(count(*) AS BIGINT) AS n_strata FROM kept),
        |dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        |  FROM strata WHERE nt = 0 OR nt = ns)
        |SELECT n_cust, n_strata, n_dropped,
        |  round((wty / wt - wcy / wc) / 100.0, 2) AS ate_ipw,
        |  round((CAST(syt AS DOUBLE) / ntr
        |    - CAST(syc AS DOUBLE) / (n_cust - ntr)) / 100.0, 2)
        |    AS ate_naive
        |FROM eff CROSS JOIN ks CROSS JOIN dr""".stripMargin,

    "q361_horvitz_thompson" -> {
      val kh = graft.ops.Sampling.keyHashSql("ok")
      s"""WITH x AS (SELECT o_orderkey AS ok,
         |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
         |  FROM orders),
         |tot AS (SELECT CAST(sum(x) AS BIGINT) AS tx FROM x),
         |li AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
         |  FROM lineitem GROUP BY 1),
         |samp AS (SELECT x.ok,
         |    least(1.0, CAST(x.x AS DOUBLE) * 2000.0 / tot.tx) AS pi,
         |    li.cnt
         |  FROM x CROSS JOIN tot JOIN li ON x.ok = li.l_orderkey
         |  WHERE (($kh) + 0.5) / 4294967296.0
         |    < least(1.0, CAST(x.x AS DOUBLE) * 2000.0 / tot.tx)),
         |tr AS (SELECT CAST(sum(cnt) AS BIGINT) AS true_total FROM li),
         |ht AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled,
         |    sum(CAST(cnt AS DOUBLE) / pi) AS ht FROM samp)
         |SELECT n_sampled, round(ht, 2) AS ht_est, true_total,
         |  round(abs(ht - true_total) / true_total, 4) AS rel_err
         |FROM ht CROSS JOIN tr""".stripMargin
    },

    "q362_lilliefors" ->
      """WITH base AS (SELECT
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
        |    c_custkey AS ck FROM customer),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS DOUBLE) / count(*) / 100.0 AS m,
        |    sqrt((CAST(sum(v * v) AS DOUBLE)
        |      - CAST(sum(v) AS DOUBLE) * sum(v) / count(*))
        |      / (count(*) - 1)) / 100.0 AS sd
        |  FROM base),
        |rk AS (SELECT v, CAST(row_number() OVER (ORDER BY v, ck)
        |    AS BIGINT) AS i FROM base),
        |zz AS (SELECT i, n,
        |    (CAST(v AS DOUBLE) / 100.0 - m) / sd AS z
        |  FROM rk CROSS JOIN mom),
        |ph AS (SELECT i, n, z, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zz),
        |pp AS (SELECT i, n,
        |    CASE WHEN z >= 0 THEN 1.0 - (0.254829592 * t
        |        - 0.284496736 * t * t + 1.421413741 * t * t * t
        |        - 1.453152027 * t * t * t * t
        |        + 1.061405429 * t * t * t * t * t) * exp(-x * x) / 2
        |      ELSE (0.254829592 * t - 0.284496736 * t * t
        |        + 1.421413741 * t * t * t - 1.453152027 * t * t * t * t
        |        + 1.061405429 * t * t * t * t * t) * exp(-x * x) / 2
        |      END AS phi
        |  FROM ph),
        |dd AS (SELECT min(n) AS n,
        |    max(greatest(CAST(i AS DOUBLE) / n - phi,
        |      phi - CAST(i - 1 AS DOUBLE) / n)) AS d
        |  FROM pp)
        |SELECT n AS n_cust, round(d, 6) AS d_stat,
        |  round(0.886 / sqrt(CAST(n AS DOUBLE)), 6) AS crit_05,
        |  d > 0.886 / sqrt(CAST(n AS DOUBLE)) AS rejected
        |FROM dd""".stripMargin,

    "q363_yule_walker_ar2" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS DOUBLE) / 100.0 AS y
        |  FROM orders GROUP BY 1),
        |ix AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
        |    AS i, y FROM daily),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(y) / count(*) AS mu,
        |    sum(y * y) - sum(y) * sum(y) / count(*) AS denom FROM ix),
        |tri AS (SELECT a.y AS y, b.y AS y1, c.y AS y2
        |  FROM ix a JOIN ix b ON a.i = b.i + 1
        |    JOIN ix c ON a.i = c.i + 2),
        |rs AS (SELECT min(st.n) AS n, min(st.mu) AS mu,
        |    sum((y - st.mu) * (y1 - st.mu)) / min(st.denom) AS r1,
        |    sum((y - st.mu) * (y2 - st.mu)) / min(st.denom) AS r2
        |  FROM tri CROSS JOIN st),
        |ph AS (SELECT n, mu, r1, r2,
        |    r1 * (1.0 - r2) / (1.0 - r1 * r1) AS p1,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS p2
        |  FROM rs),
        |bt AS (SELECT min(ph.n) AS n, min(ph.p1) AS p1,
        |    min(ph.p2) AS p2,
        |    CAST(count(*) AS BIGINT) AS n_steps,
        |    sqrt(avg((y - (ph.mu + ph.p1 * (y1 - ph.mu)
        |      + ph.p2 * (y2 - ph.mu)))
        |      * (y - (ph.mu + ph.p1 * (y1 - ph.mu)
        |      + ph.p2 * (y2 - ph.mu))))) AS rmse_ar2,
        |    sqrt(avg((y - y1) * (y - y1))) AS rmse_naive
        |  FROM tri CROSS JOIN ph)
        |SELECT CAST(n AS BIGINT) AS n_days, n_steps,
        |  round(p1, 6) AS phi1, round(p2, 6) AS phi2,
        |  round(rmse_ar2, 2) AS rmse_ar2,
        |  round(rmse_naive, 2) AS rmse_naive
        |FROM bt""".stripMargin,

    "q364_holt_trend" ->
      """WITH q AS (SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 4
        |      + (month(CAST(o_orderdate AS DATE)) - 1) // 3 AS t,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS DOUBLE)
        |      / 1000.0 AS y
        |  FROM orders GROUP BY 1),
        |g AS (SELECT CAST(r.range AS BIGINT) AS t,
        |    coalesce(q.y, 0.0) AS y
        |  FROM range(27) r LEFT JOIN q ON q.t = r.range),
        |base AS (SELECT a.y AS y0, b.y AS y1 FROM g a CROSS JOIN g b
        |  WHERE a.t = 0 AND b.t = 1)
        |SELECT 27 AS n_quarters, round(l, 2) AS level_kusd,
        |  round(b, 2) AS trend_kusd, round(l + b, 2) AS forecast_kusd,
        |  round(sae / 26.0, 2) AS mae_kusd
        |FROM (
        |  WITH RECURSIVE h(t, l, b, sae) AS (
        |    SELECT CAST(0 AS BIGINT), y0, y1 - y0,
        |      CAST(0.0 AS DOUBLE) FROM base
        |    UNION ALL
        |    SELECT h.t + 1,
        |      0.3 * g.y + 0.7 * (h.l + h.b),
        |      0.1 * ((0.3 * g.y + 0.7 * (h.l + h.b)) - h.l) + 0.9 * h.b,
        |      h.sae + abs(g.y - (h.l + h.b))
        |    FROM h JOIN g ON g.t = h.t + 1 WHERE h.t < 26)
        |  SELECT l, b, sae FROM h WHERE t = 26)""".stripMargin,

    "q365_pacf" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS y
        |  FROM events GROUP BY 1),
        |ix AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
        |    AS i, y FROM daily),
        |st AS (SELECT sum(y) / count(*) AS mu,
        |    sum(y * y) - sum(y) * sum(y) / count(*) AS denom FROM ix),
        |lg AS (SELECT unnest([1, 2, 3, 4, 5]) AS lag),
        |pr AS (SELECT l.lag, a.y AS y, b.y AS y_lag
        |  FROM ix a CROSS JOIN lg l JOIN ix b ON a.i = b.i + l.lag),
        |rw AS (SELECT p.lag,
        |    sum((p.y - st.mu) * (p.y_lag - st.mu)) / min(st.denom) AS r
        |  FROM pr p CROSS JOIN st GROUP BY 1),
        |rr AS (SELECT
        |    max(CASE WHEN lag = 1 THEN r END) AS r1,
        |    max(CASE WHEN lag = 2 THEN r END) AS r2,
        |    max(CASE WHEN lag = 3 THEN r END) AS r3,
        |    max(CASE WHEN lag = 4 THEN r END) AS r4,
        |    max(CASE WHEN lag = 5 THEN r END) AS r5
        |  FROM rw),
        |s2 AS (SELECT *, r1 AS p11 FROM rr),
        |s3a AS (SELECT *,
        |    (r2 - p11 * r1) / (1.0 - p11 * r1) AS p22 FROM s2),
        |s3 AS (SELECT *, p11 - p22 * p11 AS p21 FROM s3a),
        |s4a AS (SELECT *,
        |    (r3 - p21 * r2 - p22 * r1)
        |      / (1.0 - p21 * r1 - p22 * r2) AS p33 FROM s3),
        |s4 AS (SELECT *, p21 - p33 * p22 AS p31,
        |    p22 - p33 * p21 AS p32 FROM s4a),
        |s5a AS (SELECT *,
        |    (r4 - p31 * r3 - p32 * r2 - p33 * r1)
        |      / (1.0 - p31 * r1 - p32 * r2 - p33 * r3) AS p44 FROM s4),
        |s5 AS (SELECT *, p31 - p44 * p33 AS p41,
        |    p32 - p44 * p32 AS p42, p33 - p44 * p31 AS p43 FROM s5a),
        |s6 AS (SELECT *,
        |    (r5 - p41 * r4 - p42 * r3 - p43 * r2 - p44 * r1)
        |      / (1.0 - p41 * r1 - p42 * r2 - p43 * r3 - p44 * r4)
        |      AS p55 FROM s5)
        |SELECT round(p11, 6) AS pacf_1, round(p22, 6) AS pacf_2,
        |  round(p33, 6) AS pacf_3, round(p44, 6) AS pacf_4,
        |  round(p55, 6) AS pacf_5
        |FROM s6""".stripMargin,

    "q366_permutation_entropy" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |ix AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
        |    AS i, c FROM daily),
        |tri AS (SELECT a.c AS c, b.c AS c1, d.c AS c2
        |  FROM ix a JOIN ix b ON b.i = a.i + 1
        |    JOIN ix d ON d.i = a.i + 2),
        |coded AS (SELECT CAST(
        |    (CASE WHEN c1 > c THEN 4 ELSE 0 END)
        |    + (CASE WHEN c2 > c THEN 2 ELSE 0 END)
        |    + (CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS BIGINT) AS code
        |  FROM tri),
        |cnt AS (SELECT code, CAST(count(*) AS BIGINT) AS k
        |  FROM coded GROUP BY 1),
        |tot AS (SELECT CAST(sum(k) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_patterns FROM cnt),
        |ent AS (SELECT tot.n, tot.n_patterns, cnt.code, cnt.k,
        |    CAST(cnt.k AS DOUBLE) / tot.n AS p
        |  FROM cnt CROSS JOIN tot),
        |top AS (SELECT code AS top_code, round(p, 4) AS top_share
        |  FROM ent ORDER BY k DESC, code LIMIT 1),
        |hh AS (SELECT min(n) AS n, min(n_patterns) AS n_patterns,
        |    -sum(p * ln(p)) / ln(6.0) AS h FROM ent)
        |SELECT hh.n AS n_triples, hh.n_patterns,
        |  round(hh.h, 6) AS h_norm, top.top_code, top.top_share
        |FROM hh CROSS JOIN top""".stripMargin,

    "q367_silhouette" ->
      """WITH e AS (SELECT vec_id, label,
        |    CAST(unnest(embedding) AS DOUBLE) AS v,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |cent AS (SELECT label AS cl, i, avg(v) AS c
        |  FROM e GROUP BY 1, 2),
        |d2 AS (SELECT e.vec_id, e.label, cent.cl,
        |    sum((e.v - cent.c) * (e.v - cent.c)) AS dd
        |  FROM e JOIN cent ON e.i = cent.i
        |  GROUP BY 1, 2, 3),
        |ab AS (SELECT vec_id, label,
        |    max(CASE WHEN label = cl THEN sqrt(dd) END) AS a,
        |    min(CASE WHEN label <> cl THEN sqrt(dd) END) AS b
        |  FROM d2 GROUP BY 1, 2)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg((b - a) / greatest(a, b)), 4) AS mean_sil
        |FROM ab GROUP BY 1 ORDER BY 1""".stripMargin,

    "q368_davies_bouldin" ->
      """WITH e AS (SELECT vec_id, label,
        |    CAST(unnest(embedding) AS DOUBLE) AS v,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |cent AS (SELECT label, i, avg(v) AS c FROM e GROUP BY 1, 2),
        |scat AS (SELECT label, avg(d) AS sc FROM (
        |    SELECT e.vec_id, e.label,
        |      sqrt(sum((e.v - cent.c) * (e.v - cent.c))) AS d
        |    FROM e JOIN cent ON e.label = cent.label AND e.i = cent.i
        |    GROUP BY 1, 2) GROUP BY 1),
        |cd AS (SELECT x.label AS la, y.label AS lb,
        |    sqrt(sum((x.c - y.c) * (x.c - y.c))) AS m
        |  FROM cent x JOIN cent y ON x.i = y.i AND x.label <> y.label
        |  GROUP BY 1, 2),
        |rij AS (SELECT cd.la, cd.lb, (sa.sc + sb.sc) / cd.m AS r
        |  FROM cd JOIN scat sa ON sa.label = cd.la
        |    JOIN scat sb ON sb.label = cd.lb),
        |worst AS (SELECT la, max(r) AS rmax FROM rij GROUP BY 1),
        |top AS (SELECT la AS worst_a, lb AS worst_b FROM rij
        |  ORDER BY round(r, 6) DESC, la, lb LIMIT 1),
        |fin AS (SELECT CAST(count(*) AS BIGINT) AS n_labels,
        |    round(avg(rmax), 4) AS db_index FROM worst)
        |SELECT fin.n_labels, fin.db_index, top.worst_a, top.worst_b
        |FROM fin CROSS JOIN top""".stripMargin,

    "q369_eoq_safety_stock" ->
      """WITH li AS (SELECT p.p_brand AS brand,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(l.l_shipdate AS DATE)) AS BIGINT) // 7 AS wk,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |wkq AS (SELECT brand, wk, CAST(sum(q) AS BIGINT) AS wq
        |  FROM li GROUP BY 1, 2),
        |grid AS (SELECT b.brand, w.wk
        |  FROM (SELECT DISTINCT brand FROM li) b
        |  CROSS JOIN (SELECT DISTINCT wk FROM li) w),
        |filled AS (SELECT grid.brand, grid.wk,
        |    coalesce(wkq.wq, 0) AS wq
        |  FROM grid LEFT JOIN wkq ON grid.brand = wkq.brand
        |    AND grid.wk = wkq.wk),
        |st AS (SELECT brand, CAST(count(*) AS BIGINT) AS nw,
        |    CAST(sum(wq) AS BIGINT) AS s1,
        |    CAST(sum(wq * wq) AS BIGINT) AS s2
        |  FROM filled GROUP BY 1),
        |mo AS (SELECT brand, nw,
        |    CAST(s1 AS DOUBLE) / nw AS mw,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nw)
        |      / (nw - 1)) AS sdw,
        |    CAST(s1 AS DOUBLE) * 52.0 / nw AS d_annual
        |  FROM st)
        |SELECT brand, nw AS n_weeks, round(d_annual, 1) AS d_annual,
        |  round(sqrt(2.0 * d_annual * 100.0 / 2.0), 2) AS eoq,
        |  round(1.6448536269514722 * sdw * sqrt(2.0), 2)
        |    AS safety_stock,
        |  round(mw * 2.0 + 1.6448536269514722 * sdw * sqrt(2.0), 2)
        |    AS reorder_point
        |FROM mo ORDER BY brand""".stripMargin,

    "q370_bass_diffusion" ->
      """WITH firsts AS (SELECT o_custkey,
        |    CAST(min(CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) // 7) AS BIGINT)
        |      AS wk
        |  FROM orders GROUP BY 1),
        |adopt AS (SELECT wk, CAST(count(*) AS BIGINT) AS nt
        |  FROM firsts GROUP BY 1),
        |cum AS (SELECT wk, nt,
        |    CAST(sum(nt) OVER (ORDER BY wk) - nt AS BIGINT) AS nprev
        |  FROM adopt),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS nw,
        |    sum(CAST(nprev AS DECIMAL(18,0))) AS sx,
        |    sum(CAST(nprev * nprev AS DECIMAL(18,0))) AS sx2,
        |    sum(CAST(nprev * nprev AS DECIMAL(18,0))
        |      * CAST(nprev AS DECIMAL(18,0))) AS sx3,
        |    sum(CAST(nprev * nprev AS DECIMAL(18,0))
        |      * CAST(nprev * nprev AS DECIMAL(18,0))) AS sx4,
        |    sum(CAST(nt AS DECIMAL(18,0))) AS sy,
        |    sum(CAST(nt * nprev AS DECIMAL(18,0))) AS sxy,
        |    sum(CAST(nt * nprev AS DECIMAL(18,0))
        |      * CAST(nprev AS DECIMAL(18,0))) AS sx2y
        |  FROM cum),
        |sol AS (SELECT nw, CAST(nw AS DOUBLE) AS m00,
        |    CAST(sx AS DOUBLE) AS m01, CAST(sx2 AS DOUBLE) AS m02,
        |    CAST(sx3 AS DOUBLE) AS m13, CAST(sx4 AS DOUBLE) AS m23,
        |    CAST(sy AS DOUBLE) AS b0, CAST(sxy AS DOUBLE) AS b1,
        |    CAST(sx2y AS DOUBLE) AS b2
        |  FROM mo),
        |dets AS (SELECT nw,
        |    m00 * (m02 * m23 - m13 * m13)
        |      - m01 * (m01 * m23 - m13 * m02)
        |      + m02 * (m01 * m13 - m02 * m02) AS dd,
        |    b0 * (m02 * m23 - m13 * m13)
        |      - m01 * (b1 * m23 - m13 * b2)
        |      + m02 * (b1 * m13 - m02 * b2) AS da,
        |    m00 * (b1 * m23 - m13 * b2)
        |      - b0 * (m01 * m23 - m13 * m02)
        |      + m02 * (m01 * b2 - b1 * m02) AS db,
        |    m00 * (m02 * b2 - b1 * m13)
        |      - m01 * (m01 * b2 - b1 * m02)
        |      + b0 * (m01 * m13 - m02 * m02) AS dc
        |  FROM sol),
        |abc AS (SELECT nw AS n_weeks, da / dd AS a, db / dd AS b,
        |    dc / dd AS c FROM dets)
        |SELECT n_weeks, round(a, 4) AS a, round(b, 6) AS b,
        |  round(c, 8) AS c,
        |  CASE WHEN c < 0 THEN round((-b - sqrt(b * b - 4.0 * a * c))
        |    / (2.0 * c), 1) END AS m_est,
        |  CASE WHEN c < 0 THEN round(a / ((-b - sqrt(b * b
        |    - 4.0 * a * c)) / (2.0 * c)), 6) END AS p_innov,
        |  CASE WHEN c < 0 THEN round(-c * ((-b - sqrt(b * b
        |    - 4.0 * a * c)) / (2.0 * c)), 6) END AS q_imit
        |FROM abc""".stripMargin,

    "q371_page_trend" ->
      """WITH segs AS (SELECT DISTINCT c_mktsegment AS seg
        |  FROM customer),
        |sidx AS (SELECT seg, CAST(row_number() OVER (ORDER BY seg)
        |    AS BIGINT) AS j FROM segs),
        |grid AS (SELECT n_nationkey AS nk, seg
        |  FROM nation CROSS JOIN segs),
        |sums AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sv
        |  FROM customer GROUP BY 1, 2),
        |cells AS (SELECT grid.nk, grid.seg, coalesce(sums.sv, 0) AS v
        |  FROM grid LEFT JOIN sums ON grid.nk = sums.nk
        |    AND grid.seg = sums.seg),
        |ranked AS (SELECT a.nk, a.seg,
        |    2 * sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 1 AS ar2
        |  FROM cells a JOIN cells b ON a.nk = b.nk GROUP BY 1, 2),
        |ll AS (SELECT CAST(sum(j * ar2) AS BIGINT) AS l2
        |  FROM ranked JOIN sidx USING (seg)),
        |bk AS (SELECT CAST(count(DISTINCT nk) AS BIGINT) AS b,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS k FROM cells),
        |zz AS (SELECT b AS n_blocks, k AS k_treatments, l2,
        |    (l2 - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1) / 2) /
        |      sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k + 1)
        |        * (k - 1) / 36) AS zr
        |  FROM ll CROSS JOIN bk)
        |SELECT n_blocks, k_treatments, l2, round(zr, 4) AS z,
        |  CASE WHEN zr > 1.645 THEN 'upward_trend'
        |       WHEN zr < -1.645 THEN 'downward_trend'
        |       ELSE 'no_trend' END AS verdict
        |FROM zz""".stripMargin,

    "q372_ansari_bradley" ->
      """WITH base AS (SELECT
        |    CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
        |      THEN 1 ELSE 0 END AS ga,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderkey AS ok
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)),
        |rk AS (SELECT ga, CAST(row_number() OVER (ORDER BY v, ok)
        |    AS BIGINT) AS rk FROM base),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(ga) AS BIGINT) AS na FROM base),
        |ab AS (SELECT min(nn.n) AS n, min(nn.na) AS na,
        |    CAST(sum(rk.ga * least(rk.rk, nn.n + 1 - rk.rk)) AS BIGINT)
        |      AS ab
        |  FROM rk CROSS JOIN nn),
        |zz AS (SELECT na AS n_1995, n - na AS n_1996, ab AS ab_stat,
        |    CASE WHEN n % 2 = 0 THEN
        |      (ab - CAST(na AS DOUBLE) * (n + 2) / 4) /
        |      sqrt(CAST(na AS DOUBLE) * (n - na) * (n + 2) * (n - 2)
        |        / (48.0 * (n - 1)))
        |    ELSE
        |      (ab - CAST(na AS DOUBLE) * (n + 1) * (n + 1) / (4.0 * n)) /
        |      sqrt(CAST(na AS DOUBLE) * (n - na) * (n + 1)
        |        * (3.0 + CAST(n AS DOUBLE) * n)
        |        / (48.0 * CAST(n AS DOUBLE) * n))
        |    END AS zr
        |  FROM ab)
        |SELECT n_1995, n_1996, ab_stat, round(zr, 4) AS z,
        |  CASE WHEN zr > 1.96 THEN 'less_dispersed_1995'
        |       WHEN zr < -1.96 THEN 'more_dispersed_1995'
        |       ELSE 'no_change' END AS verdict
        |FROM zz""".stripMargin,

    "q373_chow_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS DOUBLE) / 100.0 AS y
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT CAST(date_diff('day', DATE '1992-01-01', day)
        |      AS DOUBLE) AS tt, y,
        |    CASE WHEN day < DATE '1995-01-01' THEN 1 ELSE 2 END AS seg
        |  FROM daily),
        |pm AS (SELECT seg AS g, CAST(count(*) AS DOUBLE) AS n,
        |    sum(tt) AS st, sum(tt * tt) AS stt, sum(y) AS sy,
        |    sum(y * y) AS syy, sum(tt * y) AS sty
        |  FROM pts GROUP BY 1),
        |ps AS (SELECT g, n,
        |    syy - sy * sy / n - (sty - st * sy / n) * (sty - st * sy / n)
        |      / (stt - st * st / n) AS ssr
        |  FROM pm),
        |qm AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(tt) AS st,
        |    sum(tt * tt) AS stt, sum(y) AS sy, sum(y * y) AS syy,
        |    sum(tt * y) AS sty
        |  FROM pts),
        |qs AS (SELECT
        |    syy - sy * sy / n - (sty - st * sy / n) * (sty - st * sy / n)
        |      / (stt - st * st / n) AS ssrp
        |  FROM qm),
        |ag AS (SELECT sum(ssr) AS ssr12, sum(n) AS n FROM ps),
        |ff AS (SELECT CAST(ag.n AS BIGINT) AS n_days,
        |    round(qs.ssrp / 1e6, 2) AS ssr_pooled_m,
        |    round(ag.ssr12 / 1e6, 2) AS ssr_split_m,
        |    ((qs.ssrp - ag.ssr12) / 2) / (ag.ssr12 / (ag.n - 4)) AS f,
        |    ag.n AS nd
        |  FROM ag CROSS JOIN qs)
        |SELECT n_days, ssr_pooled_m, ssr_split_m,
        |  round(f, 4) AS chow_f,
        |  round(pow(1.0 + 2 * f / (nd - 4), -(nd - 4) / 2), 6)
        |    AS p_value
        |FROM ff""".stripMargin,

    "q374_breusch_pagan" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS DOUBLE) / 100.0 AS y
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT CAST(date_diff('day', DATE '1992-01-01', day)
        |    AS DOUBLE) AS tt, y FROM daily),
        |m1 AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(tt) AS st,
        |    sum(tt * tt) AS stt, sum(y) AS sy, sum(tt * y) AS sty
        |  FROM pts),
        |m2 AS (SELECT n,
        |    (sty - st * sy / n) / (stt - st * st / n) AS beta, st, sy
        |  FROM m1),
        |m3 AS (SELECT n, beta, (sy - beta * st) / n AS alpha FROM m2),
        |res AS (SELECT tt,
        |    (y - m3.alpha - m3.beta * tt) * (y - m3.alpha - m3.beta * tt)
        |      AS u
        |  FROM pts CROSS JOIN m3),
        |lm0 AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(tt) AS st,
        |    sum(tt * tt) AS stt, sum(u) AS su, sum(u * u) AS suu,
        |    sum(tt * u) AS stu
        |  FROM res),
        |lm1 AS (SELECT n,
        |    (stu - st * su / n) * (stu - st * su / n)
        |      / ((stt - st * st / n) * (suu - su * su / n)) AS r2
        |  FROM lm0),
        |lm2 AS (SELECT n, n * r2 AS lm FROM lm1),
        |pp AS (SELECT n, lm, sqrt(lm) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (sqrt(lm) / sqrt(2.0))) AS t
        |  FROM lm2)
        |SELECT CAST(n AS BIGINT) AS n_days, round(lm, 4) AS lm_stat,
        |  round((0.254829592 * t - 0.284496736 * t * t
        |    + 1.421413741 * t * t * t - 1.453152027 * t * t * t * t
        |    + 1.061405429 * t * t * t * t * t) * exp(-x * x), 6)
        |    AS p_value
        |FROM pp""".stripMargin,

    "q375_jarque_bera" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS DOUBLE) / 100.0 AS y
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT CAST(date_diff('day', DATE '1992-01-01', day)
        |    AS DOUBLE) AS tt, y FROM daily),
        |m1 AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(tt) AS st,
        |    sum(tt * tt) AS stt, sum(y) AS sy, sum(tt * y) AS sty
        |  FROM pts),
        |m2 AS (SELECT n,
        |    (sty - st * sy / n) / (stt - st * st / n) AS beta, st, sy
        |  FROM m1),
        |m3 AS (SELECT n, beta, (sy - beta * st) / n AS alpha FROM m2),
        |res AS (SELECT (y - m3.alpha - m3.beta * tt) AS e
        |  FROM pts CROSS JOIN m3),
        |jm AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(e) AS s1,
        |    sum(e * e) AS s2, sum(e * e * e) AS s3,
        |    sum(e * e * e * e) AS s4
        |  FROM res),
        |jc AS (SELECT n, s2 / n AS v2, s3 / n AS m3, s4 / n AS m4
        |  FROM jm),
        |jg AS (SELECT n, m3 / pow(v2, 1.5) AS g1,
        |    m4 / (v2 * v2) - 3 AS g2 FROM jc),
        |jb AS (SELECT n, g1, g2,
        |    n / 6 * (g1 * g1 + g2 * g2 / 4) AS jb FROM jg)
        |SELECT CAST(n AS BIGINT) AS n_days, round(g1, 4) AS skew,
        |  round(g2, 4) AS ex_kurt, round(jb, 4) AS jb_stat,
        |  round(exp(-jb / 2), 6) AS p_value
        |FROM jb""".stripMargin,

    "q376_cooks_distance" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS DOUBLE) / 100.0 AS y
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT day,
        |    CAST(date_diff('day', DATE '1992-01-01', day) AS DOUBLE)
        |      AS tt, y
        |  FROM daily),
        |m1 AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(tt) AS st,
        |    sum(tt * tt) AS stt, sum(y) AS sy, sum(y * y) AS syy,
        |    sum(tt * y) AS sty
        |  FROM pts),
        |m2 AS (SELECT n, st, stt, sy, syy, sty,
        |    (sty - st * sy / n) / (stt - st * st / n) AS beta
        |  FROM m1),
        |m3 AS (SELECT n, beta, (sy - beta * st) / n AS alpha,
        |    st / n AS tbar, stt - st * st / n AS sxx,
        |    (syy - sy * sy / n - (sty - st * sy / n) * (sty - st * sy / n)
        |      / (stt - st * st / n)) / (n - 2) AS s2
        |  FROM m2),
        |dd AS (SELECT pts.day,
        |    (y - m3.alpha - m3.beta * tt) AS e,
        |    1.0 / m3.n + (tt - m3.tbar) * (tt - m3.tbar) / m3.sxx AS h,
        |    m3.s2 AS s2
        |  FROM pts CROSS JOIN m3)
        |SELECT CAST(day AS VARCHAR) AS day, round(e, 2) AS residual,
        |  round(h, 6) AS leverage,
        |  round(e * e / (2.0 * s2) * h / ((1.0 - h) * (1.0 - h)), 6)
        |    AS cooks_d
        |FROM dd ORDER BY cooks_d DESC, day LIMIT 5""".stripMargin,

    "q377_rouge1" ->
      """WITH d AS (SELECT doc_id, text FROM documents UNION ALL
        |  SELECT doc_id + 100000, substr(text, 21) FROM documents),
        |tk AS (SELECT fam, side, term FROM (
        |    SELECT doc_id % 100000 AS fam,
        |      CASE WHEN doc_id < 100000 THEN 'ref' ELSE 'cand' END
        |        AS side,
        |      unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
        |        AS term
        |    FROM d) WHERE term <> ''),
        |cnt AS (SELECT fam, side, term, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2, 3),
        |lens AS (SELECT fam, side, CAST(count(*) AS BIGINT) AS len
        |  FROM tk GROUP BY 1, 2),
        |ov AS (SELECT r.fam, CAST(sum(least(r.c, cn.c)) AS BIGINT)
        |    AS ov
        |  FROM cnt r JOIN cnt cn ON r.fam = cn.fam AND r.term = cn.term
        |  WHERE r.side = 'ref' AND cn.side = 'cand' GROUP BY 1),
        |per AS (SELECT lr.fam,
        |    CAST(coalesce(ov.ov, 0) AS DOUBLE) / lr.len AS r,
        |    CAST(coalesce(ov.ov, 0) AS DOUBLE) / lc.len AS p
        |  FROM lens lr JOIN lens lc ON lr.fam = lc.fam
        |    AND lr.side = 'ref' AND lc.side = 'cand'
        |  LEFT JOIN ov ON ov.fam = lr.fam),
        |ff AS (SELECT fam, r, p,
        |    CASE WHEN r + p > 0 THEN 2.0 * r * p / (r + p)
        |      ELSE 0.0 END AS f1
        |  FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(avg(r), 4) AS avg_recall,
        |  round(avg(p), 4) AS avg_precision,
        |  round(avg(f1), 4) AS avg_f1
        |FROM ff""".stripMargin,

    "q378_bleu2" ->
      """WITH d AS (SELECT doc_id, text FROM documents UNION ALL
        |  SELECT doc_id + 100000, substr(text, 21) FROM documents),
        |tk AS (SELECT doc_id % 100000 AS fam,
        |    CASE WHEN doc_id < 100000 THEN 'ref' ELSE 'cand' END
        |      AS side,
        |    unnest(list_filter(string_split_regex(lower(text),
        |      '[^a-z0-9]+'), x -> x <> '')) AS term,
        |    generate_subscripts(list_filter(string_split_regex(
        |      lower(text), '[^a-z0-9]+'), x -> x <> ''), 1) AS i
        |  FROM d),
        |c1 AS (SELECT fam, side, term, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2, 3),
        |m1 AS (SELECT CAST(sum(least(r.c, cn.c)) AS BIGINT) AS m1
        |  FROM c1 r JOIN c1 cn ON r.fam = cn.fam AND r.term = cn.term
        |  WHERE r.side = 'ref' AND cn.side = 'cand'),
        |bg AS (SELECT a.fam, a.side, a.term || ' ' || b.term AS term
        |  FROM tk a JOIN tk b ON a.fam = b.fam AND a.side = b.side
        |    AND b.i = a.i + 1),
        |c2 AS (SELECT fam, side, term, CAST(count(*) AS BIGINT) AS c
        |  FROM bg GROUP BY 1, 2, 3),
        |m2 AS (SELECT CAST(sum(least(r.c, cn.c)) AS BIGINT) AS m2
        |  FROM c2 r JOIN c2 cn ON r.fam = cn.fam AND r.term = cn.term
        |  WHERE r.side = 'ref' AND cn.side = 'cand'),
        |tt AS (SELECT
        |    CAST(sum(CASE WHEN side = 'cand' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS t1,
        |    CAST(sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tr,
        |    CAST(count(DISTINCT CASE WHEN side = 'cand' THEN fam END)
        |      AS BIGINT) AS nf
        |  FROM tk),
        |t2 AS (SELECT CAST(count(*) AS BIGINT) AS t2 FROM bg
        |  WHERE side = 'cand'),
        |fin AS (SELECT tt.nf AS n_pairs,
        |    CAST(m1.m1 AS DOUBLE) / tt.t1 AS p1,
        |    CAST(m2.m2 AS DOUBLE) / t2.t2 AS p2,
        |    least(1.0, exp(1.0 - CAST(tt.tr AS DOUBLE) / tt.t1)) AS bp
        |  FROM m1 CROSS JOIN m2 CROSS JOIN tt CROSS JOIN t2)
        |SELECT n_pairs, round(p1, 4) AS p1, round(p2, 4) AS p2,
        |  round(bp, 4) AS bp,
        |  round(bp * exp(0.5 * ln(p1) + 0.5 * ln(p2)), 4) AS bleu2
        |FROM fin""".stripMargin,

    "q379_fd_discovery" -> {
      val attrs = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_orderdate")
      val parts = attrs.map { a =>
        val others = attrs.filterNot(_ == a)
        val ds = others.map(b => s"count(DISTINCT $b) AS d_$b")
          .mkString(", ")
        val sums = others.map(b =>
          s"CAST(sum(CASE WHEN d_$b > 1 THEN 1 ELSE 0 END) AS BIGINT)" +
            s" AS v_$b").mkString(", ")
        s"g_$a AS (SELECT $a, $ds FROM orders GROUP BY 1),\n" +
          s"s_$a AS (SELECT $sums FROM g_$a)"
      }.mkString(",\n")
      val rows = attrs.flatMap { a =>
        attrs.filterNot(_ == a).map(b =>
          s"SELECT '$a' AS lhs, '$b' AS rhs, " +
            s"v_$b AS n_violating_groups FROM s_$a")
      }.mkString("\nUNION ALL\n")
      s"WITH $parts,\nu AS ($rows)\n" +
        "SELECT lhs, rhs, n_violating_groups, " +
        "n_violating_groups = 0 AS holds FROM u ORDER BY lhs, rhs"
    },

    "q380_ind_discovery" -> {
      val cands = Seq(
        ("o_custkey<=c_custkey", "orders", "o_custkey",
          "customer", "c_custkey"),
        ("l_orderkey<=o_orderkey", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        ("c_nationkey<=n_nationkey", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        ("s_nationkey<=n_nationkey", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
        ("n_regionkey<=r_regionkey", "nation", "n_regionkey",
          "region", "r_regionkey"),
        ("c_custkey<=o_custkey", "customer", "c_custkey",
          "orders", "o_custkey"))
      val rows = cands.map { case (name, lt, lc, rt, rc) =>
        s"""SELECT '$name' AS candidate,
           |  CAST((SELECT count(DISTINCT $lc) FROM $lt) AS BIGINT)
           |    AS n_distinct_lhs,
           |  CAST((SELECT count(*) FROM
           |      (SELECT DISTINCT CAST($lc AS BIGINT) AS v FROM $lt) ll
           |    WHERE NOT EXISTS (SELECT 1 FROM $rt
           |      WHERE CAST($rc AS BIGINT) = ll.v)) AS BIGINT)
           |    AS n_missing""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH u AS ($rows)\n" +
        "SELECT candidate, n_distinct_lhs, n_missing, " +
        "n_missing = 0 AS holds FROM u ORDER BY candidate"
    },

    "q381_tree_rollup" ->
      """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS ck,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
        |  FROM customer),
        |pows AS (SELECT CAST(unnest([1, 10, 100, 1000, 10000, 100000,
        |    1000000]) AS BIGINT) AS p),
        |anc AS (SELECT ck // p AS node, v,
        |    CASE WHEN p = 1 THEN 0 ELSE 1 END AS is_desc
        |  FROM base CROSS JOIN pows WHERE ck // p > 0),
        |roll AS (SELECT node, CAST(sum(v) AS BIGINT) AS subtree_cents,
        |    CAST(sum(is_desc) AS BIGINT) AS n_desc
        |  FROM anc GROUP BY 1 HAVING sum(is_desc) > 0)
        |SELECT node, n_desc,
        |  round(CAST(subtree_cents AS DOUBLE) / 100.0, 2)
        |    AS subtree_dollars
        |FROM roll ORDER BY subtree_cents DESC, node LIMIT 10""".stripMargin,

    "q382_late_events" ->
      """WITH ev AS (SELECT event_id AS id, event_type AS et,
        |    epoch_us(ts) AS tsu FROM events),
        |wm AS (SELECT id, et, tsu,
        |    max(tsu) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS run
        |  FROM ev),
        |mk AS (SELECT et,
        |    CASE WHEN run IS NULL THEN 0
        |      WHEN tsu < run - 3600000000 THEN 1 ELSE 0 END AS late
        |  FROM wm)
        |SELECT et, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(late) AS BIGINT) AS n_late,
        |  round(CAST(sum(late) AS DOUBLE) / count(*), 4) AS late_share
        |FROM mk GROUP BY 1 ORDER BY 1""".stripMargin,

    "q383_weighted_median" ->
      """WITH base AS (SELECT l_returnflag AS fl,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS w,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * 17179869184 + l_orderkey * 8 + l_linenumber AS ok
        |  FROM lineitem),
        |cum AS (SELECT fl, cents,
        |    CAST(sum(w) OVER (PARTITION BY fl ORDER BY ok) AS BIGINT)
        |      AS cw
        |  FROM base),
        |tot AS (SELECT fl, CAST(sum(w) AS BIGINT) AS tw
        |  FROM base GROUP BY 1),
        |med AS (SELECT cum.fl, min(tot.tw) AS tw,
        |    CAST(min(cents) AS BIGINT) AS med_cents
        |  FROM cum JOIN tot ON cum.fl = tot.fl
        |  WHERE cum.cw * 2 >= tot.tw GROUP BY 1)
        |SELECT fl AS returnflag, tw AS total_weight,
        |  round(CAST(med_cents AS DOUBLE) / 100.0, 2)
        |    AS weighted_median_price
        |FROM med ORDER BY returnflag""".stripMargin,

    "q384_overdispersion" ->
      """WITH ev AS (SELECT user_id AS u, event_type AS et FROM events),
        |cnts AS (SELECT u, et, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |grid AS (SELECT u, et
        |  FROM (SELECT DISTINCT u FROM ev)
        |  CROSS JOIN (SELECT DISTINCT et FROM ev)),
        |filled AS (SELECT grid.u, grid.et, coalesce(cnts.c, 0) AS c
        |  FROM grid LEFT JOIN cnts ON grid.u = cnts.u
        |    AND grid.et = cnts.et),
        |st AS (SELECT et, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
        |  FROM filled GROUP BY 1),
        |mo AS (SELECT et, n_users,
        |    CAST(s1 AS DOUBLE) / n_users AS m,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_users)
        |      / (n_users - 1) AS v,
        |    CAST(z AS DOUBLE) / n_users AS z_obs
        |  FROM st)
        |SELECT et, n_users, round(m, 4) AS mean,
        |  round(v, 4) AS variance, round(v / m, 4) AS dispersion,
        |  round(z_obs, 4) AS zero_share_obs,
        |  round(exp(-m), 6) AS zero_share_poisson,
        |  CASE WHEN v > m THEN round(m * m / (v - m), 4) END AS nb_size
        |FROM mo ORDER BY et""".stripMargin,

    "q385_gumbel_maxima" ->
      """WITH wk AS (SELECT
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) // 7 AS wk,
        |    CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS mx
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nw,
        |    CAST(sum(mx) AS BIGINT) AS s1,
        |    CAST(sum(mx * mx) AS BIGINT) AS s2
        |  FROM wk),
        |mo AS (SELECT nw, CAST(s1 AS DOUBLE) / nw / 100.0 AS m,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nw)
        |      / (nw - 1)) / 100.0 AS sd
        |  FROM st),
        |gb AS (SELECT nw, sd * sqrt(6.0) / pi() AS beta, m FROM mo),
        |gm AS (SELECT nw, m - 0.5772156649015329 * beta AS mu, beta
        |  FROM gb)
        |SELECT nw AS n_weeks, round(mu, 2) AS gumbel_mu,
        |  round(beta, 2) AS gumbel_beta,
        |  round(mu - beta * ln(-ln(0.99)), 2) AS return_level_p99
        |FROM gm""".stripMargin,

    "q386_pot_gpd" ->
      """WITH o AS (SELECT
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderkey AS ok FROM orders),
        |rk AS (SELECT v, CAST(row_number() OVER (ORDER BY v, ok)
        |    AS BIGINT) AS rk FROM o),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |thr AS (SELECT rk.v AS u, nn.n FROM rk CROSS JOIN nn
        |  WHERE rk.rk = (nn.n * 95 + 99) // 100),
        |exc AS (SELECT CAST(o.v - thr.u AS DOUBLE) / 100.0 AS e,
        |    thr.u, thr.n
        |  FROM o CROSS JOIN thr WHERE o.v > thr.u),
        |st AS (SELECT min(u) AS u, min(n) AS n,
        |    CAST(count(*) AS BIGINT) AS nu, avg(e) AS me,
        |    sum(e * e) AS s2
        |  FROM exc),
        |vv AS (SELECT u, n, nu, me,
        |    (s2 - nu * me * me) / (nu - 1) AS ve FROM st),
        |gp AS (SELECT u, n, nu, me,
        |    0.5 * (1.0 - me * me / ve) AS xi,
        |    0.5 * me * (me * me / ve + 1) AS beta
        |  FROM vv)
        |SELECT round(CAST(u AS DOUBLE) / 100.0, 2) AS threshold_p95,
        |  nu AS n_excesses, round(xi, 4) AS gpd_xi,
        |  round(beta, 2) AS gpd_beta,
        |  round(CAST(u AS DOUBLE) / 100.0 + beta / xi *
        |    (pow(CAST(n AS DOUBLE) / nu * 0.001, -xi) - 1), 2)
        |    AS q999_est
        |FROM gp""".stripMargin,

    "q387_robust_location" ->
      """WITH o AS (SELECT
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderkey AS ok FROM orders),
        |rk AS (SELECT v, CAST(row_number() OVER (ORDER BY v, ok)
        |    AS BIGINT) AS rk FROM o),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    (CAST(count(*) AS BIGINT) * 5) // 100 AS k FROM o),
        |cuts AS (SELECT min(nn.n) AS n, min(nn.k) AS k,
        |    CAST(min(rk.v) AS BIGINT) AS lo,
        |    CAST(max(rk.v) AS BIGINT) AS hi
        |  FROM rk CROSS JOIN nn
        |  WHERE rk.rk = nn.k + 1 OR rk.rk = nn.n - nn.k),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(rk.v) AS BIGINT) AS sraw,
        |    CAST(sum(CASE WHEN rk.rk > cuts.k
        |      AND rk.rk <= cuts.n - cuts.k THEN rk.v ELSE 0 END)
        |      AS BIGINT) AS strim,
        |    CAST(sum(CASE WHEN rk.rk > cuts.k
        |      AND rk.rk <= cuts.n - cuts.k THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ntrim,
        |    CAST(sum(greatest(least(rk.v, cuts.hi), cuts.lo))
        |      AS BIGINT) AS swin
        |  FROM rk CROSS JOIN cuts)
        |SELECT n_orders,
        |  round(CAST(sraw AS DOUBLE) / n_orders / 100.0, 2)
        |    AS mean_raw,
        |  round(CAST(strim AS DOUBLE) / ntrim / 100.0, 2)
        |    AS mean_trimmed5,
        |  round(CAST(swin AS DOUBLE) / n_orders / 100.0, 2)
        |    AS mean_winsorized5
        |FROM agg""".stripMargin,

    "q388_octile_shape" ->
      """WITH o AS (SELECT
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |    o_orderkey AS ok FROM orders),
        |rk AS (SELECT v, CAST(row_number() OVER (ORDER BY v, ok)
        |    AS BIGINT) AS rk FROM o),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |oct AS (SELECT min(nn.n) AS n,
        |    max(CASE WHEN rk.rk = (nn.n * 1 + 7) // 8 THEN rk.v END)
        |      AS e1,
        |    max(CASE WHEN rk.rk = (nn.n * 2 + 7) // 8 THEN rk.v END)
        |      AS e2,
        |    max(CASE WHEN rk.rk = (nn.n * 3 + 7) // 8 THEN rk.v END)
        |      AS e3,
        |    max(CASE WHEN rk.rk = (nn.n * 4 + 7) // 8 THEN rk.v END)
        |      AS e4,
        |    max(CASE WHEN rk.rk = (nn.n * 5 + 7) // 8 THEN rk.v END)
        |      AS e5,
        |    max(CASE WHEN rk.rk = (nn.n * 6 + 7) // 8 THEN rk.v END)
        |      AS e6,
        |    max(CASE WHEN rk.rk = (nn.n * 7 + 7) // 8 THEN rk.v END)
        |      AS e7
        |  FROM rk CROSS JOIN nn)
        |SELECT n AS n_orders,
        |  round(CAST(e6 + e2 - 2 * e4 AS DOUBLE) / (e6 - e2), 4)
        |    AS bowley_skew,
        |  round(CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / (e6 - e2), 4)
        |    AS moors_kurtosis
        |FROM oct""".stripMargin,

    "q389_imputation_audit" -> {
      val kh = graft.ops.Sampling.keyHashSql("c_custkey")
      s"""WITH base AS (SELECT c_custkey AS ck, c_nationkey AS nk,
         |    c_mktsegment AS sg,
         |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
         |    (($kh) % 10) < 2 AS miss
         |  FROM customer),
         |obs AS (SELECT * FROM base WHERE NOT miss),
         |cell AS (SELECT nk, sg,
         |    CAST(sum(v) AS DOUBLE) / count(*) AS cm
         |  FROM obs GROUP BY 1, 2),
         |gmean AS (SELECT CAST(sum(v) AS DOUBLE) / count(*) AS gm
         |  FROM obs),
         |ms AS (SELECT base.v, coalesce(cell.cm, gmean.gm) AS grp,
         |    gmean.gm
         |  FROM base LEFT JOIN cell ON base.nk = cell.nk
         |    AND base.sg = cell.sg
         |  CROSS JOIN gmean WHERE base.miss),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_missing,
         |    avg(abs(grp - v)) AS mae_g, avg(grp - v) AS bias_g,
         |    avg(abs(gm - v)) AS mae_gl
         |  FROM ms)
         |SELECT n_missing, round(mae_g / 100.0, 2) AS mae_group,
         |  round(bias_g / 100.0, 2) AS bias_group,
         |  round(mae_gl / 100.0, 2) AS mae_global
         |FROM agg""".stripMargin
    },

    "q390_k_anonymity" ->
      """WITH base AS (SELECT c_custkey AS ck, c_nationkey AS nk,
        |    c_mktsegment AS sg,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
        |  FROM customer),
        |rk AS (SELECT nk, sg, CAST(row_number() OVER (ORDER BY v, ck)
        |    AS BIGINT) AS rk FROM base),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |dc AS (SELECT nk, sg, ((rk - 1) * 10) // nn.n AS dec
        |  FROM rk CROSS JOIN nn),
        |grp AS (SELECT nk, dec, CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT sg) AS BIGINT) AS l
        |  FROM dc GROUP BY 1, 2),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(sz) AS BIGINT) AS n_rows,
        |    CAST(min(sz) AS BIGINT) AS k_min,
        |    CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |      AS rows_lt5,
        |    CAST(min(l) AS BIGINT) AS l_min,
        |    CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS groups_l1
        |  FROM grp)
        |SELECT n_groups, n_rows, k_min,
        |  round(CAST(rows_lt5 AS DOUBLE) / n_rows, 4)
        |    AS share_rows_below_k5,
        |  l_min,
        |  round(CAST(groups_l1 AS DOUBLE) / n_groups, 4)
        |    AS share_groups_l1
        |FROM agg""".stripMargin,

    "q391_holt_winters" -> {
      val step =
        """SELECT h.t + 1,
          |      0.3 * (g.y - CASE (h.t + 1) % 4 WHEN 0 THEN h.s0
          |        WHEN 1 THEN h.s1 WHEN 2 THEN h.s2 ELSE h.s3 END)
          |        + 0.7 * (h.l + h.b),
          |      0.1 * ((0.3 * (g.y - CASE (h.t + 1) % 4 WHEN 0 THEN h.s0
          |        WHEN 1 THEN h.s1 WHEN 2 THEN h.s2 ELSE h.s3 END)
          |        + 0.7 * (h.l + h.b)) - h.l) + 0.9 * h.b,
          |      CASE WHEN (h.t + 1) % 4 = 0 THEN
          |        0.2 * (g.y - (0.3 * (g.y - h.s0) + 0.7 * (h.l + h.b)))
          |          + 0.8 * h.s0 ELSE h.s0 END,
          |      CASE WHEN (h.t + 1) % 4 = 1 THEN
          |        0.2 * (g.y - (0.3 * (g.y - h.s1) + 0.7 * (h.l + h.b)))
          |          + 0.8 * h.s1 ELSE h.s1 END,
          |      CASE WHEN (h.t + 1) % 4 = 2 THEN
          |        0.2 * (g.y - (0.3 * (g.y - h.s2) + 0.7 * (h.l + h.b)))
          |          + 0.8 * h.s2 ELSE h.s2 END,
          |      CASE WHEN (h.t + 1) % 4 = 3 THEN
          |        0.2 * (g.y - (0.3 * (g.y - h.s3) + 0.7 * (h.l + h.b)))
          |          + 0.8 * h.s3 ELSE h.s3 END,
          |      h.sae + abs(g.y - (h.l + h.b
          |        + CASE (h.t + 1) % 4 WHEN 0 THEN h.s0 WHEN 1 THEN h.s1
          |          WHEN 2 THEN h.s2 ELSE h.s3 END))""".stripMargin
      s"""WITH q AS (SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 4
         |      + (month(CAST(o_orderdate AS DATE)) - 1) // 3 AS t,
         |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS DOUBLE)
         |      / 1000.0 AS y
         |  FROM orders GROUP BY 1),
         |g AS (SELECT CAST(r.range AS BIGINT) AS t,
         |    coalesce(q.y, 0.0) AS y
         |  FROM range(27) r LEFT JOIN q ON q.t = r.range),
         |base AS (SELECT
         |    (a0.y + a1.y + a2.y + a3.y) / 4 AS l0,
         |    ((a4.y + a5.y + a6.y + a7.y) / 4
         |      - (a0.y + a1.y + a2.y + a3.y) / 4) / 4 AS b0,
         |    a0.y - (a0.y + a1.y + a2.y + a3.y) / 4 AS s00,
         |    a1.y - (a0.y + a1.y + a2.y + a3.y) / 4 AS s01,
         |    a2.y - (a0.y + a1.y + a2.y + a3.y) / 4 AS s02,
         |    a3.y - (a0.y + a1.y + a2.y + a3.y) / 4 AS s03
         |  FROM g a0, g a1, g a2, g a3, g a4, g a5, g a6, g a7
         |  WHERE a0.t = 0 AND a1.t = 1 AND a2.t = 2 AND a3.t = 3
         |    AND a4.t = 4 AND a5.t = 5 AND a6.t = 6 AND a7.t = 7)
         |SELECT 27 AS n_quarters, round(l, 2) AS level_kusd,
         |  round(b, 2) AS trend_kusd,
         |  round(l + b + s3, 2) AS forecast_kusd,
         |  round(sae / 23.0, 2) AS mae_kusd
         |FROM (
         |  WITH RECURSIVE h(t, l, b, s0, s1, s2, s3, sae) AS (
         |    SELECT CAST(3 AS BIGINT), l0, b0, s00, s01, s02, s03,
         |      CAST(0.0 AS DOUBLE) FROM base
         |    UNION ALL
         |    $step
         |    FROM h JOIN g ON g.t = h.t + 1 WHERE h.t < 26)
         |  SELECT l, b, s3, sae FROM h WHERE t = 26)""".stripMargin
    },

    "q392_cliffs_delta" ->
      """WITH base AS (SELECT
        |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)),
        |cnt AS (SELECT yr, v, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |grid AS (SELECT y.yr, d.v
        |  FROM (SELECT DISTINCT v FROM base) d
        |  CROSS JOIN (SELECT DISTINCT yr FROM base) y),
        |filled AS (SELECT grid.yr, grid.v, coalesce(cnt.c, 0) AS c
        |  FROM grid LEFT JOIN cnt ON grid.yr = cnt.yr
        |    AND grid.v = cnt.v),
        |cum AS (SELECT yr, v, c,
        |    CAST(sum(c) OVER (PARTITION BY yr ORDER BY v) AS BIGINT)
        |      AS cum
        |  FROM filled),
        |c96 AS (SELECT v, c AS c96, cum AS cum96 FROM cum
        |  WHERE yr = 1996),
        |c95 AS (SELECT v, c AS c95 FROM cnt WHERE yr = 1995),
        |tots AS (SELECT yr, CAST(count(*) AS BIGINT) AS n
        |  FROM base GROUP BY 1),
        |agg AS (SELECT
        |    CAST(sum(c95.c95 * (c96.cum96 - c96.c96)) AS BIGINT) AS gt,
        |    CAST(sum(c95.c95 * (t96.n - c96.cum96)) AS BIGINT) AS lt,
        |    CAST(sum(c95.c95 * c96.c96) AS BIGINT) AS eq
        |  FROM c95 JOIN c96 ON c95.v = c96.v
        |  CROSS JOIN (SELECT n FROM tots WHERE yr = 1996) t96)
        |SELECT t95.n AS n95, t96.n AS n96,
        |  round(CAST(agg.gt - agg.lt AS DOUBLE)
        |    / (CAST(t95.n AS DOUBLE) * t96.n), 6) AS cliffs_delta,
        |  round((CAST(agg.gt AS DOUBLE) + 0.5 * agg.eq)
        |    / (CAST(t95.n AS DOUBLE) * t96.n), 4) AS p_superiority
        |FROM agg
        |CROSS JOIN (SELECT n FROM tots WHERE yr = 1995) t95
        |CROSS JOIN (SELECT n FROM tots WHERE yr = 1996) t96""".stripMargin,

    "q393_g_test" -> {
      val ser = (0 to 7).map(j =>
        if (j == 0) "1.0"
        else s"pow(g / 2, $j.0) / ${(1 to j).map(_.toDouble).product}")
        .mkString(" + ")
      s"""WITH cells AS (SELECT c.c_mktsegment AS sg,
         |    o.o_orderpriority AS pr, CAST(count(*) AS BIGINT) AS o
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |rw AS (SELECT sg, CAST(sum(o) AS BIGINT) AS r
         |  FROM cells GROUP BY 1),
         |cl AS (SELECT pr, CAST(sum(o) AS BIGINT) AS c
         |  FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
         |gg AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |    min(nn.n) AS n,
         |    2.0 * sum(cells.o * ln(CAST(cells.o AS DOUBLE) * nn.n
         |      / (CAST(rw.r AS DOUBLE) * cl.c))) AS g
         |  FROM cells JOIN rw USING (sg) JOIN cl USING (pr)
         |  CROSS JOIN nn)
         |SELECT n AS n_orders, n_cells, round(g, 4) AS g_stat,
         |  round(exp(-g / 2) * ($ser), 6) AS p_approx
         |FROM gg""".stripMargin
    },

    "q394_weibull_fit" ->
      """WITH durs AS (SELECT o_custkey,
        |    CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
        |      max(CAST(o_orderdate AS DATE))) AS BIGINT) AS dur
        |  FROM orders GROUP BY 1 HAVING dur > 0),
        |rk AS (SELECT dur, CAST(row_number()
        |    OVER (ORDER BY dur, o_custkey) AS BIGINT) AS i FROM durs),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM durs),
        |pts AS (SELECT ln(CAST(dur AS DOUBLE)) AS x,
        |    ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3)
        |      / (CAST(nn.n AS DOUBLE) + 0.4))) AS y
        |  FROM rk CROSS JOIN nn),
        |mo AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(x * x) AS sxx, sum(y) AS sy, sum(x * y) AS sxy
        |  FROM pts),
        |ft AS (SELECT n,
        |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS k, sx, sy
        |  FROM mo),
        |fb AS (SELECT n, k, (sy - k * sx) / n AS b FROM ft)
        |SELECT CAST(n AS BIGINT) AS n_cust,
        |  round(k, 4) AS weibull_shape,
        |  round(exp(-b / k), 2) AS weibull_scale_days,
        |  round(exp(-b / k) * pow(ln(2.0), 1.0 / k), 2) AS median_days
        |FROM fb""".stripMargin,

    "q395_proportion_cis" ->
      """WITH zc AS (SELECT CAST(1.959963984540054 AS DOUBLE) AS z),
        |base AS (SELECT c_mktsegment AS segment,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM customer GROUP BY 1),
        |pp AS (SELECT segment, n, x, CAST(x AS DOUBLE) / n AS p, z
        |  FROM base CROSS JOIN zc)
        |SELECT segment, n, x, round(p, 4) AS p_hat,
        |  round(p - z * sqrt(p * (1.0 - p) / n), 4) AS wald_lo,
        |  round(p + z * sqrt(p * (1.0 - p) / n), 4) AS wald_hi,
        |  round((p + z * z / (2 * n) - z * sqrt(p * (1.0 - p) / n
        |    + z * z / (4.0 * n * n))) / (1.0 + z * z / n), 4)
        |    AS wilson_lo,
        |  round((p + z * z / (2 * n) + z * sqrt(p * (1.0 - p) / n
        |    + z * z / (4.0 * n * n))) / (1.0 + z * z / n), 4)
        |    AS wilson_hi,
        |  round((x + z * z / 2) / (n + z * z)
        |    - z * sqrt(((x + z * z / 2) / (n + z * z))
        |      * (1.0 - (x + z * z / 2) / (n + z * z)) / (n + z * z)), 4)
        |    AS ac_lo,
        |  round((x + z * z / 2) / (n + z * z)
        |    + z * sqrt(((x + z * z / 2) / (n + z * z))
        |      * (1.0 - (x + z * z / 2) / (n + z * z)) / (n + z * z)), 4)
        |    AS ac_hi
        |FROM pp ORDER BY segment""".stripMargin,

    "q396_james_stein" ->
      """WITH g AS (SELECT p.p_brand AS brand,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS s1,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS s2
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |mo AS (SELECT brand, ng, CAST(s1 AS DOUBLE) / ng AS xb,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / ng)
        |      / (ng - 1) / ng AS vm
        |  FROM g),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(xb) / count(*) AS gm, avg(vm) AS vbar FROM mo),
        |dv AS (SELECT min(st.k) AS k, min(st.gm) AS gm,
        |    greatest(0.0, 1.0 - (min(st.k) - 3) * min(st.vbar)
        |      / sum((xb - st.gm) * (xb - st.gm))) AS c
        |  FROM mo CROSS JOIN st)
        |SELECT brand, ng, round(xb / 100.0, 2) AS mean_raw,
        |  round((dv.gm + dv.c * (xb - dv.gm)) / 100.0, 2)
        |    AS mean_shrunk,
        |  round(dv.c, 6) AS shrink_factor
        |FROM mo CROSS JOIN dv ORDER BY brand""".stripMargin
  )
}
