package graft

import graft.Materialize.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._
import graft.functions.{TextFunctions => TF, UrlFunctions => UF, VectorFunctions => VF}
import graft.llm.{Bpe, Dedup, Multimodal, Pq, Search, Similarity}
import graft.EntryShared._

/** Core relational surface, IO/catalog round trips, and the first LLM-pipeline operators (dedup, ANN, streaming, multimodal): q01-q75.
  * Part of the [[SparkEntry]] surface; see EntryShared for
  * the helpers these entries call.
  */
private[graft] object QueriesCore {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // ---- joins (SURVEY.md §2C: equi/semi/anti/broadcast) ----------------,

    "q03_topk_join" -> ((s, dir) => {
      // customer grows with scale, so the segment filter keeps O(rows):
      // no broadcast hint — the planner auto-broadcasts while it fits
      // and shuffle-joins beyond the threshold.
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
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
      // broadcast-join demonstration — deliberately WITHOUT an explicit
      // broadcast() hint: part grows with scale factor (billions of rows
      // at 100 TB), and a hint forces the broadcast at any size. The
      // planner/AQE picks BroadcastHashJoin from runtime sizes whenever
      // the dim fits (it does at every bench sf) and degrades to a
      // shuffle join when it doesn't. Fixed-size dims (nation, region)
      // keep explicit hints elsewhere.
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // ---- window functions ----------------------------------------------,

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

    // ---- distinct aggregates / grouping sets / set ops / sort-limit ----,

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

    // ---- reference dataflow surface (SURVEY.md §2B) ---------------------,

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

    // ---- LLM-pipeline: dedup -------------------------------------------,

    "q19_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(concat_ws(" ", TF.normTokens(col("text"))).as("__norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
        .orderBy(col("keep_id"))
    }),

    // ---- LLM-pipeline: text analysis -----------------------------------,

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
    // verified with the exact measure); the recall rows are the real check.,

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
        .materialize
      val exactSub = Dedup.minhashPairsExact(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0), "text", "doc_id",
          shingleSize = 3, numHashes = 32, threshold = 0.35)
        .select(col("idA"), col("idB"))
        .materialize
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
        .materialize
      val exact = Dedup.simhashPairsExact(docs, "text", "doc_id", maxHamming = 3)
        .select(col("idA"), col("idB"))
        .materialize
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
    // the oracle replicates the same df cut.,

    "q26_embedding_dups" -> ((s, dir) => {
      // the oracle-grade exact baseline (value-checked against DuckDB's own
      // all-pairs cosine); the declared SCALE path is q58, which buckets
      // candidates with LSH and self-checks against this exact set
      Dedup.embeddingPairsExact(t(s, dir, "embeddings"), "embedding", "vec_id", 0.4)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy(col("idA"), col("idB"))
    }),

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
        .materialize
      val exact = Similarity.bruteForceTopK(q, emb, "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .materialize
      val recall = lsh.join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("nc"))
        .crossJoin(exact.agg(count(lit(1)).as("ne")))
        .select(lit("recall_pct_ge_90").as("metric"),
          when(col("nc") * 100 >= col("ne") * 90, 1L).otherwise(0L).as("value"))
      val nq = exact.agg(countDistinct(col("query_id")).as("value"))
        .select(lit("n_queries").as("metric"), col("value"))
      recall.union(nq).orderBy(col("metric"))
    }),

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

    // ---- multimodal plumbing -------------------------------------------,

    "q31_multimodal_stats" -> ((s, dir) => {
      val withBin = Multimodal.withBinaryPayload(t(s, dir, "documents"), "text")
      Multimodal.withPayloadStats(withBin, "payload")
        .groupBy(col("source"))
        .agg(sum(col("n_bytes")).as("total_bytes"), count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

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

    "q36_stream_windowed" -> ((s, dir) => {
      // the streaming transform applied in batch mode (same plan shape)
      graft.streaming.EventStreams
        .windowedStats(events(s, dir), "1 hour", "1 hour", "2 hours")
        .select(col("window_start").cast("long").as("window_start"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
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

    "q44_percentiles" -> ((s, dir) => {
      // exact per-group percentiles of extended price — a CONTINUOUS
      // domain (distinct ≈ rows: 583k/600k at sf0.1), so the builtin
      // percentile's value→count buffer would be group-sized in one task
      // at corpus scale. The two-phase grouped exact path computes all
      // three quantiles in ONE range-partitioned pass, bit-identical to
      // the builtin's interpolation (ScaleChecks check 5 enforces this
      // class; q196 is the declared discrete counterexample).
      graft.ops.PrefixSum.groupedExactPercentiles(
          t(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_extendedprice")),
          "l_returnflag", col("l_extendedprice"),
          Seq(0.5, 0.9, 0.99), Seq("e50", "e90", "e99"))
        .select(col("l_returnflag"),
          round(col("e50"), 4).as("p50"),
          round(col("e90"), 4).as("p90"),
          round(col("e99"), 4).as("p99"))
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

    "q55_approx_percentiles" -> ((s, dir) => {
      // exact-vs-sketch percentile cross-check: approx_percentile keeps
      // bounded O(1/eps) state per group; the exact side is the grouped
      // two-phase path (extended price is a CONTINUOUS domain — distinct
      // ≈ rows — so the builtin percentile's value→count buffer is the
      // check-5 class; same conversion as q44). The sketch's rank-error
      // bound holds under any partial-merge order, so the
      // within-tolerance flags are deterministically 1; exact values are
      // oracled via DuckDB quantile_cont. The two aggregates join on the
      // 3-row group key — a broadcast join of two folds.
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val ex = graft.ops.PrefixSum.groupedExactPercentiles(
        li, "l_returnflag", col("l_extendedprice"),
        Seq(0.5, 0.9, 0.99), Seq("ex1", "ex2", "ex3"))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(expr(
          "approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)")
          .as("ap"))
      def okCol(i: Int) = when(
        abs(element_at(col("ap"), i) - col(s"ex$i")) <=
          col(s"ex$i") * 0.01, 1L).otherwise(0L)
      ex.join(ap, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(col("ex1"), 4).as("p50"),
          round(col("ex2"), 4).as("p90"),
          round(col("ex3"), 4).as("p99"),
          okCol(1).as("p50_ok"), okCol(2).as("p90_ok"), okCol(3).as("p99_ok"))
        .orderBy(col("l_returnflag"))
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
        .materialize
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

    // ---- LLM-pipeline: similarity search --------------------------------,

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

    // ---- events: windowed + sessionized analytics -----------------------,

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

    // ---- I/O surface: round trips through the engine's file tables ------,

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

    "q66_hll_distinct" -> ((s, dir) => {
      // HyperLogLog distinct counts as the scale path for exact
      // count_distinct (bounded sketch state vs a full dedup shuffle).
      // Exact values are DuckDB-oracled; the sketch's relative-error flags
      // are deterministically 1 (same hashes, same merge result regardless
      // of order — HLL registers are a max, which commutes).
      //
      // Two-level aggregate, NOT one agg mixing countDistinct with the
      // sketch: Spark's distinct rewrite evaluates any sibling aggregate
      // in a first aggregate keyed by (group, distinct-col) — one HLL++
      // buffer PER DISTINCT KEY. Measured on the f30 relational scale-up
      // (18M rows, 600k distinct (flag, partkey) pairs): exact-only
      // 74 CPU-s, sketch-only 7.5, combined in one agg 470 CPU-s — the
      // sketch-per-key allocation is a 6x-the-sum-of-parts pathology that
      // grows with key cardinality. Deduping pairs first makes row 1 of
      // the second agg exact (count of deduped rows) and leaves the HLL
      // estimate bit-identical (duplicates never change an HLL register),
      // at 9x less CPU (BENCH_NOTES_r6 §7).
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_partkey")).agg(count(lit(1)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_parts"),
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
        .materialize
      // supplier grows with scale (the nationkey filter keeps O(rows)), so
      // the semi join is unhinted — planner broadcasts while it fits
      val trueRows = li.join(suppKeys,
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .materialize
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
        .materialize
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
    })

  )

  val oracles: Map[String, String] = Map(
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
    // pipeline itself — the containment check inside the query is the proof.,

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

    "q36_stream_windowed" ->
      """SELECT CAST(extract(epoch FROM date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q37_json_render" ->
      """SELECT n_nationkey,
        |  to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name,
        |                      n_regionkey := n_regionkey))::VARCHAR AS js
        |FROM nation ORDER BY n_nationkey""".stripMargin,

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

    "q43_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q44_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
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

    "q49_json_parse" ->
      """SELECT event_type,
        |  count(CAST(json_extract(props, '$.k') AS INT)) AS n_k,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

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

    "q55_approx_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok,
        |  CAST(1 AS BIGINT) AS p99_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

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

    "q58_embedding_dups_lsh" ->
      """SELECT 'lsh_minus_planted_pairs' AS metric, CAST(0 AS BIGINT) AS value
        |UNION ALL SELECT 'n_planted_pairs', CAST(count(*) AS BIGINT)
        |           FROM embeddings
        |UNION ALL SELECT 'planted_minus_lsh_pairs', CAST(0 AS BIGINT)
        |ORDER BY metric""".stripMargin,

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

    "q62_frame_sample" ->
      """WITH d AS (SELECT doc_id, text,
        |    greatest(len(text) // 4, 1) AS stride
        |  FROM documents
        |  WHERE doc_id < 100 AND len(text) = octet_length(encode(text)))
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  substr(text, CAST(i * stride + 1 AS INT), 16) AS frame_str
        |FROM d, unnest(range(4)) AS u(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,

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

    "q72_knn_ivf" ->
      """SELECT 'n_queries' AS metric, CAST(count(*) AS BIGINT) AS value
        |FROM embeddings WHERE vec_id < 20
        |UNION ALL SELECT 'top1_recall_pct_ge_90', CAST(1 AS BIGINT)
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

    "q74_compaction" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal,
        |  CAST(1 AS BIGINT) AS compacted_to_one_file
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q75_typed_source" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal
        |FROM supplier WHERE s_acctbal > 0
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  )
}
