package graft.llm

import graft.Materialize.Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline is brute-force cosine top-k (exact; the correctness oracle).
  * The scale path is LSH bucketing: signatures shrink the candidate set so
  * the per-query work drops from |corpus| to the bucket population. Both
  * return the same shape: (query id, neighbor id, cosine, rank).
  */
object Similarity {

  /** Exact brute-force top-k by cosine. The query side is broadcast (queries
    * are the small side by construction), so the corpus never shuffles: each
    * corpus partition scores its rows against every query and a per-partition
    * top-k would be the next refinement. Deterministic tie-break:
    * (cosine desc, corpus id asc).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    // Norms are computed once per row on each side; the per-pair inner loop
    // is a single dot product. dot/(normA*normB) produces bit-identical
    // doubles to a fused cosine (same operations, same order).
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      VF.norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      VF.norm(col(vecCol)).as("__cn"))
    // CONTRACT: `queries` is a bounded probe batch — brute-force scoring
    // replicates it to every corpus partition by definition, so the caller
    // owns its size (the scale path for large batches is lshTopK/IVF). The
    // alias declares that contract to the static scale gate; the cross-sf
    // runtime broadcast audit measures it stays flat.
    val scored = c.crossJoin(broadcast(q.as(graft.ScaleChecks.BoundedBatchAlias)))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("__qn") * col("__cn") === 0.0, 0.0)
          .otherwise(VF.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))))
    rankTopK(scored, k)
  }

  /** Per-query top-k via the bounded [[graft.ops.TopK]] aggregator, not a
    * window: a window would shuffle EVERY scored row to its query's reducer;
    * the aggregator's partial (map-side) stage reduces each partition to
    * <= k rows per query before the shuffle. Ordering (cosine desc,
    * neighbor_id asc) matches the window formulation exactly. The
    * aggregator's tie-break key is a long, so non-numeric neighbor ids fall
    * back to the window formulation (numeric-vs-lexicographic ordering
    * would otherwise diverge — "10" < "2").
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.schema("neighbor_id").dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        graft.ops.TopK.perGroup(scored, "query_id", "cosine", "neighbor_id",
            "neighbor_id", k)
          .select(col("group").as("query_id"), col("tie").as("neighbor_id"),
            col("score").as("cosine"), col("rank"))
      case _ =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        scored
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
    }

  /** Multi-probe LSH top-k: corpus and queries are signed with the same
    * `sigBits`-bit hyperplane signature; each query signature is expanded
    * into every signature within Hamming distance `probeHamming` (XOR with
    * each low-popcount mask), and candidates come from an EQUI-join on the
    * expanded signature. Each query thus scores only the ~sum_{i<=h} C(b,i)
    * / 2^b fraction of the corpus sharing a probed bucket — and, unlike a
    * `bit_count(xor) <= h` join predicate (which plans as a nested-loop over
    * every corpus x query pair), the equi-join never enumerates non-matching
    * pairs: this is what keeps ANN sublinear at 100 TB. Mask expansion is
    * sum C(sigBits, i<=probeHamming) rows per query on the small
    * (broadcast) side.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              vecCol: String, idCol: String, k: Int,
              sigBits: Int = 12, probeHamming: Int = 2): DataFrame = {
    require(sigBits >= 1 && sigBits <= 24, "sigBits must be in [1, 24]")
    // masks generated directly from bit-position combinations:
    // O(sum C(sigBits, i<=probeHamming)), not O(2^sigBits)
    val masks: Seq[Long] = (0 to math.min(probeHamming, sigBits)).flatMap(h =>
      (0 until sigBits).combinations(h)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    val maskArr = array(masks.map(lit): _*)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      VF.norm(col(vecCol)).as("__cn"),
      VF.hyperplaneSignature(col(vecCol), sigBits).as("__csig"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      VF.norm(col(vecCol)).as("__qn"),
      VF.hyperplaneSignature(col(vecCol), sigBits).as("__qsig"))
      .select(col("query_id"), col("__qv"), col("__qn"),
        explode(transform(maskArr, m => col("__qsig").bitwiseXOR(m)))
          .as("__csig"))
    // Each (query, corpus) pair matches at most one probe (the XOR mask is
    // unique), so the equi-join introduces no duplicates.
    // CONTRACT: the probe side is batch x masks rows — bounded by the
    // caller's batch; declared to the static scale gate via the alias.
    val scored = c.join(
        broadcast(q.as(graft.ScaleChecks.BoundedBatchAlias)), Seq("__csig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("__qn") * col("__cn") === 0.0, 0.0)
          .otherwise(VF.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: centroids are trained with a few rounds of
    * spherical k-means (deterministic hash-spread seeds), the corpus is
    * assigned to its nearest centroid cell, and queries probe their `nProbe`
    * nearest cells. Coarse but embarrassingly parallel: assignment is a
    * broadcast argmin, search is a cell-key equi-join, and the k-means
    * update is one partial-aggregated (cell, dim) sum per round — the cells
    * track the data's actual geometry, so recall holds on clustered corpora
    * where any fixed-row "centroid" scheme degenerates.
    */
  /** Rows k-means trains on, max: a hash-ordered sample (TakeOrdered — no
    * full sort) bounds the per-iteration training cost at any corpus size;
    * centroid quality needs a representative sample, not every row.
    */
  val IvfMaxTrainRows: Int = 100000

  /** Centroids travel as a BROADCAST nCentroids-row DataFrame, never as
    * literal expression trees: nCentroids x dim literals embedded in every
    * plan blow up Catalyst analysis and fall out of codegen (measured 25s on
    * a 2k-row corpus); the broadcast-join + struct-max argmin keeps plans
    * small and the per-row work a codegen'd dot product.
    */
  private def centDf(spark: org.apache.spark.sql.SparkSession,
                     cs: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    broadcast(cs.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("cid", "cvec"))
  }

  /** Spherical k-means over the L2-normalized vectors: deterministic
    * hash-spread seeds, argmax-dot assignment, per-cell mean re-normalized
    * each round. Training is capped at [[IvfMaxTrainRows]] via a hash-ordered
    * TakeOrdered sample (no global sort), so cost is bounded at any corpus
    * size. Shared by [[ivfTopK]] (cell index) and
    * [[graft.llm.Dedup.semanticDedup]] (quadratic-bounding partition).
    */
  def trainSphericalKMeans(corpus: DataFrame, vecCol: String, idCol: String,
                           nCentroids: Int,
                           iters: Int = 3): Array[Array[Double]] = {
    require(nCentroids >= 1, "nCentroids must be >= 1")
    val normed = corpus
      .select(col(idCol).as("__nid"), VF.l2Normalize(col(vecCol)).as("__nv"))

    // Training sample + seeds: smallest id HASHES, not smallest ids — id
    // order often correlates with data geometry (ingest order, cluster
    // order), and seeding all cells inside one cluster is exactly the
    // degenerate case. limit() plans as TakeOrdered: per-partition top-k,
    // no global sort shuffle.
    // repartition AFTER the TakeOrdered cap: limit() materializes the
    // sample as ONE partition, and without the re-spread every training
    // iteration's assignment + mean pass runs on a single core (measured
    // as ~95% of semanticDedup's wall time at 200k vectors)
    val p = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val trainOrdered = normed.orderBy(xxhash64(col("__nid")), col("__nid"))
    val train = trainOrdered
      .limit(IvfMaxTrainRows)
      .repartition(p)
      .materialize

    // seeds from the ORDERED stream, not the repartitioned sample (whose
    // row order is arbitrary): the nCentroids hash-smallest rows, same
    // deterministic choice as before the re-spread
    var centroids: Array[Array[Double]] = trainOrdered
      .limit(nCentroids).select(col("__nv")).collect()
      .map(_.getSeq[Double](0).toArray)

    // right-size loop parallelism to the ACTUAL sample: a tiny corpus at
    // 32 tasks pays more scheduling than compute, a 100k sample on one
    // task was the measured 10x train bottleneck. coalesce reads the
    // cached partitions without another shuffle.
    val nTrain = train.count()
    val eff = math.max(1L, math.min(p.toLong, nTrain / 4096)).toInt
    val trainLoop = if (eff < p) train.coalesce(eff) else train

    for (_ <- 1 to iters) {
      // spherical k-means update: per-row argmax-dot assignment is ONE
      // codegen expression over the reference-object centroid matrix
      // (NearestCentroid) — no vector x centroid join and no per-id
      // shuffle at all; the only shuffle carries (cell, dim) partial
      // sums, <= nCentroids x dim rows per partition after map-side
      // combine. (The earlier crossJoin + max(struct(dot, -cid, vec))
      // shuffled the full vector in the aggregation buffer: ~512 B x
      // trainRows rows per iteration, measured as the dominant cost of
      // semanticDedup once cells were auto-sized up.)
      val sums = trainLoop
        .select(VF.nearestCentroid(col("__nv"), centroids).as("cell"),
          posexplode(col("__nv")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, cid) =>
        byCell.get(cid).fold(old) { rows =>
          val mean = old.clone()
          rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
          val nrm = math.sqrt(mean.map(x => x * x).sum)
          if (nrm == 0.0) old else mean.map(_ / nrm) // empty/degenerate: keep
        }
      }
    }
    centroids
  }

  /** (__id, cell, __v): each row keyed to its argmax-dot centroid cell.
    * Assignment is one codegen NearestCentroid projection over the
    * reference-object centroid matrix — zero joins, zero shuffles, the
    * corpus is touched exactly once map-side. Ties break to the smaller
    * centroid id (identical to the retired max(struct(dot, -cid))
    * formulation; parity-pinned in ExpressionsSpec).
    *
    * Row-per-row contract: emits exactly one output row per INPUT row.
    * Ids are not deduplicated (the retired groupBy formulation collapsed
    * duplicate ids; this zero-shuffle projection intentionally does not) —
    * callers whose id column may repeat should dropDuplicates upstream of
    * [[buildIvfIndex]] / [[graft.llm.Dedup.semanticDedup]] if one row per
    * id is required.
    */
  def assignCells(df: DataFrame, vecCol: String, idCol: String,
                  centroids: Array[Array[Double]]): DataFrame =
    df.select(col(idCol).as("__id"),
      VF.nearestCentroid(VF.l2Normalize(col(vecCol)), centroids).as("cell"),
      col(vecCol).as("__v"))
      .select(col("__id"), col("cell"), col("__v"))

  /** Persisted IVF index: the corpus is written PARTITIONED BY its k-means
    * cell, plus a tiny centroid side table. Serving ([[queryIvfIndex]])
    * joins the probed cells against the partition column, so Spark's
    * dynamic partition pruning reads ONLY the probed cell directories —
    * at 100 TB a query batch scans ~nProbe/nCentroids of the corpus
    * instead of all of it, and the index builds once, amortized over every
    * later query batch (the same trade as [[graft.io.Bucketing]] for
    * joins).
    */
  def buildIvfIndex(corpus: DataFrame, vecCol: String, idCol: String,
                    path: String, nCentroids: Int = 16,
                    kmeansIters: Int = 3): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = trainSphericalKMeans(corpus, vecCol, idCol, nCentroids,
      kmeansIters)
    assignCells(corpus, vecCol, idCol, centroids)
      .select(col("__id").as(idCol), col("__v").as(vecCol), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/data")
    centroids.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("cid", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Top-k against a [[buildIvfIndex]] layout. The probed (query, cell)
    * pairs are a broadcast side of an equi-join on the PARTITION column, so
    * dynamic partition pruning skips every unprobed cell directory
    * (DedupSimilaritySpec asserts the dynamicpruning filter in the plan).
    */
  def queryIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, vecCol: String, idCol: String,
                    k: Int, nProbe: Int = 4): DataFrame = {
    val cents = broadcast(spark.read.parquet(s"$path/centroids"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dot").desc, col("cell").asc)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        VF.l2Normalize(col(vecCol)).as("__qnv"))
      .crossJoin(cents)
      .select(col("query_id"), col("__qv"), col("cid").as("cell"),
        VF.dot(col("__qnv"), col("cvec")).as("dot"))
      .withColumn("__rk", row_number().over(probeW))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("__qv"), col("cell"))
    val data = spark.read.parquet(s"$path/data")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("cell"))
    // CONTRACT: batch x nProbe rows — bounded by the caller's batch;
    // declared to the static scale gate via the alias.
    val scored = data.join(
        broadcast(q.as(graft.ScaleChecks.BoundedBatchAlias)), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k)
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              kmeansIters: Int = 3): DataFrame = {
    require(nCentroids >= 1 && nProbe >= 1, "nCentroids and nProbe must be >= 1")
    val centroids = trainSphericalKMeans(corpus, vecCol, idCol, nCentroids,
      kmeansIters)
    val cents = centDf(corpus.sparkSession, centroids)
    // corpus -> nearest cell (the raw vector rides through the struct-max)
    val c = assignCells(corpus, vecCol, idCol, centroids)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"), col("cell"))
    // queries -> their nProbe nearest cells (queries are the small side by
    // construction; the per-query window is over nCentroids rows)
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dot").desc, col("cell").asc)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        VF.l2Normalize(col(vecCol)).as("__qnv"))
      .crossJoin(cents)
      .select(col("query_id"), col("__qv"), col("cid").as("cell"),
        VF.dot(col("__qnv"), col("cvec")).as("dot"))
      .withColumn("__rk", row_number().over(probeW))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("__qv"), col("cell"))

    // CONTRACT: batch x nProbe rows — bounded by the caller's batch
    // (queries are the small side by construction); declared to the static
    // scale gate via the alias.
    val scored = c.join(
        broadcast(q.as(graft.ScaleChecks.BoundedBatchAlias)), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k)
  }
}
