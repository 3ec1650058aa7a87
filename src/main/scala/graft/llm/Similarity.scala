package graft.llm

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
    val scored = c.crossJoin(broadcast(q))
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
    val scored = c.join(broadcast(q), Seq("__csig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("__qn") * col("__cn") === 0.0, 0.0)
          .otherwise(VF.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: corpus is assigned to the nearest of
    * `nCentroids` deterministic seed centroids (rows sampled by id hash);
    * queries probe their `nProbe` nearest centroid cells. Coarse but
    * embarrassingly parallel: assignment is a broadcast argmin, search is a
    * cell-key equi-join.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    // Deterministic centroid sample: smallest nCentroids ids.
    val centroids = corpus
      .select(col(idCol).as("cid"), VF.l2Normalize(col(vecCol)).as("cvec"))
      .orderBy(col("cid"))
      .limit(nCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    val centroidArr = array(centroids.map { case (cid, v) =>
      struct(lit(cid).as("cid"), array(v.map(lit): _*).as("cvec"))
    }: _*)

    def nearestCells(vec: org.apache.spark.sql.Column, n: Int) = {
      val scored = transform(centroidArr, c =>
        struct((lit(0.0) - VF.dot(c("cvec"), VF.l2Normalize(vec))).as("negdot"),
          c("cid").as("cid")))
      slice(array_sort(scored), 1, n)
    }

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      element_at(nearestCells(col(vecCol), 1), 1)("cid").as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(transform(nearestCells(col(vecCol), nProbe), s => s("cid"))).as("cell"))

    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k)
  }
}
