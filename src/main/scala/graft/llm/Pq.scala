package graft.llm

import graft.Materialize.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Product quantization (PQ) — the compression half of IVF-PQ, the
  * standard shape for vector search at 100 TB: a d-dim float vector
  * (256 B at d=64) compresses to `m` small codes (m bytes at k<=256),
  * and query scoring works on the CODES via per-query lookup tables
  * (asymmetric distance, ADC) without ever touching the original
  * vectors.
  *
  * Scale shapes:
  *  - training runs on a bounded hash-ordered sample, and ALL `m`
  *    subspace k-means problems train in the SAME aggregate per round
  *    (rows explode to (subspace, subvector); the shuffle carries
  *    (subspace, cell, dim) partial sums after map-side combine);
  *  - encoding is a broadcast-join argmin + one groupBy on the id —
  *    the corpus shuffles once, carrying only (id, m codes);
  *  - ADC scoring broadcasts each query's m*k distance table as ONE
  *    flattened array; a candidate's distance is m array lookups inside
  *    a single expression (never a row per (code, query)), and the
  *    bounded TopK aggregator's map-side partials bound the only
  *    shuffle. Flat [[adcTopK]] is O(corpus x queries) by definition —
  *    [[ivfPqTopK]] probes cells so serving scans ~nProbe/nCells of the
  *    codes.
  *
  * Vectors are L2-normalized first, so squared-L2 ADC order equals
  * cosine order (||a-b||^2 = 2 - 2 cos on the unit sphere).
  */
object Pq {

  /** `books(sub)(cid)` is the centroid (length d/m) of code `cid` in
    * subspace `sub`.
    */
  final case class Codebooks(m: Int, k: Int, dsub: Int,
                             books: Array[Array[Array[Double]]])

  /** Rows PQ trains on, max — same bounded-sample reasoning as
    * [[Similarity.IvfMaxTrainRows]].
    */
  val MaxTrainRows: Int = 100000

  private def booksDf(spark: org.apache.spark.sql.SparkSession,
                      cb: Codebooks): DataFrame = {
    import spark.implicits._
    broadcast((for {
      sub <- 0 until cb.m; cid <- 0 until cb.k
    } yield (sub, cid, cb.books(sub)(cid).toSeq)).toDF("sub", "cid", "cvec"))
  }

  /** (id, sub, subvector) — each normalized vector exploded into its m
    * subspace slices.
    */
  private def subRows(df: DataFrame, vecCol: String, idCol: String,
                      m: Int, dsub: Int): DataFrame =
    df.select(col(idCol).as("__id"), VF.l2Normalize(col(vecCol)).as("__nv"))
      .select(col("__id"), explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.as("sub"),
          slice(col("__nv"), s * dsub + 1, lit(dsub)).as("sv")))).as("p"))
      .select(col("__id"), col("p.sub").as("sub"), col("p.sv").as("sv"))

  /** ||a-b||^2 as three codegen'd dot products — the interpreted
    * zip_with/aggregate lambda form costs ~3x on the training hot path.
    */
  private def sqDist(a: Column, b: Column): Column =
    VF.dot(a, a) - lit(2.0) * VF.dot(a, b) + VF.dot(b, b)

  /** Train `m` codebooks of `k` centroids each with plain Euclidean
    * k-means (deterministic hash-spread seeds, argmin assignment with
    * smaller-cid tie-break). One aggregate per round trains ALL
    * subspaces at once.
    */
  def train(corpus: DataFrame, vecCol: String, idCol: String,
            m: Int = 8, k: Int = 16, iters: Int = 3): Codebooks = {
    val spark = corpus.sparkSession
    val d = corpus.select(size(col(vecCol))).head.getInt(0)
    require(d % m == 0, s"dim $d must divide into $m subspaces")
    val dsub = d / m
    // repartition AFTER the TakeOrdered cap: limit() materializes the
    // sample as ONE partition (see Similarity.trainSphericalKMeans)
    val pcount = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val train = corpus
      .select(col(idCol).as("__tid"), col(vecCol).as("__tv"))
      .orderBy(xxhash64(col("__tid")), col("__tid"))
      .limit(MaxTrainRows)
      .repartition(pcount)
    val sub0 = subRows(train, "__tv", "__tid", m, dsub)
      .materialize
    // right-size loop parallelism to the actual (rows x m) sample — see
    // Similarity.trainSphericalKMeans; coalesce reads cached partitions
    val nSub = sub0.count()
    val sub = {
      val eff = math.max(1L, math.min(pcount.toLong, nSub / 8192)).toInt
      if (eff < pcount) sub0.coalesce(eff) else sub0
    }

    // seeds: the k hash-smallest rows PER SUBSPACE (same slice geometry
    // the codebook will quantize)
    val seeds = sub
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sub"))
          .orderBy(xxhash64(col("__id")), col("__id"))))
      .filter(col("__rn") <= k)
      .select(col("sub"), (col("__rn") - 1).cast("int").as("cid"), col("sv"))
      .collect()
    var cb = Codebooks(m, k, dsub,
      Array.tabulate(m, k)((s, c) =>
        seeds.find(r => r.getInt(0) == s && r.getInt(1) == c)
          .map(_.getSeq[Double](2).toArray)
          .getOrElse(Array.fill(dsub)(0.0))))

    for (_ <- 1 to iters) {
      // argmin carries only (d2, cid) through the aggregate buffer — the
      // subvector itself joins back AFTER assignment (narrow (sub,id,cid)
      // rows), so the k-way candidate fan-out never shuffles arrays
      val assigned = sub
        .join(booksDf(spark, cb), Seq("sub"))
        .select(col("sub"), col("__id"),
          struct(sqDist(col("sv"), col("cvec")).as("d2"), col("cid")).as("s"))
        .groupBy(col("sub"), col("__id")).agg(min(col("s")).as("a"))
        .select(col("sub"), col("__id"), col("a.cid").as("cid"))
      val sums = assigned.join(sub, Seq("sub", "__id"))
        .select(col("sub"), col("cid"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      cb = cb.copy(books = Array.tabulate(m, k) { (s, c) =>
        byCell.get((s, c)).fold(cb.books(s)(c)) { rows =>
          val mean = cb.books(s)(c).clone()
          rows.foreach(r => mean(r.getInt(2)) = r.getDouble(3) / r.getLong(4))
          mean
        }
      })
    }
    cb
  }

  /** (idCol, codes array<int> of length m): each vector's per-subspace
    * argmin code. One broadcast join + one shuffle of (id, m codes).
    */
  def encode(df: DataFrame, vecCol: String, idCol: String,
             cb: Codebooks): DataFrame =
    subRows(df, vecCol, idCol, cb.m, cb.dsub)
      .join(booksDf(df.sparkSession, cb), Seq("sub"))
      .select(col("__id"), col("sub"),
        struct(sqDist(col("sv"), col("cvec")).as("d2"), col("cid")).as("s"))
      .groupBy(col("__id"), col("sub")).agg(min(col("s")).as("a"))
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(
        struct(col("sub"), col("a.cid").as("cid")))), p => p("cid"))
        .as("codes"))
      .withColumnRenamed("__id", idCol)

  /** (id, cell, codes) — the IVF-PQ index: every vector keyed to its
    * k-means cell ([[Similarity.assignCells]]) and compressed to its PQ
    * codes. Persist/write this once; serving never touches the vectors.
    */
  def buildIvfPqIndex(corpus: DataFrame, vecCol: String, idCol: String,
                      cb: Codebooks,
                      centroids: Array[Array[Double]]): DataFrame =
    Similarity.assignCells(corpus, vecCol, idCol, centroids)
      .select(col("__id").as(idCol), col("cell"))
      .join(encode(corpus, vecCol, idCol, cb), Seq(idCol))

  /** IVF-PQ serving — the 100 TB shape: each query probes its `nProbe`
    * nearest cells (argmax dot against the broadcast centroids), ADC-
    * scores ONLY the codes in those cells via the per-query lookup
    * table, and ranks with the bounded TopK aggregator. Cost per query
    * batch ~ nProbe/nCentroids of the corpus codes, never the vectors.
    * The flat [[adcTopK]] remains the exhaustive (small-batch/recall-
    * ceiling) variant.
    */
  def ivfPqTopK(queries: DataFrame, index: DataFrame, vecCol: String,
                idCol: String, cb: Codebooks,
                centroids: Array[Array[Double]], kNn: Int,
                nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = broadcast(centroids.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toSeq) }.toDF("cid", "cvec"))
    val probes = graft.ops.TopK.perGroup(
      queries.select(col(idCol).as("query_id"),
          VF.l2Normalize(col(vecCol)).as("__qnv"))
        .crossJoin(cents)
        .select(col("query_id"), VF.dot(col("__qnv"), col("cvec")).as("dot"),
          col("cid")),
      "query_id", "dot", "cid", "cid", nProbe)
      .select(col("group").as("query_id"), col("tie").cast("int").as("cell"))
    val cand = index.join(probes, Seq("cell"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("codes"))
    rankAdc(queries, cand, vecCol, idCol, cb, kNn)
  }

  /** Shared ADC scoring + ranking over (query_id, neighbor_id, codes)
    * candidate rows.
    */
  private def rankAdc(queries: DataFrame, cand: DataFrame, vecCol: String,
                      idCol: String, cb: Codebooks, kNn: Int): DataFrame = {
    val lut = queryLuts(queries, vecCol, idCol, cb)
    val dist = aggregate(sequence(lit(0), lit(cb.m - 1)), lit(0.0),
      (acc, i) => acc + element_at(col("lut"),
        i * cb.k + element_at(col("codes"), i + 1) + 1))
    val contrib = cand.join(lut, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), dist.as("adc_d2"))
      .filter(col("query_id") =!= col("neighbor_id"))
    graft.ops.TopK.perGroup(
        contrib.withColumn("__negd", lit(0.0) - col("adc_d2")),
        "query_id", "__negd", "neighbor_id", "neighbor_id", kNn)
      .select(col("group").as("query_id"), col("tie").as("neighbor_id"),
        (lit(0.0) - col("score")).as("adc_d2"), col("rank"))
  }

  /** (query_id, lut[m*k]) with lut[sub*k + cid] =
    * ||q_sub - book(sub)(cid)||^2, broadcast.
    */
  private def queryLuts(queries: DataFrame, vecCol: String, idCol: String,
                        cb: Codebooks): DataFrame =
    broadcast(
      subRows(queries.select(col(idCol).as("query_id"), col(vecCol)),
          vecCol, "query_id", cb.m, cb.dsub)
        .join(booksDf(queries.sparkSession, cb), Seq("sub"))
        .select(col("__id").as("query_id"),
          (col("sub") * cb.k + col("cid")).as("slot"),
          sqDist(col("sv"), col("cvec")).as("d2"))
        .groupBy(col("query_id"))
        .agg(transform(array_sort(collect_list(
          struct(col("slot"), col("d2")))), p => p("d2")).as("lut")))

  /** ADC top-k: each query's squared-L2-to-every-codeword table
    * flattens to ONE m*k double array and broadcasts; each
    * (query, vector) pair's distance is then m array lookups inside a
    * single codegen'd expression — no per-(code, query) row explosion,
    * no distance aggregate, and the TopK aggregator's map-side partials
    * bound the only shuffle at <= kNn rows per query per partition.
    * Returns (query_id, neighbor_id, adc_d2, rank); smaller distance =
    * better, deterministic id tie-break.
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, vecCol: String,
              idCol: String, cb: Codebooks, kNn: Int): DataFrame = {
    val cand = codes
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(queries.select(col(idCol).as("query_id"))))
    rankAdc(queries, cand, vecCol, idCol, cb, kNn)
  }
}
