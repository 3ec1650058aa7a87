package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Pq

/** Product quantization: code shape, quantization sanity, and ADC
  * ranking on planted near-duplicates.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 well-separated direction clusters in 8-dim, 30 vectors each
  private def clustered = {
    val rnd = new scala.util.Random(7)
    val base = Seq(
      Array(1.0, 0, 0, 0, 1, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 1, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 1, 0))
    (0 until 90).map { i =>
      val b = base(i % 3)
      (i.toLong, b.map(x => x + rnd.nextGaussian() * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("encode emits m codes in [0, k) per vector") {
    val cb = Pq.train(clustered, "embedding", "vec_id", m = 4, k = 4,
      iters = 2)
    assert(cb.m == 4 && cb.k == 4 && cb.dsub == 2)
    val codes = Pq.encode(clustered, "embedding", "vec_id", cb)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect()
    assert(codes.length == 90)
    assert(codes.forall(_._2.length == 4))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 4)))
    // the PQ property is RELATIVE: same-cluster pairs share more
    // subspace codes than cross-cluster pairs (absolute agreement can
    // legitimately split when k-means over-provisions a group)
    def share(a: Seq[Int], b: Seq[Int]) = a.zip(b).count(p => p._1 == p._2)
    val pairs = for (x <- codes; y <- codes if x._1 < y._1)
      yield (x._1 % 3 == y._1 % 3, share(x._2, y._2))
    val within = pairs.filter(_._1).map(_._2)
    val across = pairs.filterNot(_._1).map(_._2)
    val wAvg = within.sum.toDouble / within.size
    val aAvg = across.sum.toDouble / across.size
    assert(wAvg > aAvg + 1.0,
      s"within-cluster code sharing $wAvg not above cross-cluster $aAvg")
  }

  test("ADC top-1 finds a planted near-duplicate for every query") {
    val base = clustered
    val dup = base.filter($"vec_id" < 10)
      .select(($"vec_id" + 1000L).as("vec_id"),
        transform($"embedding", x => x * 1.01).as("embedding"))
    val corpus = base.unionByName(dup)
    val cb = Pq.train(corpus, "embedding", "vec_id", m = 4, k = 16,
      iters = 3)
    val codes = Pq.encode(corpus, "embedding", "vec_id", cb)
    val queries = base.filter($"vec_id" < 10)
    val top = Pq.adcTopK(queries, codes, "embedding", "vec_id", cb, kNn = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    // scaled copy is cosine-identical -> identical codes -> ADC dist 0
    (0L until 10L).foreach { q =>
      assert(top(q) == q + 1000L, s"query $q top-1 was ${top(q)}")
    }
  }

  test("IVF-PQ serving finds the planted duplicate through probed cells") {
    val base = clustered
    val dup = base.filter($"vec_id" < 6)
      .select(($"vec_id" + 1000L).as("vec_id"),
        transform($"embedding", x => x * 1.01).as("embedding"))
    val corpus = base.unionByName(dup)
    val cb = Pq.train(corpus, "embedding", "vec_id", m = 4, k = 16,
      iters = 3)
    val cents = graft.llm.Similarity.trainSphericalKMeans(corpus,
      "embedding", "vec_id", nCentroids = 3, iters = 3)
    val index = Pq.buildIvfPqIndex(corpus, "embedding", "vec_id", cb, cents)
    val queries = base.filter($"vec_id" < 6)
    val top = Pq.ivfPqTopK(queries, index, "embedding", "vec_id", cb,
        cents, kNn = 1, nProbe = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    // the scaled copy shares its source's direction -> same probed cell,
    // same codes -> ADC top-1 even at nProbe=1
    (0L until 6L).foreach { q =>
      assert(top(q) == q + 1000L, s"query $q top-1 was ${top.get(q)}")
    }
  }

  test("ADC distance of identical codes is 0 and ranking is deterministic") {
    val cb = Pq.train(clustered, "embedding", "vec_id", m = 2, k = 4,
      iters = 2)
    val codes = Pq.encode(clustered, "embedding", "vec_id", cb)
    val top = Pq.adcTopK(clustered.filter($"vec_id" === 0L), codes,
      "embedding", "vec_id", cb, kNn = 5).collect()
    assert(top.length == 5)
    val ranks = top.map(_.getAs[Long]("rank")).sorted
    assert(ranks.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val d2s = top.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("adc_d2"))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a <= b })
  }
}
