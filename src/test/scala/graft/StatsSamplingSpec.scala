package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Profile, Sampling}

/** joinSizeStats exactness vs a materialized join, and
  * exactStratifiedSample's exact-total / proportionality / determinism
  * guarantees.
  */
class StatsSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("joinSizeStats join_rows equals the materialized join size") {
    val a = Seq(1, 1, 2, 3, 3, 3, 9).map(k => (k, s"a$k")).toDF("k", "va")
    val b = Seq(1, 2, 2, 3, 7).map(k => (k, s"b$k")).toDF("k", "vb")
    val stats = Profile.joinSizeStats(a, "k", b, "k").head()
    val real = a.join(b, Seq("k")).count()
    assert(stats.getLong(1) == real && real == 7L) // 1:2*1 + 2:1*2 + 3:3*1
    assert(stats.getLong(0) == 3)                  // common keys 1, 2, 3
    assert(stats.getLong(3) == 3)                  // max per key: key 3 -> 3*1
  }

  test("exactStratifiedSample returns exactly n, proportionally, deterministically") {
    val df = (1 to 400).map(i =>
      (i.toLong, if (i % 4 == 0) "small" else "big")).toDF("id", "g")
    val s1 = Sampling.exactStratifiedSample(df, "g", "id", 40)
    assert(s1.count() == 40)
    val byG = s1.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("small") == 10 && byG("big") == 30) // exact 25%/75% split
    val s2 = Sampling.exactStratifiedSample(df.repartition(13), "g", "id", 40)
    assert(s1.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      s2.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("exactStratifiedSample largest remainder: totals hit n when shares don't divide") {
    // 7, 11, 13 rows; n = 10 -> base quotas 2,3,4 (sum 9) + 1 largest-remainder slot
    val df = ((1 to 7).map(i => (i.toLong, "a")) ++
      (8 to 18).map(i => (i.toLong, "b")) ++
      (19 to 31).map(i => (i.toLong, "c"))).toDF("id", "g")
    val s = Sampling.exactStratifiedSample(df, "g", "id", 10)
    assert(s.count() == 10)
    val byG = s.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.values.sum == 10)
    // every stratum within 1 of its proportional share
    assert(math.abs(byG("a") - 10 * 7.0 / 31) <= 1 &&
      math.abs(byG("b") - 10 * 11.0 / 31) <= 1 &&
      math.abs(byG("c") - 10 * 13.0 / 31) <= 1)
  }
}
