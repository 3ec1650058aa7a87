package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Outliers

/** MAD outlier semantics: planted spikes are flagged, the clean bulk is
  * not, NULL values never flag, and the approx_percentile scale path
  * agrees with exact medians on well-separated data.
  */
class OutliersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // bulk 10..30 (median 20, MAD 5), one wild spike per key
  private def fixture = (
    (1 to 21).map(i => ("a", Option(9.0 + i))) ++
      Seq(("a", Some(1000.0)), ("a", None)) ++
      (1 to 21).map(i => ("b", Option(9.0 + i)))
  ).toDF("k", "v")

  test("planted spike flags, bulk does not, NULL never flags") {
    val out = Outliers.madFlag(fixture, "k", "v").cache()
    val flagged = out.filter($"is_outlier").collect()
    assert(flagged.length == 1 && flagged.head.getDouble(1) == 1000.0)
    assert(out.filter($"v".isNull && $"is_outlier").count() == 0)
    out.unpersist()
  }

  test("median/MAD are robust: same med and mad with and without the spike") {
    val withSpike = Outliers.madFlag(fixture, "k", "v")
      .filter($"k" === "a").select("med", "mad").distinct().collect()
    val noSpike = Outliers.madFlag(
        fixture.filter($"v".isNull || $"v" < 500), "k", "v")
      .filter($"k" === "a").select("med", "mad").distinct().collect()
    // the spike shifts the exact median by at most half an interpolation
    // step on 22-vs-23 values; MAD likewise — robust, unlike mean/stddev
    assert(math.abs(withSpike.head.getDouble(0) - noSpike.head.getDouble(0)) <= 0.5)
    assert(math.abs(withSpike.head.getDouble(1) - noSpike.head.getDouble(1)) <= 0.5)
  }

  test("approx path flags the same rows on well-separated data") {
    val exact = Outliers.madFlag(fixture, "k", "v")
      .filter($"is_outlier").select("k", "v").collect().toSet
    val approx = Outliers.madFlag(fixture, "k", "v", approx = true)
      .filter($"is_outlier").select("k", "v").collect().toSet
    assert(exact == approx)
  }

  test("winsorized/trimmed means shrug off a planted spike that wrecks the mean") {
    // 1..100 plus a 1e6 spike: mean explodes, robust means barely move
    val rows = ((1 to 100).map(_.toDouble) :+ 1e6).map(("k", _))
    val r = Outliers.winsorizedStats(rows.toDF("k", "v"), "k", "v", 0.1, 0.9)
      .head()
    val (n, mean, wins, trim, trimN) =
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))
    assert(n == 101L && mean > 9000)
    assert(wins > 40 && wins < 60, s"winsorized $wins")
    assert(trim > 40 && trim < 60, s"trimmed $trim")
    // trimming drops both tails; winsorizing keeps every row in n
    assert(trimN < n && trimN > (n * 0.75).toLong)
  }

  test("winsorized stats on symmetric clean data: all three means agree") {
    val rows = (1 to 99).map(i => ("k", i.toDouble))
    val r = Outliers.winsorizedStats(rows.toDF("k", "v"), "k", "v", 0.1, 0.9)
      .head()
    assert(r.getDouble(2) == 50.0 && r.getDouble(3) == 50.0 &&
      r.getDouble(4) == 50.0)
  }
}
