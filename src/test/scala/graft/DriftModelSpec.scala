package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Drift, LinearModel}

/** Drift.psi calibration (identical distributions score near zero, a
  * planted shift scores high, monotone in shift size) and LinearModel
  * learning dynamics (loss decreases per epoch; a separable toy is
  * classified perfectly).
  */
class DriftModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def uni(n: Int, shift: Double) =
    (1 to n).map(i => ("k", i % 100 * 1.0 + shift)).toDF("k", "v")

  test("psi ~ 0 on identical distributions, grows with shift") {
    def psiOf(shift: Double): Double =
      Drift.psi(uni(2000, 0), uni(2000, shift), "k", "v", 10.0, 10)
        .head().getDouble(3)
    val same = psiOf(0)
    val small = psiOf(10)
    val big = psiOf(40)
    assert(same < 0.01, s"identical dists scored $same")
    assert(small > same && big > small, s"$same / $small / $big not monotone")
    assert(big > 0.25, s"planted 40% shift scored only $big")
  }

  test("psi handles a bin empty on one side (smoothing, no NaN/Inf)") {
    val ref = (1 to 100).map(i => ("k", 5.0)).toDF("k", "v")
    val cur = (1 to 100).map(i => ("k", 95.0)).toDF("k", "v")
    val p = Drift.psi(ref, cur, "k", "v", 10.0, 10).head().getDouble(3)
    assert(!p.isNaN && !p.isInfinite && p > 1.0)
  }

  test("logistic GD drives log-loss down each epoch and separates a toy") {
    // y = 1 iff x > 0, margin 1: linearly separable on (bias, x)
    val df = ((-50 to -1) ++ (1 to 50)).map(i =>
      (1.0, i / 10.0, if (i > 0) 1.0 else 0.0)).toDF("b", "x", "y")
    val losses = (1 to 3).map { k =>
      val w = LinearModel.logisticGd(df, Seq("b", "x"), "y", lr = 1.0, nIter = k)
      LinearModel.logisticEval(df, Seq("b", "x"), "y", w).head().getDouble(0)
    }
    assert(losses(1) < losses(0) && losses(2) < losses(1), losses.toString)
    val w = LinearModel.logisticGd(df, Seq("b", "x"), "y", lr = 1.0, nIter = 25)
    val acc = LinearModel.logisticEval(df, Seq("b", "x"), "y", w)
      .head().getDouble(1)
    assert(acc == 1.0, s"separable toy accuracy $acc")
  }
}
