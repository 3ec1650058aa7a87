package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Association

/** Association-rule semantics: lift separates genuinely co-occurring
  * items from independent ones, the relative support floor prunes both
  * items and pairs (a-priori), presence is basket-deduped, and both rule
  * directions share support/lift but differ in confidence.
  */
class AssociationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("perfectly-coupled pair lifts above independent pairs, both directions emitted") {
    // baskets 1..20: {p, q} always together; r in every basket (independent)
    val rows = (1 to 20).flatMap(b => Seq((b, "p"), (b, "q"), (b, "r")))
    val out = Association.pairRules(rows.toDF("basket", "item"), "basket", "item", 0.2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // all pairs co-occur in all 20 baskets here, so lift = 1 for every pair,
    // but confidence(p->q) = 1.0 exactly
    assert(out(("p", "q"))._2 == 1.0 && out(("q", "p"))._2 == 1.0)
    assert(out.keySet.contains(("p", "r")) && out.keySet.contains(("r", "p")))
  }

  test("lift > 1 for coupled, ~1 for independent, rule directions share lift") {
    // a+b co-occur in baskets 1..10; c rides alone in 11..20 plus 1..10
    val rows = (1 to 10).flatMap(b => Seq((b, "a"), (b, "b"), (b, "c"))) ++
      (11 to 20).map(b => (b, "c"))
    val out = Association.pairRules(rows.toDF("basket", "item"), "basket", "item", 0.2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(out(("a", "b")) == 2.0)            // 20*10/(10*10)
    assert(out(("a", "c")) == 1.0)            // 20*10/(10*20)
    assert(out(("a", "b")) == out(("b", "a"))) // lift is symmetric
  }

  test("a-priori floor prunes rare items before pair generation; presence deduped") {
    // z appears in only 1 of 20 baskets (below 20% floor); y duplicated
    // within a basket must count once
    val rows = (1 to 20).flatMap(b => Seq((b, "x"), (b, "y"), (b, "y"))) ++ Seq((1, "z"))
    val out = Association.pairRules(rows.toDF("basket", "item"), "basket", "item", 0.2)
      .collect()
    assert(out.forall(r => r.getString(0) != "z" && r.getString(1) != "z"))
    val xy = out.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(xy.getLong(2) == 20L && xy.getDouble(3) == 1.0) // c_pair counts baskets
  }
}
