package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Selection

/** Greedy max-cover semantics: marginal gain (not set size) drives each
  * pick, ties break on the smaller id, exhausted universes stop early,
  * and duplicate (id, item) rows don't inflate gains.
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("greedy picks by marginal gain, not set size") {
    // A={1..6}, B={1..5,7}, C={7,8,9}: by-size top-2 is A,B (covers 7);
    // greedy is A then C (covers 9)
    val items = ((1 to 6).map(("A", _)) ++ ((1 to 5) :+ 7).map(("B", _)) ++
      (7 to 9).map(("C", _))).toDF("id", "item")
    val picks = Selection.greedyMaxCover(items, 2).collect()
    assert(picks.map(_.getString(1)).toSeq == Seq("A", "C"))
    assert(picks.map(_.getLong(2)).toSeq == Seq(6L, 3L))
  }

  test("stops early when the universe is exhausted; dup rows don't inflate") {
    val items = Seq(("A", 1), ("A", 1), ("A", 2), ("B", 2)).toDF("id", "item")
    val picks = Selection.greedyMaxCover(items, 5).collect()
    assert(picks.length == 1) // A covers {1,2}; B adds nothing -> stop
    assert(picks.head.getString(1) == "A" && picks.head.getLong(2) == 2L)
  }

  test("ties break on the smaller id") {
    val items = Seq(("x", 1), ("x", 2), ("y", 3), ("y", 4)).toDF("id", "item")
    val first = Selection.greedyMaxCover(items, 1).collect().head
    assert(first.getString(1) == "x")
  }
}
