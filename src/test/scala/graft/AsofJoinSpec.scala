package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsofJoin

/** As-of join semantics: backward match, tie-breaks, no-match behavior, and
  * equivalence of the window and aggregation formulations.
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def quotes = Seq(
    // key, quote time, price
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 10:05:00"), 2.0),
    ("A", ts("2024-01-01 10:10:00"), 3.0),
    ("B", ts("2024-01-01 10:00:00"), 9.0)
  ).toDF("qkey", "qts", "price")

  private def trades = Seq(
    (1L, "A", ts("2024-01-01 10:07:00")), // -> 10:05 quote (price 2.0)
    (2L, "A", ts("2024-01-01 10:10:00")), // exact match -> 10:10 (3.0)
    (3L, "A", ts("2024-01-01 09:00:00")), // before all quotes -> no match
    (4L, "B", ts("2024-01-01 11:00:00")), // -> 10:00 (9.0)
    (5L, "C", ts("2024-01-01 11:00:00"))  // key with no quotes -> no match
  ).toDF("trade_id", "tkey", "tts")

  test("backward picks the latest quote at-or-before each trade") {
    val got = AsofJoin.backward(trades, quotes,
        leftKey = "tkey", rightKey = "qkey",
        leftId = "trade_id", leftTs = "tts", rightTs = "qts")
      .select($"trade_id", $"price").orderBy($"trade_id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2.0), (2L, 3.0), (4L, 9.0)))
  }

  test("aggregation formulation matches the window formulation") {
    val win = AsofJoin.backward(trades, quotes,
        "tkey", "qkey", "trade_id", "tts", "qts")
      .select($"trade_id", $"price").orderBy($"trade_id")
      .as[(Long, Double)].collect().toSeq
    val agg = AsofJoin.backwardAgg(trades, quotes,
        "tkey", "qkey", "trade_id", "tts", "qts",
        rightTie = "price", pick = Seq("price" -> "price"))
      .select($"trade_id", $"price").orderBy($"trade_id")
      .as[(Long, Double)].collect().toSeq
    assert(agg == win)
  }

  test("tie on timestamp resolves by the tie column, descending") {
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:00"), 5.0)).toDF("qkey", "qts", "price")
    val oneTrade = Seq((1L, "A", ts("2024-01-01 10:30:00"))).toDF("trade_id", "tkey", "tts")
    val got = AsofJoin.backward(oneTrade, dupQuotes,
        "tkey", "qkey", "trade_id", "tts", "qts", rightTieCols = Seq("price"))
      .select($"price").as[Double].collect().toSeq
    assert(got == Seq(5.0))
  }
}
