package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k as an aggregate, not a window.
  *
  * `row_number().over(partitionBy(g).orderBy(s))` shuffles EVERY row to the
  * group's reducer and sorts there; at 100 TB that is the whole table
  * through the wire for a k-row answer. This aggregator keeps a bounded
  * k-element buffer, so partial (map-side) aggregation reduces each
  * partition to <= k rows per group before the shuffle — the same
  * partial/final contract as `sum`, applied to top-k.
  *
  * Ordering is (score desc, tie asc) — ties resolve deterministically,
  * matching the window formulation `orderBy(score.desc, tie.asc)`.
  */
object TopK {

  /** One buffered candidate: score + tie-break key + opaque payload. */
  final case class Entry(score: Double, tie: Long, payload: String)

  final class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    require(k >= 1, "k must be >= 1")

    private def better(a: Entry, b: Entry): Boolean =
      a.score > b.score || (a.score == b.score && a.tie < b.tie)

    def zero: List[Entry] = Nil

    // keep the buffer sorted best-first and bounded at k
    private def insert(buf: List[Entry], e: Entry): List[Entry] =
      if (buf.lengthCompare(k) >= 0 && !better(e, buf.last)) buf
      else {
        val (pre, post) = buf.span(b => better(b, e))
        (pre ::: e :: post).take(k)
      }

    def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
    def merge(a: List[Entry], b: List[Entry]): List[Entry] = b.foldLeft(a)(insert)
    def finish(buf: List[Entry]): Seq[Entry] = buf

    def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder[List[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per group: groups by `groupCol`, ranks by (`scoreCol` desc,
    * `tieCol` asc), carries `payloadCol` (a string; pack structs with
    * to_json if needed). Output: (group, score, tie, payload, rank).
    */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: String,
               tieCol: String, payloadCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new TopKAgg(k), Encoders.product[Entry])
    df.select(col(groupCol).as("group"),
        col(scoreCol).cast("double").as("score"),
        col(tieCol).cast("long").as("tie"),
        col(payloadCol).cast("string").as("payload"))
      .groupBy($"group")
      .agg(agg($"score", $"tie", $"payload").as("topk"))
      .select($"group", posexplode($"topk").as(Seq("pos", "entry")))
      .select($"group",
        $"entry.score".as("score"), $"entry.tie".as("tie"),
        $"entry.payload".as("payload"), ($"pos" + 1).cast("long").as("rank"))
  }
}
