package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** The reference dataflow surface (SURVEY.md §2B) and its semantic traps:
  * discard-when-true filtering (B3), key-sorted grouping (B5/B7), empty
  * tokens from regex split (B8), _colN naming (A8).
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the reference's 3-column `test` fixture shape (FIXTURES.md §2)
  private def testDf = Seq(
    (1, "a", "A"), (1, "a", "A"), (1, "a", "A"),
    (2, "b", "B"), (2, "b", "B"), (2, "b", "B"),
    (3, "c", "C"),
    (4, "d", "D"), (4, "d", "D"), (4, "d", "D"),
    (5, "e", "E"), (5, "e", "E"), (5, "e", "E")
  ).toDF("col1", "col2", "col3")

  test("removeWhere discards rows where predicate is TRUE (HCatTapTest col1>3)") {
    val kept = testDf.removeWhere($"col1" > 3).select("col1").distinct()
    assert(TestSpark.rows(kept.orderBy("col1")).flatten == Seq(1, 2, 3))
  }

  test("removeWhere col1 != 1 keeps only the 1s (HCatTapTest)") {
    val kept = testDf.removeWhere("col1 != 1")
    assert(kept.count() == 3)
    assert(TestSpark.rows(kept.select("col1").distinct()).flatten == Seq(1))
  }

  test("removeWhere keeps rows where the predicate is NULL") {
    val df = Seq(Some(1), Some(5), None).toDF("x")
    // x > 3 is NULL for the null row: Cascading filter semantics keep it
    val kept = df.removeWhere($"x" > 3)
    assert(kept.count() == 2) // 1 and null kept; 5 removed
  }

  test("countBy emits key-sorted counts (RCFileTest CountBy expectation)") {
    val got = TestSpark.rows(testDf.countBy(Seq("col1"), "cnt"))
    assert(got == Seq(Seq(1, 3L), Seq(2, 3L), Seq(3, 1L), Seq(4, 3L), Seq(5, 3L)))
  }

  test("sortedGroupBy appends the key sort Spark's groupBy lacks") {
    val got = testDf.sortedGroupBy(Seq("col2"), Seq(sum($"col1").as("s")))
    assert(TestSpark.rows(got).map(_.head) == Seq("a", "b", "c", "d", "e"))
  }

  test("splitGenerate keeps empty tokens (ORCFileTest word-count: '' x9)") {
    // Two docs engineered so the reference regex produces empty tokens at
    // punctuation boundaries, as in the wc fixture.
    val docs = Seq("A word (Australia) ends.", "A A, word").toDF("text")
    val counts = docs.splitGenerate($"text", """[ \[\]\(\),.]""").countBy(Seq("token"))
    val m = TestSpark.rows(counts).map(r => r.head -> r(1)).toMap
    // "(Australia)" -> "", "Australia", ""; "ends." -> "ends", ""; "A," -> "A", ""
    assert(m("") == 4L)
    assert(m("A") == 3L)
    assert(m("Australia") == 1L)
    // key-sorted: empty token first
    assert(TestSpark.rows(counts).head.head == "")
  }

  test("coerce casts columns in place (Coerce string->int)") {
    val df = Seq(("11-1011", "299160", "151370")).toDF("code", "total_emp", "salary")
      .coerce("total_emp" -> IntegerType, "salary" -> IntegerType)
    assert(df.schema("total_emp").dataType == IntegerType)
    assert(TestSpark.rows(df.select("total_emp")).head.head == 299160)
  }

  test("coerceDdl accepts Hive type names") {
    val df = Seq(("1", "2.5")).toDF("a", "b").coerceDdl("a" -> "bigint", "b" -> "double")
    assert(df.schema("a").dataType.typeName == "long")
    assert(df.schema("b").dataType.typeName == "double")
  }

  test("coerce converts strings to every Hive type the reference's converter " +
      "handles (ConvertToHiveJavaType.java:45-70)") {
    val df = Seq(("3", "4", "5.5", "6.25", "123.45", "true", "abc",
        "2011-09-14 10:20:30"))
      .toDF("i", "l", "f", "d", "dec", "bool", "bin", "ts")
      .coerceDdl("i" -> "int", "l" -> "bigint", "f" -> "float",
        "d" -> "double", "dec" -> "decimal(10,2)", "bool" -> "boolean",
        "bin" -> "binary", "ts" -> "timestamp")
    val r = df.collect()(0)
    assert(r.getInt(0) == 3 && r.getLong(1) == 4L)
    assert(r.getFloat(2) == 5.5f && r.getDouble(3) == 6.25)
    assert(r.getDecimal(4) == new java.math.BigDecimal("123.45"))
    assert(r.getBoolean(5))
    assert(new String(r.getAs[Array[Byte]](6), "UTF-8") == "abc")
    assert(r.getTimestamp(7) == java.sql.Timestamp.valueOf("2011-09-14 10:20:30"))
  }

  test("identitySelect projects a named subset in order (Identity(Fields))") {
    val df = testDf.identitySelect("col3", "col1")
    assert(df.columns.toSeq == Seq("col3", "col1"))
  }

  test("withDefaultColNames renames to _col0.._colN (ORC sink inference)") {
    val df = testDf.withDefaultColNames
    assert(df.columns.toSeq == Seq("_col0", "_col1", "_col2"))
  }

  test("bigramLogProb: common phrasing scores above rare, short docs omitted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the mat"),
      (4L, "zyx qwv jkl pqr"),   // bigrams seen once each
      (5L, "single")             // < 2 tokens: no score row
    ).toDF("doc_id", "text")
    val out = graft.functions.TextFunctions
      .bigramLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(!out.contains(5L))
    assert(out(1L)._2 == 5L) // 6 tokens -> 5 bigrams
    // repeated in-distribution phrasing outscores one-off bigrams
    assert(out(1L)._1 > out(4L)._1,
      s"common ${out(1L)._1} should beat rare ${out(4L)._1}")
    assert(out(1L)._1 == out(3L)._1) // identical docs, identical score
    // all log-probs are negative (probabilities < 1)
    assert(out.values.forall(_._1 < 0.0))
  }

  test("globalRank equals row_number over the global order, ranks contiguous") {
    import spark.implicits._
    // keys deliberately unsorted and skewed across values
    val rnd = new scala.util.Random(5)
    val df = rnd.shuffle((1 to 500).toList).map(i => (i.toLong, i % 7))
      .toDF("id", "grp").repartition(8)
    val ord = Seq(col("grp").asc, col("id").desc)
    val got = PrefixSum.globalRank(df, ord, "pos", numPartitions = 6)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(ord: _*)).cast("long"))
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(got == naive)
    assert(got.values.toSeq.sorted == (1L to 500L))
    // the point of the operator: the full-data row_number window is keyed
    // by the range-partition id (per-task bound = partition size), never a
    // global single-partition window — only the <= p offset rows may pass
    // through one task. The range exchange itself runs inside the eager
    // localCheckpoint (the visible plan starts at Scan ExistingRDD), so
    // assert the checkpoint boundary plus the __pid-keyed window and the
    // absence of any single-partition funnel of the data rows.
    val plan = PrefixSum.globalRank(df, ord, "pos")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"), "checkpoint boundary missing")
    assert(plan.contains("row_number() windowspecdefinition(__pid"),
      "row_number window not keyed by partition id:\n" + plan)
    assert(!plan.contains("windowspecdefinition(" + ord.mkString(", ")),
      "data rows funneled through a global window:\n" + plan)
  }

  test("stripMarkup: script/style/comments dropped, tags stripped, entities decoded") {
    import spark.implicits._
    val html =
      """<html><head><title>T</title>
        |<style type="text/css">body { color: red; }</style>
        |<SCRIPT>if (a < b) { alert("x"); }</SCRIPT></head>
        |<body><!-- header
        |  spans lines --><h1 class="big">Hello &amp; welcome</h1>
        |<p>1 &lt; 2, &quot;q&quot;, it&#39;s&nbsp;fine</p>
        |<br/><div>end</div></body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(graft.functions.TextFunctions.stripMarkup($"h"))
      .head().getString(0)
    assert(out == """T Hello & welcome 1 < 2, "q", it's fine end""")
    // unclosed script can't swallow the document
    val out2 = Seq("""<p>keep</p><script>var x""").toDF("h")
      .select(graft.functions.TextFunctions.stripMarkup($"h"))
      .head().getString(0)
    assert(out2 == "keep var x")
  }

  test("editDistancePairs equals brute force, incl. short-string fallback") {
    import spark.implicits._
    val strs = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
      (4L, "abc"), (5L, "abd"), (6L, "xy"), (7L, "x"), (8L, "kitten"),
      (9L, "zzzzz"), (10L, "")).toDF("id", "s")
    val got = graft.ops.FuzzyJoin.editDistancePairs(strs, "s", "id",
        maxDist = 1)
      .select($"idA", $"idB", $"dist").as[(Long, Long, Long)].collect().toSet
    // brute force with the same levenshtein
    val l = strs.select($"id".as("idA"), $"s".as("sA"))
    val r = strs.select($"id".as("idB"), $"s".as("sB"))
    val exact = l.crossJoin(r).filter($"idA" < $"idB")
      .withColumn("dist", levenshtein($"sA", $"sB").cast("long"))
      .filter($"dist" <= 1)
      .select($"idA", $"idB", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(got == exact, s"fuzzy ${got.size} vs exact ${exact.size}")
    // sanity: the known pairs are present — chain ends NOT joined
    assert(got.contains((1L, 2L, 1L)) && got.contains((2L, 3L, 1L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L)) // kitten/sittin = 2
    assert(got.contains((4L, 5L, 1L)))   // substitution
    assert(got.contains((6L, 7L, 1L)))   // deletion: xy/x
    assert(got.contains((1L, 8L, 0L)))   // exact duplicates at dist 0

    // maxDist = 2 (double-deletion neighborhood) against the same oracle
    val got2 = graft.ops.FuzzyJoin.editDistancePairs(strs, "s", "id",
        maxDist = 2)
      .select($"idA", $"idB", $"dist").as[(Long, Long, Long)].collect().toSet
    val exact2 = l.crossJoin(r).filter($"idA" < $"idB")
      .withColumn("dist", levenshtein($"sA", $"sB").cast("long"))
      .filter($"dist" <= 2)
      .select($"idA", $"idB", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(got2 == exact2, s"fuzzy d2 ${got2.size} vs exact ${exact2.size}")
    assert(got2.contains((1L, 3L, 2L))) // kitten/sittin now included
  }

  test("Checks: duplicate keys and referential orphans, null FK not orphan") {
    import spark.implicits._
    val child = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)),
      (4L, None: Option[Long]), (5L, Some(10L))).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val orph = graft.ops.Checks.orphans(child, "fk", parent, "pk")
      .select("id").as[Long].collect().toSeq
    assert(orph == Seq(3L)) // null fk (id 4) is NOT an orphan
    val dups = graft.ops.Checks.duplicateKeys(
        child.select($"fk"), Seq("fk"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    assert(dups.toSeq == Seq((10L, 2L))) // nulls/singletons not violations
    // clean data -> empty violation sets
    assert(graft.ops.Checks.duplicateKeys(parent, Seq("pk")).isEmpty)
    assert(graft.ops.Checks.orphans(
      child.filter($"id" =!= 3), "fk", parent, "pk").isEmpty)
  }

  test("Sequence.ngramCounts: runs stay inside a key, order is by (ts, tie), shares sum to 1") {
    // user A: x y x y  -> trigrams (x,y,x), (y,x,y); user B: z z -> none
    val rows = Seq(("A", 1L, 1L, "x"), ("A", 2L, 2L, "y"), ("A", 3L, 3L, "x"),
      ("A", 4L, 4L, "y"), ("B", 1L, 5L, "z"), ("B", 2L, 6L, "z"))
    val out = Sequence.ngramCounts(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out == Map(("x", "y", "x") -> (1L, 0.5), ("y", "x", "y") -> (1L, 0.5)))
    // tie column decides equal timestamps deterministically
    val tied = Seq(("A", 1L, 2L, "b"), ("A", 1L, 1L, "a"), ("A", 2L, 3L, "c"))
    val t3 = Sequence.ngramCounts(tied.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", 3).collect()
    assert(t3.length == 1 &&
      (t3(0).getString(0), t3(0).getString(1), t3(0).getString(2)) == ("a", "b", "c"))
  }
}
