package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Collocations

/** PMI semantics: a pair that always co-occurs scores high, independent
  * pairs score ~0, the min-count floor drops rare pairs, and totals are
  * computed before the floor (shares are true corpus shares).
  */
class CollocationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("perfect collocation scores ln(n_bigrams * ...) > 0, independents ~ 0") {
    // "aa bb" always together; "x"/"y"/"z" shuffled independently
    val docs = (1 to 60).map { i =>
      val filler = Seq("x", "y", "z").drop(i % 3) ++ Seq("x", "y", "z").take(i % 3)
      (Seq("aa", "bb") ++ filler).mkString(" ")
    }.toDF("text").select(split(col("text"), " ").as("toks"))
    val pmi = Collocations.pmiBigrams(docs, "toks", minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(pmi(("aa", "bb")) > 1.0) // c=60 of 240 bigrams, p(a)=p(b)=1/5
    // bb->filler transitions are spread across x/y/z: weak association
    assert(pmi.filterKeys(_._1 == "bb").values.forall(_ < pmi(("aa", "bb"))))
  }

  test("minCount floors rare pairs but keeps totals pre-floor") {
    val docs = Seq.fill(10)("a b").appended("c d")
      .toDF("text").select(split(col("text"), " ").as("toks"))
    val out = Collocations.pmiBigrams(docs, "toks", minCount = 5)
    val keys = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys == Set(("a", "b")))
    // p(ab) = 10/11 bigrams (not 10/10): PMI = ln((10/11)/((10/22)^2))
    val pmi = out.head().getDouble(3)
    val expect = math.log((10.0 / 11) / ((10.0 / 22) * (10.0 / 22)))
    assert(math.abs(pmi - expect) < 1e-6)
  }
}
