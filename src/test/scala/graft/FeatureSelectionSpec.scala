package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.FeatureSelection

/** Chi-squared selection semantics: a class-exclusive term dominates, an
  * evenly-spread term scores ~0, presence is per-document (repeats in one
  * doc count once), ubiquitous terms and sub-floor terms are dropped.
  */
class FeatureSelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: Seq[(String, String)]) =
    rows.toDF("cls", "text").select(col("cls"),
      split(col("text"), " ").as("toks"))

  test("class-exclusive term scores high, evenly-spread term scores 0") {
    // "only_a" in every class-a doc, never in b; "fill" everywhere would be
    // dropped as ubiquitous, so spread "even" over half of each class
    val rows = (1 to 20).map(i => ("a", s"only_a ${if (i % 2 == 0) "even" else "odd"}")) ++
      (1 to 20).map(i => ("b", s"other ${if (i % 2 == 0) "even" else "odd"}"))
    val out = FeatureSelection.chi2Terms(docs(rows), "cls", "toks", 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("a", "only_a")) == 40.0) // perfect 2x2 separation: chi2 = N
    assert(out(("a", "even")) == 0.0 && out(("b", "even")) == 0.0)
  }

  test("presence is per-document; ubiquitous and rare terms dropped") {
    val rows = (1 to 9).map(_ => ("a", "dup dup dup common")) ++
      (1 to 10).map(_ => ("b", "common filler")) :+
      ("b", "common rare_once x5 x5 x5 x5 x5")
    val out = FeatureSelection.chi2Terms(docs(rows), "cls", "toks", 5L)
    val terms = out.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // "common" is in every doc -> degenerate denominator -> filtered
    assert(!terms.exists(_._2 == "common"))
    // "rare_once" doc-freq below 5 -> filtered
    assert(!terms.exists(_._2 == "rare_once"))
    // "dup" repeated inside docs still counts each doc once (9 a-docs)
    assert(terms.contains(("a", "dup", 9L)))
    // "x5" appears 5 times in ONE doc -> doc-freq 1 -> filtered
    assert(!terms.exists(_._2 == "x5"))
  }
}
