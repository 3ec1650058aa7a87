package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsonFunctions

/** Caller-supplied null token in JSON rendering (SURVEY.md §2 A18 residue;
  * reference SerDeUtils.getJSONString(..., nullStr), SerDeUtils.java:201-210).
  */
class JsonFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("toJsonNullStr writes the raw token in every null value position") {
    val df = Seq((1, Option("a")), (2, Option.empty[String])).toDF("id", "v")
      .select($"id", struct($"id", $"v").as("s"))
    val got = df.orderBy($"id")
      .select(JsonFunctions.toJsonNullStr($"s", "\\N").as("j"))
      .as[String].collect().toSeq
    assert(got == Seq("""{"id":1,"v":"a"}""", """{"id":2,"v":\N}"""))
  }

  test("toJsonNullStr covers nested positions: array elements, nested structs") {
    val df = spark.sql("""SELECT named_struct(
        'xs', array(1, CAST(NULL AS INT), 3),
        'inner', named_struct('a', CAST(NULL AS STRING), 'b', 2.5D),
        't', CAST(NULL AS STRING)) AS s""")
    val got = df.select(JsonFunctions.toJsonNullStr($"s", "NULL").as("j"))
      .as[String].collect().head
    assert(got == """{"xs":[1,NULL,3],"inner":{"a":NULL,"b":2.5},"t":NULL}""")
  }

  test("SQL surface: graft_to_json_nullstr from spark.sql") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT graft_to_json_nullstr(
        |  named_struct('a', CAST(NULL AS INT), 'b', 'x'), '\\N') AS j""".stripMargin)
      .as[String].collect().head
    assert(got == """{"a":\N,"b":"x"}""")
  }

  test("default token is the identity; bare 'null' inside words untouched") {
    val df = Seq(("anullb", Option.empty[String])).toDF("v", "w")
      .select(struct($"v", $"w").as("s"))
    val asDefault = df.select(JsonFunctions.toJsonNullStr($"s", "null").as("j"))
      .as[String].collect().head
    assert(asDefault == """{"v":"anullb","w":null}""")
    val asToken = df.select(JsonFunctions.toJsonNullStr($"s", "~").as("j"))
      .as[String].collect().head
    // the word inside the string value has no delimiter before it — untouched
    assert(asToken == """{"v":"anullb","w":~}""")
  }
}
