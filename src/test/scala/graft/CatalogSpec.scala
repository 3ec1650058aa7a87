package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.CatalogTable
import graft.io.RcFileHiveTable
import graft.schema.HiveDdl

/** Metastore-backed behaviors (SURVEY.md §2 A10-A16) on a local Hive-support
  * warehouse — the engine's analog of the reference's embedded-H2 metastore
  * fixture (HCatTapTest scenarios).
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample07 = Seq(
    ("11-1011", "Chief executives", 299160, 151370),
    ("11-1021", "General managers", 1655410, 103780),
    ("11-2011", "Ad managers", 36300, 91100)
  ).toDF("code", "description", "total_emp", "salary")

  test("catalog-resolved read via table name (HCatTap source)") {
    spark.sql("DROP TABLE IF EXISTS default.sample_07")
    sample07.write.saveAsTable("default.sample_07")
    val df = CatalogTable("default", "sample_07").read(spark)
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("code", "description", "total_emp", "salary"))
  }

  test("insertByName aligns by name, null-fills missing, drops extra (A15)") {
    spark.sql("DROP TABLE IF EXISTS default.align_target")
    spark.sql("CREATE TABLE default.align_target (a INT, b STRING, c DOUBLE) USING parquet")
    // input has b, a (wrong order), extra column x, missing c
    val in = Seq(("hello", 1, 9.9)).toDF("b", "a", "x")
    CatalogTable("default", "align_target").insertByName(in)
    val got = spark.table("default.align_target").collect()(0)
    assert(got.getInt(0) == 1)
    assert(got.getString(1) == "hello")
    assert(got.isNullAt(2))
  }

  test("partitioned table + filter string prunes partitions (A11/A12)") {
    spark.sql("DROP TABLE IF EXISTS default.part_tbl")
    val data = Seq((1, "x", "20120401"), (2, "y", "20120401"), (3, "z", "20120402"))
      .toDF("id", "v", "ds")
    data.write.partitionBy("ds").saveAsTable("default.part_tbl")
    val ct = CatalogTable("default", "part_tbl")
    assert(ct.read(spark, Some("ds=20120401")).count() == 2)
    assert(ct.read(spark, Some("ds>20120401")).count() == 1)
    assert(ct.read(spark, Some("ds like '201204%'")).count() == 3)
    // pruning visible in the plan: only one partition dir scanned
    val plan = ct.read(spark, Some("ds=20120402")).queryExecution.executedPlan.toString
    assert(!plan.contains("ds=20120401") || plan.contains("partitionFilters"))
  }

  test("commit-time relocation: write to path then SET LOCATION (A16)") {
    spark.sql("DROP TABLE IF EXISTS default.reloc")
    Seq((1, "a")).toDF("id", "v").write.saveAsTable("default.reloc")
    val newPath = TestSpark.tmpDir("reloc-new")
    val ct = CatalogTable("default", "reloc")
    ct.writeAndRelocate(Seq((2, "b"), (3, "c")).toDF("id", "v"), newPath)
    val back = spark.table("default.reloc")
    assert(back.count() == 2)
    assert(TestSpark.rows(back.orderBy("id")).map(_.head) == Seq(2, 3))
  }

  test("identifier URI form (A22)") {
    val ct = CatalogTable("db", "tbl")
    assert(ct.identifier() == "hcatalog://db.tbl")
    assert(ct.identifier(Some("ds=1")) == "hcatalog://db.tbl?filter=ds=1")
  }

  test("regex file exclusion when listing (A13)") {
    val dir = TestSpark.tmpDir("excl")
    Seq((1, "a")).toDF("id", "v").write.parquet(s"$dir/keep")
    Seq((2, "b")).toDF("id", "v").write.parquet(s"$dir/skipme")
    val files = CatalogTable.listFilesExcluding(spark, dir, ".*skipme.*")
    assert(files.nonEmpty)
    assert(files.forall(!_.contains("skipme")))
    val df = CatalogTable.readExcluding(spark, dir, "parquet", ".*skipme.*")
    assert(TestSpark.rows(df.select("id")).flatten == Seq(1))
  }

  test("RCFile table round trip via Hive support (A1/A2, rc_test types)") {
    spark.sql("DROP TABLE IF EXISTS default.rc_rt")
    val rc = RcFileHiveTable("default.rc_rt")
    rc.create(spark, HiveDdl.parse(
      "intCol int, bigintCol bigint, doubleCol double, booleanCol boolean, stringCol string"))
    val data = Seq((1, -2L, 3.5, true, "c"), (2, -4L, 7.5, false, "d"))
      .toDF("intCol", "bigintCol", "doubleCol", "booleanCol", "stringCol")
    rc.append(data)
    val back = rc.read(spark)
    assert(back.count() == 2)
    val r = back.orderBy("intCol").collect()(0)
    assert(r.getLong(1) == -2L && r.getBoolean(3) && r.getString(4) == "c")
    // verify it is really stored as RCFile
    val fmt = spark.sql("DESCRIBE FORMATTED default.rc_rt").collect()
      .find(_.getString(0).trim.startsWith("InputFormat")).get.getString(1)
    assert(fmt.toLowerCase.contains("rcfile"), s"unexpected format $fmt")
  }
}
