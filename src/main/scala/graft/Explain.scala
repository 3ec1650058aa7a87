package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints the formatted physical plan for the named
  * queries (or all). Used to audit scan pruning (PushedFilters /
  * ReadSchema), join strategies (broadcast vs SMJ), and codegen coverage
  * (WholeStageCodegen spans) — the things that decide 100 TB behavior.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // Hive support: the catalog queries (q68-q70) create metastore tables
    val wh = java.nio.file.Files.createTempDirectory("graft-explain-wh").toString
    val spark = GraftSession.hiveBuilder("local[4]", "graft-explain", wh)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
