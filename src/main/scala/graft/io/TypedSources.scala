package graft.io

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Typed source wrappers — the engine's analog of the reference's Scalding
  * case-class sources (SURVEY.md §2 A20,
  * com/twitter/scalding/ColumnarSerDeSource.scala:18-68): a path + a case
  * class instead of a path + parallel name/type arrays. The Encoder derives
  * the schema, so the class IS the schema declaration.
  */
object TypedSources {

  def orc[T: Encoder](spark: SparkSession, path: String): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    spark.read.schema(enc.schema).orc(path).as[T]
  }

  def parquet[T: Encoder](spark: SparkSession, path: String): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    spark.read.schema(enc.schema).parquet(path).as[T]
  }

  def csv[T: Encoder](spark: SparkSession, path: String,
                      delimiter: String = "\t", header: Boolean = false): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    spark.read.schema(enc.schema)
      .option("sep", delimiter).option("header", header.toString)
      .csv(path).as[T]
  }

  def writeOrc[T](ds: Dataset[T], path: String, compression: String = "snappy"): Unit =
    ds.write.mode("overwrite").option("compression", compression).orc(path)
}
