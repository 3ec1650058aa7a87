package graft.io

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Row-at-a-time access — the engine's analog of the reference's direct tap
  * iteration (SURVEY.md §2 B10, §3.2: openForRead -> TupleEntryIterator) and
  * incremental write (§3.3: openForWrite -> TupleEntryCollector).
  *
  * Reads stream partition-by-partition through the driver (toLocalIterator),
  * so only one partition is resident at a time; writes buffer rows locally
  * and flush as ONE DataFrame write — the row-at-a-time surface is driver
  * convenience, the I/O is still a normal distributed write.
  */
object RowAccess {

  /** Driver-side row iterator over any DataFrame. */
  def iterator(df: DataFrame): Iterator[Row] = df.toLocalIterator().asScala

  /** Incremental row collector flushing to a FileTable on close. */
  final class Collector(spark: SparkSession, schema: StructType, target: FileTable) {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]

    def add(values: Any*): Unit = { buf += Row(values: _*); () }
    def addRow(r: Row): Unit = { buf += r; () }
    def size: Int = buf.size

    /** Write everything collected; the collector can be reused after. */
    def close(): Unit = {
      val df = spark.createDataFrame(buf.toSeq.asJava, schema)
      target.write(df)
      buf.clear()
    }
  }

  def openForWrite(spark: SparkSession, schema: StructType, target: FileTable): Collector =
    new Collector(spark, schema, target)
}
