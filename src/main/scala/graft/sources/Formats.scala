package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch format surface (SURVEY §2.2 EXT): parquet / ORC / JSON / CSV /
  * XML writers+readers with explicit schema reapplication (CSV/JSON/XML
  * round trips must not depend on inference), plus the streaming file
  * source and a JDBC source/sink. All built-in `FileFormat` /
  * relation-provider implementations — no custom connectors (XML is
  * first-party since Spark 4.0). */
object Formats {
  val Supported: Seq[String] = Seq("parquet", "orc", "json", "csv", "xml")

  def write(df: DataFrame, dir: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (format match {
      case "csv" => w.option("header", "true")
      case "xml" => w.option("rowTag", "row")
      case _ => w
    }).save(dir)
  }

  def read(spark: SparkSession, dir: String, format: String,
           schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (format match {
      case "csv" => r.option("header", "true")
      case "xml" => r.option("rowTag", "row")
      case _ => r
    }).load(dir)
  }

  /** Streaming file source over a directory (schema required). */
  def readStream(spark: SparkSession, dir: String, format: String,
                 schema: StructType): DataFrame =
    spark.readStream.format(format).schema(schema).load(dir)

  /** JDBC sink: write `df` as `table` over the given JDBC url (the
    * dimension-table export path; the built-in JDBC relation provider —
    * no custom connector). */
  def writeJdbc(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table).save()

  /** JDBC source: read `table` over the given url. Filters composed on
    * the result push down to the remote database as SQL (PushedFilters
    * in the scan — the predicate runs WHERE the data lives, the same
    * move as parquet row-group pruning; spec-pinned), and
    * `partitionColumn`/bounds split the read into parallel range
    * queries — without them a JDBC read is one executor-side cursor,
    * the classic single-task trap at scale. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: Option[(String, Long, Long, Int)] = None)
      : DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitionColumn.fold(r) { case (c, lo, hi, n) =>
      r.option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }.load()
  }
}
