package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch format surface (SURVEY §2.2 EXT): parquet / ORC / JSON / CSV
  * writers+readers with explicit schema reapplication (CSV/JSON round
  * trips must not depend on inference), plus the streaming file source.
  * All built-in `FileFormat` implementations — no custom connectors. */
object Formats {
  val Supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def write(df: DataFrame, dir: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(dir)
  }

  def read(spark: SparkSession, dir: String, format: String,
           schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(dir)
  }

  /** Streaming file source over a directory (schema required). */
  def readStream(spark: SparkSession, dir: String, format: String,
                 schema: StructType): DataFrame =
    spark.readStream.format(format).schema(schema).load(dir)
}
