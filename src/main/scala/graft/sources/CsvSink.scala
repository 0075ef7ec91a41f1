package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S6: the reference's CSV export (`/root/reference/musif/process/processor.py:239-270`,
  * `to_csv(index=False)`) as a Spark sink — header'd CSV through the same
  * `df.write` API as the parquet path, with an explicit timestamp format so
  * a schema'd read-back round-trips exactly. */
object CsvSink {

  // shared with TableSource's csv: reader so the round-trip convention has
  // exactly one definition
  private[sources] val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)
}
