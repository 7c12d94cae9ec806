package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated deterministic parquet tables
  * (see TESTDATA.md). One parquet file per table; schema-on-read so
  * Catalyst can push filters/projections into the scan.
  *
  * At cluster scale these would be partitioned/bucketed table paths —
  * the loader is the single place to swap in a catalog, so every
  * operator above it stays storage-agnostic.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table carries TIMESTAMP(NANOS) parquet timestamps,
    // which Spark only reads via spark.sql.legacy.parquet.nanosAsLong
    // (set in Verify/Bench/test sessions). Convert back to a proper
    // event-time column; integer DIV truncates exactly like DuckDB's
    // ns→µs read, so both engines see identical values.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None    => df
    }
  }

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
