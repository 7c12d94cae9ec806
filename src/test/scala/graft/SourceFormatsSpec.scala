package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** S9-adjacent source-format coverage: the engine's tables round-trip
  * through every bundled columnar/text format (parquet is the
  * primary; ORC, JSON, CSV prove the storage-agnostic loader story).
  */
class SourceFormatsSpec extends AnyFunSuite {
  import TestSpark._

  test("events round-trip through ORC, JSON, and CSV with equal content") {
    val root = Files.createTempDirectory("graft_fmt").toFile.getAbsolutePath
    val events = Tables(spark, sf, "events")
    val checksum = events.agg(
      sum(crc32(concat_ws("|", col("event_id"), col("user_id"),
        col("event_type"), col("value")))).as("c")).head().getLong(0)
    val n = events.count()

    events.write.orc(s"$root/orc")
    val orc = spark.read.orc(s"$root/orc")
    assert(orc.count() == n)
    assert(orc.agg(sum(crc32(concat_ws("|", col("event_id"), col("user_id"),
      col("event_type"), col("value"))))).head().getLong(0) == checksum)

    events.write.json(s"$root/json")
    val json = spark.read.schema(events.schema).json(s"$root/json")
    assert(json.count() == n)

    events.write.option("header", "true").csv(s"$root/csv")
    val csv = spark.read.option("header", "true").schema(events.schema)
      .csv(s"$root/csv")
    assert(csv.count() == n)
    assert(csv.agg(sum(crc32(concat_ws("|", col("event_id"), col("user_id"),
      col("event_type"), col("value"))))).head().getLong(0) == checksum)
  }
}
