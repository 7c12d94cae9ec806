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

  test("Avro wire format round-trips events incl. timestamps and nulls") {
    import graft.sources.AvroWire
    val events = Tables(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("maybe_null",
        when(col("event_id") % 3 === 0, col("event_type")))
    val wire = AvroWire.encode(events)
    assert(wire.schema.fields.map(f =>
      (f.name, f.dataType.typeName)).toSeq == Seq(("value", "binary")))
    val back = AvroWire.decode(wire, events.schema)
    assert(back.count() == events.count())
    def sig(df: org.apache.spark.sql.DataFrame): Long = df.agg(
      sum(crc32(concat_ws("|", col("event_id"), col("user_id"),
        col("event_type"), col("ts").cast("long"), col("value"),
        coalesce(col("maybe_null"), lit("<null>")))))).head().getLong(0)
    assert(sig(back) == sig(events))
    // the wire schema itself is sane (registry-compatible record)
    val names = AvroWire.wireFieldNames(
      AvroWire.avroSchemaJson(events.schema))
    assert(names == events.schema.fieldNames.toSeq)
  }

  test("Protobuf wire format round-trips events incl. timestamps and nulls") {
    import graft.sources.ProtoWire
    val events = Tables(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("maybe_null",
        when(col("event_id") % 3 === 0, col("event_type")))
    val wire = ProtoWire.encode(events)
    assert(wire.schema.fields.map(f =>
      (f.name, f.dataType.typeName)).toSeq == Seq(("value", "binary")))
    val back = ProtoWire.decode(wire, events.schema)
    assert(back.count() == events.count())
    def sig(df: org.apache.spark.sql.DataFrame): Long = df.agg(
      sum(crc32(concat_ws("|", col("event_id"), col("user_id"),
        col("event_type"), col("ts").cast("long"), col("value"),
        coalesce(col("maybe_null"), lit("<null>")))))).head().getLong(0)
    assert(sig(back) == sig(events))
  }

  test("Protobuf wire bytes match the published spec's golden examples") {
    import graft.sources.ProtoWire
    import org.apache.spark.sql.types._
    // protobuf.dev encoding guide: field 1 (varint) = 150 -> 08 96 01;
    // field 2 (string) = "testing" -> 12 07 74 65 73 74 69 6e 67
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType)))
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(150L, "testing")), schema)
    val bytes = ProtoWire.encode(df).head().getAs[Array[Byte]](0)
    val golden = Array(0x08, 0x96, 0x01, 0x12, 0x07).map(_.toByte) ++
      "testing".getBytes("UTF-8")
    assert(bytes.toSeq == golden.toSeq,
      s"wire bytes ${bytes.map("%02x".format(_)).mkString(" ")}")
    // unknown-field skipping (spec-required forward compatibility):
    // append field 99 varint 1 (tag = 99<<3 | 0 -> varint 792) and a
    // field 100 length-delimited blob; decode must ignore both
    val extra = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(bytes); bos.write(0x98); bos.write(0x06); bos.write(0x01)
      bos.write(0xA2); bos.write(0x06); bos.write(0x02)
      bos.write(0xFF); bos.write(0xFE)
      bos.toByteArray
    }
    val back = ProtoWire.decode(
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(extra)),
        StructType(Seq(StructField("value", BinaryType)))), schema)
      .head()
    assert(back.getLong(0) == 150L && back.getString(1) == "testing")
  }

  test("Protobuf lane covers every type incl. negative ints (10-byte varints)") {
    import graft.sources.ProtoWire
    import org.apache.spark.sql.types._
    // negative int32/int64 are the trap: the spec sign-extends them to
    // 64 bits before varint encoding, always 10 bytes on the wire
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("raw", BinaryType)))
    val rows = java.util.List.of(
      org.apache.spark.sql.Row(true, -1, Long.MinValue, -0.5f,
        Double.MaxValue, "", Array[Byte](0, -1, 127)),
      org.apache.spark.sql.Row(false, Int.MinValue, 0L, Float.NaN,
        -0.0, "héllo wörld", Array.empty[Byte]),
      org.apache.spark.sql.Row(null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows, schema)
    val back = ProtoWire.decode(ProtoWire.encode(df), schema)
      .collect().sortBy(r => if (r.isNullAt(2)) Long.MaxValue else r.getLong(2))
    assert(back.length == 3)
    val r0 = back.find(r => !r.isNullAt(1) && r.getInt(1) == -1).get
    assert(r0.getBoolean(0) && r0.getLong(2) == Long.MinValue &&
      r0.getFloat(3) == -0.5f && r0.getDouble(4) == Double.MaxValue &&
      r0.getString(5) == "" &&
      r0.getAs[Array[Byte]](6).toSeq == Seq[Byte](0, -1, 127))
    val r1 = back.find(r => !r.isNullAt(1) && r.getInt(1) == Int.MinValue).get
    assert(!r1.getBoolean(0) && r1.getLong(2) == 0L &&
      r1.getFloat(3).isNaN && // NaN bit pattern survives fixed32
      java.lang.Double.doubleToLongBits(r1.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(-0.0) &&
      r1.getString(5) == "héllo wörld" &&
      r1.getAs[Array[Byte]](6).length == 0)
    val r2 = back.find(_.isNullAt(1)).get
    assert((0 until 7).forall(r2.isNullAt)) // all-null row -> empty payload
  }

  test("Postgres driver absence is verified, not assumed (S9 runs on embedded Derby)") {
    // the image ships no Postgres driver — pin that. The JDBC catalog
    // path itself is REAL: JdbcCatalogSpec drives write + partitioned
    // pushdown reads against Spark's own embedded Derby; only the
    // production database behind the URL is absent here.
    assertThrows[ClassNotFoundException] {
      Class.forName("org.postgresql.Driver")
    }
  }

  test("Kafka connector absence is verified, not assumed") {
    // The reference consumes/produces Kafka (FraudDetectionJob.java:
    // 141-157,162-213). This sandbox ships neither spark-sql-kafka nor
    // kafka-clients nor a broker — pin that fact so the partial status
    // of S1/S5 is evidence-backed, and the suite flags it if the
    // environment ever gains the jars (at which point the plumbing in
    // TransactionPipeline.fromKafka/toKafkaSink becomes testable).
    assertThrows[ClassNotFoundException] {
      Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    }
    assertThrows[ClassNotFoundException] {
      Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider")
    }
    val err = intercept[Exception] {
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("subscribe", "t").load()
    }
    assert(err.getMessage.toLowerCase.contains("kafka"))
  }

  test("parquet schema evolution: mergeSchema unifies, old files null-fill") {
    // the ingest reality at 100 TB: files written months apart carry
    // different schema versions; the reader must union them without a
    // rewrite. v1 files lack the later `score` column.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_evolve")
      .toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .write.parquet(s"$root/p=1")
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "tag", "score")
      .write.parquet(s"$root/p=2")
    val df = spark.read.option("mergeSchema", "true").parquet(root)
    assert(df.columns.toSet == Set("id", "tag", "score", "p"))
    val byId = df.collect().map(r =>
      r.getAs[Long]("id") -> Option(r.getAs[Any]("score"))).toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty, "v1 rows null-fill")
    assert(byId(3L).contains(0.5) && byId(4L).contains(0.9))
    // and column pruning still reaches the scan across both versions
    val scan = df.select("id").queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<id:bigint>"), scan)
  }
}
