package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Protocol Buffers binary wire format — the third Kafka payload
  * encoding the reference's schema-registry configuration implies
  * (`config/JobConfig.java:17`; registries serve Avro/JSON/Protobuf).
  * No protobuf runtime ships on this classpath, and none is needed:
  * the proto3 WIRE format is a small published spec (varint
  * key/value, little-endian fixed32/64, length-delimited bytes —
  * protobuf.dev/programming-guides/encoding), implemented here
  * directly. Same Iterator→Iterator kernel boundary as [[AvroWire]]:
  * one reused output buffer per task, no per-row allocation beyond
  * the payload; a flat Spark schema maps to field numbers 1..n in
  * declaration order.
  *
  * Type lane (mirrors the Avro lane): Boolean→bool, Int→int32,
  * Long→int64, Timestamp→int64 epoch-micros (all varint);
  * Float→fixed32, Double→fixed64; String/Binary→length-delimited.
  *
  * Null convention: proto3 scalars cannot express null — absence IS
  * the default value. This encoder writes every NON-NULL field
  * explicitly (including zero/empty values, which the spec permits)
  * and the decoder maps absent fields to null, so Spark nulls
  * round-trip exactly AND zero values survive. Interop caveat,
  * pinned in the spec test: a standard proto3 encoder elides
  * default-valued fields, which this decoder therefore surfaces as
  * null — the same semantic a nullable Avro union gives that lane.
  * Unknown field numbers are skipped per the spec, so payloads with
  * schema-evolved extra fields still decode.
  */
object ProtoWire {

  private final val WireVarint = 0
  private final val WireFixed64 = 1
  private final val WireLenDelim = 2
  private final val WireFixed32 = 5

  private def wireTypeOf(dt: DataType): Int = dt match {
    case BooleanType | IntegerType | LongType | TimestampType => WireVarint
    case FloatType => WireFixed32
    case DoubleType => WireFixed64
    case StringType | BinaryType => WireLenDelim
    case other =>
      throw new IllegalArgumentException(s"unsupported proto lane type: $other")
  }

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7FL) | 0x80L).toInt); v >>>= 7
    }
    out.write(v.toInt & 0x7F)
  }

  private def writeKey(out: ByteArrayOutputStream, field: Int,
                       wt: Int): Unit =
    writeVarint(out, ((field.toLong << 3) | wt.toLong))

  private def writeFixed(out: ByteArrayOutputStream, v: Long,
                         bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Serialize every column of `df` into one proto3-binary `value`
    * column (the Kafka record payload shape).
    */
  def encode(df: DataFrame): DataFrame = {
    val schema = df.schema
    val lanes = schema.fields.map(f => wireTypeOf(f.dataType)) // validate
    df.mapPartitions { rows =>
      val bos = new ByteArrayOutputStream()
      rows.map { row =>
        bos.reset()
        var i = 0
        while (i < schema.length) {
          if (!row.isNullAt(i)) {
            val field = i + 1
            schema.fields(i).dataType match {
              case BooleanType =>
                writeKey(bos, field, WireVarint)
                writeVarint(bos, if (row.getBoolean(i)) 1L else 0L)
              case IntegerType =>
                writeKey(bos, field, WireVarint)
                writeVarint(bos, row.getInt(i).toLong) // sign-extended, per spec
              case LongType =>
                writeKey(bos, field, WireVarint)
                writeVarint(bos, row.getLong(i))
              case TimestampType =>
                writeKey(bos, field, WireVarint)
                writeVarint(bos, micros(row.getAs[java.sql.Timestamp](i)))
              case FloatType =>
                writeKey(bos, field, WireFixed32)
                writeFixed(bos,
                  java.lang.Float.floatToIntBits(row.getFloat(i)).toLong & 0xFFFFFFFFL, 4)
              case DoubleType =>
                writeKey(bos, field, WireFixed64)
                writeFixed(bos,
                  java.lang.Double.doubleToLongBits(row.getDouble(i)), 8)
              case StringType =>
                val b = row.getString(i).getBytes("UTF-8")
                writeKey(bos, field, WireLenDelim)
                writeVarint(bos, b.length.toLong); bos.write(b, 0, b.length)
              case BinaryType =>
                val b = row.getAs[Array[Byte]](i)
                writeKey(bos, field, WireLenDelim)
                writeVarint(bos, b.length.toLong); bos.write(b, 0, b.length)
              case other => throw new IllegalStateException(other.toString)
            }
          }
          i += 1
        }
        bos.toByteArray
      }
    }(Encoders.BINARY).toDF("value")
  }

  /** Deserialize a `value` binary column back into typed columns.
    * Absent fields decode as null; unknown field numbers are skipped
    * per the spec (forward compatibility with evolved writers).
    */
  def decode(df: DataFrame, schema: StructType): DataFrame = {
    schema.fields.foreach(f => wireTypeOf(f.dataType)) // validate lane
    val out = df.select("value").mapPartitions { rows =>
      val fields = schema.fields
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](0)
        var pos = 0
        def readVarint(): Long = {
          var shift = 0; var v = 0L
          var b = 0
          do {
            b = bytes(pos) & 0xFF; pos += 1
            v |= (b & 0x7FL) << shift; shift += 7
          } while ((b & 0x80) != 0)
          v
        }
        def readFixed(n: Int): Long = {
          var v = 0L; var i = 0
          while (i < n) { v |= (bytes(pos + i).toLong & 0xFF) << (8 * i); i += 1 }
          pos += n
          v
        }
        val vals = new Array[Any](fields.length)
        while (pos < bytes.length) {
          val key = readVarint()
          val field = (key >>> 3).toInt
          val wt = (key & 7L).toInt
          val idx = field - 1
          if (idx >= 0 && idx < fields.length &&
              wireTypeOf(fields(idx).dataType) == wt) {
            vals(idx) = fields(idx).dataType match {
              case BooleanType => readVarint() != 0L
              case IntegerType => readVarint().toInt
              case LongType => readVarint()
              case TimestampType =>
                val m = readVarint()
                java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                  Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L))
              case FloatType =>
                java.lang.Float.intBitsToFloat(readFixed(4).toInt)
              case DoubleType =>
                java.lang.Double.longBitsToDouble(readFixed(8))
              case StringType =>
                val n = readVarint().toInt
                val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
              case BinaryType =>
                val n = readVarint().toInt
                val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
                pos += n; a
              case other => throw new IllegalStateException(other.toString)
            }
          } else wt match { // unknown/mistyped field: skip per spec
            case WireVarint => readVarint()
            case WireFixed64 => readFixed(8)
            case WireFixed32 => readFixed(4)
            case WireLenDelim => val n = readVarint().toInt; pos += n
            case other =>
              throw new IllegalArgumentException(s"bad wire type $other")
          }
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(Encoders.row(schema))
    out
  }
}
