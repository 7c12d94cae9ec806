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
  * the payload; a Spark schema maps to field numbers 1..n in
  * declaration order, recursively for nested messages.
  *
  * Type lane (mirrors the Avro lane): Boolean→bool, Int→int32,
  * Long→int64, Timestamp→int64 epoch-micros (all varint);
  * Float→fixed32, Double→fixed64; String/Binary→length-delimited;
  * Struct→embedded message (length-delimited, its fields numbered
  * 1..k in their own declaration order); Array→repeated field —
  * numeric/bool/timestamp elements are PACKED (one length-delimited
  * record of concatenated scalars, the proto3 default; the decoder
  * also accepts the unpacked spelling per the spec), string/binary/
  * struct elements are emitted as one length-delimited record per
  * element under the same field number. Arrays of arrays have no
  * field number for the inner dimension in proto (the spec requires a
  * wrapper message) and are rejected at validation.
  *
  * Null convention: proto3 scalars cannot express null — absence IS
  * the default value. This encoder writes every NON-NULL field
  * explicitly (including zero/empty values, which the spec permits)
  * and the decoder maps absent fields to null, so Spark nulls
  * round-trip exactly AND zero values survive. Interop caveat,
  * pinned in the spec test: a standard proto3 encoder elides
  * default-valued fields, which this decoder therefore surfaces as
  * null — the same semantic a nullable Avro union gives that lane.
  * The repeated lane inherits the convention: an empty PACKED array
  * round-trips (zero-length packed record), an empty repeated
  * string/binary/struct array has no wire representation and decodes
  * as null (pinned in the spec test); null ELEMENTS have no proto
  * spelling at all and are rejected with a descriptive error.
  * Unknown field numbers are skipped per the spec, so payloads with
  * schema-evolved extra fields still decode.
  *
  * Malformed payloads fail fast with a descriptive error instead of
  * silently mis-decoding: varints are capped at the spec's 10 bytes,
  * and every length-delimited read, fixed-width read, and unknown-
  * field skip validates its bounds against the buffer end.
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
    case st: StructType =>
      st.fields.foreach(f => wireTypeOf(f.dataType)) // validate recursively
      WireLenDelim
    case ArrayType(et, _) => et match {
      case _: ArrayType =>
        throw new IllegalArgumentException(
          "repeated repeated has no proto spelling; wrap the inner array in a struct")
      case _ => wireTypeOf(et); WireLenDelim
    }
    case other =>
      throw new IllegalArgumentException(s"unsupported proto lane type: $other")
  }

  /** Is this element type packed on the wire (proto3 default for
    * scalars)? Length-delimited elements (string/binary/struct) never
    * pack — each element is its own record under the field number.
    */
  private def isPacked(et: DataType): Boolean =
    wireTypeOf(et) != WireLenDelim

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

  /** One scalar VALUE (no key) — the packed-element and varint/fixed
    * field payload writer. `v` arrives as the boxed external type a
    * generic Row getter yields.
    */
  private def writeScalarValue(out: ByteArrayOutputStream, dt: DataType,
                               v: Any): Unit = dt match {
    case BooleanType =>
      writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
    case IntegerType =>
      writeVarint(out, v.asInstanceOf[Int].toLong) // sign-extended, per spec
    case LongType => writeVarint(out, v.asInstanceOf[Long])
    case TimestampType =>
      writeVarint(out, micros(v.asInstanceOf[java.sql.Timestamp]))
    case FloatType =>
      writeFixed(out,
        java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xFFFFFFFFL, 4)
    case DoubleType =>
      writeFixed(out,
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
    case other => throw new IllegalStateException(other.toString)
  }

  /** One length-delimited VALUE (key + length + payload) for
    * string/binary/struct — shared by plain fields and repeated
    * elements.
    */
  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
                            dt: DataType, v: Any): Unit = dt match {
    case StringType =>
      val b = v.asInstanceOf[String].getBytes("UTF-8")
      writeKey(out, field, WireLenDelim)
      writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
    case BinaryType =>
      val b = v.asInstanceOf[Array[Byte]]
      writeKey(out, field, WireLenDelim)
      writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
    case st: StructType =>
      val sub = new ByteArrayOutputStream()
      writeMessage(sub, v.asInstanceOf[Row], st)
      writeKey(out, field, WireLenDelim)
      writeVarint(out, sub.size().toLong); sub.writeTo(out)
    case other => throw new IllegalStateException(other.toString)
  }

  /** Encode one row's fields (numbered 1..n) into `out` — recursive
    * through struct fields via [[writeLenDelim]].
    */
  private def writeMessage(out: ByteArrayOutputStream, row: Row,
                           schema: StructType): Unit = {
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val field = i + 1
        schema.fields(i).dataType match {
          case ArrayType(et, _) =>
            val elems = row.getSeq[Any](i)
            if (elems.exists(_ == null))
              throw new IllegalArgumentException(
                s"null element in repeated field '${schema.fields(i).name}' has no proto spelling")
            if (isPacked(et)) {
              // packed: one len-delim record of concatenated scalars;
              // empty packs as a zero-length record so [] round-trips
              val packed = new ByteArrayOutputStream()
              elems.foreach(e => writeScalarValue(packed, et, e))
              writeKey(out, field, WireLenDelim)
              writeVarint(out, packed.size().toLong); packed.writeTo(out)
            } else {
              elems.foreach(e => writeLenDelim(out, field, et, e))
            }
          case dt @ (StringType | BinaryType | _: StructType) =>
            writeLenDelim(out, field, dt, row.get(i))
          case dt =>
            writeKey(out, field, wireTypeOf(dt))
            writeScalarValue(out, dt, row.get(i))
        }
      }
      i += 1
    }
  }

  /** Serialize every column of `df` into one proto3-binary `value`
    * column (the Kafka record payload shape).
    */
  def encode(df: DataFrame): DataFrame = {
    val schema = df.schema
    schema.fields.foreach(f => wireTypeOf(f.dataType)) // validate lane
    df.mapPartitions { rows =>
      val bos = new ByteArrayOutputStream()
      rows.map { row =>
        bos.reset()
        writeMessage(bos, row, schema)
        bos.toByteArray
      }
    }(Encoders.BINARY).toDF("value")
  }

  /** Decode the message in `bytes[start, end)` against `schema` —
    * recursive through embedded messages. All reads are bounds-checked
    * against `end`; malformed input throws IllegalArgumentException.
    */
  private def readMessage(bytes: Array[Byte], start: Int, end: Int,
                          schema: StructType): Row = {
    val fields = schema.fields
    var pos = start
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"malformed proto payload at byte $pos: $msg")
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var b = 0; var n = 0
      do {
        if (pos >= end) fail("varint runs past buffer end")
        if (n == 10) fail("varint longer than the spec's 10-byte cap")
        b = bytes(pos) & 0xFF; pos += 1; n += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def readFixed(n: Int): Long = {
      if (pos + n > end) fail(s"fixed$n runs past buffer end")
      var v = 0L; var i = 0
      while (i < n) { v |= (bytes(pos + i).toLong & 0xFF) << (8 * i); i += 1 }
      pos += n
      v
    }
    def readLen(): Int = {
      val n = readVarint()
      if (n < 0 || n > end - pos) fail(s"length $n exceeds remaining buffer")
      n.toInt
    }
    def readScalar(dt: DataType): Any = dt match {
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
        val n = readLen()
        val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
      case BinaryType =>
        val n = readLen()
        val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
        pos += n; a
      case st: StructType =>
        val n = readLen()
        val r = readMessage(bytes, pos, pos + n, st); pos += n; r
      case other => throw new IllegalStateException(other.toString)
    }
    def skip(wt: Int): Unit = wt match { // unknown/mistyped field, per spec
      case WireVarint => readVarint(); ()
      case WireFixed64 => readFixed(8); ()
      case WireFixed32 => readFixed(4); ()
      case WireLenDelim => val n = readLen(); pos += n
      case other => fail(s"bad wire type $other")
    }
    val vals = new Array[Any](fields.length)
    while (pos < end) {
      val key = readVarint()
      val field = (key >>> 3).toInt
      val wt = (key & 7L).toInt
      val idx = field - 1
      if (idx >= 0 && idx < fields.length) fields(idx).dataType match {
        case ArrayType(et, _) =>
          val buf = vals(idx) match {
            case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] => b
            case _ =>
              val b = scala.collection.mutable.ArrayBuffer.empty[Any]
              vals(idx) = b; b
          }
          val ewt = wireTypeOf(et)
          if (wt == WireLenDelim && isPacked(et)) {
            // packed record: concatenated scalars, must land exactly
            // on the declared boundary
            val n = readLen()
            val stop = pos + n
            while (pos < stop) buf += readScalar(et)
            if (pos != stop) fail("packed element overruns its record")
          } else if (wt == ewt) {
            buf += readScalar(et) // unpacked scalar / len-delim element
          } else skip(wt)
        case dt if wireTypeOf(dt) == wt => vals(idx) = readScalar(dt)
        case _ => skip(wt)
      } else skip(wt)
    }
    var i = 0
    while (i < vals.length) {
      vals(i) = vals(i) match {
        case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] => b.toSeq
        case v => v
      }
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** Deserialize a `value` binary column back into typed columns.
    * Absent fields decode as null; unknown field numbers are skipped
    * per the spec (forward compatibility with evolved writers);
    * malformed payloads throw with the offending byte offset.
    */
  def decode(df: DataFrame, schema: StructType): DataFrame = {
    schema.fields.foreach(f => wireTypeOf(f.dataType)) // validate lane
    df.select("value").mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](0)
        readMessage(bytes, 0, bytes.length, schema)
      }
    }(Encoders.row(schema))
  }
}
