package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-registry dispatch over the wire codecs — the catalog piece
  * of the reference's serialization story (`config/JobConfig.java:17`
  * wires a schema-registry URL; registries serve JSON, Avro, and
  * Protobuf schemas per topic). Producers and consumers register a
  * (format, schema) pair per topic ONCE and route payloads through
  * [[Registry.encode]]/[[Registry.decode]] by topic name, instead of
  * hard-wiring a codec at every call site — the property that lets a
  * topic migrate formats (JSON → Avro → Proto) without touching its
  * producers' call sites.
  *
  * The three lanes share one contract, pinned in SourceFormatsSpec:
  * `value: binary` payload column out of encode, the registered
  * schema's typed columns out of decode, Spark nulls round-tripping
  * exactly ([[AvroWire]] via the nullable union, [[ProtoWire]] via
  * field absence, JSON via key absence — `to_json` elides null keys
  * and `from_json` restores them as null).
  *
  * Registration validates the schema against the target lane eagerly
  * (Proto rejects e.g. nested arrays at REGISTER time, not first
  * encode), and encode validates the frame's schema against the
  * registered one, so a drifting producer fails fast with the topic
  * name in the error instead of writing undecodable bytes.
  */
object WireRegistry {

  sealed trait Format
  case object Json extends Format
  case object Avro extends Format
  case object Proto extends Format

  final case class Entry(format: Format, schema: StructType)

  final class Registry {
    private val entries =
      new java.util.concurrent.ConcurrentHashMap[String, Entry]()

    def register(topic: String, format: Format,
                 schema: StructType): Unit = {
      format match {
        case Proto =>
          schema.fields.foreach(f => ProtoWireLane.validate(f.dataType))
        case _ => ()
      }
      entries.put(topic, Entry(format, schema))
    }

    def entryOf(topic: String): Entry = {
      val e = entries.get(topic)
      if (e == null)
        throw new IllegalArgumentException(
          s"topic '$topic' is not registered; register(topic, format, schema) first")
      e
    }

    /** Serialize `df` (which must match the registered schema) into a
      * one-column `value: binary` payload frame via the topic's lane.
      */
    def encode(df: DataFrame, topic: String): DataFrame = {
      val e = entryOf(topic)
      val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val want = e.schema.fields.map(f => (f.name, f.dataType)).toSeq
      if (got != want)
        throw new IllegalArgumentException(
          s"frame schema ${got.mkString(",")} does not match topic '$topic' " +
            s"registration ${want.mkString(",")}")
      e.format match {
        case Json =>
          df.select(to_json(struct(e.schema.fieldNames.map(col).toSeq: _*))
            .cast("binary").as("value"))
        case Avro => AvroWire.encode(df)
        case Proto => ProtoWire.encode(df)
      }
    }

    /** Decode a `value: binary` payload frame back into the topic's
      * registered typed columns.
      */
    def decode(df: DataFrame, topic: String): DataFrame = {
      val e = entryOf(topic)
      e.format match {
        case Json =>
          df.select(from_json(col("value").cast("string"), e.schema)
            .as("r")).select("r.*")
        case Avro => AvroWire.decode(df, e.schema)
        case Proto => ProtoWire.decode(df, e.schema)
      }
    }
  }
}

/** Cheap re-statement of ProtoWire's lane rules for eager
  * registration-time validation (ProtoWire itself re-validates on
  * every encode/decode — this exists so an illegal registration
  * fails at register time with no frame in hand).
  */
private[sources] object ProtoWireLane {
  import org.apache.spark.sql.types._
  def validate(dt: DataType): Unit = dt match {
    case BooleanType | IntegerType | LongType | TimestampType |
         FloatType | DoubleType | StringType | BinaryType => ()
    case st: StructType => st.fields.foreach(f => validate(f.dataType))
    case ArrayType(_: ArrayType, _) =>
      throw new IllegalArgumentException(
        "repeated repeated has no proto spelling; wrap the inner array in a struct")
    case ArrayType(et, _) => validate(et)
    case other =>
      throw new IllegalArgumentException(s"unsupported proto lane type: $other")
  }
}
