package graft.sources.log

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** On-disk layout + record codec for the graft log — a partitioned,
  * offset-addressable, append-only record log with Kafka's data model
  * (reference: the `payment-transactions` / `fraud-alerts` topics,
  * FraudDetectionJob.java:141-157,162-213), built so the S1/S5 path is
  * executable in-sandbox through the same Spark DSv2 API surface the
  * Kafka connector implements.
  *
  * Layout under a log root directory:
  * {{{
  *   _meta.json                          {"partitions": N}
  *   p=0/<base20>_<count10>.seg          segment: records [base, base+count)
  *   p=1/...
  *   _epochs/<queryId>/<epoch>.manifest  streaming-commit WAL (rename plan)
  *   _epochs/<queryId>/<epoch>.commit    epoch durably applied marker
  *   _tmp/<uuid>.seg                     uncommitted task output
  * }}}
  *
  * Offsets are per-partition record indexes, dense from 0 — a segment
  * file's name carries (baseOffset, recordCount), so the log end offset
  * of a partition is a directory listing, never a data scan. Record
  * framing inside a segment: magic "GL1\n", then per record
  * [klen:int][key][vlen:int][value][ts:long micros]; klen == -1 encodes
  * a null key (Kafka's tombstone-capable key lane).
  *
  * Scale notes: the format is local-fs here, but every operation the
  * planner needs is O(#segments) metadata (list + name parse); readers
  * stream one segment at a time (no whole-partition buffering); and all
  * offset arithmetic lives on the driver exactly as the Kafka source's
  * offset bookkeeping does.
  */
object GraftLogFormat {

  val Magic: Array[Byte] = "GL1\n".getBytes(StandardCharsets.UTF_8)
  val MetaFile = "_meta.json"
  val TmpDir = "_tmp"
  val EpochDir = "_epochs"

  final case class Record(key: Array[Byte], value: Array[Byte], tsMicros: Long)

  // ---- meta -------------------------------------------------------------

  /** Create the log root + meta if absent; return partition count. */
  def ensureMeta(dir: String, partitions: Int): Int = synchronized {
    val meta = new File(dir, MetaFile)
    if (meta.exists()) readPartitions(dir)
    else {
      new File(dir).mkdirs()
      new File(dir, TmpDir).mkdirs()
      val tmp = new File(dir, MetaFile + ".tmp")
      Files.write(tmp.toPath,
        s"""{"partitions": $partitions, "version": 1}""".getBytes(StandardCharsets.UTF_8))
      Files.move(tmp.toPath, meta.toPath, StandardCopyOption.ATOMIC_MOVE)
      (0 until partitions).foreach(p => new File(dir, s"p=$p").mkdirs())
      partitions
    }
  }

  /** Partition count, or 0 if the log does not exist yet. */
  def readPartitions(dir: String): Int = {
    val meta = new File(dir, MetaFile)
    if (!meta.exists()) 0
    else {
      val s = new String(Files.readAllBytes(meta.toPath), StandardCharsets.UTF_8)
      val m = """"partitions"\s*:\s*(\d+)""".r
      m.findFirstMatchIn(s) match {
        case Some(g) => g.group(1).toInt
        case None => throw new IllegalStateException(s"malformed $MetaFile in $dir: $s")
      }
    }
  }

  // ---- segments ---------------------------------------------------------

  final case class Segment(file: File, base: Long, count: Long) {
    def end: Long = base + count
  }

  private val SegName = """(\d{20})_(\d{10})\.seg""".r

  def segmentName(base: Long, count: Long): String = f"$base%020d_$count%010d.seg"

  /** Segments of one partition, sorted by base offset. */
  def segments(dir: String, partition: Int): Seq[Segment] = {
    val d = new File(dir, s"p=$partition")
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toIndexedSeq.flatMap { f =>
      f.getName match {
        case SegName(b, c) => Some(Segment(f, b.toLong, c.toLong))
        case _ => None
      }
    }.sortBy(_.base)
  }

  /** End offset (== next offset to be assigned) of one partition. */
  def endOffset(dir: String, partition: Int): Long =
    segments(dir, partition).lastOption.map(_.end).getOrElse(0L)

  /** End offsets for every partition of the log. */
  def endOffsets(dir: String): Map[Int, Long] = {
    val n = readPartitions(dir)
    (0 until n).map(p => p -> endOffset(dir, p)).toMap
  }

  // ---- record codec -----------------------------------------------------

  /** Streaming writer for one segment file (tmp path; renamed on commit). */
  final class SegmentWriter(path: File) {
    private val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(path), 1 << 16))
    out.write(Magic)
    private var n = 0L
    def append(key: Array[Byte], value: Array[Byte], tsMicros: Long): Unit = {
      if (key == null) out.writeInt(-1)
      else { out.writeInt(key.length); out.write(key) }
      out.writeInt(value.length); out.write(value)
      out.writeLong(tsMicros)
      n += 1
    }
    def count: Long = n
    def close(): Unit = { out.flush(); out.close() }
  }

  /** Iterator over one segment's records. Streams; closes on exhaustion. */
  def readSegment(seg: Segment): Iterator[Record] = new Iterator[Record] {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(seg.file), 1 << 16))
    locally {
      val m = new Array[Byte](Magic.length)
      in.readFully(m)
      if (!java.util.Arrays.equals(m, Magic))
        throw new IllegalStateException(s"bad magic in segment ${seg.file}")
    }
    private var read = 0L
    private var closed = false
    override def hasNext: Boolean = {
      val h = read < seg.count
      if (!h && !closed) { in.close(); closed = true }
      h
    }
    override def next(): Record = {
      if (!hasNext) throw new NoSuchElementException
      try {
        val klen = in.readInt()
        val key = if (klen < 0) null else { val a = new Array[Byte](klen); in.readFully(a); a }
        val vlen = in.readInt()
        val value = { val a = new Array[Byte](vlen); in.readFully(a); a }
        val ts = in.readLong()
        read += 1
        Record(key, value, ts)
      } catch {
        case _: EOFException =>
          in.close(); closed = true
          throw new IllegalStateException(
            s"segment ${seg.file} truncated: name promises ${seg.count} records, hit EOF at $read")
      }
    }
  }

  /** Records of one partition in [from, until), streamed segment by
    * segment with whole-segment skip via the (base, count) file names.
    * Returns (offset, record) pairs.
    */
  def readRange(dir: String, partition: Int, from: Long, until: Long): Iterator[(Long, Record)] =
    segments(dir, partition).iterator
      .filter(s => s.end > from && s.base < until)
      .flatMap { s =>
        readSegment(s).zipWithIndex.collect {
          case (r, i) if s.base + i >= from && s.base + i < until => (s.base + i, r)
        }
      }

  // ---- tmp + rename -----------------------------------------------------

  def newTmpFile(dir: String): File = {
    val t = new File(dir, TmpDir)
    t.mkdirs()
    new File(t, java.util.UUID.randomUUID().toString + ".seg")
  }

  /** Atomically publish a tmp segment as partition p's [base, base+count). */
  def publish(dir: String, tmp: File, p: Int, base: Long, count: Long): File = {
    val pd = new File(dir, s"p=$p")
    pd.mkdirs()
    val dst = new File(pd, segmentName(base, count))
    Files.move(tmp.toPath, dst.toPath, StandardCopyOption.ATOMIC_MOVE)
    dst
  }
}
