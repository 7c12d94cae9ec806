package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.{BucketedMediaStore, StreamImageDedup, StreamVideoDedup}

/** The bucketed-table face of the media fingerprint index: parity
  * with the in-memory stream faces for all THREE modalities (image,
  * video, audio), the at-scale plan shape (bucket-pruned standing
  * scan, broadcast batch, no corpus shuffle), and the decode-once
  * contract (the probe plan reads the parquet table — it contains no
  * media decode of the standing corpus).
  */
class MediaStoreSpec extends AnyFunSuite {
  import TestSpark._

  private val nBuckets = 16

  test("image probe parity: bucketed store matches the in-memory " +
       "band index row-for-row, across two appends") {
    val all = Multimodal.imagesFromIds(
      spark.range(40).select(col("id").as("vec_id")))
    val corpus = all.filter(_.media_id < 10000000L)
    val arrivals = all.filter(_.media_id >= 10000000L)
      .union(Multimodal.imagesFromIds(
          spark.range(100, 105).select(col("id").as("vec_id")))
        .filter(_.media_id < 10000000L))
    val store = new BucketedMediaStore(spark, "ms_img", nBuckets)
    store.init()
    try {
      // two appends: the standing table accretes, nothing rewrites
      store.append(corpus.filter(_.media_id < 20L))
      store.append(corpus.filter(_.media_id >= 20L))
      val got = store.probeImages(arrivals).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val mem = StreamImageDedup.imageDedupStream(
          arrivals, StreamImageDedup.bandIndex(corpus)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == mem,
        s"missed=${(mem -- got).take(3)} extra=${(got -- mem).take(3)}")
      // planted one-cell-perturbed copies all found within 2 bits
      for (id <- 0L until 40L if id % 4 == 0)
        assert(got.exists(p => p._1 == id + 10000000L && p._2 == id &&
          p._3 <= 2), s"arrival for base $id not matched")
    } finally store.drop()
  }

  test("video probe parity: persisted frame fingerprints reproduce " +
       "the streaming twin's matches and the shared roll-up") {
    val all = Multimodal.videosFromIds(
      spark.range(16).select(col("id").as("vec_id")), frames = 3)
    val corpus = all.filter(_.media_id < 10000000L)
    val arrivals = all.filter(_.media_id >= 10000000L)
    val store = new BucketedMediaStore(spark, "ms_vid", nBuckets)
    store.init()
    try {
      store.append(corpus)
      val frames = store.probeVideoFrames(arrivals)
      val got = frames.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
          r.getInt(4))).toSet
      val mem = StreamVideoDedup.videoFrameMatches(
          arrivals, StreamVideoDedup.bandIndex(corpus)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
          r.getInt(4))).toSet
      assert(got == mem,
        s"missed=${(mem -- got).take(3)} extra=${(got -- mem).take(3)}")
      // the shared roll-up produces the batch operator's video pairs
      val rolled = StreamVideoDedup.rollupArrivals(frames)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      for (id <- 0L until 16L if id % 4 == 0)
        assert(rolled.contains((id, id + 10000000L, 3L)),
          s"copy of video $id not rolled up: $rolled")
    } finally store.drop()
  }

  test("mixed-modality table: one media table serves both probes " +
       "without cross-modal leakage") {
    // an image whose dHash equals a video frame's must NOT pair
    // across kinds through the kind-filtered probes (one table, two
    // modality namespaces)
    val imgs = Multimodal.imagesFromIds(
        spark.range(8).select(col("id").as("vec_id")))
      .filter(_.media_id < 10000000L)
    val vids = Multimodal.videosFromIds(
        spark.range(8).select(col("id").as("vec_id")), frames = 3)
      .filter(_.media_id < 10000000L)
    val store = new BucketedMediaStore(spark, "ms_mix", nBuckets)
    store.init()
    try {
      store.append(imgs.union(vids))
      val imgHits = store.probeImages(imgs).collect()
      // probing the corpus against itself: self-pairs excluded, and
      // every hit is an image id (no video-frame rows leak through)
      assert(imgHits.forall(r => r.getLong(0) != r.getLong(1)))
      val vidHits = store.probeVideoFrames(vids).collect()
      assert(vidHits.forall(r => r.getLong(0) != r.getLong(2)))
    } finally store.drop()
  }

  test("probe plan: bucket-pruned standing scan, broadcast batch, " +
       "no corpus shuffle, no corpus decode in the plan") {
    val corpus = Multimodal.imagesFromIds(
        spark.range(60).select(col("id").as("vec_id")))
      .filter(_.media_id < 10000000L)
    val store = new BucketedMediaStore(spark, "ms_plan", nBuckets)
    store.init()
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      store.append(corpus)
      val oneImage = Multimodal.imagesFromIds(
          spark.range(9001, 9002).select(col("id").as("vec_id")))
        .filter(_.media_id < 10000000L)
      val probe = store.probeImages(oneImage)
      probe.collect()
      val plan = probe.queryExecution.executedPlan
      val scan = plan.collectLeaves().map(_.toString)
        .find(_.contains(store.table))
        .getOrElse(fail(s"no scan of ${store.table} in:\n$plan"))
      // one image has 28 band keys -> at most 16-of-16 in the worst
      // case but typically fewer; require genuine pruning headroom by
      // checking the mechanism is active (SelectedBucketsCount pinned)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(scan)
        .getOrElse(fail(s"no bucket pruning in scan:\n$scan"))
      assert(sel.group(2).toInt == nBuckets)
      assert(sel.group(1).toInt < nBuckets,
        s"expected <$nBuckets buckets read, got ${sel.group(1)}")
      val p = plan.toString
      assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"standing index must not shuffle:\n$p")
      // decode-once: the STANDING side of the join is a pure parquet
      // scan — zero object-decode stages (MapPartitions /
      // DeserializeToObject live only under the batch's broadcast
      // build side, where the one decode the probe must pay happens)
      val bhj = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }.getOrElse(fail(s"no broadcast join in:\n$p"))
      val standing =
        if (bhj.left.toString.contains(store.table)) bhj.left else bhj.right
      assert(standing.toString.contains(store.table),
        s"neither join side scans ${store.table}:\n$p")
      val decodes = standing.collect {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
        case d: org.apache.spark.sql.execution.DeserializeToObjectExec => d
      }
      assert(decodes.isEmpty,
        s"standing corpus side must not decode media:\n$standing")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      store.drop()
    }
  }

  test("audio probe parity: persisted envelope fingerprints match " +
       "the in-memory sign-band index, decode-free standing side") {
    import graft.streaming.StreamAudioDedup
    val all = Multimodal.syntheticAmWavMedia(spark, 20)
    val corpus = all.filter(_.media_id < 12L)
    val arrivals = all.filter(r =>
      (r.media_id >= 1000L && r.media_id < 1012L) ||
        (r.media_id >= 12L && r.media_id < 1000L))
    val store = new BucketedMediaStore(spark, "ms_audio", nBuckets)
    store.init()
    // AQE off so the executedPlan is directly traversable for the
    // decode-free pin (same convention as the image plan test)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // two appends: the standing table accretes, nothing rewrites
      store.appendAudio(corpus.filter(_.media_id < 6L))
      store.appendAudio(corpus.filter(_.media_id >= 6L))
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))
      val probe = store.probeAudio(arrivals)
      val got = probe.collect().map(key).toSet
      val mem = StreamAudioDedup.audioDedupStream(
          arrivals, StreamAudioDedup.bandIndex(corpus))
        .collect().map(key).toSet
      assert(got == mem,
        s"missed=${(mem -- got).take(3)} extra=${(got -- mem).take(3)}")
      // planted re-gained copies all matched their base
      for (id <- 0L until 12L if id % 4 == 0)
        assert(got.exists(p => p._1 == id + 1000L && p._2 == id),
          s"arrival copy of base $id not matched")
      // decode-once: the standing side of the probe join is a pure
      // parquet scan of the audio table — no object-decode stages
      val plan = probe.queryExecution.executedPlan
      val bhj = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }.getOrElse(fail(s"no broadcast join in:\n$plan"))
      val standing =
        if (bhj.left.toString.contains(store.audioTable)) bhj.left
        else bhj.right
      assert(standing.toString.contains(store.audioTable),
        s"neither join side scans ${store.audioTable}:\n$plan")
      val decodes = standing.collect {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
        case d: org.apache.spark.sql.execution.DeserializeToObjectExec => d
      }
      assert(decodes.isEmpty,
        s"standing corpus side must not decode media:\n$standing")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      store.drop()
    }
  }

  test("consolidate compacts to one file per non-empty bucket and " +
       "preserves probe results") {
    val corpus = Multimodal.imagesFromIds(
        spark.range(24).select(col("id").as("vec_id")))
      .filter(_.media_id < 10000000L)
    val arrivals = Multimodal.imagesFromIds(
        spark.range(24).select(col("id").as("vec_id")))
      .filter(_.media_id >= 10000000L)
    val store = new BucketedMediaStore(spark, "ms_compact", nBuckets)
    store.init()
    try {
      (0 until 3).foreach(b =>
        store.append(corpus.filter(_.media_id % 3 == b)))
      val before = store.probeImages(arrivals).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val filesBefore = spark.table(store.table).inputFiles.length
      store.consolidate()
      val filesAfter = spark.table(store.table).inputFiles.length
      assert(filesAfter <= nBuckets && filesAfter < filesBefore,
        s"$filesBefore -> $filesAfter")
      val after = store.probeImages(arrivals).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(after == before)
    } finally store.drop()
  }
}
