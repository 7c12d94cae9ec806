package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Merge, Quality}

class QualityMergeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("quality rules count violations and flag failures") {
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 0.0)).toDF("id", "v")
    val out = Quality.check(df, Seq(
        "v_positive" -> (col("v") > 0.0),
        "id_present" -> col("id").isNotNull))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(out("v_positive") == ((3L, 2L, false)))
    assert(out("id_present") == ((3L, 0L, true)))
  }

  test("fk orphan check finds dangling children only") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 99L)).toDF("id", "fk")
    val r = Quality.fkOrphans(child, "fk", parent, "pk", "fk_test").head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && !r.getBoolean(4))
  }

  test("merge upsert: updates win, inserts appear, untouched rows survive") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "bal")
    val updates = Seq((2L, "b2", 25.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val out = Merge.upsert(base, updates, "k").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out(1L) == (("a", 10.0)))   // untouched
    assert(out(2L) == (("b2", 25.0))) // updated
    assert(out(3L) == (("c", 30.0)))  // inserted
    assert(out.size == 3)
  }

  test("scd2: changelog becomes half-open version intervals; one current row per key") {
    val chg = Seq(
      (1L, 101L, 10.0, 100L), (1L, 102L, 12.0, 200L), (1L, 103L, 11.0, 300L),
      (2L, 201L, 50.0, 150L),
      (3L, 301L, 7.0, 100L), (3L, 302L, 8.0, 100L)) // same-ts: tiebreak orders
      .toDF("k", "ver", "val", "ts")
    val out = Merge.scd2(chg, key = "k", ts = "ts", tiebreak = "ver")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getBoolean(6)))
      .sortBy(t => (t._1, t._3, t._2)).toSeq
    assert(out == Seq(
      (1L, 101L, 100L, Some(200L), false),
      (1L, 102L, 200L, Some(300L), false),
      (1L, 103L, 300L, None, true),
      (2L, 201L, 150L, None, true),
      (3L, 301L, 100L, Some(100L), false), // tiebreak: 301 precedes 302
      (3L, 302L, 100L, None, true)))
    // exactly one open (current) version per key
    assert(out.count(_._5) == 3)
  }

  test("record linkage: dirty copies score as matches; near-name strangers stay possible") {
    import graft.operators.Dedup
    val recs = Seq(
      (1L, "Customer#001", 10, 100.0, "AUTO"),
      (2L, "Customer#002", 10, 900.0, "AUTO"),  // name ~1 edit from #001, far balance
      (3L, "Shopperx#900", 10, 100.0, "AUTO"),  // name far, same balance → score 0, dropped
      (1000001L, "Customer#00x", 10, 100.25, "AUTO"), // dirty copy of 1
      (4L, "Customer#004", 20, 100.0, "AUTO"))  // other block: never paired
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Dedup.recordLinkage(recs, id = "c_custkey", name = "c_name",
        numeric = "c_acctbal", blocks = Seq("c_nationkey", "c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(4), r.getString(5))).toMap
    assert(out((1L, 1000001L)) == ((6, "match")), s"dirty copy must link: $out")
    assert(out((1L, 2L)) == ((3, "possible")), "near name + far balance")
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "below-threshold pairs must not surface")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "blocking must prevent cross-block pairs")
  }

  test("column stats: counts, nulls, distincts, min/max per column in one pass") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a")), (None, Some("a")))
      .toDF("k", "s")
    val out = Quality.columnStats(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)
    val k = out("k")
    assert(k.getLong(1) == 4L && k.getLong(2) == 1L && k.getLong(3) == 2L &&
      k.getString(4) == "1" && k.getString(5) == "3")
    val s = out("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L &&
      s.getString(4) == "a" && s.getString(5) == "b")
    // approx mode keeps the same shape (HLL NDV within its rsd on
    // tiny exact inputs)
    val approx = Quality.columnStats(df, Seq("k", "s"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx("k") == 2L && approx("s") == 2L)
  }
}
