package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{BoundedLevenshtein, Lev}

/** Parity pins for the bounded-Levenshtein kernel: the built-in
  * `levenshtein(l, r, k)` is the semantic reference; Lev.bounded must
  * equal it on every input — ASCII (the fast path), non-ASCII (the
  * delegation path), boundary thresholds, and through the Expression's
  * codegen path on a real DataFrame.
  */
class EditDistanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ref(a: String, b: String, k: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), k)

  private def ours(a: String, b: String, k: Int): Int =
    Lev.bounded(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("kernel equals the built-in on random ASCII strings, all thresholds") {
    val genStr = for {
      n <- Gen.choose(0, 24)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'd') ++ Seq('#', '0', '1')))
    } yield cs.mkString
    val p = Prop.forAll(genStr, genStr, Gen.choose(0, 8)) { (a, b, k) =>
      ours(a, b, k) == ref(a, b, k)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(res.passed, res.status.toString)
  }

  test("kernel equals the built-in on non-ASCII input (delegation path)") {
    val genStr = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "é", "ß", "中", "🎉"))
    } yield cs.mkString
    val p = Prop.forAll(genStr, genStr, Gen.choose(0, 6)) { (a, b, k) =>
      ours(a, b, k) == ref(a, b, k)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), p)
    assert(res.passed, res.status.toString)
  }

  test("edge cases: empties, equals, prefix/suffix overlaps, threshold walls") {
    val cases = Seq(
      ("", "", 0), ("", "", 3), ("", "abc", 2), ("", "abc", 3),
      ("abc", "abc", 0), ("aa", "aaa", 0), ("aa", "aaa", 1),
      ("aba", "aa", 1), ("ab", "ba", 1), ("ab", "ba", 2),
      ("Customer#000000001", "Customer#000000002x", 2),
      ("Customer#000000001", "Customer#000000001x", 2),
      ("kitten", "sitting", 2), ("kitten", "sitting", 3),
      ("abcdefgh", "hgfedcba", 8), ("abcdefgh", "hgfedcba", 5))
    for ((a, b, k) <- cases)
      assert(ours(a, b, k) == ref(a, b, k), s"($a, $b, $k)")
  }

  test("huge thresholds don't overflow the band math (k near Int.MaxValue)") {
    // regression pin: inf = k+1 and hi = j+k used to wrap negative for
    // k near Int.MaxValue (AIOOBE); the kernel now clamps k to the
    // remaining-window length, where the distance ceiling lives
    for (k <- Seq(Int.MaxValue, Int.MaxValue - 1, 1 << 30);
         (a, b) <- Seq(("kitten", "sitting"), ("", "abc"), ("ab", "ba"),
                       ("abcdefgh", "hgfedcba"), ("same", "same")))
      assert(ours(a, b, k) == ref(a, b, k), s"($a, $b, $k)")
  }

  test("bounded_levenshtein is SQL-callable via GraftExtensions") {
    graft.plans.GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT bounded_levenshtein('kitten', 'sitting', 3) AS d," +
        " bounded_levenshtein('kitten', 'sitting', 2) AS over").head()
    assert(got.getInt(0) == 3 && got.getInt(1) == -1)
  }

  test("Expression matches the built-in through codegen, nulls included") {
    val df = Seq(
      ("kitten", "sitting"), ("same", "same"), ("a", "abcd"),
      (null, "x"), ("x", null), (null, null),
      ("Customer#000000001", "Customer#000000002x"))
      .toDF("a", "b")
    val out = df.select(
      BoundedLevenshtein(col("a"), col("b"), 2).as("ours"),
      levenshtein(col("a"), col("b"), 2).as("ref")).collect()
    for (r <- out)
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getInt(0) == r.getInt(1)), r.toString)
  }
}
