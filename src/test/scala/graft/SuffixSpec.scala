package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.SuffixOps

class SuffixSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("suffix ranks: the banana suffix array, dense and complete") {
    val d = Seq((0L, "banana")).toDF("doc_id", "text")
    val raw = SuffixOps.suffixRanks(spark, d).collect()
    info(raw.map(_.toString).mkString(" | "))
    val got = raw.map(r => r.getLong(1) -> r.getLong(2)).toMap
    // suffixes sorted: a(5) < ana(3) < anana(1) < banana(0) < na(4) < nana(2)
    assert(got == Map(5L -> 1L, 3L -> 2L, 1L -> 3L, 0L -> 4L,
      4L -> 5L, 2L -> 6L))
  }

  test("suffix ranks: equal suffixes across docs share a dense rank") {
    val d = Seq((0L, "ab"), (1L, "ab")).toDF("doc_id", "text")
    val got = SuffixOps.suffixRanks(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // "ab" (x2) < "b" (x2): dense ranks 1,1,2,2
    assert(got == Map((0L, 0L) -> 1L, (1L, 0L) -> 1L,
      (0L, 1L) -> 2L, (1L, 1L) -> 2L))
  }

  test("suffix ranks == brute-force dense rank on a multi-doc fixture") {
    val docs = Seq((0L, "the cat sat on the mat"),
      (1L, "the cat ran"), (2L, "a mat on the floor"), (3L, ""),
      (4L, "zz")).toDF("doc_id", "text")
    val got = SuffixOps.suffixRanks(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force: sort all suffix strings, dense-rank them
    val all = Seq((0L, "the cat sat on the mat"), (1L, "the cat ran"),
      (2L, "a mat on the floor"), (4L, "zz"))
      .flatMap { case (id, t) =>
        (0 until t.length).map(i => (id, i.toLong, t.substring(i)))
      }
    val ranks = all.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val want = all.map { case (id, off, s) => (id, off) -> ranks(s) }.toMap
    assert(got == want)
    assert(!got.keySet.exists(_._1 == 3L)) // empty doc: no positions
  }

  test("longest repeats: SA adjacency finds ana/na in banana") {
    val d = Seq((0L, "banana")).toDF("doc_id", "text")
    val got = SuffixOps.longestRepeats(spark, d, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // adjacent-pair LCPs: (a,ana)=1, (ana,anana)=3, (na,nana)=2
    assert(got == List(("ana", 3L, 1L), ("na", 2L, 1L)))
  }

  test("longest repeats: cross-document span, adjacency across partitions") {
    // the repeated clause appears in three docs -> 2 adjacent pairs at
    // the full clause LCP; repartitioning must not lose boundary pairs
    val clause = "officials declined to comment"
    val docs = Seq(
      (0L, s"early on, $clause today"),
      (1L, s"$clause again"),
      (2L, s"but $clause."),
      (3L, "something entirely different here")
    ).toDF("doc_id", "text").repartition(7)
    val got = SuffixOps.longestRepeats(spark, docs, k = 5).collect()
    assert(got.nonEmpty)
    val top = got.head
    // the top span carries the shared clause (suffixes starting at the
    // space BEFORE it legitimately share one char more)
    assert(top.getString(0).contains(clause),
      s"top span ${top.getString(0)} lacks the planted clause")
    assert(top.getLong(1) >= clause.length)
  }

  test("repeatedSpans: fixed-length exact counts") {
    val docs = Seq(
      (0L, "abcdefghij-REPEATED-SPAN-HERE-xyz"),
      (1L, "zz REPEATED-SPAN-HERE-abcdefghij"),
      (2L, "nothing in common")).toDF("doc_id", "text")
    val got = SuffixOps.repeatedSpans(spark, docs, minLen = 18, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("REPEATED-SPAN-HERE"))
    assert(got("REPEATED-SPAN-HERE") == 2L)
    // every reported span really occurs >= 2 times
    assert(got.values.forall(_ >= 2L))
  }

  test("repeatedSpans: hash-first two-pass == direct span group-by") {
    // r6: the count pass shuffles 16-byte md5 fingerprints and only
    // duplicated span TEXT ever crosses an exchange; this pins the
    // rewritten plan row-for-row against the direct group-by-text form
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "the cat sat on the mat and the cat sat on the hat"),
      (1L, "the cat sat on the mat again said the cat sat on."),
      (2L, "completely unrelated text with no long repeats at all"),
      (3L, "the cat sat on the mat and the cat sat on the hat")
    ).toDF("doc_id", "text")
    val minLen = 12
    val got = SuffixOps.repeatedSpans(spark, docs, minLen, k = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val want = docs
      .select(explode(expr(
        s"""transform(sequence(0, greatest(length(text) - $minLen, 0)),
            i -> substring(text, i + 1, $minLen))""")).as("span"))
      .filter(length(col("span")) >= minLen)
      .groupBy(col("span")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.sameElements(want))
  }

  test("suffixRanks: empty and all-empty-text inputs return empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixOps.suffixRanks(spark, empty).count() == 0L)
    val blank = Seq((0L, ""), (1L, "")).toDF("doc_id", "text")
    assert(SuffixOps.suffixRanks(spark, blank).count() == 0L)
  }

  // r6: the native suffix_lcp kernel (functions/LcpExpression.scala)
  // replaced the O(cap^2) higher-order LCP; these pin its code-point
  // semantics (Spark's substring "character" = code point, NOT Java
  // char) on multi-byte text, kernel-level and end-to-end.
  test("suffix LCP kernel: code-point semantics on multi-byte text") {
    import org.apache.spark.unsafe.types.UTF8String
    // reference: LCP over code-point arrays (what the HOF form computed
    // via substring equality), capped
    def ref(a: String, oa: Int, b: String, ob: Int, cap: Int): Int = {
      val ca = a.codePoints().toArray.drop(oa)
      val cb = b.codePoints().toArray.drop(ob)
      ca.zip(cb).take(cap).takeWhile { case (x, y) => x == y }.length
    }
    // 2-byte (é, ж), 3-byte (世), 4-byte/supplementary (😀, 𝕏) chars
    val cases = Seq(
      ("café 😀 world", 0, "café 😀 würld", 0, 200),
      ("café 😀 world", 5, "x café 😀 world", 7, 200), // same suffix, offsets differ
      ("жжжab", 0, "жжжac", 0, 200),
      ("世界世界世", 0, "世界世界x", 0, 200),
      ("𝕏𝕏𝕏", 0, "𝕏𝕏y", 0, 200),
      ("abc", 0, "abc", 0, 2),      // cap smaller than the match
      ("abc", 2, "abc", 2, 200),    // short tails
      ("a", 1, "a", 0, 200),        // offset past the end -> empty suffix
      ("😀a", 0, "😀b", 0, 200))    // mismatch right after a 4-byte char
    cases.foreach { case (a, oa, b, ob, cap) =>
      val got = graft.functions.LcpKernel.lcpAt(
        UTF8String.fromString(a), oa.toLong,
        UTF8String.fromString(b), ob.toLong, cap)
      assert(got == ref(a, oa, b, ob, cap),
        s"lcpAt($a, $oa, $b, $ob, $cap): got $got, want ${ref(a, oa, b, ob, cap)}")
    }
  }

  test("longest repeats: unicode corpus equals the HOF-form twin") {
    import spark.implicits._
    val clause = "мир 世界 😀 peace"
    val docs = Seq(
      (0L, s"начало $clause конец"),
      (1L, s"$clause und mehr"),
      (2L, s"unrelated text"),
      (3L, s"x $clause")).toDF("doc_id", "text").repartition(5)
    val got = SuffixOps.longestRepeats(spark, docs, k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    // the old HOF form over the same suffix ranks (capped at the same
    // 200 chars): prefix equality is monotone, so the count of
    // prefix-equal lengths IS the LCP
    val ranks = SuffixOps.suffixRanks(spark, docs)
    val withSuffix = ranks
      .join(docs.select(col("doc_id"), col("text").as("_t")), Seq("doc_id"))
      .select(col("rank"),
        substring(expr("substring(_t, off + 1)"), 1, 200).as("sfx"))
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pairs = withSuffix.sliding(2).filter(_.length == 2)
      .map { case Array((_, a), (_, b)) => (a, b) }.toSeq
    def lcp(a: String, b: String): Int = {
      val ca = a.codePoints().toArray
      val cb = b.codePoints().toArray
      ca.zip(cb).takeWhile { case (x, y) => x == y }.length
    }
    def cpPrefix(s: String, n: Int): String = {
      val it = s.codePoints().toArray.take(n)
      new String(it, 0, it.length)
    }
    val want = pairs.map { case (a, b) => (a, lcp(a, b)) }
      .filter(_._2 >= 2)
      .map { case (a, l) => (cpPrefix(a, l), l.toLong) }
      .groupBy(identity).map { case ((s, l), g) => (s, l, g.size.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(50).sorted
    assert(got.toSeq == want,
      s"native ${got.toList} != HOF twin ${want.toList}")
    assert(got.exists(_._1.contains("世界")), "no unicode span surfaced")
  }
}
