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
}
