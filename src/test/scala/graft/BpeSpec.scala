package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE merge training vs an independent single-JVM reference
  * implementation: same merges, same order, same counts, under any
  * partitioning; early stop when no pair repeats. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference trainer over a word-frequency map (greedy leftmost
    * non-overlapping replace, ties (count DESC, l ASC, r ASC)). */
  private def brute(freq: Map[String, Long],
                    nMerges: Int): Seq[(Int, String, String, Long)] = {
    def mergeWord(s: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }
    var vocab = freq.toSeq.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val best = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= 2 =>
          out += ((rank, l, r, n))
          vocab = vocab.map { case (s, c) => (mergeWord(s, l, r), c) }
          rank += 1
        case _ => done = true
      }
    }
    out.result()
  }

  private val corpus = Seq(
    "the theatre then the them", "low lower lowest low low",
    "the other brother bothers", "newer newest new new news",
    "aaaa aaa aa the lowly")

  test("distributed merges equal the reference, any partitioning") {
    val freq = corpus.flatMap(_.toLowerCase.split("\\W+"))
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val want = brute(freq, 12)
    for (parts <- Seq(1, 5)) {
      val docs = spark.createDataset(corpus).repartition(parts).toDF("text")
      val got = Bpe.trainMerges(spark, docs, 12)
      assert(got == want, s"parts=$parts\ngot=$got\nwant=$want")
    }
    // the fixture really exercises multi-char merges + overlap handling
    assert(want.length == 12)
    assert(want.exists { case (_, l, r, _) => (l + r).length >= 3 })
  }

  test("encode: trained-vocab join segments the corpus, OOV char-splits") {
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainVocab(spark, docs, 8)
    def mergeWord(s: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }
    def seg(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (_, l, r, _)) => mergeWord(s, l, r)
      }
    val got = Bpe.encode(docs, vocab).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val ws = t.toLowerCase.split("\\W+").filter(_.nonEmpty).toVector
      val want = ws.flatMap(seg)
      assert(got(i.toLong) ==
        ((ws.size.toLong, want.size.toLong, want.mkString(" "))),
        s"doc $i")
    }
    // unseen word -> its character split
    val oov = Seq((99L, "zzzz the")).toDF("doc_id", "text")
    val o = Bpe.encode(oov, vocab).collect()(0)
    assert(o.getLong(1) == 2L)
    assert(o.getString(3).startsWith("z z z z "))
    vocab.unpersist()
  }

  test("early stop when no pair repeats") {
    val docs = Seq("ab cd ef").toDF("text")
    val got = Bpe.trainMerges(spark, docs, 10)
    assert(got.isEmpty)
  }
}
