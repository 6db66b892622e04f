package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Curation

/** Curation ops: the two-phase stratified sampler must be EXACTLY the
  * single-window sample (any salt count), and the distributed prefix-sum
  * packer must be EXACTLY the global-window packing (any block size). */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val docs = (0L until 120L).map { i =>
    val lang = if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"
    // variable token counts: (i % 7) + 1 words
    (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" "), lang)
  }.toDF("doc_id", "text", "lang")

  test("stratified sample: exact top-k by md5 rank per stratum, salt-invariant") {
    val k = 5
    val got = Curation.stratifiedSample(docs, "lang", k, salts = 8)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // brute-force reference: k smallest (md5(id), id) per lang
    val want = (0L until 120L).groupBy(i =>
        if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr")
      .flatMap { case (lang, ids) =>
        ids.sortBy(i => (md5hex(i.toString), i)).take(k).map(i => (i, lang))
      }.toSet
    assert(got == want)
    assert(got.groupBy(_._2).forall(_._2.size == k))
    // a different salt count (including the degenerate 1) changes nothing
    val salt1 = Curation.stratifiedSample(docs, "lang", k, salts = 1)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salt1 == want)
  }

  test("shard packing: distributed prefix sum equals the global window, block-invariant") {
    val budget = 20L
    val got = Curation.packShards(spark, docs, budget, blockSize = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: exclusive running sum in doc_id order
    var run = 0L
    val want = (0L until 120L).map { i =>
      val tok = (i % 7) + 1
      val shard = run / budget
      run += tok
      (i, tok, shard)
    }
    assert(got.toSeq == want)
    // a single block (the naive plan's semantics) gives identical shards
    val oneBlock = Curation.packShards(spark, docs, budget, blockSize = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(oneBlock.toSeq == want)
    // shards are contiguous and nondecreasing in doc order (a doc that
    // straddles a boundary stays in the shard its first token falls in,
    // so a shard may exceed budget by part of its last doc — by design)
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }
}
