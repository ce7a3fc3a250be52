package graft

import org.apache.spark.sql.functions._
import graft.ops.NearDup

/** Near-dup family: LSH candidates vs exact ground truth, simhash on
  * constructed duplicates, fingerprint behavior.
  */
class NearDupSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir)

  test("minhash+LSH pairs equal exact Jaccard>=0.8 pairs on real docs") {
    val exact = NearDup.jaccardPairs(docs, 3, 4, 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = NearDup.minhashPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
  }

  test("jaccard pairs are symmetric-free (a<b) and above threshold") {
    val rows = NearDup.jaccardPairs(docs, 3, 1, 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (c, sa, sb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      assert(3 * c >= sa + sb) // j >= 1/2 in exact integer form
    }
  }

  test("simhash: identical texts collide, near-identical within distance") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (4L, "completely different content about databases and distributed query engines")
    ).toDF("doc_id", "text")
    val sigs = NearDup.simhashSigs(d).as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 8)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 8)
    val pairs = NearDup.simhashPairs(d, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash finds the corpus near-dups that Jaccard>=0.8 finds") {
    val exact = NearDup.jaccardPairs(docs, 3, 4, 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sim = NearDup.simhashPairs(docs, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val recall = (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("exact dup groups: duplicated text maps to one canonical id") {
    val d = Seq((10L, "same text"), (11L, "same text"), (12L, "other")).toDF("doc_id", "text")
    val g = NearDup.exactDupGroups(d).orderBy("canonical_id")
      .select("canonical_id", "n_docs").as[(Long, Long)].collect().toSeq
    assert(g === Seq((10L, 2L), (12L, 1L)))
  }
}
