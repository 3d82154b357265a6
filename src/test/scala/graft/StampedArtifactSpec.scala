package graft

import org.apache.spark.sql.functions._
import graft.core.StampedArtifact

/** The shared artifact plumbing (r14 verdict #3): stamp read/write/
  * delete tolerance and the unstamp→swap window semantics every
  * artifact lifecycle now rides on. The per-artifact lifecycles keep
  * their own end-to-end specs (ScaleOps21/24/25/26/27, StreamingSpec);
  * this suite pins the HELPER's contract so artifact #6 can trust it
  * without re-deriving the crash-window argument. */
class StampedArtifactSpec extends GraftSuite {
  import spark.implicits._

  test("meta stamps: write/read round-trip, overwrite, tolerant reads (absent → None, garbage → None), delete idempotent") {
    val root = tempDir("sa-meta").toString
    assert(StampedArtifact.readMetaLong(spark, root, "_rows").isEmpty)
    assert(StampedArtifact.stampedRows(spark, root) == -1L)
    StampedArtifact.writeMeta(spark, root, "_rows", "42")
    assert(StampedArtifact.readMetaLong(spark, root, "_rows").contains(42L))
    assert(StampedArtifact.stampedRows(spark, root) == 42L)
    StampedArtifact.writeMeta(spark, root, "_rows", "7")
    assert(StampedArtifact.stampedRows(spark, root) == 7L)
    // torn garbage reads as None — the never-stamped branch, not a crash
    StampedArtifact.writeMeta(spark, root, "_rows", "not-a-number")
    assert(StampedArtifact.readMetaLong(spark, root, "_rows").isEmpty)
    assert(StampedArtifact.stampedRows(spark, root) == -1L)
    StampedArtifact.deleteMeta(spark, root, "_rows")
    assert(StampedArtifact.stampedRows(spark, root) == -1L)
    StampedArtifact.deleteMeta(spark, root, "_rows") // absent: no-op
  }

  test("readMetaString / readAllString: string stamps survive CHUNKED streams (one byte per read) — the r15 boundsScorer short-read class; maxLen truncation; empty/whitespace reads as None; all five artifacts' string reads share this loop") {
    // the chunked-read simulation: a stream that returns ONE byte per
    // read call, the behavior HDFS-like filesystems are allowed to show
    class Trickle(bytes: Array[Byte]) extends java.io.InputStream {
      private var i = 0
      override def read(): Int =
        if (i >= bytes.length) -1 else { val b = bytes(i); i += 1; b & 0xff }
      override def read(buf: Array[Byte], off: Int, len: Int): Int = {
        if (i >= bytes.length) return -1
        if (len == 0) return 0
        buf(off) = bytes(i); i += 1; 1
      }
    }
    val tag = "addk:ref=en:log2"
    assert(StampedArtifact.readAllString(
      new Trickle(tag.getBytes("UTF-8")), 256).contains(tag),
      "a one-byte-per-read stream must still yield the FULL tag")
    assert(StampedArtifact.readAllString(
      new Trickle("  x  ".getBytes("UTF-8")), 256).contains("x"))
    assert(StampedArtifact.readAllString(
      new Trickle(Array.empty[Byte]), 256).isEmpty)
    assert(StampedArtifact.readAllString(
      new Trickle("   ".getBytes("UTF-8")), 256).isEmpty)
    // a stamp LONGER than maxLen is torn garbage by contract and must
    // read as None, not as a silently-truncated prefix (r16 advice: a
    // corrupted file whose first maxLen bytes form a valid value would
    // otherwise validate spuriously); the loop must still terminate
    assert(StampedArtifact.readAllString(
      new Trickle(("y" * 300).getBytes("UTF-8")), 256).isEmpty)
    // exactly maxLen bytes is NOT torn — the boundary sits strictly
    // above the buffer, detected by one extra read returning EOF
    assert(StampedArtifact.readAllString(
      new Trickle(("y" * 256).getBytes("UTF-8")), 256).contains("y" * 256))
    // the on-disk form: write through writeMeta, read through
    // readMetaString — and TertileBounds.boundsScorer IS this read
    val root = tempDir("sa-str").toString
    assert(StampedArtifact.readMetaString(spark, root, "_scorer").isEmpty)
    StampedArtifact.writeMeta(spark, root, "_scorer", tag)
    assert(StampedArtifact.readMetaString(spark, root, "_scorer").contains(tag))
    assert(graft.ml.TertileBounds.boundsScorer(spark, root).contains(tag))
  }

  test("unstampAndSwap: clears the stamps in order, replaces the live table with the side copy, removes the side dir; with no stamps listed it is a pure swap") {
    val root = tempDir("sa-swap").toString
    Seq((1L, "old")).toDF("id", "s").write.parquet(s"$root/t")
    Seq((2L, "new")).toDF("id", "s").write.parquet(s"$root/t.swap")
    StampedArtifact.writeMeta(spark, root, "_rows", "1")
    StampedArtifact.writeMeta(spark, root, "_xor", "99")
    StampedArtifact.unstampAndSwap(spark, root, "t", s"$root/t.swap",
      Seq("_rows", "_xor"))
    assert(StampedArtifact.stampedRows(spark, root) == -1L,
      "the swap must leave the artifact NEVER-STAMPED until the caller restamps")
    assert(StampedArtifact.readMetaLong(spark, root, "_xor").isEmpty)
    assert(spark.read.parquet(s"$root/t").collect().map(_.getString(1)).toSeq
      == Seq("new"))
    assert(!new java.io.File(s"$root/t.swap").exists, "no swap residue")
    // pure swap (compaction): stamps untouched
    Seq((3L, "newer")).toDF("id", "s").write.parquet(s"$root/t.swap")
    StampedArtifact.writeMeta(spark, root, "_rows", "1")
    StampedArtifact.unstampAndSwap(spark, root, "t", s"$root/t.swap", Nil)
    assert(StampedArtifact.stampedRows(spark, root) == 1L,
      "a stampless swap (content-identical compaction) must leave stamps alone")
    assert(spark.read.parquet(s"$root/t").collect().map(_.getString(1)).toSeq
      == Seq("newer"))
  }

  test("unstampAndSwap with no existing live table (first write) just renames the side copy in") {
    val root = tempDir("sa-first").toString
    Seq((1L, "v")).toDF("id", "s").write.parquet(s"$root/t.swap")
    StampedArtifact.unstampAndSwap(spark, root, "t", s"$root/t.swap",
      Seq("_rows"))
    assert(spark.read.parquet(s"$root/t").count() == 1L)
  }

  test("fingerprint loadIndex(verifyContent = true): the cross-machine contract — a same-count content swap refuses loudly; the default load stays count-only (the hot-loop contract)") {
    import graft.dedup.FingerprintIndex
    val root = tempDir("sa-idx").toString + "/idx"
    FingerprintIndex.writeIndex(spark,
      Seq(11L, 22L, 33L).toDF("h"), root)
    assert(FingerprintIndex.loadIndex(spark, root, verifyContent = true)
      .count() == 3L)
    // same row count, different content
    Seq(11L, 22L, 44L).toDF("h").write.mode("overwrite")
      .parquet(s"$root/hashes")
    // default (count-only) load accepts — documented: write boundaries
    // carry the signature for internal, signature-keyed paths
    assert(FingerprintIndex.loadIndex(spark, root).count() == 3L)
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.loadIndex(spark, root, verifyContent = true)
    }
    assert(e.getMessage.contains("content signature"))
  }
}
