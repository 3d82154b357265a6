package graft.core

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the stamped on-disk artifacts (r14 verdict #3 —
  * the BPE vocab, the fingerprint index, the perceptron weights, the
  * bigram LM, and the tertile boundaries each hand-rolled four copies
  * of this load-bearing crash-window logic): tiny `_name` stamp files
  * beside a parquet table, written/deleted in an order that makes every
  * writer-death window read as either OLD-COMPLETE, NEW-COMPLETE, or
  * LOUDLY-INVALID — never as silently-wrong.
  *
  * The discipline the helpers encode (established by
  * `text.Bpe.writeVocab` → `dedup.FingerprintIndex` → `ml.PerceptronModel`
  * → `ml.BigramLm`, hardened r15):
  *
  *   1. UNSTAMP FIRST — delete `_rows` (the gate every load validates)
  *      before touching the data, so a writer dying mid-rewrite leaves
  *      a NEVER-STAMPED artifact (rows = -1 → the caller's rebuild
  *      branch), never old stamps over new data;
  *   2. side-write-then-[[swap]] for tables that replace a live one —
  *      a reader races the old table, the new table, or a loud missing
  *      directory, never a torn mix;
  *   3. re-derive (count, signature) from what LANDED on disk, never
  *      from the frame that was written — the stamp can only certify
  *      rows that exist;
  *   4. RESTAMP LAST, `_rows` at the very end.
  *
  * Load contract, decided once (r14 verdict #2): DISTRIBUTED artifacts
  * whose paths cross runs/machines validate the `_xor` content
  * signature on load (one partial-agg scan); driver-sized artifacts
  * (collected whole anyway) validate stamp == rows plus full structure.
  * Each artifact's load documents which side it is on and why.
  *
  * Stamps are single small files; reads are tolerant — a stamp that is
  * missing or unparseable (the torn window inside `fs.create`) reads as
  * None, and the caller's never-stamped branch is the right response to
  * both. Single-writer contract throughout. */
object StampedArtifact {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write stamp file `root/name` (overwrite). */
  def writeMeta(spark: SparkSession, root: String, name: String,
      value: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$name")
    val out = fsOf(spark, p).create(p, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  /** Read stamp file `root/name` as a Long; None if absent or torn
    * garbage (both mean "no valid stamp"). */
  def readMetaLong(spark: SparkSession, root: String,
      name: String): Option[Long] =
    readMetaString(spark, root, name, maxLen = 64).flatMap { s =>
      try Some(s.toLong) catch { case _: NumberFormatException => None }
    }

  /** Read stamp file `root/name` as a trimmed UTF-8 string; None if
    * absent or empty (both mean "no valid stamp"). ALL string-valued
    * stamps read through this (r15 advice): `InputStream.read` may
    * return fewer bytes than available on chunked filesystem streams,
    * so a one-shot read can truncate a stamp and refuse a VALID
    * artifact — every stamp read shares the one read-until-EOF loop. */
  def readMetaString(spark: SparkSession, root: String, name: String,
      maxLen: Int = 256): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$name")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try readAllString(in, maxLen) finally in.close()
    }
  }

  /** The read-until-EOF core of [[readMetaString]], stream-injectable
    * so the chunked-read spec can drive it with a one-byte-at-a-time
    * stream: fills up to `maxLen` bytes, trims, None on empty. A stamp
    * LONGER than `maxLen` is torn garbage by contract and reads as
    * None (r16 advice: silently returning the prefix would let a
    * corrupted file whose first `maxLen` bytes happen to form a valid
    * value validate spuriously) — detected by one extra read after the
    * buffer fills. */
  private[graft] def readAllString(in: java.io.InputStream,
      maxLen: Int): Option[String] = {
    val buf = new Array[Byte](maxLen)
    var total = 0
    var n = in.read(buf, 0, buf.length)
    while (n > 0 && total < buf.length) {
      total += n
      n = if (total >= buf.length) 0
          else in.read(buf, total, buf.length - total)
    }
    if (total >= buf.length && in.read() != -1) return None
    val s = new String(buf, 0, total, "UTF-8").trim
    if (s.isEmpty) None else Some(s)
  }

  /** Delete stamp file `root/name` if present — the UNSTAMP step. */
  def deleteMeta(spark: SparkSession, root: String, name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$name")
    val fs = fsOf(spark, p)
    if (fs.exists(p))
      require(fs.delete(p, false), s"could not delete stamp $p")
  }

  /** The tolerant `_rows` read every artifact shares: -1 if never
    * stamped or torn. */
  def stampedRows(spark: SparkSession, root: String): Long =
    readMetaLong(spark, root, "_rows").getOrElse(-1L)

  /** UNSTAMP (clear `stamps`, in order — list `_rows` FIRST so any
    * death inside the window reads as never-stamped) then swap the
    * side-written table into place: delete `root/table`, rename
    * `sidePath` onto it. The caller writes and VALIDATES the side copy
    * before calling, and restamps after. */
  def unstampAndSwap(spark: SparkSession, root: String, table: String,
      sidePath: String, stamps: Seq[String]): Unit = {
    stamps.foreach(deleteMeta(spark, root, _))
    val live = new org.apache.hadoop.fs.Path(s"$root/$table")
    val side = new org.apache.hadoop.fs.Path(sidePath)
    val fs = fsOf(spark, live)
    if (fs.exists(live))
      require(fs.delete(live, true), s"could not remove $live for swap")
    require(fs.rename(side, live), s"could not swap $side into place at $live")
  }
}
