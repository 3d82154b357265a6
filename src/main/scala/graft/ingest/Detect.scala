package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import graft.core.FileFormat

/** Format sniffing — the reference's `detect_file_type` decision tree
  * (src/file-to-sql-loader.py:104-142), driver-side over the Hadoop
  * FileSystem API so it works for any supported scheme:
  *
  *  1. first non-space char `[` or `{` AND the head parses as JSON ⇒ json
  *  2. else if every non-blank head line has the same positive `|` count ⇒ psv
  *  3. else if every non-blank head line has the same positive `,` count ⇒ csv
  *  4. else extension fallback (.json/.psv/.csv), default csv.
  */
object Detect {

  private val HeadLines = 10

  def detect(spark: SparkSession, path: String): FileFormat = {
    val head = readHead(spark, path, HeadLines)
    detectFromHead(head, path)
  }

  def detectFromHead(lines: Seq[String], path: String): FileFormat = {
    val trimmedAll = lines.mkString("\n").trim
    val firstChar = trimmedAll.headOption
    if ((firstChar.contains('[') || firstChar.contains('{')) && looksLikeJson(trimmedAll))
      return FileFormat.Json

    val nonBlank = lines.filter(_.trim.nonEmpty)
    def constantPositiveCount(sep: Char): Boolean =
      nonBlank.nonEmpty && {
        val counts = nonBlank.map(_.count(_ == sep))
        counts.head > 0 && counts.distinct.size == 1
      }
    if (constantPositiveCount('|')) FileFormat.Psv
    else if (constantPositiveCount(',')) FileFormat.Csv
    else extensionFallback(path)
  }

  /** Structural JSON probe over the head sample only (the reference parses
    * the whole file; a head probe is the scale-safe restatement — a 100 GB
    * JSON file should not be read twice on the driver). Accepts the head if
    * brackets/braces balance or are still open (truncated mid-document). */
  private def looksLikeJson(head: String): Boolean = {
    var depth = 0
    var inString = false
    var escaped = false
    var sawStructure = false
    head.foreach { c =>
      if (escaped) escaped = false
      else if (inString) {
        if (c == '\\') escaped = true else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '[' | '{' => depth += 1; sawStructure = true
        case ']' | '}' => depth -= 1
        case _ =>
      }
      if (depth < 0) return false
    }
    sawStructure
  }

  private def extensionFallback(path: String): FileFormat = {
    val lower = path.toLowerCase
    if (lower.endsWith(".json")) FileFormat.Json
    else if (lower.endsWith(".psv")) FileFormat.Psv
    else FileFormat.Csv
  }

  /** Read up to `n` lines from the file head (single small driver-side I/O,
    * mirrors the reference's 10-line sniff read). */
  def readHead(spark: SparkSession, path: String, n: Int): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      Iterator.continually(reader.readLine()).takeWhile(_ != null).take(n).toVector
    } finally in.close()
  }

  /** Directory listing source (reference os.listdir + isfile, :1538):
    * plain files only, non-recursive, deterministic order. */
  def listFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted.toSeq
  }
}
