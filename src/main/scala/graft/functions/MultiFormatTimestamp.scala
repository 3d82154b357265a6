package graft.functions

import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, ResolverStyle}
import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoField
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-pattern timestamp parse — the optional custom Catalyst
  * `Expression` from SURVEY §7.3.
  *
  * Semantics: first-match over the engine's 6 documented patterns (+ the
  * ISO-'T' JSON variant), identical to the
  * `coalesce(try_to_timestamp(c, p1), …, try_to_timestamp(c, p7))` chain in
  * analyze.Analyze (STRICT resolution: 2024-02-30 and 2023-02-29 fail;
  * dd/MM and dot separators are not in the set). NULL on no-match — never
  * throws, ANSI-safe.
  *
  * Why an Expression: the coalesce chain re-reads the UTF8String and
  * re-runs the full Spark formatter machinery once per pattern per row;
  * this expression converts once, dispatches on cheap structural hints
  * (length, separator position), and early-exits on first match, with
  * proper `doGenCode` so it stays inside whole-stage codegen.
  */
case class MultiFormatTimestamp(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "multi_format_timestamp"

  override def nullSafeEval(input: Any): Any =
    MultiFormatTimestamp.parseMicros(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = MultiFormatTimestamp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}Tmp = $util.parseMicros($c);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MultiFormatTimestamp =
    copy(child = newChild)
}

object MultiFormatTimestamp {

  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .appendPattern(pattern.replace("yyyy", "uuuu"))
      .toFormatter
      .withResolverStyle(ResolverStyle.STRICT)

  // (formatter, hasTime) in reference priority order (Analyze.DatetimePatterns)
  private val WithTime = Seq(
    "uuuu-MM-dd HH:mm:ss", "MM/dd/uuuu HH:mm:ss", "dd-MM-uuuu HH:mm:ss",
    "uuuu-MM-dd'T'HH:mm:ss").map(fmt)
  private val DateOnly = Seq(
    "uuuu-MM-dd", "MM/dd/uuuu", "dd-MM-uuuu").map(fmt)

  /** Returns epoch micros (UTC) or null. Structural pre-dispatch: length
    * decides date-only (10) vs with-time (19), first separator position
    * narrows the pattern family, so typically ONE java.time parse runs. */
  def parseMicros(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString.trim
    val n = str.length
    if (n == 10) {
      // date-only: uuuu-MM-dd | MM/dd/uuuu | dd-MM-uuuu
      val f =
        if (str.charAt(4) == '-') DateOnly(0)
        else if (str.charAt(2) == '/') DateOnly(1)
        else if (str.charAt(2) == '-') DateOnly(2)
        else return null
      tryDate(str, f)
    } else if (n == 19) {
      val f =
        if (str.charAt(4) == '-' && str.charAt(10) == ' ') WithTime(0)
        else if (str.charAt(2) == '/') WithTime(1)
        else if (str.charAt(2) == '-') WithTime(2)
        else if (str.charAt(4) == '-' && str.charAt(10) == 'T') WithTime(3)
        else return null
      tryDateTime(str, f)
    } else null
  }

  private def tryDate(str: String, f: DateTimeFormatter): java.lang.Long =
    try {
      val d = LocalDate.parse(str, f)
      java.lang.Long.valueOf(d.atStartOfDay(ZoneOffset.UTC).toInstant.getEpochSecond * 1000000L)
    } catch { case _: Exception => null }

  private def tryDateTime(str: String, f: DateTimeFormatter): java.lang.Long =
    try {
      val dt = LocalDateTime.parse(str, f)
      val i = dt.atZone(ZoneOffset.UTC).toInstant
      java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    } catch { case _: Exception => null }

  /** Column API (classic-session Expression↔Column bridge). */
  def multi_format_timestamp(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(MultiFormatTimestamp(GraftSqlBridge.expression(c)))
  }

  /** SQL registration: SELECT multi_format_timestamp(col). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_format_timestamp", exprs => MultiFormatTimestamp(exprs.head), "built-in")
}
