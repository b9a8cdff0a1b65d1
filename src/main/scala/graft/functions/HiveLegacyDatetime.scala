package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import java.util.{Locale, TimeZone}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive 1.2's legacy SimpleDateFormat-era datetime semantics, modeled
  * clean-room for the qtest surface (registered session-locally in
  * QtestRunner — the engine front door keeps Spark's modern builtins,
  * same discipline as the `hash`/`std`/`variance` rebinds).
  *
  * Two legacy string parsers drive everything (ref
  * ql/udf/generic/GenericUDF.java:481 getDateValue +
  * serde2/objectinspector/primitive/PrimitiveObjectInspectorUtils
  * .java:1123 getTimestampFromString):
  *
  *  - LENIENT DATE: `new SimpleDateFormat("yyyy-MM-dd").parse(s)` with
  *    default lenient=true — digit runs for y/M/d, any TRAILING text
  *    ignored ("2015-01-17 00:02:30" parses as the date), out-of-range
  *    fields ROLL like a lenient Calendar ("2015-02-30" → 2015-03-02,
  *    "2014-01-32" → 2014-02-01), and a format miss ("02/15/2015")
  *    returns null.
  *  - STRICT TIMESTAMP: java.sql.Timestamp.valueOf shape
  *    (`yyyy-[m]m-[d]d hh:mm:ss[.f…]`, fraction truncated to 9 digits)
  *    with the same lenient field normalization; anything else — a
  *    missing seconds field, a 'T' separator — is a miss.
  *
  * Functions that take "a date": next_day / add_months / last_day /
  * trunc use the lenient DATE parser only. date_format /
  * months_between try STRICT TIMESTAMP first (time part kept) then
  * fall back to the date parser (time part dropped) — exactly the
  * evaluate() order in GenericUDFDateFormat / GenericUDFMonthsBetween.
  * from_utc_timestamp / to_utc_timestamp use STRICT TIMESTAMP only.
  *
  * All expressions are CodegenFallback: they exist for golden fidelity
  * over fixture-sized qtest data, never in the 100 TB hot path (the
  * library surface keeps Spark's codegen'd datetime builtins).
  */
object HiveLegacyDatetime {

  /** Lenient-Calendar field roll shared by both parsers: build from
    * year then ADD the (possibly out-of-range) month/day offsets. This
    * is field arithmetic, so it is timezone-independent — identical to
    * GregorianCalendar lenient resolution everywhere except inside a
    * DST gap, which no golden exercises. */
  private val LegacyDateRe = """^(\d{1,7})-(\d{1,7})-(\d{1,7})""".r
  private val LegacyTsRe =
    """^(\d{1,7})-(\d{1,7})-(\d{1,7}) (\d{1,7}):(\d{1,7}):(\d{1,7})(?:\.(\d{1,9}))?$""".r

  def parseLegacyDate(s: String): LocalDate =
    LegacyDateRe.findPrefixMatchOf(s) match {
      case Some(m) =>
        try LocalDate
          .of(m.group(1).toInt, 1, 1)
          .plusMonths(m.group(2).toLong - 1)
          .plusDays(m.group(3).toLong - 1)
        catch { case _: Exception => null }
      case None => null
    }

  def parseLegacyTimestamp(s0: String): LocalDateTime = {
    var s = s0.trim
    val p = s.indexOf('.')
    if (p != -1 && s.length - p > 10) s = s.substring(0, p + 10)
    LegacyTsRe.findFirstMatchIn(s) match {
      case Some(m) =>
        try {
          val frac = Option(m.group(7)).getOrElse("")
          val nanos =
            if (frac.isEmpty) 0 else (frac + "0" * (9 - frac.length)).toInt
          LocalDateTime
            .of(m.group(1).toInt, 1, 1, 0, 0, 0, nanos)
            .plusMonths(m.group(2).toLong - 1)
            .plusDays(m.group(3).toLong - 1)
            .plusHours(m.group(4).toLong)
            .plusMinutes(m.group(5).toLong)
            .plusSeconds(m.group(6).toLong)
        } catch { case _: Exception => null }
      case None => null
    }
  }

  private[functions] def microsToLdt(micros: Long, zone: ZoneId): LocalDateTime =
    DateTimeUtils.microsToInstant(micros).atZone(zone).toLocalDateTime

  private[functions] def ldtToMicros(ldt: LocalDateTime, zone: ZoneId): Long =
    DateTimeUtils.instantToMicros(ldt.atZone(zone).toInstant)

  /** getDateValue semantics: string → lenient date parse; timestamp →
    * its date part (fields in the session zone). Returns null on miss. */
  private[functions] def dateValueOf(dt: DataType, v: Any,
      zone: ZoneId): LocalDate = dt match {
    case _: StringType => parseLegacyDate(v.asInstanceOf[UTF8String].toString)
    case DateType => LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
    case TimestampType | TimestampNTZType =>
      microsToLdt(v.asInstanceOf[Long], zone).toLocalDate
    case NullType => null
    case other =>
      throw new IllegalArgumentException(
        s"only STRING_GROUP and DATE_GROUP types supported, got $other")
  }

  /** getTimestampValue-then-getDateValue order (GenericUDFDateFormat /
    * GenericUDFMonthsBetween evaluate): strict timestamp keeps time,
    * date fallback drops it. */
  private[functions] def tsOrDateValueOf(dt: DataType, v: Any,
      zone: ZoneId): LocalDateTime = dt match {
    case _: StringType =>
      val s = v.asInstanceOf[UTF8String].toString
      val ts = parseLegacyTimestamp(s)
      if (ts != null) ts
      else Option(parseLegacyDate(s)).map(_.atStartOfDay).orNull
    case DateType => LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).atStartOfDay
    case TimestampType | TimestampNTZType => microsToLdt(v.asInstanceOf[Long], zone)
    case NullType => null
    case other =>
      throw new IllegalArgumentException(
        s"only STRING_GROUP and DATE_GROUP types supported, got $other")
  }

  private val OutFmt = java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd")
  private[functions] def fmtDate(d: LocalDate): UTF8String =
    UTF8String.fromString(d.format(OutFmt))

  /** GenericUDFNextDay.getIntDayOfWeek: 2-letter / 3-letter / full name,
    * case-insensitive; Calendar numbering (SUNDAY=1 … SATURDAY=7); -1
    * on no match. */
  private val DayNames: Seq[(Int, Seq[String])] = Seq(
    2 -> Seq("MO", "MON", "MONDAY"), 3 -> Seq("TU", "TUE", "TUESDAY"),
    4 -> Seq("WE", "WED", "WEDNESDAY"), 5 -> Seq("TH", "THU", "THURSDAY"),
    6 -> Seq("FR", "FRI", "FRIDAY"), 7 -> Seq("SA", "SAT", "SATURDAY"),
    1 -> Seq("SU", "SUN", "SUNDAY"))
  private[functions] def dayOfWeekInt(s: String): Int = {
    val u = s.toUpperCase(Locale.ROOT)
    DayNames.collectFirst { case (n, names) if names.contains(u) => n }
      .getOrElse(-1)
  }

  /** Calendar day-of-week (SUNDAY=1) of a LocalDate (ISO MONDAY=1). */
  private[functions] def calDow(d: LocalDate): Int =
    d.getDayOfWeek.getValue % 7 + 1
}

/** Shared shape: a tz-aware, eval-only binary function over Hive's
  * legacy datetime values. */
abstract class HiveLegacyDatetimeExpr
    extends Expression with CodegenFallback with TimeZoneAwareExpression {
  override def nullable: Boolean = true
  @transient protected lazy val zone: ZoneId = zoneId
}

/** next_day(start_date, day_of_week) — ref GenericUDFNextDay.java:
  * first date strictly after start_date with the given day-of-week,
  * rendered 'yyyy-MM-dd'. */
case class HiveNextDay(date: Expression, day: Expression,
    timeZoneId: Option[String] = None) extends HiveLegacyDatetimeExpr {
  override def children: Seq[Expression] = Seq(date, day)
  override def dataType: DataType = StringType
  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(tz))
  override def eval(input: InternalRow): Any = {
    val dayV = day.eval(input)
    if (dayV == null) return null
    val dow = HiveLegacyDatetime.dayOfWeekInt(dayV.toString)
    if (dow == -1) return null
    val dateV = date.eval(input)
    if (dateV == null) return null
    val d = HiveLegacyDatetime.dateValueOf(date.dataType, dateV, zone)
    if (d == null) return null
    val curr = HiveLegacyDatetime.calDow(d)
    val add = if (curr < dow) dow - curr else 7 - curr + dow
    HiveLegacyDatetime.fmtDate(d.plusDays(add.toLong))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(date = c(0), day = c(1))
}

/** add_months(start_date, n) — ref GenericUDFAddMonths.java:117
  * addMonth: Calendar month add with the LAST-DAY PROMOTION — when the
  * input is the last day of its month, the result snaps to the last
  * day of the target month (2014-02-28 + 2 → 2014-04-30). */
case class HiveAddMonths(date: Expression, num: Expression,
    timeZoneId: Option[String] = None) extends HiveLegacyDatetimeExpr {
  override def children: Seq[Expression] = Seq(date, num)
  override def dataType: DataType = StringType
  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(tz))
  override def eval(input: InternalRow): Any = {
    val numV = num.eval(input)
    if (numV == null) return null
    val n = numV match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => try other.toString.toDouble.toInt
        catch { case _: NumberFormatException => return null }
    }
    val dateV = date.eval(input)
    if (dateV == null) return null
    val d = HiveLegacyDatetime.dateValueOf(date.dataType, dateV, zone)
    if (d == null) return null
    val wasLast = d.getDayOfMonth == d.lengthOfMonth
    val r0 = d.plusMonths(n.toLong)
    val r = if (wasLast) r0.withDayOfMonth(r0.lengthOfMonth) else r0
    HiveLegacyDatetime.fmtDate(r)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(date = c(0), num = c(1))
}

/** last_day(date) — ref GenericUDFLastDay.java: last day of the input's
  * month, 'yyyy-MM-dd' string. */
case class HiveLastDay(date: Expression,
    timeZoneId: Option[String] = None) extends HiveLegacyDatetimeExpr {
  override def children: Seq[Expression] = Seq(date)
  override def dataType: DataType = StringType
  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(tz))
  override def eval(input: InternalRow): Any = {
    val dateV = date.eval(input)
    if (dateV == null) return null
    val d = HiveLegacyDatetime.dateValueOf(date.dataType, dateV, zone)
    if (d == null) return null
    HiveLegacyDatetime.fmtDate(d.withDayOfMonth(d.lengthOfMonth))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(date = c(0))
}

/** trunc(date, fmt) — ref GenericUDFTrunc.evalDate: CASE-SENSITIVE
  * format match (MONTH|MON|MM → first of month, YEAR|YYYY|YY → Jan 1,
  * anything else → NULL, per row). String input uses the lenient date
  * parser only. */
case class HiveTruncDate(date: Expression, fmt: Expression,
    timeZoneId: Option[String] = None) extends HiveLegacyDatetimeExpr {
  override def children: Seq[Expression] = Seq(date, fmt)
  override def dataType: DataType = StringType
  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(tz))
  override def eval(input: InternalRow): Any = {
    val dateV = date.eval(input)
    val fmtV = fmt.eval(input)
    if (dateV == null || fmtV == null) return null
    val d = HiveLegacyDatetime.dateValueOf(date.dataType, dateV, zone)
    if (d == null) return null
    fmtV.toString match {
      case "MONTH" | "MON" | "MM" =>
        HiveLegacyDatetime.fmtDate(d.withDayOfMonth(1))
      case "YEAR" | "YYYY" | "YY" =>
        HiveLegacyDatetime.fmtDate(d.withDayOfYear(1))
      case _ => null
    }
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(date = c(0), fmt = c(1))
}

/** months_between(d1, d2) — ref GenericUDFMonthsBetween.java:93: whole
  * month diff when same day-of-month or both month-ends; otherwise
  * (day+time in seconds diff)/2678400 (a 31-day month), rounded
  * HALF_UP to 8 decimals. */
case class HiveMonthsBetween(d1: Expression, d2: Expression,
    timeZoneId: Option[String] = None) extends HiveLegacyDatetimeExpr {
  override def children: Seq[Expression] = Seq(d1, d2)
  override def dataType: DataType = DoubleType
  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(tz))
  override def eval(input: InternalRow): Any = {
    val v1 = d1.eval(input)
    val v2 = d2.eval(input)
    if (v1 == null || v2 == null) return null
    val t1 = HiveLegacyDatetime.tsOrDateValueOf(d1.dataType, v1, zone)
    val t2 = HiveLegacyDatetime.tsOrDateValueOf(d2.dataType, v2, zone)
    if (t1 == null || t2 == null) return null
    val monDiff = (t1.getYear - t2.getYear) * 12 +
      (t1.getMonthValue - t2.getMonthValue)
    val last1 = t1.getDayOfMonth == t1.toLocalDate.lengthOfMonth
    val last2 = t2.getDayOfMonth == t2.toLocalDate.lengthOfMonth
    if (t1.getDayOfMonth == t2.getDayOfMonth || (last1 && last2))
      monDiff.toDouble
    else {
      def daySec(t: LocalDateTime): Int =
        t.getDayOfMonth * 86400 + t.getHour * 3600 +
          t.getMinute * 60 + t.getSecond
      val raw = monDiff + (daySec(t1) - daySec(t2)) / 2678400d
      java.math.BigDecimal.valueOf(raw)
        .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(d1 = c(0), d2 = c(1))
}

/** date_format(date, fmt) — ref GenericUDFDateFormat.java: a CONSTANT
  * SimpleDateFormat pattern, evaluated at FUNCTION-BUILD time like
  * Hive's initialize() (the registry builder rejects a non-constant
  * and bakes the pattern in, so later plan rewrites can't disturb it;
  * invalid pattern → NULL for every row, '' → empty string); the value
  * goes through strict-timestamp-then-lenient-date conversion so time
  * parts survive only a full 'yyyy-MM-dd HH:mm:ss[.f]' spelling.
  * Formatting runs on the wall-clock fields (UTC-pinned
  * SimpleDateFormat over a field-preserving java.util.Date), Locale.US
  * like the golden harness; zone-printing patterns (z/Z/X) are out of
  * scope. */
case class HiveDateFormat(date: Expression, rawPattern: Option[String],
    timeZoneId: Option[String] = None) extends HiveLegacyDatetimeExpr {
  override def children: Seq[Expression] = Seq(date)
  override def dataType: DataType = StringType
  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(tz))
  @transient private lazy val pattern: Option[String] =
    rawPattern.filter { p =>
      try { new java.text.SimpleDateFormat(p, Locale.US); true }
      catch { case _: IllegalArgumentException => false }
    }
  @transient private lazy val sdf: java.text.SimpleDateFormat = {
    val f = new java.text.SimpleDateFormat(pattern.get, Locale.US)
    f.setTimeZone(TimeZone.getTimeZone("UTC"))
    f
  }
  override def eval(input: InternalRow): Any = {
    if (pattern.isEmpty) return null
    val dateV = date.eval(input)
    if (dateV == null) return null
    val t = HiveLegacyDatetime.tsOrDateValueOf(date.dataType, dateV, zone)
    if (t == null) return null
    val millis = t.atZone(ZoneOffset.UTC).toInstant.toEpochMilli
    UTF8String.fromString(sdf.format(new java.util.Date(millis)))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(date = c(0))
}

object HiveDateFormat {
  /** Registry builder: Hive's initialize() requires the pattern be a
    * constant (UDFArgumentTypeException otherwise) and resolves it
    * once. */
  def build(date: Expression, fmt: Expression): HiveDateFormat = {
    if (!fmt.foldable)
      throw new IllegalArgumentException(
        "date_format only takes constant as second argument")
    val v = fmt.eval()
    HiveDateFormat(date, Option(v).map(_.toString))
  }
}

/** from_utc_timestamp / to_utc_timestamp (invert) — ref
  * GenericUDFFromUtcTimestamp.java: reinterpret the input's wall-clock
  * fields (seconds precision — the reference round-trips through a
  * fraction-less SimpleDateFormat) in the FROM zone, read the same
  * instant's fields in the TO zone, then restore the input's
  * sub-second part if non-zero. Unknown timezone names fall back to
  * GMT (TimeZone.getTimeZone), so '' and '---' are identity shifts. */
case class HiveUtcShift(ts: Expression, tz: Expression, invert: Boolean,
    timeZoneId: Option[String] = None) extends HiveLegacyDatetimeExpr {
  override def children: Seq[Expression] = Seq(ts, tz)
  override def dataType: DataType = TimestampType
  override def withTimeZone(tzId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(tzId))
  override def eval(input: InternalRow): Any = {
    val tsV = ts.eval(input)
    val tzV = tz.eval(input)
    if (tsV == null || tzV == null) return null
    val t = ts.dataType match {
      case _: StringType =>
        HiveLegacyDatetime.parseLegacyTimestamp(
          tsV.asInstanceOf[UTF8String].toString)
      case TimestampType | TimestampNTZType =>
        HiveLegacyDatetime.microsToLdt(tsV.asInstanceOf[Long], zone)
      case DateType =>
        LocalDate.ofEpochDay(tsV.asInstanceOf[Int].toLong).atStartOfDay
      case other =>
        throw new IllegalArgumentException(
          s"from/to_utc_timestamp: unsupported input type $other")
    }
    if (t == null) return null
    val named = TimeZone.getTimeZone(tzV.toString).toZoneId
    val utc = ZoneOffset.UTC
    val (fromZ, toZ) = if (invert) (named, utc) else (utc, named)
    val wall = t.withNano(0).atZone(fromZ).withZoneSameInstant(toZ)
      .toLocalDateTime
    val micros = t.getNano / 1000
    HiveLegacyDatetime.ldtToMicros(wall.plusNanos(micros * 1000L), zone)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(ts = c(0), tz = c(1))
}
