package graft.cypher

import java.time._
import java.time.temporal.{ChronoField, ChronoUnit, IsoFields, WeekFields}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cypher temporal value family (date / localtime / time / localdatetime /
  * datetime / duration) — an extension beyond the reference, which has no
  * temporal types (its `timestamp()` returns millis,
  * `/root/reference/src/arithmetic/time_funcs.c`); semantics follow the
  * openCypher TCK Temporal1-10 features.
  *
  * Values ride the engine's variant struct: tag + (i, f, s) carry the
  * payload (see [[Values]] tag docs). All calendar logic lives here in
  * java.time and is reached through [[TemporalFn]], a Catalyst expression
  * with CodegenFallback — temporal construction/projection is per-row
  * scalar work (~100ns), not an analytical hot path, and calendar
  * correctness (ISO week years, named zones, duration normalization) is
  * exactly what java.time solves.
  */
object TemporalOps {
  import Values.{T_DATE, T_LOCALTIME, T_TIME, T_LOCALDATETIME, T_DATETIME,
    T_DURATION}

  /** Decoded temporal value. */
  sealed trait TVal
  final case class DateV(epochDay: Long) extends TVal
  final case class LocalTimeV(nanoOfDay: Long) extends TVal
  final case class TimeV(nanoOfDay: Long, offsetSec: Int) extends TVal
  final case class LocalDateTimeV(epochSec: Long, nano: Int) extends TVal
  final case class DateTimeV(epochSec: Long, nano: Int, zone: String)
    extends TVal
  /** time part normalized: nanos ∈ [0, 1e9), seconds signed. */
  final case class DurationV(months: Long, days: Long, seconds: Long,
      nanos: Int) extends TVal {
    def totalNanos: Long = seconds * 1000000000L + nanos
  }

  final class TemporalError(msg: String) extends RuntimeException(msg)
  private def err(msg: String): Nothing = throw new TemporalError(msg)

  // ── java.time bridges ────────────────────────────────────────────────────
  def toLocalDate(v: DateV): LocalDate = LocalDate.ofEpochDay(v.epochDay)
  def toLocalTime(n: Long): LocalTime = LocalTime.ofNanoOfDay(n)
  def toLdt(v: LocalDateTimeV): LocalDateTime =
    LocalDateTime.ofEpochSecond(v.epochSec, v.nano, ZoneOffset.UTC)
  def zoneOf(s: String): ZoneId =
    if (s == "Z") ZoneOffset.UTC
    else if (s.nonEmpty && (s(0) == '+' || s(0) == '-')) ZoneOffset.of(s)
    else try ZoneId.of(s)
    catch {
      case _: Exception =>
        // Cypher accepts a space for '+' in wire contexts and
        // case-insensitive region names
        try ZoneId.of(s.trim.replace(' ', '+'))
        catch { case _: Exception => err(s"unknown timezone: $s") }
    }
  /** tzdb 2022+ merges zones whose post-1970 data is identical
    * (Europe/Stockholm is now a Link to Europe/Berlin), so the JDK reports
    * the link TARGET's pre-1970 history (Berlin LMT +00:53:28 where
    * Stockholm observed +01:12:12). Restore the pre-merge transitions
    * (public tzdata ≤2021e `europe` file) for linked zones whose lost
    * history the TCK exercises; entries are (local cutover, offset sec),
    * ascending.
    */
  private val preMergeRules: Map[String, List[(LocalDateTime, Int)]] = Map(
    // Zone Europe/Stockholm 1:12:12 - LMT 1879 Jan 1
    //                       1:00:14 - SET 1900 Jan 1 (then CET = JDK rules)
    "Europe/Stockholm" -> List(
      (LocalDateTime.of(1879, 1, 1, 0, 0), 4332),
      (LocalDateTime.of(1900, 1, 1, 0, 0), 3614)))

  private def preMergeOffset(zoneId: String,
      instant: Instant): Option[ZoneOffset] =
    preMergeRules.get(zoneId).flatMap(_.collectFirst {
      case (until, off) if instant.isBefore(
        until.toInstant(ZoneOffset.ofTotalSeconds(off))) =>
        ZoneOffset.ofTotalSeconds(off)
    })

  private def preMergeOffsetLocal(zoneId: String,
      ldt: LocalDateTime): Option[ZoneOffset] =
    preMergeRules.get(zoneId).flatMap(_.collectFirst {
      case (until, off) if ldt.isBefore(until) =>
        ZoneOffset.ofTotalSeconds(off)
    })

  /** Local datetime in a zone → DateTimeV, honoring pre-merge history. */
  def ofLocal(ldt: LocalDateTime, zone: ZoneId): DateTimeV = zone match {
    case _: ZoneOffset => fromZdt(ZonedDateTime.of(ldt, zone))
    case _ => preMergeOffsetLocal(zone.getId, ldt) match {
      case Some(off) =>
        DateTimeV(ldt.toEpochSecond(off), ldt.getNano, zone.getId)
      case None => fromZdt(ZonedDateTime.of(ldt, zone))
    }
  }

  def toZdt(v: DateTimeV): ZonedDateTime = ZonedDateTime.ofInstant(
    Instant.ofEpochSecond(v.epochSec, v.nano), zoneOf(v.zone))
  def fromZdt(z: ZonedDateTime): DateTimeV = {
    val zone = z.getZone match {
      case off: ZoneOffset => if (off == ZoneOffset.UTC) "Z" else off.getId
      case other => other.getId
    }
    DateTimeV(z.toEpochSecond, z.getNano, zone)
  }
  def durationOf(months: Long, days: Long, totalNanos: BigInt): DurationV = {
    val ns = totalNanos.mod(BigInt(1000000000)).toInt
    val secs = ((totalNanos - ns) / 1000000000).toLong
    DurationV(months, days, secs, ns)
  }

  // ── variant encode/decode (InternalRow side) ─────────────────────────────
  /** raw (t, i, f, s) fields → TVal (variant rows, driver Rows, boxed
    * JSON all funnel here).
    */
  def fromFields(t: Int, i: Long, f: Double, s: String): TVal = t match {
    case T_DATE => DateV(i)
    case T_LOCALTIME => LocalTimeV(i)
    case T_TIME => TimeV(i, f.toInt)
    case T_LOCALDATETIME => LocalDateTimeV(i, f.toInt)
    case T_DATETIME => DateTimeV(i, f.toInt, s)
    case T_DURATION =>
      val parts = s.split(",")
      DurationV(i, f.toLong, parts(0).toLong, parts(1).toInt)
    case other => err(s"not a temporal value (tag $other)")
  }

  /** variant field order: t, i, f, s, b [, arr] — see Values.scalarFields */
  def decode(r: InternalRow): TVal = fromFields(r.getInt(0),
    if (r.isNullAt(1)) 0L else r.getLong(1),
    if (r.isNullAt(2)) 0.0 else r.getDouble(2),
    if (r.isNullAt(3)) null else r.getUTF8String(3).toString)

  def isTemporalTag(t: Int): Boolean = t >= T_DATE && t <= T_DURATION

  /** Encode into a width-`n` variant InternalRow (n = 6 at full depth,
    * 5 at the scalar floor — temporals never use the arr slot).
    */
  def encode(v: TVal, width: Int): InternalRow = {
    val a = new Array[Any](width)
    v match {
      case DateV(d) => a(0) = T_DATE; a(1) = d
      case LocalTimeV(n) => a(0) = T_LOCALTIME; a(1) = n
      case TimeV(n, off) => a(0) = T_TIME; a(1) = n; a(2) = off.toDouble
      case LocalDateTimeV(s, n) =>
        a(0) = T_LOCALDATETIME; a(1) = s; a(2) = n.toDouble
      case DateTimeV(s, n, z) =>
        a(0) = T_DATETIME; a(1) = s; a(2) = n.toDouble
        a(3) = UTF8String.fromString(z)
      case DurationV(m, d, secs, ns) =>
        a(0) = T_DURATION; a(1) = m; a(2) = d.toDouble
        a(3) = UTF8String.fromString(s"$secs,$ns")
    }
    new GenericInternalRow(a)
  }

  // ── rendering (canonical Cypher strings ≡ java.time ISO forms) ───────────
  def render(v: TVal): String = v match {
    case d: DateV => toLocalDate(d).toString
    case LocalTimeV(n) => toLocalTime(n).toString
    case TimeV(n, off) => OffsetTime.of(toLocalTime(n),
      ZoneOffset.ofTotalSeconds(off)).toString
    case l: LocalDateTimeV => toLdt(l).toString
    case d: DateTimeV =>
      val z = toZdt(d)
      z.getZone match {
        case _: ZoneOffset => z.toOffsetDateTime.toString
        case zone =>
          preMergeOffset(zone.getId,
            Instant.ofEpochSecond(d.epochSec, d.nano)) match {
            case Some(off) =>
              OffsetDateTime.ofInstant(
                Instant.ofEpochSecond(d.epochSec, d.nano), off).toString +
                "[" + zone.getId + "]"
            case None => z.toString // trailing [Region/City]
          }
      }
    case d: DurationV => renderDuration(d)
  }

  /** Neo4j duration canonical form: months as Y+M, days as D, time part
    * re-split H/M/S from the normalized total, each component signed,
    * fraction trimmed to 3/6/9 digits; zero → PT0S.
    */
  def renderDuration(d: DurationV): String = {
    val sb = new StringBuilder("P")
    val years = d.months / 12
    val months = d.months % 12
    if (years != 0) sb.append(years).append('Y')
    if (months != 0) sb.append(months).append('M')
    if (d.days != 0) sb.append(d.days).append('D')
    val total = BigInt(d.seconds) * 1000000000 + d.nanos
    if (total != 0 || (years == 0 && months == 0 && d.days == 0)) {
      sb.append('T')
      if (total == 0) sb.append("0S")
      else {
        val nsPerH = BigInt(3600) * 1000000000
        val nsPerM = BigInt(60) * 1000000000
        val hours = total / nsPerH
        val afterH = total - hours * nsPerH
        val minutes = afterH / nsPerM
        val afterM = afterH - minutes * nsPerM
        val secs = afterM / 1000000000
        val frac = (afterM - secs * 1000000000).toLong // sign follows afterM
        if (hours != 0) sb.append(hours).append('H')
        if (minutes != 0) sb.append(minutes).append('M')
        if (secs != 0 || frac != 0) {
          if (frac == 0) sb.append(secs).append('S')
          else {
            val neg = afterM < 0
            val absS = secs.abs
            val absF = frac.abs
            // all trailing zeros trimmed (PT0.4S, not PT0.400S)
            var fs = f"$absF%09d"
            while (fs.length > 1 && fs.endsWith("0"))
              fs = fs.substring(0, fs.length - 1)
            sb.append(if (neg) "-" else "").append(absS)
              .append('.').append(fs).append('S')
          }
        }
      }
    }
    sb.result()
  }

  // ── string parsing (Cypher-flavoured ISO 8601) ───────────────────────────
  // year is EXACTLY 4 digits (ISO 8601 without expanded-year agreement);
  // compact forms disambiguate by total length: 8=ymd, 7=ordinal, 6=ym
  // separated forms allow expanded years (java.time spans ±999,999,999)
  private val WeekRe = """([+-]?\d{4,9})-W(\d{2})(?:-(\d))?""".r
  private val WeekCompactRe = """([+-]?\d{4})W(\d{2})(\d)?""".r
  private val QuarterRe = """([+-]?\d{4,9})-Q(\d)(?:-(\d{2}))?""".r
  private val QuarterCompactRe = """([+-]?\d{4})Q(\d)(\d{2})?""".r
  private val ExtRe = """([+-]?\d{4,9})-(\d{2})(?:-(\d{2}))?""".r
  private val OrdinalExtRe = """([+-]?\d{4,9})-(\d{3})""".r
  private val Compact8Re = """([+-]?\d{4})(\d{2})(\d{2})""".r
  private val Compact7Re = """([+-]?\d{4})(\d{3})""".r
  private val Compact6Re = """([+-]?\d{4})(\d{2})""".r
  private val YearRe = """([+-]?\d{4,9})""".r

  def parseDate(s0: String): LocalDate = {
    val s = s0.trim
    s match {
      case WeekRe(y, w, dow) =>
        isoWeekDate(y.toInt, w.toInt,
          if (dow == null) 1 else dow.toInt)
      case WeekCompactRe(y, w, dow) =>
        isoWeekDate(y.toInt, w.toInt,
          if (dow == null) 1 else dow.toInt)
      case QuarterRe(y, q, dq) =>
        quarterDate(y.toInt, q.toInt, if (dq == null) 1 else dq.toInt)
      case QuarterCompactRe(y, q, dq) =>
        quarterDate(y.toInt, q.toInt, if (dq == null) 1 else dq.toInt)
      case ExtRe(y, m, d) =>
        LocalDate.of(y.toInt, m.toInt, if (d == null) 1 else d.toInt)
      case OrdinalExtRe(y, ord) => LocalDate.ofYearDay(y.toInt, ord.toInt)
      case Compact8Re(y, m, d) => LocalDate.of(y.toInt, m.toInt, d.toInt)
      case Compact7Re(y, ord) => LocalDate.ofYearDay(y.toInt, ord.toInt)
      case Compact6Re(y, m) => LocalDate.of(y.toInt, m.toInt, 1)
      case YearRe(y) => LocalDate.of(y.toInt, 1, 1)
      case other => err(s"cannot parse date: $other")
    }
  }

  def isoWeekDate(year: Int, week: Int, dow: Int): LocalDate = {
    if (week < 1 || week > 53) err(s"week out of range: $week")
    if (dow < 1 || dow > 7) err(s"dayOfWeek out of range: $dow")
    val wf = WeekFields.ISO
    val jan4 = LocalDate.of(year, 1, 4)
    val week1Monday = jan4.`with`(wf.dayOfWeek(), 1)
    val d = week1Monday.plusWeeks(week - 1L).plusDays(dow - 1L)
    if (d.get(wf.weekBasedYear()) != year ||
      d.get(wf.weekOfWeekBasedYear()) != week)
      err(s"week date out of range: $year-W$week-$dow")
    d
  }

  def quarterDate(year: Int, quarter: Int, dayOfQuarter: Int): LocalDate = {
    if (quarter < 1 || quarter > 4) err(s"quarter out of range: $quarter")
    val start = LocalDate.of(year, (quarter - 1) * 3 + 1, 1)
    val d = start.plusDays(dayOfQuarter - 1L)
    if (d.get(IsoFields.QUARTER_OF_YEAR) != quarter)
      err(s"dayOfQuarter out of range: $dayOfQuarter")
    d
  }

  /** time text → (nanoOfDay, offsetSeconds?); accepts compact digits,
    * fractional seconds, offsets and [Zone] suffixes (suffix returned
    * separately by [[splitZone]]).
    */
  def parseTimePart(s0: String): (Long, Option[Int]) = {
    var s = s0.trim
    if (s.startsWith("T")) s = s.substring(1)
    // offset suffix
    var off: Option[Int] = None
    val offIdx = math.max(s.lastIndexOf('+'), s.lastIndexOf('-'))
    if (s.endsWith("Z") || s.endsWith("z")) {
      off = Some(0); s = s.substring(0, s.length - 1)
    } else if (offIdx > 0) {
      val cand = s.substring(offIdx)
      if (cand.matches("[+-]\\d{2}(:?\\d{2})?(:?\\d{2})?")) {
        val sign = if (cand(0) == '-') -1 else 1
        val digs = cand.substring(1).replace(":", "")
        val h = digs.substring(0, 2).toInt
        val m = if (digs.length >= 4) digs.substring(2, 4).toInt else 0
        val sec = if (digs.length >= 6) digs.substring(4, 6).toInt else 0
        off = Some(sign * (h * 3600 + m * 60 + sec))
        s = s.substring(0, offIdx)
      }
    }
    // fraction
    var nanos = 0L
    val dot = s.indexOf('.')
    if (dot >= 0) {
      val fs = s.substring(dot + 1)
      if (!fs.forall(_.isDigit) || fs.isEmpty) err(s"bad time: $s0")
      nanos = (fs + "0" * (9 - fs.length)).take(9).toLong
      s = s.substring(0, dot)
    }
    val digs = s.replace(":", "")
    if (!digs.forall(_.isDigit) || digs.isEmpty || digs.length > 6 ||
      digs.length % 2 != 0) err(s"cannot parse time: $s0")
    val h = digs.substring(0, 2).toInt
    val m = if (digs.length >= 4) digs.substring(2, 4).toInt else 0
    val sec = if (digs.length >= 6) digs.substring(4, 6).toInt else 0
    if (h > 23 || m > 59 || sec > 59) err(s"time out of range: $s0")
    ((h * 3600L + m * 60L + sec) * 1000000000L + nanos, off)
  }

  /** strip a trailing [Zone/Name] suffix. */
  def splitZone(s: String): (String, Option[String]) = {
    val i = s.indexOf('[')
    if (i < 0) (s, None)
    else {
      if (!s.endsWith("]")) err(s"bad timezone suffix: $s")
      (s.substring(0, i), Some(s.substring(i + 1, s.length - 1)))
    }
  }

  def parseLocalTime(s: String): LocalTimeV = {
    val (body, zone) = splitZone(s)
    val (nano, off) = parseTimePart(body)
    if (zone.isDefined || off.isDefined) () // localtime() DROPS the offset
    LocalTimeV(nano)
  }

  def parseTime(s: String, defaultOffset: Int): TimeV = {
    val (body, zone) = splitZone(s)
    val (nano, off) = parseTimePart(body)
    val offset = off.orElse(zone.map(z => zoneOf(z) match {
      case o: ZoneOffset => o.getTotalSeconds
      case zid => zid.getRules.getOffset(Instant.now()).getTotalSeconds
    })).getOrElse(defaultOffset)
    TimeV(nano, offset)
  }

  def parseLocalDateTime(s0: String): LocalDateTimeV = {
    val (body, _) = splitZone(s0.trim)
    val ti = body.indexOf('T')
    val (dPart, tPart) =
      if (ti < 0) (body, "") else (body.substring(0, ti), body.substring(ti + 1))
    val d = parseDate(dPart)
    val (nano, _) =
      if (tPart.isEmpty) (0L, None) else parseTimePart(tPart)
    val lt = LocalTime.ofNanoOfDay(nano)
    val ldt = LocalDateTime.of(d, lt)
    LocalDateTimeV(ldt.toEpochSecond(ZoneOffset.UTC), ldt.getNano)
  }

  def parseDateTime(s0: String, defaultZone: String): DateTimeV = {
    val (body, zoneName) = splitZone(s0.trim)
    val ti = body.indexOf('T')
    val (dPart, tPart) =
      if (ti < 0) (body, "") else (body.substring(0, ti), body.substring(ti + 1))
    val d = parseDate(dPart)
    val (nano, off) =
      if (tPart.isEmpty) (0L, None) else parseTimePart(tPart)
    val lt = LocalTime.ofNanoOfDay(nano)
    val ldt = LocalDateTime.of(d, lt)
    val zone: ZoneId = zoneName.map(zoneOf).getOrElse(
      off.map(o => ZoneOffset.ofTotalSeconds(o): ZoneId)
        .getOrElse(zoneOf(defaultZone)))
    // explicit offset + named zone: offset wins for the instant, zone kept
    off match {
      case Some(o) if zoneName.isDefined =>
        fromZdt(ZonedDateTime.ofStrict(
          ldt, ZoneOffset.ofTotalSeconds(o), zone))
      case _ => ofLocal(ldt, zone)
    }
  }

  def parseDuration(s0: String): DurationV = {
    val s = s0.trim
    val neg = s.startsWith("-")
    val body0 = if (neg || s.startsWith("+")) s.substring(1) else s
    if (!body0.startsWith("P")) err(s"cannot parse duration: $s0")
    val body = body0.substring(1)
    // alternative P<date>T<time> form: P2012-02-02T14:37:21.545
    if (body.length > 4 && (body(4) == '-' || body.count(_.isDigit) >= 8) &&
        !body.take(5).exists(c => c == 'Y' || c == 'M' || c == 'W' ||
          c == 'D')) {
      try {
        val ti2 = body.indexOf('T')
        val d = parseDate(if (ti2 < 0) body else body.substring(0, ti2))
        val (nano, _) =
          if (ti2 < 0) (0L, None) else parseTimePart(body.substring(ti2 + 1))
        // P<yyyy-mm-dd>T<time>: the fields are component COUNTS
        val dd = durationOf(d.getYear.toLong * 12 + d.getMonthValue,
          d.getDayOfMonth.toLong, BigInt(nano))
        return if (neg) negateDuration(dd) else dd
      } catch { case _: TemporalError => () } // fall through to unit form
    }
    val ti = body.indexOf('T')
    val datePart = if (ti < 0) body else body.substring(0, ti)
    val timePart = if (ti < 0) "" else body.substring(ti + 1)
    val unitRe = """([+-]?\d+(?:\.\d+)?)([A-Za-z])""".r
    var months = 0.0; var days = 0.0
    var hours = 0.0; var minutes = 0.0; var seconds = 0.0
    var matchedLen = 0
    unitRe.findAllMatchIn(datePart).foreach { m =>
      matchedLen += m.matched.length
      val v = m.group(1).toDouble
      m.group(2).toUpperCase match {
        case "Y" => months += v * 12
        case "M" => months += v
        case "W" => days += v * 7
        case "D" => days += v
        case u => err(s"bad duration unit $u in: $s0")
      }
    }
    if (matchedLen != datePart.length) err(s"cannot parse duration: $s0")
    matchedLen = 0
    unitRe.findAllMatchIn(timePart).foreach { m =>
      matchedLen += m.matched.length
      val v = m.group(1).toDouble
      m.group(2).toUpperCase match {
        case "H" => hours += v
        case "M" => minutes += v
        case "S" => seconds += v
        case u => err(s"bad duration unit $u in: $s0")
      }
    }
    if (matchedLen != timePart.length) err(s"cannot parse duration: $s0")
    val d = durationFromUnits(months, days, hours, minutes, seconds, 0, 0, 0, 0)
    if (neg) negateDuration(d) else d
  }

  def negateDuration(d: DurationV): DurationV =
    durationOf(-d.months, -d.days, -(BigInt(d.seconds) * 1000000000 + d.nanos))

  /** Map-unit construction with Neo4j's fraction cascade: the fractional
    * remainder of each calendar unit flows into the next smaller one
    * (0.5 months → 15.1875 avg days → …).
    */
  /** Neo4j's average-month second count (365.2425 × 86400 / 12). */
  private val AvgSecondsPerMonth = 2629746.0

  def durationFromUnits(monthsD: Double, daysD: Double, hoursD: Double,
      minutesD: Double, secondsD: Double, millis: Double, micros: Double,
      nanos: Double, weeksFracDays: Double): DurationV = {
    val months = monthsD.toLong
    // fractional months cascade into days (avg month = 2,629,746 s), the
    // whole-day part lands in days, the remainder cascades to seconds
    val daysTotal = daysD + weeksFracDays +
      (monthsD - months) * AvgSecondsPerMonth / 86400.0
    val days = daysTotal.toLong
    val secsTotal = (daysTotal - days) * 86400.0 + hoursD * 3600.0 +
      minutesD * 60.0 + secondsD
    val totalNanos = BigInt(math.rint(secsTotal * 1e9).toLong) +
      BigInt(math.rint(millis * 1e6).toLong) +
      BigInt(math.rint(micros * 1e3).toLong) +
      BigInt(math.rint(nanos).toLong)
    durationOf(months, days, totalNanos)
  }

  // ── map-based construction ───────────────────────────────────────────────
  /** Lowercased component map; values are decoded scalars (Long / Double /
    * String / TVal).
    */
  type CMap = List[(String, Any)]
  private def get(m: CMap, k: String): Option[Any] =
    m.find(_._1.equalsIgnoreCase(k)).map(_._2)
  private def getL(m: CMap, k: String): Option[Long] = get(m, k).map {
    case x: Long => x
    case x: Int => x.toLong
    case x: Double if x == x.toLong => x.toLong
    case other => err(s"$k must be an integer, got: $other")
  }
  private def getD(m: CMap, k: String): Option[Double] = get(m, k).map {
    case x: Long => x.toDouble
    case x: Int => x.toDouble
    case x: Double => x
    case other => err(s"$k must be numeric, got: $other")
  }

  private def baseDate(m: CMap): Option[LocalDate] = get(m, "date").map {
    case d: DateV => toLocalDate(d)
    case l: LocalDateTimeV => toLdt(l).toLocalDate
    case z: DateTimeV => toZdt(z).toLocalDate
    case other => err(s"date: expects a date value, got: $other")
  }.orElse(get(m, "datetime").map {
    case z: DateTimeV => toZdt(z).toLocalDate
    case l: LocalDateTimeV => toLdt(l).toLocalDate
    case other => err(s"datetime: expects a datetime value, got: $other")
  })

  private def baseTime(m: CMap): Option[(LocalTime, Option[Int])] =
    get(m, "time").map {
      case LocalTimeV(n) => (toLocalTime(n), None)
      case TimeV(n, off) => (toLocalTime(n), Some(off))
      case l: LocalDateTimeV => (toLdt(l).toLocalTime, None)
      case z: DateTimeV =>
        val zdt = toZdt(z); (zdt.toLocalTime, Some(zdt.getOffset.getTotalSeconds))
      case other => err(s"time: expects a time value, got: $other")
    }.orElse(get(m, "datetime").map {
      case z: DateTimeV =>
        val zdt = toZdt(z); (zdt.toLocalTime, Some(zdt.getOffset.getTotalSeconds))
      case l: LocalDateTimeV => (toLdt(l).toLocalTime, None)
      case other => err(s"datetime: expects a datetime value, got: $other")
    })

  /** Map/selection construction: every component not explicitly given is
    * inherited from the base value (TCK Temporal3 — `{date: other,
    * quarter: 3}` keeps the base's dayOfQuarter); without a base, finer
    * components default to their unit floor.
    */
  def dateFromMap(m: CMap): LocalDate = {
    val base = baseDate(m)
    val wf = WeekFields.ISO
    def has(k: String) = get(m, k).isDefined
    if (has("week") || (has("dayOfWeek") && !has("month") && !has("day") &&
        !has("ordinalDay") && !has("quarter"))) {
      val wyear = getL(m, "year")
        .orElse(base.map(_.get(wf.weekBasedYear()).toLong))
        .getOrElse(err("week date needs a year"))
      val week = getL(m, "week")
        .orElse(base.map(_.get(wf.weekOfWeekBasedYear()).toLong))
        .getOrElse(1L)
      val dow = getL(m, "dayOfWeek")
        .orElse(base.map(_.getDayOfWeek.getValue.toLong))
        .getOrElse(1L)
      isoWeekDate(wyear.toInt, week.toInt, dow.toInt)
    } else if (has("quarter") || has("dayOfQuarter")) {
      val y = getL(m, "year").orElse(base.map(_.getYear.toLong))
        .getOrElse(err("quarter date needs a year"))
      val q = getL(m, "quarter")
        .orElse(base.map(_.get(IsoFields.QUARTER_OF_YEAR).toLong))
        .getOrElse(1L)
      val dq = getL(m, "dayOfQuarter")
        .orElse(base.map(_.get(IsoFields.DAY_OF_QUARTER).toLong))
        .getOrElse(1L)
      quarterDate(y.toInt, q.toInt, dq.toInt)
    } else if (has("ordinalDay")) {
      val y = getL(m, "year").orElse(base.map(_.getYear.toLong))
        .getOrElse(err("ordinal date needs a year"))
      LocalDate.ofYearDay(y.toInt, getL(m, "ordinalDay").get.toInt)
    } else {
      val y = getL(m, "year").orElse(base.map(_.getYear.toLong))
        .getOrElse(err("date needs a year"))
      val mo = getL(m, "month")
        .orElse(base.map(_.getMonthValue.toLong)).getOrElse(1L)
      val d = getL(m, "day")
        .orElse(base.map(_.getDayOfMonth.toLong)).getOrElse(1L)
      if (mo < 1 || mo > 12) err(s"month out of range: $mo")
      LocalDate.of(y.toInt, mo.toInt, d.toInt) // day range raises in java.time
    }
  }

  def timeFromMap(m: CMap): (LocalTime, Option[Int]) = {
    val base = baseTime(m)
    var lt = base.map(_._1).getOrElse(LocalTime.MIDNIGHT)
    val explicit = Seq("hour", "minute", "second", "millisecond",
      "microsecond", "nanosecond").exists(k => get(m, k).isDefined)
    if (explicit) {
      // components not given inherit from the base (TCK Temporal3 [2]:
      // {time: t, second: 42} keeps the base's fraction); an explicit
      // sub-second component replaces the WHOLE fraction
      val h = getL(m, "hour").getOrElse(lt.getHour.toLong)
      val mi = getL(m, "minute").getOrElse(lt.getMinute.toLong)
      val sec = getL(m, "second").getOrElse(lt.getSecond.toLong)
      val subExplicit = Seq("millisecond", "microsecond", "nanosecond")
        .exists(k => get(m, k).isDefined)
      val nano =
        if (subExplicit)
          getL(m, "millisecond").getOrElse(0L) * 1000000L +
            getL(m, "microsecond").getOrElse(0L) * 1000L +
            getL(m, "nanosecond").getOrElse(0L)
        else lt.getNano.toLong
      if (h > 23 || mi > 59 || sec > 59 || nano > 999999999L)
        err(s"time component out of range")
      lt = LocalTime.of(h.toInt, mi.toInt, sec.toInt, nano.toInt)
    }
    (lt, base.flatMap(_._2))
  }

  def tzOf(m: CMap): Option[String] = get(m, "timezone").map {
    case s: String => s
    case other => err(s"timezone must be a string, got: $other")
  }

  /** datetime({epochSeconds:}/{epochMillis:}) construction. */
  def getEpoch(m: CMap): Option[DateTimeV] = {
    val es = getL(m, "epochSeconds")
    val em = getL(m, "epochMillis")
    if (es.isEmpty && em.isEmpty) None
    else {
      val zone = tzOf(m).getOrElse("Z")
      val inst = es match {
        case Some(s) =>
          Instant.ofEpochSecond(s, getL(m, "nanosecond").getOrElse(0L))
        case None => Instant.ofEpochMilli(em.get)
      }
      Some(fromZdt(ZonedDateTime.ofInstant(inst, zoneOf(zone))))
    }
  }

  def durationFromMap(m: CMap): DurationV = {
    val known = Set("years", "quarters", "months", "weeks", "days", "hours",
      "minutes", "seconds", "milliseconds", "microseconds", "nanoseconds")
    m.foreach { case (k, _) =>
      if (!known.exists(_.equalsIgnoreCase(k)))
        err(s"unknown duration component: $k")
    }
    val years = getD(m, "years").getOrElse(0.0)
    val quarters = getD(m, "quarters").getOrElse(0.0)
    val months = getD(m, "months").getOrElse(0.0)
    val weeks = getD(m, "weeks").getOrElse(0.0)
    val days = getD(m, "days").getOrElse(0.0)
    durationFromUnits(
      years * 12 + quarters * 3 + months,
      days, getD(m, "hours").getOrElse(0.0),
      getD(m, "minutes").getOrElse(0.0),
      getD(m, "seconds").getOrElse(0.0),
      getD(m, "milliseconds").getOrElse(0.0),
      getD(m, "microseconds").getOrElse(0.0),
      getD(m, "nanoseconds").getOrElse(0.0),
      weeks * 7)
  }

  // ── truncation ───────────────────────────────────────────────────────────
  def truncateDate(unit: String, d: LocalDate): LocalDate =
    unit.toLowerCase match {
      case "millennium" => LocalDate.of(d.getYear / 1000 * 1000, 1, 1)
      case "century" => LocalDate.of(d.getYear / 100 * 100, 1, 1)
      case "decade" => LocalDate.of(d.getYear / 10 * 10, 1, 1)
      case "year" => LocalDate.of(d.getYear, 1, 1)
      case "weekyear" =>
        isoWeekDate(d.get(WeekFields.ISO.weekBasedYear()), 1, 1)
      case "quarter" =>
        LocalDate.of(d.getYear, (d.get(IsoFields.QUARTER_OF_YEAR) - 1) * 3 + 1, 1)
      case "month" => LocalDate.of(d.getYear, d.getMonthValue, 1)
      case "week" => d.`with`(WeekFields.ISO.dayOfWeek(), 1)
      case "day" => d
      case u => err(s"unit $u too small to truncate a date")
    }

  private val timeUnits = Map(
    "day" -> 86400000000000L,
    "hour" -> 3600000000000L, "minute" -> 60000000000L,
    "second" -> 1000000000L, "millisecond" -> 1000000L,
    "microsecond" -> 1000L)

  def truncateTimeNano(unit: String, nanoOfDay: Long): Long =
    timeUnits.get(unit.toLowerCase) match {
      case Some(q) => nanoOfDay / q * q
      case None => err(s"cannot truncate time to: $unit")
    }

  def isDateUnit(unit: String): Boolean = Set("millennium", "century",
    "decade", "year", "weekyear", "quarter", "month", "week",
    "day")(unit.toLowerCase)

  /** `<kind>.truncate(unit, src [, overrides])` (TCK Temporal9): truncate
    * to `unit`, re-compose as `kind`, then apply component overrides
    * through the map constructors (which inherit un-overridden components
    * from the truncated base).
    */
  def truncate(kind: String, unit: String, src: TVal, ov: CMap,
      defaultZone: String): TVal = {
    val u = unit.toLowerCase
    def dateOf(v: TVal): Option[LocalDate] = v match {
      case d: DateV => Some(toLocalDate(d))
      case l: LocalDateTimeV => Some(toLdt(l).toLocalDate)
      case z: DateTimeV => Some(toZdt(z).toLocalDate)
      case _ => None
    }
    def timeOf(v: TVal): Option[(LocalTime, Option[Int])] = v match {
      case LocalTimeV(n) => Some((toLocalTime(n), None))
      case TimeV(n, o) => Some((toLocalTime(n), Some(o)))
      case l: LocalDateTimeV => Some((toLdt(l).toLocalTime, None))
      case z: DateTimeV =>
        val zdt = toZdt(z)
        Some((zdt.toLocalTime, Some(zdt.getOffset.getTotalSeconds)))
      case _ => None
    }
    val srcZoneName: Option[String] = src match {
      case z: DateTimeV if !z.zone.startsWith("+") &&
        !z.zone.startsWith("-") && z.zone != "Z" => Some(z.zone)
      case _ => None
    }
    val sd = dateOf(src); val st = timeOf(src)
    val (nd, nt): (Option[LocalDate], LocalTime) =
      if (isDateUnit(u)) {
        val d = sd.getOrElse(err(s"cannot truncate to $u without a date"))
        (Some(truncateDate(u, d)), LocalTime.MIDNIGHT)
      } else {
        val t = st.map(_._1).getOrElse(
          err(s"cannot truncate to $u without a time"))
        (sd, LocalTime.ofNanoOfDay(truncateTimeNano(u, t.toNanoOfDay)))
      }
    val baseOff = st.flatMap(_._2)
    // sub-second overrides are ADDITIVE on the truncated fraction (TCK
    // Temporal9: truncate('millisecond', t, {nanosecond: 2}) keeps the
    // truncated .645 and lands on .645000002)
    val subKeys = Seq("millisecond", "microsecond", "nanosecond")
    val subAdd = subKeys.flatMap(k => ov.collectFirst {
      case (k2, v: Long) if k2.equalsIgnoreCase(k) =>
        v * (k match {
          case "millisecond" => 1000000L
          case "microsecond" => 1000L
          case _ => 1L
        })
    }).sum
    val ov2 = ov.filterNot(e => subKeys.exists(e._1.equalsIgnoreCase))
    val ntAdj = if (subAdd != 0) LocalTime.ofNanoOfDay(
      nt.toNanoOfDay + subAdd) else nt
    val baseTimeVal: Any = baseOff match {
      case Some(o) => TimeV(ntAdj.toNanoOfDay, o)
      case None => LocalTimeV(ntAdj.toNanoOfDay)
    }
    val base: CMap =
      nd.map(d => "date" -> (DateV(d.toEpochDay): Any)).toList ++
        List("time" -> baseTimeVal)
    val merged = ov2 ++ base
    kind match {
      case "date" =>
        if (!isDateUnit(u)) err(s"unit $u too small to truncate a date")
        DateV(dateFromMap(merged).toEpochDay)
      case "localtime" =>
        val (lt, _) = timeFromMap(merged); LocalTimeV(lt.toNanoOfDay)
      case "time" =>
        val (lt, bo) = timeFromMap(merged)
        val off = tzOf(merged).map(z => zoneOf(z) match {
          case o: ZoneOffset => o.getTotalSeconds
          case zid => zid.getRules.getOffset(Instant.now()).getTotalSeconds
        }).orElse(bo).getOrElse(0)
        TimeV(lt.toNanoOfDay, off)
      case "localdatetime" =>
        val d = dateFromMap(merged)
        val (lt, _) = timeFromMap(merged)
        val ldt = LocalDateTime.of(d, lt)
        LocalDateTimeV(ldt.toEpochSecond(ZoneOffset.UTC), ldt.getNano)
      case "datetime" =>
        val d = dateFromMap(merged)
        val (lt, bo) = timeFromMap(merged)
        val zoneStr = tzOf(merged)
          .orElse(srcZoneName)
          .orElse(bo.map(o => ZoneOffset.ofTotalSeconds(o).getId match {
            case "Z" => "Z"; case id => id
          }))
          .getOrElse(defaultZone)
        ofLocal(LocalDateTime.of(d, lt), zoneOf(zoneStr))
      case other => err(s"$other.truncate is not a temporal constructor")
    }
  }

  // ── duration.between ─────────────────────────────────────────────────────
  /** promote operands to comparable LocalDateTime (+zone) pair. */
  private def asLdtPair(a: TVal, b: TVal): (LocalDateTime, LocalDateTime) = {
    def ldtOf(v: TVal, other: TVal): LocalDateTime = v match {
      case d: DateV => toLocalDate(d).atStartOfDay()
      case l: LocalDateTimeV => toLdt(l)
      case z: DateTimeV => toZdt(z).toLocalDateTime
      case LocalTimeV(n) =>
        LocalDateTime.of(LocalDate.ofEpochDay(0), toLocalTime(n))
      case TimeV(n, _) =>
        LocalDateTime.of(LocalDate.ofEpochDay(0), toLocalTime(n))
      case other2 => err(s"cannot compute duration between: $other2")
    }
    // when only one side carries a date, the other inherits it
    def hasDate(v: TVal) = v match {
      case _: DateV | _: LocalDateTimeV | _: DateTimeV => true
      case _ => false
    }
    var la = ldtOf(a, b); var lb = ldtOf(b, a)
    if (hasDate(a) && !hasDate(b)) lb = LocalDateTime.of(la.toLocalDate, lb.toLocalTime)
    if (hasDate(b) && !hasDate(a)) la = LocalDateTime.of(lb.toLocalDate, la.toLocalTime)
    // time-of-day presence: a pure date contributes midnight (already)
    (la, lb)
  }

  def between(kind: String, a: TVal, b: TVal): DurationV = {
    val (la, lb) = asLdtPair(a, b)
    // zone-aware anchors: if either side carries a zone/offset, compute on
    // ZonedDateTime with b converted into a's zone — java.time's until()
    // then matches Neo4j: calendar units on the local line, clock units on
    // the instant line (DST-correct, TCK Temporal10 [1]/[8])
    def zoneIdOf(v: TVal): Option[ZoneId] = v match {
      case z: DateTimeV => Some(zoneOf(z.zone))
      case TimeV(_, o) => Some(ZoneOffset.ofTotalSeconds(o))
      case _ => None
    }
    val (ta, tb): (java.time.temporal.Temporal, java.time.temporal.Temporal) =
      (zoneIdOf(a), zoneIdOf(b)) match {
        case (None, None) => (la, lb)
        case (za, zb) =>
          val anchor = za.getOrElse(zb.get)
          val zdtA = la.atZone(za.getOrElse(anchor))
          val zdtB = lb.atZone(zb.getOrElse(anchor))
            .withZoneSameInstant(anchor)
          (zdtA, zdtB)
      }
    kind match {
      case "between" =>
        // calendar months, then whole days, then clock nanos
        val months = ChronoUnit.MONTHS.between(ta, tb)
        val afterM = ta.plus(months, ChronoUnit.MONTHS)
        val days = ChronoUnit.DAYS.between(afterM, tb)
        val afterD = afterM.plus(days, ChronoUnit.DAYS)
        val secs = ChronoUnit.SECONDS.between(afterD, tb)
        val afterS = afterD.plus(secs, ChronoUnit.SECONDS)
        val nanos = ChronoUnit.NANOS.between(afterS, tb)
        durationOf(months, days, BigInt(secs) * 1000000000 + nanos)
      case "inmonths" =>
        DurationV(ChronoUnit.MONTHS.between(ta, tb), 0, 0, 0)
      case "indays" =>
        DurationV(0, ChronoUnit.DAYS.between(ta, tb), 0, 0)
      case "inseconds" =>
        // SECONDS first — NANOS.between alone overflows past ±292 years
        val secs = ChronoUnit.SECONDS.between(ta, tb)
        val afterS = ta.plus(secs, ChronoUnit.SECONDS)
        val nanos = ChronoUnit.NANOS.between(afterS, tb)
        durationOf(0, 0, BigInt(secs) * 1000000000 + nanos)
      case other => err(s"unknown duration projection: $other")
    }
  }

  // ── arithmetic ───────────────────────────────────────────────────────────
  def plus(a: TVal, d: DurationV): TVal = a match {
    case x: DateV =>
      // date arithmetic truncates the duration's clock part to WHOLE days
      // (TCK Temporal8 [1] #3: 1.4 clock-days contribute 1 calendar day)
      val clockDays = (BigInt(d.seconds) * 1000000000 + d.nanos) /
        BigInt(86400L * 1000000000L)
      DateV(toLocalDate(x).plusMonths(d.months)
        .plusDays(d.days + clockDays.toLong).toEpochDay)
    case LocalTimeV(n) =>
      LocalTimeV(Math.floorMod(n + d.totalNanos, 86400000000000L))
    case TimeV(n, off) =>
      TimeV(Math.floorMod(n + d.totalNanos, 86400000000000L), off)
    case l: LocalDateTimeV =>
      val r = toLdt(l).plusMonths(d.months).plusDays(d.days)
        .plusSeconds(d.seconds).plusNanos(d.nanos)
      LocalDateTimeV(r.toEpochSecond(ZoneOffset.UTC), r.getNano)
    case z: DateTimeV =>
      val r = toZdt(z).plusMonths(d.months).plusDays(d.days)
        .plusSeconds(d.seconds).plusNanos(d.nanos)
      fromZdt(r)
    case dur: DurationV =>
      durationOf(dur.months + d.months, dur.days + d.days,
        BigInt(dur.seconds) * 1000000000 + dur.nanos +
          BigInt(d.seconds) * 1000000000 + d.nanos)
  }

  def minus(a: TVal, d: DurationV): TVal = plus(a, negateDuration(d))

  def mulDuration(d: DurationV, k: Double): DurationV = {
    if (k == k.toLong) {
      val n = k.toLong
      durationOf(d.months * n, d.days * n,
        (BigInt(d.seconds) * 1000000000 + d.nanos) * n)
    } else durationFromUnits(d.months * k, d.days * k, 0, 0, 0, 0, 0,
      (d.seconds * 1e9 + d.nanos) * k, 0)
  }

  def divDuration(d: DurationV, k: Double): DurationV = {
    if (k == 0) err("duration / 0")
    durationFromUnits(d.months / k, d.days / k, 0, 0, 0, 0, 0,
      (d.seconds * 1e9 + d.nanos) / k, 0)
  }

  // ── component access ─────────────────────────────────────────────────────
  /** `.component` → decoded scalar (Long / Double / String) or null. */
  def component(v: TVal, key: String): Any = {
    val k = key // case-sensitive per openCypher accessor names
    def ofDate(d: LocalDate): PartialFunction[String, Any] = {
      case "year" => d.getYear.toLong
      case "quarter" => d.get(IsoFields.QUARTER_OF_YEAR).toLong
      case "month" => d.getMonthValue.toLong
      case "week" => d.get(WeekFields.ISO.weekOfWeekBasedYear()).toLong
      case "weekYear" => d.get(WeekFields.ISO.weekBasedYear()).toLong
      case "day" => d.getDayOfMonth.toLong
      case "ordinalDay" => d.getDayOfYear.toLong
      case "dayOfWeek" | "weekDay" => d.getDayOfWeek.getValue.toLong
      case "dayOfQuarter" =>
        (d.getDayOfYear - truncateDate("quarter", d).getDayOfYear + 1).toLong
    }
    def ofTime(t: LocalTime): PartialFunction[String, Any] = {
      case "hour" => t.getHour.toLong
      case "minute" => t.getMinute.toLong
      case "second" => t.getSecond.toLong
      case "millisecond" => (t.getNano / 1000000).toLong
      case "microsecond" => (t.getNano / 1000).toLong
      case "nanosecond" => t.getNano.toLong
    }
    def ofOffset(offSec: Int, zoneName: Option[String]): PartialFunction[String, Any] = {
      case "timezone" => zoneName.getOrElse(
        ZoneOffset.ofTotalSeconds(offSec).getId match {
          case "Z" => "Z"; case id => id
        })
      case "offset" => ZoneOffset.ofTotalSeconds(offSec).getId match {
        case "Z" => "Z"; case id => id
      }
      case "offsetMinutes" => (offSec / 60).toLong
      case "offsetSeconds" => offSec.toLong
    }
    val pf: PartialFunction[String, Any] = v match {
      case d: DateV => ofDate(toLocalDate(d))
      case LocalTimeV(n) => ofTime(toLocalTime(n))
      case TimeV(n, off) => ofTime(toLocalTime(n)).orElse(ofOffset(off, None))
      case l: LocalDateTimeV =>
        val ldt = toLdt(l)
        ofDate(ldt.toLocalDate).orElse(ofTime(ldt.toLocalTime)).orElse {
          case "epochSeconds" => l.epochSec
          case "epochMillis" => l.epochSec * 1000 + l.nano / 1000000
        }
      case z: DateTimeV =>
        val zdt = toZdt(z)
        ofDate(zdt.toLocalDate).orElse(ofTime(zdt.toLocalTime))
          .orElse(ofOffset(zdt.getOffset.getTotalSeconds,
            zdt.getZone match {
              case _: ZoneOffset => None
              case zid => Some(zid.getId)
            }))
          .orElse {
            case "epochSeconds" => z.epochSec
            case "epochMillis" => z.epochSec * 1000 + z.nano / 1000000
          }
      case d: DurationV =>
        // second-family components use the FLOOR-normalized storage form
        // (seconds signed, nanos ∈ [0, 1e9) — TCK Temporal10 [1] #4:
        // -86399.9s → seconds -86400, nanosecondsOfSecond 100000000)
        val pfd: PartialFunction[String, Any] = {
          case "years" => d.months / 12
          case "quarters" => d.months / 3
          case "months" => d.months
          case "weeks" => d.days / 7
          case "days" => d.days
          case "hours" => d.seconds / 3600
          case "minutes" => d.seconds / 60
          case "seconds" => d.seconds
          case "milliseconds" => d.seconds * 1000 + d.nanos / 1000000
          case "microseconds" => d.seconds * 1000000 + d.nanos / 1000
          case "nanoseconds" => d.seconds * 1000000000L + d.nanos
          case "monthsOfYear" => d.months % 12
          case "monthsOfQuarter" => d.months % 3
          case "quartersOfYear" => (d.months % 12) / 3
          case "daysOfWeek" => d.days % 7
          case "minutesOfHour" => (d.seconds / 60) % 60
          case "secondsOfMinute" => d.seconds % 60
          case "millisecondsOfSecond" => d.nanos / 1000000
          case "microsecondsOfSecond" => d.nanos / 1000
          case "nanosecondsOfSecond" => d.nanos
        }
        pfd
    }
    pf.lift(k).orNull
  }
}

/** Catalyst expression dispatching temporal functions over variant-struct
  * children. CodegenFallback: calendar scalar work outside the analytical
  * hot path (see [[TemporalOps]] doc).
  */
case class TemporalFn(fn: String, children: Seq[Expression])
  extends Expression with CodegenFallback with graft.plans.GraftThrowing {
  import TemporalOps._

  override def dataType: DataType = fn match {
    case "render" => StringType
    case _ => Values.variantType
  }
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  private def decodeAny(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: InternalRow, st: StructType) if st.fieldNames.headOption.contains("t") =>
      r.getInt(0) match {
        case Values.T_INT => r.getLong(1)
        case Values.T_FLOAT => r.getDouble(2)
        case Values.T_STRING => r.getUTF8String(3).toString
        case Values.T_BOOL => r.getBoolean(4)
        case t if isTemporalTag(t) => decode(r)
        case _ => err2(s"unsupported argument value for $fn")
      }
    case (s: UTF8String, _) => s.toString
    case (x, _) => x
  }
  private def err2(msg: String): Nothing =
    throw new TemporalOps.TemporalError(msg)

  private val width = Values.variantType.fields.length

  private def enc(v: TVal): InternalRow = encode(v, width)
  private def encAny(x: Any): Any = x match {
    case null => null
    case v: TVal => enc(v)
    case i: Int =>
      val a = new Array[Any](width); a(0) = Values.T_INT; a(1) = i.toLong
      new GenericInternalRow(a)
    case l: Long =>
      val a = new Array[Any](width); a(0) = Values.T_INT; a(1) = l
      new GenericInternalRow(a)
    case d: Double =>
      val a = new Array[Any](width); a(0) = Values.T_FLOAT; a(2) = d
      new GenericInternalRow(a)
    case s: String =>
      val a = new Array[Any](width)
      a(0) = Values.T_STRING; a(3) = UTF8String.fromString(s)
      new GenericInternalRow(a)
    case b: Boolean =>
      val a = new Array[Any](width); a(0) = Values.T_BOOL; a(4) = b
      new GenericInternalRow(a)
    case other => err2(s"cannot encode $other")
  }

  /** component map child: MapType(String, variant) → CMap. */
  private def cmapOf(v: Any, dt: DataType): CMap = (v, dt) match {
    case (m: MapData, MapType(StringType, vt: StructType, _)) =>
      val keys = m.keyArray(); val vals = m.valueArray()
      (0 until m.numElements()).toList.map { i =>
        val value = if (vals.isNullAt(i)) null
          else decodeAny(vals.getStruct(i, vt.fields.length), vt)
        keys.getUTF8String(i).toString -> value
      }.filter(_._2 != null)
    case other => err2(s"expected a component map, got: $other")
  }

  override def eval(input: InternalRow): Any = {
    val raw = children.map(_.eval(input))
    val dts = children.map(_.dataType)
    def arg(i: Int): Any = decodeAny(raw(i), dts(i))
    def temporal(i: Int): TVal = arg(i) match {
      case t: TVal => t
      case other => err2(s"$fn expects a temporal value, got: $other")
    }

    val defaultZone = "Z"
    fn match {
      // constructors: child0 = discriminator literal is the function name
      case "date" | "localtime" | "time" | "localdatetime" | "datetime" |
          "duration" =>
        if (raw.isEmpty) currentOf(fn, defaultZone)
        else if (raw.head == null) null
        else (dts.head, raw.head) match {
          case (MapType(StringType, _, _), _) =>
            val m = cmapOf(raw.head, dts.head)
            enc(fromMap(fn, m, defaultZone))
          case _ => arg(0) match {
            case s: String => enc(fromString(fn, s, defaultZone))
            case t: TVal => enc(convert(fn, t, defaultZone))
            case other => err2(s"$fn cannot construct from: $other")
          }
        }
      case t if t.startsWith("truncate_") =>
        // children: unitVariant, temporalVariant [, overrides map]
        if (raw(0) == null || raw(1) == null) return null
        val kind = t.substring("truncate_".length)
        val unit = arg(0) match {
          case s: String => s
          case other => err2(s"truncate unit must be a string: $other")
        }
        val src = temporal(1)
        val overrides: CMap =
          if (raw.length > 2 && raw(2) != null) cmapOf(raw(2), dts(2))
          else Nil
        enc(TemporalOps.truncate(kind, unit, src, overrides, defaultZone))
      case "between" | "inmonths" | "indays" | "inseconds" =>
        if (raw(0) == null || raw(1) == null) return null
        enc(TemporalOps.between(fn, temporal(0), temporal(1)))
      case "component" =>
        if (raw(0) == null || raw(1) == null) return null
        val key = arg(1) match {
          case s: String => s
          case other => err2(s"component key must be a string: $other")
        }
        encAny(component(temporal(0), key))
      case "add" | "sub" =>
        if (raw(0) == null || raw(1) == null) return null
        (arg(0), arg(1)) match {
          case (a: TVal, d: DurationV) =>
            enc(if (fn == "add") plus(a, d) else minus(a, d))
          case (d: DurationV, b: TVal) if fn == "add" =>
            // duration + temporal commutes
            enc(plus(b, d))
          case (a, b) => err2(s"cannot $fn $a and $b")
        }
      case "mul" | "div" =>
        if (raw(0) == null || raw(1) == null) return null
        (arg(0), arg(1)) match {
          case (d: DurationV, k: Long) =>
            enc(if (fn == "mul") mulDuration(d, k.toDouble)
              else divDuration(d, k.toDouble))
          case (d: DurationV, k: Double) =>
            enc(if (fn == "mul") mulDuration(d, k) else divDuration(d, k))
          case (k: Long, d: DurationV) if fn == "mul" =>
            enc(mulDuration(d, k.toDouble))
          case (k: Double, d: DurationV) if fn == "mul" =>
            enc(mulDuration(d, k))
          case (a, b) => err2(s"cannot $fn $a and $b")
        }
      case "fromepoch" =>
        if (raw(0) == null || raw(1) == null) return null
        (arg(0), arg(1)) match {
          case (s: Long, n: Long) =>
            enc(fromZdt(ZonedDateTime.ofInstant(
              Instant.ofEpochSecond(s, n), ZoneOffset.UTC)))
          case (a, b) => err2(s"fromepoch expects integers, got: $a, $b")
        }
      case "fromepochmillis" =>
        if (raw(0) == null) return null
        arg(0) match {
          case ms: Long => enc(fromZdt(ZonedDateTime.ofInstant(
            Instant.ofEpochMilli(ms), ZoneOffset.UTC)))
          case a => err2(s"fromepochmillis expects an integer, got: $a")
        }
      case "render" =>
        if (raw(0) == null) return null
        UTF8String.fromString(render(temporal(0)))
      case other => err2(s"unknown temporal fn: $other")
    }
  }

  private def currentOf(kind: String, zone: String): InternalRow = {
    val now = ZonedDateTime.now(zoneOf(zone))
    enc(convert(kind, fromZdt(now), zone))
  }

  private def fromString(kind: String, s: String, zone: String): TVal =
    kind match {
      case "date" => DateV(parseDate(s).toEpochDay)
      case "localtime" => parseLocalTime(s)
      case "time" => parseTime(s, 0)
      case "localdatetime" => parseLocalDateTime(s)
      case "datetime" => parseDateTime(s, zone)
      case "duration" => parseDuration(s)
    }

  private def convert(kind: String, t: TVal, zone: String): TVal =
    (kind, t) match {
      case ("date", d: DateV) => d
      case ("date", l: LocalDateTimeV) => DateV(toLdt(l).toLocalDate.toEpochDay)
      case ("date", z: DateTimeV) => DateV(toZdt(z).toLocalDate.toEpochDay)
      case ("localtime", LocalTimeV(n)) => LocalTimeV(n)
      case ("localtime", TimeV(n, _)) => LocalTimeV(n)
      case ("localtime", l: LocalDateTimeV) =>
        LocalTimeV(toLdt(l).toLocalTime.toNanoOfDay)
      case ("localtime", z: DateTimeV) =>
        LocalTimeV(toZdt(z).toLocalTime.toNanoOfDay)
      case ("time", TimeV(n, o)) => TimeV(n, o)
      case ("time", LocalTimeV(n)) => TimeV(n, 0)
      case ("time", z: DateTimeV) =>
        val zdt = toZdt(z)
        TimeV(zdt.toLocalTime.toNanoOfDay, zdt.getOffset.getTotalSeconds)
      case ("time", l: LocalDateTimeV) =>
        TimeV(toLdt(l).toLocalTime.toNanoOfDay, 0)
      case ("localdatetime", l: LocalDateTimeV) => l
      case ("localdatetime", z: DateTimeV) =>
        val ldt = toZdt(z).toLocalDateTime
        LocalDateTimeV(ldt.toEpochSecond(ZoneOffset.UTC), ldt.getNano)
      case ("localdatetime", d: DateV) =>
        LocalDateTimeV(toLocalDate(d).atStartOfDay()
          .toEpochSecond(ZoneOffset.UTC), 0)
      case ("datetime", z: DateTimeV) => z
      case ("datetime", l: LocalDateTimeV) =>
        ofLocal(toLdt(l), zoneOf(zone))
      case ("datetime", d: DateV) =>
        ofLocal(toLocalDate(d).atStartOfDay(), zoneOf(zone))
      case ("duration", d: DurationV) => d
      case (k, other) => err2(s"$k() cannot convert from: $other")
    }

  /** an explicit `timezone:` CONVERTS a zone/offset-carrying base into the
    * new zone before component overrides apply (TCK Temporal3 [3] #18:
    * `time({time: 12:00+01:00, timezone: '+05:00'})` → 16:00+05:00).
    */
  private def convertBases(m: CMap, tz: String): CMap = {
    val target = zoneOf(tz)
    m.map {
      case (k, TimeV(n, o)) if k.equalsIgnoreCase("time") =>
        val no = target match {
          case off: ZoneOffset => off.getTotalSeconds
          case zid => zid.getRules.getOffset(Instant.now()).getTotalSeconds
        }
        k -> TimeV(Math.floorMod(n + (no - o) * 1000000000L,
          86400000000000L), no)
      case (k, z: DateTimeV) if k.equalsIgnoreCase("datetime") ||
          k.equalsIgnoreCase("time") || k.equalsIgnoreCase("date") =>
        k -> fromZdt(toZdt(z).withZoneSameInstant(target))
      case e => e
    }
  }

  private def fromMap(kind: String, m0: CMap, defaultZone: String): TVal = {
    val tzExplicit = TemporalOps.tzOf(m0)
    // time: convert offset bases immediately (no date context).
    // datetime: convert only zoned datetime bases here — an offset-only
    // time base converts at the COMBINED date (zone offsets are
    // date-dependent; TCK Temporal3 [10] #32)
    val m = (kind, tzExplicit) match {
      case ("time", Some(tz)) => convertBases(m0, tz)
      case _ => m0
    }
    kind match {
      case "duration" => durationFromMap(m)
      case "date" =>
        DateV(dateFromMap(m).toEpochDay)
      case "localtime" =>
        val (lt, _) = timeFromMap(m)
        LocalTimeV(lt.toNanoOfDay)
      case "time" =>
        val (lt, baseOff) = timeFromMap(m)
        val off = tzExplicit.map(z => zoneOf(z) match {
          case o: ZoneOffset => o.getTotalSeconds
          case zid => zid.getRules.getOffset(Instant.now()).getTotalSeconds
        }).orElse(baseOff).getOrElse(0)
        TimeV(lt.toNanoOfDay, off)
      case "localdatetime" =>
        val d = dateFromMap(m)
        val (lt, _) = timeFromMap(m)
        val ldt = LocalDateTime.of(d, lt)
        LocalDateTimeV(ldt.toEpochSecond(ZoneOffset.UTC), ldt.getNano)
      case "datetime" =>
        TemporalOps.getEpoch(m) match {
          case Some(v) => v
          case None =>
            // overrides compose in the BASE's zone (offset re-resolved by
            // that zone's rules at the new date); an explicit timezone:
            // then converts the resulting INSTANT (TCK Temporal3 [10])
            val baseZone: Option[String] = m.collectFirst {
              case (k, z: DateTimeV) if k.equalsIgnoreCase("datetime") ||
                k.equalsIgnoreCase("time") => z.zone
            }
            val d = dateFromMap(m)
            val (lt, baseOff) = timeFromMap(m)
            val ldt = LocalDateTime.of(d, lt)
            val zdt0 = baseZone match {
              case Some(bz) => ZonedDateTime.of(ldt, zoneOf(bz))
              case None => baseOff match {
                case Some(o) => ZonedDateTime.of(ldt,
                  ZoneOffset.ofTotalSeconds(o))
                case None => ZonedDateTime.of(ldt,
                  zoneOf(tzExplicit.getOrElse(defaultZone)))
              }
            }
            val zdt = tzExplicit match {
              case Some(tz) if baseZone.isDefined || baseOff.isDefined =>
                zdt0.withZoneSameInstant(zoneOf(tz))
              case _ => zdt0
            }
            fromZdt(zdt)
        }
    }
  }
}
