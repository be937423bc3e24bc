package graft.functions

import java.time.{Duration, Instant, ZoneOffset, ZonedDateTime}

/** Relative/absolute time-range resolution for query start/end strings
  * (semantics of reference core/src/main/scala/com/cardinal/utils/
  * Strings.scala:60-185):
  *
  *  - named refs: `now`, `epoch`, and the opposite endpoint (`s`/`e`)
  *  - relative: `e-1h`, `now-30m`, `s+2d` (units s/m/h/d/w/months/years,
  *    or ISO-8601 `PT...` periods)
  *  - absolute: epoch seconds, epoch millis (> Int.MaxValue), ISO-8601
  *
  * Step auto-selection per query span mirrors the reference's table
  * (query-api QueryApi.scala:297-309).
  */
object TimeRange {

  private val RelativeDate = "^(now|epoch|s|e)([-+])(.+)$".r
  private val NamedDate = "^(now|epoch|s|e)$".r
  private val UnixDate = "^([0-9]+)$".r
  private val AtPeriod = "^(\\d+)\\s*(seconds?|s|minutes?|min|m|hours?|h|days?|d|weeks?|wk|w|months?|years?|y)$".r

  def resolve(s: String, e: String, now: Instant = Instant.now()): (Long, Long) = {
    val (start, end) =
      if (isCustomRelative(s) || s == "e") {
        val endI = parseDate(e, now, now)
        val startI = parseDate(s, now, endI)
        (startI, endI)
      } else {
        val startI = parseDate(s, now, now)
        val endI = parseDate(e, now, startI)
        (startI, endI)
      }
    require(!end.isBefore(start), "end time is before start time")
    (start.toEpochMilli, end.toEpochMilli)
  }

  /** True for refs relative to the *other* endpoint (`s-`/`e-`), which force
    * the other side to resolve first. */
  private def isCustomRelative(str: String): Boolean = str match {
    case RelativeDate(r, _, _) => r != "now" && r != "epoch"
    case _ => false
  }

  private def parseDate(str: String, now: Instant, ref: Instant): Instant =
    str match {
      case RelativeDate(r, op, p) =>
        val base = refVar(r, now, ref)
        val d = parseDuration(p)
        if (op == "-") base.minus(d) else base.plus(d)
      case NamedDate(r) => refVar(r, now, ref)
      case UnixDate(d) =>
        val v =
          try d.toLong
          catch { case ex: NumberFormatException =>
            throw new IllegalArgumentException(s"invalid date $d", ex) }
        // values beyond Int.MaxValue are taken as epoch millis
        if (v > Int.MaxValue) Instant.ofEpochMilli(v)
        else Instant.ofEpochSecond(v)
      case iso =>
        try {
          java.time.OffsetDateTime.parse(iso).toInstant
        } catch {
          case _: Exception =>
            try {
              java.time.LocalDateTime.parse(iso).toInstant(ZoneOffset.UTC)
            } catch {
              case _: Exception =>
                try {
                  java.time.LocalDate.parse(iso).atStartOfDay(ZoneOffset.UTC).toInstant
                } catch {
                  case ex: Exception =>
                    throw new IllegalArgumentException(s"invalid date $iso", ex)
                }
            }
        }
    }

  private def refVar(v: String, now: Instant, ref: Instant): Instant = v match {
    case "now" => now
    case "epoch" => Instant.EPOCH
    case _ => ref
  }

  def parseDuration(str: String): Duration = str match {
    case AtPeriod(n, unit) =>
      val v =
        try n.toInt
        catch { case ex: NumberFormatException =>
          throw new IllegalArgumentException(s"invalid period $str", ex) }
      unit match {
        case "seconds" | "second" | "s" => Duration.ofSeconds(v)
        case "minutes" | "minute" | "min" | "m" => Duration.ofMinutes(v)
        case "hours" | "hour" | "h" => Duration.ofHours(v)
        case "days" | "day" | "d" => Duration.ofDays(v)
        case "weeks" | "week" | "wk" | "w" => Duration.ofDays(v * 7L)
        case "months" | "month" => Duration.ofDays(v * 30L)
        case "years" | "year" | "y" => Duration.ofDays(v * 365L)
        case other => throw new IllegalArgumentException(s"unknown unit $other")
      }
    case iso if iso.startsWith("P") =>
      // Duration.parse rejects week/month designators ("P1W"/"P1M") —
      // keep the error contract uniform rather than leaking the raw
      // DateTimeParseException (use "1w"/"1months" for those units)
      try Duration.parse(iso)
      catch { case ex: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(s"invalid period $iso", ex) }
    case other => throw new IllegalArgumentException(s"invalid period $other")
  }

  /** Auto step from span: ≤65 min → 10 s, ≤12 h → 1 m, ≤24 h → 5 m,
    * ≤3 d → 20 m, else 1 h. */
  def autoStepMillis(startMs: Long, endMs: Long): Long = {
    val span = endMs - startMs
    val minute = 60000L
    if (span <= 65 * minute) 10000L
    else if (span <= 12 * 60 * minute) minute
    else if (span <= 24 * 60 * minute) 5 * minute
    else if (span <= 3 * 24 * 60 * minute) 20 * minute
    else 60 * minute
  }
}
