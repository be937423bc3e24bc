package graft.functions

import java.util.regex.Pattern
import graft.ast.DataTypes

/** Normalizes human quantity literals at plan time: durations → nanoseconds,
  * data sizes → bytes, so filters like `duration > "1.5s"` compare against
  * the stored numeric column.
  *
  * Unit tables match the reference's conversions
  * (reference core/src/main/scala/com/cardinal/utils/QuantityParser.scala:24-141),
  * including its bit-derived `*ib` constants (kib = 2^10/8 bytes, etc.),
  * for drop-in query compatibility.
  */
object QuantityParser {

  // the decimal point must be escaped: an unescaped `.` lets "1,5s"
  // match with group(1) = "1,5", and toDouble then throws instead of the
  // contract's "matches nothing"
  private val quantityRegex: Pattern =
    Pattern.compile("([0-9]+(\\.[0-9]+)?)(\\w+|µs)")

  private val duration: Map[String, Double] = {
    val s = 1e9; val ms = 1e6; val us = 1e3; val m = 60 * 1e9
    val h = 3600 * 1e9; val d = 24 * 3600 * 1e9
    Map(
      "s" -> s, "sec" -> s, "secs" -> s, "second" -> s, "seconds" -> s,
      "m" -> m, "min" -> m, "mins" -> m, "minute" -> m, "minutes" -> m,
      "ms" -> ms, "milli" -> ms, "millis" -> ms, "millisecond" -> ms,
      "milliseconds" -> ms,
      "µs" -> us, "micro" -> us, "micros" -> us, "microsecond" -> us,
      "microseconds" -> us,
      "ns" -> 1.0,
      "h" -> h, "hr" -> h, "hrs" -> h, "hour" -> h, "hours" -> h,
      "d" -> d, "day" -> d, "days" -> d
    )
  }

  private val dataSize: Map[String, Double] = Map(
    "b" -> 1.0, "byte" -> 1.0, "bytes" -> 1.0,
    "k" -> 1e3, "kb" -> 1e3, "kilobyte" -> 1e3, "kilobytes" -> 1e3,
    "m" -> 1e6, "mb" -> 1e6, "mbs" -> 1e6, "megabyte" -> 1e6,
    "g" -> 1e9, "gb" -> 1e9, "gbs" -> 1e9, "gigabyte" -> 1e9,
    "gigabytes" -> 1e9,
    "t" -> 1e12, "tb" -> 1e12, "tbs" -> 1e12, "terabyte" -> 1e12,
    "terabytes" -> 1e12,
    "pb" -> 1e15, "pbs" -> 1e15, "petabyte" -> 1e15, "petabytes" -> 1e15,
    // bit-derived binary units, as in the reference
    "kib" -> 128.0, "kibs" -> 128.0, "kibibyte" -> 128.0, "kibibytes" -> 128.0,
    "mib" -> 131072.0, "mibs" -> 131072.0, "mebibyte" -> 131072.0,
    "mebibytes" -> 131072.0,
    "gib" -> 1.342e8, "gibs" -> 1.342e8, "gibibyte" -> 1.342e8,
    "gibibytes" -> 1.342e8,
    "tib" -> 1.374e11, "tibs" -> 1.374e11, "tibibyte" -> 1.374e11,
    "tibibytes" -> 1.374e11,
    "pib" -> 1.126e15, "pibs" -> 1.126e15, "pibibyte" -> 1.126e15,
    "pibibytes" -> 1.126e15
  )

  def parseQuantity(value: String, dataType: String): Option[Double] = {
    val m = quantityRegex.matcher(value)
    if (!m.find()) return None
    val qty = m.group(1).toDouble
    val unit = m.group(3).toLowerCase
    dataType match {
      case DataTypes.DURATION => duration.get(unit).map(_ * qty)
      case DataTypes.DATA_SIZE => dataSize.get(unit).map(_ * qty)
      case _ => None
    }
  }

  /** Filter-literal normalization (reference BaseExpr.scala:450-459):
    * number parses directly; duration/datasize go through the unit table;
    * anything UNPARSEABLE — including a malformed number or a quantity
    * the unit table rejects — is NaN, which the filter compiler turns
    * into match-nothing. (An earlier getOrElse(0.0) silently rewrote a
    * bad duration threshold into `x > 0`, matching nearly everything —
    * the opposite of the documented contract.) */
  def normalize(value: String, dataType: String): Double = dataType match {
    case DataTypes.NUMBER => value.toDoubleOption.getOrElse(Double.NaN)
    case DataTypes.DURATION | DataTypes.DATA_SIZE =>
      parseQuantity(value, dataType).getOrElse(Double.NaN)
    case _ => Double.NaN
  }
}
