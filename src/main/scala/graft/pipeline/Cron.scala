package graft.pipeline

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** 5-field cron next-fire computation (ST5 capability parity with the
  * reference's croniter-backed scheduler,
  * /root/reference/src/scheduler.py:66-87) as a pure function — no
  * clock access, so schedules are testable and replayable.
  *
  * Supported field syntax per field (minute, hour, day-of-month,
  * month, day-of-week): `*`, lists `a,b`, ranges `a-b`, steps `*&#47;n`
  * and `a-b/n`. Day-of-week 0 and 7 both mean Sunday. Standard cron
  * day semantics: when BOTH day-of-month and day-of-week are
  * restricted the day matches if EITHER does; otherwise the restricted
  * one governs.
  */
object Cron {

  final case class Spec(
      minutes: Set[Int], hours: Set[Int], daysOfMonth: Set[Int],
      months: Set[Int], daysOfWeek: Set[Int],
      domRestricted: Boolean, dowRestricted: Boolean)

  private def parseField(field: String, min: Int, max: Int, name: String): (Set[Int], Boolean) = {
    def range(part: String): Seq[Int] = {
      val (body, step) = part.split("/") match {
        case Array(b) => (b, 1)
        case Array(b, s) => (b, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron $name field: $part")
      }
      require(step > 0, s"bad cron step in $name: $part")
      val hasStep = part.contains("/")
      val (lo, hi) = body match {
        case "*" => (min, max)
        case b if b.contains("-") =>
          val Array(l, h) = b.split("-", 2); (l.trim.toInt, h.trim.toInt)
        case b =>
          val v = b.trim.toInt
          // vixie/croniter: a single value WITH a step means "from v to
          // max" ("8/6" in the hour field = 8,14,20), not just {v}
          if (hasStep) (v, max) else (v, v)
      }
      require(lo >= min && hi <= max && lo <= hi, s"cron $name out of range: $part")
      (lo to hi by step)
    }
    // Vixie-cron rule: only a literal `*` is unrestricted for the
    // dom/dow either-matches semantics; `*/n` counts as restricted
    val restricted = field != "*"
    val vals = field.split(",").toSeq.flatMap(range).toSet
    (vals, restricted)
  }

  def parse(expr: String): Spec = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron expression needs 5 fields: '$expr'")
    val (mins, _) = parseField(fields(0), 0, 59, "minute")
    val (hours, _) = parseField(fields(1), 0, 23, "hour")
    val (dom, domR) = parseField(fields(2), 1, 31, "day-of-month")
    val (months, _) = parseField(fields(3), 1, 12, "month")
    // 0 and 7 are both Sunday; normalize to 0-6
    val (dowRaw, dowR) = parseField(fields(4), 0, 7, "day-of-week")
    val dow = dowRaw.map(_ % 7)
    Spec(mins, hours, dom, months, dow, domR, dowR)
  }

  private def dayMatches(s: Spec, date: java.time.LocalDate): Boolean = {
    if (!s.months.contains(date.getMonthValue)) return false
    val domOk = s.daysOfMonth.contains(date.getDayOfMonth)
    val dowOk = s.daysOfWeek.contains(date.getDayOfWeek.getValue % 7)
    (s.domRestricted, s.dowRestricted) match {
      case (true, true) => domOk || dowOk // standard cron OR semantics
      case (true, false) => domOk
      case (false, true) => dowOk
      case (false, false) => true
    }
  }

  /** Earliest fire time STRICTLY after `after`. Throws if no match
    * within ~9 years (an impossible spec like Feb 30 — the horizon must
    * exceed the 8-year Feb-29 gap across a non-leap century year).
    */
  def nextFire(expr: String, after: LocalDateTime): LocalDateTime = {
    val s = parse(expr)
    val start = after.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    var date = start.toLocalDate
    var i = 0
    while (i < 3300) { // > 9 years of days (Feb 29 2096 → Feb 29 2104)
      if (dayMatches(s, date)) {
        val floor = if (date == start.toLocalDate) start.getHour * 60 + start.getMinute else 0
        val candidates = for {
          h <- s.hours.toSeq.sorted
          m <- s.minutes.toSeq.sorted
          t = h * 60 + m if t >= floor
        } yield t
        candidates.headOption match {
          case Some(t) => return date.atTime(t / 60, t % 60)
          case None => // no slot left today; roll to the next day
        }
      }
      date = date.plusDays(1)
      i += 1
    }
    throw new IllegalArgumentException(s"cron '$expr' never fires (within 9 years of $after)")
  }
}
