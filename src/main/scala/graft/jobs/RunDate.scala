package graft.jobs

import java.time.{Instant, LocalDate, ZoneId}
import java.time.format.DateTimeFormatter
import scala.util.Try

/** Run-date resolution for scheduled jobs
  * (reference: airflow/dags/daily_kpis.py:27-77 — P10 multi-format
  * parse with quote/whitespace trim, P11 precedence conf > env >
  * logical date > today(TZ)). Plain driver-side Scala — this is job
  * parameterization, not a query operator (SURVEY.md §2.2 P11).
  */
object RunDate {

  private val DateFmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** P10: parse `yyyy-MM-dd`, else any ISO-8601 instant/datetime,
    * trimming whitespace and stray quotes (daily_kpis.py:31-33). */
  def parse(raw: String, zone: ZoneId = ZoneId.of("UTC")): Option[LocalDate] = {
    val s = raw.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim
    if (s.isEmpty) None
    else Try(LocalDate.parse(s, DateFmt)).toOption
      .orElse(Try(Instant.parse(s).atZone(zone).toLocalDate).toOption)
      .orElse(Try(java.time.LocalDateTime.parse(s).toLocalDate).toOption)
  }

  /** P11 precedence: explicit conf > environment > scheduler logical
    * date > today in `zone` (daily_kpis.py:46-77). */
  def resolve(conf: Option[String], env: Option[String],
              logical: Option[String],
              zone: ZoneId = ZoneId.of("UTC"),
              now: () => Instant = () => Instant.now()): LocalDate =
    conf.flatMap(parse(_, zone))
      .orElse(env.flatMap(parse(_, zone)))
      .orElse(logical.flatMap(parse(_, zone)))
      .getOrElse(now().atZone(zone).toLocalDate)
}
