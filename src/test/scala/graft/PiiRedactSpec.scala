package graft

import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** PII redaction (SURVEY.md §2.11 E4): the default pattern chain on
  * constructed rows carrying real PII shapes — the fixture corpus is
  * synthetic word soup, so the oracle-gated q_pii_scrub certifies the
  * chain plumbing while THIS spec pins what the patterns actually
  * catch and preserve.
  */
class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(text: String): String = {
    val df = Seq(text).toDF("text")
    TextQueries.redact(df, "text").collect().head.getString(0)
  }

  test("emails, IPv4s, phones, and long digit runs are masked") {
    assert(redactOne("contact jane.doe+spam@mail.example.org today") ===
      "contact <EMAIL> today")
    assert(redactOne("peer at 192.168.001.1 timed out") ===
      "peer at <IP> timed out")
    assert(redactOne("call 415-555-0134 or 415.555.0134 now") ===
      "call <PHONE> or <PHONE> now")
    assert(redactOne("account 123456789 closed") ===
      "account <ID> closed")
  }

  test("chain order: masked phones are not re-matched by the digit-run rule") {
    // A phone redacts to <PHONE>; the idrun rule must find no digits
    // left. An unguarded order would turn 415-555-0134 into <ID>-<ID>-<ID>.
    assert(redactOne("fax: 415 555 0134, id: 00001234567") ===
      "fax: <PHONE>, id: <ID>")
  }

  test("clean text and near-miss shapes pass through untouched") {
    val clean = Seq(
      "the quick brown fox at example dot org",
      "version 1.2.3 of the 4.1 release",   // too few octets for an IP
      "room 12345 floor 9")                 // digit run below the 6-digit floor
    clean.foreach(t => assert(redactOne(t) === t))
  }

  test("multiple hits in one document all redact, accounting consistent") {
    val t = "a@b.co writes to c@d.io from 10.0.0.1 and 10.0.0.2"
    val red = redactOne(t)
    assert(red === "<EMAIL> writes to <EMAIL> from <IP> and <IP>")
  }

  test("piiScrub fixture report: PII rules are no-ops, term rule accounts exactly") {
    val rows = TextQueries.piiScrub(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSeq === bySource.keys.toSeq.sorted)
    val termRe = "\\bcustomer\\b".r
    rows.foreach { r =>
      val src = r.getString(0)
      val texts = bySource(src).map(_._2)
      val matches = texts.map(t => termRe.findAllIn(t).size)
      assert(r.getAs[Long]("n_docs") === texts.size)
      assert(r.getAs[Long]("docs_redacted") === matches.count(_ > 0))
      assert(r.getAs[Long]("n_matches") === matches.sum)
      // every match swaps "customer" (8 chars) for "<TERM>" (6 chars)
      assert(r.getAs[Long]("chars_before") - r.getAs[Long]("chars_after") ===
        2L * matches.sum)
    }
  }
}
