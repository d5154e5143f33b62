package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — emails, IPv4 addresses,
  * hyphenated phone numbers. A training-data pipeline runs this between
  * ingestion and curation; detection counts also feed quality gates
  * ("drop documents with >N contact strings").
  *
  * Everything here is `regexp_count`/`regexp_replace` column algebra:
  * codegen'd, scan-fused, zero shuffle — the per-row cost IS the regex
  * engine, which is the floor for this operation on any engine.
  *
  * The patterns are deliberately restricted to syntax that Java regex and
  * RE2 (DuckDB/Go — the engines an oracle or a sibling pipeline would run)
  * interpret identically: character classes, bounded repetition, `\b` ASCII
  * word boundaries; no backreferences or lookaround. They are pragmatic
  * pipeline patterns, not RFC validators (e.g. `999.999.999.999` matches
  * the IPv4 shape; octet range-checking needs alternations that hurt
  * cross-engine parity more than over-redaction hurts a corpus).
  *
  * Redaction order is fixed email → IPv4 → phone: the most-specific pattern
  * first, so an address inside an email's domain is consumed by the email
  * redaction rather than double-redacted.
  */
object Pii {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe: String = "\\b\\d{3}-\\d{3,4}-\\d{4}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column  = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Total PII hits of all three kinds (for threshold gates). */
  def piiCount(text: Column): Column =
    emailCount(text) + ipv4Count(text) + phoneCount(text)

  /** `text` with every match replaced by a type placeholder. NULL text stays
    * NULL (regexp_replace null-propagates).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
