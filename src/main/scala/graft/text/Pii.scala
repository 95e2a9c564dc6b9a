package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: detect and redact email
  * addresses, IPv4 addresses, and phone-shaped numbers before text ships to
  * a training mix (the standard pre-release pass over web corpora).
  *
  * Pure `regexp_count`/`regexp_replace` Column expressions — whole-stage
  * codegen, scan-bound at 100 TB, no shuffle. The patterns stay inside the
  * regex dialect intersection of Java (Spark) and RE2 (DuckDB): explicit
  * `[0-9]` classes (identical ASCII semantics in both), `\b` word
  * boundaries (ASCII `\w` in both), no backreferences or lookaround — so
  * the oracle reproduces the redaction byte-for-byte.
  *
  * Counts are taken per category on the ORIGINAL text (categories don't
  * overlap: emails carry `@`, IPs are dot-separated, phones dash-separated);
  * redaction applies email → IP → phone in a fixed order so the output is
  * deterministic even if a future pattern overlaps.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{2,4}(-[0-9]{2,4})?\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Redacted text: each match replaced by its category tag. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))
}
