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
  * Redaction applies email → IP → phone sequentially, and each count runs
  * on the SAME text its redaction stage sees (emails on the original, IPs
  * on the email-redacted text, phones on the email+IP-redacted text). The
  * categories can overlap on adversarial inputs ('123-45@mail.example'
  * matches both the phone and email patterns); counting on the
  * progressively redacted text guarantees `n_X` always equals the number
  * of `<X>` tags actually present in `redact`'s output.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{2,4}(-[0-9]{2,4})?\\b"

  /** Stage 1: the text emails are counted on and redacted from. */
  def redactEmails(text: Column): Column =
    regexp_replace(text, lit(EmailRe), lit("<EMAIL>"))

  /** Stage 2: applied to the email-redacted text. */
  def redactIpv4s(text: Column): Column =
    regexp_replace(text, lit(Ipv4Re), lit("<IP>"))

  /** Stage 3: applied to the email+IP-redacted text. */
  def redactPhones(text: Column): Column =
    regexp_replace(text, lit(PhoneRe), lit("<PHONE>"))

  /** Emails are matched first, on the original text. */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))

  /** IPs are matched on the email-redacted text (matches redaction order). */
  def ipv4Count(text: Column): Column =
    regexp_count(redactEmails(text), lit(Ipv4Re))

  /** Phones are matched on the email+IP-redacted text. */
  def phoneCount(text: Column): Column =
    regexp_count(redactIpv4s(redactEmails(text)), lit(PhoneRe))

  /** Redacted text: each match replaced by its category tag, in the same
    * email → IP → phone order the counts observe.
    */
  def redact(text: Column): Column =
    redactPhones(redactIpv4s(redactEmails(text)))
}
