package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and replace e-mail
  * addresses and phone-style numbers with typed placeholder tokens,
  * keeping per-document hit counts for the curation audit trail.
  *
  * Patterns deliberately use the regex subset common to Java's engine
  * (Spark) and RE2 (DuckDB, and most scale-out scanners): character
  * classes and bounded quantifiers only — no backreferences, no
  * lookaround — so the same pattern text runs identically in both, and
  * the whole redaction stays inside whole-stage codegen (regexp_replace
  * / regexp_extract_all are native expressions, not UDFs).
  */
object Redaction {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+1-555-[0-9]{1,4}"

  /** Both PII classes replaced by placeholder tokens. Order is
    * correctness-bearing, not just cosmetic: `+`, `-` and digits are
    * all legal in an e-mail local-part, so a phone-shaped substring CAN
    * sit inside an address ("a+1-555-1234@x.co"). E-mails must go
    * first — phone-first would splice "<PHONE>" into the middle of an
    * address and corrupt both redactions. The oracle SQL replays the
    * same order.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0)))

  def phoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PhonePattern), lit(0)))
}
