package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed PII redaction — the privacy-scrub stage every public-corpus
  * pipeline runs before training (C4/Dolma-style): emails, card-shaped
  * digit runs, IPv4 literals, and phone numbers are replaced by typed
  * placeholder tokens, with per-type match counts as the audit trail.
  *
  * All pure codegen'd projections (regex replace/count/extract-all +
  * array HOFs — no UDF, no shuffle), so the scrub rides the same
  * single scan as the rest of a curation pass at any corpus size. The
  * regex subset (no lookaround, no backreferences except the `\b`
  * anchors RE2 shares) is Java/RE2-portable, so every rule has an
  * exact DuckDB oracle twin.
  *
  * Redaction is a FIXED CHAIN — email → card → IPv4 → phone — because
  * the types overlap textually (an IPv4 octet run parses as a phone
  * fragment; a 16-digit card is a superstring of a 7-digit phone).
  * Earlier stages' placeholder tokens contain no digits, so each later
  * stage sees a text its own pattern can match safely. Per-type counts
  * are taken at each type's OWN stage (on the text as that stage sees
  * it), so counts always equal the number of replacements performed.
  *
  * Luhn: real card numbers pass the Luhn mod-10 checksum; random
  * order-id digit runs mostly don't. Redaction deliberately removes
  * ALL card-shaped runs (privacy errs toward over-redaction — the
  * production-pipeline norm), while [[luhnValidCount]] reports how
  * many candidates were checksum-valid — the signal that separates
  * "this corpus leaks real card numbers" from "this corpus contains
  * numeric ids".
  *
  * Boundary (documented, not hidden): no IBAN/SSN national formats, no
  * IPv6, no per-country phone grammars (the E.164-spelled `+CC …`
  * shape IS covered; see [[PhoneRe]]) — the curation-grade scrub, not
  * a DLP product.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** 13–16 digit runs, plain or in the 4-4-4-4 grouped spelling. */
  val CardRe = "\\b(?:\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}|\\d{13,16})\\b"

  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Two spellings: the NANP 3-3-4 body with -, ., space or (area)
    * and an optional +CC prefix, plus the E.164-spelled international
    * form `+CC` followed by 2–4 separator-delimited digit groups
    * (`+44 20 7946 0958`, `+81 3 1234 5678`) — the common way
    * non-NANP numbers appear in web text, without attempting a
    * per-country grammar.
    *
    * Anchoring without lookaround (the RE2-portable subset): `\b`
    * cannot guard the left edge — it HOLDS between `.` and a digit,
    * so a 3-3-4 run inside a longer dotted sequence (`1.234.567.8901`)
    * would still read as a phone and inflate the audit counts — so
    * group 1 captures one preceding non-digit/non-dot character (or
    * start-of-string) and the replacement re-emits it as `$1`/`\1`;
    * the right edge is a plain `\b`. Counts stay exact: a match
    * consumes only its own prefix character, which is never part of a
    * neighboring phone.
    */
  val PhoneRe = "(^|[^0-9.])((?:\\+\\d{1,3}[- ])?\\(?\\d{3}\\)?" +
    "[- .]\\d{3}[- .]\\d{4}\\b|\\+\\d{1,3}[ -]\\d{1,4}(?:[ -]\\d{2,4}){1,3}\\b)"

  val EmailToken = "<EMAIL>"
  val CardToken = "<CARD>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Text after stage 1 (emails redacted). */
  private def s1(text: Column): Column =
    regexp_replace(text, EmailRe, EmailToken)
  /** After stage 2 (cards). */
  private def s2(text: Column): Column =
    regexp_replace(s1(text), CardRe, CardToken)
  /** After stage 3 (IPv4). */
  private def s3(text: Column): Column =
    regexp_replace(s2(text), Ipv4Re, IpToken)

  /** The fully-redacted text (all four stages). The phone stage
    * re-emits its captured guard character (see [[PhoneRe]]).
    */
  def redact(text: Column): Column =
    regexp_replace(s3(text), PhoneRe, "$1" + PhoneToken)

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailRe)).cast("long")
  def cardCount(text: Column): Column =
    regexp_count(s1(text), lit(CardRe)).cast("long")
  def ipv4Count(text: Column): Column =
    regexp_count(s2(text), lit(Ipv4Re)).cast("long")
  def phoneCount(text: Column): Column =
    regexp_count(s3(text), lit(PhoneRe)).cast("long")

  /** Luhn mod-10 checksum over the digits of `s` (separators ignored):
    * from the RIGHTMOST digit, double every second digit, subtract 9
    * when the double exceeds 9, sum, valid iff ≡ 0 (mod 10). One
    * codegen'd `aggregate` over the digit positions.
    */
  def luhnValid(s: Column): Column = {
    val ds = reverse(regexp_replace(s, "[^0-9]", ""))
    val total = aggregate(
      sequence(lit(0), length(ds) - 1),
      lit(0),
      (acc, i) => {
        val dig = ds.substr(i + lit(1), lit(1)).cast("int")
        val v = when(i % 2 === 1,
          when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)).otherwise(dig)
        acc + v
      })
    length(ds) >= 13 && total % 10 === 0
  }

  /** How many card-shaped candidates (as the card stage sees them)
    * pass the Luhn checksum — the leak-severity audit signal.
    */
  def luhnValidCount(text: Column): Column =
    size(filter(regexp_extract_all(s1(text), lit(CardRe), lit(0)),
      c => luhnValid(c))).cast("long")
}
