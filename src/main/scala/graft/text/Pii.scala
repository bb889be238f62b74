package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation — the scrub
  * pass every web-scale corpus runs before training (emails, IPs,
  * phone-like digit runs).
  *
  * Patterns are deliberately restricted to the regex subset with
  * identical semantics in Java's engine (Spark) and RE2 (DuckDB, the
  * oracle): character classes, bounded/unbounded greedy repetition and
  * ASCII word boundaries — no backreferences, no lookaround. Redaction
  * is SEQUENTIAL (emails → IPv4 → phones), each stage counting and
  * replacing on the previous stage's output, so a span consumed by an
  * earlier stage is never double-counted by a later one and both
  * engines walk identical intermediate strings.
  *
  * All scan-local single-pass column expressions — at 100 TB this runs
  * at scan speed with no shuffle, like the TextOps feature family.
  */
object Pii {

  /** user@host.tld with the usual local-part symbol set. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad (format screen, not range validation — standard for
    * scrubbing, where over-matching beats leaking).
    */
  val Ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Phone-like run: optional +, then 8+ chars of digits/space/()/-
    * bounded by digits. Intentionally aggressive (catches formatted and
    * bare numbers); run AFTER the email/IP stages so their digits are
    * already tokenized out.
    */
  val PhonePat = "\\+?[0-9][0-9() -]{6,}[0-9]"

  val EmailToken = "<EMAIL>"
  val Ipv4Token = "<IP>"
  val PhoneToken = "<PHONE>"

  def countEmails(c: Column): Column = regexp_count(c, lit(EmailPat)).cast("long")
  def countIpv4(c: Column): Column = regexp_count(c, lit(Ipv4Pat)).cast("long")
  def countPhones(c: Column): Column = regexp_count(c, lit(PhonePat)).cast("long")

  def redactEmails(c: Column): Column = regexp_replace(c, EmailPat, EmailToken)
  def redactIpv4(c: Column): Column = regexp_replace(c, Ipv4Pat, Ipv4Token)
  def redactPhones(c: Column): Column = regexp_replace(c, PhonePat, PhoneToken)

  /** Full sequential scrub of `textCol`: emails, then IPv4, then phones.
    * Adds n_emails / n_ipv4 / n_phones (each counted on its own stage's
    * input), n_pii, and `redactedCol` with all three token-substituted.
    */
  def scrub(df: org.apache.spark.sql.DataFrame, textCol: String,
            redactedCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("n_emails", countEmails(col(textCol)))
      .withColumn("_t1", redactEmails(col(textCol)))
      .withColumn("n_ipv4", countIpv4(col("_t1")))
      .withColumn("_t2", redactIpv4(col("_t1")))
      .withColumn("n_phones", countPhones(col("_t2")))
      .withColumn(redactedCol, redactPhones(col("_t2")))
      .withColumn("n_pii",
        col("n_emails") + col("n_ipv4") + col("n_phones"))
      .drop("_t1", "_t2")
}
