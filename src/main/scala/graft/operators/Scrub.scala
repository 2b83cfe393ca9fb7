package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a released training corpus runs
  * before export: emails, IPv4 addresses and SSN-shaped identifiers
  * replaced by typed placeholder tokens, with per-document match counts
  * for the data card.
  *
  * Map-only by construction: detection and redaction are chained
  * `regexp_extract_all` / `regexp_replace` projections inside one
  * corpus scan — no shuffle, no UDF, nothing leaves the executor. The
  * patterns are deliberately RE2-compatible (no backreferences, no
  * lookaround) so the identical pattern text runs in Spark's Java
  * regex, RE2-based engines, and the DuckDB oracle with the same
  * matches — portability of the RULESET is what makes a redaction
  * audit reproducible across the tools that touch the corpus.
  *
  * Redaction order is fixed (email → IPv4 → SSN) and placeholders
  * contain no digits or '@', so a later pattern can never match inside
  * an earlier replacement. Counts are computed on the ORIGINAL text,
  * so they report what was found even where patterns could overlap.
  */
object Scrub {

  /** Username@host.tld — conservative: requires a dotted TLD of
    * letters, which is what leaks in scraped text. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4. Octet ranges are not validated (999.0.0.1
    * matches): redaction wants recall, and RE2-portability rules out
    * the alternation tower that exact range checks need. */
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** SSN-shaped 3-2-4 digit identifier. */
  val SsnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Per-text match counts `(n_email, n_ip, n_ssn)` on the raw text. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
      .cast("long").as("n_email"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))
      .cast("long").as("n_ip"),
    size(regexp_extract_all(text, lit(SsnPattern), lit(0)))
      .cast("long").as("n_ssn"))

  /** The text with every match replaced by its typed placeholder. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      SsnPattern, "<ID>")

  /** Scrub `textCol` across a corpus: id, match counts, redacted text
    * and its md5 (the fingerprint release manifests diff on). */
  def scrubReport(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol) +: piiCounts(col(textCol)) :+
        redactPii(col(textCol)).as("redacted"): _*)
      .withColumn("redacted_md5", md5(col("redacted").cast("binary")))

  /** Wordlist policy screen: per document, the token-hit count for each
    * named category list plus the overall flag — the mechanism behind
    * blocklist/content filters (the category lists themselves are
    * policy, supplied by the caller; nothing is hardcoded).
    *
    * Matching is exact lowercase whitespace-token equality (no
    * substring matches — "scunthorpe" never trips a "thorpe" entry).
    * Map-only: category lists fold in as literal `isInCollection`
    * filters over one tokenization, so screening 100 TB is a single
    * projection with no shuffle and no UDF. */
  def policyScreen(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lists: Seq[(String, Seq[String])]): DataFrame = {
    require(lists.nonEmpty, "need at least one category list")
    require(lists.map(_._1).distinct.size == lists.size,
      "category names must be unique")
    require(lists.forall(_._2.nonEmpty), "category lists must be non-empty")
    val toks = split(lower(col(textCol)), "\\s+")
    val hitCols = lists.map { case (name, words) =>
      size(filter(toks, t => t.isInCollection(words.map(_.toLowerCase))))
        .cast("long").as(s"n_$name")
    }
    val flagged = lists
      .map { case (name, _) => col(s"n_$name") > 0 }
      .reduce(_ || _)
    df.select(col(idCol) +: hitCols: _*)
      .withColumn("flagged", flagged)
  }
}
