package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection and redaction over a text corpus — the scrubbing pass
  * every published web-corpus pipeline runs before training (C4 strips
  * lines with bad words and obvious PII; more recent pipelines redact
  * emails / IPs / phone numbers in place, e.g. the BigScience ROOTS and
  * Dolma preprocessing). Detection emits per-document match counts per
  * category; redaction replaces each span with a typed placeholder
  * (`<EMAIL>`, `<IP>`, `<PHONE>`) so downstream tokenization sees a
  * stable token, not an empty hole.
  *
  * Everything is per-row `regexp_count` / `regexp_replace` — map-only,
  * zero shuffle, zero UDF, codegen-friendly (PlanSpec pins no
  * Exchange), so the pass scales linearly at 100 TB exactly like the
  * quality filter.
  *
  * Cross-engine portability: the patterns avoid lookahead/backrefs so
  * the SAME string runs identically under Java regex (Spark) and RE2
  * (DuckDB) — the [[TextQueries.BpeishPattern]] discipline. The
  * synthetic corpus carries no organic PII, so the driver query plants
  * deterministic spans derived from doc_id (same literal arithmetic in
  * both engines) before detecting — the detector is exercised on known
  * ground truth and the redacted-text md5 pins replacement parity.
  */
object PiiQueries {
  type Q = (SparkSession, String) => DataFrame

  /** RFC-casual email shape: local part, @, dotted domain, 2+ letter TLD. */
  val EmailRe: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** Dotted-quad IPv4 (word-bounded, no octet range check — the
    * standard corpus-scrubbing tradeoff: cheap and over-matches rather
    * than leaks). */
  val Ipv4Re: String = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** International-prefix phone shape `+CC DDD-DDD-DDDD`. */
  val PhoneRe: String = """\+\d{1,2} \d{3}-\d{3}-\d{4}"""

  /** Payment-card shape: 13-19 contiguous digits, or the 4x4 grouped
    * form with `-`/space separators; word-bounded. Like [[Ipv4Re]] the
    * shape over-matches (any long digit run) — redaction takes the
    * cheap over-redact side, while [[luhnValidExpr]] reports how many
    * matches carry a valid Luhn checksum (ISO/IEC 7812), the standard
    * true-positive signal for card-number detection. */
  val CardRe: String =
    """\b\d{13,19}\b|\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"""

  private def escRe(re: String): String = re.replace("\\", "\\\\")

  /** Count of [[CardRe]] matches in `textCol` whose digits pass the
    * Luhn checksum — pure nested higher-order expressions (no UDF):
    * per candidate, strip to digits, double every second digit from
    * the RIGHT (Spark lambda index i is 0-based, so from-right =
    * size - 1 - i), fold the 9-subtracted sum, test mod 10. */
  def luhnValidCount(textCol: String): Column = expr(
    s"""size(filter(
       |  transform(regexp_extract_all($textCol, '${escRe(CardRe)}', 0), c ->
       |    element_at(transform(array(regexp_extract_all(c, '[0-9]', 0)), ds ->
       |      aggregate(transform(ds, (d, i) ->
       |        CASE WHEN (size(ds) - 1 - i) % 2 = 1
       |             THEN CASE WHEN 2 * CAST(d AS INT) > 9
       |                       THEN 2 * CAST(d AS INT) - 9
       |                       ELSE 2 * CAST(d AS INT) END
       |             ELSE CAST(d AS INT) END),
       |        0, (a, x) -> a + x) % 10 = 0), 1)),
       |  b -> b))""".stripMargin)

  /** Per-document card profile: candidate count, Luhn-valid count, and
    * the md5 of the text with every candidate redacted to `<CARD>`
    * (over-redaction by design — see [[CardRe]]). Map-only. */
  def cardStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(CardRe)).cast("int").as("n_card_candidates"),
      luhnValidCount(textCol).cast("int").as("n_luhn_valid"),
      md5(regexp_replace(t, lit(CardRe), lit("<CARD>"))).as("clean_hash"))
  }

  /** Redact all three PII categories in one per-row expression chain.
    * Email runs first: an email's local part can contain digit runs
    * that the looser patterns could otherwise clip mid-span. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))

  /** Per-document PII profile: category counts plus the md5 of the
    * redacted text (the value a pipeline would persist). Map-only. */
  def piiStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).cast("int").as("n_ips"),
      regexp_count(t, lit(PhoneRe)).cast("int").as("n_phones"),
      md5(redactPii(t)).as("clean_hash"))
  }

  /** Plant deterministic PII spans on 3 of every 5 documents (email /
    * IP / phone round-robin by doc_id) — pure literal arithmetic so the
    * DuckDB oracle reproduces the exact same strings. */
  private def planted(docs: DataFrame): DataFrame = docs.withColumn("aug",
    when(col("doc_id") % 5 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com")))
      .when(col("doc_id") % 5 === 1,
        concat(col("text"), lit(" from host 10."),
          (col("doc_id") % 256).cast("string"), lit(".0."),
          ((col("doc_id") * 7) % 256).cast("string")))
      .when(col("doc_id") % 5 === 2,
        concat(col("text"), lit(" call +1 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((col("doc_id") * 3) % 10000).cast("string"), 4, "0")))
      .otherwise(col("text")))

  /** Plant card-shaped spans on 3 of every 4 documents: a Luhn-valid
    * contiguous number, a Luhn-valid grouped number, and an INVALID
    * number (candidate but not valid) — fixed known test numbers so
    * both engines see identical strings. */
  private def plantedCards(docs: DataFrame): DataFrame = docs.withColumn("aug",
    when(col("doc_id") % 4 === 0,
      concat(col("text"), lit(" pay 4532015112830366")))
      .when(col("doc_id") % 4 === 1,
        concat(col("text"), lit(" pay 4111-1111-1111-1111")))
      .when(col("doc_id") % 4 === 2,
        concat(col("text"), lit(" ref 4532015112830367")))
      .otherwise(col("text")))

  val queries: Map[String, Q] = Map(
    "txt_pii" -> { (s, dir) =>
      piiStats(planted(Tables.documents(s, dir)), textCol = "aug")
    },
    "txt_pii_cc" -> { (s, dir) =>
      cardStats(plantedCards(Tables.documents(s, dir)), textCol = "aug")
    }
  )

  private def esc(re: String): String = re.replace("'", "''")

  val oracles: Map[String, String] = Map(
    "txt_pii" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 5 AS INT)
         |      WHEN 0 THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com')
         |      WHEN 1 THEN concat(text, ' from host 10.', CAST(doc_id % 256 AS VARCHAR), '.0.',
         |                         CAST((doc_id * 7) % 256 AS VARCHAR))
         |      WHEN 2 THEN concat(text, ' call +1 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
         |                         '-', lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0'))
         |      ELSE text END AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '${esc(EmailRe)}')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '${esc(Ipv4Re)}')) AS INT) AS n_ips,
         |  CAST(len(regexp_extract_all(aug, '${esc(PhoneRe)}')) AS INT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    '${esc(EmailRe)}', '<EMAIL>', 'g'),
         |    '${esc(Ipv4Re)}', '<IP>', 'g'),
         |    '${esc(PhoneRe)}', '<PHONE>', 'g')) AS clean_hash
         |FROM aug""".stripMargin,

    // DuckDB list_transform's (x, i) index is 1-BASED (Spark's is
    // 0-based) — from-right position = len - i here vs size - 1 - i
    // on the Spark side; same Luhn fold otherwise
    "txt_pii_cc" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 4 AS INT)
         |      WHEN 0 THEN concat(text, ' pay 4532015112830366')
         |      WHEN 1 THEN concat(text, ' pay 4111-1111-1111-1111')
         |      WHEN 2 THEN concat(text, ' ref 4532015112830367')
         |      ELSE text END AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '${esc(CardRe)}')) AS INT) AS n_card_candidates,
         |  CAST(len(list_filter(
         |    list_transform(regexp_extract_all(aug, '${esc(CardRe)}'), c ->
         |      list_sum(list_transform(regexp_extract_all(c, '[0-9]'), (d, i) ->
         |        CASE WHEN (len(regexp_extract_all(c, '[0-9]')) - i) % 2 = 1
         |             THEN CASE WHEN 2 * CAST(d AS INT) > 9
         |                       THEN 2 * CAST(d AS INT) - 9
         |                       ELSE 2 * CAST(d AS INT) END
         |             ELSE CAST(d AS INT) END)) % 10 = 0),
         |    b -> b)) AS INT) AS n_luhn_valid,
         |  md5(regexp_replace(aug, '${esc(CardRe)}', '<CARD>', 'g')) AS clean_hash
         |FROM aug""".stripMargin
  )
}
