package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing stage every published
  * pretraining pipeline runs (The Pile, RefinedWeb, Dolma all describe
  * regex-based removal of emails/IPs/phone-style identifiers before
  * training). Patterns are deliberately the standard conservative
  * shapes; everything is `regexp_replace`/`regexp_count` Column
  * expressions (codegen'd, shuffle-free — a 100 TB redaction pass is a
  * pure scan+project).
  *
  * The regexes stay inside the syntax subset Java regex and RE2-style
  * engines agree on (no backrefs, no lookaround), so the DuckDB oracle
  * can recompute them verbatim.
  */
object Pii {

  /** category → (pattern, replacement token) in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("ipv4", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"),
    ("card", "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b",
      "<CARD>"))

  /** Redacted text: every category replaced by its token, applied in
    * [[Patterns]] order (SSN before phone matters: 123-45-6789 must not
    * half-match the phone shape after partial replacement).
    */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Per-category match counts + total, computed on the ORIGINAL text
    * (counts first, then redaction — order matters for overlaps).
    */
  def stats(df: DataFrame, text: Column): DataFrame = {
    val counted = Patterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(text, lit(pat)))
    }
    counted
      .withColumn("n_pii",
        Patterns.map { case (n, _, _) => col(s"n_$n") }.reduce(_ + _))
      .withColumn("redacted", redact(text))
  }
}
