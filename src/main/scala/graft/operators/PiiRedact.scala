package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass
  * a training-data pipeline runs before publishing a corpus
  * (reference README.md:102 "training data preparation"; the patterns
  * and placeholder convention are public practice, e.g. C4's and
  * Dolma's PII rules). Four detector classes:
  *
  *  - email:  local@domain.tld (alpha TLD ≥ 2 — a numeric "domain"
  *            like 1.2.3.4 is NOT an email, the IP rule owns it)
  *  - card:   16 digits as 4×4 groups, optionally -/space separated
  *  - phone:  NANP-ish 3-3-4 digit groups with -, space or . between
  *  - ipv4:   four 1-3-digit octets (no range check — syntactic class)
  *
  * Redaction replaces each match with a typed placeholder (`<EMAIL>`,
  * `<CARD>`, `<PHONE>`, `<IP>`) in a FIXED order — email, card,
  * phone, ip — so composite strings resolve deterministically (an
  * email whose domain is numeric falls through to the IP rule; a card
  * is consumed before the phone rule can take its first 3-3 groups;
  * digit-boundary anchors keep "1.2.3.4000" a version string, not an
  * IP). Everything is `regexp_replace`/`regexp_count` over codegen'd
  * builtins — a pure projection, no UDF, no shuffle, linear in text
  * bytes at any corpus size.
  *
  * Relation to [[TextAnalysis.redactPii]] (q_text_redact, round 9):
  * that row certifies REGEX-REPLAY parity — both engines run the same
  * three patterns and must agree byte-for-byte. This operator is the
  * full scrub surface on top: a fourth detector class (cards), typed
  * per-type counts, the hasPii flag, deterministic fall-through
  * ordering with digit-boundary negatives, and oracles that CONSTRUCT
  * the expected output from planted components instead of replaying
  * the regex (so a pattern bug on either side breaks the hash rather
  * than agreeing with itself). The earlier row keeps its own pattern
  * set — its oracle pins those exact bytes.
  */
object PiiRedact {

  /** Detector patterns in redaction order (Java regex, Spark-side). */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "(?<![0-9])[0-9]{4}([- ]?)[0-9]{4}\\1[0-9]{4}\\1[0-9]{4}(?![0-9])", "<CARD>"),
    ("phone", "(?<![0-9])[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}(?![0-9])", "<PHONE>"),
    ("ipv4", "(?<![0-9.])([0-9]{1,3}\\.){3}[0-9]{1,3}(?![0-9.])", "<IP>"))

  /** `text` with every detector match replaced by its placeholder,
    * applied in the documented order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, ph)) =>
      regexp_replace(c, re, ph)
    }

  /** Per-type match counts on the RAW text (before redaction), as
    * `n_<type>` columns — each type counted independently of the
    * redaction order. */
  def counts(text: Column): Seq[Column] =
    patterns.map { case (name, re, _) =>
      regexp_count(text, lit(re)).cast("long").as(s"n_$name")
    }

  /** True when any detector fires. */
  def hasPii(text: Column): Column =
    patterns.map { case (_, re, _) => regexp_count(text, lit(re)) > 0 }
      .reduce(_ || _)
}
