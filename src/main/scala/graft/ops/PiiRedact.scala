package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction primitives — the single source for the
  * patterns shared by the q60 oracle query and the curation pipeline's
  * redaction stage, so the two can't drift.
  *
  * Patterns use only syntax Java regex (Spark codegen) and RE2 (DuckDB)
  * agree on: literal classes, {m,n}, \d, \b. Redaction is a per-row
  * codegen'd `regexp_replace` chain — zero shuffles, trivially
  * map-side at any scale. Reference precedent: the reference engine has
  * no PII surface; this is part of the training-data extension set
  * (BASELINE.json north star), the Dolma/CCNet-style masking pass every
  * released corpus documents.
  */
object PiiRedact {

  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag    = "<IP>"

  /** Emails then IPv4s replaced by fixed placeholder tags. */
  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, EmailTag), Ipv4Re, IpTag)

  /** Spark SQL fragment counting matches of `re` in `textExpr` (the
    * pattern's backslashes escaped for the SQL string literal). */
  def countExpr(textExpr: String, re: String): String =
    s"CAST(regexp_count($textExpr, '${re.replace("\\", "\\\\")}') AS BIGINT)"

  /** DuckDB twins. */
  object sql {
    def redact(e: String): String =
      s"regexp_replace(regexp_replace($e, '$EmailRe', '$EmailTag', 'g'), " +
        s"'$Ipv4Re', '$IpTag', 'g')"

    def count(e: String, re: String): String =
      s"CAST(len(regexp_extract_all($e, '$re')) AS BIGINT)"
  }
}
