package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name/string normalization functions.
  *
  * `sanitizeName` reproduces the reference's commodity-name sanitizer
  * (reference scraper/div_link_handler.py:116-123): lowercase, trim, strip
  * characters outside [\w\s-], collapse whitespace runs to '_', truncate to
  * 100 chars. Composed entirely from built-in codegen'd expressions — no UDF —
  * so it inlines into whole-stage codegen and stays pushdown-friendly.
  */
object NameFns {
  val MaxNameLen = 100

  def sanitizeName(c: Column): Column =
    substring(
      regexp_replace(
        regexp_replace(lower(trim(c)), "[^\\w\\s-]", ""),
        "\\s+", "_"),
      1, MaxNameLen)

  /** DuckDB-equivalent SQL fragment for the oracle (RE2 needs the 'g' flag). */
  def sanitizeNameSql(col: String): String =
    s"substring(regexp_replace(regexp_replace(lower(trim($col)), '[^\\w\\s-]', '', 'g'), '\\s+', '_', 'g'), 1, $MaxNameLen)"
}
