package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Column-reference helper for generated column names. One-hot encoding
  * produces names like `app_version_major_1.x`; a bare `col(name)` parses
  * the dot as struct-field access. Always go through `qcol` when the name
  * is data-derived.
  */
object Cols {
  def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

  /** THE whitespace tokenizer — the load-bearing expression every text
    * operator and every DuckDB oracle (`string_split_regex(trim(text),
    * '\s+')`) mirrors term-for-term. One definition so a future change
    * (e.g. unicode whitespace classes) cannot silently diverge between
    * operators and their oracles: change it here, and every oracle's
    * regex must change with it.
    */
  def wsTokens(text: Column): Column =
    org.apache.spark.sql.functions.split(
      org.apache.spark.sql.functions.trim(text), "\\s+")

  /** Lines of a page, each whitespace-trimmed — the ONE definition the
    * quality/cleaning operators (Gopher rules, C4 line filter) judge
    * lines by: a CRLF page leaves '\r' on every raw split line, which
    * blinds suffix rules ('...'/'.') — trimming is load-bearing, and
    * divergent copies of this regex would make the operators disagree
    * about what a line is. Oracles replay it as
    * `regexp_replace(x, '^\s+|\s+$', '', 'g')` over `string_split`. */
  def trimmedLines(text: Column, sep: String = "\n"): Column = {
    import org.apache.spark.sql.functions._
    transform(split(text, sep), l => regexp_replace(l, "^\\s+|\\s+$", ""))
  }
}
