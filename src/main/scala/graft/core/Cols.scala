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
}
