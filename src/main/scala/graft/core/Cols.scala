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
}
