package graft.analytics

import graft.ops.PublicSuffixList

/** DuckDB replay of the Public-Suffix-List registrable-domain fold
  * ([[graft.ops.PublicSuffixList]]) — the oracle side of the q231/q236
  * domain queries. The rule sets are interpolated as inline IN-lists
  * FROM THE SAME Scala sets the engine folds with, so there is exactly
  * one rule source; the SQL implements the same longest-match walk
  * (exception beats all, then most labels, default `*`), the same
  * normalization (lowercase, strip one trailing `:port`), and the same
  * quarantine rules (malformed labels, <2 labels, numeric TLD → '').
  *
  * IN-list scale (r16, full-list adjudication): the full snapshot puts
  * ~9.4k rules in these lists (~150 KB of SQL per folding query). The
  * r15 verdict flagged that this might need a VALUES-join instead;
  * measured, it does not — DuckDB parses and runs the q231/q236
  * oracles in <0.7 s at sf0.01 (large IN-lists compile to a hash-set
  * probe), so the simpler inline form stays.
  */
object PslSql {

  private def byLabels(s: Set[String]): Map[Int, Seq[String]] =
    s.groupBy(_.count(_ == '.') + 1).view.mapValues(_.toSeq.sorted).toMap

  private def inList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString(", ")

  /** Last `k` labels of `_ls` (len `_nl`) joined with '.'. */
  private def sfx(k: Int): String =
    if (k == 1) "_ls[_nl]"
    else s"array_to_string(list_slice(_ls, _nl - ${k - 1}, _nl), '.')"

  /** The `_pslen` CASE over (_h, _ls, _nl): 0 = quarantine, else the
    * public-suffix label count. */
  private def pslenCase: String = {
    val exc = byLabels(PublicSuffixList.exceptions).toSeq.sortBy(-_._1).map {
      case (k, vs) =>
        s"WHEN _nl >= $k AND ${sfx(k)} IN (${inList(vs)}) THEN ${k - 1}"
    }
    val exactCands = byLabels(PublicSuffixList.exact).toSeq.sortBy(-_._1).map {
      case (k, vs) =>
        s"CASE WHEN _nl >= $k AND ${sfx(k)} IN (${inList(vs)}) " +
          s"THEN $k ELSE 1 END"
    }
    val wildCands = byLabels(PublicSuffixList.wildcardParents).toSeq
      .sortBy(-_._1).map { case (k, vs) =>
        s"CASE WHEN _nl >= ${k + 1} AND ${sfx(k)} IN (${inList(vs)}) " +
          s"THEN ${k + 1} ELSE 1 END"
      }
    s"""CASE
      WHEN NOT regexp_matches(_h, '^[a-z0-9-]+(\\.[a-z0-9-]+)+$$') THEN 0
      WHEN regexp_matches(_ls[_nl], '^[0-9]+$$') THEN 0
      ${exc.mkString("\n      ")}
      ELSE greatest(1,
        ${(exactCands ++ wildCands).mkString(",\n        ")})
    END"""
  }

  /** CTE chain folding `hostExpr` (raw host or host:port) from `src` to
    * a registrable domain: emits CTEs `<out>_n`, `<out>_l`, `<out>_p`,
    * and `<out>` with columns `carryCols :+ domCol`. */
  def foldCtes(src: String, hostExpr: String, carryCols: Seq[String],
      out: String, domCol: String = "dom"): String = {
    val carry = carryCols.mkString(", ")
    val carrySel = if (carryCols.isEmpty) "" else carry + ", "
    s"""${out}_n AS (
      SELECT $carrySel
             regexp_replace(lower($hostExpr), ':[0-9]+$$', '') AS _h
      FROM $src),
    ${out}_l AS (
      SELECT *, string_split(_h, '.') AS _ls,
             len(string_split(_h, '.')) AS _nl
      FROM ${out}_n),
    ${out}_p AS (
      SELECT *, $pslenCase AS _pslen FROM ${out}_l),
    $out AS (
      SELECT $carrySel
             CASE WHEN _pslen = 0 OR _nl <= _pslen THEN ''
                  ELSE array_to_string(list_slice(_ls, _nl - _pslen, _nl), '.')
             END AS $domCol
      FROM ${out}_p)"""
  }
}
