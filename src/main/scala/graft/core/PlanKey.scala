package graft.core

import org.apache.spark.sql.DataFrame

/** Structural cache-memo key for a DataFrame's logical plan.
  *
  * Plan-OBJECT equality (`analyzed.canonicalized == other`) fails for
  * file-backed frames: every `spark.read.parquet` builds a fresh
  * `FileIndex`, and `HadoopFsRelation` equality is reference-based
  * through it, so two invocations that build byte-identical plans never
  * compare equal and a plan-keyed memo silently re-pays its work every
  * call (measured round 13: the slice-boundary memo grew by its full
  * entry count on every repeated run). `LocalRelation` frames compare
  * fine — the failure is specific to file relations.
  *
  * The key here is TEXTUAL: the canonicalized plan's treeString
  * (expression ids normalized positionally, so structurally identical
  * plans print identically) plus an explicit list of every file
  * relation's root paths (treeString alone may truncate or omit
  * locations — two different scale-factor dirs must never collide).
  * The tree is printed with maxFields = Int.MaxValue: the default
  * truncates each node's field list at 25 ("... N more fields"), so two
  * plans differing only in a caller-provided 30-element `isin` list
  * could print identically and WRONGLY share a memo entry (review r13).
  * Literal VALUES may still be elided per-node (Spark truncates long
  * individual strings too) — that cannot cause a wrong reuse for
  * DATA-DERIVED literals (pure functions of the visible plan + the
  * listed paths), and caller-provided predicates live in the field
  * lists the untruncated print now covers.
  */
object PlanKey {
  def of(df: DataFrame): String = {
    val plan = df.queryExecution.analyzed
    val paths = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }.mkString(";")
    // LocalRelation data is INVISIBLE in the treeString (only the output
    // attrs print), so two in-memory frames with identical schemas but
    // different rows would collide — caught by LinkPredictSpec's
    // shifted-ids contract, which reused the wrong cached edge list.
    // Fingerprint the rows explicitly; local relations are driver-sized
    // by construction, so the stringify cost is bounded.
    val locals = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.length + ":" + l.data.map(_.toString).mkString("|").hashCode
    }.mkString(";")
    plan.canonicalized.treeString(verbose = false, addSuffix = false,
      maxFields = Int.MaxValue, printOperatorId = false) +
      "\n#paths=" + paths + "\n#local=" + locals
  }
}
