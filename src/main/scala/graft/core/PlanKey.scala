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
  * Long literals (e.g. a 4096-entry boundary array) may be truncated in
  * the treeString; that cannot cause a wrong reuse because such
  * literals are pure functions of the visible plan + the data at the
  * listed paths — if both match, the truncated values match too.
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
    plan.canonicalized.treeString + "\n#paths=" + paths + "\n#local=" + locals
  }
}
