package graft.core

import org.apache.spark.sql.SparkSession

/** Driver-scale session hygiene shared by every graft main.
  *
  * Two concerns live here because every entrypoint needs both:
  *
  * 1. [[maxPlanStringLength]] — a BOUND on Spark's plan-description
  *    strings. The default (`spark.sql.maxPlanStringLength` ≈ 2 GiB)
  *    lets one `SQLExecutionStart` event render a deep-lineage plan
  *    into gigabytes of driver heap: measured on the corpus funnel's
  *    stage-6b query (a drift diff whose tree reaches back through
  *    fifteen stages), the unbounded `explainString` burned 4+ minutes
  *    of driver CPU and 5 GiB of heap building a string nobody reads —
  *    with the UI disabled the description exists only for event-log
  *    listeners. On a 1000-executor cluster the driver is the scarcest
  *    resource in the job; 8 MiB leaves every legitimate explain intact
  *    (ExplainAudit and the PlanAuditSpec contracts read full plan
  *    strings — the largest audited plan renders well under 1 MiB)
  *    while bounding the pathological accumulation to milliseconds.
  *
  * 2. [[anchorOnce]] — the fixed-work host-calibration anchor
  *    (VERDICT r15 task 2). A constant synthetic query — no I/O, no
  *    shuffle variance — whose wall time moves with the HOST (CPU
  *    contention, noisy neighbors, thermal), never with the code.
  *    `Bench` emits it next to every session's timings so
  *    tools/bench_drift.py can compare anchor-NORMALIZED times across
  *    sessions, and the corpus funnel gates its wall-time budget on the
  *    normalized ratio — measured same-binary sessions on this box
  *    spread 4-5× wall (70.7 s vs 330.9 s for the identical funnel)
  *    while wall/anchor stayed put, which is exactly the drift class
  *    three rounds of bench records needed manual adjudication for.
  */
object HostAnchor {

  /** Session-wide bound for `spark.sql.maxPlanStringLength`. */
  val maxPlanStringLength: String = "8388608"

  /** One anchor measurement: sum over 600 M hashed longs, split across
    * `parts` partitions (callers pass their session's core count so the
    * anchor saturates the same parallelism the measured work uses).
    * pmod bounds the summand — a raw sum(xxhash64) overflows Long under
    * ANSI after ~2^32 rows. */
  def anchorOnce(spark: SparkSession, parts: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 600000000L, 1L, parts)
      .selectExpr("sum(pmod(xxhash64(id), 1000)) s").collect()
    (System.nanoTime() - t0) / 1e9
  }
}
