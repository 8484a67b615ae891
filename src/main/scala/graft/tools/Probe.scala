package graft.tools

import org.apache.spark.sql.SparkSession

/** The ONE parameterized diagnostic probe (VERDICT r14 task 5 — the
  * per-round one-shot probe mains kept accreting; this replaces them
  * all). Prints the formatted plan and warm/cold timings for any
  * registry query, so a bench-notes adjudication is a command line, not
  * a new main.
  *
  * Usage:
  *   tools/run.sh graft.tools.Probe <queryName> [sfDir] [reps]
  *
  * Env: SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_PROBE_NOPLAN=1 to
  * skip the explain (pure timing run), SPARK_GRAFT_PROBE_STAGES=1 to
  * print per-stage metrics (wall, executor time, shuffle bytes, spill)
  * after each rep — the Spark-UI stage table for a headless box, the
  * guide-§1 "decide whether the time is shuffle read or compute" loop.
  */
object Probe {

  /** Per-stage accumulator printed by SPARK_GRAFT_PROBE_STAGES: one line
    * per completed stage in completion order. Wall = submission→completion
    * (includes scheduling); exec = Σ task executorRunTime. */
  private final class StageMetrics extends org.apache.spark.scheduler.SparkListener {
    case class Row(id: Int, name: String, tasks: Int, wallMs: Long,
      execMs: Long, shReadMb: Double, shWriteMb: Double, inMb: Double,
      spillMb: Double)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val wall = (for {s <- si.submissionTime; c <- si.completionTime}
        yield c - s).getOrElse(-1L)
      rows.add(Row(si.stageId, si.name.takeWhile(_ != '\n').take(80),
        si.numTasks, wall, m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        m.inputMetrics.bytesRead / 1e6, m.diskBytesSpilled / 1e6))
    }
    def drainAndPrint(): Unit = {
      println(f"${"stage"}%6s ${"tasks"}%5s ${"wall_s"}%8s ${"exec_s"}%8s " +
        f"${"shRd_MB"}%9s ${"shWr_MB"}%9s ${"in_MB"}%8s ${"spill"}%7s  name")
      var r = rows.poll()
      val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (r != null) { acc += r; r = rows.poll() }
      acc.sortBy(-_.wallMs).take(30).foreach { x =>
        println(f"${x.id}%6d ${x.tasks}%5d ${x.wallMs / 1e3}%8.2f " +
          f"${x.execMs / 1e3}%8.2f ${x.shReadMb}%9.1f ${x.shWriteMb}%9.1f " +
          f"${x.inMb}%8.1f ${x.spillMb}%7.1f  ${x.name}")
      }
      println(f"TOTAL exec ${acc.map(_.execMs).sum / 1e3}%.2f s over " +
        f"${acc.size} stages / ${acc.map(_.tasks).sum} tasks")
    }
  }
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Probe <queryName> [sfDir] [reps] — queryName from SparkEntry.queries")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bounded plan-description strings (see core.HostAnchor)
      .config("spark.sql.maxPlanStringLength",
        graft.core.HostAnchor.maxPlanStringLength)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; names: ${graft.SparkEntry.queries.keys.toSeq.sorted.take(8).mkString(", ")}…"))
    if (!sys.env.contains("SPARK_GRAFT_PROBE_NOPLAN"))
      fn(spark, dir).explain("formatted")
    val stages = if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES"))
      Some(new StageMetrics) else None
    stages.foreach(spark.sparkContext.addSparkListener)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime
      val n = fn(spark, dir).collect().length
      println(f"rep $i: ${(System.nanoTime - t0) / 1e9}%.2fs ($n rows)")
      stages.foreach { s =>
        // listener events are posted asynchronously; let the bus drain
        Thread.sleep(300)
        s.drainAndPrint()
      }
    }
    spark.stop()
  }
}
