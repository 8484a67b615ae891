package graft

import org.apache.spark.sql.functions._
import graft.warehouse.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  // key, segment, balance, valid_from, valid_to, is_current
  private lazy val dim = Seq(
    (1L, "A", 10.0, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true),
    (2L, "B", 20.0, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true),
    // key 3 already has history: a closed row and its open successor
    (3L, "C", 30.0, d("2024-01-01"), d("2024-06-01"), false),
    (3L, "D", 31.0, d("2024-06-01"), null.asInstanceOf[java.sql.Date], true),
  ).toDF("k", "seg", "bal", "valid_from", "valid_to", "is_current")

  private val eff = to_date(lit("2025-06-01"))

  test("scd2Apply closes changed rows, opens successors, inserts new keys") {
    val changes = Seq(
      (1L, "A2", 11.0),  // real change -> close + reopen
      (2L, "B", 20.0),   // no-op change -> untouched
      (9L, "N", 90.0),   // new key -> insert
    ).toDF("k", "seg", "bal")
    val out = Scd.scd2Apply(dim, changes, "k", Seq("seg", "bal"), eff)
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString).orNull,
        r.getBoolean(5)))
      .toSeq
    assert(out == Seq(
      (1L, "A", 10.0, "2024-01-01", "2025-06-01", false),
      (1L, "A2", 11.0, "2025-06-01", null, true),
      (2L, "B", 20.0, "2024-01-01", null, true),
      (3L, "C", 30.0, "2024-01-01", "2024-06-01", false), // history untouched
      (3L, "D", 31.0, "2024-06-01", null, true),
      (9L, "N", 90.0, "2025-06-01", null, true),
    ))
  }

  test("scd2Apply is idempotent under re-delivery of an applied batch") {
    val changes = Seq((1L, "A2", 11.0), (9L, "N", 90.0)).toDF("k", "seg", "bal")
    val once = Scd.scd2Apply(dim, changes, "k", Seq("seg", "bal"), eff)
    val twice = Scd.scd2Apply(once, changes, "k", Seq("seg", "bal"), eff)
    assert(twice.orderBy("k", "valid_from").collect().map(_.toSeq).toSeq ==
      once.orderBy("k", "valid_from").collect().map(_.toSeq).toSeq)
  }

  test("scd2Apply treats NULL tracked values null-safely") {
    val dimN = Seq(
      (1L, null.asInstanceOf[String], 1.0, d("2024-01-01"),
        null.asInstanceOf[java.sql.Date], true),
    ).toDF("k", "seg", "bal", "valid_from", "valid_to", "is_current")
    // null -> value IS a change
    val out1 = Scd.scd2Apply(dimN, Seq((1L, "X", 1.0)).toDF("k", "seg", "bal"),
      "k", Seq("seg", "bal"), eff).collect()
    assert(out1.length == 2)
    // null -> null is a no-op
    val out2 = Scd.scd2Apply(dimN,
      Seq((1L, null.asInstanceOf[String], 1.0)).toDF("k", "seg", "bal"),
      "k", Seq("seg", "bal"), eff).collect()
    assert(out2.length == 1 && out2.head.getBoolean(5))
  }

  test("scd2Apply rejects a change batch with duplicate keys") {
    val changes = Seq((1L, "A2", 11.0), (1L, "A3", 12.0)).toDF("k", "seg", "bal")
    val e = intercept[IllegalArgumentException] {
      Scd.scd2Apply(dim, changes, "k", Seq("seg", "bal"), eff)
    }
    assert(e.getMessage.contains("more than"))
    // opt-out path still builds a plan (validation skipped)
    Scd.scd2Apply(dim, changes, "k", Seq("seg", "bal"), eff,
      validateKeys = false)
    ()
  }

  test("scd2Apply validates required columns") {
    intercept[IllegalArgumentException] {
      Scd.scd2Apply(dim.drop("is_current"),
        Seq((1L, "A", 1.0)).toDF("k", "seg", "bal"), "k", Seq("seg", "bal"), eff)
    }
    intercept[IllegalArgumentException] {
      Scd.scd2Apply(dim, Seq((1L, "A")).toDF("k", "seg"), "k",
        Seq("seg", "bal"), eff)
    }
  }

  test("scd2Apply NULL keys: dim row passes through untouched; change row rejected") {
    // a NULL-keyed current row joins no change (SQL equality) — it must
    // pass through AS IS, not be misread as a brand-new member and have
    // its values replaced by the change side's NULLs
    val dimN = Seq(
      (java.lang.Long.valueOf(1L), "A", 1.0),
      (null.asInstanceOf[java.lang.Long], "GHOST", 9.0))
      .toDF("k", "seg", "bal")
      .withColumn("valid_from", lit(d("2024-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val out = Scd.scd2Apply(dimN, Seq((1L, "A2", 2.0)).toDF("k", "seg", "bal"),
      "k", Seq("seg", "bal"), eff)
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getBoolean(5))).toSet
    assert(out == Set((Some(1L), "A", false), (Some(1L), "A2", true),
      (None, "GHOST", true)), s"got $out")
    // a NULL-keyed CHANGE row can never match a member — rejected loudly
    val e = intercept[IllegalArgumentException] {
      Scd.scd2Apply(dimN,
        Seq((null.asInstanceOf[java.lang.Long], "X", 1.0)).toDF("k", "seg", "bal"),
        "k", Seq("seg", "bal"), eff)
    }
    assert(e.getMessage.contains("NULL"))
    // ... and the rejection is a correctness INVARIANT, not part of the
    // dedup validation: the validateKeys=false opt-out (pre-deduped
    // batches) must still refuse a NULL-keyed ghost (ADVICE r12)
    val e2 = intercept[IllegalArgumentException] {
      Scd.scd2Apply(dimN,
        Seq((null.asInstanceOf[java.lang.Long], "X", 1.0)).toDF("k", "seg", "bal"),
        "k", Seq("seg", "bal"), eff, validateKeys = false)
    }
    assert(e2.getMessage.contains("NULL"))
  }
}
