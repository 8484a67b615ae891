package graft

import org.apache.spark.sql.functions._
import graft.functions.NormalizeText.normalizeText

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  // Build non-ASCII / control inputs from codepoints so the source stays
  // plain ASCII: no editor/tooling can silently re-normalize the fixtures.
  private val eAcute = "\u00e9"            // composed e-acute
  private val composed = s"${eAcute}cole"
  private val decomposed = "e\u0301cole"    // e + combining acute
  private val upper = "\u00c9COLE"           // E-acute COLE
  private val dottedI = "\u0130stanbul"      // dotted capital I
  private val noisy = "bell\u0007null\u0000 \u0085del\u007fc1\u009cend"
  // a control char BETWEEN a base char and its combining mark blocks NFC
  // composition until the strip removes it — output must re-compose
  private val blocked = "e\u0007\u0301cole"

  private val cases = Seq(
    decomposed,               // -> composed
    composed,                 // already composed: unchanged
    upper,                    // lowered to composed e-acute
    dottedI,                  // lowering de-normalizes; output must stay NFC
    "tab\tand\nnewline\rok",  // whitespace controls KEPT
    noisy,                    // C0/DEL/C1 noise stripped, space kept
    "plain ascii stays",      // fast path
    "",
    blocked,                  // strip unblocks composition: must re-NFC
  ).toDF("s")

  test("NFC composition, lowering, and control stripping") {
    val got = cases.select(normalizeText(col("s"))).as[String].collect().toSeq
    assert(got(0) == composed && got(1) == composed && got(2) == composed,
      "all three spellings of ecole must canonicalize identically")
    assert(got(4) == "tab\tand\nnewline\rok", "tab/newline/CR are whitespace, not noise")
    assert(got(5) == "bellnull delc1end")
    assert(got(6) == "plain ascii stays" && got(7) == "")
    assert(got(8) == composed, "stripping must re-compose what it unblocked")
    // output is NFC-normalized even when lowercasing de-normalizes
    got.foreach(s => assert(
      java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC), s))
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    def run() = cases.select(normalizeText(col("s"))).as[String].collect().toSeq
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == codegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null input yields null") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(normalizeText(col("s"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
