package graft

import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val hofForm =
    "aggregate(split(text, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"

  test("rolling_hash equals the interpreted HOF it replaced (ASCII/BMP)") {
    val docs = Seq(
      "", "a", "abc", "the quick brown fox", "répétition déjà vu",
      "tabs\tand\nnewlines", "numbers 12345 and punct !?;",
      ("long " * 500).trim, "世界 youé")
      .toDF("text")
    val both = docs.select(
      call_function("rolling_hash", col("text")).as("native"),
      expr(hofForm).as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != hof ${r.getLong(1)}"))
  }

  test("rolling_hash on the real corpus matches the HOF value-for-value " +
      "and stays codegen'd") {
    val docs = graft.io.Tables.documents(spark, sfTiny)
    val df = docs.select(col("doc_id"),
      call_function("rolling_hash", col("text")).as("native"),
      expr(hofForm).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    // the expression must live INSIDE a WholeStageCodegen span — the
    // point of replacing the interpreted fold
    // `*(n)` is the codegen-stage marker in the short plan form — the
    // Project evaluating rolling_hash must carry it
    val plan = docs.select(call_function("rolling_hash", col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("rolling_hash"),
      plan)
  }

  test("rolling_hash null and type behavior") {
    val df = Seq(Some("abc"), None).toDF("text")
      .select(call_function("rolling_hash", col("text")).as("h"))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(0)) && rows.exists(!_.isNullAt(0)))
    val err = intercept[Exception] {
      Seq(1L).toDF("x")
        .select(call_function("rolling_hash", col("x"))).collect()
    }
    assert(err.getMessage.contains("string"))
  }

  test("nfc_normalize composes decomposed text, is identity on NFC, " +
      "null-safe, and stays codegen'd") {
    val decomposedE = "é"          // -> U+00E9
    val angstrom = "Å"              // -> U+00C5 (singleton)
    val rows = Seq(
      Some("plain ascii"),
      Some(s"caf$decomposedE"),
      Some(s"10 $angstrom wide"),
      Some("already café"),
      None)
      .toDF("text")
      .select(col("text"),
        call_function("nfc_normalize", col("text")).as("n"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getString(1) == java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC), r.toString)
    }
    assert(rows.exists(r => !r.isNullAt(0) &&
      r.getString(0) != r.getString(1)), "nothing composed")
    // inside whole-stage codegen, like every native expression here
    // (over the parquet corpus — a local Seq collapses to
    // LocalTableScan and shows no codegen span at all)
    val plan = graft.io.Tables.documents(spark, sfTiny)
      .select(call_function("nfc_normalize", col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("nfc_normalize"),
      plan)
    // the fast path returns the INPUT object for already-normalized
    // strings — pinned at the compute level
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("abc")
    assert(graft.expressions.NfcNormalizeExpr.compute(s) eq s)
  }
}
