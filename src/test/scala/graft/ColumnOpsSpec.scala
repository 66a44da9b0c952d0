package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ColumnOps._

class ColumnOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("lastWriteWins honors pandas .loc program order (later writes win)") {
    // the reference's randomized/non-randomized trap (ct_data.py:127-131):
    // contains("randomized") also matches "non-randomized" text; the later
    // non-randomized write must win.
    val df = Seq("randomized trial", "non-randomized trial", "single arm", "other")
      .toDF("description")
    val code = lastWriteWins(
      Seq(
        $"description".contains("randomized") -> lit(1),
        $"description".contains("non-randomized") -> lit(2),
        $"description".contains("single") -> lit(9)),
      default = lit(0))
    val got = df.select($"description", code.as("code")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("randomized trial") == 1)
    assert(got("non-randomized trial") == 2) // later write overrides
    assert(got("single arm") == 9)
    assert(got("other") == 0)
  }

  test("anyTerm matches any substring, none → false") {
    val df = Seq("lung cancer", "breast carcinoma", "healthy").toDF("name")
    val got = df.select($"name", anyTerm($"name", Seq("ancer", "cinoma")).as("f"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("lung cancer") && got("breast carcinoma") && !got("healthy"))
  }

  test("safeDiv yields 0.0 on zero denominator") {
    val df = Seq((4, 2), (1, 0)).toDF("n", "d")
    val got = df.select(safeDiv($"n", $"d").as("r")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(2.0, 0.0))
  }

  test("codeOf maps values with default") {
    val df = Seq("F", "P", "O", "X").toDF("s")
    val got = df.select(codeOf($"s", Seq("F" -> 0, "P" -> 1, "O" -> 2), default = 7).as("c"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(0, 1, 2, 7))
  }
}
