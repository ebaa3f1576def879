package graft

import graft.functions.CallNumbers._
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the call-number semantics (reference:
  * DeweyCallNumber.php / LcCallNumber.php / AbstractCallNumber.php:74).
  */
class CallNumbersSpec extends SparkSuite {

  private def eval1(c: org.apache.spark.sql.Column, input: String): Any = {
    import spark.implicits._
    Seq(input).toDF("x").select(c.as("r")).collect()(0).get(0)
  }

  test("sortableString length-prefixes digit runs with zero-strip") {
    // '004' -> intval 4 -> strlen 1 -> '1004'; '123' -> '3123'
    assert(eval1(sortableString(col("x")), "004") == "1004")
    assert(eval1(sortableString(col("x")), "123") == "3123")
    assert(eval1(sortableString(col("x")), "a12b") == "A212B")
    assert(eval1(sortableString(col("x")), "x  y") == "X Y")
  }

  test("dewey parse + sort key") {
    assert(eval1(deweyValid(col("x")), "004.16 A123") == true)
    assert(eval1(deweyValid(col("x")), "QA76") == false)
    assert(eval1(deweyClassification(col("x")), "004.16 A123x") == "004.16")
    assert(eval1(deweyCutter(col("x")), "004.16 .A123 rest") == "A123")
    assert(eval1(deweySearchString(col("x")), "004.16 A123") == "004.16A123")
    // digits '004' -> '1004'; decimal '.16'; cutter 'A123'; trailing
    // space = the reference's always-appended (never-null) empty suffix
    // segment (DeweyCallNumber.php:165, pinned by its own unit test —
    // see ReferenceParitySpec).
    assert(eval1(deweySortKey(col("x")), "004.16 .A123") == "1004.16 A123 ")
  }

  test("dewey precision buckets (getNumber)") {
    // floor(512.5/100)*100 = 500; tens 510; ones 512 — zero-padded to 3.
    assert(eval1(deweyNumber(col("x"), 100), "512.5 A1") == "500")
    assert(eval1(deweyNumber(col("x"), 10), "512.5") == "510")
    assert(eval1(deweyNumber(col("x"), 1), "512.5") == "512")
    assert(eval1(deweyNumber(col("x"), 100), "45.67") == "000")
    assert(eval1(deweyNumber(col("x"), 1), "45.67") == "045")
    assert(eval1(deweyNumber(col("x"), 100), "QA76") == "")
  }

  test("lc parse + validity + sort key") {
    assert(eval1(lcValid(col("x")), "QA76.5 .B3") == true)
    assert(eval1(lcValid(col("x")), "IX12") == false) // I-prefix invalid
    assert(eval1(lcValid(col("x")), "QA") == false) // no digits
    assert(eval1(lcLetters(col("x")), "QA76.5 .B3") == "QA")
    assert(eval1(lcDigits(col("x")), "QA76.5 .B3") == "76")
    assert(eval1(lcCutter(col("x")), "QA76.5 .B3") == ".B3")
    // letters 'QA', digits 76 -> '276', decimal '.5', cutter B3 -> 'B13'
    assert(eval1(lcSortKey(col("x")), "QA76.5 .B3") == "QA 276.5 B13")
  }
}
