package graft

import graft.functions.MetadataFunctions._
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the LIDO display-date range parser
  * (reference: Record/Lido.php:1029 parseDateRange).
  */
class LidoSpec extends SparkSuite {

  private def range(input: String): Any = {
    import spark.implicits._
    Seq(input).toDF("x").select(lidoDateRange(col("x")).as("r")).collect()(0).get(0)
  }

  test("year span") {
    assert(range("1910 - 1935") == "1910-01-01T00:00:00Z,1935-12-31T23:59:59Z")
    assert(range("1910- 1935") == "1910-01-01T00:00:00Z,1935-12-31T23:59:59Z")
  }

  test("ISO y-m-d is day precision, zero-padded") {
    assert(range("1987-6-5") == "1987-06-05T00:00:00Z,1987-06-05T23:59:59Z")
  }

  test("d.m.y with arbitrary separator") {
    assert(range("5.6.1987") == "1987-06-05T00:00:00Z,1987-06-05T23:59:59Z")
    assert(range("05/06/1987") == "1987-06-05T00:00:00Z,1987-06-05T23:59:59Z")
  }

  test("approximate year gets a +-3 window and the century fill") {
    // 45 ? -> 42..48 -> 1942..1948 (two-digit fill, end century from start)
    assert(range("45 ?") == "1942-01-01T00:00:00Z,1948-12-31T23:59:59Z")
    assert(range("1945 ?") == "1942-01-01T00:00:00Z,1948-12-31T23:59:59Z")
  }

  test("bare years, two-digit fill") {
    assert(range("1950") == "1950-01-01T00:00:00Z,1950-12-31T23:59:59Z")
    assert(range("50") == "1950-01-01T00:00:00Z,1950-12-31T23:59:59Z")
  }

  test("future dates and unparseable input are null") {
    assert(range("2030 - 2040") == null)
    assert(range("2035") == null)
    assert(range("unknown date") == null)
  }
}
