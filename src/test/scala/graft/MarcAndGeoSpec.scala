package graft

import graft.functions.MarcFormat._
import graft.functions.Wkt
import graft.operators.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression specs: MarcFormat null handling + reference fixtures,
  * incremental dedup, WKT centroid math.
  */
class MarcAndGeoSpec extends SparkSuite {

  private def fmt(leader: String, f007: String, f008: String, host: Boolean = false): String = {
    val schema = StructType(
      Seq(
        StructField("l", StringType),
        StructField("s7", StringType),
        StructField("s8", StringType)
      )
    )
    val df = spark.createDataFrame(
      java.util.List.of(Row(leader, f007, f008)),
      schema
    )
    df.select(marcPrimaryFormat(col("l"), col("s7"), col("s8"), lit(host)).as("f"))
      .collect()(0)
      .getString(0)
  }

  test("marc format: ordinary book with NULL 007/008 is a Book, not Text") {
    assert(fmt("ccccccam", null, null) == "Book")
  }

  test("marc format: video 007 gives Video as primary format") {
    assert(fmt("ccccccam", "vd  s", null) == "Video")
    assert(fmt("ccccccam", "gt", null) == "Transparency")
    assert(fmt("ccccccam", "kk", null) == "Poster")
  }

  test("marc format: visual material with 008/34 technique is Video") {
    // rt=g, 008/34='l' (live action)
    assert(fmt("ccccccgm", null, " " * 34 + "l") == "Video")
  }

  test("incremental dedup adopts existing cluster ids, leaves new alone") {
    val schema = StructType(
      Seq(
        StructField("id", StringType),
        StructField("source_id", StringType),
        StructField("title", StringType),
        StructField("author", StringType),
        StructField("year", IntegerType),
        StructField("isbn", StringType)
      )
    )
    def df(rows: Row*) =
      spark.createDataFrame(java.util.List.of(rows: _*), schema)
    val clustered = df(
      Row("a.1", "a", "Known Title Here", "smith john", Integer.valueOf(1999), "")
    ).withColumn("dedup_id", lit("cluster-7"))
    val batch = df(
      Row("c.1", "c", "KNOWN TITLE HERE /", "smith john", Integer.valueOf(1999), ""),
      Row("c.2", "c", "Brand New Unseen Work", "doe jane", Integer.valueOf(2005), "")
    )
    val out = Dedup
      .dedupIncremental(batch, clustered)
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap
    assert(out("c.1").contains("cluster-7"))
    assert(out("c.2").isEmpty)
  }

  test("wkt centroids: point identity, polygon shoelace") {
    import spark.implicits._
    val df = Seq(
      "POINT(10.5 -3.5)",
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))",
      "LINESTRING(0 0, 2 2)"
    ).toDF("w")
    val rows = df
      .select(
        Wkt.wktType(col("w")).as("t"),
        round(Wkt.centroidX(col("w")), 6).as("x"),
        round(Wkt.centroidY(col("w")), 6).as("y")
      )
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows(0) == ("POINT", 10.5, -3.5))
    assert(rows(1) == ("POLYGON", 2.0, 2.0)) // square centroid
    assert(rows(2) == ("LINESTRING", 1.0, 1.0))
  }
}
