package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT shape centroids (the geometry path of the reference's
  * getCenterCoordinates — reference: MetadataUtils.php:987, which
  * delegates non-ENVELOPE shapes to geoPHP's centroid()). POINT,
  * LINESTRING (vertex mean) and POLYGON (area/shoelace centroid) are
  * implemented as column expressions over the parsed coordinate list —
  * the three shapes the reference's data actually carries.
  */
object Wkt {

  /** Parse "x y" coordinate pairs from the WKT body into an array of
    * structs. Works for POINT(...), LINESTRING(...), POLYGON((...)).
    */
  private def coords(wkt: Column): Column = {
    val body = regexp_extract(wkt, "\\(+([^()]+)\\)+", 1)
    transform(
      split(body, ",\\s*"),
      p =>
        struct(
          element_at(split(trim(p), "\\s+"), 1).cast("double").as("x"),
          element_at(split(trim(p), "\\s+"), 2).cast("double").as("y")
        )
    )
  }

  def wktType(wkt: Column): Column =
    upper(regexp_extract(wkt, "^\\s*([A-Za-z]+)", 1))

  private def mean(c: Column, field: String): Column =
    aggregate(c, lit(0.0), (acc, p) => acc + p.getField(field)) / size(c)

  /** Shoelace area-weighted centroid for a closed polygon ring. */
  private def polyCentroid(c: Column, field: String): Column = {
    val n = size(c)
    val cross = (i: Column) => {
      val p1 = element_at(c, i)
      val p2 = element_at(c, i + 1)
      p1.getField("x") * p2.getField("y") - p2.getField("x") * p1.getField("y")
    }
    val idx = sequence(lit(1), n - 1)
    val a2 = aggregate(idx, lit(0.0), (acc, i) => acc + cross(i))
    val cSum = aggregate(
      idx,
      lit(0.0),
      (acc, i) => {
        val p1 = element_at(c, i)
        val p2 = element_at(c, i + 1)
        acc + (p1.getField(field) + p2.getField(field)) * cross(i)
      }
    )
    cSum / (lit(3.0) * a2)
  }

  def centroidX(wkt: Column): Column = {
    val c = coords(wkt)
    when(wktType(wkt) === "POINT", element_at(c, 1).getField("x"))
      .when(wktType(wkt) === "LINESTRING", mean(c, "x"))
      .when(wktType(wkt) === "POLYGON", polyCentroid(c, "x"))
      .otherwise(multiCentroid(wkt, "x"))
  }

  def centroidY(wkt: Column): Column = {
    val c = coords(wkt)
    when(wktType(wkt) === "POINT", element_at(c, 1).getField("y"))
      .when(wktType(wkt) === "LINESTRING", mean(c, "y"))
      .when(wktType(wkt) === "POLYGON", polyCentroid(c, "y"))
      .otherwise(multiCentroid(wkt, "y"))
  }

  // ---- MULTI* shapes ----

  /** Innermost coordinate groups — one entry per ring/line/point group.
    * (Polygon holes are out of scope: the reference's data carries none,
    * and a hole would need ring-orientation handling.)
    */
  private def ringsOf(wkt: Column): Column =
    transform(
      regexp_extract_all(wkt, lit("\\(([^()]+)\\)"), lit(1)),
      body =>
        transform(
          split(body, ",\\s*"),
          p =>
            struct(
              element_at(split(trim(p), "\\s+"), 1).cast("double").as("x"),
              element_at(split(trim(p), "\\s+"), 2).cast("double").as("y")
            )
        )
    )

  /** Twice the signed shoelace area of one closed ring. */
  private def ringA2(r: Column): Column = {
    val idx = sequence(lit(1), size(r) - 1)
    aggregate(
      idx,
      lit(0.0),
      (acc, i) => {
        val p1 = element_at(r, i)
        val p2 = element_at(r, i + 1)
        acc + (p1.getField("x") * p2.getField("y") - p2.getField("x") * p1.getField("y"))
      }
    )
  }

  private def ringCSum(r: Column, field: String): Column = {
    val idx = sequence(lit(1), size(r) - 1)
    aggregate(
      idx,
      lit(0.0),
      (acc, i) => {
        val p1 = element_at(r, i)
        val p2 = element_at(r, i + 1)
        val cross =
          p1.getField("x") * p2.getField("y") - p2.getField("x") * p1.getField("y")
        acc + (p1.getField(field) + p2.getField(field)) * cross
      }
    )
  }

  /** Centroid of MULTIPOINT / MULTILINESTRING / MULTIPOLYGON.
    * MULTIPOINT and MULTILINESTRING use the vertex mean over every
    * component (the same convention the LINESTRING path above uses);
    * MULTIPOLYGON combines the shoelace sums across rings, i.e. the exact
    * area-weighted centroid of the disjoint union.
    */
  private def multiCentroid(wkt: Column, field: String): Column = {
    val rs = ringsOf(wkt)
    val allPts = flatten(rs)
    when(
      wktType(wkt) === "MULTIPOLYGON",
      aggregate(rs, lit(0.0), (acc, r) => acc + ringCSum(r, field)) /
        (lit(3.0) * aggregate(rs, lit(0.0), (acc, r) => acc + ringA2(r)))
    ).when(
      wktType(wkt).isin("MULTIPOINT", "MULTILINESTRING"),
      mean(allPts, field)
    )
  }
}
