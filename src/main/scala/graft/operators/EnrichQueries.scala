package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions.normalizeKey
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Offline-join forms of the remaining enrichers, mirroring the way
  * `enrich_authority` models Skosmos: the live HTTP lookup becomes a
  * lookup dimension table, broadcast-joined against the record stream —
  * zero shuffle of the fact side, which is the only shape that survives a
  * 100 TB ingest.
  *
  *   - `enrich_geocode` (reference: Enrichment/NominatimGeocoder.php:215):
  *     the blocklist regex veto, the trailing letter/flat-number address
  *     cleanup (`:278`), and the iterative retry (drop the trailing street
  *     number) re-expressed as a priority-ordered pair of candidate keys
  *     joined against the geocode table; first hit supplies the WKT and
  *     the center point.
  *   - `enrich_musicbrainz` (reference: Enrichment/
  *     MusicBrainzEnrichment.php:78): music ids with the
  *     indicator-type→query-type map (isrc stays, upc/ismn/ian→catno with
  *     a release-title conjunct, musicb→reid, unknown skipped) and
  *     publisher numbers with the two-stage fallback ("source id" catalog
  *     number, else "id"+title), ids sanitized by cut-at-space +
  *     normalizeKey (`:149`).
  */
object EnrichQueries {

  private val geocode = Q(
    "enrich_geocode",
    (s, d) => {
      val k = col("s_suppkey")
      // Geocode lookup: place name -> lon/lat + polygon WKT (the cached
      // result store of the reference's Nominatim queries).
      val geo = Tables
        .nation(s, d)
        .select(
          col("n_name").as("geo_key"),
          (col("n_nationkey") + 0.5).cast("double").as("lon"),
          (col("n_regionkey") + 10.25).cast("double").as("lat")
        )
        .withColumn(
          "wkt",
          concat(lit("POINT("), col("lon").cast("string"), lit(" "), col("lat").cast("string"), lit(")"))
        )
      val base = Tables
        .supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      val num = (k % 200 + 1).cast("string")
      val locRaw = when(k % 17 === 0, lit("SECRET PLACE"))
        .when(k % 3 === 0, concat(col("n_name"), lit(" "), num, lit(" b 2")))
        .when(k % 3 === 1, concat(col("n_name"), lit(" "), num))
        .otherwise(col("n_name"))
      val blocked = locRaw.rlike("(?i)SECRET")
      // NominatimGeocoder.php:278 — strip a trailing letter (+ optional
      // flat number) from an address.
      val cleaned = regexp_replace(locRaw, "(.{3,}\\s+(\\d{1,3}))\\s*[a-zA-Z]\\s*\\d*$", "$1")
      // Retry fallback: drop the trailing street number.
      val cand2 = regexp_replace(cleaned, "\\s+\\d+$", "")

      val g1 = geo.select(
        col("geo_key").as("k1"),
        col("wkt").as("wkt1"),
        col("lon").as("lon1"),
        col("lat").as("lat1")
      )
      val g2 = geo.select(
        col("geo_key").as("k2"),
        col("wkt").as("wkt2"),
        col("lon").as("lon2"),
        col("lat").as("lat2")
      )
      base
        .withColumn("blocked", blocked)
        .withColumn("cleaned", cleaned)
        .withColumn("cand2", cand2)
        .join(broadcast(g1), col("cleaned") === col("k1"), "left")
        .join(broadcast(g2), col("cand2") === col("k2"), "left")
        .select(
          k.as("s_suppkey"),
          when(col("blocked"), lit("")).otherwise(col("cleaned")).as("location_cleaned"),
          when(col("blocked"), lit(""))
            .otherwise(coalesce(col("wkt1"), col("wkt2"), lit("")))
            .as("location_geo"),
          when(col("blocked"), lit(""))
            .otherwise(
              coalesce(
                concat(col("lon1").cast("string"), lit(" "), col("lat1").cast("string")),
                concat(col("lon2").cast("string"), lit(" "), col("lat2").cast("string")),
                lit("")
              )
            )
            .as("center")
        )
    },
    Some {
      val lon = "cast(n_nationkey + 0.5 as varchar)"
      val lat = "cast(n_regionkey + 10.25 as varchar)"
      s"""SELECT s_suppkey,
         |  (CASE WHEN s_suppkey % 17 = 0 THEN ''
         |        WHEN s_suppkey % 3 = 2 THEN n_name
         |        ELSE n_name || ' ' || cast(s_suppkey % 200 + 1 as varchar) END) AS location_cleaned,
         |  (CASE WHEN s_suppkey % 17 = 0 THEN ''
         |        ELSE 'POINT(' || $lon || ' ' || $lat || ')' END) AS location_geo,
         |  (CASE WHEN s_suppkey % 17 = 0 THEN ''
         |        ELSE $lon || ' ' || $lat END) AS center
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin
    }
  )

  private val musicbrainz = Q(
    "enrich_musicbrainz",
    (s, d) => {
      val k = col("p_partkey")
      // MusicBrainz lookup dimensions (the cached query-result store):
      // release searches keyed exactly the way the reference builds its
      // queries.
      def dim(n: Int, keyFor: Column => Column, mbidPrefix: String, keep: Column => Column) = {
        val i = col("id")
        s.range(0, n).toDF("id")
          .filter(keep(i))
          .select(keyFor(i).as("mb_key"), concat(lit(mbidPrefix), i.cast("string")).as("mbid"))
      }
      val is = (i: Column) => i.cast("string")
      val mbIsrc = dim(300, i => concat(lit("isrc:mid"), is(i)), "MBI-", _ % 2 === 0)
      val mbCatTitle =
        dim(300, i => concat(lit("catno:mid"), is(i), lit("&release "), is(i % 50)), "MBC-", _ % 3 === 0)
      val mbReid = dim(300, i => concat(lit("reid:mid"), is(i)), "MBR-", _ % 3 === 0)
      val mbCatPub =
        dim(100, i => concat(lit("catno:lbl"), is(i % 10), lit(" pn"), is(i)), "MBP-", _ % 2 === 0)
      val mbCatPubTitle = dim(
        100,
        i => concat(lit("catno:pn"), is(i), lit("&release "), is(i % 50)),
        "MBF-",
        i => i % 2 === 1 && i % 5 === 0
      )

      val titleShort = concat(lit("release "), (k % 50).cast("string"))
      // getMusicIds model: id "MID-<n> (v)" sanitized (cut at first
      // space/paren, normalizeKey) -> "mid<n>"; type by indicator.
      val sanId = normalizeKey(regexp_replace(concat(lit("MID-"), (k % 300).cast("string"), lit(" (v)")), "[\\s(\\[].*$", ""))
      val hasMusic = k % 2 === 0
      val t = k % 5
      val musicKey = when(!hasMusic || t === 4, lit(""))
        .when(t === 0, concat(lit("isrc:"), sanId))
        .when(t === 3, concat(lit("reid:"), sanId))
        .otherwise(concat(lit("catno:"), sanId, lit("&"), titleShort))

      // Publisher numbers: catno:"<source> <id>", fallback
      // catno:"<id>" + release title.
      val hasPub = k % 5 =!= 4
      val pubId = normalizeKey(concat(lit("PN-"), (k % 100).cast("string")))
      val pubSrc = normalizeKey(concat(lit("Lbl"), (k % 10).cast("string")))
      val pubKey1 = when(!hasPub, lit("")).otherwise(concat(lit("catno:"), pubSrc, lit(" "), pubId))
      val pubKey2 = when(!hasPub, lit("")).otherwise(concat(lit("catno:"), pubId, lit("&"), titleShort))

      val fact = Tables
        .part(s, d)
        .select(
          k.as("p_partkey"),
          musicKey.as("music_key"),
          pubKey1.as("pub_key1"),
          pubKey2.as("pub_key2")
        )
      val j = fact
        .join(
          broadcast(mbIsrc.union(mbCatTitle).union(mbReid).withColumnRenamed("mbid", "music_mbid")),
          col("music_key") === col("mb_key"),
          "left"
        )
        .drop("mb_key")
        .join(
          broadcast(mbCatPub.withColumnRenamed("mbid", "pub_mbid1")),
          col("pub_key1") === col("mb_key"),
          "left"
        )
        .drop("mb_key")
        .join(
          broadcast(mbCatPubTitle.withColumnRenamed("mbid", "pub_mbid2")),
          col("pub_key2") === col("mb_key"),
          "left"
        )
        .drop("mb_key")
      // Two-stage publisher fallback: the title-qualified query runs only
      // when the "source id" query found nothing.
      val pubMbid = coalesce(col("pub_mbid1"), col("pub_mbid2"))
      j.select(
        col("p_partkey"),
        array_join(
          array_distinct(
            filter(
              array(coalesce(col("music_mbid"), lit("")), coalesce(pubMbid, lit(""))),
              x => x =!= ""
            )
          ),
          "|"
        ).as("mbids")
      )
    },
    Some {
      // Expected values derived by hand from the dim membership rules
      // (even-isrc, div3-catno/reid, even-publisher, i%10==5 fallback) and
      // the modulus compatibilities (2,3 | 300; 2,5,10 | 100; 50 | both).
      s"""SELECT p_partkey,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN p_partkey % 2 = 0 THEN
         |       (CASE WHEN p_partkey % 5 = 0 THEN 'MBI-' || cast(p_partkey % 300 as varchar)
         |             WHEN p_partkey % 5 IN (1, 2) AND p_partkey % 3 = 0 THEN 'MBC-' || cast(p_partkey % 300 as varchar)
         |             WHEN p_partkey % 5 = 3 AND p_partkey % 3 = 0 THEN 'MBR-' || cast(p_partkey % 300 as varchar)
         |             ELSE '' END)
         |     ELSE '' END),
         |    (CASE WHEN p_partkey % 5 != 4 THEN
         |       (CASE WHEN p_partkey % 2 = 0 THEN 'MBP-' || cast(p_partkey % 100 as varchar)
         |             WHEN p_partkey % 10 = 5 THEN 'MBF-' || cast(p_partkey % 100 as varchar)
         |             ELSE '' END)
         |     ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS mbids
         |FROM part""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(geocode, musicbrainz)
}
