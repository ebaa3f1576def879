package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.functions._

/** Record-model operators: nested field extraction (the reference's
  * record → search-document mapping, `Record/AbstractRecord.php:224`
  * `toSolrArray` / `Record/Marc.php` getTitle/getISBNs/getPublicationYear),
  * the one-blob → many-records splitter (`Splitter/File.php`), and
  * declarative record transformation (`Utils/XslTransformation.php`).
  *
  * Records are modeled as an array<struct<tag,code,val>> column — the
  * Spark-native shape for MARC-style field/subfield data: extraction is
  * `filter`/`transform` over the nested array (codegen'd, no parsing at
  * query time), and the whole record set stays columnar.
  */
object RecordQueries {

  val all: Seq[Q] = Seq(
    Q(
      "marc_extract",
      (s, d) => {
        val k = col("p_partkey")
        val author = array_join(slice(split(col("p_name"), " "), 1, 2), " ")
        val titleMain = col("p_name")
        val titleSub = col("p_type")
        val base = lpad((k * 7919 % 1000000000).cast("string"), 9, "0")
        val checkChar = graft.functions.MetadataFunctions.isbn10CheckChar(base)
        val isbn = concat(base, checkChar)
        val yearStr = concat(lit("c"), (lit(1900) + k % 100).cast("string"), lit("."))
        def f(tag: String, code: String, v: org.apache.spark.sql.Column) =
          struct(lit(tag).as("tag"), lit(code).as("code"), v.as("val"))
        val fields = array(
          f("100", "a", author),
          f("245", "a", titleMain),
          f("245", "b", titleSub),
          f("020", "a", isbn),
          f("260", "c", yearStr)
        )
        def firstVal(tag: String, code: String) =
          element_at(
            filter(fields, x => x.getField("tag") === tag && x.getField("code") === code),
            1
          ).getField("val")
        Tables
          .part(s, d)
          .select(
            k.as("record_id"),
            firstVal("245", "a").as("title"),
            firstVal("100", "a").as("author"),
            normalizeIsbn(firstVal("020", "a")).as("isbn13"),
            extractYear(firstVal("260", "c")).as("pub_year"),
            createTitleKey(firstVal("245", "a")).as("title_key")
          )
      },
      Some {
        import MetadataQueries._
        val base = "lpad(cast(p_partkey*7919 % 1000000000 as varchar), 9, '0')"
        val fields =
          s"""[
             |  struct_pack(tag := '100', code := 'a', val := array_to_string(string_split(p_name, ' ')[1:2], ' ')),
             |  struct_pack(tag := '245', code := 'a', val := p_name),
             |  struct_pack(tag := '245', code := 'b', val := p_type),
             |  struct_pack(tag := '020', code := 'a', val := b || ${isbn10CheckCharSql("b")}),
             |  struct_pack(tag := '260', code := 'c', val := 'c' || cast(1900 + p_partkey % 100 as varchar) || '.')
             |]""".stripMargin
        def firstVal(tag: String, code: String) =
          s"list_filter(fields, x -> x.tag = '$tag' AND x.code = '$code')[1].val"
        s"""WITH t AS (SELECT p_partkey, $fields AS fields
           |  FROM (SELECT *, $base AS b FROM part) _p),
           |e AS (SELECT p_partkey AS record_id,
           |  ${firstVal("245", "a")} AS title,
           |  ${firstVal("100", "a")} AS author,
           |  ${firstVal("020", "a")} AS isbn_raw,
           |  ${firstVal("260", "c")} AS year_raw
           |  FROM t),
           |m AS (SELECT *, regexp_extract(replace(isbn_raw, '-', ''), '([0-9]{9,12}[0-9xX])', 1) AS m FROM e)
           |SELECT record_id, title, author,
           |  ${normIsbnSql("m")} AS isbn13,
           |  regexp_extract(year_raw, '(-?\\d{4})', 1) AS pub_year,
           |  ${titleKeySql("title")} AS title_key
           |FROM m""".stripMargin
      }
    ),
    Q(
      // One blob → many records (reference: Splitter/File.php). The blob is
      // a deterministic delimiter-joined per-host record list; the splitter
      // is split + posexplode — linear per blob, fully distributed.
      "split_records",
      (s, d) => {
        val blobs = Tables
          .lineitem(s, d)
          .groupBy(col("l_orderkey").as("host_id"))
          .agg(
            array_join(
              array_sort(collect_list(concat(
                lpad(col("l_linenumber").cast("string"), 2, "0"),
                lit(":"),
                col("l_partkey").cast("string")
              ))),
              ","
            ).as("blob")
          )
        blobs
          .select(col("host_id"), posexplode(split(col("blob"), ",")))
          .select(
            col("host_id"),
            (col("pos") + 1).as("part_pos"),
            col("col").as("record")
          )
      },
      Some(
        """WITH b AS (
          |  SELECT l_orderkey AS host_id,
          |    string_agg(lpad(cast(l_linenumber as varchar), 2, '0') || ':' || cast(l_partkey as varchar), ','
          |               ORDER BY lpad(cast(l_linenumber as varchar), 2, '0') || ':' || cast(l_partkey as varchar)) AS blob
          |  FROM lineitem GROUP BY l_orderkey),
          |u AS (SELECT host_id,
          |  unnest(list_transform(string_split(blob, ','), (x, i) -> struct_pack(pos := i, rec := x))) AS s
          |  FROM b)
          |SELECT host_id, s.pos AS part_pos, s.rec AS record FROM u""".stripMargin
      )
    ),
    Q(
      // Declarative record transformation (reference:
      // Utils/XslTransformation.php + transformations/*.xsl): reshaping is a
      // projection — Catalyst folds it into the scan, so a "stylesheet" is
      // zero-cost at any scale.
      "transform_records",
      (s, d) =>
        Tables
          .orders(s, d)
          .select(
            concat(lit("order-"), col("o_orderkey").cast("string")).as("record_id"),
            element_at(split(col("o_orderpriority"), "-"), 2).as("priority_label"),
            when(col("o_orderstatus") === "F", lit("finished"))
              .when(col("o_orderstatus") === "O", lit("open"))
              .otherwise(lit("pending")).as("status_label"),
            date_format(col("o_orderdate"), "yyyy").as("order_year"),
            col("o_totalprice").cast("decimal(18,2)").cast("double").as("total_price")
          ),
      Some(
        """SELECT 'order-' || cast(o_orderkey as varchar) AS record_id,
          |  string_split(o_orderpriority, '-')[2] AS priority_label,
          |  (CASE WHEN o_orderstatus = 'F' THEN 'finished'
          |        WHEN o_orderstatus = 'O' THEN 'open'
          |        ELSE 'pending' END) AS status_label,
          |  strftime(o_orderdate, '%Y') AS order_year,
          |  cast(cast(o_totalprice as decimal(18,2)) as double) AS total_price
          |FROM orders""".stripMargin
      )
    )
  )
}
