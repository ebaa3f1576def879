package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.functions._

/** Preview generation and record comparison — the two operator-shaped
  * command utilities left from the reference's Solr family:
  *
  *  - `Solr/PreviewCreator.php` (create → createSolrArray without a
  *    commit): the full extract + normalize + map + suppression-check
  *    composition applied to a record, returning the would-be index
  *    document — including records suppression would skip, with the flag
  *    carried so the preview UI can show why.
  *  - `Solr/SolrComparer.php:220` compareWithSolrRecord (+
  *    `Command/Records/CompareRecords.php`): field-level diff of the
  *    newly built document against the previously indexed one — per
  *    field, values only in the old version (`---`) and only in the new
  *    (`+++`); fields restricted by compareFields or minus the ignore
  *    list. The Spark shape is a distributed diff of two index
  *    generations: join on id, per-field set difference, emit only
  *    fields that changed (the reference's skipMissing flag corresponds
  *    to the join type — inner join here; a left join with null-handling
  *    gives the !skipMissing behavior).
  */
object PreviewQueries {

  val all: Seq[Q] = Seq(
    Q(
      // PreviewCreator: the composed would-be Solr document with the
      // suppression flag carried instead of applied. Composes the
      // certified pieces: sort title, Last,First author, value mapping,
      // suppressMatch.
      "record_preview",
      (s, d) => {
        val k = col("p_partkey")
        val title = col("p_name")
        val author = array_join(slice(split(col("p_name"), " "), 1, 2), " ")
        val fmtRaw = when(k % 7 === 0, lit("Electronic Book")).otherwise(lit("Book"))
        val fmtMapped = when(fmtRaw === "Electronic Book", lit("eBook")).otherwise(fmtRaw)
        val suppressed = ExportQueries.suppressMatch(array(fmtRaw), "/^Electronic/")
        Tables
          .part(s, d)
          .select(
            concat(lit("part."), k.cast("string")).as("record_id"),
            title.as("title"),
            createSortTitle(title).as("title_sort"),
            convertAuthorLastFirst(author).as("author"),
            fmtMapped.as("format"),
            (lit(1900) + k % 100).cast("string").as("publish_year"),
            suppressed.as("suppressed")
          )
      },
      Some {
        import MetadataQueries._
        val author = "array_to_string(string_split(p_name, ' ')[1:2], ' ')"
        s"""WITH ${sortTitleStagesSql("part", "p_name", "title_sort", "st")}
           |SELECT 'part.' || cast(p_partkey as varchar) AS record_id,
           |  p_name AS title,
           |  title_sort,
           |  regexp_replace($author, '^(.*) ([^ ]+)$$', '\\2, \\1') AS author,
           |  (CASE WHEN p_partkey % 7 = 0 THEN 'eBook' ELSE 'Book' END) AS format,
           |  cast(1900 + p_partkey % 100 as varchar) AS publish_year,
           |  (p_partkey % 7 = 0) AS suppressed
           |FROM st3""".stripMargin
      }
    ),
    Q(
      // SolrComparer field diff: old generation vs new generation of the
      // same records, three perturbation classes (changed scalar, added
      // multivalue entry, changed year), output one row per (record,
      // field) that differs with the removed/added value sets.
      "record_compare",
      (s, d) => {
        val k = col("p_partkey")
        val titleOld = col("p_name")
        val titleNew =
          when(k % 7 === 0, concat(col("p_name"), lit(" 2nd ed."))).otherwise(col("p_name"))
        val topicsOld = array(col("p_type"), concat(lit("size-"), col("p_size").cast("string")))
        val topicsNew = when(
          k % 11 === 0,
          concat(topicsOld, array(col("p_brand")))
        ).otherwise(topicsOld)
        val yearOld = (lit(1900) + k % 100).cast("string")
        val yearNew =
          when(k % 13 === 0, (lit(1901) + k % 100)).otherwise(lit(1900) + k % 100).cast("string")
        val fields = array(
          struct(lit("title").as("field"), array(titleOld).as("o"), array(titleNew).as("n")),
          struct(lit("topic").as("field"), topicsOld.as("o"), topicsNew.as("n")),
          struct(lit("publish_year").as("field"), array(yearOld).as("o"), array(yearNew).as("n"))
        )
        Tables
          .part(s, d)
          .select(concat(lit("part."), k.cast("string")).as("record_id"), explode(fields).as("f"))
          .select(
            col("record_id"),
            col("f.field").as("field"),
            array_join(array_except(col("f.o"), col("f.n")), "|").as("removed"),
            array_join(array_except(col("f.n"), col("f.o")), "|").as("added")
          )
          .filter(col("removed") =!= "" || col("added") =!= "")
      },
      Some(
        """SELECT 'part.' || cast(p_partkey as varchar) AS record_id,
          |  'title' AS field, p_name AS removed, p_name || ' 2nd ed.' AS added
          |FROM part WHERE p_partkey % 7 = 0
          |UNION ALL
          |SELECT 'part.' || cast(p_partkey as varchar), 'topic', '', p_brand
          |FROM part WHERE p_partkey % 11 = 0
          |UNION ALL
          |SELECT 'part.' || cast(p_partkey as varchar), 'publish_year',
          |  cast(1900 + p_partkey % 100 as varchar), cast(1901 + p_partkey % 100 as varchar)
          |FROM part WHERE p_partkey % 13 = 0""".stripMargin
      )
    )
  )
}
