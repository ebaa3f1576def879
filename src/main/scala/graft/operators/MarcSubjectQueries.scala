package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MARC subject extraction and 880 alternate-script linking.
  *
  * Reference semantics (Record/Marc.php):
  *   - getTopics:2015 / getGenres:2046 / getGeographicTopics:2060 /
  *     getEras:2074 — per-tag subfield whitelists (650/655/651/648 here),
  *     each field occurrence's whitelisted subfields joined with ' ' and
  *     trailing punctuation stripped.
  *   - getAuthorsByRelator:2236 — a field matches when its normalized
  *     $4/$e relator intersects the allowed set, or when it has no relator
  *     and its tag is in noRelatorRequired; the first relator is reported.
  *   - getLinkedSubfieldsFrom880 (MarcHandler) — a field carrying
  *     $6 = "880-NN" links to the 880 field whose own $6 starts with
  *     "<tag>-NN"; the linked field's whitelisted subfields are appended
  *     to the author terms before punctuation stripping.
  *
  * The record is one `array<struct<tag, subs array<struct<code,val>>>>`
  * column — field occurrences with ordered subfields — and the 880 link
  * is a nested array lambda over the same record, so the whole extraction
  * (including the "join" to the alternate script) stays inside
  * whole-stage codegen with zero shuffles.
  */
object MarcSubjectQueries {

  private def sf(code: String, value: Column): Column =
    struct(lit(code).as("code"), value.as("val"))

  val all: Seq[Q] = Seq(
    Q(
      "marc_subjects_880",
      (s, d) => {
        val k = col("p_partkey")
        val ks = k.cast("string")
        val fields = array(
          struct(lit("100").as("tag"), array(
            sf("a", concat(lit("Author "), (k % 50).cast("string"), lit(", First."))),
            sf(
              "4",
              when(k % 3 === 0, lit("aut")).when(k % 3 === 1, lit("edt")).otherwise(lit(""))
            ),
            sf("6", when(k % 2 === 0, lit("880-01")).otherwise(lit("")))
          ).as("subs")),
          struct(lit("700").as("tag"), array(
            sf("a", concat(lit("Co Author "), (k % 30).cast("string"))),
            sf("e", lit("editor."))
          ).as("subs")),
          struct(lit("880").as("tag"), array(
            sf("6", when(k % 2 === 0, lit("100-01/(3/r")).otherwise(lit("999-99"))),
            sf("a", concat(lit("Alt "), ks))
          ).as("subs")),
          struct(lit("650").as("tag"), array(
            sf("a", concat(lit("Topic "), (k % 11).cast("string"))),
            sf("x", lit("Hist.")),
            sf("9", lit("env"))
          ).as("subs")),
          struct(when(k % 4 === 0, lit("650")).otherwise(lit("999x")).as("tag"), array(
            sf("a", lit("Second topic"))
          ).as("subs")),
          struct(lit("655").as("tag"), array(
            sf("a", concat(lit("Genre "), (k % 7).cast("string"))),
            sf("2", lit("lcgft"))
          ).as("subs")),
          struct(lit("651").as("tag"), array(
            sf("a", concat(lit("Place "), (k % 13).cast("string"))),
            sf("v", lit("Maps."))
          ).as("subs")),
          struct(lit("648").as("tag"), array(
            sf("a", concat((lit(1800) + k % 200).cast("string"), lit("-luku")))
          ).as("subs"))
        )
        val doc = Tables
          .part(s, d)
          .select(concat(lit("m"), ks).as("record_id"), fields.as("fields"))
        val flds = col("fields")

        def subVal(f: Column, code: String): Column =
          coalesce(
            get(
              transform(
                filter(f.getField("subs"), sc => sc.getField("code") === code),
                _.getField("val")
              ),
              lit(0)
            ),
            lit("")
          )
        def joinedSubs(f: Column, codes: Seq[String]): Column =
          array_join(
            transform(
              filter(
                f.getField("subs"),
                sc => sc.getField("code").isin(codes.map(lit(_)): _*) &&
                  sc.getField("val") =!= ""
              ),
              _.getField("val")
            ),
            " "
          )
        def fieldsOf(tag: String): Column =
          filter(flds, f => f.getField("tag") === tag)

        /** getFieldsSubfields(GET_BOTH-lite): one stripped value per field
          * occurrence of `tag`.
          */
        def fieldValues(tag: String, codes: Seq[String]): Column =
          filter(
            transform(
              fieldsOf(tag),
              // bindOnce: strip mentions its input ~300×; bind the joined
              // subfield tree to a lambda var so the plan stays linear.
              f => bindOnce(trim(joinedSubs(f, codes)))(stripTrailingPunctuation)
            ),
            v => v =!= ""
          )

        def fieldRelators(f: Column): Column =
          transform(
            filter(
              f.getField("subs"),
              sc => sc.getField("code").isin("4", "e") && sc.getField("val") =!= ""
            ),
            sc => normalizeRelator(sc.getField("val"))
          )

        /** Author names for `tag` whose relator set intersects `relators`
          * (or is empty, when the tag requires none), with the 880-linked
          * alternate script appended before the final strip.
          */
        def authorsByRelator(
            tag: String,
            codes: Seq[String],
            relators: Seq[String],
            noRelatorRequired: Boolean
        ): Column = {
          val matched = filter(
            fieldsOf(tag),
            f => {
              val rels = fieldRelators(f)
              val noRel = size(rels) === 0 && lit(noRelatorRequired)
              noRel || size(array_intersect(rels, array(relators.map(lit(_)): _*))) > 0
            }
          )
          transform(
            matched,
            f => {
              val base = joinedSubs(f, codes)
              val link6 = subVal(f, "6")
              val occ = substring(link6, 5, 2)
              val altTerms = flatten(
                transform(
                  filter(
                    flds,
                    g => g.getField("tag") === "880" &&
                      substring(
                        coalesce(
                          get(
                            transform(
                              filter(g.getField("subs"), sc => sc.getField("code") === "6"),
                              _.getField("val")
                            ),
                            lit(0)
                          ),
                          lit("")
                        ),
                        1,
                        tag.length + 3
                      ) === concat(lit(tag), lit("-"), occ)
                  ),
                  g =>
                    transform(
                      filter(
                        g.getField("subs"),
                        sc => sc.getField("code").isin(codes.map(lit(_)): _*) &&
                          sc.getField("val") =!= ""
                      ),
                      _.getField("val")
                    )
                )
              )
              val withAlt = when(
                link6.startsWith("880-") && size(altTerms) > 0,
                concat(base, lit(" "), array_join(altTerms, " "))
              ).otherwise(base)
              struct(
                // bindOnce: withAlt embeds the whole 880-link scan; without
                // the binding, strip's ~300 input mentions serialize a
                // ~23 MiB task binary for this one projection.
                bindOnce(trim(withAlt))(stripTrailingPunctuation).as("name"),
                coalesce(get(fieldRelators(f), lit(0)), lit("")).as("relator")
              )
            }
          )
        }

        val nameCodes = Seq("a", "b", "c", "d")
        val primary = authorsByRelator("100", nameCodes, Seq("aut", "cre"), noRelatorRequired = true)
        val secondary = authorsByRelator("700", nameCodes, Seq("edt", "editor"), noRelatorRequired = false)

        // Staged selects: the author/topic array expressions embed the
        // `fields` tree many times over; materializing them once as
        // aliased columns keeps CollapseProject from re-inlining the
        // whole tree into every consumer (the final select reads each
        // array twice), which otherwise serializes a ~42 MiB plan.
        val staged = doc.select(
          col("record_id"),
          primary.as("primary"),
          secondary.as("secondary"),
          fieldValues("650", Seq("a", "b", "c", "d", "e", "v", "x", "y", "z")).as("topics_arr"),
          fieldValues("655", Seq("a", "b", "c", "v", "x", "y", "z")).as("genres_arr"),
          fieldValues("651", Seq("a", "e", "v", "x", "y", "z")).as("geo_arr"),
          fieldValues("648", Seq("a", "v", "x", "y", "z")).as("eras_arr")
        )
        staged.select(
          col("record_id"),
          array_join(transform(col("primary"), _.getField("name")), "|").as("author"),
          array_join(transform(col("primary"), _.getField("relator")), "|").as("author_role"),
          array_join(transform(col("secondary"), _.getField("name")), "|").as("author2"),
          array_join(transform(col("secondary"), _.getField("relator")), "|").as("author2_role"),
          array_join(col("topics_arr"), "|").as("topics"),
          array_join(col("genres_arr"), "|").as("genres"),
          array_join(col("geo_arr"), "|").as("geographic"),
          array_join(col("eras_arr"), "|").as("eras")
        )
      },
      Some {
        s"""SELECT
           |  'm' || cast(p_partkey as varchar) AS record_id,
           |  (CASE WHEN p_partkey % 3 = 1 THEN ''
           |        WHEN p_partkey % 2 = 0 THEN 'Author ' || cast(p_partkey % 50 as varchar) || ', First. Alt ' || cast(p_partkey as varchar)
           |        ELSE 'Author ' || cast(p_partkey % 50 as varchar) || ', First' END) AS author,
           |  (CASE WHEN p_partkey % 3 = 0 THEN 'aut' ELSE '' END) AS author_role,
           |  'Co Author ' || cast(p_partkey % 30 as varchar) AS author2,
           |  'editor' AS author2_role,
           |  'Topic ' || cast(p_partkey % 11 as varchar) || ' Hist'
           |    || (CASE WHEN p_partkey % 4 = 0 THEN '|Second topic' ELSE '' END) AS topics,
           |  'Genre ' || cast(p_partkey % 7 as varchar) AS genres,
           |  'Place ' || cast(p_partkey % 13 as varchar) || ' Maps' AS geographic,
           |  cast(1800 + p_partkey % 200 as varchar) || '-luku' AS eras
           |FROM part""".stripMargin
      }
    )
  )
}
