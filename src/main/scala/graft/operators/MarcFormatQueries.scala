package graft.operators

import graft.{Q, Tables}
import graft.functions.MarcFormat._
import org.apache.spark.sql.functions._

/** MARC format-detection registration. 16 synthesized leader/007/008
  * scenarios cover the decision tree's main branches; the oracle states
  * the expected format per scenario directly (derived by hand from
  * FormatCalculator.php), so it validates the implementation against the
  * reference semantics rather than against a mirrored SQL copy of itself.
  */
object MarcFormatQueries {

  // (leader-rt+bl, 007, 008, expected)
  private val scenarios: Seq[(String, String, String, String)] = Seq(
    ("am", "", "", "Book"), // language material monograph
    ("am", "", " " * 23 + "o", "eBook"), // 008/23 online
    ("as", "", " " * 21 + "p", "Journal"),
    ("as", "", " " * 21 + "n", "Newspaper"),
    ("aa", "", "", "Article"), // with serial host (flag below)
    ("aa", "", "", "BookComponentPart"),
    ("ab", "", "", "SerialComponentPart"),
    ("am", "vd  s", "", "Video"), // 007 video: primary format is Video
    ("am", "sd", "", "SoundDisc"),
    ("em", "", " " * 25 + "e", "Atlas"), // cartographic, 008/25 atlas
    ("jm", "", "", "MusicRecording"),
    ("mm", "", " " * 26 + "g", "VideoGame"),
    ("mm", "", " " * 26 + "d", "eBook"), // computer file document
    ("ai", "", " " * 21 + "w", "Website"),
    ("tm", "", "", "Manuscript"),
    ("zz", "", "", "Unknown")
  )

  val all: Seq[Q] = Seq(
    Q(
      "marc_format",
      (s, d) => {
        val k = col("p_partkey")
        val idx = (k % 16 + 1).cast("int")
        val leader = concat(lit("cccccc"), element_at(array(scenarios.map(x => lit(x._1)): _*), idx))
        val f007 = element_at(array(scenarios.map(x => lit(x._2)): _*), idx)
        val f008 = element_at(array(scenarios.map(x => lit(x._3)): _*), idx)
        val hasHost = k % 16 === 4
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            leader.as("leader"),
            marcPrimaryFormat(leader, f007, f008, hasHost).as("format")
          )
      },
      Some {
        val leaders = scenarios.map(x => s"'${x._1}'").mkString("[", ", ", "]")
        val expected = scenarios.map(x => s"'${x._4}'").mkString("[", ", ", "]")
        s"""SELECT p_partkey,
           |  'cccccc' || ($leaders)[cast(p_partkey % 16 + 1 as int)] AS leader,
           |  ($expected)[cast(p_partkey % 16 + 1 as int)] AS format
           |FROM part""".stripMargin
      }
    )
  )
}
