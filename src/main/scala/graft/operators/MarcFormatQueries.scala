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

  // Full-list scenarios for the additive labels + 33x path
  // (FormatCalculator.php getFormatsAsList): (leader-rt+bl, 007, 008,
  // has086, has502, 245$h, online-338, video-336, meeting-111/711,
  // expected joined list).
  private final case class FmtScenario(
      ldr: String,
      f007: String,
      f008: String,
      suDoc: Boolean,
      thesis: Boolean,
      h245: String,
      online338: Boolean,
      video336: Boolean,
      meeting: Boolean,
      expected: String
  )

  private val extScenarios: Seq[FmtScenario] = Seq(
    FmtScenario("am", "", "", true, false, "", false, false, false, "GovernmentDocument|Book"),
    // leader-t thesis: Manuscript suppressed, falls through to Book.
    FmtScenario("tm", "", "", false, true, "", false, false, false, "Thesis|Book"),
    FmtScenario("am", "", "", false, false, "[electronic resource]", false, false, false, "Electronic|Book"),
    FmtScenario("am", "", "", false, false, "", false, false, true, "ConferenceProceeding|Book"),
    FmtScenario("am", "", " " * 23 + "o", false, false, "", true, false, false, "Electronic|eBook"),
    FmtScenario("am", "", "", false, false, "", true, true, false, "Electronic|Video|VideoOnline"),
    FmtScenario("am", "", "", false, false, "", false, true, false, "Video"),
    // 007 vd..s — BluRay disc; 33x absent so the 007 path supplies detail.
    FmtScenario("am", "vd  s", "", false, false, "", false, false, false, "Video|BRDisc"),
    FmtScenario("am", "vf", "", false, false, "", false, false, false, "Video|VideoCassette"),
    FmtScenario("am", "", "", false, false, "", false, false, false, "Book"),
    FmtScenario("tm", "", "", true, true, "", false, false, true, "GovernmentDocument|Thesis|ConferenceProceeding|Book"),
    FmtScenario("zz", "", "", false, false, "", false, false, false, "Unknown"),
    // Conference-proceeding serial: the Serial default is gated off
    // (FormatCalculator.php:355) — only the additive label remains.
    FmtScenario("as", "", "", false, false, "", false, false, true, "ConferenceProceeding"),
    FmtScenario("as", "", "", false, false, "", false, false, false, "Serial"),
    // Journal beats the conference gate (008/21 'p' returns before it).
    FmtScenario("as", "", " " * 21 + "p", false, false, "", false, false, true, "ConferenceProceeding|Journal"),
    // computer-file document: Electronic (leader m) + eBook.
    FmtScenario("mm", "", " " * 26 + "d", false, false, "", false, false, false, "Electronic|eBook")
  )

  val all: Seq[Q] = Seq(
    Q(
      "marc_format_extended",
      (s, d) => {
        val k = col("p_partkey")
        val n = extScenarios.size
        val idx = (k % n + 1).cast("int")
        def pick(f: FmtScenario => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          element_at(array(extScenarios.map(f): _*), idx)
        val leader = concat(lit("cccccc"), pick(x => lit(x.ldr)))
        val formats = marcFormats(
          leader,
          pick(x => lit(x.f007)),
          pick(x => lit(x.f008)),
          hasSerialHost = lit(false),
          hasSuDoc = pick(x => lit(x.suDoc)),
          hasDissertation = pick(x => lit(x.thesis)),
          sub245h = pick(x => lit(x.h245)),
          online338 = pick(x => lit(x.online338)),
          video336 = pick(x => lit(x.video336)),
          hasMeetingEntry = pick(x => lit(x.meeting))
        )
        Tables
          .part(s, d)
          .select(k.as("p_partkey"), array_join(formats, "|").as("formats"))
      },
      Some {
        val n = extScenarios.size
        val expected = extScenarios.map(x => s"'${x.expected}'").mkString("[", ", ", "]")
        s"""SELECT p_partkey,
           |  ($expected)[cast(p_partkey % $n + 1 as int)] AS formats
           |FROM part""".stripMargin
      }
    ),
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
