package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MARC format detection from leader / 007 / 008.
  *
  * Spark-native re-expression of the decision tree in the reference's
  * format calculator (reference: src/RecordManager/Base/Record/Marc/
  * FormatCalculator.php:62 getFormats / :560 getFormatsAsList): the 007
  * carrier switch, the leader/06 record-type switch, the leader/07
  * bibliographic-level switch (with the could-be-book gate and the
  * conference gate on the Serial default, :355), and the last-resort
  * fallbacks, evaluated in the reference's precedence order. The additive
  * labels (GovernmentDocument/Thesis/Electronic/ConferenceProceeding) and
  * the 33x path live in [[marcFormats]]; [[marcPrimaryFormat]] returns
  * the first hit only. One shared tree serves both — the two paths in
  * the reference differ only in the 33x skip and the thesis gate, which
  * arrive here as optional columns.
  */
object MarcFormat {

  /** FormatCalculator.php:146 getFormatFrom007, every branch except `v`
    * (the video detail differs between the primary-format and full-list
    * paths).
    */
  private def format007NonVideo(c1: Column, c2: Column): Column =
    when(c1 === "a", when(c2 === "d", "Atlas").otherwise("Map"))
      .when(
        c1 === "c",
        when(c2 === "a", "TapeCartridge")
          .when(c2 === "b", "ChipCartridge")
          .when(c2 === "c", "DiscCartridge")
          .when(c2 === "f", "TapeCassette")
          .when(c2 === "h", "TapeReel")
          .when(c2 === "j", "FloppyDisk")
          .when(c2.isin("m", "o"), "CDROM")
          .when(c2 === "r", "")
          .otherwise("ElectronicResource")
      )
      .when(c1 === "d", lit("Globe"))
      .when(c1 === "f", lit("Braille"))
      .when(
        c1 === "g",
        when(c2.isin("c", "d", "f", "o"), "Filmstrip")
          .when(c2 === "t", "Transparency")
          .otherwise("Slide")
      )
      .when(c1 === "h", lit("Microfilm"))
      .when(
        c1 === "k",
        when(c2 === "c", "Collage")
          .when(c2.isin("d", "l"), "Drawing")
          .when(c2 === "e", "Painting")
          .when(c2.isin("f", "j", "s"), "Print")
          .when(c2 === "g", "Photonegative")
          .when(c2 === "k", "Poster")
          .when(c2 === "n", "Chart")
          .when(c2 === "o", "FlashCard")
          .when(c2 === "p", "Postcard")
          .otherwise("Photo")
      )
      .when(
        c1 === "m",
        when(c2 === "f", "VideoCassette")
          .when(c2 === "r", "Filmstrip")
          .otherwise("MotionPicture")
      )
      .when(c1 === "o", lit("Kit"))
      .when(c1 === "q", lit("MusicalScore"))
      .when(c1 === "r", lit("SensorImage"))
      .when(
        c1 === "s",
        when(c2 === "d", "SoundDisc")
          .when(c2 === "s", "SoundCassette")
          .otherwise("SoundRecording")
      )
      .otherwise(lit(""))

  /** :374 getFormatFromRecordType; `skip33x` blanks the whole switch when
    * a 33x field already decided (:782), `thesisGate` suppresses the
    * leader-t Manuscript for dissertations (:498).
    */
  private def recordTypeFormat(
      rt: Column,
      c1: Column,
      v008: Int => Column,
      skip33x: Column,
      thesisGate: Column
  ): Column =
    when(skip33x, lit(""))
      .when(rt.isin("c", "d"), lit("MusicalScore"))
      .when(
        rt.isin("e", "f"),
        when(v008(25) === "d", "Globe")
          .when(v008(25) === "e", "Atlas")
          .otherwise("Map")
      )
      .when(
        rt === "g",
        when(v008(33) === "f", "Filmstrip")
          .when(v008(33) === "t", "Transparency")
          .when(v008(33) === "m", "MotionPicture")
          .when(v008(33) === "v", "Video")
          // 008/34 technique set -> video rather than slide
          .when(v008(34).isin("a", "c", "l", "u", "z"), "Video")
          .otherwise(when(c1.isin("g", "m", "v"), "").otherwise("ProjectedMedium"))
      )
      .when(rt === "i", lit("SoundRecording"))
      .when(rt === "j", lit("MusicRecording"))
      .when(
        rt === "k",
        when(v008(33) === "l", "Drawing")
          .when(v008(33) === "n", "Chart")
          .when(v008(33) === "o", "FlashCard")
          .otherwise(when(c1 === "k", "").otherwise("Image"))
      )
      .when(
        rt === "m",
        when(v008(26) === "a", "DataSet")
          .when(v008(26) === "b", "Software")
          .when(v008(26) === "c", "Image")
          .when(v008(26) === "e", "DataSet")
          .when(v008(26) === "f", "Font")
          .when(v008(26) === "g", "VideoGame")
          .when(v008(26) === "h", "SoundRecording")
          .when(v008(26) === "i", "InteractiveMultimedia")
          .otherwise("")
      )
      .when(rt.isin("o", "p"), lit("Kit"))
      .when(rt === "r", lit("PhysicalObject"))
      .when(rt === "t", when(thesisGate, lit("")).otherwise(lit("Manuscript")))
      .otherwise(lit(""))

  /** :272 getFormatFromBibLevel. The Serial default is gated on the
    * conference check (:355): a conference-proceeding serial yields ''
    * here (the additive label carries it), Newspaper/Journal still win.
    */
  private def bibLevelFormat(
      bl: Column,
      rt: Column,
      v008: Int => Column,
      hasSerialHost: Column,
      couldBeBook: Column,
      meeting: Column
  ): Column =
    when(bl === "a", when(hasSerialHost, "Article").otherwise("BookComponentPart"))
      .when(bl === "b", lit("SerialComponentPart"))
      .when(
        bl === "i",
        when(rt === "a" && v008(21).isin("h", "w"), "Website")
          .when(rt === "a" && v008(22).isin("o", "q", "s"), "OnlineIntegratingResource")
          .otherwise("PhysicalIntegratingResource")
      )
      .when(
        bl === "m" && couldBeBook,
        when(rt.isin("a", "t") && v008(23).isin("o", "q", "s"), "eBook")
          .when(rt === "m", "eBook")
          .otherwise("Book")
      )
      .when(
        bl === "s",
        when(rt === "a" && v008(21) === "n", "Newspaper")
          .when(rt === "a" && v008(21) === "p", "Journal")
          .otherwise(when(meeting, lit("")).otherwise(lit("Serial")))
      )
      .otherwise(lit(""))

  /** Last resort (:612): Collection/Sub-unit -> Kit, Language material ->
    * Text, else Unknown.
    */
  private def fallbackFormat(rt: Column, bl: Column): Column =
    when(bl.isin("c", "d"), "Kit")
      .when(rt === "a", "Text")
      .otherwise("Unknown")

  /** Primary format for a record given its leader, first 007 field, 008
    * field, whether a 773$g serial host exists, and whether a 111/711
    * meeting entry exists (gates the Serial default, :355).
    */
  def marcPrimaryFormat(
      leader: Column,
      f007: Column,
      f008: Column,
      hasSerialHost: Column,
      hasMeetingEntry: Column = lit(false)
  ): Column = {
    // Null-safe: a record without 007/008 is the common case, and a null
    // would otherwise poison couldBeBook through three-valued logic.
    val ldr = coalesce(leader, lit(""))
    val f7 = coalesce(f007, lit(""))
    val f8 = coalesce(f008, lit(""))
    val host = coalesce(hasSerialHost, lit(false))
    val meeting = coalesce(hasMeetingEntry, lit(false))
    val rt = lower(substring(ldr, 7, 1))
    val bl = lower(substring(ldr, 8, 1))
    val c1 = lower(substring(f7, 1, 1))
    val c2 = lower(substring(f7, 2, 1))
    // PHP get008Value($marc008, p) is 0-based substr -> position p+1 here.
    def v008(p: Int) = lower(substring(f8, p + 1, 1))

    // All 007/v content surfaces as Video first (getFormatsAsList
    // appends 'Video' before the detailed type, so the PRIMARY format
    // for any video record is 'Video').
    val fmt007 = when(c1 === "v", lit("Video")).otherwise(format007NonVideo(c1, c2))

    // :105 definitelyNotBookBasedOn007 + :117 ...BasedOnRecordType.
    val notBook007 = c1.isin("g", "k", "m", "v")
    val notBookRt = rt.isin("e", "f", "g", "i", "j", "k", "r") ||
      (rt === "m" && !v008(26).isin("d", "i", "m", "u", "z"))
    val couldBeBook = !(notBook007 || notBookRt)

    val fmtRt = recordTypeFormat(rt, c1, v008, skip33x = lit(false), thesisGate = lit(false))
    val fmtBl = bibLevelFormat(bl, rt, v008, host, couldBeBook, meeting)

    when(fmt007 =!= "", fmt007)
      .when(fmtRt =!= "", fmtRt)
      .when(fmtBl =!= "", fmtBl)
      .otherwise(fallbackFormat(rt, bl))
  }

  /** RDA 338 carrier says online (FormatCalculator.php:658): `$a` "online
    * resource" or `$b` "cr", sourced from rdacarrier. Null-safe: absent
    * 338 subfields mean false, not SQL null.
    */
  def isOnline338(f338a: Column, f338b: Column, f3382: Column): Column =
    (coalesce(f338a, lit("")) === "online resource" ||
      coalesce(f338b, lit("")) === "cr") && coalesce(f3382, lit("")) === "rdacarrier"

  /** RDA 336 content type says video (FormatCalculator.php:690): `$a`
    * "two-dimensional moving image" or `$b` "tdi", sourced from
    * rdacontent. Null-safe like [[isOnline338]].
    */
  def isVideo336(f336a: Column, f336b: Column, f3362: Column): Column =
    (coalesce(f336a, lit("")) === "two-dimensional moving image" ||
      coalesce(f336b, lit("")) === "tdi") && coalesce(f3362, lit("")) === "rdacontent"

  /** Full deduplicated format list (FormatCalculator.php:62 getFormats /
    * :721 getFormatsAsList) including the additive labels: SuDoc 086 →
    * GovernmentDocument, dissertation 502 → Thesis, 245$h/[electronic
    * resource] | leader-m | online-338 → Electronic, 111/711 meeting →
    * ConferenceProceeding, 336-tdi → Video (+ VideoOnline when the 338
    * carrier is online), then the 007 / record-type / bib-level decision
    * tree — with record-type skipped when 33x matched, the thesis gate on
    * leader-t Manuscript, and the could-be-book veto extended by 33x.
    * The last-resort fallback applies only when NOTHING (additive labels
    * included) matched.
    */
  def marcFormats(
      leader: Column,
      f007: Column,
      f008: Column,
      hasSerialHost: Column,
      hasSuDoc: Column,
      hasDissertation: Column,
      sub245h: Column,
      online338: Column,
      video336: Column,
      hasMeetingEntry: Column
  ): Column = {
    val ldr = coalesce(leader, lit(""))
    val f7 = lower(coalesce(f007, lit("")))
    val f8 = coalesce(f008, lit(""))
    // Boolean flags come from field-existence checks that may carry SQL
    // null (e.g. isVideo336 over absent subfield columns before it was
    // null-safe): coalesce them all so three-valued logic can't silently
    // drop a branch.
    val host = coalesce(hasSerialHost, lit(false))
    val suDoc = coalesce(hasSuDoc, lit(false))
    val thesis = coalesce(hasDissertation, lit(false))
    val online = coalesce(online338, lit(false))
    val video = coalesce(video336, lit(false))
    val meeting = coalesce(hasMeetingEntry, lit(false))
    val rt = lower(substring(ldr, 7, 1))
    val bl = lower(substring(ldr, 8, 1))
    val c1 = substring(f7, 1, 1)
    val c2 = substring(f7, 2, 1)
    val c5 = substring(f7, 5, 1)
    def v008(p: Int) = lower(substring(f8, p + 1, 1))
    val e = lit("")

    val electronic = lower(coalesce(sub245h, lit(""))).contains("[electronic resource]") ||
      rt === "m" || online
    val additive = Seq(
      when(suDoc, lit("GovernmentDocument")).otherwise(e),
      when(thesis, lit("Thesis")).otherwise(e),
      when(electronic, lit("Electronic")).otherwise(e),
      when(meeting, lit("ConferenceProceeding")).otherwise(e)
    )
    val f33x = Seq(
      when(video, lit("Video")).otherwise(e),
      when(video && online, lit("VideoOnline")).otherwise(e)
    )

    // 007: video contributes the Video flag AND the detailed type.
    val vDetail = when(c2 === "c", lit("VideoCartridge"))
      .when(c2 === "d", when(c5 === "s", "BRDisc").otherwise("VideoDisc"))
      .when(c2 === "f", lit("VideoCassette"))
      .when(c2 === "r", lit("VideoReel"))
      .otherwise(lit("VideoOnline")) // assume other video is online
    val f007list = Seq(
      when(c1 === "v", lit("Video")).otherwise(e),
      when(c1 === "v", vDetail).otherwise(format007NonVideo(c1, c2))
    )

    val notBook007 = c1.isin("g", "k", "m", "v")
    val notBookRt = rt.isin("e", "f", "g", "i", "j", "k", "r") ||
      (rt === "m" && !v008(26).isin("d", "i", "m", "u", "z"))
    val couldBeBook = !(notBook007 || notBookRt || video)

    val fmtRt = recordTypeFormat(rt, c1, v008, skip33x = video, thesisGate = thesis)
    val fmtBl = bibLevelFormat(bl, rt, v008, host, couldBeBook, meeting)

    val listed = filter(
      array(additive ++ f33x ++ f007list ++ Seq(fmtRt, fmtBl): _*),
      x => x =!= ""
    )
    when(size(listed) === 0, array(fallbackFormat(rt, bl))).otherwise(array_distinct(listed))
  }
}
