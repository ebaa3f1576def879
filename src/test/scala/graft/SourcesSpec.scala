package graft

import graft.functions.MetadataFunctions
import graft.plans.NormalizeKeyExpr
import graft.sources.{Iso2709, MarcXml}
import graft.sources.Iso2709.Subfield
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SourcesSpec extends SparkSuite {

  private val gen = Gen.listOfN(
    3,
    for {
      tag <- Gen.oneOf("001", "100", "245", "260", "650")
      code <- Gen.oneOf("a", "b", "c")
      v <- Gen.alphaNumStr.map(_.take(30))
    } yield Subfield(tag, if (tag < "010") "" else code, v)
  )

  private def samples: Seq[List[Subfield]] =
    (1L to 40L).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i)))

  test("ISO2709 round trip is identity") {
    samples.foreach { fields =>
      val parsed = Iso2709.parse(Iso2709.build(fields))
      assert(parsed == fields, fields.toString)
    }
  }

  test("MARCXML round trip preserves control and data fields in order") {
    samples.foreach { fields =>
      val parsed = MarcXml.parse(MarcXml.build(fields))
      // MarcXml.parse returns control fields first, then data fields.
      val expected = fields.filter(_.tag < "010") ++ fields.filter(_.tag >= "010")
      assert(parsed == expected, fields.toString)
    }
  }

  test("ISO2709 parse of garbage is empty, not an exception") {
    assert(Iso2709.parse("") == Seq.empty)
    assert(Iso2709.parse("short") == Seq.empty)
    assert(Iso2709.parse("x" * 100) == Seq.empty)
  }

  test("native graft_normalize_key equals the composed-builtins version") {
    import spark.implicits._
    val strGen = Gen.asciiPrintableStr
    val inputs = (1L to 80L)
      .flatMap(i => strGen.apply(Gen.Parameters.default.withSize(24), Seed(i)))
    val df = inputs.toDF("x")
    val both = df.select(
      MetadataFunctions.normalizeKey(col("x")).as("composed"),
      expr("graft_normalize_key(x)").as("native")
    )
    both.collect().foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("optimizer rule fuses composed normalizeKey into the native kernel") {
    val df = Tables
      .part(spark, "/root/testdata/sf0.001")
      .select(MetadataFunctions.normalizeKey(col("p_name")).as("k"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_normalize_key"), optimized)
    // and the fused result matches the unoptimized semantics (checked
    // against the DuckDB oracle by norm_key as well)
    val sample = df.orderBy("k").limit(3).collect().map(_.getString(0)).toSeq
    assert(sample.forall(s => s == s.toLowerCase && !s.contains(" ")), sample)
  }

  test("native TitleKeyExpr equals the aggregate-fold createTitleKey") {
    import spark.implicits._
    // word-ish strings exercise the budget boundaries
    val wordGen = Gen.listOfN(12, Gen.alphaStr.map(_.take(6))).map(_.mkString(" "))
    val inputs = (1L to 60L)
      .flatMap(i => wordGen.apply(Gen.Parameters.default, Seed(i))) ++
      Seq("", "single", "the quick brown fox jumps over a lazy dog and keeps running")
    val df = inputs.toDF("x")
    val both = df.select(
      MetadataFunctions.createTitleKey(col("x")).as("fold"),
      org.apache.spark.sql.GraftColumn
        .of(graft.plans.TitleKeyExpr(org.apache.spark.sql.GraftColumn.exprOf(col("x"))))
        .as("native")
    )
    both.collect().foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("native expression stays inside whole-stage codegen") {
    // needs a real scan: LocalTableScan of literals never codegens
    val plan = Tables
      .part(spark, "/root/testdata/sf0.001")
      .select(expr("graft_normalize_key(p_name)"))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("*(1)"), plan)
  }

  test("MARC-in-JSON proper round trip preserves leader, indicators, subfields") {
    import graft.sources.MarcInJson
    val fields = Seq(
      MarcInJson.Field("001", "", "", "rec1", Nil),
      MarcInJson.Field("245", "1", "4", "", Seq("a" -> "Tïtle \"quoted\"", "b" -> "sub/b")),
      MarcInJson.Field("700", " ", "2", "", Seq("a" -> "Ana", "t" -> "Part"))
    )
    val leader = "00123nam a2200049   4500"
    val (pl, pf) = MarcInJson.parse(MarcInJson.build(leader, fields))
    assert(pl == leader)
    assert(pf == fields)
  }

  test("MARC-in-JSON legacy v1/v2/v3 parse to the same logical record") {
    import graft.sources.MarcInJson
    val v1 = "{\"000\":[\"L\"],\"001\":[\"c1\"],\"245\":[\"14\\u001faT\\u001fbS\"]}"
    val v2 =
      """{"v":2,"f":{"000":"L","001":["c1"],"245":[{"i1":"1","i2":"4","s":[{"c":"a","v":"T"},{"c":"b","v":"S"}]}]}}"""
    val v3 =
      """{"v":3,"f":{"000":["L"],"001":["c1"],"245":[{"i1":"1","i2":"4","s":[{"a":"T"},{"b":"S"}]}]}}"""
    val expected = (
      "L",
      Seq(
        MarcInJson.Field("001", "", "", "c1", Nil),
        MarcInJson.Field("245", "1", "4", "", Seq("a" -> "T", "b" -> "S"))
      )
    )
    assert(MarcInJson.parse(v1) == expected)
    assert(MarcInJson.parse(v2) == expected)
    assert(MarcInJson.parse(v3) == expected)
  }

  test("MARC-in-JSON malformed input quarantines as empty") {
    import graft.sources.MarcInJson
    assert(MarcInJson.parse("not json") == ("", Seq.empty))
    assert(MarcInJson.parse("""{"v":9,"f":{}}""") == ("", Seq.empty))
  }

  test("MARC-in-JSON degraded inputs parse gracefully, not quarantine") {
    import graft.sources.MarcInJson
    // v1 field shorter than indicators+delimiter: keep the record.
    val (l1, f1) = MarcInJson.parse("{\"000\":[\"L\"],\"245\":[\"1\\u001f\"],\"001\":[\"c1\"]}")
    assert(l1 == "L" && f1.exists(f => f.tag == "001" && f.value == "c1"))
    // JSON nulls become ''/' ', never the string "null".
    val (_, f2) = MarcInJson.parse(
      """{"leader":"L","fields":[{"245":{"ind1":null,"ind2":null,"subfields":[{"a":null}]}}]}"""
    )
    assert(f2 == Seq(MarcInJson.Field("245", " ", " ", "", Seq("a" -> ""))))
    // A proper record missing its leader must not hit the v1 parser.
    val (l3, f3) = MarcInJson.parse("""{"fields":[{"001":"c1"}]}""")
    assert(l3 == "" && f3 == Seq(MarcInJson.Field("001", "", "", "c1", Nil)))
  }

  test("MARC-in-JSON round-trips a value-carrying field with a data tag") {
    import graft.sources.MarcInJson
    val (l, f) = MarcInJson.parse("""{"leader":"L","fields":[{"300":"ill. map"}]}""")
    assert(f == Seq(MarcInJson.Field("300", "", "", "ill. map", Nil)))
    assert(MarcInJson.parse(MarcInJson.build(l, f)) == ((l, f)))
  }

  test("MARCXML round trip survives XML metacharacters and unicode in values") {
    // The escaping path (& < > " ') is what the alphanumeric generator
    // never reaches; property-generate hostile values explicitly.
    val hostile = Gen.listOfN(
      4,
      for {
        tag <- Gen.oneOf("001", "245", "650")
        code <- Gen.oneOf("a", "b")
        v <- Gen.listOfN(12, Gen.oneOf(Gen.oneOf('&', '<', '>', '"', '\''),
          Gen.alphaNumChar, Gen.oneOf('ä', 'ö', 'é', '中'))).map(_.mkString)
      } yield Subfield(tag, if (tag < "010") "" else code, v)
    )
    (1L to 30L).flatMap(i => hostile.apply(Gen.Parameters.default, Seed(i))).foreach { fields =>
      val parsed = MarcXml.parse(MarcXml.build(fields))
      val expected = fields.filter(_.tag < "010") ++ fields.filter(_.tag >= "010")
      assert(parsed == expected, fields.toString)
    }
  }

  test("BPE encodeWord is lossless for arbitrary words (property)") {
    import spark.implicits._
    val wordGen = Gen.listOfN(14, Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf('ä', 'ö', '-'))).map(_.mkString)
    val words = (1L to 150L).flatMap(i => wordGen.apply(Gen.Parameters.default, Seed(i)))
    val bad = words
      .toDF("w")
      .select(col("w"), array_join(graft.operators.Bpe.encodeWord(col("w")), "").as("glued"))
      .collect()
      .filter(r => r.getString(0) != r.getString(1))
    assert(bad.isEmpty, bad.take(5).mkString(","))
  }

  test("normalizeKey is idempotent (property)") {
    import spark.implicits._
    import graft.functions.MetadataFunctions.normalizeKey
    val strGen = Gen.asciiPrintableStr
    val inputs = (1L to 120L)
      .flatMap(i => strGen.apply(Gen.Parameters.default.withSize(24), Seed(i)))
    val bad = inputs
      .toDF("x")
      .select(normalizeKey(col("x")).as("k1"), normalizeKey(normalizeKey(col("x"))).as("k2"))
      .collect()
      .filter(r => r.getString(0) != r.getString(1))
    assert(bad.isEmpty, bad.take(5).mkString(","))
  }
}
