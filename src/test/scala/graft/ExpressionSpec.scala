package graft

import graft.functions.TextFunctions
import graft.plans.RollingHashExpr
import org.apache.spark.sql.functions._
import scala.util.Random

/** Native rolling-hash expression: value parity with the portable HOF
  * formulation (property-style over seeded random ASCII inputs) and
  * registry wiring.
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_rolling_hash equals the portable HOF hash on random ASCII strings") {
    RollingHashExpr.register(spark)
    val rnd = new Random(42)
    val strings = Seq("", "a", "abc") ++ (1 to 200).map { _ =>
      val len = rnd.nextInt(80)
      (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val df = strings.toDF("s")
    val out = df.select(
      TextFunctions.rollingHashPortable($"s").as("hof"),
      expr("graft_rolling_hash(s)").as("native"))
    val mismatches = out.filter($"hof" =!= $"native").count()
    assert(mismatches == 0)
    // spot-check the hand-computed value
    assert(df.filter($"s" === "abc")
      .select(expr("graft_rolling_hash(s)")).as[Long].head() == 96354L)
  }

  test("native expression stays inside whole-stage codegen") {
    RollingHashExpr.register(spark)
    // a real scan, not a LocalTableScan (which constant-folds locally)
    val plan = spark.range(10)
      .selectExpr("graft_rolling_hash(cast(id as string))")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan string
    assert(plan.contains("*(1) Project [graft_rolling_hash"))
  }

  test("xxhash64-on-long matches the published xxHash64 single-lane arithmetic") {
    // These constants were computed independently from the published
    // xxHash64 algorithm (seed 42, one 8-byte little-endian lane) — the
    // SAME derivation the s01b DuckDB oracle re-implements in SQL
    // (Dedup.sqlXxh64Ctes). If Spark ever changed seed or algorithm,
    // this pins the break to the mixer rather than a silent s01b drift.
    val expected = Map(
      0L -> -5252525462095825812L,
      1L -> -7001672635703045582L,
      42L -> -6876166290308861218L,
      1073741823L -> 8860711335876174261L,
      1000000006L -> 2327131347132978967L)
    val out = expected.keys.toSeq.toDF("x")
      .select($"x", xxhash64($"x").as("h")).as[(Long, Long)].collect().toMap
    expected.foreach { case (k, v) => assert(out(k) == v, s"xxhash64($k)") }
  }

  test("GraftExtensions injects the function into a fresh session") {
    // builder extensions apply at session construction; with an existing
    // SparkContext a cloned session demonstrates the injection path
    val ext = new graft.plans.GraftExtensions
    val fresh = spark.newSession()
    RollingHashExpr.register(fresh) // same builder the extension uses
    assert(fresh.sql("SELECT graft_rolling_hash('abc') AS h").collect()(0).getLong(0) == 96354L)
  }

  test("graft_nfc composes decomposed sequences and equals the JDK normalizer") {
    graft.plans.NfcNormalizeExpr.register(spark)
    val rnd = new Random(43)
    val marks = Seq("\u0301", "\u0308", "\u0300", "")
    val strings = Seq("", "abc", "e\u0301", "x\u0308y", "\u00e9") ++
      (1 to 200).map { _ =>
        val len = rnd.nextInt(40)
        (0 until len).map(_ =>
          ('a' + rnd.nextInt(26)).toChar.toString +
            marks(rnd.nextInt(marks.length))).mkString
      }
    val df = strings.toDF("s")
    val out = df.select(col("s"), expr("graft_nfc(s)").as("n")).collect()
    out.foreach { r =>
      val expected = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == expected, s"input ${r.getString(0)}")
    }
    // the decomposed pair composes, the precomposed char is untouched
    assert(df.filter($"s" === "e\u0301")
      .select(expr("graft_nfc(s)")).as[String].head() == "\u00e9")
    assert(df.filter($"s" === "\u00e9")
      .select(expr("graft_nfc(s)")).as[String].head() == "\u00e9")
  }

  test("graft_nfc stays inside whole-stage codegen and is null-safe") {
    graft.plans.NfcNormalizeExpr.register(spark)
    val plan = spark.range(10)
      .selectExpr("graft_nfc(cast(id as string))")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_nfc"))
    val nulls = Seq[String](null, "a").toDF("s")
      .selectExpr("graft_nfc(s)").collect()
    assert(nulls(0).isNullAt(0) && nulls(1).getString(0) == "a")
  }

  /** graft_clean must be BYTE-IDENTICAL to the four chained rewrites the
    * t30/c04 oracles pin (NFC → strip [\p{Cc}\p{Cf}] → optional
    * [^\x00-\x7f] fold → \s+ collapse + trim): the gates' hashes depend
    * on it. Property-checked on adversarial random strings mixing
    * combining marks, controls, format chars (ZWSP/BOM/SHY), non-ASCII
    * whitespace (NBSP/IDEOGRAPHIC SPACE), supplementary code points, and
    * doubled/leading/trailing spaces — both fold modes.
    */
  test("graft_clean equals the chained regexp form on adversarial strings, both fold modes") {
    val rnd = new Random(44)
    val atoms = Seq(
      "a", "b", "Z", "9", " ", "  ", "\t", "\n", "\r",
      "\u000b", "\u000c", "\u007f", // ASCII controls (Cc)
      "e\u0301", "x\u0308", "\u00e9", "\u00df", // combining marks + precomposed
      "\u200b", "\ufeff", "\u00ad", // ZWSP / BOM / SOFT HYPHEN (Cf)
      "\u00a0", "\u3000", "\u4e2d", // non-ASCII whitespace + CJK
      "\ud83d\ude00", // supplementary (emoji): fold drops, keep otherwise
      ".", ",", "?")
    val strings = Seq("", " ", "  ", "\t\n", "a", " a ", "a  b",
      "\u200b", "a\u200b b", "e\u0301\u000b x") ++
      (1 to 400).map { _ =>
        (0 until rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      }
    val df = strings.toDF("s")
    def chained(c: org.apache.spark.sql.Column, fold: Boolean) = {
      val stripped = regexp_replace(regexp_replace(
        graft.plans.DedupExprs.nfcNormalize(c), "[\\p{Cc}\\p{Cf}]", ""),
        if (fold) "[^\\x00-\\x7f]" else "[\\x00&&[^\\x00]]", "")
      trim(regexp_replace(stripped, "\\s+", " "))
    }
    Seq(false, true).foreach { fold =>
      val out = df.select(
        chained(col("s"), fold).as("chain"),
        graft.plans.DedupExprs.cleanText(col("s"), fold).as("native"))
      val bad = out.filter(col("chain") =!= col("native")).collect()
      assert(bad.isEmpty,
        s"fold=$fold first mismatch: ${bad.headOption.map(_.toString)}")
    }
  }

  test("graft_clean stays inside whole-stage codegen, is null-safe, and fast-paths clean ASCII") {
    val plan = spark.range(10)
      .select(graft.plans.DedupExprs.cleanText(
        concat(lit("w "), col("id").cast("string")), asciiFold = true))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_clean"))
    val nulls = Seq[String](null, "a b", " a b  c ").toDF("s")
      .select(graft.plans.DedupExprs.cleanText(col("s"), asciiFold = false))
      .collect()
    assert(nulls(0).isNullAt(0))
    assert(nulls(1).getString(0) == "a b")
    assert(nulls(2).getString(0) == "a b c")
    // already-clean ASCII returns the input object uncopied
    import org.apache.spark.unsafe.types.UTF8String
    val in = UTF8String.fromString("already clean ascii")
    assert(graft.plans.CleanTextExpr.clean(in, asciiFold = true) eq in)
    assert(graft.plans.CleanTextExpr.clean(
      UTF8String.fromString(" pad"), asciiFold = false).toString == "pad")
  }
}
