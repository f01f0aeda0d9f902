package graft

import org.apache.spark.sql.functions._

import graft.expressions.CharBigramCodes

/** The native bigram-code kernel must equal the declarative
  * split/ascii lowering code for code point — including surrogate
  * pairs, combining marks and the empty/1-char degenerate rows — and
  * its long keys must rank exactly like the bigram strings. */
class CharBigramCodesSpec extends SparkSessionSpec {
  import spark.implicits._

  private val MaxCp = CharBigramCodes.MaxCp

  test("equals the declarative split+ascii form on adversarial unicode") {
    val texts = Seq(
      "hello world", "a", "", "ab", "éé", "日本語テキスト",
      "😀😀a😀", "éclair", // combining acute: two code points
      "mix 中 é 😀 end", "😀😁", // supplementary run
      "tab\tand\nnewline")
    val df = texts.toDF("text")
    val declarative = df
      .withColumn("chars", split(col("text"), ""))
      .where(size(col("chars")) >= 2)
      .withColumn("cp", transform(col("chars"), c => ascii(c)))
      .select(col("text"),
        transform(sequence(lit(1), size(col("cp")) - 1),
          i => element_at(col("cp"), i).cast("long") * MaxCp +
            element_at(col("cp"), i + 1)).as("codes"))
      .as[(String, Seq[Long])].collect().toMap
    val native = df
      .select(col("text"), CharBigramCodes(col("text")).as("codes"))
      .as[(String, Seq[Long])].collect().toMap
    // the declarative form drops <2-char rows; the native kernel
    // returns an empty array for them (explode-equivalent)
    texts.foreach { t =>
      assert(native(t) == declarative.getOrElse(t, Seq.empty[Long]),
        s"mismatch for ${t.take(20)}")
    }
  }

  test("code order is bigram-string order (rank ties are identical)") {
    val bgs = Seq("aa", "ab", "aé", "é!", "😀a", "zz")
    val byCode = bgs.toDF("bg")
      .select(col("bg"), element_at(CharBigramCodes(col("bg")), 1).as("code"))
      .orderBy(col("code")).as[(String, Long)].collect().map(_._1).toSeq
    assert(byCode == bgs.sorted,
      s"code order diverged from string order: $byCode vs ${bgs.sorted}")
  }

  test("winner reconstruction is lossless for non-ASCII code points") {
    val out = Seq("日本", "😀x", "ab").toDF("bg")
      .select(col("bg"),
        element_at(CharBigramCodes(col("bg")), 1).as("code"))
      .select(col("bg"), format_string("%c%c",
        expr(s"CAST(code DIV $MaxCp AS INT)"),
        pmod(col("code"), lit(MaxCp)).cast("int")).as("back"))
      .as[(String, String)].collect()
    out.foreach { case (bg, back) => assert(bg == back, s"$bg != $back") }
  }
}
