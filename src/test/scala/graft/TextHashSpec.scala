package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Pins the codegen'd BigramHashes kernel to the declarative expression
  * pipeline it replaced (wordBigrams + gramHash [+ distinct]): the two
  * must be value-identical on every input, including the edges the byte-
  * level splitter has to get right — multi-byte UTF-8 (2/3/4-byte code
  * points), consecutive/leading/trailing spaces (Java regex split with
  * limit -1 keeps empty segments), short words spilling into the '####'
  * padding, and null/empty/one-word texts that produce no grams. */
class TextHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixtures: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a b c d",                       // 1-char words: padding kicks in
    3L -> "ab cd ef",                      // 2-char words
    4L -> "single",                        // one word -> no grams
    5L -> "",                              // empty -> one empty word -> no grams
    6L -> " leading and  double  spaces ", // empty segments kept
    7L -> "Übergang größe straße",         // 2-byte UTF-8 lead bytes
    8L -> "東京 大阪 京都",                  // 3-byte UTF-8
    9L -> "mix 東a b京 ü#",                 // mixed widths inside words
    10L -> "😀 emoji 🚀 rocket", // 4-byte UTF-8
    11L -> "the the the the",              // duplicate grams (distinct path)
    12L -> "tab\tseparated stays one-word group", // no space in \t
    13L -> "x",
    14L -> "  ",                           // only spaces -> 3 empty words
    15L -> null
  )

  private lazy val docs = fixtures.toDF("doc_id", "text")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("bigramHashes(distinct=false) == wordBigrams + gramHash, gram for gram") {
    val legacy = TextOps.wordBigrams(docs, "doc_id", "text")
      .select($"doc_id", $"pos".cast("int").as("pos"),
        TextOps.gramHash($"gram").as("h"))
    val kernel = docs.select($"doc_id",
        posexplode(TextOps.bigramHashes($"text", distinct = false)).as(Seq("pos", "h")))
    assert(canon(kernel) == canon(legacy))
  }

  test("wordCount kernel == legacy regexp_replace length-diff formula") {
    def legacyWordCount(text: org.apache.spark.sql.Column, word: String) = {
      val w = s" $word "
      val padded = concat(lit(" "), text, lit(" "))
      (length(padded) - length(regexp_replace(padded,
        java.util.regex.Pattern.quote(w), ""))) / lit(w.length)
    }
    val words = Seq("the", "a", "and", "東京", "ü#", "emoji")
    val legacy = docs.select($"doc_id" +: words.map(w =>
      legacyWordCount($"text", w).as(s"c_$w")): _*)
    val kernel = docs.select($"doc_id" +: words.map(w =>
      TextOps.wordCount($"text", w).as(s"c_$w")): _*)
    assert(canon(kernel) == canon(legacy))
  }

  test("bigramHashes(distinct=true) == legacy distinct gram-hash set") {
    val legacy = TextOps.wordBigrams(docs, "doc_id", "text")
      .select($"doc_id", TextOps.gramHash($"gram").as("h")).distinct()
    val kernel = docs.select($"doc_id",
        explode(TextOps.bigramHashes($"text", distinct = true)).as("h"))
    assert(canon(kernel) == canon(legacy))
  }
}
