package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word-bigram hashing (guide §4). The declarative pipeline —
  * split -> slice x2 -> zip_with(concat) -> posexplode -> per-gram
  * concat+substring+ascii hash — pays an interpreted CodegenFallback
  * lambda per gram (zip_with), allocates every gram string, and re-scans
  * it four times for the hash; the distinct() that follows in gramHashes
  * is a full shuffle even though every duplicate (doc_id, h) pair is
  * WITHIN one document. This kernel computes the identical hash values in
  * one pass over the text bytes and (optionally) dedups in-row.
  *
  * Exact-equivalence contract (pinned by TextHashSpec against the old
  * expression pipeline, including unicode/multi-space edges):
  *  - words = Java-regex split on " " with limit -1 (empty segments kept,
  *    trailing empties kept). A 0x20 byte never occurs inside a UTF-8
  *    multi-byte sequence, so byte-level splitting is identical.
  *  - gram_i = words(i) + " " + words(i+1);
  *    hash = ((a1*31 + a2)*31 + a3)*31 + a4*127 + numChars(gram), where
  *    a_k = Spark `ascii(substring(gram + "####", k, 1))` = the full CODE
  *    POINT of the k-th character (astral planes included).
  */
object TextHashOps {
  /** non-overlapping occurrence count of " word " in " text ", times the
    * pattern's code-point length, divided by the pattern's UTF-16 length —
    * value-identical to the (length-diff / literal-length) formula. */
  def wordOccurrences(s: UTF8String, word: String): Double = {
    val padded = " " + s.toString + " "
    val pat = " " + word + " "
    var cnt = 0
    var i = padded.indexOf(pat)
    while (i >= 0) { cnt += 1; i = padded.indexOf(pat, i + pat.length) }
    val numChars = pat.codePointCount(0, pat.length)
    (cnt.toLong * numChars).toDouble / pat.length
  }

  def bigramHashes(s: UTF8String, distinct: Boolean): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var spaces = 0
    var i = 0
    while (i < n) { if (b(i) == 0x20) spaces += 1; i += 1 }
    val nw = spaces + 1
    if (nw < 2) return new GenericArrayData(Array.emptyLongArray)
    // word byte ranges
    val starts = new Array[Int](nw)
    val ends = new Array[Int](nw)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (b(i) == 0x20) { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = n
    // per word: char (code point) count + first-4 chars' CODE POINTS
    // (Spark's ascii() returns the full code point of the first character,
    // astral planes included — verified against the legacy expression)
    val cc = new Array[Int](nw)
    val f4 = new Array[Int](nw * 4)
    w = 0
    while (w < nw) {
      var c = 0
      var p = starts(w)
      val e = ends(w)
      while (p < e) {
        val x = b(p) & 0xFF
        if ((x & 0xC0) != 0x80) { // lead byte of a code point
          if (c < 4) {
            f4(w * 4 + c) =
              if (x < 0x80) x
              else if ((x & 0xE0) == 0xC0 && p + 1 < e)
                ((x & 0x1F) << 6) | (b(p + 1) & 0x3F)
              else if ((x & 0xF0) == 0xE0 && p + 2 < e)
                ((x & 0x0F) << 12) | ((b(p + 1) & 0x3F) << 6) | (b(p + 2) & 0x3F)
              else if ((x & 0xF8) == 0xF0 && p + 3 < e)
                ((x & 0x07) << 18) | ((b(p + 1) & 0x3F) << 12) |
                  ((b(p + 2) & 0x3F) << 6) | (b(p + 3) & 0x3F)
              else x // malformed tail: lead byte value (valid UTF-8 never hits this)
          }
          c += 1
        }
        p += 1
      }
      cc(w) = c
      w += 1
    }
    val out = new Array[Long](nw - 1)
    var gi = 0
    while (gi < nw - 1) {
      val cu = cc(gi)
      val cv = cc(gi + 1)
      // k-th char of word_i + " " + word_{i+1} + "####"
      def at(k: Int): Long =
        if (k < cu) f4(gi * 4 + k).toLong
        else if (k == cu) 32L
        else if (k - cu - 1 < cv) f4((gi + 1) * 4 + (k - cu - 1)).toLong
        else 35L
      out(gi) = ((at(0) * 31 + at(1)) * 31 + at(2)) * 31 + at(3) * 127 +
        (cu + 1 + cv)
      gi += 1
    }
    if (!distinct) return new GenericArrayData(out)
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    val ded = new Array[Long](out.length)
    var m = 0
    gi = 0
    while (gi < out.length) {
      if (seen.add(out(gi))) { ded(m) = out(gi); m += 1 }
      gi += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ded, m))
  }
}

/** word_occurrences(text, word) -> double: the wordCount formula
  * ((length(padded) - length(replace-all(padded, " word ", ""))) /
  * literal-utf16-length) evaluated as one literal scan instead of a regex
  * engine pass per (row, marker word) — q_lang_id ran 12 regexp_replace
  * passes per document. Non-overlapping left-to-right match semantics
  * (continue after the match end) are exactly Java replaceAll's for a
  * quoted literal; the returned double is count * numChars(pattern) /
  * pattern.length — the same two ints the old expression divided. */
case class WordOccurrences(child: Expression, word: String) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_occurrences"
  override protected def nullSafeEval(s: Any): Any =
    TextHashOps.wordOccurrences(s.asInstanceOf[UTF8String], word)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("word", word, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashOps.wordOccurrences($c, $w)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bigram_hashes(text) -> array<long> of word-bigram gram hashes, in text
  * order; `distinct = true` keeps the first occurrence of each hash (the
  * in-row equivalent of the global (doc_id, h) distinct, since duplicate
  * pairs only ever arise within one document). */
case class BigramHashes(child: Expression, distinct: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bigram_hashes"
  override protected def nullSafeEval(s: Any): Any =
    TextHashOps.bigramHashes(s.asInstanceOf[UTF8String], distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashOps.bigramHashes($c, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
