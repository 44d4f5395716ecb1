package graft.functions

/** String normalization + similarity classifiers — the reference's
  * statsimi family (/root/reference/src/pfaedle/statsimi-classifier/
  * StatsimiClassifier.cpp) and trgraph::Normalizer
  * (/root/reference/src/pfaedle/trgraph/Normalizer.cpp:40-58). Pure Scala;
  * exposed to Spark as UDFs by StationMatcher. */
object StringSim {

  /** Ordered regex-replace chain + lowercase (Normalizer semantics: rules
    * applied in order, case-insensitive). Rules are (pattern, replacement). */
  final class Normalizer(rules: Seq[(String, String)]) extends Serializable {
    @transient private lazy val compiled =
      rules.map { case (p, r) => (java.util.regex.Pattern.compile(p,
        java.util.regex.Pattern.CASE_INSENSITIVE), r) }
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    def norm(s: String): String = {
      if (s == null) return null
      val cached = memo.get(s)
      if (cached != null) return cached
      var cur = s
      compiled.foreach { case (p, r) => cur = p.matcher(cur).replaceAll(r) }
      cur = cur.toLowerCase.trim
      if (memo.size < 100000) memo.put(s, cur)
      cur
    }
  }

  /** Default station-name normalizer (our own rule set, reference-shaped:
    * strip parenthesized suffixes, collapse abbreviations + whitespace). */
  val stationNormalizer = new Normalizer(Seq(
    "\\(.*\\)" -> "",
    "\\bstr\\." -> "strasse",
    "\\bst\\." -> "station",
    "\\bbhf\\b\\.?" -> "bahnhof",
    "[,;/]" -> " ",
    "\\s+" -> " "))

  /** executor-global compiled-chain cache: UDFs ship RULES (serializable),
    * each executor compiles + memoizes the chain once (U1 config-driven
    * chains without re-compiling regexes per row). */
  private val normCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, String)], Normalizer]()
  def normalizerFor(rules: Seq[(String, String)]): Normalizer =
    normCache.computeIfAbsent(rules, r => new Normalizer(r))

  private def tokens(s: String): Set[String] =
    if (s == null) Set.empty else s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSet

  /** Token-set Jaccard similarity (U2). */
  def jaccardSimi(a: String, b: String): Double = {
    val ta = tokens(a); val tb = tokens(b)
    if (ta.isEmpty && tb.isEmpty) return 1.0
    if (ta.isEmpty || tb.isEmpty) return 0.0
    ta.intersect(tb).size.toDouble / ta.union(tb).size
  }

  /** Levenshtein edit distance (U4). */
  def editDist(a: String, b: String): Int = {
    if (a == null || b == null) return Int.MaxValue
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val c = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + c)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Normalized edit similarity: 1 - dist/maxLen (threshold 0.85 in the
    * reference). */
  def editSimi(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val mx = math.max(a.length, b.length)
    if (mx == 0) 1.0 else 1.0 - editDist(a, b).toDouble / mx
  }

  /** Prefix edit similarity (U4 prefixEditDist, threshold 0.875): edit
    * similarity of the shorter string against the other's prefix. */
  def prefixEditSimi(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 1.0 else 0.0
    val pref = l.substring(0, math.min(l.length, s.length))
    1.0 - editDist(s, pref).toDouble / s.length
  }

  /** "Best token subset" similarity (U3, threshold 0.85): max edit
    * similarity between any contiguous token subsequence of the longer
    * name and the shorter name. */
  def btsSimi(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val toks = l.toLowerCase.split("\\s+").filter(_.nonEmpty)
    var best = editSimi(s.toLowerCase, l.toLowerCase)
    for (i <- toks.indices; j <- i until toks.length) {
      val sub = toks.slice(i, j + 1).mkString(" ")
      val e = editSimi(s.toLowerCase, sub)
      if (e > best) best = e
    }
    best
  }

  /** Combined Jaccard + geodistance classifier (U5, the reference default,
    * StatsimiClassifier.cpp:19-36 shape): (exp(-ln2/85 * meters) +
    * jaccard) / 2 > 0.5. */
  def jaccardGeoDist(nameA: String, nameB: String, distM: Double): Double = {
    val geo = math.exp(-math.log(2.0) / 85.0 * math.max(0.0, distM))
    (geo + jaccardSimi(nameA, nameB)) / 2.0
  }

  /** Station-name match decision used for snap dedup + candidate bonuses
    * (reference simi > 0.9 for EqSearch; 0.5 for the combined default).
    * The normalizer chain is config-driven (U1) — default chain when the
    * caller has no OsmConfig at hand. */
  def stationsSimilar(nameA: String, nameB: String, distM: Double,
                      norm: Normalizer = stationNormalizer): Boolean = {
    val na = norm.norm(nameA); val nb = norm.norm(nameB)
    if (na == null || nb == null) return false
    if (na == nb) return true
    jaccardGeoDist(na, nb, distM) > 0.5 ||
      editSimi(na, nb) >= 0.85 || prefixEditSimi(na, nb) >= 0.875 || btsSimi(na, nb) >= 0.85
  }

  /** Route short-name similarity (U6, lineSimi > 0.5): exact, or one
    * contains the other as a token. */
  def lineSimi(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val na = a.trim.toLowerCase; val nb = b.trim.toLowerCase
    if (na == nb) 1.0
    else if (na.isEmpty || nb.isEmpty) 0.0
    else if (tokens(na).contains(nb) || tokens(nb).contains(na)) 0.75
    else 0.0
  }

  /** #RGB / #RRGGBB / named color -> packed RGB int (U12,
    * OsmBuilder.cpp:1840-1892 semantics); -1 if unparseable. */
  def parseHexColor(s: String): Int = {
    if (s == null) return -1
    val t = s.trim.toLowerCase
    val named = Map("red" -> 0xff0000, "green" -> 0x008000, "blue" -> 0x0000ff,
      "black" -> 0x000000, "white" -> 0xffffff, "yellow" -> 0xffff00,
      "orange" -> 0xffa500, "purple" -> 0x800080, "gray" -> 0x808080,
      "grey" -> 0x808080, "brown" -> 0xa52a2a)
    if (named.contains(t)) return named(t)
    val h = if (t.startsWith("#")) t.substring(1) else t
    try {
      if (h.length == 3)
        Integer.parseInt(h.map(c => s"$c$c").mkString, 16)
      else if (h.length == 6) Integer.parseInt(h, 16)
      else -1
    } catch { case _: NumberFormatException => -1 }
  }

  /** Text color for a background color: luma < 140 -> white (U12). */
  def textColorFor(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    val luma = 0.299 * r + 0.587 * g + 0.114 * b
    if (luma < 140) 0xffffff else 0x000000
  }

  /** GTFS HH:MM:SS -> seconds since midnight; hours may exceed 24 (U14). */
  def gtfsTimeToSec(s: String): Int = {
    if (s == null || s.isEmpty) return -1
    val parts = s.split(":")
    if (parts.length != 3) return -1
    try parts(0).trim.toInt * 3600 + parts(1).toInt * 60 + parts(2).toInt
    catch { case _: NumberFormatException => -1 }
  }
}
