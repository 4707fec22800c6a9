package graft.analysis

import java.util.Locale
import com.ibm.icu.text.{BreakIterator, RuleBasedBreakIterator}

/** The `text_general` analysis chain of the reference, re-expressed:
  * standard (UAX#29 word-break) tokenizer → stop filter (case-insensitive,
  * default-empty list) → lowercase — in exactly that order (stop removal sees
  * pre-lowercase tokens and matches case-insensitively).
  *
  * Reference chain: `solr/server/solr/configsets/_default/conf/managed-schema.xml:299-314`
  * (index analyzer of `text_general`); chain structure
  * `solr/core/src/java/org/apache/solr/analysis/TokenizerChain.java:36-80`.
  * The stopword list is empty by default (comment at `managed-schema.xml:293-297`).
  *
  * Tokenization implements UAX#29 word-break (the same published Unicode
  * segmentation standard Lucene's `standard` tokenizer implements), keeping
  * segments that contain a letter or digit. Two equivalent engines serve it:
  *
  *   - a hand-rolled single-pass scanner for pure-ASCII text (the indexing
  *     hot path — ICU's rule engine costs ~2.5µs per short string, mostly
  *     per-call `setText` setup, ~25% of the posting-build stage's CPU);
  *   - ICU4J's `RuleBasedBreakIterator` for anything containing a
  *     non-ASCII char (full Unicode classes, kana/ideograph handling).
  *
  * The ASCII scanner covers exactly the UAX#29 rules reachable from ASCII
  * input — WB5/8/9/10 (letter/digit runs), WB6/7 (single MidLetter `:` or
  * MidNumLet `.`/`'` between letters), WB11/12 (single MidNum `,`/`;`/`.`
  * between digits), WB13a/b (`_` ExtendNumLet joins) — and ASCII has no
  * Extend/Format chars, so no skip rules apply. AnalyzerSpec pins
  * scanner == ICU on every generated-corpus text and on randomized
  * punctuation-heavy ASCII strings.
  *
  * This is a deterministic pure function: both the index build and the query
  * parser call it, and the brute-force oracle scorer uses the identical
  * function, so engine/oracle token streams agree by construction.
  */
final class Analyzer(stopwords: Set[String] = Set.empty) extends Serializable {

  // lowercase the stop set once; matching is case-insensitive (ignoreCase=true)
  private val stopLower: Set[String] = stopwords.map(_.toLowerCase(Locale.ROOT))

  /** Full chain: tokenize → stop (case-insensitive) → lowercase. */
  def analyze(text: String): Array[String] = analyzeWithPositions(text)._1

  /** Like [[analyze]] but also returns each emitted token's POSITION in the
    * pre-stop token stream: a removed stopword still consumes a position
    * (Lucene StopFilter's enablePositionIncrements semantics —
    * `"the quick fox"` with stopword `the` yields quick@1 fox@2, so the
    * phrase `"quick fox"` still requires adjacency). */
  def analyzeWithPositions(text: String): (Array[String], Array[Int]) = {
    if (text == null || text.isEmpty) return (Array.empty, Array.empty)
    var i = 0
    val n = text.length
    var ascii = true
    while (ascii && i < n) { if (text.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) asciiAnalyzeWithPositions(text) else icuAnalyzeWithPositions(text)
  }

  /** ICU engine (any input; the only path for non-ASCII text). */
  private[graft] def icuAnalyzeWithPositions(text: String): (Array[String], Array[Int]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var poss = new Array[Int](16) // primitive-growable: hot indexing path
    var np = 0
    val bi = Analyzer.iter()
    bi.setText(text)
    var pos = 0
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      // keep segments the rule engine classified as words (letters, numbers,
      // kana, ideographs); punctuation/whitespace runs have status NONE
      if (bi.getRuleStatus != BreakIterator.WORD_NONE) {
        val tok = text.substring(start, end)
        if (stopLower.isEmpty || !stopLower.contains(tok.toLowerCase(Locale.ROOT))) {
          out += tok.toLowerCase(Locale.ROOT)
          if (np == poss.length) poss = java.util.Arrays.copyOf(poss, np * 2)
          poss(np) = pos
          np += 1
        }
        pos += 1
      }
      start = end
      end = bi.next()
    }
    (out.toArray, java.util.Arrays.copyOf(poss, np))
  }

  import Analyzer.{ALPHA, DIGIT, EXTNL, cls, MID_LETTER, MID_NUM, MID_NUMLET}

  /** Word-segment callback for [[asciiScan]] — called once per kept word
    * segment with its pre-stop position; the emitter applies the stop
    * filter (positions must keep counting across removed stopwords, so the
    * scanner cannot). Exactly two implementations exist (String path, id
    * path), keeping the call site bimorphic for the JIT. */
  private[graft] abstract class SegmentEmitter {
    def emit(text: String, start: Int, end: Int, pos: Int): Unit
  }

  /** ASCII UAX#29 scanner (see class doc). One pass, no per-call setup.
    * Segment SELECTION lives here — shared by the String and id paths so
    * the two token streams cannot drift; segment MATERIALIZATION lives in
    * the emitter. */
  private[graft] def asciiScan(text: String, em: SegmentEmitter): Unit = {
    val n = text.length
    var pos = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      val k = cls(c)
      if ((k & (ALPHA | DIGIT | EXTNL)) != 0) {
        val start = i
        var hasWordChar = (k & (ALPHA | DIGIT)) != 0
        i += 1
        var run = true
        while (run && i < n) {
          val c2 = text.charAt(i)
          val k2 = cls(c2)
          if ((k2 & (ALPHA | DIGIT | EXTNL)) != 0) {
            hasWordChar ||= (k2 & (ALPHA | DIGIT)) != 0
            i += 1
          } else if (k2 != 0 && i + 1 < n) {
            // candidate mid: single MidLetter/MidNum/MidNumLet joins only
            // when flanked by the right classes (WB6/7, WB11/12)
            val kp = cls(text.charAt(i - 1))
            val kn = cls(text.charAt(i + 1))
            val joins =
              ((k2 & (MID_LETTER | MID_NUMLET)) != 0 && (kp & ALPHA) != 0 && (kn & ALPHA) != 0) ||
                ((k2 & (MID_NUM | MID_NUMLET)) != 0 && (kp & DIGIT) != 0 && (kn & DIGIT) != 0)
            if (joins) i += 2 else run = false
          } else run = false
        }
        // pure-ExtendNumLet segments: ICU tags a LONE "_" WORD_NONE (no
        // break rule fired) but "__"+ WORD_LETTER (the WB13a chain fired) —
        // probed directly against ICU4J; match it exactly
        if (hasWordChar || i - start >= 2) {
          em.emit(text, start, i, pos)
          pos += 1
        }
      } else i += 1
    }
  }

  private[graft] def asciiAnalyzeWithPositions(text: String): (Array[String], Array[Int]) = {
    val em = new SegmentEmitter {
      var out = new Array[String](8)
      var no = 0
      var poss = new Array[Int](8)
      var np = 0
      def emit(text: String, start: Int, end: Int, pos: Int): Unit = {
        val tok = lowerSlice(text, start, end)
        if (stopLower.isEmpty || !stopLower.contains(tok)) {
          if (no == out.length) out = java.util.Arrays.copyOf(out, no * 2)
          out(no) = tok
          no += 1
          if (np == poss.length) poss = java.util.Arrays.copyOf(poss, np * 2)
          poss(np) = pos
          np += 1
        }
      }
    }
    asciiScan(text, em)
    (java.util.Arrays.copyOf(em.out, em.no), java.util.Arrays.copyOf(em.poss, em.np))
  }

  /** Reusable id-path emitter: construct ONE per task next to its
    * TokenDict/TokenSink (a fresh closure per document would put one
    * allocation per row back into the loop this path exists to
    * de-allocate). */
  final class IdEmitter(val dict: TokenDict, val sink: TokenSink)
      extends SegmentEmitter {
    def emit(text: String, start: Int, end: Int, pos: Int): Unit =
      sink.add(dict.idOfSlice(text, start, end), pos)
  }

  /** Indexing hot path: analyze straight to per-task term IDS, allocating
    * no per-occurrence String on the ASCII path (the dict probes lowercased
    * slices; see [[TokenDict]]). The sink is reset and refilled; token i is
    * `(sink.ids(i), sink.poss(i))`, i < sink.n — identical, token for
    * token, to [[analyzeWithPositions]] (AnalyzerSpec pins it). Non-ASCII
    * text and non-empty stopword chains take the String path and intern
    * after the fact — correctness first, the fast path covers the default
    * chain on the overwhelmingly-ASCII transcript corpus. */
  def analyzeIdsInto(text: String, em: IdEmitter): Unit = {
    em.sink.n = 0
    if (text == null || text.isEmpty) return
    var ascii = stopLower.isEmpty
    var i = 0
    val n = text.length
    while (ascii && i < n) { if (text.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) asciiScan(text, em)
    else {
      val (toks, poss) = analyzeWithPositions(text)
      var j = 0
      while (j < toks.length) { em.sink.add(em.dict.idOf(toks(j)), poss(j)); j += 1 }
    }
  }

  /** ASCII-lowercased substring; allocation-minimal when already lowercase. */
  private def lowerSlice(text: String, start: Int, end: Int): String = {
    var i = start
    var hasUpper = false
    while (!hasUpper && i < end) {
      val c = text.charAt(i)
      if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (!hasUpper) text.substring(start, end)
    else {
      val arr = new Array[Char](end - start)
      var j = 0
      i = start
      while (i < end) {
        val c = text.charAt(i)
        arr(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        i += 1
        j += 1
      }
      new String(arr)
    }
  }
}

object Analyzer {
  /** Default chain ships with an empty stopword list, like the reference. */
  val default: Analyzer = new Analyzer(Set.empty)

  // ASCII word-break property classes (UAX#29 WordBreakProperty.txt,
  // restricted to U+0000..U+007F), as bit flags for flank tests
  private[analysis] final val ALPHA = 1 // ALetter: A-Z a-z
  private[analysis] final val DIGIT = 2 // Numeric: 0-9
  private[analysis] final val EXTNL = 4 // ExtendNumLet: _
  private[analysis] final val MID_LETTER = 8 // MidLetter: :
  private[analysis] final val MID_NUM = 16 // MidNum: , ;
  private[analysis] final val MID_NUMLET = 32 // MidNumLet: . '

  private[analysis] val clsTable: Array[Int] = {
    val t = new Array[Int](128)
    for (c <- 'a' to 'z') t(c) = ALPHA
    for (c <- 'A' to 'Z') t(c) = ALPHA
    for (c <- '0' to '9') t(c) = DIGIT
    t('_') = EXTNL
    t(':') = MID_LETTER
    t(',') = MID_NUM
    t(';') = MID_NUM
    t('.') = MID_NUMLET
    t('\'') = MID_NUMLET
    t
  }
  @inline private[analysis] def cls(c: Char): Int = clsTable(c.toInt)

  /** ICU BreakIterators are stateful and not thread-safe: one per thread. */
  private val tl = new ThreadLocal[RuleBasedBreakIterator] {
    override def initialValue(): RuleBasedBreakIterator =
      BreakIterator.getWordInstance(Locale.ROOT).asInstanceOf[RuleBasedBreakIterator]
  }
  private def iter(): RuleBasedBreakIterator = tl.get()
}
