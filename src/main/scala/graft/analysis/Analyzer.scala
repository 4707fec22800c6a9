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
  * Tokenization uses ICU4J's UAX#29 word-break rules (the same published
  * Unicode segmentation standard Lucene's `standard` tokenizer implements),
  * keeping segments that contain a letter or digit. This is a deterministic
  * pure function: both the index build and the query parser call it, and the
  * brute-force oracle scorer uses the identical function, so engine/oracle
  * token streams agree by construction.
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
}

object Analyzer {
  /** Default chain ships with an empty stopword list, like the reference. */
  val default: Analyzer = new Analyzer(Set.empty)

  /** ICU BreakIterators are stateful and not thread-safe: one per thread. */
  private val tl = new ThreadLocal[RuleBasedBreakIterator] {
    override def initialValue(): RuleBasedBreakIterator =
      BreakIterator.getWordInstance(Locale.ROOT).asInstanceOf[RuleBasedBreakIterator]
  }
  private def iter(): RuleBasedBreakIterator = tl.get()
}
