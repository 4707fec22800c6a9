package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer
import graft.query.QueryParser

class AnalyzerSpec extends AnyFunSuite {
  private val a = Analyzer.default

  test("basic tokenization + lowercase") {
    assert(a.analyze("Hello World").toSeq == Seq("hello", "world"))
    assert(a.analyze("Spark SQL rocks!").toSeq == Seq("spark", "sql", "rocks"))
  }

  test("punctuation splits, numerics and mixed tokens survive") {
    assert(a.analyze("foo,bar;baz").toSeq == Seq("foo", "bar", "baz"))
    assert(a.analyze("3.14 x86_64 v2.0").toSeq == Seq("3.14", "x86_64", "v2.0"))
  }

  test("apostrophes kept inside words (UAX#29 MidLetter)") {
    assert(a.analyze("don't stop").toSeq == Seq("don't", "stop"))
  }

  test("empty / whitespace-only / punctuation-only input") {
    assert(a.analyze("").isEmpty)
    assert(a.analyze(null).isEmpty)
    assert(a.analyze("   \t\n").isEmpty)
    assert(a.analyze("... !!! ---").isEmpty)
  }

  test("unicode passthrough") {
    assert(a.analyze("héllo naïve").toSeq == Seq("héllo", "naïve"))
    assert(a.analyze("café au lait").toSeq == Seq("café", "au", "lait"))
  }

  test("stop removal happens before lowercasing, matched case-insensitively") {
    val withStop = new Analyzer(Set("the", "AND"))
    // "The" and "and" are dropped despite case differences
    assert(withStop.analyze("The Quick and THE dead").toSeq == Seq("quick", "dead"))
    // default list is empty like the reference: nothing dropped
    assert(a.analyze("the quick").toSeq == Seq("the", "quick"))
  }

  test("idempotence law: analyzing joined output is a fixpoint") {
    for (s <- Seq("Hello World", "don't STOP now", "a b c 42", "x86_64 v2.0"))
      assert(a.analyze(a.analyze(s).mkString(" ")).toSeq == a.analyze(s).toSeq)
  }

  private def assertEnginesAgree(an: Analyzer, s: String): Unit = {
    val (ft, fp) = an.asciiAnalyzeWithPositions(s)
    val (it, ip) = an.icuAnalyzeWithPositions(s)
    assert(ft.toSeq == it.toSeq, s"tokens diverge on <$s>: ascii=${ft.toSeq} icu=${it.toSeq}")
    assert(fp.toSeq == ip.toSeq, s"positions diverge on <$s>: ascii=${fp.toSeq} icu=${ip.toSeq}")
  }

  test("ASCII scanner == ICU on curated UAX#29 edge cases") {
    val cases = Seq(
      "a", "_", "__", "_a", "a_", "a__b", "3_", "_3_", "x86_64",
      "a.b", "a.b.c", "a..b", "a.1", "1.a", "3.14", "1,234,567", "1;2",
      "a:b", "1:2", "a:1", "don't", "don''t", "'quoted'", "can't.stop",
      "a.b:c'd", "U.S.A", "U.S.A.", "v2.0", "e.g., etc.", "a-b", "a/b",
      "trailing.", ".leading", ":colon:", "a'", "'a", "1.", ".1", "1.2.3",
      "CamelCase MIXED lower", "tab\tsep", "nl\nsep", "cr\rsep",
      "  spaces  ", "", "a", "(parens) [brackets] {braces}",
      "semi;colon", "1_000_000", "_1.2_", "a_1.b_2", "9,9", "9,a", "a,9")
    cases.foreach(assertEnginesAgree(a, _))
    // with stopwords: removal + position accounting must agree too
    val stop = new Analyzer(Set("the", "AND"))
    Seq("The quick AND the dead", "the.and", "THE_AND", "the, and; the")
      .foreach(assertEnginesAgree(stop, _))
  }

  test("ASCII scanner == ICU on randomized punctuation-heavy strings") {
    val chars = "abcXYZ019_.,:;'\"-+*/\\ ()\t".toCharArray
    val rnd = new scala.util.Random(20260818)
    for (_ <- 1 to 4000) {
      val len = rnd.nextInt(40)
      val s = new String(Array.fill(len)(chars(rnd.nextInt(chars.length))))
      assertEnginesAgree(a, s)
    }
  }

  test("ASCII scanner == ICU on every generated-corpus ASCII text") {
    val texts = (0L until 300L).iterator
      .flatMap(graft.index.TranscriptGen.turnsFor(_)).map(_.text).toArray
    var ascii = 0
    texts.foreach { t =>
      if (t.forall(_ < 0x80)) { ascii += 1; assertEnginesAgree(a, t) }
    }
    assert(ascii > texts.length / 2, "corpus sample unexpectedly non-ASCII")
  }

  /** The id path (TokenDict slice probes, no per-occurrence String) must be
    * token-for-token identical to the String path — terms AND positions —
    * and one id must mean one term across an entire task's stream. */
  private def assertIdPathAgrees(an: Analyzer, dict: graft.analysis.TokenDict,
      sink: graft.analysis.TokenSink, text: String): Unit = {
    val (toks, poss) = an.analyzeWithPositions(text)
    an.analyzeIdsInto(text, new an.IdEmitter(dict, sink))
    assert(sink.n == toks.length, s"count mismatch on <$text>")
    for (i <- 0 until sink.n) {
      assert(dict.term(sink.ids(i)) == toks(i),
        s"term $i mismatch on <$text>: ${dict.term(sink.ids(i))} vs ${toks(i)}")
      assert(sink.poss(i) == poss(i), s"pos $i mismatch on <$text>")
    }
  }

  test("id path == String path on corpus texts, edge cases, and fuzz") {
    val dict = new graft.analysis.TokenDict()
    val sink = new graft.analysis.TokenSink()
    // curated edges incl. case folding, non-ASCII (ICU fallback), empties
    Seq("", "a", "CamelCase MIXED lower", "x86_64 v2.0 don't 1,234",
      "café résumé data", "data CAFÉ Data DATA",
      "日本語 text mix", "__ _a 3.14:q")
      .foreach(assertIdPathAgrees(a, dict, sink, _))
    // one id per distinct term even across the ASCII/ICU path boundary:
    // "data" arrived via slice probe above AND via the ICU fallback line
    val em = new a.IdEmitter(dict, sink)
    a.analyzeIdsInto("data", em)
    val idAscii = sink.ids(0)
    a.analyzeIdsInto("data café", em)
    assert(sink.ids(0) == idAscii, "cross-path id split for one term")
    // corpus + punctuation fuzz through ONE shared dict (interning stays
    // consistent as the table grows and rehashes)
    (0L until 200L).iterator.flatMap(graft.index.TranscriptGen.turnsFor(_))
      .foreach(t => assertIdPathAgrees(a, dict, sink, t.text))
    val chars = "abcXYZ019_.,:;'\"-+*/\\ ()\té".toCharArray
    val rnd = new scala.util.Random(20260820)
    for (_ <- 1 to 4000) {
      val len = rnd.nextInt(40)
      val s = new String(Array.fill(len)(chars(rnd.nextInt(chars.length))))
      assertIdPathAgrees(a, dict, sink, s)
    }
    // non-empty stopword chain takes the fallback path with positions intact
    val stop = new Analyzer(Set("the", "and"))
    Seq("The quick AND the dead", "the.and data THE")
      .foreach(assertIdPathAgrees(stop, dict, sink, _))
  }
}

class QueryParserSpec extends AnyFunSuite {

  test("bare terms are SHOULD, analyzed + lowercased") {
    val p = QueryParser.parse("Spark shuffle")
    assert(p.should == Vector("spark", "shuffle"))
    assert(p.must.isEmpty && p.mustNot.isEmpty && p.filters.isEmpty)
  }

  test("+term and AND promote to MUST") {
    val p1 = QueryParser.parse("+spark shuffle")
    assert(p1.must == Vector("spark") && p1.should == Vector("shuffle"))
    val p2 = QueryParser.parse("spark AND shuffle")
    assert(p2.must == Vector("spark", "shuffle") && p2.should.isEmpty)
  }

  test("-term and NOT negate") {
    val p = QueryParser.parse("spark -shuffle NOT join")
    assert(p.should == Vector("spark"))
    assert(p.mustNot == Vector("shuffle", "join"))
  }

  test("field:value becomes a structured filter") {
    val p = QueryParser.parse("role:user spark tool:bash")
    assert(p.filters == Vector(("role", "user"), ("tool", "bash")))
    assert(p.should == Vector("spark"))
  }

  test("quoted multi-term clause becomes an exact phrase") {
    val p = QueryParser.parse("\"merge segments\" fast")
    assert(p.phrases == Vector(graft.query.Phrase(Vector("merge", "segments"), 1)))
    assert(p.should == Vector("fast"))
    // prefix operators carry onto the phrase clause
    val pm = QueryParser.parse("+\"a b\" -\"c d\"")
    assert(pm.phrases.map(_.occur) == Vector(0, 2))
  }

  test("extended grammar: boosts, groups, ranges, wildcard, fuzzy") {
    val b = QueryParser.parse("data^2 query")
    assert(b.boosts == Map("data" -> 2f) && b.should == Vector("data", "query"))
    val g = QueryParser.parse("+(a b) c")
    assert(g.groups == Vector(graft.query.Group(Vector("a", "b"))) && g.should == Vector("c"))
    val gAnd = QueryParser.parse("+(a AND b)")
    assert(gAnd.groups.isEmpty && gAnd.must == Vector("a", "b")) // distributes
    val bare = QueryParser.parse("(a b) c")
    assert(bare.groups.isEmpty && bare.should == Vector("a", "b", "c"))
    val neg = QueryParser.parse("-(a b) c")
    assert(neg.mustNot == Vector("a", "b") && neg.should == Vector("c"))
    val r = QueryParser.parse("role:[alpha TO beta] data")
    assert(r.rangeFilters == Vector(graft.query.RangeFilter("role", "alpha", "beta", true)))
    val w = QueryParser.parse("par5*")
    assert(w.multiTerms == Vector(graft.query.MultiTerm(0, "par5", 0, 1, 1f)))
    val f = QueryParser.parse("+term~1^2")
    assert(f.multiTerms == Vector(graft.query.MultiTerm(1, "term", 1, 0, 2f)))
  }

  test("AND backward promotion binds the true left operand, not clauses.last") {
    // wildcard left operand: the AND must promote par* (multiTerms), not
    // the earlier unrelated term `data`
    val w = QueryParser.parse("data par* AND retry")
    assert(w.should == Vector("data"), s"data stays optional: ${w.should}")
    assert(w.must == Vector("retry"))
    assert(w.multiTerms == Vector(graft.query.MultiTerm(0, "par", 0, 0, 1f)),
      s"par* promoted to MUST: ${w.multiTerms}")
    // fuzzy left operand, same binding
    val fz = QueryParser.parse("data term~1 AND retry")
    assert(fz.should == Vector("data") && fz.must == Vector("retry"))
    assert(fz.multiTerms.head.occur == 0)
    // filter left operand: role:user is structurally required already;
    // `data` must NOT be promoted in its place
    val fl = QueryParser.parse("data role:user AND retry")
    assert(fl.should == Vector("data") && fl.must == Vector("retry"))
    assert(fl.filters == Vector(("role", "user")))
    // plain-term behavior unchanged
    val p = QueryParser.parse("data spark AND retry")
    assert(p.should == Vector("data") && p.must == Vector("spark", "retry"))
  }

  test("duplicate clauses accumulate boost like Lucene's per-clause sum") {
    // `data data^2` = two clauses scoring 1x + 2x in Lucene = 3x once here
    val d = QueryParser.parse("data data^2")
    assert(d.should == Vector("data") && d.boostOf("data") == 3f)
    // `+foo foo` = MUST(1x) + SHOULD(1x); must-wins occur, weight 2
    val m = QueryParser.parse("+foo foo")
    assert(m.must == Vector("foo") && m.should == Vector("foo") && m.boostOf("foo") == 2f)
    // a single boosted clause stays its own weight
    assert(QueryParser.parse("data^2 query").boostOf("query") == 1f)
    // MUST_NOT boost is inert (never scored)
    assert(QueryParser.parse("a -b^5").boosts.isEmpty)
  }

  test("stopword-only query is empty after analysis") {
    val stop = new Analyzer(Set("the", "a"))
    val p = QueryParser.parse("the a THE", stop)
    assert(p.isEmpty)
  }
}
