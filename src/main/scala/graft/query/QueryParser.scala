package graft.query

import graft.analysis.Analyzer

/** Parsed boolean keyword query, flattened to Lucene BooleanQuery clause
  * lists (the reference's default `lucene` parser grammar —
  * `solr/core/src/java/org/apache/solr/parser/QueryParser.jj`,
  * `solr/core/src/java/org/apache/solr/search/SolrQueryParserBase.java`):
  * bare terms are SHOULD, `+term` / `a AND b` are MUST, `-term` / `NOT term`
  * are MUST_NOT, `field:value` on non-text fields becomes a structured
  * filter (the fq path). Terms pass through the query-time analyzer; a term
  * the analyzer drops (stopword) vanishes from the query, like the reference.
  *
  * Term lists preserve query order — scoring accumulates in this order.
  */
/** An exact (slop-0) phrase clause: terms must appear at consecutive
  * positions. occur: 0 = MUST, 1 = SHOULD, 2 = MUST_NOT. */
final case class Phrase(terms: Vector[String], occur: Int)

final case class ParsedQuery(
    should: Vector[String],
    must: Vector[String],
    mustNot: Vector[String],
    filters: Vector[(String, String)], // (field, value) exact-match filters
    phrases: Vector[Phrase] = Vector.empty) {
  def allTerms: Vector[String] =
    (must ++ should ++ mustNot ++ phrases.flatMap(_.terms)).distinct
  def positiveClauses: Int =
    should.length + must.length + phrases.count(_.occur != 2)
  def isEmpty: Boolean = positiveClauses == 0
}

object QueryParser {

  private val FilterFields = Set("role", "tool", "conv_id")

  private sealed trait Occur
  private case object Should extends Occur
  private case object Must extends Occur
  private case object MustNot extends Occur

  private final case class Clause(occur: Occur, body: String, phrase: Boolean)

  /** Parse a flat boolean query string. Supported: bare terms (SHOULD),
    * `+t` (MUST), `-t` (MUST_NOT), infix `AND`/`OR`/`NOT` (flat, no parens —
    * AND promotes both neighbours to MUST, NOT negates the next clause),
    * `field:value` filters for non-text fields, and quoted "a b" as an
    * exact phrase (consecutive positions, slop 0). */
  def parse(q: String, analyzer: Analyzer = Analyzer.default): ParsedQuery = {
    val toks = lex(q)
    // pass 1: clause list with unary operators resolved
    val clauses = scala.collection.mutable.ArrayBuffer.empty[Clause]
    val filters = Vector.newBuilder[(String, String)]
    var nextNegated = false
    var promoteNext = false // previous token was AND
    toks.foreach {
      case "AND" | "&&" =>
        if (clauses.nonEmpty && clauses.last.occur == Should)
          clauses(clauses.length - 1) = clauses.last.copy(occur = Must)
        promoteNext = true
      case "OR" | "||" => // default
      case "NOT" | "!" => nextNegated = true
      case tok =>
        var occur: Occur = if (promoteNext) Must else Should
        var body = tok
        if (body.startsWith("+")) { occur = Must; body = body.substring(1) }
        else if (body.startsWith("-")) { occur = MustNot; body = body.substring(1) }
        if (nextNegated) occur = MustNot
        val colon = body.indexOf(':')
        if (colon > 0 && FilterFields.contains(body.substring(0, colon))) {
          filters += ((body.substring(0, colon), body.substring(colon + 1)))
        } else {
          val phrase = body.startsWith("\"")
          val text = if (phrase) body.stripPrefix("\"").stripSuffix("\"") else body
          clauses += Clause(occur, text, phrase)
        }
        nextNegated = false
        promoteNext = false
    }
    // pass 2: analyze each clause, emit terms in query order; a quoted
    // multi-term clause becomes an exact PHRASE (slop 0 — the reference's
    // default phrase semantics, SolrQueryParserBase.java:140,355-362)
    val should = Vector.newBuilder[String]
    val must = Vector.newBuilder[String]
    val mustNot = Vector.newBuilder[String]
    val phrases = Vector.newBuilder[Phrase]
    clauses.foreach { c =>
      val terms = analyzer.analyze(c.body).toVector
      if (terms.nonEmpty) {
        if (c.phrase && terms.length > 1) {
          val occ = c.occur match {
            case Must => 0
            case Should => 1
            case MustNot => 2
          }
          phrases += Phrase(terms, occ)
        } else c.occur match {
          case Should  => terms.foreach(should += _)
          case Must    => terms.foreach(must += _)
          case MustNot => terms.foreach(mustNot += _)
        }
      }
    }
    ParsedQuery(should.result().distinct, must.result().distinct,
      mustNot.result().distinct, filters.result(), phrases.result())
  }

  private def lex(q: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = q.length
    val sb = new StringBuilder
    var inQuote = false
    def flush(): Unit = { if (sb.nonEmpty) { out += sb.toString; sb.clear() } }
    while (i < n) {
      val c = q.charAt(i)
      if (c == '"') { sb.append(c); inQuote = !inQuote; if (!inQuote) flush() }
      else if (c.isWhitespace && !inQuote) flush()
      else sb.append(c)
      i += 1
    }
    flush()
    out.result()
  }
}
