package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, TranscriptGen, Turn}
import graft.query.Searcher
import Op.t

/** Full-text engine queries — the north-rule path (SURVEY.md §3.1): build
  * the inverted index (posting construction, delta+varint blocks, per-block
  * max-score), then answer BM25 top-k with block-max WAND.
  *
  * Two corpora:
  *   - `documents` from the input dir (one turn per doc) — ties the engine
  *     to the driver's tables; its text is plain `[a-z0-9 ]`, so the
  *     analyzer degenerates to a whitespace split and index-level artifacts
  *     (df/ttf, quantized doc lengths) ARE SQL-expressible → real DuckDB
  *     oracles for the index-build path.
  *   - deterministic synthetic transcripts (TranscriptGen, seeded) — the
  *     (conv_id, turn_idx, role, text, tool, ts) shape from BASELINE.json's
  *     input_hint, with hot-term/long-conversation skew.
  *
  * BM25 *scores* are float32 with Lucene's quantized norms — not expressible
  * in DuckDB (the driver records rows-only checks for search ops); their
  * rank-identity vs the brute-force oracle is gated by `sbt -batch test`
  * (EngineSpec).
  *
  * Index builds are cached on disk under java.io.tmpdir and made idempotent
  * by IndexBuilder's lineage table (a re-run skips completed steps).
  */
object FtsOps {

  private val cacheRoot = s"${System.getProperty("java.io.tmpdir")}/graft-index"
  private val built = scala.collection.mutable.Set.empty[String]

  /** SmallFloat byte4 quantization lookup emitted as SQL (codec/SmallFloat
    * .scala: 24 exact "free" values, then 3-bit mantissa + implicit bit
    * shifted by the exponent) — used to oracle-check quantized doc lengths
    * with pure integer math. */
  private val byte4LookupSql =
    """SELECT b, CASE WHEN b < 24 THEN CAST(b AS BIGINT)
      |  WHEN (b - 24) < 8 THEN CAST(b AS BIGINT)
      |  ELSE 24 + (((b - 24) % 8) + 8) * (CAST(1 AS BIGINT) << (((b - 24) // 8) - 1)) END AS v
      |FROM (SELECT unnest(generate_series(0, 255)) AS b)""".stripMargin

  private def docsAsTurns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      format_string("doc-%06d", col("doc_id")).as("conv_id"),
      lit(0).as("turn_idx"),
      col("source").as("role"),
      col("text"),
      col("lang").as("tool"),
      (lit(1700000000000L) + col("doc_id") * 1000).cast("timestamp").as("ts"))

  /** Build (or reuse) an index; returns its directory. */
  def index(s: SparkSession, dir: String, corpus: String): String = synchronized {
    val key = s"${dir.replaceAll("[^a-zA-Z0-9.]", "_")}-$corpus"
    val idxDir = s"$cacheRoot/$key"
    if (!built.contains(idxDir)) {
      val turns = corpus match {
        case "documents" => docsAsTurns(s, dir)
        case "transcripts" => TranscriptGen.generate(s, numConvs = 300).toDF()
      }
      IndexBuilder.build(s, turns, idxDir, IndexBuilder.Config(numSegments = 8))
      built += idxDir
    }
    idxDir
  }

  // one Searcher per index dir per session epoch — repeated op invocations
  // reuse its persisted postings/terms and fq DocSet caches instead of
  // leaking a fresh set of persisted DataFrames each call
  private val searchers = scala.collection.mutable.Map.empty[String, Searcher]

  private def searcher(s: SparkSession, dir: String, corpus: String): Searcher = synchronized {
    val idx = index(s, dir, corpus)
    searchers.get(idx) match {
      case Some(sr) if sr.spark eq s => sr
      case old =>
        old.foreach(_.close())
        val sr = new Searcher(s, idx)
        searchers(idx) = sr
        sr
    }
  }

  def ops: Seq[Op] = Seq(

    Op("fts_topk",
      "BM25 top-k keyword search, block-max WAND per segment + PQ merge " +
        "(SolrIndexSearcher.java:1894-1913 collector path); scores/ranks " +
        "gated vs the brute-force oracle in EngineSpec",
      None,
      (s, dir) => searcher(s, dir, "documents").search("data query fast window", k = 10)),

    Op("fts_boolean",
      "boolean query: MUST/MUST_NOT clauses over postings (lucene QParser " +
        "grammar, parser/QueryParser.jj; leapfrog intersection + exclusion)",
      None,
      (s, dir) => searcher(s, dir, "documents").search("+data -slow merge batch", k = 10)),

    Op("fts_filtered",
      "fq filter-before-score path (SolrIndexSearcher.getProcessedFilter, " +
        "SolrIndexSearcher.java:1207,1242-1250): structured filter " +
        "restricts candidates, does not change corpus stats",
      None,
      (s, dir) => searcher(s, dir, "transcripts").search("role:user spark shuffle partition", k = 10)),

    Op("fts_transcripts_topk",
      "BM25 top-k over the multi-turn transcript corpus (conv_id/turn_idx " +
        "data model from BASELINE.json input_hint), Zipf-skewed hot terms",
      None,
      (s, dir) => searcher(s, dir, "transcripts").search("error retry timeout commit", k = 10)),

    Op("fts_index_termstats",
      "index-build artifact check: global term stats df/ttf from the " +
        "postings tables (the ExactStatsCache analogue, " +
        "search/stats/ExactStatsCache.java:52-61) — SQL-oracled because the " +
        "documents corpus tokenizes as a whitespace split",
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |  FROM documents WHERE length(text) > 0)
             |SELECT w AS term, count(DISTINCT doc_id) AS df, count(*) AS ttf
             |FROM toks GROUP BY w ORDER BY df DESC, term LIMIT 25""".stripMargin),
      (s, dir) => s.read.parquet(s"${index(s, dir, "documents")}/terms")
        .select(col("term"), col("df"), col("ttf"))
        .orderBy(col("df").desc, col("term"))
        .limit(25)),

    Op("fts_index_doclen",
      "index-build artifact check: per-doc quantized lengths from the norms " +
        "sidecar match SmallFloat(byte4) quantization of the token count " +
        "(Lucene norm semantics, SURVEY.md §4.2), via an integer-math " +
        "quantization lookup in SQL",
      Some(s"""WITH lut AS ($byte4LookupSql),
              |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
              |       WHERE length(text) > 0)
              |SELECT doc_id, (SELECT max(v) FROM lut WHERE v <= n) AS dl_quantized
              |FROM dl ORDER BY doc_id LIMIT 100""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val idx = index(s, dir, "documents")
        // decode the norms sidecar: norms(i) = quantized length of first_doc+i
        val norms = s.read.parquet(s"$idx/postings").where(col("term") === "")
          .select(col("first_doc"), col("norms"))
          .as[(Long, Array[Byte])]
          .flatMap { case (first, ns) =>
            ns.iterator.zipWithIndex.map { case (b, i) =>
              (first + i, graft.codec.SmallFloat.byte4ToInt(b).toLong)
            }
          }
          .toDF("internal_doc", "dl_quantized")
        // internal docIds were assigned under (conv_id="doc-%06d") order,
        // i.e. ascending doc_id, over docs with non-empty text
        val ids = docsAsTurns(s, dir).where(length(col("text")) > 0)
          .select(regexp_extract(col("conv_id"), "(\\d+)", 1).cast("long").as("doc_id"))
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
        val mapped = ids.withColumn("internal_doc", row_number().over(w).cast("long") - 1)
        norms.join(mapped, "internal_doc")
          .select(col("doc_id"), col("dl_quantized"))
          .orderBy(col("doc_id"))
          .limit(100)
      }),

    Op("fts_doc_count",
      "index-build artifact check: corpus doc count and summed doc length " +
        "(BM25's N and the avgdl numerator) vs a direct SQL count",
      Some("""SELECT count(*) AS doc_count,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
             |FROM documents WHERE length(text) > 0""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val c = s.read.parquet(s"${index(s, dir, "documents")}/corpus")
          .as[graft.index.CorpusStats].head()
        Seq((c.doc_count, c.sum_dl)).toDF("doc_count", "sum_dl")
      }),

    Op("fts_per_turn_equality",
      "per-row invariant from BASELINE.json input_hint: per-turn text " +
        "equality under stable (conv_id, turn_idx) ordering — stored fields " +
        "read back from the index equal the source rows",
      Some("""SELECT format('doc-{:06d}', doc_id) AS conv_id, 0 AS turn_idx, text
             |FROM documents ORDER BY conv_id LIMIT 100""".stripMargin),
      (s, dir) => {
        val idx = index(s, dir, "documents")
        s.read.parquet(s"$idx/docs")
          .select(col("conv_id"), col("turn_idx"), col("text"))
          .orderBy(col("conv_id"), col("turn_idx"))
          .limit(100)
      })
  )

  /** Flagship query for SparkEntry.entry: end-to-end index+search on the
    * smallest scale factor. */
  def flagship(s: SparkSession): DataFrame =
    searcher(s, "/root/testdata/sf0.001", "documents").search("data query fast", k = 10)
}
