package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Op.t

/** Training-data-pipeline text operators over the `documents` table:
  * exact/near deduplication (hash, MinHash+LSH, SimHash, n-gram Jaccard),
  * language-ID, quality scoring, token counting, fingerprinting, and the
  * multimodal binary-column plumbing stub.
  *
  * Near-dup lineage in the reference: MinHash similarity queries
  * (solr/core/src/java/org/apache/solr/search/MinHashQParserPlugin.java) and
  * dedup-on-ingest via content signatures
  * (solr/core/src/java/org/apache/solr/update/processor/MD5Signature.java,
  * TextProfileSignature.java). Scaled out here the Spark way: shingle →
  * signature → band bucket → join, never an O(n²) comparison of the corpus.
  *
  * Determinism/parity: `documents.text` is plain `[a-z0-9 ]` so
  * `split(text,' ')` tokenization matches DuckDB `string_split` exactly;
  * signatures are derived from md5 hex strings (identical in both engines)
  * or pure integer math.
  */
object TextOps {

  /** Word w-shingles (distinct), as a Column over `split(text,' ')`. */
  private def shingles(w: Column, n: Int): Column =
    array_distinct(transform(sequence(lit(0), size(w) - n),
      i => concat_ws(" ", slice(w, i + 1, lit(n)))))

  /** doc_id -> distinct word-3-gram shingles, docs with >= 3 tokens. */
  private def shingleTable(s: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    t(s, dir, "documents")
      .where(size(w) >= 3)
      .select(col("doc_id"), shingles(w, 3).as("sh"))
  }

  /** Exact pairwise Jaccard >= minJ via an inverted shingle->doc join (the
    * scalable formulation: pairs only materialize for docs sharing a
    * shingle). */
  private def jaccardPairs(s: SparkSession, dir: String, minJ: Double): DataFrame = {
    val sh = shingleTable(s, dir).select(col("doc_id"), explode(col("sh")).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("i"), col("n").as("na")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n").as("nb")), "j")
      .withColumn("jac", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("jac") >= minJ)
      .select(col("i"), col("j"), col("jac"))
      .orderBy(col("i"), col("j"))
  }

  private val jaccardOracle =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT i, j, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
      |FROM inter JOIN sz sa ON i = sa.doc_id JOIN sz sb ON j = sb.doc_id
      |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= %THRESH%
      |ORDER BY i, j""".stripMargin

  /** 128 MinHash values from a shingle set: h_p(s) = splitmix64(seed_p ^
    * murmur3(s)); deterministic and JVM-stable. */
  private def minhashSig(sh: Seq[String], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    sh.foreach { s =>
      val base = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c).toLong
      var p = 0
      while (p < numPerm) {
        val h = mix64(base ^ (p * 0x9e3779b97f4a7c15L))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    sig
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** SimHash-32 over a shingle set: bit j is the sign of the per-bit vote,
    * where shingle bits come from its md5 hex digits (nibble q, bit r ->
    * j = 4q + r) — identical integer math is mirrored in the SQL oracle. */
  private def simhash32(sh: Seq[String]): Int = {
    val votes = new Array[Int](32)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    sh.foreach { s =>
      val hex = mdig.digest(s.getBytes("UTF-8"))
      var q = 0
      while (q < 8) {
        // nibble q of the hex string = high/low half of byte q/2
        val b = hex(q / 2) & 0xff
        val v = if (q % 2 == 0) b >>> 4 else b & 0xf
        var r = 0
        while (r < 4) {
          val j = q * 4 + r
          if (((v >> r) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          r += 1
        }
        q += 1
      }
    }
    var out = 0
    var j = 0
    while (j < 32) { if (votes(j) > 0) out |= (1 << j); j += 1 }
    out
  }

  def ops: Seq[Op] = Seq(

    Op("text_dedup_exact",
      "exact dedup by content hash (update/processor/MD5Signature.java); " +
        "hash-groupBy scales linearly — no pairwise compare",
      Some("""SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keeper
             |FROM documents GROUP BY h ORDER BY cnt DESC, h LIMIT 20""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
        .orderBy(col("cnt").desc, col("h"))
        .limit(20)),

    Op("text_dedup_ngram_jaccard",
      "exact near-dup pairs by word-3-gram Jaccard >= 0.6 via inverted " +
        "shingle join (the exact baseline the MinHash path approximates)",
      Some(jaccardOracle.replace("%THRESH%", "0.6")),
      (s, dir) => jaccardPairs(s, dir, 0.6)),

    Op("text_dedup_minhash_lsh",
      "MinHash(128) + LSH(32 bands x 4 rows) candidate generation, exact-" +
        "Jaccard verification of candidates only (MinHashQParserPlugin.java " +
        "semantics, banded for scale: P[miss | jac=0.8] < 1e-7, so verified " +
        "output equals the exact >= 0.6 pairs; oracle is the exact join)",
      Some(jaccardOracle.replace("%THRESH%", "0.6")),
      (s, dir) => {
        import s.implicits._
        val numPerm = 128
        val bands = 32
        val rows = numPerm / bands
        val sigUdf = udf((sh: Seq[String]) => minhashSig(sh, numPerm))
        val docs = shingleTable(s, dir).withColumn("sig", sigUdf(col("sh")))
        // band key = (band idx, hash of the band's rows); explode to buckets
        val bandUdf = udf((sig: Seq[Long]) =>
          (0 until bands).map(b => b.toLong << 56 |
            (mix64(sig.slice(b * rows, b * rows + rows).foldLeft(0L)((a, v) => mix64(a ^ v))) >>> 8)))
        val buckets = docs.select(col("doc_id"), col("sh"), explode(bandUdf(col("sig"))).as("bucket"))
        val cand = buckets.as("a").join(buckets.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
            col("a.sh").as("sha"), col("b.sh").as("shb"))
          .dropDuplicates("i", "j")
        val inter = size(array_intersect(col("sha"), col("shb")))
        cand
          .withColumn("jac", inter.cast("double") / (size(col("sha")) + size(col("shb")) - inter))
          .where(col("jac") >= 0.6)
          .select(col("i"), col("j"), col("jac"))
          .orderBy(col("i"), col("j"))
      }),

    Op("text_dedup_simhash",
      "SimHash-32 near-dup pairs (hamming <= 6) over word-3-gram shingles; " +
        "signature bits from md5 hex digits so the SQL oracle reproduces " +
        "them with pure integer math",
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
             |  FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
             |bits AS (
             |  SELECT doc_id, q.q * 4 + r.r AS j,
             |    sum(((strpos('0123456789abcdef', substr(md5(s), q.q + 1, 1)) - 1) >> r.r) & 1) * 2 - count(*) AS vote
             |  FROM sh,
             |    (SELECT unnest(generate_series(0, 7)) AS q) q,
             |    (SELECT unnest(generate_series(0, 3)) AS r) r
             |  GROUP BY doc_id, q.q, r.r),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh32
             |  FROM bits GROUP BY doc_id)
             |SELECT a.doc_id AS i, b.doc_id AS j, bit_count(xor(a.sh32, b.sh32)) AS dist
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sh32, b.sh32)) <= 6
             |ORDER BY i, j""".stripMargin),
      (s, dir) => {
        val shUdf = udf((sh: Seq[String]) => simhash32(sh).toLong & 0xffffffffL)
        val sig = shingleTable(s, dir).select(col("doc_id"), shUdf(col("sh")).as("sh32"))
        sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
            expr("bit_count(a.sh32 ^ b.sh32)").as("dist"))
          .where(col("dist") <= 6)
          .orderBy(col("i"), col("j"))
      }),

    Op("text_fingerprint",
      "document fingerprint: md5 of the sorted distinct token set " +
        "(update/processor/TextProfileSignature.java — order-insensitive " +
        "content signature)",
      Some("""SELECT doc_id,
             |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct
             |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin),
      (s, dir) => {
        val w = split(col("text"), " ")
        t(s, dir, "documents")
          .select(col("doc_id"),
            md5(concat_ws(" ", array_sort(array_distinct(w)))).as("fp"),
            size(array_distinct(w)).as("n_distinct"))
          .orderBy(col("doc_id"))
          .limit(100)
      }),

    Op("text_lang_id",
      "language-ID by marker-token counts with fixed tie-break order (the " +
        "n-gram-heuristic family; deterministic rule shared with the oracle)",
      Some("""WITH c AS (SELECT doc_id,
             |  len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','is','of','and'], x))) AS en,
             |  len(list_filter(string_split(text, ' '), x -> list_contains(['der','die','das','und','ist'], x))) AS de,
             |  len(list_filter(string_split(text, ' '), x -> list_contains(['le','les','est','et','dans'], x))) AS fr,
             |  len(list_filter(string_split(text, ' '), x -> list_contains(['el','los','las','es','y'], x))) AS es
             |FROM documents)
             |SELECT doc_id, en, de, fr, es,
             |  CASE WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
             |    WHEN en >= de AND en >= fr AND en >= es THEN 'en'
             |    WHEN de >= fr AND de >= es THEN 'de'
             |    WHEN fr >= es THEN 'fr' ELSE 'es' END AS pred
             |FROM c ORDER BY doc_id LIMIT 100""".stripMargin),
      (s, dir) => {
        val w = split(col("text"), " ")
        def cnt(markers: Seq[String]): Column =
          size(filter(w, x => array_contains(array(markers.map(lit): _*), x)))
        t(s, dir, "documents")
          .select(col("doc_id"),
            cnt(Seq("the", "a", "is", "of", "and")).as("en"),
            cnt(Seq("der", "die", "das", "und", "ist")).as("de"),
            cnt(Seq("le", "les", "est", "et", "dans")).as("fr"),
            cnt(Seq("el", "los", "las", "es", "y")).as("es"))
          .withColumn("pred",
            when(col("en") === 0 && col("de") === 0 && col("fr") === 0 && col("es") === 0, "und")
              .when(col("en") >= col("de") && col("en") >= col("fr") && col("en") >= col("es"), "en")
              .when(col("de") >= col("fr") && col("de") >= col("es"), "de")
              .when(col("fr") >= col("es"), "fr")
              .otherwise("es"))
          .orderBy(col("doc_id"))
          .limit(100)
      }),

    Op("text_quality",
      "quality scoring: token counts, avg token length, stopword ratio, " +
        "rule-based class (length/punct/stopword-ratio heuristics)",
      Some("""WITH f AS (SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
             |  list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS sum_len,
             |  len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','is','it','to'], x))) AS n_stop
             |FROM documents WHERE length(text) > 0)
             |SELECT doc_id, n_tokens, n_distinct,
             |  CAST(sum_len AS DOUBLE) / n_tokens AS avg_len,
             |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
             |  CASE WHEN n_tokens < 10 THEN 'short'
             |    WHEN CAST(n_distinct AS DOUBLE) / n_tokens < 0.5 THEN 'repetitive'
             |    ELSE 'ok' END AS quality
             |FROM f ORDER BY doc_id LIMIT 100""".stripMargin),
      (s, dir) => {
        val w = split(col("text"), " ")
        t(s, dir, "documents")
          .where(length(col("text")) > 0)
          .select(col("doc_id"),
            size(w).as("n_tokens"),
            size(array_distinct(w)).as("n_distinct"),
            aggregate(w, lit(0), (acc, x) => acc + length(x)).as("sum_len"),
            size(filter(w, x => array_contains(
              array(Seq("the", "a", "of", "and", "is", "it", "to").map(lit): _*), x))).as("n_stop"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            (col("sum_len").cast("double") / col("n_tokens")).as("avg_len"),
            (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
            when(col("n_tokens") < 10, "short")
              .when(col("n_distinct").cast("double") / col("n_tokens") < 0.5, "repetitive")
              .otherwise("ok").as("quality"))
          .orderBy(col("doc_id"))
          .limit(100)
      }),

    Op("text_token_count",
      "token counting: whitespace split vs word-regex extraction vs chars",
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_ws,
             |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re,
             |  length(text) AS n_chars
             |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_re"),
          length(col("text")).as("n_chars"))
        .orderBy(col("doc_id"))
        .limit(100)),

    Op("text_multimodal_stub",
      "multimodal plumbing: opaque binary payload column + deterministic " +
        "fake decode (real schema/partitioning/batching; decode itself is a " +
        "stub — media codecs are out of this container, SURVEY.md scope note)",
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             |  octet_length(encode(text)) % 7 AS frames,
             |  64 + octet_length(encode(text)) % 512 AS width,
             |  64 + (octet_length(encode(text)) * 3) % 512 AS height
             |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin),
      (s, dir) => {
        val payload = encode(col("text"), "utf-8") // the opaque binary column
        val nb = octet_length(payload)
        t(s, dir, "documents")
          .select(col("doc_id"), nb.as("n_bytes"),
            (nb % 7).as("frames"),
            (lit(64) + nb % 512).as("width"),
            (lit(64) + (nb * 3) % 512).as("height"))
          .orderBy(col("doc_id"))
          .limit(100)
      })
  )
}
