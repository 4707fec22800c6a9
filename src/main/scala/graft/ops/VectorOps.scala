package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Op.t

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label) — the Spark-first rendering of the reference's
  * dense-vector surface ({!knn} KnnQParser.java:41-42,123-164,
  * schema/DenseVectorField.java). Brute-force cosine top-k is the exact
  * baseline; the LSH-bucketed variant is the scale path (candidates from
  * sign-random-projection buckets, exact re-rank of candidates only).
  *
  * Float parity: elements are widened float->double inside the fold (exact),
  * dot/norm folds run left-to-right in both engines (Spark `aggregate` with
  * 0.0 init == DuckDB `list_reduce`), and the one inexact value (cosine) is
  * rounded to 4 dp on both sides.
  */
object VectorOps {

  /** Cosine in one tight pass. Semantically identical to the declarative
    * `aggregate(zip_with(...))` fold (left-to-right double accumulation, so
    * it matches DuckDB's `list_reduce` bit-for-bit) but ~100x faster than
    * interpreted higher-order-function lambdas on the O(n^2) pair joins. */
  private val cosUdf = udf((a: Seq[Float], b: Seq[Float]) => {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  })

  private def cosine(a: Column, b: Column): Column = cosUdf(a, b)

  /** Dev-probe / cross-module accessor (ProfileDedupLsh, MlEvalOps). */
  private[ops] def cosinePublic(a: Column, b: Column): Column = cosine(a, b)

  /** The DuckDB twin of [[cosinePublic]] for ops outside this object —
    * one definition so the bit-parity fold can never drift between
    * modules (review-pass finding). */
  private[ops] def duckCosPublic(a: String, b: String): String = duckCos(a, b)

  private val duckDot =
    "list_reduce(list_transform(generate_series(1, len(%A%)), i -> " +
      "CAST(%A%[i] AS DOUBLE) * CAST(%B%[i] AS DOUBLE)), (acc, v) -> acc + v)"

  private def duckCos(a: String, b: String): String = {
    def d(x: String, y: String) = duckDot.replace("%A%", x).replace("%B%", y)
    s"${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)}))"
  }

  def ops: Seq[Op] = Seq(

    Op("vec_ann_topk",
      "top-k nearest neighbours of a query vector by cosine — brute-force " +
        "exact baseline ({!knn} default topK=10, KnnQParser.java:41-42); at " +
        "scale the scan is partition-parallel with a TakeOrdered merge",
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT e.vec_id, round(${duckCos("e.embedding", "qe")}, 4) AS cos
              |FROM embeddings e, q WHERE e.vec_id <> 0
              |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      }),

    Op("vec_knn_join",
      "k-NN join: top-3 neighbours for each of several query vectors " +
        "(batched {!knn}; window per query id)",
      Some(s"""WITH c AS (
              |  SELECT a.vec_id AS qid, b.vec_id AS nid,
              |    round(${duckCos("a.embedding", "b.embedding")}, 4) AS cos
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id)
              |SELECT qid, nid, cos FROM (
              |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              |  FROM c) WHERE rn <= 3
              |ORDER BY qid, cos DESC, nid""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val cand = e.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            round(cosine(col("embedding"), col("qe")), 4).as("cos"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        cand.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("qid"), col("nid"), col("cos"))
          .orderBy(col("qid"), col("cos").desc, col("nid"))
      }),

    Op("vec_cosine_pairs",
      "embedding-cosine near-duplicate pairs (threshold 0.45) — the " +
        "embedding leg of the dedup suite; thresholded self-join, exact",
      Some(s"""SELECT a.vec_id AS i, b.vec_id AS j,
              |  round(${duckCos("a.embedding", "b.embedding")}, 4) AS cos
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE ${duckCos("a.embedding", "b.embedding")} >= 0.45
              |ORDER BY i, j""".stripMargin),
      (s, dir) =>
        cosinePairs(s, dir, 0.45)
          .select(col("i"), col("j"), round(col("c"), 4).as("cos"))
          .orderBy(col("i"), col("j"))),

    Op("vec_dedup_lsh",
      "embedding near-duplicate PAIRS via SRP-LSH bucketing — the " +
        "subquadratic scale path the exact op (vec_cosine_pairs) routes " +
        "large corpora to. Sign-random-projection signatures with DATA-" +
        "SCALED parameters: bits = clamp(log2(n/64), 4, 12) keeps bucket " +
        "population ~64, and tables = ln(0.05)/ln(1-p^bits) (p = the per-" +
        "bit collision probability of the WORST in-threshold pair) bounds " +
        "its miss at 5%; 500 test vectors -> 4 bits x 24 tables. " +
        "Candidate pairs = same-bucket self-join per table, EXACT cosine " +
        "verify >= 0.45, then distinct of the few survivors (verify-first: " +
        "the pre-verify distinct paid a full candidate-multiset shuffle to " +
        "save ~50% duplicate cosine evals — a bad trade, measured) — " +
        "precision 1.0 by construction, only recall approximate (OpsSpec " +
        "pins >= 0.9 vs the exact op). The bit cap means beyond ~260k " +
        "vectors bucket " +
        "population grows instead of table count — low-threshold " +
        "(theta ~ 63deg) pair mining is inherently table-hungry; extreme-" +
        "scale low-threshold dedup belongs to the shingle/minhash family. " +
        "Engine-only (approximate recall), no SQL oracle",
      None,
      (s, dir) => {
        // bits scale with corpus size so bucket population stays ~64 (the
        // doc'd log2(n/bucket) rule, applied rather than just stated);
        // floor 4 keeps the recall the OpsSpec gate pins at the small test
        // SFs. Tables then scale to PRESERVE recall as bits rise: a
        // threshold pair (cos >= 0.45, theta ~ 63deg) collides per bit
        // with p = 1 - theta/pi ~ 0.65, so L = ln(miss)/ln(1 - p^bits)
        // tables bound the miss probability at 5% for the WORST
        // in-threshold pair (SRP-LSH, Charikar STOC'02). At this LOW
        // threshold L grows ~ p^-bits ~ (n/64)^0.62 — LSH pair-mining near
        // theta ~ 63deg is inherently expensive — so bits cap at 12
        // (L <= 540; 11 bits gives 350): beyond ~260k vectors, bucket
        // population (not table count) absorbs further growth — each vector
        // fans out to L (table, sig) rows — and genuinely low-threshold pair
        // mining at extreme scale belongs to the shingle/minhash family
        // (text_dedup_*). At production dedup thresholds (tau ~ 0.9,
        // p ~ 0.86) the same bound gives L <= 64 out to billions of rows
        val nVecs = t(s, dir, "embeddings").count()
        val nBits = math.min(12, math.max(4,
          (math.log(math.max(1.0, nVecs / 64.0)) / math.log(2)).ceil.toInt))
        val pBit = 1.0 - math.acos(0.45) / math.Pi
        val nTables = math.max(24,
          (math.log(0.05) / math.log(1 - math.pow(pBit, nBits))).ceil.toInt)
        val dim = 64
        def mix(z0: Long): Long = {
          var z = z0 + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }
        val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, nBits, dim) { (l, b, d) =>
          mix(l * 15485863L + b * 32452843L + d * 49979687L).toDouble / Long.MaxValue
        }
        val bc = s.sparkContext.broadcast(planes)
        val sigsUdf = udf((v: Seq[Float]) => {
          val ps = bc.value
          val arr = v.toArray
          val n = math.min(dim, arr.length)
          (0 until nTables).map { l =>
            var sig = 0L // Long: bits are data-scaled (capped at 12 today,
            //              but 1L << b never silently wraps if the cap moves)
            var b = 0
            while (b < nBits) {
              val row = ps(l)(b)
              var acc = 0.0
              var d = 0
              while (d < n) { acc += row(d) * arr(d); d += 1 }
              if (acc > 0) sig |= (1L << b)
              b += 1
            }
            (l, sig)
          }
        })
        val e = t(s, dir, "embeddings")
        // signatures carry IDS ONLY through the L-way explode and the
        // bucket self-join — replicating the float vector into every
        // (table, sig) row and again into every candidate pair would make
        // shuffle volume vector-dominated (24x the embedding bytes); the
        // two vectors are joined back for exactly the deduped candidates,
        // the same id-then-rerank pattern as the int8/binary ANN tiers
        // localCheckpoint: the bucket SELF-join would otherwise execute the
        // signature UDF (L*bits*dim dots/row) twice, once per side; the
        // materialized table is (id, table, sig) — L skinny rows/vector
        // repartition by bucket key BEFORE the checkpoint: the small-SF
        // parquet is one file -> one partition, and since verify-first
        // removed the mid-plan dedup exchange, the whole downstream chain
        // (self-join probe + vector joins + cosine) would otherwise run in
        // that ONE task (measured: 15 s single-task vs 2.5 s spread). At
        // scale the same repartition is the shuffle the self-join needs
        // anyway; the rows are skinny (id, table, sig)
        val tabled = e
          .select(col("vec_id"), explode(sigsUdf(col("embedding"))).as("ts"))
          .select(col("vec_id"), col("ts._1").as("table"), col("ts._2").as("sig"))
          .repartition(s.sparkContext.defaultParallelism, col("table"), col("sig"))
          .localCheckpoint()
        val cand = tabled.as("a")
          .join(tabled.as("b"),
            col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
        // verify FIRST, distinct the SURVIVORS (r5, from the stage profile:
        // the raw candidate multiset is ~1.5x the distinct set, so a
        // pre-verify dropDuplicates paid a full-width shuffle of every
        // candidate — 1.6 s of the op's 4.3 s at sf0.1 — to save ~50%
        // duplicate cosine evals worth ~0.5 s. Verifying first keeps the
        // joins map-side (vector side broadcasts at small n, shuffles by id
        // at scale) and the distinct then touches only the >= threshold
        // survivors, orders of magnitude fewer rows; cosine is
        // deterministic per (i, j), so the result set is identical
        // (Catalyst pushes the >= 0.45 filter into the last broadcast
        // join's condition, evaluating the cosine UDF twice per candidate
        // — measured harmless: ~1.7M extra 64-dim folds, ~0.15 s, cheaper
        // than any fence that would block whole-stage fusion)
        cand
          .join(e.select(col("vec_id").as("i"), col("embedding").as("ea")), "i")
          .join(e.select(col("vec_id").as("j"), col("embedding").as("eb")), "j")
          .select(col("i"), col("j"), round(cosine(col("ea"), col("eb")), 4).as("cos"))
          .where(col("cos") >= 0.45)
          .dropDuplicates("i", "j")
          .orderBy(col("i"), col("j"))
      }),

    Op("vec_ann_lsh",
      "LSH-bucketed ANN: sign-random-projection, L=16 independent 8-bit " +
        "hash tables with hamming<=2 multi-probe on the query side, exact " +
        "cosine re-rank of the candidate union — the 100TB-scale path " +
        "where the O(n^2) pair join is infeasible (at that scale raise " +
        "nBits ~ log2(n/bucket) and drop probe radius). Recall@10 >= 0.9 " +
        "vs the exact op is pinned by OpsSpec. Engine-only (approximate), " +
        "no SQL oracle: the driver records a rows-only check",
      None,
      (s, dir) => {
        import s.implicits._
        val nBits = 8
        val nTables = 16
        val dim = 64
        // deterministic pseudo-gaussian-ish hyperplanes from splitmix64
        def mix(z0: Long): Long = {
          var z = z0 + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }
        val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, nBits, dim) { (l, b, d) =>
          mix(l * 7368787L + b * 1000003L + d).toDouble / Long.MaxValue
        }
        val bc = s.sparkContext.broadcast(planes)
        // per-vector signatures, one per table: (table, sig)
        val sigsUdf = udf((v: Seq[Float]) => {
          val ps = bc.value
          // one unboxing pass; the 16*8*64 inner loop then runs on a
          // primitive array (indexing the boxed Seq there was the whole
          // op's cost: 8192 boxed reads/row — measured 3.2s of the op's
          // 3.8s at 2k vectors)
          val arr = v.toArray
          val n = math.min(dim, arr.length)
          (0 until nTables).map { l =>
            var sig = 0
            var b = 0
            while (b < nBits) {
              val row = ps(l)(b)
              var acc = 0.0
              var d = 0
              while (d < n) { acc += row(d) * arr(d); d += 1 }
              if (acc > 0) sig |= (1 << b)
              b += 1
            }
            (l, sig)
          }
        })
        val e = t(s, dir, "embeddings")
        val tabled = e
          .select(col("vec_id"), col("embedding"), explode(sigsUdf(col("embedding"))).as("ts"))
          .select(col("vec_id"), col("embedding"),
            col("ts._1").as("table"), col("ts._2").as("sig"))
        // query side: every bucket within hamming<=2 of the query signature,
        // per table (1 + 8 + 28 = 37 probes/table — tiny, broadcastable)
        val probeUdf = udf((sig: Int) => {
          val out = Seq.newBuilder[Int]
          out += sig
          var a = 0
          while (a < nBits) {
            out += (sig ^ (1 << a))
            var b2 = a + 1
            while (b2 < nBits) { out += (sig ^ (1 << a) ^ (1 << b2)); b2 += 1 }
            a += 1
          }
          out.result()
        })
        val probes = tabled.where(col("vec_id") === 0)
          .select(col("table"), explode(probeUdf(col("sig"))).as("sig"),
            col("embedding").as("qe"))
        tabled.where(col("vec_id") =!= 0)
          .join(broadcast(probes), Seq("table", "sig"))
          .select(col("vec_id"), col("embedding"), col("qe"))
          .dropDuplicates("vec_id") // candidate union across tables/probes
          .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      }),

    Op("vec_ann_int8",
      "scalar-quantized ANN: L2-normalize, quantize each component to int8 " +
        "(round(x*127), the ScalarQuantizedDenseVectorField analogue — " +
        "solr/core/src/java/org/apache/solr/schema/" +
        "ScalarQuantizedDenseVectorField.java), select top-(4k) candidates " +
        "by integer dot product over the QUANTIZED tier only, then join " +
        "the 4k candidate ids back to the float tier for exact cosine " +
        "rerank. Memory math: 64-dim float32 = 256 B/vector; int8 = 64 B " +
        "(4x) — at 10^9 vectors the hot scan tier drops 256 GB -> 64 GB, " +
        "and the full-precision tier is touched for only 4k rows per " +
        "query. Candidate selection is a partition-parallel TakeOrdered; " +
        "recall@10 >= 0.95 vs the exact op is pinned by OpsSpec. " +
        "Engine-only (approximate), no SQL oracle",
      None,
      (s, dir) => int8TopK(s, dir, k = 10, over = 4)),

    Op("vec_ann_binary",
      "binary-quantized ANN: 1-bit sign quantization per component (the " +
        "BinaryQuantizedDenseVectorField analogue — solr/core/src/java/org/" +
        "apache/solr/schema/BinaryQuantizedDenseVectorField.java), packing " +
        "the 64-dim sign pattern into ONE int64 per vector; candidates are " +
        "the k*over lowest Hamming distances to the query bits (pure " +
        "codegen: bit_count(xor) — no UDF in the scan), then the candidate " +
        "ids join back to the float tier for exact cosine rerank. Memory " +
        "math: 64-dim float32 = 256 B/vector; 1 bit/dim = 8 B (32x) — at " +
        "10^9 vectors the hot tier drops 256 GB -> 8 GB, small enough to " +
        "stay RAM-resident per executor, and sign bits are scale-invariant " +
        "so no normalization pass is needed. At scale the bit tier is a " +
        "materialized sidecar column (like the index), not recomputed per " +
        "query. Candidate selection is a partition-parallel TakeOrdered; " +
        "recall@10 vs the exact op and the over=all identity are pinned by " +
        "OpsSpec. Engine-only (approximate), no SQL oracle",
      None,
      (s, dir) => binTopK(s, dir, k = 10, over = 8)),

    Op("vec_dedup_groups",
      "embedding near-duplicate GROUPS: connected components over the " +
        "exact cosine>=0.45 pair graph — the stage an embedding-dedup " +
        "pipeline needs after pair listing (pairs alone don't say which " +
        "vectors to drop), completing the embedding leg the way " +
        "text_dedup_groups completes the shingle leg. Components via the " +
        "shared pointer-jumping min-label loop (O(log diameter) rounds, " +
        "edge-linear per round); at scale the pair list comes from " +
        "vec_dedup_lsh instead of the exact O(n^2) op — same group stage " +
        "either way. Oracle = DuckDB recursive CTE over the same pair SQL",
      Some(s"""WITH RECURSIVE p AS (SELECT a.vec_id AS i, b.vec_id AS j
              |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |  WHERE ${duckCos("a.embedding", "b.embedding")} >= 0.45),
              |edges AS (SELECT i, j FROM p UNION ALL SELECT j AS i, i AS j FROM p),
              |reach(node, lab) AS (
              |  SELECT i, i FROM edges
              |  UNION
              |  SELECT e.i, r.lab FROM edges e JOIN reach r ON e.j = r.node),
              |labels AS (SELECT node, min(lab) AS grp FROM reach GROUP BY node)
              |SELECT grp, CAST(count(*) AS BIGINT) AS size,
              |  string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
              |FROM labels GROUP BY grp ORDER BY grp""".stripMargin),
      (s, dir) => {
        // same blocked exact gram as vec_cosine_pairs feeds the pair list;
        // the group stage itself is pair-bounded (tiny next to the corpus)
        val pairs = cosinePairs(s, dir, 0.45).select(col("i"), col("j"))
        val labels = TextOps.ccLabels(s, pairs)
        labels.groupBy(col("lab").as("grp"))
          .agg(count(lit(1)).as("size"),
            array_join(
              transform(sort_array(collect_list(col("node"))), _.cast("string")),
              ",").as("members"))
          .orderBy(col("grp"))
          .select(col("grp"), col("size"), col("members"))
      }),

    Op("vec_ann_hnsw",
      "HNSW ANN: per-partition navigable-small-world graphs (Malkov & " +
        "Yashunin 2016) with greedy upper-level descent + ef-bounded beam " +
        "search at level 0 — the Lucene per-segment HNSW analogue " +
        "(DenseVectorField's default knn algorithm; Lucene builds one HNSW " +
        "graph per segment and merges per-segment top-k, " +
        "solr/core/src/java/org/apache/solr/schema/DenseVectorField.java). " +
        "Each Spark partition is a 'segment': mapPartitions builds its " +
        "graph (deterministic splitmix-seeded level draws, M=8, " +
        "efConstruction=64), searches with efSearch=48, emits its top-k; " +
        "a TakeOrdered merge yields the global page — identical shape to " +
        "the engine's per-segment WAND + PQ merge. At 100TB the graph is " +
        "a materialized per-segment sidecar (built once at index time, " +
        "like postings), queries are one beam search per segment, " +
        "embarrassingly parallel, no shuffle except the k-row merge. " +
        "OpsSpec pins recall@10 >= 0.9 vs brute force and the large-ef " +
        "deterministic exactness. Engine-only (approximate), no SQL oracle",
      None,
      (s, dir) => hnswTopK(s, dir, k = 10, m = 8, efConstruction = 64, efSearch = 48)),

    Op("vec_ann_hnsw_batch",
      "BATCHED HNSW serving (VERDICT r4 task #7): one set of per-partition " +
        "graphs answers a whole query batch (8 queries here) — the Lucene " +
        "shape where the graph lives in the segment and repeated {!knn} " +
        "queries amortize construction. Build cost is >99% of a single " +
        "query's wall here, so a Q-query batch amortizes ~Q-fold " +
        "(measured in ProfileHnswBatch, recorded in BASELINE.md). " +
        "Per-query merge windows over the bounded beam pages only " +
        "(|batch| * ef * partitions rows), never the corpus. OpsSpec gates " +
        "batch-of-one == vec_ann_hnsw rank-identity; engine-only " +
        "(approximate), no SQL oracle",
      None,
      (s, dir) => hnswTopKBatch(s, dir, nQueries = 8, k = 10, m = 8,
        efConstruction = 64, efSearch = 48)),

    Op("vec_ann_ivf",
      "IVF ANN: deterministic k-means coarse quantizer (16 lists, trained " +
        "on a bounded driver-side sample, 8 Lloyd iterations on L2-" +
        "normalized vectors), one map pass builds the inverted lists, the " +
        "query probes its nprobe=8 closest lists and exact-reranks only " +
        "those candidates — the FAISS-style IVF-Flat scale path " +
        "complementing vec_ann_lsh (at 100TB: lists ~ sqrt(n), training " +
        "sample stays fixed-size, assignment is one map pass, the list " +
        "table is partitioned BY list id so a probe is a partition-pruned " +
        "scan touching nprobe/lists of the corpus). OpsSpec pins " +
        "nprobe=lists == brute-force rank-identity (end-to-end exactness) " +
        "and the partial-probe recall floor; NOTE the synthetic embeddings " +
        "are uniform on the sphere (no cluster structure), so partial-" +
        "probe recall ~= scan fraction here BY CONSTRUCTION — on real " +
        "clustered corpora (the 100TB case) nprobe << lists recovers " +
        "high recall, which is IVF's premise. Engine-only, no SQL oracle",
      None,
      (s, dir) => ivfTopK(s, dir, nLists = 16, nProbe = 8))
  )

  /** Exact cosine threshold pairs (i, j, c) — the blocked gram shared by
    * vec_cosine_pairs and vec_dedup_groups: vectors grouped into fixed-
    * size blocks, every block PAIR is one task computing its dense cosine
    * tile with primitive-array loops — same exact output as the r1
    * row-at-a-time pair join (31s at 2k vectors: BroadcastNestedLoop +
    * per-pair UDF overhead), but compute-bound and embarrassingly
    * parallel over block pairs. Exact threshold-pair LISTING is
    * inherently O(n^2) compute; beyond ~10^6 vectors route through the
    * LSH-bucketed op (vec_dedup_lsh) instead. */
  private def cosinePairs(s: SparkSession, dir: String, thr: Double): DataFrame = {
    import s.implicits._
    val blockSize = 256
    val e = t(s, dir, "embeddings")
    val blocks = e
      .select((col("vec_id") / blockSize).cast("int").as("blk"),
        col("vec_id"), col("embedding"))
      .groupBy(col("blk"))
      .agg(collect_list(struct(col("vec_id").as("_1"), col("embedding").as("_2"))).as("vs"))
    val tiles = blocks.as("a").join(blocks.as("b"), col("a.blk") <= col("b.blk"))
      .select(col("a.blk").as("ba"), col("b.blk").as("bb"),
        col("a.vs").as("va"), col("b.vs").as("vb"))
      .as[(Int, Int, Seq[(Long, Seq[Float])], Seq[(Long, Seq[Float])])]
    tiles.flatMap { case (ba, bb, va, vb) =>
      val as = va.sortBy(_._1).toArray
      val bs = vb.sortBy(_._1).toArray
      // hoist Seq->primitive-array conversion out of the O(|a|*|b|) loop
      val aIds = as.map(_._1); val aVecs = as.map(_._2.toArray)
      val bIds = bs.map(_._1); val bVecs = bs.map(_._2.toArray)
      val out = Seq.newBuilder[(Long, Long, Double)]
      var i = 0
      while (i < aIds.length) {
        val ia = aIds(i)
        val ea = aVecs(i)
        var j = if (ba == bb) i + 1 else 0
        while (j < bIds.length) {
          val jb = bIds(j)
          val eb = bVecs(j)
          // same fold as cosUdf: widen to double, index order (exact
          // parity with the DuckDB list_reduce oracle)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var d = 0
          val n = math.min(ea.length, eb.length)
          while (d < n) {
            val x = ea(d).toDouble; val y = eb(d).toDouble
            dot += x * y; na += x * x; nb += y * y
            d += 1
          }
          val c = dot / (math.sqrt(na) * math.sqrt(nb))
          if (c >= thr) out += ((ia, jb, c))
          j += 1
        }
        i += 1
      }
      out.result()
    }.toDF("i", "j", "c")
  }

  /** Int8 scalar-quantized top-k (see the `vec_ann_int8` op doc). Exposed
    * with explicit (k, over) so OpsSpec can gate recall and the over=all
    * identity. */
  def int8TopK(s: SparkSession, dir: String, k: Int, over: Int): DataFrame = {
    val e = t(s, dir, "embeddings")
    // int8 tier: normalize then round each component to [-127, 127]
    val quantUdf = udf((v: Seq[Float]) => {
      val a = l2norm(v.toArray.map(_.toDouble))
      val out = new Array[Byte](a.length)
      var i = 0
      while (i < a.length) {
        val q = math.round(a(i) * 127).toInt
        out(i) = math.max(-127, math.min(127, q)).toByte
        i += 1
      }
      out
    })
    // the candidate scan carries ONLY (vec_id, q8): at scale this is the
    // resident tier; float vectors are fetched afterwards for candidates
    val qz = e.select(col("vec_id"), quantUdf(col("embedding")).as("q8"))
    val qSide = qz.where(col("vec_id") === 0).select(col("q8").as("query8"))
    val dot8Udf = udf((a: Array[Byte], b: Array[Byte]) => {
      var acc = 0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    })
    val cand = qz.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(qSide))
      .select(col("vec_id"), dot8Udf(col("q8"), col("query8")).as("d8"))
      .orderBy(col("d8").desc, col("vec_id"))
      .limit(k * over)
    // exact rerank: only the k*over candidate ids touch the float tier
    val qe = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.join(broadcast(cand.select(col("vec_id"))), "vec_id")
      .crossJoin(broadcast(qe))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Binary-quantized top-k (see the `vec_ann_binary` op doc). Exposed with
    * explicit (k, over) so OpsSpec can gate recall and the over=all
    * identity. */
  def binTopK(s: SparkSession, dir: String, k: Int, over: Int): DataFrame = {
    val e = t(s, dir, "embeddings")
    // sign bits are invariant under positive scaling, so quantization needs
    // no L2 normalization; dims > 64 would shard into an array<long>
    val bitsUdf = udf((v: Seq[Float]) => {
      var bits = 0L
      val n = math.min(64, v.length)
      var i = 0
      while (i < n) { if (v(i) > 0) bits |= (1L << i); i += 1 }
      bits
    })
    val qz = e.select(col("vec_id"), bitsUdf(col("embedding")).as("b64"))
    val qSide = qz.where(col("vec_id") === 0).select(col("b64").as("qb"))
    // the candidate scan touches ONLY (vec_id, b64): 8 B/vector resident
    // tier, distance = popcount(xor) — whole-stage-codegen arithmetic
    val cand = qz.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(qSide))
      .select(col("vec_id"), expr("bit_count(b64 ^ qb)").as("ham"))
      .orderBy(col("ham").asc, col("vec_id"))
      .limit(k * over)
    // exact rerank: only the k*over candidate ids touch the float tier
    val qe = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.join(broadcast(cand.select(col("vec_id"))), "vec_id")
      .crossJoin(broadcast(qe))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** HNSW top-k (see the `vec_ann_hnsw` op doc). Exposed with explicit
    * (k, m, efConstruction, efSearch) so OpsSpec can gate recall and the
    * large-ef deterministic exactness. One graph per Spark partition
    * (= Lucene's one-graph-per-segment), merged by a global TakeOrdered —
    * each partition emits its full beam (ef-bounded), so the merge input
    * is ef * numPartitions rows regardless of corpus size. */
  def hnswTopK(s: SparkSession, dir: String, k: Int, m: Int,
               efConstruction: Int, efSearch: Int): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding")).as[Seq[Float]].collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"hnswTopK: no query vector (vec_id=0) in $dir/embeddings"))
    val corpus = e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    hnswPages(corpus, Array((0L, q.toArray)), m, efConstruction,
        ef = math.max(efSearch, k))
      .select(col("vec_id"), round(col("sim"), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** The per-partition HNSW graphs searched for a BATCH of queries: the
    * graph — the expensive part — is built once per partition and serves
    * every query in the batch (the Lucene shape: the graph lives in the
    * segment; queries are beam searches against it — VERDICT r4 task #7:
    * per-query build cost amortizes across the batch, measured >= Q-fold
    * for a Q-query batch since search is ~1% of build here). Emits the
    * full ef-bounded beam per (query, partition): merge input is
    * |queries| * ef * numPartitions rows regardless of corpus size.
    *
    * Queries are a tiny (qid, dim-sized floats) array captured by value
    * (the no-Broadcast-handle-in-hot-loop rule ivfTopK documents). */
  private def hnswPages(corpus: org.apache.spark.sql.Dataset[(Long, Seq[Float])],
      queries: Array[(Long, Array[Float])], m: Int, efConstruction: Int,
      ef: Int): DataFrame = {
    import corpus.sparkSession.implicits._
    corpus.mapPartitions { it =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val ids = rows.map(_._1)
        val raw = rows.map(_._2.toArray)
        val vecs = raw.map(v => l2norm(v.map(_.toDouble)))
        val g = new Hnsw(vecs, m, efConstruction)
        queries.iterator.flatMap { case (qid, qRaw) =>
          val qn = l2norm(qRaw.map(_.toDouble))
          // emit the ENTIRE beam (up to ef members), not a k-truncated
          // page: in-partition truncation would pick by raw double sim
          // while the global merge orders by round(cos, 4) with a vec_id
          // tiebreak — a 4-dp tie straddling the partition's k-boundary
          // could then keep the wrong id.
          g.search(qn, ef, ef).iterator.map { case (i, _) =>
            // the emitted value re-runs the EXACT one-pass fold
            // vec_ann_topk uses (raw floats widened to double, index
            // order) so the two ops can never disagree at a rounding
            // boundary; the graph's internal normalized-dot sims steer
            // the search only
            val a = raw(i)
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var d = 0
            val n = math.min(a.length, qRaw.length)
            while (d < n) {
              val x = a(d).toDouble; val y = qRaw(d).toDouble
              dot += x * y; na += x * x; nb += y * y
              d += 1
            }
            (qid, ids(i), dot / (math.sqrt(na) * math.sqrt(nb)))
          }
        }
      }
    }.toDF("qid", "vec_id", "sim")
  }

  /** Batched HNSW serving: top-k per query for `nQueries` query vectors
    * (vec_id < nQueries; corpus = the rest) against ONE set of partition
    * graphs. Exposed for OpsSpec (batch-of-one == hnswTopK identity) and
    * the amortization A/B (ProfileHnswBatch). */
  def hnswTopKBatch(s: SparkSession, dir: String, nQueries: Int, k: Int,
      m: Int, efConstruction: Int, efSearch: Int): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).map { case (id, v) => (id, v.toArray) }
    require(queries.length == nQueries,
      s"hnswTopKBatch: expected vec_ids 0..${nQueries - 1} as the query " +
        s"batch but found ${queries.length} of them in $dir/embeddings — " +
        "a sparse id range would silently serve fewer queries while still " +
        "carving the full range out of the corpus")
    val corpus = e.where(col("vec_id") >= nQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    val pages = hnswPages(corpus, queries, m, efConstruction,
      ef = math.max(efSearch, k))
    // per-query merge: the window partitions by qid over the bounded page
    // set (|queries| * ef * numPartitions rows), never the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    pages.select(col("qid"), col("vec_id"), round(col("sim"), 4).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF-Flat top-10 (see the `vec_ann_ivf` op doc). Exposed with explicit
    * (nLists, nProbe) so OpsSpec can gate the full-probe identity. */
  def ivfTopK(s: SparkSession, dir: String, nLists: Int, nProbe: Int): DataFrame = {
    import s.implicits._
    val iters = 8
    val e = t(s, dir, "embeddings")
    // bounded training sample (deterministic: ordered by vec_id) —
    // fixed-size regardless of corpus scale
    val sample: Array[Array[Double]] = e.where(col("vec_id") =!= 0)
      .orderBy(col("vec_id")).limit(4096)
      .select(col("embedding")).as[Seq[Float]].collect()
      .map(v => l2norm(v.toArray.map(_.toDouble)))
    // k-means on the unit sphere (cosine == dot after normalization):
    // init = evenly spaced sample picks, then Lloyd iterations; all
    // ties broken by index — fully deterministic
    var cents: Array[Array[Double]] =
      Array.tabulate(nLists)(i => sample((i.toLong * sample.length / nLists).toInt))
    for (_ <- 1 to iters) {
      val sums = Array.fill(nLists)(new Array[Double](cents(0).length))
      val counts = new Array[Int](nLists)
      sample.foreach { v =>
        val c = nearest(cents, v)
        counts(c) += 1
        val sm = sums(c)
        var i = 0
        while (i < v.length) { sm(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(nLists)(c =>
        if (counts(c) == 0) cents(c) else l2norm(sums(c)))
    }
    // capture the (tiny: 16 x dim doubles) centroid array itself, not a
    // broadcast handle — Broadcast.value is synchronized and a per-row
    // .value from N task threads convoys on that monitor (the same trap
    // IndexBuilder's pass B documents)
    val centsLocal = cents
    val assignUdf = udf((v: Seq[Float]) =>
      nearest(centsLocal, l2norm(v.toArray.map(_.toDouble))))
    val listed = e.select(col("vec_id"), col("embedding"),
      assignUdf(col("embedding")).as("list_id"))
    // query side: its nprobe closest centroids = the lists to scan
    val q = listed.where(col("vec_id") === 0)
      .select(col("embedding").as("qe")).as[Seq[Float]].head()
    val qn = l2norm(q.toArray.map(_.toDouble))
    val probeLists = cents.indices
      .sortBy(c => (-dot(cents(c), qn), c)).take(nProbe)
    listed.where(col("vec_id") =!= 0 && col("list_id").isin(probeLists: _*))
      .select(col("vec_id"),
        round(cosine(col("embedding"), typedLit(q)), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** Minimal deterministic HNSW (Malkov & Yashunin, TPAMI 2018; the
    * algorithm Lucene's HnswGraphBuilder implements — re-derived from the
    * paper, no Lucene code). Similarity = dot over L2-normalized vectors
    * (== cosine). Level draws come from splitmix64 of the insertion index,
    * so the graph — and therefore every search result — is bit-identical
    * across runs. Insertion uses the paper's Algorithm 1 with simple
    * closest-M neighbor selection; level-0 degree cap is 2M. */
  private final class Hnsw(vecs: Array[Array[Double]], m: Int, efC: Int) {
    private val n = vecs.length
    private val mL = 1.0 / math.log(m.toDouble)
    private val maxM0 = 2 * m
    private val levels = new Array[Int](n)
    // nbrs(node)(level) = neighbor ids at that level
    private val nbrs = new Array[Array[scala.collection.mutable.ArrayBuffer[Int]]](n)
    private var entry = -1
    private var maxLevel = -1

    { // deterministic levels, then sequential insert (order = array order)
      var i = 0
      while (i < n) {
        val u = (mix64(i.toLong * 2654435761L + 1) >>> 11).toDouble / (1L << 53).toDouble
        levels(i) = math.floor(-math.log(u + 1e-300) * mL).toInt
        nbrs(i) = Array.fill(levels(i) + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
        i += 1
      }
      i = 0
      while (i < n) { insert(i); i += 1 }
    }

    private def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    private def sim(a: Int, q: Array[Double]): Double = dot(vecs(a), q)

    /** Greedy hill-climb at `lev` toward q from `start`. */
    private def greedy(q: Array[Double], start: Int, lev: Int): Int = {
      var cur = start
      var curSim = sim(cur, q)
      var improved = true
      while (improved) {
        improved = false
        val ns = nbrs(cur)(lev)
        var i = 0
        while (i < ns.length) {
          val cand = ns(i)
          val d = sim(cand, q)
          if (d > curSim || (d == curSim && cand < cur)) {
            cur = cand; curSim = d; improved = true
          }
          i += 1
        }
      }
      cur
    }

    /** Beam search at `lev`: ef-bounded best-first expansion (Algorithm 2).
      * Returns (node, sim) sorted best-first, ties by lower id. */
    private def searchLayer(q: Array[Double], ep: Int, ef: Int, lev: Int): Array[(Int, Double)] = {
      val visited = new java.util.HashSet[Integer]()
      // candidates: max-heap by sim; results: min-heap bounded at ef
      val candOrd = Ordering.by[(Int, Double), (Double, Int)](t => (t._2, -t._1))
      val cand = scala.collection.mutable.PriorityQueue.empty[(Int, Double)](candOrd)
      val res = scala.collection.mutable.PriorityQueue.empty[(Int, Double)](candOrd.reverse)
      val s0 = sim(ep, q)
      visited.add(ep); cand.enqueue((ep, s0)); res.enqueue((ep, s0))
      while (cand.nonEmpty) {
        val (c, cSim) = cand.dequeue()
        if (cSim < res.head._2 && res.size >= ef) cand.clear()
        else {
          val ns = nbrs(c)(lev)
          var i = 0
          while (i < ns.length) {
            val e2 = ns(i)
            if (!visited.contains(e2)) {
              visited.add(e2)
              val d = sim(e2, q)
              if (res.size < ef || d > res.head._2) {
                cand.enqueue((e2, d))
                res.enqueue((e2, d))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      res.dequeueAll.toArray.sortBy(t => (-t._2, t._1))
    }

    private def insert(i: Int): Unit = {
      val lvl = levels(i)
      if (entry < 0) { entry = i; maxLevel = lvl; return }
      val q = vecs(i)
      var cur = entry
      var lev = maxLevel
      while (lev > lvl) { cur = greedy(q, cur, lev); lev -= 1 }
      lev = math.min(lvl, maxLevel)
      while (lev >= 0) {
        val found = searchLayer(q, cur, efC, lev)
        val cap = if (lev == 0) maxM0 else m
        val sel = found.iterator.filter(_._1 != i).take(m).toArray
        val mine = nbrs(i)(lev)
        sel.foreach { case (nb, _) =>
          mine += nb
          val theirs = nbrs(nb)(lev)
          theirs += i
          if (theirs.length > cap) {
            // prune to the cap closest (same closest-M rule as selection)
            val kept = theirs.toArray
              .map(x => (x, sim(x, vecs(nb))))
              .sortBy(t => (-t._2, t._1))
              .take(cap).map(_._1)
            theirs.clear(); theirs ++= kept
          }
        }
        if (found.nonEmpty) cur = found(0)._1
        lev -= 1
      }
      if (lvl > maxLevel) { entry = i; maxLevel = lvl }
    }

    /** Top-k by cosine: greedy descent to level 1, ef-beam at level 0. */
    def search(q: Array[Double], ef: Int, k: Int): Array[(Int, Double)] = {
      if (entry < 0) return Array.empty
      var cur = entry
      var lev = maxLevel
      while (lev > 0) { cur = greedy(q, cur, lev); lev -= 1 }
      searchLayer(q, cur, ef, 0).take(k)
    }

    /** Size of the level-0 component reachable from the entry point (BFS
      * over level-0 edges). The degree-cap prune in insert() keeps the cap
      * CLOSEST neighbors one-sidedly, so a node could in principle lose its
      * last in-edge and fall out of every search; the large-ef == brute
      * force exactness claim silently depends on this never happening.
      * OpsSpec gates reachable == n on the fixed datasets so a data or
      * parameter change that ever introduces a disconnection fails loudly
      * (ADVICE r4 #1). */
    def level0Reachable: Int = {
      if (entry < 0) return 0
      val seen = new java.util.BitSet(n)
      var stack = entry :: Nil
      seen.set(entry)
      var cnt = 0
      while (stack.nonEmpty) {
        val c = stack.head; stack = stack.tail; cnt += 1
        val ns = nbrs(c)(0)
        var i = 0
        while (i < ns.length) {
          val x = ns(i)
          if (!seen.get(x)) { seen.set(x); stack = x :: stack }
          i += 1
        }
      }
      cnt
    }
  }

  /** Test support: per-partition (level-0-reachable, total) node counts of
    * the exact graphs hnswTopK builds — see Hnsw.level0Reachable. */
  private[graft] def hnswReachability(s: SparkSession, dir: String, m: Int,
      efConstruction: Int): Array[(Int, Int)] = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val vecs = rows.map(r => l2norm(r._2.toArray.map(_.toDouble)))
          val g = new Hnsw(vecs, m, efConstruction)
          Iterator.single((g.level0Reachable, rows.length))
        }
      }.collect()
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def l2norm(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v))
    if (n == 0) v else v.map(_ / n)
  }

  /** Index of the max-dot (nearest on the sphere) centroid; ties -> lowest. */
  private def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val d = dot(cents(c), v)
      if (d > bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}
