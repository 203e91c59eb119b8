package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Multimodal, Similarity, TextDedup, TextStats}

/** LLM-training-data pipeline surface: deduplication (exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding cosine), similarity
  * search (brute-force + SRP-LSH ANN), text analysis (stats, lang-ID,
  * token counts, fingerprints) and multimodal binary plumbing — the
  * north-star extensions of SURVEY.md §2.7.
  *
  * Oracle parity notes: ratios are raw doubles from identical integer
  * divisions (never rounded); cosine values round to 6dp because
  * cross-engine summation order differs by ulps; SimHash token hashes
  * derive from md5 hex so DuckDB reproduces them exactly.
  */
object LlmOps extends QModule {

  override def queries: Seq[Q] = Seq(
    d40DedupExact, d41JaccardPairs, d42MinHash, d43SimHash, d44SimHashPairs,
    d45EmbNearDup, d46SimHashBanded, d47DupClusters, d50CanonicalDocs,
    s46CosineTopK, s47AnnLsh,
    s48CosineExpr,
    t48TextStats, t49LangId, t50TokenCount, t51Fingerprint, t52Redact,
    t56TopTerms, t57CorpusMix,
    m52Multimodal, m53ImageDecode, m54AudioDecode, m55PngDecode, m56JpegDecode,
    m69Jp2Decode, m70J2kLossy, m71J2kStyled,
    m57FlacDecode, m58VideoFrames, m59Mp3Meta, m60ImageDhash, m61JpegExif,
    m62ImageDupClusters, m63AudioFpDedup, d63SoftDedupWeights, m64SceneCuts,
    m65ThumbnailPixels, s58MarginMining,
    t111StratifiedSample, t112LineRepetition, t115PassageWindows,
    d64JwLinkage, m66VadSegments, m67ZcrFrames, s59DiversityTopK,
    m68VadChunks, d65KmvOverlap)

  import QTables.{docs, emb}

  /** Exact dedup via content hash. */
  val d40DedupExact = Q(
    "d40_dedup_exact",
    (s, dir) => TextDedup.exact(docs(s, dir)).orderBy(col("text_hash")),
    Some("""SELECT md5(text) AS text_hash, count(*) AS n_copies,
            min(doc_id) AS keeper_id
            FROM documents GROUP BY md5(text) ORDER BY text_hash"""),
    headline = true)

  /** Exact pairwise n-gram Jaccard (relational shingle self-join). */
  val d41JaccardPairs = Q(
    "d41_ngram_jaccard_pairs",
    (s, dir) => TextDedup.exactJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 300), minJaccard = 0.05)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(200),
    Some("""WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                       FROM documents WHERE doc_id < 300),
            sh AS (SELECT doc_id,
                     unnest(list_distinct(list_transform(range(len(ws) - 2),
                       i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) AS shingle
                   FROM d WHERE len(ws) >= 3),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
            SELECT doc_a, doc_b, inter, sa.n AS size_a, sb.n AS size_b,
                   CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
            FROM it JOIN sz sa ON it.doc_a = sa.doc_id
                    JOIN sz sb ON it.doc_b = sb.doc_id
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.05
            ORDER BY jaccard DESC, doc_a, doc_b
            LIMIT 200"""))

  /** MinHash+LSH near-dup pipeline. The md5-derived 56-bit double-
    * hashing family lets the oracle replay signatures, banding, and
    * exact-Jaccard verification verbatim in SQL. Skew handling runs
    * in AUTO (`hotBucketThreshold = -1`): the bucket-stats pass
    * derives the threshold and arms the salted group-pair path only
    * when a bucket actually overflows it — on this corpus the plan
    * stays the single-join form, and the hash proves the result is
    * path-independent.
    */
  val d42MinHash = Q(
    "d42_minhash_lsh_neardup",
    (s, dir) => TextDedup.minHashNearDups(docs(s, dir), minJaccard = 0.2,
        hotBucketThreshold = -1)
      .orderBy(col("doc_a"), col("doc_b")),
    Some("""WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                       FROM documents),
            sets AS (SELECT doc_id, list_distinct(list_transform(range(len(ws) - 2),
                       i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS sh
                     FROM d WHERE len(ws) >= 3),
            sh AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),
            h AS (SELECT doc_id,
                    CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT)
                      % 2147483647 AS x
                  FROM sh),
            consts AS (SELECT k,
                    1 + CAST('0x' || substr(md5('mha:' || k), 1, 14) AS BIGINT)
                      % 2147483646 AS a,
                    CAST('0x' || substr(md5('mhb:' || k), 1, 14) AS BIGINT)
                      % 2147483647 AS b
                  FROM range(64) r(k)),
            slots AS (SELECT doc_id, k, min((a * x + b) % 2147483647) AS slot
                      FROM h, consts GROUP BY doc_id, k),
            bands AS (SELECT doc_id, k // 4 AS band,
                        string_agg(CAST(slot AS VARCHAR), ',' ORDER BY k) AS bucket
                      FROM slots GROUP BY doc_id, k // 4),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
            v AS (SELECT doc_a, doc_b,
                    len(list_intersect(sa.sh, sb.sh)) AS inter,
                    len(sa.sh) AS na, len(sb.sh) AS nb
                  FROM cand JOIN sets sa ON cand.doc_a = sa.doc_id
                            JOIN sets sb ON cand.doc_b = sb.doc_id)
            SELECT doc_a, doc_b,
                   CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
            FROM v WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.2
            ORDER BY doc_a, doc_b"""),
    headline = true)

  /** 60-bit SimHash fingerprints (md5-derived token hashes). */
  val d43SimHash = Q(
    "d43_simhash",
    (s, dir) => TextDedup.simHash(docs(s, dir).filter(col("doc_id") < 300))
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS w
                       FROM documents WHERE doc_id < 300),
            h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM t),
            bits AS (SELECT doc_id, k,
                       sum(CASE WHEN (h // CAST(pow(2, k) AS BIGINT)) % 2 = 1
                                THEN 1 ELSE -1 END) AS vote
                     FROM h, range(60) r(k) GROUP BY doc_id, k)
            SELECT doc_id,
                   CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, k) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id ORDER BY doc_id"""))

  /** SimHash near-dup pairs by Hamming distance. */
  val d44SimHashPairs = Q(
    "d44_simhash_pairs",
    (s, dir) => {
      val sh = TextDedup.simHash(docs(s, dir).filter(col("doc_id") < 300))
      sh.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b")),
          col("doc_a") < col("doc_b"))
        .withColumn("hamming", TextDedup.hammingDistance(col("sh_a"), col("sh_b")))
        .filter(col("hamming") <= 14)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS w
                       FROM documents WHERE doc_id < 300),
            h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM t),
            bits AS (SELECT doc_id, k,
                       sum(CASE WHEN (h // CAST(pow(2, k) AS BIGINT)) % 2 = 1
                                THEN 1 ELSE -1 END) AS vote
                     FROM h, range(60) r(k) GROUP BY doc_id, k),
            f AS (SELECT doc_id,
                    CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, k) AS BIGINT)
                                  ELSE 0 END) AS BIGINT) AS simhash
                  FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM f a JOIN f b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 14
            ORDER BY doc_a, doc_b"""))

  /** Banded SimHash near-dup over the FULL table — the corpus-scale
    * pigeonhole path (exact by construction; the oracle replays the
    * band arithmetic and candidate join verbatim).
    */
  val d46SimHashBanded = Q(
    "d46_simhash_banded",
    (s, dir) => TextDedup.simHashNearDups(docs(s, dir), maxDist = 3)
      .orderBy(col("doc_a"), col("doc_b")),
    Some("""WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS w
                       FROM documents),
            h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM t),
            bits AS (SELECT doc_id, k,
                       sum(CASE WHEN (h // CAST(pow(2, k) AS BIGINT)) % 2 = 1
                                THEN 1 ELSE -1 END) AS vote
                     FROM h, range(60) r(k) GROUP BY doc_id, k),
            f AS (SELECT doc_id,
                    CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, k) AS BIGINT)
                                  ELSE 0 END) AS BIGINT) AS simhash
                  FROM bits GROUP BY doc_id),
            banded AS (SELECT doc_id, simhash, b.b AS band,
                         (simhash // CAST(pow(2, 15 * b.b) AS BIGINT)) % 32768 AS key
                       FROM f, range(4) b(b)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.simhash AS sh_a, b.simhash AS sh_b
                     FROM banded a JOIN banded b
                       ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
            SELECT doc_a, doc_b,
                   CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
            FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
            ORDER BY doc_a, doc_b"""))

  /** Dedup clustering: connected components over the banded-SimHash
    * pair graph (alternating large-star/small-star), every doc labeled
    * with its component's minimum id + component size. The oracle
    * computes the same components by recursive transitive closure.
    */
  val d47DupClusters = Q(
    "d47_dup_clusters",
    (s, dir) => {
      val d = docs(s, dir)
      val pairs = TextDedup.simHashNearDups(d, maxDist = 3)
      val cc = TextDedup.connectedComponents(pairs, d.select("doc_id"))
      cc.withColumn("cluster_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster_id"))))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE
            t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS w FROM documents),
            h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM t),
            bits AS (SELECT doc_id, k,
                       sum(CASE WHEN (h // CAST(pow(2, k) AS BIGINT)) % 2 = 1
                                THEN 1 ELSE -1 END) AS vote
                     FROM h, range(60) r(k) GROUP BY doc_id, k),
            f AS (SELECT doc_id,
                    CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, k) AS BIGINT)
                                  ELSE 0 END) AS BIGINT) AS simhash
                  FROM bits GROUP BY doc_id),
            banded AS (SELECT doc_id, simhash, b.b AS band,
                         (simhash // CAST(pow(2, 15 * b.b) AS BIGINT)) % 32768 AS key
                       FROM f, range(4) b(b)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM banded a JOIN banded b
                       ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
            pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
                      JOIN f fa ON c.doc_a = fa.doc_id
                      JOIN f fb ON c.doc_b = fb.doc_id
                      WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3),
            edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach AS (
              SELECT u AS a, v AS b FROM edges
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
            ),
            lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
                    FROM reach GROUP BY a)
            SELECT d.doc_id,
                   COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
                   CAST(count(*) OVER (
                     PARTITION BY COALESCE(l.cluster_id, d.doc_id)) AS BIGINT)
                     AS cluster_size
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
            ORDER BY d.doc_id"""))

  /** Canonical dedup selection — the kept-corpus deliverable: d47's
    * clusters reduced to one representative each (max n_chars, lowest
    * doc_id on ties), every doc labeled keep/drop. The oracle chains
    * the same recursive-CTE connected components with the two-step
    * argmax (per-cluster max, min id among maxima), matching the
    * operator's two map-side-combinable aggregations.
    */
  val d50CanonicalDocs = Q(
    "d50_canonical_docs",
    (s, dir) => TextDedup.canonicalDocs(docs(s, dir), maxDist = 3)
      .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE
            t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS w FROM documents),
            h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM t),
            bits AS (SELECT doc_id, k,
                       sum(CASE WHEN (h // CAST(pow(2, k) AS BIGINT)) % 2 = 1
                                THEN 1 ELSE -1 END) AS vote
                     FROM h, range(60) r(k) GROUP BY doc_id, k),
            f AS (SELECT doc_id,
                    CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, k) AS BIGINT)
                                  ELSE 0 END) AS BIGINT) AS simhash
                  FROM bits GROUP BY doc_id),
            banded AS (SELECT doc_id, simhash, b.b AS band,
                         (simhash // CAST(pow(2, 15 * b.b) AS BIGINT)) % 32768 AS key
                       FROM f, range(4) b(b)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM banded a JOIN banded b
                       ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
            pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
                      JOIN f fa ON c.doc_a = fa.doc_id
                      JOIN f fb ON c.doc_b = fb.doc_id
                      WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3),
            edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach AS (
              SELECT u AS a, v AS b FROM edges
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
            ),
            lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
                    FROM reach GROUP BY a),
            cl AS (SELECT d.doc_id,
                     COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
                     CAST(d.n_chars AS BIGINT) AS n_chars
                   FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
            mx AS (SELECT cluster_id, max(n_chars) AS mc FROM cl GROUP BY cluster_id),
            rep AS (SELECT cl.cluster_id, min(cl.doc_id) AS canonical_id
                    FROM cl JOIN mx ON cl.cluster_id = mx.cluster_id
                         AND cl.n_chars = mx.mc
                    GROUP BY cl.cluster_id)
            SELECT cl.doc_id, cl.cluster_id, rep.canonical_id,
                   cl.doc_id = rep.canonical_id AS keep
            FROM cl JOIN rep ON cl.cluster_id = rep.cluster_id
            ORDER BY cl.doc_id"""))

  /** Soft dedup ([[TextDedup.softDedupWeights]]): d47's clusters
    * converted to per-doc 1/|cluster| sampling weights in exact micro
    * units plus the document's effective (weighted) token mass — the
    * DCLM-style down-weighting alternative to d50's hard drop. The
    * oracle chains the same recursive-CTE components with both
    * floor-division weight columns.
    */
  val d63SoftDedupWeights = Q(
    "d63_softdedup_weights",
    (s, dir) => TextDedup.softDedupWeights(docs(s, dir))
      .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE
            t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS w FROM documents),
            h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM t),
            bits AS (SELECT doc_id, k,
                       sum(CASE WHEN (h // CAST(pow(2, k) AS BIGINT)) % 2 = 1
                                THEN 1 ELSE -1 END) AS vote
                     FROM h, range(60) r(k) GROUP BY doc_id, k),
            f AS (SELECT doc_id,
                    CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, k) AS BIGINT)
                                  ELSE 0 END) AS BIGINT) AS simhash
                  FROM bits GROUP BY doc_id),
            banded AS (SELECT doc_id, simhash, b.b AS band,
                         (simhash // CAST(pow(2, 15 * b.b) AS BIGINT)) % 32768 AS key
                       FROM f, range(4) b(b)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM banded a JOIN banded b
                       ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
            pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
                      JOIN f fa ON c.doc_a = fa.doc_id
                      JOIN f fb ON c.doc_b = fb.doc_id
                      WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3),
            edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach AS (
              SELECT u AS a, v AS b FROM edges
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
            ),
            lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
                    FROM reach GROUP BY a),
            cl AS (SELECT d.doc_id,
                     COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
                     CAST(len(list_filter(string_split(d.text, ' '),
                       x -> x <> '')) AS BIGINT) AS n_tokens
                   FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
            sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                   FROM cl GROUP BY cluster_id)
            SELECT cl.doc_id, cl.cluster_id, sz.cluster_size, cl.n_tokens,
                   1000000 // sz.cluster_size AS weight_micro,
                   (cl.n_tokens * 1000000) // sz.cluster_size AS weighted_tokens_micro
            FROM cl JOIN sz ON cl.cluster_id = sz.cluster_id
            ORDER BY cl.doc_id"""))

  /** Embedding-cosine near-dup pairs via the SRP-bucketed scale path
    * (candidates from 24 two-plane LSH tables, exact-cosine verify) —
    * oracle-checked against the brute-force all-pairs SQL, which the
    * bucketed form reproduces at recall ≈ 1 on the gate slice.
    */
  val d45EmbNearDup = Q(
    "d45_embedding_neardup",
    // explicit loose-threshold parameterization: 0.35 carries little
    // angular signal, so recall needs few planes and many tables (the
    // defaults are sized for real dedup thresholds >= 0.8)
    (s, dir) => Similarity.nearDupPairsBucketed(
        emb(s, dir).filter(col("id") < 300), 0.35, numPlanes = 2, numTables = 24)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings WHERE vec_id < 300),
            x AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                    list_sum(list_transform(range(64), i -> a.e[i+1] * b.e[i+1])) AS dot,
                    sqrt(list_sum(list_transform(range(64), i -> a.e[i+1] * a.e[i+1]))) AS na,
                    sqrt(list_sum(list_transform(range(64), i -> b.e[i+1] * b.e[i+1]))) AS nb
                  FROM v a JOIN v b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, round(dot / (na * nb), 6) AS cos
            FROM x WHERE round(dot / (na * nb), 6) >= 0.35
            ORDER BY id_a, id_b"""))

  /** Brute-force cosine top-k for 5 query vectors. */
  val s46CosineTopK = Q(
    "s46_cosine_topk",
    (s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e.filter(col("id") < 5), e, 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
            x AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    round(list_sum(list_transform(range(64), i -> q.e[i+1] * c.e[i+1]))
                      / (sqrt(list_sum(list_transform(range(64), i -> q.e[i+1] * q.e[i+1])))
                       * sqrt(list_sum(list_transform(range(64), i -> c.e[i+1] * c.e[i+1])))),
                      6) AS cos
                  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
            r AS (SELECT query_id, neighbor_id, cos,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id ASC) AS rank
                  FROM x)
            SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
            FROM r WHERE rank <= 5
            ORDER BY query_id, rank"""),
    headline = true)

  /** Diversity-capped retrieval ([[Similarity.diversityTopK]]): at
    * most 2 hits per embedding label (the source/domain proxy) before
    * the global top-8 — the SERP/RAG diversification contract. The
    * oracle replays the cosine matrix and BOTH rank filters under the
    * same (cos desc, id) order; a cap applied after instead of before
    * the global top-k hash-mismatches.
    */
  val s59DiversityTopK = Q(
    "s59_diversity_topk",
    (s, dir) => {
      val raw = graft.Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.asDouble(col("embedding")).as("vec"), col("label"))
      Similarity.diversityTopK(raw.filter(col("id") < 3),
          raw.filter(col("id") >= 3), "label", k = 8, perGroup = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH v AS (SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings),
            x AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                    CAST(c.label AS BIGINT) AS grp,
                    round(list_sum(list_transform(range(64), i -> q.e[i+1] * c.e[i+1]))
                      / (sqrt(list_sum(list_transform(range(64), i -> q.e[i+1] * q.e[i+1])))
                       * sqrt(list_sum(list_transform(range(64), i -> c.e[i+1] * c.e[i+1])))),
                      6) AS cos
                  FROM v q JOIN v c ON q.vec_id < 3 AND c.vec_id >= 3),
            g AS (SELECT *, row_number() OVER (PARTITION BY query_id, grp
                    ORDER BY cos DESC, doc_id ASC) AS gr FROM x),
            r AS (SELECT query_id, doc_id, grp, cos,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, doc_id ASC) AS rank
                  FROM g WHERE gr <= 2)
            SELECT query_id, CAST(rank AS INT) AS rank, doc_id, grp, cos
            FROM r WHERE rank <= 8
            ORDER BY query_id, rank"""))

  /** Margin-based match mining ([[Similarity.marginMining]]): the
    * LASER/CCMatrix ratio criterion over a 40-query / 300-candidate
    * split. The oracle replays the cosine matrix, both top-4 means
    * (explicit left-to-right sums, exact /4), the margin division,
    * and the per-query argmax — a hub-normalization slip anywhere
    * hash-mismatches.
    */
  val s58MarginMining = Q(
    "s58_margin_mining",
    (s, dir) => {
      val e = emb(s, dir)
      Similarity.marginMining(e.filter(col("id") < 40),
          e.filter(col("id") >= 40 && col("id") < 340))
        .orderBy(col("query_id"))
    },
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
            x AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                    round(list_sum(list_transform(range(64), i -> q.e[i+1] * c.e[i+1]))
                      / (sqrt(list_sum(list_transform(range(64), i -> q.e[i+1] * q.e[i+1])))
                       * sqrt(list_sum(list_transform(range(64), i -> c.e[i+1] * c.e[i+1])))),
                      6) AS cos
                  FROM v q JOIN v c ON q.vec_id < 40
                       AND c.vec_id >= 40 AND c.vec_id < 340),
            qa AS (SELECT query_id, (l[1] + l[2] + l[3] + l[4]) / 4 AS qavg
                   FROM (SELECT query_id,
                           list_reverse(list_sort(list(cos)))[1:4] AS l
                         FROM x GROUP BY query_id)),
            ca AS (SELECT cand_id, (l[1] + l[2] + l[3] + l[4]) / 4 AS cavg
                   FROM (SELECT cand_id,
                           list_reverse(list_sort(list(cos)))[1:4] AS l
                         FROM x GROUP BY cand_id)),
            m AS (SELECT x.query_id, x.cand_id, x.cos,
                    CASE WHEN (qa.qavg + ca.cavg) / 2 > 0
                         THEN round(x.cos / ((qa.qavg + ca.cavg) / 2), 6)
                         ELSE 0.0 END AS margin
                  FROM x JOIN qa ON x.query_id = qa.query_id
                         JOIN ca ON x.cand_id = ca.cand_id),
            r AS (SELECT query_id, cand_id, cos, margin,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY margin DESC, cand_id ASC) AS rn
                  FROM m)
            SELECT query_id, cand_id AS best_id, cos, margin,
                   margin >= 1.02 AS accepted
            FROM r WHERE rn = 1
            ORDER BY query_id"""))

  /** SRP-LSH bucketed ANN. Hyperplane components derive from md5
    * digests, so the oracle regenerates the same planes, buckets, and
    * ranking in SQL.
    */
  val s47AnnLsh = Q(
    "s47_ann_lsh",
    (s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e.filter(col("id") < 20), e, dim = 64, k = 5, numPlanes = 6)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
            pl AS (SELECT j, list_transform(range(64), i ->
                     (CAST('0x' || substr(md5('plane' || j || ':' || i), 1, 14) AS BIGINT)
                        % 1000000) / 1000000.0 - 0.5) AS p
                   FROM range(6) t(j)),
            b AS (SELECT vec_id,
                    CAST(sum(CASE WHEN list_sum(list_transform(range(64), i -> e[i+1] * p[i+1])) > 0
                             THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
                  FROM v, pl GROUP BY vec_id),
            x AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    round(list_sum(list_transform(range(64), i -> q.e[i+1] * c.e[i+1]))
                      / (sqrt(list_sum(list_transform(range(64), i -> q.e[i+1] * q.e[i+1])))
                       * sqrt(list_sum(list_transform(range(64), i -> c.e[i+1] * c.e[i+1])))),
                      6) AS cos
                  FROM v q JOIN b qb ON q.vec_id = qb.vec_id
                       JOIN b cb ON qb.bucket = cb.bucket
                       JOIN v c ON c.vec_id = cb.vec_id AND c.vec_id <> q.vec_id
                  WHERE q.vec_id < 20),
            r AS (SELECT query_id, neighbor_id, cos,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id ASC) AS rank
                  FROM x)
            SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
            FROM r WHERE rank <= 5
            ORDER BY query_id, rank"""))

  /** The native codegen'd Catalyst expression
    * (org.apache.spark.sql.graftext.CosineSimilarity) in a relational
    * plan: pairwise similarity matrix of a vector slice, fused into
    * whole-stage codegen — oracle-checked against DuckDB list math.
    */
  val s48CosineExpr = Q(
    "s48_cosine_native_expr",
    (s, dir) => {
      val e = emb(s, dir).filter(col("id") < 60)
      val a = e.select(col("id").as("id_a"), col("vec").as("va"))
      val b = e.select(col("id").as("id_b"), col("vec").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(org.apache.spark.sql.graftext.CosineSimilarity
            .cosineSimilarity(col("va"), col("vb")), 6).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings WHERE vec_id < 60)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_sum(list_transform(range(64), i -> a.e[i+1] * b.e[i+1]))
                / (sqrt(list_sum(list_transform(range(64), i -> a.e[i+1] * a.e[i+1])))
                 * sqrt(list_sum(list_transform(range(64), i -> b.e[i+1] * b.e[i+1])))),
                6) AS cos
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            ORDER BY id_a, id_b"""))

  /** Per-document text statistics + quality score. */
  val t48TextStats = Q(
    "t48_text_stats",
    (s, dir) => TextStats.stats(docs(s, dir)).orderBy(col("doc_id")),
    Some("""SELECT doc_id,
            CAST(len(ws) AS INT) AS n_words,
            CAST(len(list_distinct(ws)) AS INT) AS n_distinct,
            CAST(list_sum(list_transform(ws, w -> length(w))) AS INT) AS sum_word_len,
            CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws) AS avg_word_len,
            CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr,
            (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
              * (CAST(least(len(ws), 100) AS DOUBLE) / 100.0) AS quality_score
            FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                  FROM documents) d
            ORDER BY doc_id"""))

  /** Heuristic language ID: confusion matrix actual × predicted. */
  val t49LangId = Q(
    "t49_lang_id",
    (s, dir) => TextStats.langId(docs(s, dir))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted_lang")),
    Some("""WITH sc AS (
              SELECT lang,
                len(list_filter(ws, x -> list_contains(['der','die','und','das','ist','nicht'], x))) AS s_de,
                len(list_filter(ws, x -> list_contains(['the','of','and','to','in','is'], x))) AS s_en,
                len(list_filter(ws, x -> list_contains(['el','la','de','que','y','los'], x))) AS s_es,
                len(list_filter(ws, x -> list_contains(['le','la','de','et','les','des'], x))) AS s_fr,
                len(list_filter(ws, x -> list_contains(['de5','shi4','le5','zai4','wo3','you3'], x))) AS s_zh
              FROM (SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents) d),
            p AS (SELECT lang,
                    CASE WHEN s_de = m AND m > 0 THEN 'de'
                         WHEN s_en = m AND m > 0 THEN 'en'
                         WHEN s_es = m AND m > 0 THEN 'es'
                         WHEN s_fr = m AND m > 0 THEN 'fr'
                         WHEN s_zh = m AND m > 0 THEN 'zh'
                         ELSE 'und' END AS predicted_lang
                  FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m FROM sc) x)
            SELECT lang, predicted_lang, count(*) AS n
            FROM p GROUP BY lang, predicted_lang
            ORDER BY lang, predicted_lang"""))

  /** Token counting (whitespace + BPE-ish regex) per source. */
  val t50TokenCount = Q(
    "t50_token_count",
    (s, dir) => TextStats.tokenCounts(docs(s, dir))
      .join(docs(s, dir).select(col("doc_id"), col("source"), col("n_chars")), "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("re_tokens")).as("total_re_tokens"),
        sum(col("n_chars")).as("total_chars"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source")),
    Some("""SELECT source,
            CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS total_ws_tokens,
            CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0))) AS BIGINT) AS total_re_tokens,
            CAST(sum(n_chars) AS BIGINT) AS total_chars,
            count(*) AS n_docs
            FROM documents GROUP BY source ORDER BY source"""))

  /** Bag-of-words fingerprint clusters per language. */
  val t51Fingerprint = Q(
    "t51_fingerprint",
    (s, dir) => docs(s, dir)
      .select(col("lang"), TextStats.fingerprint(col("text")).as("fp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct_fp"))
      .orderBy(col("lang")),
    Some("""SELECT lang, count(*) AS n_docs,
            count(DISTINCT md5(array_to_string(list_sort(list_distinct(
              list_filter(string_split(text, ' '), x -> x <> ''))), ' '))) AS n_distinct_fp
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** PII redaction over synthetically injected emails/phones (the
    * corpus itself is clean, so both sides plant the same PII first);
    * patterns live in the Java-regex/RE2 common subset.
    */
  val t52Redact = Q(
    "t52_redact_pii",
    (s, dir) => {
      val withPii = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-0"), lpad(col("doc_id") % 1000, 3, "0"),
          lit(" now")).as("text"))
      TextStats.redactPii(withPii)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("redacted")).as("red_len"), md5(col("redacted")).as("red_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH p AS (SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com or 555-0'
                      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' now' AS text
               FROM documents),
            r AS (SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
                 CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
                 regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
               FROM p)
            SELECT doc_id, n_emails, n_phones,
                   CAST(length(redacted) AS INT) AS red_len,
                   md5(redacted) AS red_hash
            FROM r ORDER BY doc_id"""))

  /** Corpus vocabulary profile: exact top-50 terms by occurrence with
    * document frequency — the vocabulary-analysis pass run before
    * tokenizer training / stopword selection. One explode + one
    * map-side-combinable groupBy on the term (high-cardinality key),
    * then TakeOrdered over the (distinct-term-bounded) counts — no
    * sketch needed because the aggregate output is vocabulary-sized,
    * not corpus-sized, at any scale. Total (count desc, term asc)
    * order makes the top-50 cut deterministic.
    */
  val t56TopTerms = Q(
    "t56_top_terms",
    (s, dir) => {
      import graft.ops.TextDedup
      docs(s, dir)
        .select(col("doc_id"), explode(TextDedup.words(col("text"))).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("w"))
        .limit(50)
    },
    Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                       FROM documents),
            f AS (SELECT w, count(*) AS n_occurrences,
                    count(DISTINCT doc_id) AS n_docs
                  FROM t WHERE w <> '' GROUP BY w)
            SELECT w, n_occurrences, n_docs FROM f
            ORDER BY n_occurrences DESC, w LIMIT 50"""))

  /** Corpus composition (data-mixture) report: per (lang, source)
    * document, token and char totals plus each cell's share of corpus
    * tokens — the report that drives mixture weighting when
    * assembling a training set. One map-side-combinable groupBy over
    * group-count-bounded output; the corpus total rides in on a
    * 1-row broadcast cross join. Shares are one double division of
    * exact integer sums, so they hash-match across engines.
    */
  val t57CorpusMix = Q(
    "t57_corpus_mix",
    (s, dir) => {
      import graft.ops.TextDedup
      val g = docs(s, dir)
        .select(col("lang"), col("source"),
          coalesce(size(TextDedup.words(col("text"))), lit(0)).as("toks"),
          col("n_chars"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          sum(col("n_chars")).as("total_chars"))
      val tot = g.agg(sum(col("n_tokens")).as("tot"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
          col("total_chars"),
          (col("n_tokens").cast("double") / col("tot")).as("token_share"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH g AS (SELECT lang, source, count(*) AS n_docs,
                  CAST(sum(COALESCE(len(list_filter(string_split(text, ' '),
                    w -> w <> '')), 0)) AS BIGINT) AS n_tokens,
                  CAST(sum(n_chars) AS BIGINT) AS total_chars
                FROM documents GROUP BY lang, source),
            t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM g)
            SELECT lang, source, n_docs, n_tokens, total_chars,
                   CAST(n_tokens AS DOUBLE) / tot AS token_share
            FROM g, t ORDER BY lang, source"""))

  /** Multimodal decode-stub kernel over binary payloads: the JVM
    * mapPartitions path, oracle-checked against hex arithmetic on the
    * same md5-derived bytes.
    */
  val m52Multimodal = Q(
    "m52_multimodal_features",
    (s, dir) => Multimodal.extractFeatures(s,
        Multimodal.syntheticMedia(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""SELECT doc_id, 16 AS n_bytes,
            CAST(list_sum(bytes) AS BIGINT) AS byte_sum,
            CAST(list_aggregate(bytes, 'max') AS INT) AS byte_max,
            CAST(list_sum(bytes) AS DOUBLE) / 16 AS mean_byte
            FROM (SELECT doc_id, list_transform(range(16),
                    i -> CAST('0x' || substr(md5(text), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
                  FROM documents WHERE doc_id < 200) x
            ORDER BY doc_id"""))

  /** REAL image decode in the gate: per-doc P6 PPM blobs (closed-form
    * pixels) decoded by the actual netpbm parser, per-channel means
    * replayed arithmetically by the oracle.
    */
  val m53ImageDecode = Q(
    "m53_image_decode_features",
    (s, dir) => Multimodal.extractImageFeatures(s,
        Multimodal.syntheticPpm(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""SELECT doc_id, CAST(6 AS INT) AS width, CAST(4 AS INT) AS height,
            CAST(3 AS INT) AS channels,
            CAST(list_sum(list_transform(range(24),
              i -> (doc_id * 37 + (3 * i + 0) * 11) % 256)) AS DOUBLE) / 24 AS mean_c0,
            CAST(list_sum(list_transform(range(24),
              i -> (doc_id * 37 + (3 * i + 1) * 11) % 256)) AS DOUBLE) / 24 AS mean_c1,
            CAST(list_sum(list_transform(range(24),
              i -> (doc_id * 37 + (3 * i + 2) * 11) % 256)) AS DOUBLE) / 24 AS mean_c2
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL PNG decode in the gate: per-doc PNG blobs (encoded AND
    * decoded through javax.imageio on executors) carry the same
    * closed-form pixels as m53's PPMs; PNG is lossless, so the same
    * oracle arithmetic replays the per-channel means exactly.
    */
  val m55PngDecode = Q(
    "m55_png_decode_features",
    (s, dir) => Multimodal.extractImageFeatures(s,
        Multimodal.syntheticPng(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""SELECT doc_id, CAST(6 AS INT) AS width, CAST(4 AS INT) AS height,
            CAST(3 AS INT) AS channels,
            CAST(list_sum(list_transform(range(24),
              i -> (doc_id * 37 + (3 * i + 0) * 11) % 256)) AS DOUBLE) / 24 AS mean_c0,
            CAST(list_sum(list_transform(range(24),
              i -> (doc_id * 37 + (3 * i + 1) * 11) % 256)) AS DOUBLE) / 24 AS mean_c1,
            CAST(list_sum(list_transform(range(24),
              i -> (doc_id * 37 + (3 * i + 2) * 11) % 256)) AS DOUBLE) / 24 AS mean_c2
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL JPEG 2000 decode in the gate: per-doc 11×7 grayscale
    * codestreams (reversible 5/3 + MQ-coded EBCOT, encoded at
    * runtime by the JVM T.800 encoder) feature-extract distributed,
    * and — because the codec is LOSSLESS — the oracle replays the
    * closed-form pixel mean EXACTLY, unlike m56's bounded JPEG
    * verdict. Any drift in the MQ coder, Tier-1 passes, tag-tree
    * headers or 5/3 lifting hash-mismatches.
    */
  val m69Jp2Decode = Q(
    "m69_jp2_decode_features",
    (s, dir) => Multimodal.extractImageFeatures(s,
        Multimodal.syntheticJp2(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""SELECT doc_id, CAST(11 AS INT) AS width, CAST(7 AS INT) AS height,
            CAST(1 AS INT) AS channels,
            CAST(list_sum(list_transform(range(77),
              i -> (doc_id * 37 + i * 13) % 256)) AS DOUBLE) / 77 AS mean_c0,
            CAST(-1.0 AS DOUBLE) AS mean_c1,
            CAST(-1.0 AS DOUBLE) AS mean_c2
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL STYLED JPEG 2000 decode in the gate: the m69 codestreams
    * re-encoded at runtime with the vertically stripe-CAUSAL context
    * style plus per-cleanup-pass SEGMENTATION SYMBOLS (code-block
    * style 0x28) — the decoder must clip context formation at stripe
    * boundaries and verify every 1010 symbol, and because the codec
    * stays LOSSLESS the oracle replays the closed-form mean exactly.
    * Any drift in the causal neighborhood rule or the segsym
    * check hash-mismatches against the m69 arithmetic.
    */
  val m71J2kStyled = Q(
    "m71_j2k_styled_features",
    (s, dir) => Multimodal.extractImageFeatures(s,
        Multimodal.syntheticJp2Styled(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""SELECT doc_id, CAST(11 AS INT) AS width, CAST(7 AS INT) AS height,
            CAST(1 AS INT) AS channels,
            CAST(list_sum(list_transform(range(77),
              i -> (doc_id * 37 + i * 13) % 256)) AS DOUBLE) / 77 AS mean_c0,
            CAST(-1.0 AS DOUBLE) AS mean_c1,
            CAST(-1.0 AS DOUBLE) AS mean_c2
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL LOSSY JPEG 2000 decode in the gate: per-doc irreversible
    * 9/7 codestreams (dead-zone quantized at step 1, encoded at
    * runtime by the JVM T.800 encoder — the DICOM .4.91 shape)
    * feature-extract distributed. Container facts are exact; the
    * decoded mean takes m56's bounded-error verdict (smooth ramp
    * content, step-1 quantizer → within ±2 levels of the closed-form
    * mean). Exact bit-parity of the lossy path is pinned separately
    * by Jpeg2kSpec against the independent Python decoder's
    * committed reconstructions.
    */
  val m70J2kLossy = Q(
    "m70_j2k_lossy_features",
    (s, dir) => {
      val exp = (col("doc_id") * 37 % 128 + 30).cast("double")
      Multimodal.extractImageFeatures(s,
          Multimodal.syntheticJp2Lossy(docs(s, dir).filter(col("doc_id") < 200)))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          exp.as("exp_mean"),
          (abs(col("mean_c0") - exp) <= 2.0).as("mean_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(11 AS INT) AS width, CAST(7 AS INT) AS height,
            CAST(1 AS INT) AS channels,
            CAST((doc_id * 37) % 128 + 30 AS DOUBLE) AS exp_mean,
            true AS mean_ok
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL (lossy) JPEG decode in the gate. Decoded pixels aren't
    * bit-reproducible by a SQL engine, so — like q13 — the gate row
    * asserts what the codec GUARANTEES: both engines compute the
    * closed-form block means, and the Spark side additionally checks
    * its real decode lands within ±4 levels (DC quantization error is
    * ≤ ~2 at quality 0.95 on MCU-aligned uniform blocks).
    */
  val m56JpegDecode = Q(
    "m56_jpeg_decode_features",
    (s, dir) => {
      val exp = (0 until 4).map(b => (col("doc_id") * 37 + b * 29) % 256)
        .reduce(_ + _).cast("double") / 4.0
      Multimodal.extractImageFeatures(s,
          Multimodal.syntheticJpeg(docs(s, dir).filter(col("doc_id") < 200)))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          exp.as("exp_mean"),
          (abs(col("mean_c0") - exp) <= 4.0).as("mean_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
            CAST(1 AS INT) AS channels,
            CAST((doc_id * 37) % 256 + (doc_id * 37 + 29) % 256
               + (doc_id * 37 + 58) % 256 + (doc_id * 37 + 87) % 256 AS DOUBLE) / 4
              AS exp_mean,
            true AS mean_ok
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL video frame-sampling in the gate: per-doc MJPEG-in-AVI
    * payloads parsed by the RIFF walker, every 2nd frame JPEG-decoded;
    * container facts (dims, frame counts) are exact and the sampled
    * first-frame mean takes m56's lossy bounded-error verdict.
    */
  val m58VideoFrames = Q(
    "m58_video_frame_features",
    (s, dir) => {
      val exp = (0 until 4).map(b => (col("doc_id") * 37 + b * 29) % 256)
        .reduce(_ + _).cast("double") / 4.0
      Multimodal.extractVideoFeatures(s,
          Multimodal.syntheticAvi(docs(s, dir).filter(col("doc_id") < 200), nFrames = 5),
          stride = 2)
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_frames"), col("n_sampled"),
          exp.as("exp_mean"),
          (abs(col("mean_f0") - exp) <= 4.0).as("mean_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
            CAST(5 AS INT) AS n_frames, CAST(3 AS INT) AS n_sampled,
            CAST((doc_id * 37) % 256 + (doc_id * 37 + 29) % 256
               + (doc_id * 37 + 58) % 256 + (doc_id * 37 + 87) % 256 AS DOUBLE) / 4
              AS exp_mean,
            true AS mean_ok
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL scene-cut detection in the gate ([[Multimodal.sceneCuts]]):
    * per-doc MJPEG AVIs with a PLANTED cut at frame id mod 3 + 1
    * ([[graft.ops.Avi.encodeSyntheticMjpegCut]] — smooth +11/frame
    * luma ramp, +100 jump at the cut, values never wrap), every frame
    * decoded and the exact-integer luma-sum differencer applied at a
    * 50-level threshold. JPEG decode noise (±8 on a frame diff) sits
    * 4× under the smooth/cut margin on BOTH sides, so the detector
    * must find exactly the planted cut — the oracle states it in
    * closed form.
    */
  val m64SceneCuts = Q(
    "m64_video_scene_cuts",
    (s, dir) => {
      val expCut = (col("doc_id") % 3 + 1).cast("int")
      Multimodal.sceneCuts(s,
          Multimodal.syntheticAviCut(docs(s, dir).filter(col("doc_id") < 200),
            nFrames = 5))
        .toDF()
        .select(col("doc_id"), col("n_frames"), col("n_cuts"), col("first_cut"),
          expCut.as("exp_cut"),
          (col("n_cuts") === 1 && col("first_cut") === expCut).as("cut_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(5 AS INT) AS n_frames, CAST(1 AS INT) AS n_cuts,
            CAST(doc_id % 3 + 1 AS INT) AS first_cut,
            CAST(doc_id % 3 + 1 AS INT) AS exp_cut,
            true AS cut_ok
            FROM documents WHERE doc_id < 200
            ORDER BY doc_id"""))

  /** REAL resize in the gate ([[Multimodal.thumbnailPixels]]): 6×4
    * RGB PPMs box-filtered to 3×2, EVERY output pixel emitted and
    * pinned — the box filter is exact integer floor-division means
    * (2×2 boxes here), so the oracle replays each of the 18 output
    * bytes per image in closed form from the generator formula.
    */
  val m65ThumbnailPixels = Q(
    "m65_thumbnail_pixels",
    (s, dir) => Multimodal.thumbnailPixels(s,
        Multimodal.syntheticPpm(docs(s, dir).filter(col("doc_id") < 200)),
        tw = 3, th = 2)
      .toDF().orderBy(col("doc_id"), col("ty"), col("tx"), col("c")),
    Some("""SELECT doc_id, CAST(ty.ty AS INT) AS ty, CAST(tx.tx AS INT) AS tx,
                   CAST(c.c AS INT) AS c,
                   CAST((
                     (doc_id*37 + (((2*ty.ty  )*6 + 2*tx.tx  )*3 + c.c)*11) % 256 +
                     (doc_id*37 + (((2*ty.ty  )*6 + 2*tx.tx+1)*3 + c.c)*11) % 256 +
                     (doc_id*37 + (((2*ty.ty+1)*6 + 2*tx.tx  )*3 + c.c)*11) % 256 +
                     (doc_id*37 + (((2*ty.ty+1)*6 + 2*tx.tx+1)*3 + c.c)*11) % 256
                   ) // 4 AS INT) AS v
            FROM documents, range(2) ty(ty), range(3) tx(tx), range(3) c(c)
            WHERE doc_id < 200
            ORDER BY doc_id, ty, tx, c"""))

  /** REAL audio decode in the gate: per-doc PCM-16 WAV blobs decoded
    * by the actual RIFF/WAVE parser; sum-of-squares stays an exact
    * integer so the oracle is bit-identical.
    */
  val m54AudioDecode = Q(
    "m54_audio_decode_features",
    (s, dir) => Multimodal.extractAudioFeatures(s,
        Multimodal.syntheticWav(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""WITH s AS (SELECT doc_id, (doc_id * 13 + i.i * 7) % 65536 - 32768 AS v
                       FROM documents, range(64) i(i) WHERE doc_id < 200)
            SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
                   CAST(64 AS INT) AS n_samples,
                   CAST(sum(v * v) AS DOUBLE) AS sum_sq,
                   CAST(max(abs(v)) AS INT) AS peak
            FROM s GROUP BY doc_id ORDER BY doc_id"""))

  /** REAL FLAC decode in the gate: per-doc single-frame FLAC streams
    * built by the pure-JVM encoder (header + CRC-8/16 + verbatim
    * subframes) and decoded by the full [[graft.ops.Flac]] decoder;
    * the sample formula matches m54's so the oracle is identical in
    * shape.
    */
  val m57FlacDecode = Q(
    "m57_flac_decode_features",
    (s, dir) => Multimodal.extractAudioFeatures(s,
        Multimodal.syntheticFlac(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""WITH s AS (SELECT doc_id, (doc_id * 13 + i.i * 7) % 65536 - 32768 AS v
                       FROM documents, range(64) i(i) WHERE doc_id < 200)
            SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
                   CAST(64 AS INT) AS n_samples,
                   CAST(sum(v * v) AS DOUBLE) AS sum_sq,
                   CAST(max(abs(v)) AS INT) AS peak
            FROM s GROUP BY doc_id ORDER BY doc_id"""))

  /** REAL MP3 frame walk in the gate: per-doc ID3v2 + MPEG-1 Layer
    * III silence-frame streams (CBR/VBR, mono/stereo, padded and
    * CRC-protected variants all on the path) parsed by the strict
    * [[graft.ops.Mp3]] walker; every output is a closed-form integer
    * fact the oracle replays (duration is one identical IEEE
    * division). PCM decode stays scope-frozen — metadata is the
    * surface a corpus filter actually keys on.
    */
  val m59Mp3Meta = Q(
    "m59_mp3_frame_meta",
    (s, dir) => Multimodal.extractMp3Meta(s,
        Multimodal.syntheticMp3(docs(s, dir).filter(col("doc_id") < 200)))
      .toDF().orderBy(col("doc_id")),
    Some("""WITH f AS (SELECT doc_id, 3 + doc_id % 4 AS n_frames,
                  list_transform(range(CAST(3 + doc_id % 4 AS INT)),
                    f -> CASE WHEN doc_id % 3 = 0 THEN 128
                         ELSE [64, 80, 96][CAST((doc_id + f) % 3 AS INT) + 1] END) AS brs
                FROM documents WHERE doc_id < 200)
            SELECT doc_id, CAST(44100 AS INT) AS sample_rate,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS channels,
                   CAST(n_frames AS INT) AS n_frames,
                   CAST(n_frames * 1152 AS BIGINT) AS n_samples,
                   CAST(n_frames * 1152 * 1000 AS DOUBLE) / 44100 AS duration_ms,
                   CAST(list_aggregate(brs, 'min') AS INT) AS bitrate_min_kbps,
                   CAST(list_aggregate(brs, 'max') AS INT) AS bitrate_max_kbps,
                   list_aggregate(brs, 'min') <> list_aggregate(brs, 'max') AS vbr,
                   doc_id % 5 = 0 AS has_crc
            FROM f ORDER BY doc_id"""))

  /** Perceptual image near-dup: REAL PPM decode → [[graft.ops.ImageDedup.dHash]]
    * (integer-exact 9×8 difference hash) → banded Hamming self-join
    * (4×16-bit bands, popcount verify; recall exact for radius 3 by
    * pigeonhole). The fixture's cell-constant 36×32 images make the
    * whole pipeline — luma, area-average, comparisons, banding —
    * replayable in closed form; the oracle recomputes every hash bit
    * and the full Hamming-≤-3 pair set, so a resize-box slip, a luma
    * weight error, or a band-recall gap all hash-mismatch.
    */
  val m60ImageDhash = Q(
    "m60_image_dhash_neardup",
    (s, dir) => {
      import graft.ops.ImageDedup
      val h = ImageDedup.hashes(s,
        Multimodal.syntheticPpmCells(docs(s, dir).filter(col("doc_id") < 200)))
      ImageDedup.nearDupPairs(h, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"),
          ImageDedup.hashHex(col("hash_a")).as("hash_a"),
          ImageDedup.hashHex(col("hash_b")).as("hash_b"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH cells AS (
              SELECT doc_id, r.i // 9 AS cr, r.i % 9 AS cc,
                     ((doc_id % 40) * 31 + (r.i % 9) * 7 + (r.i // 9) * 13) % 200
                       + CASE WHEN r.i % 9 = doc_id // 40 AND r.i // 9 = doc_id // 40
                              THEN 50 ELSE 0 END AS v
              FROM documents, range(72) r(i) WHERE doc_id < 200),
            bits AS (
              SELECT a.doc_id, a.cr * 8 + a.cc AS bit_i,
                     CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
              FROM cells a JOIN cells b
                ON a.doc_id = b.doc_id AND a.cr = b.cr AND b.cc = a.cc + 1
              WHERE a.cc < 8),
            hex AS (
              SELECT doc_id, printf('%08x%08x',
                CAST(sum(CASE WHEN bit_i >= 32
                  THEN CAST(bit AS BIGINT) << (bit_i - 32) ELSE 0 END) AS BIGINT),
                CAST(sum(CASE WHEN bit_i < 32
                  THEN CAST(bit AS BIGINT) << bit_i ELSE 0 END) AS BIGINT)) AS hx
              FROM bits GROUP BY doc_id),
            pairs AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                     CAST(sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INT) AS hamming
              FROM bits x JOIN bits y ON x.bit_i = y.bit_i AND x.doc_id < y.doc_id
              GROUP BY 1, 2
              HAVING sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= 3)
            SELECT p.doc_a, p.doc_b, p.hamming, ha.hx AS hash_a, hb.hx AS hash_b
            FROM pairs p
            JOIN hex ha ON ha.doc_id = p.doc_a
            JOIN hex hb ON hb.doc_id = p.doc_b
            ORDER BY doc_a, doc_b"""))

  /** JPEG EXIF metadata walk ([[graft.ops.Exif]]): real imageio-
    * encoded JPEGs are stamped with an Exif APP1 (TIFF IFD0 + Exif
    * sub-IFD; even ids little-endian, odd big-endian, ASCII values
    * both inline and heap-offset, RATIONAL/SHORT/LONG types all on
    * the path) and re-parsed by the segment walker — which stops at
    * SOS, never touching entropy-coded data. Every output is a
    * closed-form fact the oracle replays, so an endianness slip, an
    * offset-vs-inline confusion, or a sub-IFD pointer bug all
    * hash-mismatch.
    */
  val m61JpegExif = Q(
    "m61_jpeg_exif_meta",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Exif
      val stamped = Multimodal.syntheticJpeg(docs(s, dir).filter(col("doc_id") < 200))
        .as[(Long, Array[Byte])]
        .map { case (id, jpeg) =>
          val m = Exif.ExifMeta(
            make = "Cam" + (id % 5), model = "Mod" + (id % 3),
            orientation = (id % 8 + 1).toInt,
            date_time = f"2026:08:${id % 28 + 1}%02d 12:00:00",
            exposure_num = 1, exposure_den = 50 + id % 200,
            fnumber_num = 28 + id % 50, fnumber_den = 10,
            iso = (100 + (id % 8) * 50).toInt,
            focal_num = 50 * (1 + id % 4), focal_den = 1,
            pixel_x = 16, pixel_y = 16)
          (id, Exif.stampJpeg(jpeg, m, littleEndian = id % 2 == 0))
        }.toDF("doc_id", "media")
      Exif.extract(s, stamped)
        .map { case (id, m) => (id, m.make, m.model, m.orientation, m.date_time,
          m.exposure_den, m.fnumber_num, m.iso, m.focal_num, m.pixel_x, m.pixel_y) }
        .toDF("doc_id", "make", "model", "orientation", "date_time",
          "exposure_den", "fnumber_x10", "iso", "focal_mm", "pixel_x", "pixel_y")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
            'Cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
            'Mod' || CAST(doc_id % 3 AS VARCHAR) AS model,
            CAST(doc_id % 8 + 1 AS INT) AS orientation,
            '2026:08:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
              || ' 12:00:00' AS date_time,
            CAST(50 + doc_id % 200 AS BIGINT) AS exposure_den,
            CAST(28 + doc_id % 50 AS BIGINT) AS fnumber_x10,
            CAST(100 + (doc_id % 8) * 50 AS INT) AS iso,
            CAST(50 * (1 + doc_id % 4) AS BIGINT) AS focal_mm,
            CAST(16 AS BIGINT) AS pixel_x, CAST(16 AS BIGINT) AS pixel_y
            FROM documents WHERE doc_id < 200 ORDER BY doc_id"""))

  /** Image duplicate clusters: m60's banded-Hamming pair graph fed
    * through the SAME two-stage union-find every text dedup cluster
    * uses ([[graft.ops.TextDedup.connectedComponents]]) — one CC
    * implementation serves text and image modalities. The fixture
    * graph is dense (planted variants plus cross-group hash
    * coincidences), so this also exercises CC well away from the
    * sparse text regime. Oracle: the m60 bit replay chained into a
    * recursive-CTE transitive closure with min-label components.
    */
  val m62ImageDupClusters = Q(
    "m62_image_dup_clusters",
    (s, dir) => {
      import graft.ops.ImageDedup
      val h = ImageDedup.hashes(s,
        Multimodal.syntheticPpmCells(docs(s, dir).filter(col("doc_id") < 200)))
      // the production path: exact-collapse identical hashes first —
      // provably the same partition as the direct pair graph (spec-
      // pinned in ImageDedupSpec), so the direct-CC oracle still holds
      ImageDedup.dupClusters(h, maxHamming = 3)
        .select(col("doc_id"), col("cluster_id"))
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id")))
          .cast("bigint"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE
            cells AS (
              SELECT doc_id, r.i // 9 AS cr, r.i % 9 AS cc,
                     ((doc_id % 40) * 31 + (r.i % 9) * 7 + (r.i // 9) * 13) % 200
                       + CASE WHEN r.i % 9 = doc_id // 40 AND r.i // 9 = doc_id // 40
                              THEN 50 ELSE 0 END AS v
              FROM documents, range(72) r(i) WHERE doc_id < 200),
            bits AS (
              SELECT a.doc_id, a.cr * 8 + a.cc AS bit_i,
                     CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
              FROM cells a JOIN cells b
                ON a.doc_id = b.doc_id AND a.cr = b.cr AND b.cc = a.cc + 1
              WHERE a.cc < 8),
            pairs AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
              FROM bits x JOIN bits y ON x.bit_i = y.bit_i AND x.doc_id < y.doc_id
              GROUP BY 1, 2
              HAVING sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= 3),
            edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach AS (
              SELECT u AS a, v AS b FROM edges
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
            ),
            lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
                    FROM reach GROUP BY a)
            SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
                   CAST(count(*) OVER (
                     PARTITION BY COALESCE(l.cluster_id, d.doc_id)) AS BIGINT)
                     AS cluster_size
            FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
            LEFT JOIN lab l ON d.doc_id = l.doc_id
            ORDER BY d.doc_id"""))

  /** Audio near-dup via the energy-difference fingerprint
    * ([[graft.ops.AudioFp]]): REAL WAV decode → 65-window exact
    * integer energies → 64-bit difference hash → the SAME banded
    * Hamming join images use. Planted variants perturb ONE window's
    * samples (≤ 2 bits), and the oracle replays every sample, window
    * energy, hash bit, and the full Hamming-≤-3 pair set — a window-
    * boundary slip, an energy overflow, or a band-recall gap all
    * hash-mismatch.
    */
  val m63AudioFpDedup = Q(
    "m63_audio_fp_neardup",
    (s, dir) => {
      import graft.ops.{AudioFp, ImageDedup}
      val h = AudioFp.hashes(s,
        Multimodal.syntheticWavPlanted(docs(s, dir).filter(col("doc_id") < 200)))
      ImageDedup.nearDupPairs(h, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"),
          ImageDedup.hashHex(col("hash_a")).as("fp_a"),
          ImageDedup.hashHex(col("hash_b")).as("fp_b"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH d AS (SELECT doc_id,
                   CASE WHEN doc_id % 4 = 3 THEN doc_id - 1 ELSE doc_id END AS e
                 FROM documents WHERE doc_id < 200),
            s AS (SELECT d.doc_id, i.i AS i,
                    (d.e * 7919 + i.i * 104729 +
                     CASE WHEN d.doc_id % 4 = 3 AND i.i // 10 = d.e % 60
                          THEN 9999 ELSE 0 END) % 65536 - 32768 AS v
                  FROM d, range(650) i(i)),
            en AS (SELECT doc_id, i // 10 AS w, CAST(sum(v * v) AS BIGINT) AS nrg
                   FROM s GROUP BY doc_id, i // 10),
            bits AS (SELECT a.doc_id, CAST(a.w AS INT) AS bit_i,
                       CASE WHEN a.nrg < b.nrg THEN 1 ELSE 0 END AS bit
                     FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.w = a.w + 1
                     WHERE a.w < 64),
            hex AS (SELECT doc_id, printf('%08x%08x',
                      CAST(sum(CASE WHEN bit_i >= 32
                        THEN CAST(bit AS BIGINT) << (bit_i - 32) ELSE 0 END) AS BIGINT),
                      CAST(sum(CASE WHEN bit_i < 32
                        THEN CAST(bit AS BIGINT) << bit_i ELSE 0 END) AS BIGINT)) AS hx
                    FROM bits GROUP BY doc_id),
            pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                        CAST(sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INT)
                          AS hamming
                      FROM bits x JOIN bits y
                        ON x.bit_i = y.bit_i AND x.doc_id < y.doc_id
                      GROUP BY 1, 2
                      HAVING sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= 3)
            SELECT p.doc_a, p.doc_b, p.hamming, ha.hx AS fp_a, hb.hx AS fp_b
            FROM pairs p
            JOIN hex ha ON ha.doc_id = p.doc_a
            JOIN hex hb ON hb.doc_id = p.doc_b
            ORDER BY doc_a, doc_b"""))

  /** Deterministic exact-quota stratified sampling
    * ([[graft.ops.Sampling.stratified]]): 7 docs per source by salted
    * hash-rank — reproducible independent of partition layout, the
    * property `rand()`-based sampling cannot give a 100 TB mixture
    * spec. The oracle replays the identical md5 ordering, so a
    * drifted salt, tie-break, or quota hash-mismatches.
    */
  val t111StratifiedSample = Q(
    "t111_stratified_sample",
    (s, dir) => graft.ops.Sampling
      .stratified(docs(s, dir), "source", "doc_id", quota = 7, salt = "s8")
      .select(col("source"), col("doc_id"), col("sample_rank"))
      .orderBy(col("source"), col("sample_rank")),
    Some("""WITH r AS (SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5('s8|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
                FROM documents)
            SELECT source, doc_id, CAST(rk AS INT) AS sample_rank
            FROM r WHERE rk <= 7 ORDER BY source, sample_rank"""))

  /** Within-document duplicate-line profile
    * ([[TextStats.lineProfile]], the Gopher §A1.1 line-repetition
    * family): documents re-lined into 8-word rows, with every fifth
    * doc's first line REPLANTED at its end — the templated
    * header/footer pathology. Exact integer milli fractions; the
    * oracle rebuilds the identical line structure and replays both
    * the occurrence and character dup fractions.
    */
  val t112LineRepetition = Q(
    "t112_line_repetition",
    (s, dir) => {
      val lined = docs(s, dir)
        .withColumn("ws", expr("filter(split(text, ' '), w -> length(w) > 0)"))
        .withColumn("ls", expr(
          "transform(sequence(0, int(ceil(size(ws) / 8.0)) - 1), " +
            "i -> array_join(slice(ws, i * 8 + 1, 8), ' '))"))
        .withColumn("ls", expr(
          "CASE WHEN doc_id % 5 = 0 THEN concat(ls, slice(ls, 1, 1)) ELSE ls END"))
        .select(col("doc_id"), array_join(col("ls"), "\n").as("text"))
      TextStats.lineProfile(lined).orderBy(col("doc_id"))
    },
    Some("""WITH w AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
                FROM documents),
            l0 AS (SELECT doc_id, list_transform(
                     range(CAST(ceil(len(ws) / 8.0) AS BIGINT)),
                     i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ')) AS ls
                   FROM w),
            l1 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
                     THEN list_concat(ls, list_slice(ls, 1, 1)) ELSE ls END AS ls
                   FROM l0),
            ln AS (SELECT doc_id, unnest(ls) AS line FROM l1),
            pl AS (SELECT doc_id, line, CAST(count(*) AS BIGINT) AS n,
                          CAST(length(line) AS BIGINT) AS len
                   FROM ln WHERE length(line) > 0 GROUP BY doc_id, line),
            pr AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_lines,
                          CAST(count(*) AS BIGINT) AS n_distinct,
                          CAST(sum(n * len) AS BIGINT) AS total_chars,
                          CAST(sum(CASE WHEN n > 1 THEN n * len ELSE 0 END)
                            AS BIGINT) AS dup_chars
                   FROM pl GROUP BY doc_id)
            SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
                   CAST(n_distinct AS INT) AS n_distinct_lines,
                   (n_lines - n_distinct) * 1000 // n_lines AS dup_line_frac_milli,
                   CASE WHEN total_chars = 0 THEN CAST(0 AS BIGINT)
                        ELSE dup_chars * 1000 // total_chars END AS dup_char_frac_milli
            FROM pr ORDER BY doc_id"""))

  /** Energy-based voice-activity segmentation
    * ([[graft.ops.AudioVad.vadSegments]]): 200-sample WAVs with
    * planted silence/voice structure decode through the REAL WAV
    * path, frame into 10-sample energies, and merge voiced runs into
    * segments in the same per-document scan — ZERO shuffles beyond
    * the gate's ORDER BY. The oracle replays the synth formula, frame
    * energies, and gaps-and-islands segmentation exactly (all
    * energies are exact int16-square Longs).
    */
  val m66VadSegments = Q(
    "m66_vad_segments",
    (s, dir) => graft.ops.AudioVad.vadSegments(
        Multimodal.syntheticWavSpeech(docs(s, dir).filter(col("doc_id") < 200)))
      .orderBy(col("doc_id"), col("seg_id")),
    Some("""WITH s AS (SELECT doc_id, i.i AS i, i.i // 10 AS w,
                  CASE WHEN (doc_id * 7 + (i.i // 10) * 5) % 7 < 4
                       THEN 20000 + (doc_id * 7919 + i.i * 104729) % 10000
                       ELSE (doc_id * 13 + i.i * 7) % 161 - 80 END AS v
                FROM documents, range(200) i(i) WHERE doc_id < 200),
            fr AS (SELECT doc_id, w, CAST(sum(v * v) AS BIGINT) AS e
                   FROM s GROUP BY doc_id, w),
            vo AS (SELECT doc_id, w, e,
                     w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
                   FROM fr WHERE e > 1000000),
            seg AS (SELECT doc_id, grp, min(w) AS sf, max(w) AS ef,
                      CAST(count(*) AS INT) AS n_frames,
                      CAST(sum(e) AS BIGINT) AS energy_sum
                    FROM vo GROUP BY doc_id, grp)
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sf) - 1
                     AS INT) AS seg_id,
                   CAST(sf AS INT) AS start_frame, CAST(ef AS INT) AS end_frame,
                   n_frames, energy_sum
            FROM seg ORDER BY doc_id, seg_id"""))

  /** Frame-level zero-crossing rate + energy
    * ([[graft.ops.AudioVad.zcrFrames]]): the voiced/unvoiced
    * discriminator over the same planted WAVs as m66 — voiced bursts
    * are all-positive (ZCR 0), silence oscillates around zero (high
    * ZCR), so the gate pins BOTH features. Crossings are strict sign
    * changes between consecutive in-frame samples; the oracle replays
    * formula, energies and lag-based crossing counts exactly.
    */
  val m67ZcrFrames = Q(
    "m67_zcr_frames",
    (s, dir) => graft.ops.AudioVad.zcrFrames(
        Multimodal.syntheticWavSpeech(docs(s, dir).filter(col("doc_id") < 200)))
      .orderBy(col("doc_id"), col("frame")),
    Some("""WITH s AS (SELECT doc_id, i.i AS i, i.i // 10 AS w,
                  CASE WHEN (doc_id * 7 + (i.i // 10) * 5) % 7 < 4
                       THEN 20000 + (doc_id * 7919 + i.i * 104729) % 10000
                       ELSE (doc_id * 13 + i.i * 7) % 161 - 80 END AS v
                FROM documents, range(200) i(i) WHERE doc_id < 200),
            l AS (SELECT doc_id, w, v,
                    lag(v) OVER (PARTITION BY doc_id, w ORDER BY i) AS pv
                  FROM s),
            z AS (SELECT doc_id, w,
                    CAST(sum(v * v) AS BIGINT) AS energy,
                    CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0
                             THEN 1 ELSE 0 END) AS INT) AS zcr
                  FROM l GROUP BY doc_id, w)
            SELECT doc_id, CAST(w AS INT) AS frame, energy, zcr,
                   energy > 1000000 AS voiced
            FROM z ORDER BY doc_id, frame"""))

  /** Greedy VAD-segment packing into bounded ASR decode windows
    * ([[graft.ops.AudioVad.vadChunks]]): chunks span ≤ 6 frames
    * including silence gaps, never split mid-segment, packed in one
    * zero-shuffle pass with the segmentation itself. The oracle
    * replays the m66 segmentation, then the greedy chunk-start state
    * machine as a recursive walk over segment indices — an off-by-one
    * in the span arithmetic or a cap applied to voiced frames instead
    * of the window span hash-mismatches.
    */
  val m68VadChunks = Q(
    "m68_vad_chunks",
    (s, dir) => graft.ops.AudioVad.vadChunks(
        Multimodal.syntheticWavSpeech(docs(s, dir).filter(col("doc_id") < 200)))
      .orderBy(col("doc_id"), col("chunk_id")),
    Some("""WITH RECURSIVE s AS (SELECT doc_id, i.i AS i, i.i // 10 AS w,
                  CASE WHEN (doc_id * 7 + (i.i // 10) * 5) % 7 < 4
                       THEN 20000 + (doc_id * 7919 + i.i * 104729) % 10000
                       ELSE (doc_id * 13 + i.i * 7) % 161 - 80 END AS v
                FROM documents, range(200) i(i) WHERE doc_id < 200),
            fr AS (SELECT doc_id, w, CAST(sum(v * v) AS BIGINT) AS e
                   FROM s GROUP BY doc_id, w),
            vo AS (SELECT doc_id, w, e,
                     w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
                   FROM fr WHERE e > 1000000),
            seg AS (SELECT doc_id, grp, min(w) AS sf, max(w) AS ef,
                      CAST(sum(e) AS BIGINT) AS energy
                    FROM vo GROUP BY doc_id, grp),
            segi AS (SELECT doc_id, sf, ef, energy,
                       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sf) - 1
                         AS INT) AS sid
                     FROM seg),
            walk(doc_id, sid, cs) AS (
              SELECT doc_id, sid, sf FROM segi WHERE sid = 0
              UNION ALL
              SELECT g.doc_id, g.sid,
                     CASE WHEN g.ef - w.cs + 1 <= 6 THEN w.cs ELSE g.sf END
              FROM segi g JOIN walk w
                ON g.doc_id = w.doc_id AND g.sid = w.sid + 1),
            ch AS (SELECT w.doc_id, w.cs, min(g.sf) AS start_frame,
                     max(g.ef) AS end_frame, CAST(count(*) AS INT) AS n_segments,
                     CAST(sum(g.energy) AS BIGINT) AS energy_sum
                   FROM walk w JOIN segi g
                     ON g.doc_id = w.doc_id AND g.sid = w.sid
                   GROUP BY w.doc_id, w.cs)
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY cs) - 1
                     AS INT) AS chunk_id,
                   CAST(start_frame AS INT) AS start_frame,
                   CAST(end_frame AS INT) AS end_frame, n_segments, energy_sum
            FROM ch ORDER BY doc_id, chunk_id"""))

  /** Record linkage with the native Jaro–Winkler expression
    * ([[org.apache.spark.sql.graftext.JaroWinkler]], codegen'd): a
    * dirty probe table (every fourth doc's two-word name with an
    * interior character transposition — the classic data-entry typo)
    * links back to the master under first-letter + length blocking,
    * so the join is never all-pairs; matches keep jw ≥ 0.9. The
    * oracle replays the same blocking and DuckDB's
    * `jaro_winkler_similarity` — the two independent implementations
    * must agree to 6dp on every surviving pair, which pins the match
    * window, half-transposition, and boost-threshold semantics.
    */
  val d64JwLinkage = Q(
    "d64_jw_linkage",
    (s, dir) => {
      val master = docs(s, dir).select(col("doc_id").as("m_id"),
        expr("array_join(slice(filter(split(text, ' '), x -> x <> ''), 1, 2), ' ')")
          .as("name"))
      val dirty = master.filter(col("m_id") % 4 === 0)
        .select((col("m_id") + 5000L).as("q_id"),
          expr("concat(substring(name, 1, 1), substring(name, 3, 1), " +
            "substring(name, 2, 1), substring(name, 4))").as("qname"))
      master.join(dirty,
          substring(col("name"), 1, 1) === substring(col("qname"), 1, 1) &&
            abs(length(col("name")) - length(col("qname"))) <= 1)
        .select(col("m_id"), col("q_id"),
          round(org.apache.spark.sql.graftext.JaroWinkler
            .jaroWinkler(col("name"), col("qname")), 6).as("jw"))
        .filter(col("jw") >= 0.9)
        .orderBy(col("m_id"), col("q_id"))
    },
    Some("""WITH m AS (SELECT doc_id AS m_id,
                  array_to_string(list_slice(
                    list_filter(string_split(text, ' '), x -> x <> ''), 1, 2), ' ')
                    AS name
                FROM documents),
            q AS (SELECT m_id + 5000 AS q_id,
                    substr(name, 1, 1) || substr(name, 3, 1)
                      || substr(name, 2, 1) || substr(name, 4) AS qname
                  FROM m WHERE m_id % 4 = 0),
            j AS (SELECT m_id, q_id,
                    round(jaro_winkler_similarity(name, qname), 6) AS jw
                  FROM m JOIN q
                    ON substr(name, 1, 1) = substr(qname, 1, 1)
                   AND abs(length(name) - length(qname)) <= 1)
            SELECT m_id, q_id, jw FROM j WHERE jw >= 0.9
            ORDER BY m_id, q_id"""))

  /** KMV sketch intersection ([[graft.ops.KmvSketch.overlapEstimate]]):
    * the SKETCH path for cross-source overlap — distinct-shingle
    * union/intersection of two corpus halves estimated from two
    * 256-value k-minimum sketches (one TakeOrdered pass per side,
    * never a cross-side gram shuffle), beside the exact truth the
    * gate computes for comparison. Both engines replay the
    * md5-derived 56-bit hashes, the union re-sketch, and the
    * ρ·union_est algebra bit-for-bit; a drifted tie-break or a
    * short-circuited re-limit hash-mismatches the floats.
    */
  val d65KmvOverlap = Q(
    "d65_kmv_overlap",
    (s, dir) => {
      val d = docs(s, dir)
      val isA = expr("CAST(substring(source, 4, 8) AS INT) % 2 = 0")
      val a = d.filter(isA)
      val b = d.filter(!isA)
      val est = graft.ops.KmvSketch.overlapEstimate(a, b)
      def hs(x: DataFrame) = TextDedup.shingleSets(x, "doc_id", "text", 3)
        .select(explode(col("sh")).as("shingle")).distinct()
      val ha = hs(a); val hb = hs(b)
      val truth = ha.union(hb).distinct().agg(count(lit(1)).cast("bigint").as("true_union"))
        .crossJoin(ha.join(hb, Seq("shingle"))
          .agg(count(lit(1)).cast("bigint").as("true_inter")))
      est.crossJoin(truth)
    },
    Some("""WITH d AS (SELECT doc_id, source,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
                FROM documents),
            sh AS (SELECT doc_id, source,
                     unnest(list_distinct(list_transform(range(len(ws) - 2),
                       i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) AS shingle
                   FROM d WHERE len(ws) >= 3),
            ha AS (SELECT DISTINCT shingle,
                     CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h
                   FROM sh WHERE CAST(substr(source, 4, 8) AS INT) % 2 = 0),
            hb AS (SELECT DISTINCT shingle,
                     CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h
                   FROM sh WHERE CAST(substr(source, 4, 8) AS INT) % 2 = 1),
            ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
            skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
            m AS (SELECT coalesce(a.h, b.h) AS h,
                    CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS in_a,
                    CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS in_b
                  FROM ska a FULL JOIN skb b ON a.h = b.h),
            u AS (SELECT * FROM m ORDER BY h LIMIT 256),
            est AS (SELECT count(*) AS k_union, max(h) AS theta,
                      sum(in_a * in_b) AS k_inter
                    FROM u),
            tu AS (SELECT count(*) AS true_union
                   FROM (SELECT shingle FROM ha UNION SELECT shingle FROM hb)),
            ti AS (SELECT count(*) AS true_inter
                   FROM ha JOIN hb USING (shingle))
            SELECT CAST(k_union AS BIGINT) AS k_union, theta,
                   CAST(k_inter AS BIGINT) AS k_inter,
                   CASE WHEN k_union < 256 THEN CAST(k_union AS DOUBLE)
                        ELSE CAST(k_union - 1 AS DOUBLE) * 72057594037927936
                             / theta END AS union_est,
                   CAST(k_inter AS DOUBLE) / k_union *
                     (CASE WHEN k_union < 256 THEN CAST(k_union AS DOUBLE)
                           ELSE CAST(k_union - 1 AS DOUBLE) * 72057594037927936
                                / theta END) AS inter_est,
                   CAST(true_union AS BIGINT) AS true_union,
                   CAST(true_inter AS BIGINT) AS true_inter
            FROM est CROSS JOIN tu CROSS JOIN ti"""))

  /** Overlapping passage windows ([[graft.ops.Passages.windows]], 24
    * words advancing by 16): the retrieval/RAG chunking counterpart
    * of the CDC chunker (t110) — ZERO-shuffle per-row window math,
    * passage identity as an md5 the downstream exact-dedup joins on.
    * The oracle replays start arithmetic, tail-window clamping, and
    * the passage hashes.
    */
  val t115PassageWindows = Q(
    "t115_passage_windows",
    (s, dir) => graft.ops.Passages.windows(docs(s, dir), window = 24, stride = 16)
      .orderBy(col("doc_id"), col("win_id")),
    Some("""WITH w AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
                FROM documents),
            b AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
            x AS (SELECT doc_id, ws,
                    unnest(range(CAST(greatest(ceil((n - 24) / 16.0), 0)
                      AS BIGINT) + 1)) AS win_id
                  FROM b),
            p AS (SELECT doc_id, CAST(win_id AS INT) AS win_id,
                    CAST(win_id * 16 AS INT) AS start_word,
                    list_slice(ws, win_id * 16 + 1, win_id * 16 + 24) AS pw
                  FROM x)
            SELECT doc_id, win_id, start_word,
                   CAST(len(pw) AS INT) AS n_words,
                   pw[1] AS head_word, pw[-1] AS tail_word,
                   md5(array_to_string(pw, ' ')) AS passage_hash
            FROM p ORDER BY doc_id, win_id"""))
}
