"""Dedup-suite and similarity-search queries over documents/embeddings."""
from __future__ import annotations

import pandas as pd

from dataflow_mm_ray.functions.textstats_sql import textstats_sql
from dataflow_mm_ray.queries import register
from dataflow_mm_ray.sources.tables import read_table
from dataflow_mm_ray.stages import neardup, similarity
from dataflow_mm_ray.stages.dedup import dedup_first_wins

TOPK_K = 10
TOPK_NQ = 5
KNN_K = 10
KNN_KEEP_RATIO = 0.6
NEARDUP_THRESHOLD = 0.4

# ASCII punctuation (== Python string.punctuation) and the engine's
# whitespace set as an explicit SQL character class (RE2 \s excludes
# \v, so oracles never use bare \s — see stages/neardup.py)
_NGRAM_PUNCT = r"[\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]"
_NGRAM_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"

_EMB_CTE = """
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
"""


@register(
    "topk_cosine",
    _EMB_CTE
    + f"""
, q AS (SELECT vec_id AS query_id, e FROM b WHERE vec_id < {TOPK_NQ})
SELECT query_id, vec_id, sim FROM (
  SELECT q.query_id, b.vec_id, round(list_cosine_similarity(q.e, b.e), 9) AS sim
  FROM q, b WHERE b.vec_id <> q.query_id
)
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= {TOPK_K}
""",
)
def q_topk_cosine(sf_dir: str):
    """Brute-force cosine top-k ANN baseline (broadcast query matrix,
    per-batch partial top-k)."""
    return similarity.brute_force_topk(sf_dir, k=TOPK_K, n_queries=TOPK_NQ)


@register(
    "knn_percentile",
    _EMB_CTE
    + f"""
, pair AS (
  SELECT a.vec_id, c.vec_id AS other,
         CAST(round(list_cosine_similarity(a.e, c.e) * 1e9) AS BIGINT) AS sim_e9
  FROM b a, b c WHERE a.vec_id <> c.vec_id
), topk AS (
  SELECT vec_id, sim_e9 FROM pair
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim_e9 DESC, other) <= {KNN_K}
), s AS (
  SELECT vec_id, CAST(sum(sim_e9) AS BIGINT) AS sum_knn_sim_e9 FROM topk GROUP BY 1
)
SELECT vec_id, sum_knn_sim_e9 FROM s
WHERE sum_knn_sim_e9 < (SELECT quantile_cont(sum_knn_sim_e9, {KNN_KEEP_RATIO}) FROM s)
""",
)
def q_knn_percentile(sf_dir: str):
    """KNNSimilarityFilter (knn_similarity_filter.py:112-141,194-196)."""
    return similarity.knn_percentile_filter(sf_dir, k=KNN_K, keep_ratio=KNN_KEEP_RATIO)


@register(
    "ivf_knn_percentile",
    _EMB_CTE
    + f"""
, pair AS (
  SELECT a.vec_id, c.vec_id AS other,
         CAST(round(list_cosine_similarity(a.e, c.e) * 1e9) AS BIGINT) AS sim_e9
  FROM b a, b c WHERE a.vec_id <> c.vec_id
), topk AS (
  SELECT vec_id, sim_e9 FROM pair
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim_e9 DESC, other) <= {KNN_K}
), s AS (
  SELECT vec_id, CAST(sum(sim_e9) AS BIGINT) AS sum_knn_sim_e9 FROM topk GROUP BY 1
)
SELECT vec_id, sum_knn_sim_e9 FROM s
WHERE sum_knn_sim_e9 < (SELECT quantile_cont(sum_knn_sim_e9, {KNN_KEEP_RATIO}) FROM s)
""",
)
def q_ivf_knn_percentile(sf_dir: str):
    """The bucketed (no full-matrix broadcast) twin of knn_percentile at
    nprobe == n_clusters: centroid broadcast + per-cluster keyed
    exchange + partial-top-k merge must reproduce the brute-force
    KNNSimilarityFilter exactly, so the whole scale path is held to the
    same SQL oracle. Partial probe (the 100-TB config) is pytest-pinned
    for recall in tests/test_similarity.py."""
    return similarity.ivf_knn_percentile(
        sf_dir, k=KNN_K, keep_ratio=KNN_KEEP_RATIO, n_clusters=16, nprobe=16
    )


@register(
    "embedding_neardup",
    _EMB_CTE
    + f"""
, pair AS (
  SELECT a.vec_id, c.vec_id AS other, round(list_cosine_similarity(a.e, c.e), 9) AS sim
  FROM b a, b c WHERE a.vec_id <> c.vec_id
)
SELECT vec_id, round(max(sim), 9) AS max_similarity,
       NOT bool_or(sim >= {NEARDUP_THRESHOLD} AND other < vec_id) AS keep
FROM pair GROUP BY 1
""",
)
def q_embedding_neardup(sf_dir: str):
    """ImageDeduplicateFilter first-wins cosine dedup
    (image_deduplication_filter.py:122-197)."""
    return similarity.embedding_neardup(sf_dir, threshold=NEARDUP_THRESHOLD)


@register(
    "docs_dedup_fingerprint",
    "WITH _stats AS (" + textstats_sql(source="documents") + ") "
    "SELECT d.doc_id, d.text, s.fingerprint FROM documents d "
    "JOIN _stats s ON d.doc_id = s.doc_id "
    "QUALIFY row_number() OVER (PARTITION BY s.fingerprint ORDER BY d.doc_id) = 1",
)
def q_docs_dedup_fingerprint(sf_dir: str):
    """Exact first-wins dedup of documents on the shingle fingerprint."""
    from dataflow_mm_ray.functions.textstats import fingerprint

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_fp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["fingerprint"] = [fingerprint(t if isinstance(t, str) else "") for t in b["text"]]
        return b

    keyed = docs.map_batches(add_fp, batch_format="pandas")
    return dedup_first_wins(keyed, "fingerprint", order_by=("doc_id",))


@register("minhash_dedup", None)  # probabilistic candidate recall — no SQL oracle
def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup (banded groupby, no all-pairs); pandas
    parity + recall tests in tests/test_neardup.py."""
    return neardup.minhash_lsh_dedup(sf_dir)


@register("simhash_dedup", None)
def q_simhash_dedup(sf_dir: str):
    """SimHash near-dup; sequential first-wins scan mirrors the
    reference's ImageDiversityFilter order dependence
    (image_diversity_filter.py:100-119)."""
    return neardup.simhash_dedup(sf_dir)


_SIMHASH_SQL = f"""
WITH norm AS (
  SELECT doc_id,
    regexp_replace(trim(lower(regexp_replace(text, '{_NGRAM_PUNCT}', '', 'g')), {_NGRAM_WS}),
                   '[' || {_NGRAM_WS} || ']+', ' ', 'g') AS nt
  FROM documents
), words AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS w FROM norm WHERE nt <> ''
), wh AS (
  SELECT doc_id, md5(w) AS h FROM words WHERE w <> ''
), bits AS (
  SELECT doc_id, j,
    ((strpos('0123456789abcdef', substr(h, 16 - j // 4, 1)) - 1) >> (j % 4)) & 1 AS bit
  FROM wh, unnest(range(0, 64)) AS t(j)
), votes AS (
  SELECT doc_id, j, sum(2 * bit - 1) AS v FROM bits GROUP BY 1, 2
), bands AS (
  SELECT doc_id,
    sum(CASE WHEN v > 0 AND j < 16 THEN (1 << j) ELSE 0 END) AS b0,
    sum(CASE WHEN v > 0 AND j >= 16 AND j < 32 THEN (1 << (j - 16)) ELSE 0 END) AS b1,
    sum(CASE WHEN v > 0 AND j >= 32 AND j < 48 THEN (1 << (j - 32)) ELSE 0 END) AS b2,
    sum(CASE WHEN v > 0 AND j >= 48 THEN (1 << (j - 48)) ELSE 0 END) AS b3
  FROM votes GROUP BY doc_id
), sigs AS (
  SELECT d.doc_id, coalesce(b0, 0) AS b0, coalesce(b1, 0) AS b1,
         coalesce(b2, 0) AS b2, coalesce(b3, 0) AS b3
  FROM documents d LEFT JOIN bands USING (doc_id)
), near AS (
  SELECT a.doc_id AS hi FROM sigs a JOIN sigs b ON b.doc_id < a.doc_id
  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
)
SELECT doc_id, doc_id NOT IN (SELECT hi FROM near) AS keep FROM sigs
"""


@register("simhash_dedup_exact", _SIMHASH_SQL)
def q_simhash_dedup_exact(sf_dir: str):
    """The SimHash banded pipeline under a full SQL oracle: md5 word
    hashes (SQL-recomputable) instead of SipHash, same sign-aggregated
    signature, same 4x16-bit pigeonhole banding + first-wins merge
    (stages/neardup.py banded_first_wins — exact for max_hamming <= 3,
    which the oracle checks as a complete pairwise Hamming self-join)."""
    return neardup.simhash_md5_dedup(sf_dir)


@register("datatailor_select", None)  # SVD entropy: pytest-oracled math
def q_datatailor_select(sf_dir: str):
    """DataTailor collaborative selection (datatailor_filter.py:169-373):
    SVD-entropy informativeness, agglomerative-cluster uniqueness /
    representativeness, rank-normalized top-keep_ratio selection."""
    from dataflow_mm_ray.stages.datatailor import datatailor_select

    return datatailor_select(sf_dir, keep_ratio=0.8)


@register("ivf_topk", None)  # approximate: recall/exactness pytest-pinned
def q_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN top-k (the scale path for similarity search);
    with nprobe == n_clusters it is pinned equal to the brute-force
    baseline in tests/test_similarity.py."""
    from dataflow_mm_ray.stages import similarity

    return similarity.ivf_topk(sf_dir, k=10, n_queries=5, n_clusters=16, nprobe=4)


@register("docprep_pipeline", None)  # composed chain: stage oracles cover parts
def q_docprep_pipeline(sf_dir: str):
    """The composed document-prep chain (pipelines/docprep.py):
    rule filter -> annotate -> exact dedup -> MinHash near-dup ->
    quality cut, one streaming Ray Data chain. Its stages are
    individually oracled (rule_filter, text_stats,
    docs_dedup_fingerprint, minhash_dedup)."""
    from dataflow_mm_ray.pipelines.docprep import docprep_pipeline

    return docprep_pipeline(sf_dir)


def _docprep_exact_sql() -> str:
    """The whole docprep chain as one composed oracle: the rule-filter
    and textstats stage SQL builders (already individually oracled)
    feed first-wins fingerprint dedup, then the exact n-gram Jaccard
    near-dup at 0.7 over the survivors, then the punct-ratio cut."""
    from dataflow_mm_ray.functions.text_rules_sql import rule_filter_sql
    from dataflow_mm_ray.functions.textstats_sql import textstats_sql

    return f"""
WITH rf AS (SELECT doc_id, keep FROM ({rule_filter_sql(source="documents")}) ),
ts AS (SELECT doc_id, norm_text, n_ws_tokens, punct_ratio, stopword_ratio, lang_pred, fingerprint
       FROM ({textstats_sql(source="documents")}) ),
ann AS (
  SELECT d.doc_id, d.text, ts.norm_text, CAST(ts.n_ws_tokens AS BIGINT) AS n_tokens,
         ts.punct_ratio, ts.stopword_ratio, ts.lang_pred, ts.fingerprint
  FROM documents d JOIN rf USING (doc_id) JOIN ts USING (doc_id)
  WHERE rf.keep
), ex AS (
  SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn FROM ann
), surv AS (SELECT doc_id, text, norm_text, n_tokens, punct_ratio, stopword_ratio, lang_pred
            FROM ex WHERE rn = 1),
nnorm AS (
  SELECT doc_id,
    regexp_replace(trim(lower(regexp_replace(text, '{_NGRAM_PUNCT}', '', 'g')), {_NGRAM_WS}),
                   '[' || {_NGRAM_WS} || ']+', ' ', 'g') AS nt
  FROM surv
), nwords AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM nnorm WHERE nt <> ''),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_transform(range(1, len(ws) - 1),
                                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS sh
    FROM nwords)
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS lo, b.doc_id AS hi, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), near AS (
  SELECT hi FROM pairs JOIN sizes sa ON sa.doc_id = lo JOIN sizes sb ON sb.doc_id = hi
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.7
)
SELECT doc_id, text, norm_text, n_tokens, punct_ratio, stopword_ratio, lang_pred
FROM surv
WHERE doc_id NOT IN (SELECT hi FROM near) AND punct_ratio <= 0.5
"""


@register("docprep_pipeline_exact", _docprep_exact_sql())
def q_docprep_pipeline_exact(sf_dir: str):
    """docprep with the exact n-gram-Jaccard near-dup stage — the whole
    composed chain (rule filter -> annotate -> fingerprint dedup ->
    exact near-dup -> quality cut) under ONE end-to-end SQL oracle."""
    from dataflow_mm_ray.pipelines.docprep import docprep_pipeline

    return docprep_pipeline(sf_dir, neardup="exact")


@register("embedding_srp_neardup", None)  # LSH-probabilistic: pytest-pinned
def q_embedding_srp_neardup(sf_dir: str):
    """Embedding-cosine near-dup SCALE path: sign-random-projection
    signatures + the banded Hamming first-wins pipeline (the
    shuffle-bounded surrogate for embedding_neardup's O(n^2) cosine
    matrix). Recall vs the exact path pinned in tests/test_neardup.py."""
    return neardup.embedding_srp_neardup(sf_dir)


NGRAM_JACCARD_THRESHOLD = 0.5

# shared by the first-wins dedup and the duplicate-cluster oracles:
# normalized word-3-gram shingles -> per-pair intersection counts
_NGRAM_PAIR_CTES = f"""
norm AS (
  SELECT doc_id,
    regexp_replace(trim(lower(regexp_replace(text, '{_NGRAM_PUNCT}', '', 'g')), {_NGRAM_WS}),
                   '[' || {_NGRAM_WS} || ']+', ' ', 'g') AS nt
  FROM documents
), words AS (
  SELECT doc_id, string_split(nt, ' ') AS ws FROM norm WHERE nt <> ''
), sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_transform(range(1, len(ws) - 1),
                                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS sh
    FROM words)
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS lo, b.doc_id AS hi, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


@register(
    "ngram_jaccard_dedup",
    f"""
WITH {_NGRAM_PAIR_CTES}, near AS (
  SELECT hi FROM pairs JOIN sizes sa ON sa.doc_id = lo JOIN sizes sb ON sb.doc_id = hi
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {NGRAM_JACCARD_THRESHOLD}
)
SELECT d.doc_id, d.doc_id NOT IN (SELECT hi FROM near) AS keep FROM documents d
""",
)
def q_ngram_jaccard_dedup(sf_dir: str):
    """EXACT word-3-gram Jaccard first-wins near-dup over the documents
    table via a distributed inverted index (stages/neardup.py
    ngram_jaccard_dedup) — the verification kernel of the MinHash path
    promoted to a standalone exact operator, fully SQL-oracled."""
    return neardup.ngram_jaccard_dedup(sf_dir, threshold=NGRAM_JACCARD_THRESHOLD)


@register(
    "dup_clusters",
    f"""
WITH RECURSIVE {_NGRAM_PAIR_CTES}, near_pairs AS (
  SELECT lo, hi FROM pairs JOIN sizes sa ON sa.doc_id = lo JOIN sizes sb ON sb.doc_id = hi
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {NGRAM_JACCARD_THRESHOLD}
), edges AS (
  SELECT lo AS a, hi AS b FROM near_pairs
  UNION ALL
  SELECT hi AS a, lo AS b FROM near_pairs
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
), comp AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT c.doc_id, c.cluster_id, s.cluster_size
FROM comp c
JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1) s USING (cluster_id)
ORDER BY c.doc_id
""",
)
def q_dup_clusters(sf_dir: str):
    """Duplicate CLUSTERS over the exact n-gram Jaccard graph:
    (doc_id, cluster_id, cluster_size) by distributed min-label
    propagation with pointer jumping (stages/components.py) — the
    cluster-then-canonicalize complement of the first-wins dedup,
    oracled by a recursive-CTE transitive closure."""
    from dataflow_mm_ray.stages.components import ngram_dup_clusters

    return ngram_dup_clusters(sf_dir, threshold=NGRAM_JACCARD_THRESHOLD)


@register("minhash_dup_clusters", None)
def q_minhash_dup_clusters(sf_dir: str):
    """Duplicate clusters over the MinHash-LSH edge source — the
    web-scale edge generator feeding the shared connected-components
    labeling. Rows-only (LSH banding recall is not SQL-expressible);
    pytest pins refinement of the exact n-gram clusters at the same
    threshold plus partition invariance."""
    from dataflow_mm_ray.stages.components import minhash_dup_clusters

    return minhash_dup_clusters(sf_dir, threshold=0.7)


@register(
    "dup_cluster_canonical",
    f"""
WITH RECURSIVE {_NGRAM_PAIR_CTES}, near_pairs AS (
  SELECT lo, hi FROM pairs JOIN sizes sa ON sa.doc_id = lo JOIN sizes sb ON sb.doc_id = hi
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {NGRAM_JACCARD_THRESHOLD}
), edges AS (
  SELECT lo AS a, hi AS b FROM near_pairs
  UNION ALL
  SELECT hi AS a, lo AS b FROM near_pairs
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
), comp AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       row_number() OVER (PARTITION BY c.cluster_id
                          ORDER BY length(d.text) DESC, c.doc_id) = 1 AS keep
FROM comp c
JOIN documents d USING (doc_id)
JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1) s USING (cluster_id)
ORDER BY c.doc_id
""",
)
def q_dup_cluster_canonical(sf_dir: str):
    """Duplicate-aware canonical selection: keep the LONGEST document
    per near-dup cluster (ties: lowest doc id) — the quality-pick
    complement of first-wins (which keeps the earliest). Clusters by
    the distributed CC operator, then one keyed exchange per cluster
    applies the pick."""
    from dataflow_mm_ray.stages.components import dup_cluster_canonical

    return dup_cluster_canonical(sf_dir, threshold=NGRAM_JACCARD_THRESHOLD)


@register(
    "ivf_topk_fullprobe",
    _EMB_CTE
    + f"""
, q AS (SELECT vec_id AS query_id, e FROM b WHERE vec_id < {TOPK_NQ})
SELECT query_id, vec_id, sim FROM (
  SELECT q.query_id, b.vec_id, round(list_cosine_similarity(q.e, b.e), 9) AS sim
  FROM q, b WHERE b.vec_id <> q.query_id
)
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= {TOPK_K}
""",
)
def q_ivf_topk_fullprobe(sf_dir: str):
    """The IVF scan path at nprobe == n_clusters: must equal brute-force
    cosine top-k exactly (the recall=1.0 end of the IVF trade-off), so
    the whole IVF machinery (centroid training on a bounded sample,
    per-batch cluster assignment, probe filter, distributed final
    top-k) is held to the same SQL oracle as topk_cosine."""
    return similarity.ivf_topk(sf_dir, k=TOPK_K, n_queries=TOPK_NQ, n_clusters=16, nprobe=16)


def _simhash_first_sql() -> str:
    """Full DuckDB oracle of ``simhash_neardup_first(hash_kind="md5")``:
    recompute the md5-word-hash SimHash per transcript turn over the
    id-stripped text, route once per 16-bit band to its (band, bucket),
    pick the event-time-first winner per bucket, and emit one edge per
    (band, bucket) at full-64-bit Hamming <= k. The strip regex and the
    Hamming threshold are imported from the engine modules (never
    re-assumed — CLAUDE.md md5-twin rule)."""
    from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE
    from dataflow_mm_ray.streaming.engine import _DEDUP_KEY_RE

    k = SIMHASH_FIRST_MAX_HAMMING
    strip = _DEDUP_KEY_RE.pattern  # RE2-compatible: " #\\d+ "
    return TRANSCRIPTS_CTE + f"""
, t AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         regexp_replace(coalesce(text, ''), '{strip}', ' ', 'g') AS raw
  FROM transcripts
), norm AS (
  SELECT conv_id, turn_idx,
    regexp_replace(trim(lower(regexp_replace(raw, '{_NGRAM_PUNCT}', '', 'g')), {_NGRAM_WS}),
                   '[' || {_NGRAM_WS} || ']+', ' ', 'g') AS nt
  FROM t
), words AS (
  SELECT conv_id, turn_idx, unnest(string_split(nt, ' ')) AS w
  FROM norm WHERE nt <> ''
), wh AS (
  SELECT conv_id, turn_idx, md5(w) AS h FROM words WHERE w <> ''
), bits AS (
  SELECT conv_id, turn_idx, j,
    ((strpos('0123456789abcdef', substr(h, 16 - j // 4, 1)) - 1) >> (j % 4)) & 1 AS bit
  FROM wh, unnest(range(0, 64)) AS u(j)
), votes AS (
  SELECT conv_id, turn_idx, j, sum(2 * bit - 1) AS v FROM bits GROUP BY 1, 2, 3
), sb AS (
  SELECT conv_id, turn_idx,
    sum(CASE WHEN v > 0 AND j < 16 THEN (1 << j) ELSE 0 END) AS b0,
    sum(CASE WHEN v > 0 AND j >= 16 AND j < 32 THEN (1 << (j - 16)) ELSE 0 END) AS b1,
    sum(CASE WHEN v > 0 AND j >= 32 AND j < 48 THEN (1 << (j - 32)) ELSE 0 END) AS b2,
    sum(CASE WHEN v > 0 AND j >= 48 THEN (1 << (j - 48)) ELSE 0 END) AS b3
  FROM votes GROUP BY 1, 2
), sigs AS (
  SELECT t.conv_id, t.turn_idx, t.ts_us,
         coalesce(b0, 0) AS b0, coalesce(b1, 0) AS b1,
         coalesce(b2, 0) AS b2, coalesce(b3, 0) AS b3
  FROM t LEFT JOIN sb USING (conv_id, turn_idx)
), banded AS (
  SELECT r.band,
         CASE r.band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS bucket,
         conv_id, turn_idx, ts_us, b0, b1, b2, b3
  FROM sigs, unnest(range(0, 4)) AS r(band)
), winners AS (
  SELECT band, bucket, conv_id AS winner_conv_id,
         turn_idx AS winner_turn_idx, ts_us AS winner_ts_us,
         b0 AS w0, b1 AS w1, b2 AS w2, b3 AS w3
  FROM banded
  QUALIFY row_number() OVER (PARTITION BY band, bucket
                             ORDER BY ts_us, conv_id, turn_idx) = 1
), edges AS (
  SELECT x.band, x.bucket, w.winner_conv_id, w.winner_turn_idx,
         w.winner_ts_us, x.conv_id, x.turn_idx, x.ts_us,
         bit_count(xor(x.b0, w.w0)) + bit_count(xor(x.b1, w.w1))
       + bit_count(xor(x.b2, w.w2)) + bit_count(xor(x.b3, w.w3)) AS hamming
  FROM banded x JOIN winners w USING (band, bucket)
  WHERE NOT (x.conv_id = w.winner_conv_id AND x.turn_idx = w.winner_turn_idx)
)
SELECT CAST(band AS INTEGER) AS band, CAST(bucket AS BIGINT) AS bucket,
       winner_conv_id, CAST(winner_turn_idx AS INTEGER) AS winner_turn_idx,
       CAST(winner_ts_us AS BIGINT) AS winner_ts_us,
       conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       CAST(ts_us AS BIGINT) AS ts_us, CAST(hamming AS BIGINT) AS hamming
FROM edges WHERE hamming <= {k}
"""


SIMHASH_FIRST_MAX_HAMMING = 3


@register("simhash_neardup_first", _simhash_first_sql())
def q_simhash_neardup_first(sf_dir: str):
    """Near-dup edges to each SimHash band bucket's event-time-first
    turn over the transcript stream — the md5-twin form of the batch
    twin of the streamed ``sdup`` processor (streaming/processor.py
    SimhashNearDupFirst): identical banding / winner / edge pipeline,
    md5-derived word hashes so the full DuckDB oracle recomputes the
    signatures. One keyed exchange on the (band, bucket) id. The
    SipHash production form (bit-equal pipeline, vectorized signature)
    is ``simhash_neardup_first_siphash`` below, pinned frame-equal to
    the stream in tests/test_processors.py."""
    return neardup.simhash_neardup_first(
        sf_dir, max_hamming=SIMHASH_FIRST_MAX_HAMMING, hash_kind="md5"
    )


@register("simhash_neardup_first_siphash", None)
def q_simhash_neardup_first_siphash(sf_dir: str):
    """The production-signature (vectorized SipHash ``simhash64_batch``)
    form of ``simhash_neardup_first`` — the exact batch twin of the
    streamed ``sdup`` processor (pinned frame-equal in
    tests/test_processors.py). Same pipeline as the SQL-oracled md5
    registration above; only the word-hash function differs."""
    return neardup.simhash_neardup_first(
        sf_dir, max_hamming=SIMHASH_FIRST_MAX_HAMMING
    )
