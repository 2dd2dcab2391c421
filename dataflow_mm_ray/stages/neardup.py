"""Near-duplicate detection: MinHash-LSH, SimHash, n-gram Jaccard.

The reference's only near-dup machinery is an O(n^2) pairwise cosine
matrix (``image_deduplication_filter.py:138``) and a stubbed
``min_hashes`` column hook (``dataflow/utils/storage.py:289-291``).
Here the scalable shapes are built instead — every stage distributed,
nothing doc-scale ever lands on the driver:

- **MinHash-LSH**: shingle -> 128 minhashes -> 32 bands x 4 rows ->
  ``partition_map(band_key)`` (ONE shuffle; no all-pairs) ->
  within-bucket candidate pairs -> exact Jaccard verification via a
  partitioned hash join of the pair list against the shingled doc
  table (two keyed exchanges; the shingle dictionary is never
  collected or broadcast) -> distributed first-wins keep decision
  (keyed merge of per-pair partials against the doc-id spine — the
  order rule of image_deduplication_filter.py:143-157).
- **SimHash**: 64-bit sign-aggregated word-hash signature; banding into
  4 x 16-bit blocks for candidate generation (any near pair within
  Hamming distance 3 shares >= 1 exact block — pigeonhole, so the
  banded candidate set is EXACT for max_hamming <= 3); per-bucket
  Hamming verification emits, for every doc, the minimum doc_id within
  distance k seen in that bucket; a second keyed merge takes the
  global min => keep iff no earlier doc is within distance k. This is
  bit-identical to a sequential first-wins scan in doc_id order.
- **n-gram Jaccard** is the verification kernel of the MinHash path and
  is exposed standalone for pair scoring.

Hashing is SipHash-based (process-stable, see hashing.py); all
pipelines are deterministic, so re-runs and resumes agree bit-for-bit.

Scale notes: bucket sizes are capped (``max_bucket``) so a degenerate
band (e.g. empty-text docs) cannot produce a quadratic pair blow-up;
capped buckets are dropped, never silently mis-deduped. The shingled
doc table is materialized once (distributed blocks in the object
store, spilling as needed) because two join passes consume it.
"""
from __future__ import annotations

import string

import numpy as np
import pandas as pd

from dataflow_mm_ray.functions.textstats import normalize_basic
from dataflow_mm_ray.hashing import stable_hash_array
from dataflow_mm_ray.sources.tables import read_table

_MERSENNE = (1 << 61) - 1
N_PERM = 128
# 32 bands x 4 rows: LSH similarity threshold ~ (1/b)^(1/r) = 0.42; a
# J=0.7 pair is missed with prob (1 - 0.7^4)^32 < 0.02%, J=0.6 < 0.9%.
# (With fixed permutations a 16-band geometry left ~2% of J~0.7 pairs
# permanently missed — observed on the recall fixture.)
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_W = 3


def _perm_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    # a < 2^31 and the shingle hash folded to 32 bits, so a*h + b fits
    # uint64 exactly (a*h < 2^63, b < 2^61) and the mod-(2^61-1)
    # identity holds — a true universal family over 32-bit inputs
    # (the previous 64-bit multiply wrapped mod 2^64 first).
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=N_PERM).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


_POLY_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_C = np.uint64(0xBF58476D1CE4E5B9)
_SHINGLE_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def _mix64(h: np.ndarray) -> np.ndarray:
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= _MIX_C
    h ^= h >> np.uint64(29)
    return h


def shingle_sets_batch(texts, w: int = SHINGLE_W) -> list[np.ndarray]:
    """Vectorized shingle sets for a batch of texts: sorted unique
    uint64 identities of the w-word shingles of each normalized text
    (whole text as one shingle if shorter; empty -> empty set).

    A shingle's identity is an order-sensitive polynomial combine of
    the SipHash word hashes (equality of identities == equality of the
    word tuple, up to negligible 64-bit collisions — the same identity
    the previous string-join implementation had), but the per-doc
    Python string work is gone: ONE vectorized normalize/split/hash
    pass per batch, then numpy window combines. Measured ~6x faster on
    the 1M-doc corpus, where shingling dominated the dedup pipelines.

    Tokenization is ASCII-whitespace (``[ \\t\\n\\r\\f\\v]``). NOTE this
    is wider than RE2 ``\\s`` (which excludes ``\\v``), so the DuckDB
    oracles use an explicit character class including ``chr(11)`` —
    never bare ``\\s`` — to match; with that, keep decisions agree on
    any input: non-ASCII whitespace (e.g. U+00A0) stays word-internal
    on BOTH sides."""
    import itertools

    s = pd.Series(texts, dtype=object)
    s = s.where(s.map(lambda t: isinstance(t, str)), "")
    ws = " \t\n\r\f\v"
    norm = (
        s.str.translate(_SHINGLE_PUNCT_TABLE)
        .str.lower()
        .str.strip(ws)
        .str.replace(f"[{ws}]+", " ", regex=True)
    )
    lists = norm.str.split(" ").map(lambda xs: [x for x in xs if x]).tolist()
    n = len(lists)
    counts = np.fromiter((len(x) for x in lists), dtype=np.int64, count=n)
    total = int(counts.sum())
    if total == 0:
        return [np.empty(0, dtype=np.uint64)] * n
    flat = np.empty(total, dtype=object)
    flat[:] = list(itertools.chain.from_iterable(lists))
    wh = stable_hash_array(flat)
    # window combine over the flat array (windows crossing a doc
    # boundary are sliced away below)
    if total >= w:
        poly = wh[: total - w + 1].copy()
        for j in range(1, w):
            poly = poly * _POLY_A + wh[j : total - w + 1 + j]
        poly = _mix64(poly)
    else:
        poly = np.empty(0, dtype=np.uint64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    out: list[np.ndarray] = []
    for i in range(n):
        c = int(counts[i])
        if c == 0:
            out.append(np.empty(0, dtype=np.uint64))
        elif c < w:
            seg = wh[offs[i] : offs[i] + c]
            h = seg[:1].copy()  # 1-element array: wraparound without scalar-overflow warnings
            for j in range(1, c):
                h = h * _POLY_A + seg[j : j + 1]
            out.append(_mix64(h))
        else:
            out.append(np.unique(poly[offs[i] : offs[i] + c - w + 1]))
    return out


def shingle_set(text: str, w: int = SHINGLE_W) -> np.ndarray:
    """Sorted unique uint64 shingle identities of one text (the
    single-doc view of ``shingle_sets_batch`` — one definition, so
    tests, oracles and the batched pipelines always agree)."""
    return shingle_sets_batch([text], w=w)[0]


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """N_PERM minhash values (uint64) via universal hashing mod 2^61-1."""
    if len(shingles) == 0:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    # fold the 64-bit shingle hash to 32 bits so the (a*h+b) product is
    # exact in uint64 (see _perm_params)
    hs = ((shingles >> np.uint64(32)) ^ shingles) & np.uint64(0xFFFFFFFF)
    prod = (_PERM_A[:, None] * hs[None, :] + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> np.uint64:
    """Sign-aggregated 64-bit signature over normalized word hashes
    (term frequency weighted)."""
    words = normalize_basic(text).split()
    if not words:
        return np.uint64(0)
    hs = stable_hash_array(np.asarray(words, dtype=object))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return sig


# bound the per-chunk (words x 64) int32 bit matrix of simhash64_batch:
# 4096 words x 64 x 4 B = 1 MB keeps the three matrix passes in L2 —
# measured 3.5x faster than a 64k-word chunk and 1.5x faster than the
# scalar per-doc loop on an 80-word/doc corpus
_SIMHASH_CHUNK_WORDS = 4096


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized ``simhash64`` over a sequence of texts — bit-identical
    to the scalar function (pinned in tests), but ONE ``hash_array``
    call and one segmented reduction per word chunk instead of a
    per-document Python loop. This is the hot signature kernel for
    ``simhash_dedup`` / ``simhash_neardup_first`` / the streaming
    scan's ``sh64`` column; the scalar form stays for single-row uses.

    sign rule per bit b of doc d: sum over words(2*bit-1) > 0
    ⇔ 2*S_b > n_words — computed as an integer inequality, so parity
    with the scalar vote loop is exact."""
    words_per = [
        normalize_basic(t if isinstance(t, str) else "").split() for t in texts
    ]
    n = len(words_per)
    out = np.zeros(n, dtype=np.uint64)
    if not n:
        return out
    counts = np.fromiter((len(w) for w in words_per), dtype=np.int64, count=n)
    total = int(counts.sum())
    if not total:
        return out
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # chunk over whole documents so each bit matrix stays small
    doc_lo = 0
    while doc_lo < n:
        doc_hi = doc_lo
        words_in_chunk = 0
        while doc_hi < n and (
            words_in_chunk == 0
            or words_in_chunk + counts[doc_hi] <= _SIMHASH_CHUNK_WORDS
        ):
            words_in_chunk += int(counts[doc_hi])
            doc_hi += 1
        if words_in_chunk:
            flat = np.empty(words_in_chunk, dtype=object)
            pos = 0
            for d in range(doc_lo, doc_hi):
                w = words_per[d]
                if w:
                    flat[pos:pos + len(w)] = w
                    pos += len(w)
            hs = stable_hash_array(flat)
            bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            nz = counts[doc_lo:doc_hi] > 0
            seg_starts = (starts[doc_lo:doc_hi] - starts[doc_lo])[nz]
            sums = np.add.reduceat(bits, seg_starts, axis=0)
            pos_votes = (2 * sums) > counts[doc_lo:doc_hi][nz, None]
            out[np.arange(doc_lo, doc_hi)[nz]] = (
                pos_votes.astype(np.uint64) << shifts
            ).sum(axis=1, dtype=np.uint64)
        doc_lo = doc_hi
    return out


# 16-bit popcount table for vectorized Hamming distance (numpy < 2.0
# has no bitwise_count)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    out = _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for s in (16, 32, 48):
        out += _POP16[((x >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


def hamming64(a: np.uint64, b: np.uint64) -> int:
    return int(bin(int(a) ^ int(b)).count("1"))


# ---------------------------------------------------------------------------
# distributed pipelines
# ---------------------------------------------------------------------------

def _band_rows(batch: pd.DataFrame) -> pd.DataFrame:
    """shingled doc row -> N_BANDS rows of (band_id, band_key, doc_id).
    Consumes the precomputed ``__sh`` column so the corpus is shingled
    exactly once; band keys are a vectorized splitmix-style fold of the
    band's ROWS_PER_BAND minhash values (equal signatures -> equal
    keys; 64-bit collisions are negligible, and buckets group by
    (band_id, band_key) so cross-band collisions are irrelevant)."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64), "band_id": pd.Series([], dtype=np.int32),
             "band_key": pd.Series([], dtype=np.int64)}
        )
    sigs = np.empty((n, N_PERM), dtype=np.uint64)
    for r, sh in enumerate(batch["__sh"].to_numpy()):
        sigs[r] = minhash_signature(np.frombuffer(sh, dtype=np.uint64))
    v = sigs.reshape(n, N_BANDS, ROWS_PER_BAND)
    k = np.full((n, N_BANDS), np.uint64(0x9E3779B97F4A7C15))
    for j in range(ROWS_PER_BAND):
        k = (k ^ v[:, :, j]) * np.uint64(0xBF58476D1CE4E5B9)
        k ^= k >> np.uint64(27)
    k *= np.uint64(0x94D049BB133111EB)
    k ^= k >> np.uint64(31)
    ids = np.repeat(batch["doc_id"].to_numpy().astype(np.int64), N_BANDS)
    bands = np.tile(np.arange(N_BANDS, dtype=np.int32), n)
    return pd.DataFrame(
        {"doc_id": ids, "band_id": bands, "band_key": k.reshape(-1).view(np.int64)}
    )


def _candidate_pairs(ds_shingled, max_bucket: int = 1000,
                     num_partitions: int = 16):
    """LSH banding -> candidate (lo, hi) doc pairs, deduplicated.
    ``ds_shingled`` carries the CANONICAL (doc_id, __sh) columns —
    shingle_docs has already renamed any caller id column."""
    # small batches: signature computation is per-row CPU work, so
    # parallelism comes from concurrent tasks
    bands = ds_shingled.map_batches(_band_rows, batch_format="pandas", batch_size=512)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_lo, out_hi = [], []
        for (_, _), grp in g.groupby(["band_id", "band_key"], sort=False):
            ids = np.sort(grp["doc_id"].to_numpy())
            if len(ids) < 2 or len(ids) > max_bucket:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            out_lo.append(ids[iu])
            out_hi.append(ids[ju])
        if not out_lo:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64), "hi": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"lo": np.concatenate(out_lo), "hi": np.concatenate(out_hi)}).drop_duplicates()

    # one shuffle: group band rows by band bucket. A pair found by
    # several bands may appear in several partitions; pairs are
    # globally deduplicated by the next keyed exchange (on ``lo``).
    from dataflow_mm_ray.partition import partition_map

    return partition_map(bands, "band_key", bucket_pairs, num_partitions=num_partitions)


def _keep_from_pairs(docs_ids_ds, verified_pairs_ds, id_col: str, num_partitions: int = 16):
    """Distributed first-wins keep decision: merge per-pair partials
    (partner counts; dup marks on the later member ``hi``) against the
    doc-id spine with ONE keyed exchange. Returns a Dataset of
    (id_col, keep, n_dup_partners) sorted by id within partitions."""
    from dataflow_mm_ray.partition import partition_map

    def pair_partials(b: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([b["lo"].to_numpy(), b["hi"].to_numpy()])
        part = pd.DataFrame({"doc_id": ids}).groupby("doc_id", as_index=False, sort=False).size()
        dup = pd.DataFrame({"doc_id": b["hi"].unique()})
        out = part.rename(columns={"size": "n_partners"})
        out["n_dup"] = out["doc_id"].isin(dup["doc_id"]).astype(np.int64)
        out["n_partners"] = out["n_partners"].astype(np.int64)
        out["is_doc"] = np.int64(0)
        return out[["doc_id", "n_partners", "n_dup", "is_doc"]]

    def doc_spine(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy().astype(np.int64),
                "n_partners": np.int64(0),
                "n_dup": np.int64(0),
                "is_doc": np.int64(1),
            }
        )

    partials = verified_pairs_ds.map_batches(pair_partials, batch_format="pandas")
    spine = docs_ids_ds.map_batches(doc_spine, batch_format="pandas")

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.groupby("doc_id", as_index=False, sort=False).sum()
        agg = agg[agg["is_doc"] > 0].sort_values("doc_id")
        return pd.DataFrame(
            {
                id_col: agg["doc_id"].to_numpy(),
                "keep": (agg["n_dup"].to_numpy() == 0),
                "n_dup_partners": agg["n_partners"].to_numpy().astype(np.int64),
            }
        )

    return partition_map(spine.union(partials), "doc_id", merge, num_partitions=num_partitions)


def shingle_docs(docs, id_col: str, text_col: str):
    """(id, text) Dataset -> (doc_id, __sh) Dataset of shingle-hash sets."""
    def shingle_batch(b: pd.DataFrame) -> pd.DataFrame:
        sets = shingle_sets_batch(b[text_col].tolist())
        # __sh is the RAW BYTES of the sorted uint64 set (consumers
        # np.frombuffer) — Arrow ships plain binary columns through the
        # exchanges far cheaper than list/tensor-extension arrays.
        # __ck is the exact-collapse exchange key (xor fold + length
        # mix), computed here so the collapse shuffle does no map work.
        ck = np.fromiter(
            ((np.bitwise_xor.reduce(s) if len(s) else np.uint64(0)) ^ np.uint64(2 * len(s))
             for s in sets),
            dtype=np.uint64, count=len(sets),
        )
        return pd.DataFrame(
            {
                "doc_id": b[id_col].to_numpy().astype(np.int64),
                "__sh": [s.tobytes() for s in sets],
                "__ck": ck.view(np.int64),
            }
        )

    return docs.map_batches(shingle_batch, batch_format="pandas", batch_size=512)


def exact_collapse(sh_all, num_partitions: int = 16):
    """EXACT-duplicate collapse before candidate generation: massive
    duplicate groups (the common case in raw crawls) otherwise explode
    the candidate set quadratically — a group of g copies lands whole in
    every band bucket and yields C(g, 2) pairs. Collapsing is
    semantics-exact for first-wins: every non-representative member has
    an EARLIER identical doc (its group's min-id representative;
    Jaccard 1 >= any threshold), so it is dropped unconditionally, and a
    representative's decision only ever depends on other
    representatives (a non-rep partner's shingle set equals its own
    rep's). One keyed exchange on the full-shingle-set hash. Returns
    the materialized membership Dataset (doc_id, __sh, __rep, __grp)."""
    from dataflow_mm_ray.partition import partition_map

    def collapse(part: pd.DataFrame) -> pd.DataFrame:
        # partitioned by the xor-fold key __ck; grouped by the EXACT
        # shingle bytes so fold collisions can never merge distinct
        # contents
        part = part.sort_values(["__sh", "doc_id"], kind="mergesort")
        # rep = group min (first in sort order); transform('first') stays
        # int64 — a where/ffill round-trips through float64 and corrupts
        # ids above 2^53 (snowflake-scale ids)
        rep_id = part.groupby("__sh", sort=False)["doc_id"].transform("first")
        out = part[["doc_id", "__sh"]].copy(deep=False)
        out["__rep"] = rep_id.to_numpy()
        out["__grp"] = part.groupby("__sh", sort=False)["doc_id"].transform("size").to_numpy().astype(np.int64)
        return out

    return partition_map(sh_all, "__ck", collapse, num_partitions=num_partitions).materialize()


def collapse_reps(membership):
    """Representative rows (doc_id, __sh) of the collapse, materialized
    (consumed by candidate generation AND both verification joins)."""
    def reps_only(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["doc_id"].to_numpy() == b["__rep"].to_numpy(), ["doc_id", "__sh"]]

    return membership.map_batches(reps_only, batch_format="pandas").materialize()


def minhash_lsh_dedup(sf_dir: str, threshold: float = 0.7, source: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text", ds=None,
                      num_partitions: int = 16):
    """Full MinHash-LSH near-dup pipeline, fully distributed. Returns a
    Dataset of (doc_id, keep, n_dup_partners) for every document; keep
    follows first-wins order (duplicate = later member of a verified
    pair)."""
    membership, sh, verified = minhash_verified_pairs(
        sf_dir, threshold, source, id_col, text_col, ds, num_partitions
    )
    rep_keep = _keep_from_pairs(sh, verified, id_col, num_partitions=num_partitions)
    return expand_rep_decisions(membership, rep_keep, id_col, num_partitions)


def minhash_verified_pairs(sf_dir: str, threshold: float = 0.7, source: str = "documents",
                           id_col: str = "doc_id", text_col: str = "text", ds=None,
                           num_partitions: int = 16):
    """The MinHash-LSH candidate + Jaccard-verify pipeline, exposed:
    returns ``(membership, sh, verified)`` — the exact-collapse
    membership, the representative shingle table, and the verified
    (lo, hi) pairs over representatives. Consumed by the first-wins
    keep (``minhash_lsh_dedup``) and the LSH-edged duplicate clustering
    (``stages/components.minhash_dup_clusters``)."""
    from dataflow_mm_ray.partition import hash_join

    docs = ds if ds is not None else read_table(sf_dir, source, columns=[id_col, text_col])
    # the shingled table is consumed by BOTH join passes — materialize
    # once so shingling doesn't run twice; blocks stay distributed in
    # the object store (spill-backed), never on the driver.
    sh_all = shingle_docs(docs, id_col, text_col)
    membership = exact_collapse(sh_all, num_partitions)
    sh = collapse_reps(membership)

    pairs = _candidate_pairs(sh, num_partitions=num_partitions)
    # NOTE: a pair can surface from several bands/partitions; duplicate
    # candidates ride through the two joins (cheap — the pair table is
    # small) and are deduplicated inside `verify`, whose input blocks
    # are the hi-keyed hash partitions, so all copies of a pair
    # co-locate there — no dedicated dedup exchange needed.

    # Jaccard verification as two partitioned hash joins of the pair
    # list against the shingled doc table (the docstring's promised
    # scale path — no driver collect, no whole-corpus broadcast).
    def as_lo_key(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={"lo": "doc_id"})

    j1 = hash_join(
        pairs.map_batches(as_lo_key, batch_format="pandas"), sh, "doc_id",
        num_partitions=num_partitions,
    )

    def rekey_hi(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["hi"].to_numpy(), "lo": b["doc_id"].to_numpy(), "__sh_lo": b["__sh"]}
        )

    j2 = hash_join(
        j1.map_batches(rekey_hi, batch_format="pandas"), sh, "doc_id",
        num_partitions=num_partitions,
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64), "hi": pd.Series([], dtype=np.int64)})
        # all copies of a duplicate candidate pair co-locate in this
        # hi-keyed partition block — dedup here, before the Jaccards
        b = b.drop_duplicates(subset=["lo", "doc_id"])
        lo = b["lo"].to_numpy().astype(np.int64)
        hi = b["doc_id"].to_numpy().astype(np.int64)
        jac = np.fromiter(
            (jaccard(np.frombuffer(a, dtype=np.uint64), np.frombuffer(c, dtype=np.uint64))
             for a, c in zip(b["__sh_lo"], b["__sh"])),
            dtype=np.float64,
            count=len(b),
        )
        m = jac >= threshold
        return pd.DataFrame({"lo": lo[m], "hi": hi[m]})

    # batch_size=None: batches == blocks == whole hash partitions, so
    # the in-verify dedup sees every copy of a pair
    verified = j2.map_batches(verify, batch_format="pandas", batch_size=None)
    return membership, sh, verified


def expand_rep_decisions(membership, rep_keep, id_col: str, num_partitions: int = 16):
    """Expand representative decisions back to every member: non-reps
    are dropped unconditionally (earlier exact duplicate exists);
    partner counts add the (group_size - 1) exact partners to the
    representative-level near-dup count (group-collapsed diagnostic)."""
    from dataflow_mm_ray.partition import hash_join

    def rekey_rep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"__rep": b[id_col].to_numpy(), "__rkeep": b["keep"].to_numpy(),
             "__rpartners": b["n_dup_partners"].to_numpy()}
        )

    mem = membership.map_batches(
        lambda b: b[["doc_id", "__rep", "__grp"]].rename(columns={"doc_id": id_col}),
        batch_format="pandas",
    )
    joined = hash_join(
        mem, rep_keep.map_batches(rekey_rep, batch_format="pandas"), "__rep",
        num_partitions=num_partitions,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64), "keep": pd.Series([], dtype=bool),
                 "n_dup_partners": pd.Series([], dtype=np.int64)}
            )
        is_rep = b[id_col].to_numpy() == b["__rep"].to_numpy()
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "keep": is_rep & b["__rkeep"].to_numpy(),
                "n_dup_partners": (
                    b["__rpartners"].to_numpy(dtype=np.int64)
                    + b["__grp"].to_numpy(dtype=np.int64) - 1
                ),
            }
        ).sort_values(id_col)

    return joined.map_batches(finish, batch_format="pandas")


def ngram_jaccard_dedup(sf_dir: str, threshold: float = 0.5, source: str = "documents",
                        id_col: str = "doc_id", text_col: str = "text", ds=None,
                        num_partitions: int = 16, max_posting: int | None = None):
    """EXACT n-gram Jaccard near-dup via a distributed inverted index —
    no LSH approximation, no driver collect. Returns (doc_id, keep):
    keep is False iff some earlier doc has word-``SHINGLE_W``-gram
    Jaccard >= ``threshold`` (first-wins, the order rule of
    image_deduplication_filter.py:143-157 over text shingles).

    Pipeline (three keyed exchanges, all vectorized):

    1. shingle + exact-duplicate collapse (shared with MinHash-LSH —
       duplicate groups cost one representative, not C(g, 2) pairs);
    2. explode representatives to (shingle, doc_id, set_size) postings;
       ``partition_map(shingle)`` self-merges each posting list —
       every co-occurring pair (lo < hi) carries both set sizes, and a
       per-partition groupby pre-aggregates partial intersection
       counts (the combiner before the pair exchange);
    3. ``partition_map(lo)`` sums intersections per pair and applies
       jaccard = inter / (n_lo + n_hi - inter) >= threshold; the
       verified pairs feed the shared first-wins keep merge and the
       collapse-membership expansion.

    Documents with NO shingles (empty normalized text) produce no
    postings and are always kept — "no shingles" is no evidence of
    duplication (they bypass the collapse so identical empties don't
    first-wins each other; the SQL oracle agrees).

    Scale: cost is sum over shingles of |posting|^2. Exact-collapse
    bounds the duplicate-explosion case; for web-scale corpora where
    distinct documents share hot phrases, cap posting lists with
    ``max_posting`` (hot shingles are dropped from the index — counts
    become a documented lower bound) or use minhash_lsh_dedup. The
    registered query runs exact (sf posting max ~7).

    Engine shingles are 64-bit identities (shingle_sets_batch, same
    ASCII-whitespace tokenization as the oracle's RE2 regexes), the
    oracle uses the shingle strings; a 64-bit collision inside one
    document's set is the only (negligible, ~1e-13 at 10^6 shingles)
    divergence."""
    membership, ne_membership, sh, verified = ngram_verified_pairs(
        sf_dir, threshold, source, id_col, text_col, ds, num_partitions, max_posting
    )
    rep_keep = _keep_from_pairs(sh, verified, id_col, num_partitions=num_partitions)
    expanded = expand_rep_decisions(ne_membership, rep_keep, id_col, num_partitions)

    def empty_keep(b: pd.DataFrame) -> pd.DataFrame:
        m = np.fromiter((len(s) == 0 for s in b["__sh"]), dtype=bool, count=len(b))
        return pd.DataFrame(
            {id_col: b.loc[m, "doc_id"].to_numpy().astype(np.int64),
             "keep": np.ones(int(m.sum()), dtype=bool)}
        )

    empties = membership.map_batches(empty_keep, batch_format="pandas")
    return expanded.map_batches(
        lambda b: b[[id_col, "keep"]], batch_format="pandas"
    ).union(empties)


def ngram_verified_pairs(sf_dir: str, threshold: float = 0.5, source: str = "documents",
                         id_col: str = "doc_id", text_col: str = "text", ds=None,
                         num_partitions: int = 16, max_posting: int | None = None):
    """The shared exact-n-gram pair pipeline (shingle → exact collapse →
    inverted-index partials → Jaccard verify). Returns
    ``(membership, ne_membership, sh, verified)``: the full collapse
    membership, its non-empty subset (materialized), the representative
    shingle table (materialized), and the verified (lo, hi) pair
    Dataset over representatives. Consumed by both the first-wins keep
    (``ngram_jaccard_dedup``) and the duplicate-cluster labeling
    (``stages/components.ngram_dup_clusters``)."""
    from dataflow_mm_ray.partition import partition_map

    docs = ds if ds is not None else read_table(sf_dir, source, columns=[id_col, text_col])
    sh_all = shingle_docs(docs, id_col, text_col)
    membership = exact_collapse(sh_all, num_partitions)

    def nonempty(b: pd.DataFrame) -> pd.DataFrame:
        return b[np.fromiter((len(s) > 0 for s in b["__sh"]), dtype=bool, count=len(b))]

    # materialized: consumed by both collapse_reps and the final
    # expansion (CLAUDE.md multi-pass rule)
    ne_membership = membership.map_batches(nonempty, batch_format="pandas").materialize()
    sh = collapse_reps(ne_membership)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"sh": pd.Series([], dtype=np.int64), "doc_id": pd.Series([], dtype=np.int64),
                 "nsh": pd.Series([], dtype=np.int64)}
            )
        shs = [np.frombuffer(s, dtype=np.uint64) for s in b["__sh"]]
        counts = np.fromiter((len(s) for s in shs), dtype=np.int64, count=len(shs))
        return pd.DataFrame(
            {
                "sh": np.concatenate(shs).view(np.int64),
                "doc_id": np.repeat(b["doc_id"].to_numpy().astype(np.int64), counts),
                "nsh": np.repeat(counts, counts),
            }
        )

    postings = sh.map_batches(explode, batch_format="pandas")

    def pair_partials(part: pd.DataFrame) -> pd.DataFrame:
        if max_posting is not None:
            sizes = part.groupby("sh", sort=False)["doc_id"].transform("size")
            part = part[sizes.to_numpy() <= max_posting]
        m = part.merge(part, on="sh", suffixes=("", "_b"))
        m = m[m["doc_id"].to_numpy() < m["doc_id_b"].to_numpy()]
        if not len(m):
            return pd.DataFrame(
                {"lo": pd.Series([], dtype=np.int64), "hi": pd.Series([], dtype=np.int64),
                 "inter": pd.Series([], dtype=np.int64), "n_lo": pd.Series([], dtype=np.int64),
                 "n_hi": pd.Series([], dtype=np.int64)}
            )
        agg = m.groupby(["doc_id", "doc_id_b"], sort=False).agg(
            inter=("sh", "size"), n_lo=("nsh", "first"), n_hi=("nsh_b", "first")
        ).reset_index()
        return agg.rename(columns={"doc_id": "lo", "doc_id_b": "hi"})

    partials = partition_map(postings, "sh", pair_partials, num_partitions=num_partitions)

    def verify(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame(
                {"lo": pd.Series([], dtype=np.int64), "hi": pd.Series([], dtype=np.int64)}
            )
        agg = part.groupby(["lo", "hi"], sort=False).agg(
            inter=("inter", "sum"), n_lo=("n_lo", "first"), n_hi=("n_hi", "first")
        ).reset_index()
        inter = agg["inter"].to_numpy(dtype=np.float64)
        union = agg["n_lo"].to_numpy(dtype=np.float64) + agg["n_hi"].to_numpy(dtype=np.float64) - inter
        keep = inter / union >= threshold
        return agg.loc[keep, ["lo", "hi"]]

    verified = partition_map(partials, "lo", verify, num_partitions=num_partitions)
    return membership, ne_membership, sh, verified


def simhash_dedup(sf_dir: str, max_hamming: int = 3, source: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text", ds=None,
                  max_bucket: int = 4096, num_partitions: int = 16):
    """SimHash near-dup with 4x16-bit banding, fully distributed.
    Returns a Dataset of (doc_id, simhash, keep): keep is False iff some
    earlier doc (lower doc_id) is within ``max_hamming`` — identical to
    a sequential first-wins scan (the candidate set is exact for
    max_hamming <= 3 by pigeonhole over the 4 blocks)."""
    from dataflow_mm_ray.partition import partition_map

    docs = ds if ds is not None else read_table(sf_dir, source, columns=[id_col, text_col])

    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = simhash64_batch(batch[text_col])
        return pd.DataFrame(
            {"doc_id": batch[id_col].to_numpy().astype(np.int64), "simhash": sigs.astype(np.int64)}
        )

    signed = docs.map_batches(sign, batch_format="pandas", batch_size=512).materialize()
    return banded_first_wins(signed, max_hamming=max_hamming, max_bucket=max_bucket,
                             num_partitions=num_partitions)


def simhash64_md5(text: str) -> np.uint64:
    """``simhash64`` with an md5-derived word hash (first 16 hex chars
    as a 64-bit value) instead of SipHash — identical sign-aggregation
    semantics, but reproducible in SQL, so the banded pipeline gets a
    full DuckDB oracle (``simhash_dedup_exact``). The SipHash path
    stays the production default (vectorized, no per-word digest)."""
    import hashlib

    words = normalize_basic(text).split()
    if not words:
        return np.uint64(0)
    hs = np.asarray(
        [int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16) for w in words],
        dtype=np.uint64,
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return sig


def simhash_md5_dedup(sf_dir: str, max_hamming: int = 3, source: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text",
                      num_partitions: int = 16):
    """simhash_dedup over the md5 word-hash signature (SQL-oracled
    twin); same banded 4x16 pigeonhole first-wins (exact for k <= 3)."""
    from dataflow_mm_ray.sources.tables import read_table

    docs = read_table(sf_dir, source, columns=[id_col, text_col])

    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.asarray(
            [simhash64_md5(t if isinstance(t, str) else "") for t in batch[text_col]],
            dtype=np.uint64,
        )
        return pd.DataFrame(
            {"doc_id": batch[id_col].to_numpy().astype(np.int64),
             "simhash": sigs.astype(np.int64)}
        )

    signed = docs.map_batches(sign, batch_format="pandas", batch_size=512).materialize()
    out = banded_first_wins(signed, max_hamming=max_hamming, num_partitions=num_partitions)
    return out.map_batches(lambda b: b[["doc_id", "keep"]], batch_format="pandas")


def banded_first_wins(signed, max_hamming: int = 3, max_bucket: int = 4096,
                      num_partitions: int = 16):
    """The banded Hamming first-wins core shared by SimHash (text) and
    SRP (embedding) near-dup: ``signed`` is a (doc_id, simhash)
    Dataset; returns (doc_id, simhash, keep) — see ``simhash_dedup``."""
    from dataflow_mm_ray.partition import partition_map

    def band(b: pd.DataFrame) -> pd.DataFrame:
        sig = b["simhash"].to_numpy().astype(np.uint64)
        ids = b["doc_id"].to_numpy()
        frames = []
        for blk in range(4):
            key16 = ((sig >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "bk": (np.int64(blk) << np.int64(16)) | key16,
                        "doc_id": ids,
                        "simhash": b["simhash"].to_numpy(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    bands = signed.map_batches(band, batch_format="pandas")

    def bucket_min(part: pd.DataFrame) -> pd.DataFrame:
        """Per bucket: for each doc, the min doc_id within max_hamming
        among bucket members (including itself)."""
        out_id, out_dmin = [], []
        for _, grp in part.groupby("bk", sort=False):
            sigs = grp["simhash"].to_numpy().astype(np.uint64)
            ids = grp["doc_id"].to_numpy()
            u, inv = np.unique(sigs, return_inverse=True)
            if len(u) > max_bucket:
                continue  # degenerate bucket: dropped, never mis-deduped
            # min doc_id per unique signature
            m = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(m, inv, ids)
            # pairwise Hamming between unique sigs in bounded stripes
            # (a full u x u uint64 matrix at max_bucket=4096 costs
            # ~0.5-1 GB of temporaries per bucket), then per-sig min of
            # m over sigs within distance k
            dm = np.empty(len(u), dtype=np.int64)
            stripe = 256
            big = np.iinfo(np.int64).max
            for s0 in range(0, len(u), stripe):
                us_ = u[s0 : s0 + stripe]
                ham = _popcount64(us_[:, None] ^ u[None, :])
                dm[s0 : s0 + stripe] = np.where(
                    ham <= max_hamming, m[None, :], big
                ).min(axis=1)
            out_id.append(ids)
            out_dmin.append(dm[inv])
        if not out_id:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64), "dmin": pd.Series([], dtype=np.int64),
                 "simhash": pd.Series([], dtype=np.int64), "is_doc": pd.Series([], dtype=np.int64)}
            )
        ids = np.concatenate(out_id)
        return pd.DataFrame(
            {"doc_id": ids, "dmin": np.concatenate(out_dmin),
             "simhash": np.zeros(len(ids), dtype=np.int64), "is_doc": np.zeros(len(ids), dtype=np.int64)}
        )

    bucket_out = partition_map(bands, "bk", bucket_min, num_partitions=num_partitions)

    def spine(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(), "dmin": b["doc_id"].to_numpy(),
             "simhash": b["simhash"].to_numpy(), "is_doc": np.ones(len(b), dtype=np.int64)}
        )

    base = signed.map_batches(spine, batch_format="pandas")

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.groupby("doc_id", as_index=False, sort=False).agg(
            dmin=("dmin", "min"), simhash=("simhash", "sum"), is_doc=("is_doc", "sum")
        )
        agg = agg[agg["is_doc"] > 0].sort_values("doc_id")
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].to_numpy(),
                "simhash": agg["simhash"].to_numpy(),  # only the spine row carries it
                "keep": agg["dmin"].to_numpy() >= agg["doc_id"].to_numpy(),
            }
        )

    return partition_map(base.union(bucket_out), "doc_id", merge, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# embedding near-dup scale path: SRP-LSH (random hyperplane signatures)
# ---------------------------------------------------------------------------

def _srp_planes(dim: int, n_bits: int = 64, seed: int = 23) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, n_bits))


def srp_signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-random-projection signature: bit j = (v . plane_j) > 0.
    P[bit differs] = angle/pi, so Hamming distance on the 64-bit
    signature estimates the angle — the scalable surrogate for the
    O(n^2) cosine matrix of ``embedding_neardup``."""
    bits = (mat @ planes) > 0
    out = np.zeros(len(mat), dtype=np.uint64)
    for j in range(bits.shape[1]):
        out |= bits[:, j].astype(np.uint64) << np.uint64(j)
    return out


def embedding_srp_neardup(sf_dir: str, max_hamming: int = 10,
                          source: str = "embeddings", id_col: str = "vec_id",
                          emb_col: str = "embedding", ds=None,
                          num_partitions: int = 16):
    """Embedding-cosine near-dup at scale: SRP signatures -> the same
    banded 4x16-bit first-wins pipeline as SimHash (exact candidate
    set holds only for max_hamming <= 3; larger thresholds trade
    recall, like any banded LSH). Returns (vec_id, simhash, keep),
    keep = no earlier vector within ``max_hamming`` signature bits
    (~ angle < max_hamming/64 * pi)."""
    docs = ds if ds is not None else read_table(sf_dir, source, columns=[id_col, emb_col])

    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[emb_col].to_numpy()).astype(np.float64)
        planes = _srp_planes(mat.shape[1])
        return pd.DataFrame(
            {"doc_id": batch[id_col].to_numpy().astype(np.int64),
             "simhash": srp_signatures(mat, planes).astype(np.int64)}
        )

    signed = docs.map_batches(sign, batch_format="pandas", batch_size=512).materialize()
    out = banded_first_wins(signed, max_hamming=max_hamming, num_partitions=num_partitions)

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={"doc_id": id_col})

    return out.map_batches(rename, batch_format="pandas")


# ---------------------------------------------------------------------------
# batch twin of the streamed SimhashNearDupFirst processor


def simhash_neardup_first(sf_dir: str, max_hamming: int = 3, ds=None,
                          num_partitions: int = 16, hash_kind: str = "siphash"):
    """Batch twin of ``streaming.processor.SimhashNearDupFirst``: over
    the transcript table, emit one edge row per (band, bucket) from
    every turn to its bucket's event-time-FIRST turn (minimum
    (ts_us, conv_id, turn_idx)) when the full 64-bit Hamming distance
    <= ``max_hamming``. Signatures are the engine scan's: SimHash of
    the id-stripped text (the same strip rule as dk1/dk2). One keyed
    exchange on the (band, bucket) id; per-bucket work is a vectorized
    winner pick + Hamming popcount.

    ``hash_kind="md5"`` swaps the per-word SipHash for the
    md5-derived word hash (``simhash64_md5``) with identical banding /
    winner / edge semantics — the SQL-recomputable twin used by the
    driver-visible oracle (``queries_dedup.q_simhash_neardup_first``);
    the vectorized SipHash path stays the production default."""
    import pandas as pd

    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events
    from dataflow_mm_ray.streaming.engine import _DEDUP_KEY_RE

    t = ds if ds is not None else transcripts_from_events(sf_dir)

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        key = (b["text"].fillna("").str.replace(_DEDUP_KEY_RE, " ", regex=True)
               .to_numpy(dtype=object))
        uniq, inv = np.unique(key, return_inverse=True)
        if hash_kind == "md5":
            sigs = np.asarray([simhash64_md5(x) for x in uniq],
                              dtype=np.uint64)[inv]
        else:
            sigs = simhash64_batch(uniq)[inv]
        conv = b["conv_id"].to_numpy()
        turn = b["turn_idx"].to_numpy(dtype=np.int32)
        ts = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        n = len(b)
        parts = []
        for band in range(4):
            slice_ = ((sigs >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pd.DataFrame({
                "bb": (np.int64(band) << np.int64(16)) | slice_,
                "sh64": sigs.view(np.int64),
                "conv_id": conv,
                "turn_idx": turn,
                "ts_us": ts,
            }))
        return pd.concat(parts, ignore_index=True)

    br = t.map_batches(band_rows, batch_format="pandas")

    def per_bucket(part: pd.DataFrame) -> pd.DataFrame:
        # part arrives sorted by (bb, ts_us, conv_id, turn_idx)
        w = part.drop_duplicates("bb", keep="first")[
            ["bb", "sh64", "conv_id", "turn_idx", "ts_us"]
        ].rename(columns={"sh64": "w_sh64", "conv_id": "winner_conv_id",
                          "turn_idx": "winner_turn_idx",
                          "ts_us": "winner_ts_us"})
        j = part.merge(w, on="bb", how="left")
        self_mask = (
            (j["conv_id"] == j["winner_conv_id"]).to_numpy(dtype=bool)
            & (j["turn_idx"].to_numpy(dtype=np.int64)
               == j["winner_turn_idx"].to_numpy(dtype=np.int64))
            & (j["ts_us"].to_numpy(dtype=np.int64)
               == j["winner_ts_us"].to_numpy(dtype=np.int64))
        )
        losers = j[~self_mask]
        ham = _popcount64(
            losers["sh64"].to_numpy(dtype=np.int64).view(np.uint64)
            ^ losers["w_sh64"].to_numpy(dtype=np.int64).view(np.uint64)
        )
        keep = ham <= max_hamming
        close = losers[keep]
        bb = close["bb"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "band": (bb >> 16).astype(np.int32),
            "bucket": (bb & np.int64(0xFFFF)).astype(np.int64),
            "winner_conv_id": close["winner_conv_id"].to_numpy(),
            "winner_turn_idx": close["winner_turn_idx"].to_numpy(dtype=np.int32),
            "winner_ts_us": close["winner_ts_us"].to_numpy(dtype=np.int64),
            "conv_id": close["conv_id"].to_numpy(),
            "turn_idx": close["turn_idx"].to_numpy(dtype=np.int32),
            "ts_us": close["ts_us"].to_numpy(dtype=np.int64),
            "hamming": ham[keep].astype(np.int64),
        })

    return partition_map(br, "bb", per_bucket, num_partitions=num_partitions,
                         sort_by=["bb", "ts_us", "conv_id", "turn_idx"])
