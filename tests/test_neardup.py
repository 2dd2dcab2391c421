"""Near-dup pipelines: recall on injected near-duplicates, precision of
verification, first-wins order, determinism."""
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.stages.neardup import (
    hamming64,
    jaccard,
    minhash_signature,
    shingle_set,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees "
    "as morning light spreads across the quiet village square slowly"
)


def _mutate(text: str, n_swaps: int, seed: int) -> str:
    rng = np.random.RandomState(seed)
    words = text.split()
    for _ in range(n_swaps):
        i = rng.randint(len(words))
        words[i] = f"tok{rng.randint(1000)}"
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(42)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    for i in range(60):
        rows.append(" ".join(rng.choice(vocab, size=60)))
    # inject near-dup clusters: docs 60/61 ~ BASE, 62 ~ light mutation,
    # 63 exact dup of 60, 64 heavy mutation (not a dup)
    rows += [BASE, _mutate(BASE, 2, 1), _mutate(BASE, 4, 2), BASE, _mutate(BASE, 30, 3)]
    return pd.DataFrame({"doc_id": range(len(rows)), "text": rows})


def test_minhash_estimates_jaccard():
    a = shingle_set(BASE)
    b = shingle_set(_mutate(BASE, 3, 9))
    true_j = jaccard(a, b)
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = (sa == sb).mean()
    assert abs(est - true_j) < 0.25
    assert (minhash_signature(a) == sa).all()  # deterministic


def test_minhash_lsh_dedup_recall_and_first_wins(ray_session, corpus, tmp_path):
    import ray.data as rd

    from dataflow_mm_ray.stages.neardup import minhash_lsh_dedup

    out = minhash_lsh_dedup("", threshold=0.5, ds=rd.from_pandas(corpus)).to_pandas()
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep[60]  # first occurrence survives
    assert not keep[63]  # exact dup of 60 dropped
    assert not keep[61]  # near dup dropped
    assert keep[64]  # heavy mutation survives
    # random word-salad docs must be untouched
    assert all(keep[i] for i in range(60))


def test_simhash_near_and_far():
    s1 = simhash64(BASE)
    s2 = simhash64(_mutate(BASE, 2, 5))
    s3 = simhash64(" ".join(f"z{i}" for i in range(60)))
    assert hamming64(s1, s2) <= 12
    assert hamming64(s1, s3) > 12
    assert simhash64(BASE) == s1  # deterministic


def test_simhash_dedup_first_wins(ray_session, corpus):
    import ray.data as rd

    from dataflow_mm_ray.stages.neardup import simhash_dedup

    out = simhash_dedup("", max_hamming=3, ds=rd.from_pandas(corpus)).to_pandas()
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep[60]
    assert not keep[63]  # identical text -> hamming 0 -> dropped


def test_simhash_distributed_equals_sequential_scan(ray_session, corpus):
    """The distributed banded pipeline must be bit-identical to the
    naïve sequential first-wins scan (dup iff an earlier doc is within
    max_hamming)."""
    import ray.data as rd

    from dataflow_mm_ray.stages.neardup import hamming64, simhash64, simhash_dedup

    out = (
        simhash_dedup("", max_hamming=3, ds=rd.from_pandas(corpus))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sigs = [simhash64(t) for t in corpus["text"]]
    seq_keep = []
    for j in range(len(sigs)):
        dup = any(hamming64(sigs[i], sigs[j]) <= 3 for i in range(j))
        seq_keep.append(not dup)
    assert list(out["doc_id"]) == list(corpus["doc_id"])
    assert list(out["keep"]) == seq_keep
    assert [int(s) for s in out["simhash"].to_numpy().astype("uint64")] == [int(s) for s in sigs]


def test_minhash_dedup_partition_independence(ray_session, corpus):
    """Same rows at any partition count (determinism / shuffle-order
    independence is a core engine claim)."""
    import ray.data as rd

    from dataflow_mm_ray.stages.neardup import minhash_lsh_dedup

    a = (
        minhash_lsh_dedup("", threshold=0.5, ds=rd.from_pandas(corpus), num_partitions=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        minhash_lsh_dedup("", threshold=0.5, ds=rd.from_pandas(corpus), num_partitions=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_srp_neardup_recall_vs_exact(ray_session):
    """SRP signatures must catch exact/near-duplicate embeddings and
    keep dissimilar ones, in first-wins order."""
    import ray.data as rd

    from dataflow_mm_ray.stages.neardup import embedding_srp_neardup

    rng = np.random.RandomState(4)
    base = rng.normal(size=(40, 32))
    rows = [base[i] for i in range(40)]
    rows.append(base[0].copy())                      # 40: exact dup of 0
    rows.append(base[1] + rng.normal(0, 1e-3, 32))   # 41: near dup of 1
    rows.append(base[2] * 5.0)                       # 42: same direction as 2 -> dup
    df = pd.DataFrame({"vec_id": range(len(rows)), "embedding": rows})
    out = (
        embedding_srp_neardup("", ds=rd.from_pandas(df), max_hamming=3)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    keep = dict(zip(out["vec_id"], out["keep"]))
    assert keep[0] and keep[1] and keep[2]   # first occurrences survive
    assert not keep[40]                      # exact dup dropped
    assert not keep[41]                      # near dup dropped
    assert not keep[42]                      # scale-invariant (cosine) dup dropped
    # independent random vectors survive
    assert sum(keep[i] for i in range(40)) >= 38
    # deterministic
    again = (
        embedding_srp_neardup("", ds=rd.from_pandas(df), max_hamming=3)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, again)


def _brute_force_ngram_keep(texts, threshold):
    """Sequential first-wins oracle: doc i kept iff no j<i with
    shingle-Jaccard >= threshold; empty shingle sets never match."""
    sets = [shingle_set(t) for t in texts]
    keep = []
    for i, si in enumerate(sets):
        dup = False
        if len(si):
            for j in range(i):
                if len(sets[j]) and jaccard(sets[j], si) >= threshold:
                    dup = True
                    break
        keep.append(not dup)
    return np.array(keep)


def test_ngram_jaccard_exact_vs_sequential(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.stages.neardup import ngram_jaccard_dedup

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(40)]
    texts += [BASE, _mutate(BASE, 2, 1), BASE, _mutate(BASE, 30, 2)]
    texts += ["", "   ", "!!!", "two words", "two words", "three tiny words"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    want = _brute_force_ngram_keep(texts, 0.5)
    for p in (1, 5):
        got = (
            ngram_jaccard_dedup(None, threshold=0.5, ds=rd.from_pandas(df), num_partitions=p)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert got["doc_id"].tolist() == list(range(len(texts)))
        np.testing.assert_array_equal(got["keep"].to_numpy(), want)
    # empty/punct-only docs are always kept, even repeated ones
    empty_ids = [44, 45, 46]
    assert want[empty_ids].all()


def test_ngram_tokenization_matches_oracle_on_unicode_ws():
    """Engine tokenization is ASCII-whitespace (RE2 \\s semantics), so
    non-ASCII whitespace stays word-internal on BOTH engine and oracle
    sides — keep decisions agree on such input."""
    import duckdb

    texts = [
        "hello\xa0world foo bar baz",       # U+00A0 inside a "word"
        "hello world foo bar baz",
        "tab\tseparated words here now",    # ASCII tab IS whitespace
        " em-space lead trail ",
    ]
    engine_sets = [shingle_set(t) for t in texts]
    con = duckdb.connect()
    PUNCT = r"[\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]"
    WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    for t, got in zip(texts, engine_sets):
        n_words, n_sh = con.execute(
            f"""
            WITH norm AS (SELECT regexp_replace(trim(lower(regexp_replace(?, '{PUNCT}', '', 'g')), {WS}),
                                 '\\s+', ' ', 'g') AS nt),
            words AS (SELECT string_split(nt, ' ') AS ws FROM norm WHERE nt <> ''),
            sh AS (SELECT DISTINCT sh FROM (SELECT unnest(CASE WHEN len(ws) < 3 THEN [array_to_string(ws,' ')]
                        ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END) AS sh FROM words))
            SELECT (SELECT len(ws) FROM words), (SELECT count(*) FROM sh)
            """,
            [t],
        ).fetchone()
        assert len(got) == n_sh, (t, len(got), n_sh)


def test_simhash64_batch_bit_identical_to_scalar():
    """The vectorized signature kernel must match the scalar simhash64
    bit-for-bit — including empties, None, unicode, punctuation-only
    and docs longer than the chunk bound."""
    import random
    import string

    import dataflow_mm_ray.stages.neardup as nd

    random.seed(11)
    vocab = ["".join(random.choices(string.ascii_lowercase, k=random.randint(1, 8)))
             for _ in range(200)]
    texts = ["", "   ", None, "one", "Hello, World! hello", "!!! ??? ...",
             "ünïcode wörds ünïcode", "x " * (nd._SIMHASH_CHUNK_WORDS + 50)] + [
        " ".join(random.choices(vocab, k=random.randint(0, 120)))
        for _ in range(300)
    ]
    got = nd.simhash64_batch(texts)
    want = np.asarray(
        [nd.simhash64(t if isinstance(t, str) else "") for t in texts],
        dtype=np.uint64,
    )
    assert (got == want).all()

    # chunk boundaries never change the result
    old = nd._SIMHASH_CHUNK_WORDS
    try:
        nd._SIMHASH_CHUNK_WORDS = 17
        assert (nd.simhash64_batch(texts) == want).all()
    finally:
        nd._SIMHASH_CHUNK_WORDS = old
