"""Distributed connected components over near-duplicate graphs —
duplicate CLUSTERING (cluster-then-canonicalize), the complement of
the first-wins keep/drop dedups in ``stages/neardup.py``.

The reference's dedups are destructive first-wins scans
(``dataflow/operators/core_vision/filter/image_deduplication_filter.py:143-157``);
a production training-data pipeline additionally needs the duplicate
*clusters* themselves: pick-best-per-cluster selection, cluster-size
distributions, contamination audits, duplicate-aware sampling weights.
This operator labels every document with the minimum doc id of its
connected component in the verified near-dup pair graph.

Algorithm: BSP min-label propagation with pointer jumping (the
"hash-min + path halving" scheme used by large-scale CC systems).
Each round is two keyed exchanges:

1. neighbor propagation — every symmetric edge ships its source's
   current label to its destination; a keyed min per destination joins
   the node's own label (``comp' = min(comp, min over in-labels)``);
2. pointer jumping — ``comp'' = comp'[comp']``: each node adopts its
   label's label, halving label-chain lengths so a path graph
   converges in O(log n) rounds instead of O(n).

Rounds are driver-coordinated BSP supersteps (the labels Dataset is
materialized per round — blocks stay distributed; the driver holds
only a per-round changed-count scalar). At 100-TB scale the labels
table is one row per *document* and the edge table one row per
verified near-dup pair — both far smaller than the corpus, and every
step is a keyed exchange with vectorized pandas kernels.

Determinism: stable hash partitioning + min aggregates — identical
output at any ``num_partitions``/round schedule.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def _min_label_per_node(part: pd.DataFrame) -> pd.DataFrame:
    if not len(part):
        return pd.DataFrame(
            {"node": pd.Series([], dtype=np.int64), "comp": pd.Series([], dtype=np.int64)}
        )
    agg = part.groupby("node", sort=False)["comp"].min().reset_index()
    return agg


def connected_components(edges, num_partitions: int = 16, max_rounds: int = 64):
    """Connected components of the undirected graph given by ``edges``
    (a Dataset with int64 columns ``lo``/``hi``, one row per edge).

    Returns a materialized Dataset ``(node, comp)`` with one row per
    distinct endpoint; ``comp`` is the minimum node id reachable from
    ``node``. Nodes with no edges do not appear (callers union their
    isolated nodes as self-labeled rows, exactly once).
    """
    from dataflow_mm_ray.partition import hash_join, partition_map

    def symmetrize(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"src": pd.Series([], dtype=np.int64), "dst": pd.Series([], dtype=np.int64)}
            )
        lo = b["lo"].to_numpy(dtype=np.int64)
        hi = b["hi"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([lo, hi]), "dst": np.concatenate([hi, lo])}
        )

    # consumed once per round — materialize so rounds don't re-run the
    # upstream pair pipeline (CLAUDE.md multi-pass rule)
    sym = edges.map_batches(symmetrize, batch_format="pandas").materialize()

    def init_labels(part: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(part["src"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"node": nodes, "comp": nodes})

    labels = partition_map(sym, "src", init_labels, num_partitions=num_partitions).materialize()

    for _ in range(max_rounds):
        # 1) ship each edge source's label to its destination
        def edge_key(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={"src": "node"})

        msgs = hash_join(
            sym.map_batches(edge_key, batch_format="pandas"), labels, "node",
            num_partitions=num_partitions,
        )

        def to_incoming(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": b["dst"].to_numpy(dtype=np.int64),
                 "comp": b["comp"].to_numpy(dtype=np.int64)}
            )

        incoming = msgs.map_batches(to_incoming, batch_format="pandas")
        # own label participates in the min (comp' = min(comp, in-min))
        merged = partition_map(
            incoming.union(labels), "node", _min_label_per_node,
            num_partitions=num_partitions,
        )

        # 2) pointer jump: comp'' = comp'[comp']. Every label value is a
        # node id present in the labels table, so the inner join is total.
        def by_ptr(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": b["node"].to_numpy(dtype=np.int64),
                 "__ptr": b["comp"].to_numpy(dtype=np.int64)}
            )

        def ptr_side(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"__ptr": b["node"].to_numpy(dtype=np.int64),
                 "__pcomp": b["comp"].to_numpy(dtype=np.int64)}
            )

        merged = merged.materialize()
        jumped = hash_join(
            merged.map_batches(by_ptr, batch_format="pandas"),
            merged.map_batches(ptr_side, batch_format="pandas"),
            "__ptr", num_partitions=num_partitions,
        )

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": b["node"].to_numpy(dtype=np.int64),
                 "comp": np.minimum(b["__ptr"].to_numpy(dtype=np.int64),
                                    b["__pcomp"].to_numpy(dtype=np.int64))}
            )

        new_labels = jumped.map_batches(finish, batch_format="pandas").materialize()

        # convergence: count label changes (tiny per-partition scalars)
        def changed_count(part: pd.DataFrame) -> pd.DataFrame:
            g = part.groupby("node", sort=False)["comp"]
            return pd.DataFrame({"changed": [int((g.max() != g.min()).sum())]})

        delta = partition_map(
            labels.union(new_labels), "node", changed_count,
            num_partitions=num_partitions,
        ).sum("changed")
        labels = new_labels
        if not delta:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    return labels


def ngram_dup_clusters(sf_dir: str, threshold: float = 0.5, source: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text", ds=None,
                       num_partitions: int = 16, max_posting: int | None = None):
    """Duplicate clusters over the exact word-3-gram Jaccard near-dup
    graph: every document labeled ``(doc_id, cluster_id, cluster_size)``
    where ``cluster_id`` is the minimum doc id of its connected
    component under ``jaccard >= threshold`` edges and ``cluster_size``
    counts the component's members.

    Reuses the exact n-gram pair pipeline of
    ``neardup.ngram_jaccard_dedup`` (shingle → exact-duplicate collapse
    → inverted-index pair partials → Jaccard verify), then runs
    :func:`connected_components` over the verified representative pairs
    and expands collapse-group members into their representative's
    component (an exact duplicate has Jaccard 1 with its representative,
    so the expansion is exactly the component the uncollapsed graph
    would produce — the SQL oracle computes the uncollapsed graph).

    Documents with no shingles (empty normalized text) are singleton
    clusters: no shingles is no evidence of duplication, matching the
    first-wins dedup's empty-doc rule and the oracle (no pairs).
    """
    from dataflow_mm_ray.partition import hash_join, partition_map
    from dataflow_mm_ray.stages.neardup import ngram_verified_pairs

    membership, ne_membership, sh, verified = ngram_verified_pairs(
        sf_dir, threshold, source, id_col, text_col, ds, num_partitions, max_posting
    )

    comp = connected_components(verified, num_partitions=num_partitions)

    # representative labels: CC labels where edges exist, self elsewhere
    # (min-union keeps everything int64 — a left-join NaN round-trip
    # through float64 would corrupt snowflake-scale ids)
    def self_label(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": ids, "comp": ids})

    rep_labels = partition_map(
        comp.union(sh.map_batches(self_label, batch_format="pandas")),
        "node", _min_label_per_node, num_partitions=num_partitions,
    )

    # expand to collapse-group members
    def mem_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: b["doc_id"].to_numpy(dtype=np.int64),
             "node": b["__rep"].to_numpy(dtype=np.int64)}
        )

    def rep_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(dtype=np.int64),
             "cluster_id": b["comp"].to_numpy(dtype=np.int64)}
        )

    members = hash_join(
        ne_membership.map_batches(mem_rows, batch_format="pandas"),
        rep_labels.map_batches(rep_rows, batch_format="pandas"),
        "node", num_partitions=num_partitions,
    )

    def member_out(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(dtype=np.int64),
             "cluster_id": b["cluster_id"].to_numpy(dtype=np.int64)}
        )

    def empty_out(b: pd.DataFrame) -> pd.DataFrame:
        m = np.fromiter((len(s) == 0 for s in b["__sh"]), dtype=bool, count=len(b))
        ids = b.loc[m, "doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({id_col: ids, "cluster_id": ids})

    labeled = members.map_batches(member_out, batch_format="pandas").union(
        membership.map_batches(empty_out, batch_format="pandas")
    )

    # cluster sizes: all rows of a cluster co-locate in one partition
    def add_size(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "cluster_id": pd.Series([], dtype=np.int64),
                 "cluster_size": pd.Series([], dtype=np.int64)}
            )
        out = part.copy(deep=False)
        out["cluster_size"] = (
            part.groupby("cluster_id", sort=False)[id_col].transform("size").to_numpy(dtype=np.int64)
        )
        return out.sort_values(id_col)

    return partition_map(labeled, "cluster_id", add_size, num_partitions=num_partitions)


def dup_cluster_canonical(sf_dir: str, threshold: float = 0.5, source: str = "documents",
                          id_col: str = "doc_id", text_col: str = "text", ds=None,
                          num_partitions: int = 16):
    """Duplicate-aware canonical selection: for every near-dup cluster
    keep exactly one document — the longest text (ties: lowest doc id).
    The quality-pick complement of first-wins dedup: first-wins keeps
    the EARLIEST duplicate, this keeps the BEST, the selection rule a
    production training-data pipeline actually wants when crawl order
    is arbitrary. Output: (doc_id, cluster_id, cluster_size, keep),
    one row per document.
    """
    from dataflow_mm_ray.partition import hash_join, partition_map
    from dataflow_mm_ray.sources.tables import read_table

    clusters = ngram_dup_clusters(sf_dir, threshold, source, id_col, text_col, ds,
                                  num_partitions)
    docs = ds if ds is not None else read_table(sf_dir, source, columns=[id_col, text_col])

    def doc_len(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(dtype=np.int64),
             "__len": b[text_col].str.len().fillna(0).to_numpy(dtype=np.int64)}
        )

    joined = hash_join(
        clusters, docs.map_batches(doc_len, batch_format="pandas"), id_col,
        num_partitions=num_partitions,
    )

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "cluster_id": pd.Series([], dtype=np.int64),
                 "cluster_size": pd.Series([], dtype=np.int64),
                 "keep": pd.Series([], dtype=bool)}
            )
        part = part.sort_values([  # best first within each cluster
            "cluster_id", "__len", id_col
        ], ascending=[True, False, True], kind="mergesort")
        first = ~part["cluster_id"].duplicated()
        out = part[[id_col, "cluster_id", "cluster_size"]].copy(deep=False)
        out["keep"] = first.to_numpy()
        return out.sort_values(id_col)

    return partition_map(joined, "cluster_id", pick, num_partitions=num_partitions)


def minhash_dup_clusters(sf_dir: str, threshold: float = 0.7, source: str = "documents",
                         id_col: str = "doc_id", text_col: str = "text", ds=None,
                         num_partitions: int = 16):
    """Duplicate clusters over the MinHash-LSH edge source — the
    web-scale edge generator (banded candidates, Jaccard-verified)
    feeding the same distributed connected-components labeling as
    :func:`ngram_dup_clusters`. Edge recall follows the LSH banding
    (candidate set misses a near pair only when all bands miss —
    tests/test_neardup.py pins recall); every emitted edge is
    Jaccard-verified, so clusters can only ever be SPLIT relative to
    the exact graph, never merged across a sub-threshold pair.

    Semantics follow the MinHash path's conventions: exact-collapse
    groups cluster with their representative INCLUDING the empty-text
    group (identical empties collapse — minhash_lsh_dedup first-wins
    drops them the same way; the exact n-gram operator instead treats
    empties as singletons, matching its SQL oracle).

    Output: (doc_id, cluster_id, cluster_size), one row per document.
    """
    from dataflow_mm_ray.partition import hash_join, partition_map
    from dataflow_mm_ray.stages.neardup import minhash_verified_pairs

    membership, sh, verified = minhash_verified_pairs(
        sf_dir, threshold, source, id_col, text_col, ds, num_partitions
    )
    comp = connected_components(verified, num_partitions=num_partitions)

    def self_label(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": ids, "comp": ids})

    rep_labels = partition_map(
        comp.union(sh.map_batches(self_label, batch_format="pandas")),
        "node", _min_label_per_node, num_partitions=num_partitions,
    )

    def mem_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: b["doc_id"].to_numpy(dtype=np.int64),
             "node": b["__rep"].to_numpy(dtype=np.int64)}
        )

    def rep_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(dtype=np.int64),
             "cluster_id": b["comp"].to_numpy(dtype=np.int64)}
        )

    members = hash_join(
        membership.map_batches(mem_rows, batch_format="pandas"),
        rep_labels.map_batches(rep_rows, batch_format="pandas"),
        "node", num_partitions=num_partitions,
    )

    def member_out(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(dtype=np.int64),
             "cluster_id": b["cluster_id"].to_numpy(dtype=np.int64)}
        )

    labeled = members.map_batches(member_out, batch_format="pandas")

    def add_size(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "cluster_id": pd.Series([], dtype=np.int64),
                 "cluster_size": pd.Series([], dtype=np.int64)}
            )
        out = part.copy(deep=False)
        out["cluster_size"] = (
            part.groupby("cluster_id", sort=False)[id_col].transform("size").to_numpy(dtype=np.int64)
        )
        return out.sort_values(id_col)

    return partition_map(labeled, "cluster_id", add_size, num_partitions=num_partitions)
