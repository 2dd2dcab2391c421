"""Paged keyed storage: MyScale paging semantics over parquet
(storage.py:293-432)."""
import numpy as np
import pandas as pd


def test_write_then_read_pages(ray_session, tmp_path):
    import ray.data as rd

    from dataflow_mm_ray.sources.paged import read_page, write_task

    df = pd.DataFrame({"doc_id": np.arange(25), "text": [f"t{i}" for i in range(25)]})
    manifest = write_task(
        rd.from_pandas(df), str(tmp_path), "p1", "t1", raw_id_col="doc_id"
    ).to_pandas()
    assert manifest["rows"].sum() == 25

    # full read
    full = read_page(str(tmp_path), "p1", "t1", page_size=None).to_pandas()
    assert len(full) == 25
    assert set(full.columns) >= {"doc_id", "text", "pipeline_id", "task_id",
                                 "raw_data_id", "min_hashes"}
    assert (full["pipeline_id"] == "p1").all()

    # page arithmetic: 1-based page_num, OFFSET (page_num-1)*page_size
    p1 = read_page(str(tmp_path), "p1", "t1", page_size=10, page_num=1).to_pandas()
    p2 = read_page(str(tmp_path), "p1", "t1", page_size=10, page_num=2).to_pandas()
    p3 = read_page(str(tmp_path), "p1", "t1", page_size=10, page_num=3).to_pandas()
    assert len(p1) == 10 and len(p2) == 10 and len(p3) == 5
    all_ids = sorted(list(p1["doc_id"]) + list(p2["doc_id"]) + list(p3["doc_id"]))
    assert all_ids == list(range(25))
    # page 0 clamps to offset 0 (reference default page_num=0)
    p0 = read_page(str(tmp_path), "p1", "t1", page_size=10, page_num=0).to_pandas()
    assert list(p0["doc_id"]) == list(p1["doc_id"])

    # task isolation
    write_task(rd.from_pandas(df.head(3)), str(tmp_path), "p1", "t2",
               raw_id_col="doc_id").to_pandas()
    assert len(read_page(str(tmp_path), "p1", "t2", page_size=None).to_pandas()) == 3


def test_write_task_no_filename_collisions(ray_session, tmp_path):
    """Two equal-length blocks with default per-block raw ids but
    different payload must land in different files (content-digest
    naming) — no silent overwrite."""
    import ray.data as rd

    from dataflow_mm_ray.sources.paged import read_page, write_task

    import pandas as pd

    a = pd.DataFrame({"text": [f"a{i}" for i in range(5)]})
    b = pd.DataFrame({"text": [f"b{i}" for i in range(5)]})
    ds = rd.from_pandas([a, b])  # two blocks, same length, default raw ids
    manifest = write_task(ds, str(tmp_path), "p", "t").to_pandas()
    assert manifest["rows"].sum() == 10
    assert len(set(manifest["file"])) == len(manifest)
    full = read_page(str(tmp_path), "p", "t", page_size=None).to_pandas()
    assert len(full) == 10
    assert sorted(full["text"]) == sorted(list(a["text"]) + list(b["text"]))


def test_read_page_out_of_range_keeps_schema(ray_session, tmp_path):
    import ray.data as rd

    import pandas as pd

    from dataflow_mm_ray.sources.paged import read_page, write_task

    df = pd.DataFrame({"doc_id": range(7), "text": list("abcdefg")})
    write_task(rd.from_pandas(df), str(tmp_path), "p", "t", raw_id_col="doc_id").to_pandas()
    empty = read_page(str(tmp_path), "p", "t", page_size=5, page_num=99)
    assert empty.count() == 0
    # dataset-level schema survives (Ray's to_pandas drops columns on
    # 0-row frames — a Ray behavior, not a paging one)
    assert {"doc_id", "text", "raw_data_id"} <= set(empty.schema().names)
