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
