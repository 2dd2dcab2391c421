"""Composed document-prep chain: stage-consistency invariants."""
import pandas as pd


def test_docprep_chain_invariants(ray_session):
    from tests.conftest import SF_TINY

    from dataflow_mm_ray.pipelines.docprep import docprep_pipeline
    from dataflow_mm_ray.functions.text_rules import rule_flags_batch
    from dataflow_mm_ray.functions.textstats import fingerprint

    out = docprep_pipeline(SF_TINY).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) > 0
    assert set(out.columns) == {
        "doc_id", "text", "norm_text", "n_tokens", "punct_ratio",
        "stopword_ratio", "lang_pred",
    }

    docs = pd.read_parquet(f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"])
    # survivors pass the rule filter
    surv = docs[docs["doc_id"].isin(out["doc_id"])]
    assert rule_flags_batch(surv["text"])["keep"].all()
    # no duplicate fingerprints among survivors (exact dedup held)
    fps = [fingerprint(t) for t in surv["text"]]
    assert len(fps) == len(set(fps))
    # punctuation cap honored
    assert (out["punct_ratio"] <= 0.5).all()
    # deterministic across reruns
    again = docprep_pipeline(SF_TINY).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)
