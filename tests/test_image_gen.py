"""PromptedImageGenerator chain: t2i actor pool -> media side-effect
sink (atomic writes, idempotent resume — the reference's
already-populated-row skip, prompted_image_generator.py:54-58)."""
import hashlib
import os

import pandas as pd

from dataflow_mm_ray.serving import StubT2IServing, T2IGenerator


def test_safe_name_matches_reference_rule():
    # image_gen.py:33-35: non-alnum runs -> '_', strip '_', first 120
    assert T2IGenerator.safe_name("Hello, world! 42") == "Hello_world_42"
    assert T2IGenerator.safe_name("__x__") == "x"
    assert T2IGenerator.safe_name("a" * 300) == "a" * 120
    assert T2IGenerator.safe_name("***") == ""


def test_generator_bytes_and_manifest():
    g = T2IGenerator()
    out = g(pd.DataFrame({"sample_id": ["s1"], "prompt": ["a cat"]}))
    img = bytes(out["image_bytes"].iloc[0])
    assert img == hashlib.md5(b"a cat").digest() * 64 and len(img) == 1024
    assert out["rel_path"].iloc[0] == "a_cat/a_cat_0.png"
    assert out["img_md5"].iloc[0] == hashlib.md5(b"a cat").hexdigest()
    assert out["n_bytes"].iloc[0] == 1024


def test_sink_composition_idempotent(ray_session, tmp_path):
    import ray.data as rd

    from dataflow_mm_ray.stages.multimodal import media_sideeffect_sink

    ds = rd.from_pandas(
        pd.DataFrame({"sample_id": [f"s{i}" for i in range(6)],
                      "prompt": [f"prompt number {i}" for i in range(6)]})
    )
    gen = ds.map_batches(T2IGenerator, batch_format="pandas", concurrency=1)
    m1 = media_sideeffect_sink(gen, str(tmp_path), id_col="sample_id",
                               bytes_col="image_bytes").to_pandas()
    assert len(m1) == 6 and not m1["skipped"].any()
    for p in m1["path"]:
        assert os.path.getsize(p) == 1024
    # rerun: every row skipped, files untouched (resume semantics)
    gen2 = ds.map_batches(T2IGenerator, batch_format="pandas", concurrency=1)
    m2 = media_sideeffect_sink(gen2, str(tmp_path), id_col="sample_id",
                               bytes_col="image_bytes").to_pandas()
    assert m2["skipped"].all()
    assert sorted(m2["path"]) == sorted(m1["path"])


def test_resolve_media_path():
    from dataflow_mm_ray.serving import resolve_media_path

    # prompted_image_edit_generator.py:31-39
    assert resolve_media_path("/abs/x.png", "/base") == "/abs/x.png"
    assert resolve_media_path("rel/x.png", "/base") == "/base/rel/x.png"
    assert resolve_media_path("./rel/../x.png", "/base/d") == "/base/d/x.png"


def test_image_edit_bytes_keyed_on_rel_path():
    import hashlib

    from dataflow_mm_ray.serving import ImageEditGenerator

    b = pd.DataFrame({"src_rel": ["images/c1.png"], "instruction": ["make it blue"]})
    out = ImageEditGenerator()(b)
    key = "images/c1.png\x1fmake it blue"
    assert out["edit_md5"].iloc[0] == hashlib.md5(key.encode()).hexdigest()
    assert bytes(out["edited_bytes"].iloc[0]) == hashlib.md5(key.encode()).digest() * 64


def test_cot_extraction_edges():
    from dataflow_mm_ray.serving import StubCoTServing, extract_answer, extract_think

    # video_cotqa_generator.py:85-99 — whitespace stripped, '' on absence
    assert extract_think("<think>  a\nb  </think>") == "a\nb"
    assert extract_answer("<answer>\n42\n</answer>") == "42"
    assert extract_think("no tags") == ""
    assert extract_answer("<answer>unclosed") == ""
    assert extract_think(None) == ""
    # DOTALL: tags spanning lines; first match wins
    s = "<answer> one </answer><answer>two</answer>"
    assert extract_answer(s) == "one"
    r = StubCoTServing().generate(["p"])[0]
    assert extract_think(r).startswith("thinking about ")
    assert len(extract_answer(r)) == 8
