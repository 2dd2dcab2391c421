"""Declarative pipeline runner — the engine twin of the reference's
pipeline-script lifecycle.

Reference (SURVEY §3.1/§3.2): the dominant DataFlow-MM entry point is a
Python pipeline script that constructs a ``FileStorage`` plus operator
instances and calls ``storage.step(); op.run(storage)`` per stage
(``dataflow/statics/pipelines/cpu_pipelines/image_filter_aesthetic.py:10-77``);
every step persists the WHOLE table as ``{prefix}_step{N}.jsonl`` and the
next op reads that file back (``dataflow/utils/storage.py:88-100,226-241``).
Resume = re-running the script with the step files already present
(``BatchWrapper(start_batch=...)``, ``dataflow/wrapper/batch_wrapper.py:28,76``).

Engine inversion (Ray-Data-first):

- A pipeline is a list of :class:`Step` — ``(op_name, kwargs)`` resolved
  through the operator registry (``registry.get_operator``, incl. the
  reference's fuzzy lookup). Each op is ``fn(ds, **kwargs) -> Dataset``.
- DEFAULT: no per-step IR at all. Steps compose into ONE lazy Dataset
  chain; the streaming executor pipelines blocks through every stage
  with backpressure. The reference's per-step whole-table cache file —
  its main scale ceiling — simply disappears.
- OPT-IN durability (``cache_dir=``): each step writes partitioned
  parquet under ``cache_dir/step{N}_{op}/data/`` and a ``_SUCCESS.json``
  marker recording the step's CHAINED SPEC HASH (source tag + every
  upstream ``(op, kwargs)``). A rerun skips steps whose marker matches
  (the reference's step-file resume), and a changed op/kwargs anywhere
  invalidates that step AND everything downstream — a guard the
  reference's name-based step files do not have. The marker is written
  only after the data lands, so a killed run recomputes the incomplete
  step and nothing else.

Resume correctness assumes deterministic steps over an identified input
(``source_tag``) — the same contract as the reference's step cache and
this repo's determinism rule (identical rows at any partitioning).
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence


@dataclass(frozen=True)
class Step:
    """One pipeline stage: a registered operator name plus kwargs.

    ``op`` resolves through ``registry.get_operator`` (exact →
    case-insensitive → unique-substring, like the reference registry's
    fuzzy matching). ``kwargs`` must be plain JSON-able primitives so
    the spec hash is stable across processes.
    """

    op: str
    kwargs: Mapping[str, Any] = field(default_factory=dict)


@dataclass
class StepReport:
    index: int
    op: str
    action: str  # "ran" | "cached" | "lazy"
    spec_hash: str
    cache_path: str | None = None


def _canonical_kwargs(kwargs: Mapping[str, Any]) -> str:
    # json with sorted keys: stable, rejects non-primitive kwargs loudly
    return json.dumps(dict(kwargs), sort_keys=True, default=_reject)


def _reject(obj):
    raise TypeError(
        f"pipeline Step kwargs must be JSON-able primitives for a stable "
        f"spec hash; got {type(obj).__name__}"
    )


def _chain_hash(prev: str, op_name: str, kwargs: Mapping[str, Any]) -> str:
    payload = f"{prev}|{op_name}|{_canonical_kwargs(kwargs)}"
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


def _read_cache(path: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(path, "data"))


def _marker_path(step_dir: str) -> str:
    return os.path.join(step_dir, "_SUCCESS.json")


def _marker_matches(step_dir: str, spec_hash: str) -> bool:
    try:
        with open(_marker_path(step_dir)) as f:
            return json.load(f).get("spec") == spec_hash
    except (OSError, ValueError):
        return False


def run_pipeline(
    source,
    steps: Sequence[Step],
    *,
    cache_dir: str | None = None,
    resume: bool = True,
    source_tag: str | None = None,
    report: list[StepReport] | None = None,
):
    """Run ``steps`` over ``source`` (a ray.data.Dataset).

    Without ``cache_dir`` the chain stays fully lazy (one streaming
    Dataset, no IR). With ``cache_dir`` every step materializes to
    partitioned parquet and is skipped on rerun when its chained spec
    hash matches — the reference's per-step cache/resume, made safe
    against spec edits. ``source_tag`` must identify the input when
    caching (e.g. ``f"{sf_dir}:documents"``); reusing a cache dir with
    a different tag recomputes everything.

    ``report`` (optional out-param) collects one :class:`StepReport`
    per step: ``lazy`` (no cache), ``cached`` (skipped), ``ran``.
    """
    from dataflow_mm_ray.registry import get_operator

    specs = [get_operator(s.op) for s in steps]  # resolve (and fail) up front
    if cache_dir is not None and source_tag is None:
        raise ValueError(
            "cache_dir requires source_tag identifying the input "
            "(e.g. '<sf_dir>:documents'); a cache keyed on steps alone "
            "would be silently reused across different inputs"
        )

    h = hashlib.md5(f"source|{source_tag}".encode("utf-8")).hexdigest()
    ds = source
    for i, (step, spec) in enumerate(zip(steps, specs)):
        h = _chain_hash(h, spec.name, step.kwargs)
        if cache_dir is None:
            ds = spec.fn(ds, **dict(step.kwargs))
            if report is not None:
                report.append(StepReport(i, spec.name, "lazy", h))
            continue

        step_dir = os.path.join(cache_dir, f"step{i:02d}_{spec.name}")
        if resume and _marker_matches(step_dir, h):
            ds = _read_cache(step_dir)
            if report is not None:
                report.append(StepReport(i, spec.name, "cached", h, step_dir))
            continue

        ds = spec.fn(ds, **dict(step.kwargs))
        shutil.rmtree(step_dir, ignore_errors=True)
        data_dir = os.path.join(step_dir, "data")
        os.makedirs(data_dir, exist_ok=True)
        ds.write_parquet(data_dir)
        # marker last: a kill between write and marker recomputes this
        # step on resume (never trusts a partial directory)
        with open(_marker_path(step_dir), "w") as f:
            json.dump({"spec": h, "op": spec.name, "step": i}, f)
        ds = _read_cache(step_dir)
        if report is not None:
            report.append(StepReport(i, spec.name, "ran", h, step_dir))
    return ds


def load_pipeline_spec(path: str) -> tuple[dict, list[Step]]:
    """Parse a JSON pipeline spec:

    ``{"source": {"table": "documents", "columns": [...]},
       "steps": [{"op": "...", "kwargs": {...}}, ...]}``

    Returns ``(source_spec, steps)``; the caller builds the source
    Dataset (``sources.tables.read_table``) and owns the Ray session.
    """
    with open(path) as f:
        spec = json.load(f)
    steps = [Step(s["op"], s.get("kwargs", {})) for s in spec["steps"]]
    return spec.get("source", {}), steps
