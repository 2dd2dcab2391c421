"""The micro-batch streaming driver: continuous queries over a
Parquet-backed transcript stream with event-time watermarks,
exactly-once sinks, and checkpoint/resume.

Stream model
------------
The canonical input is a Parquet table of transcript turns
(``prepare_transcripts`` materializes it from the events table once).
Arrival is simulated deterministically: turn -> epoch by stable hash of
``(conv_id, turn_idx)`` mod ``n_epochs``, so event-times arrive heavily
out of order — exactly the regime watermarks exist for. On a real
deployment the epoch filter is replaced by "files that arrived since
the last tick"; everything downstream is unchanged.

Per epoch (one tick):

1. **Extract** (distributed, Ray Data): scan the input with the epoch
   filter, split rows into late (``ts < watermark``, quarantined to the
   ``late`` stream) and current; pre-aggregate window partials per
   batch; project session turns and join events; tag every row with its
   state shard (stable hash of conv_id).
2. **Apply** (actor pool): each ``StateShard`` actor ingests its rows.
   Shard calls run concurrently (one round of ``ray.get``).
3. **Advance watermark**: ``wm = max(wm, epoch_max_ts - lateness)`` —
   a pure function of data seen so far, never of wall-clock.
4. **Finalize**: shards emit closed windows/sessions/matured joins
   and settled as-of enrichments (latest strictly-prior click turn per
   turn — emitted once the watermark strictly passes the turn's ts).
5. **Commit**: the 2PC sink stages + commits each output stream for
   this epoch (no-op if already committed — replay safe).
6. **Checkpoint**: state snapshots per shard + offsets/watermark JSON,
   committed atomically via os.replace. Resume = restore latest
   checkpoint, continue from the next epoch.

Scale notes: extraction, late-splitting, partial aggregation AND state
routing are fully distributed — each map task pre-aggregates its rows
and pushes them to the shard actors directly (actor applies within an
epoch are commutative: window sums, session point-inserts and join
insorts are order-free; the only ordered step, finalize, runs after
the epoch barrier). The driver only ever sees late rows, counters and
finalize emissions. Skewed conversations are pre-combined by the
partial aggregation, so a hot conv_id contributes one row per window
per batch regardless of its turn count.
"""
from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from dataflow_mm_ray.groupsum import group_sum
from dataflow_mm_ray.hashing import partition_ids
from dataflow_mm_ray.state.store import StateShard
from dataflow_mm_ray.streaming.sink import EpochSink

US = 1_000_000
STREAMS = ("windows", "sliding", "sessions", "joins", "asof", "cep", "alerts",
           "upserts", "wdedup", "wdistinct", "wtopk", "wlat", "late")


def _arrival_epoch(b: pd.DataFrame, n_epochs: int) -> np.ndarray:
    """Simulated arrival epoch of each turn — stable hash of
    (conv_id, turn_idx). ONE definition: prepare_transcripts' layout
    and the unpartitioned-input epoch filter must agree bit-for-bit,
    or ticks drop/double-process rows."""
    return partition_ids(
        (b["conv_id"].astype(str) + "#" + b["turn_idx"].astype(str)).to_numpy(),
        n_epochs,
    )


def _processor_code_hash(p) -> str:
    """Stable digest of a plugin processor's CODE + constructor config.
    Module/file-defined classes hash their source text (edits change
    it); dynamically defined classes fall back to the by-value
    cloudpickle bytes. User-defined BASE classes in the MRO are folded
    in too (an edited inherited body must refuse resume like an edited
    leaf), but the engine's own StatefulProcessor contract is excluded
    so engine upgrades stay resume-compatible. Instance attrs are
    folded in so a same-named processor with different knobs (e.g.
    max_hamming) also refuses to resume; default object reprs embed a
    memory address that differs every process start, so addresses are
    masked — a byte-identical processor must hash identically across
    restarts or every resume is spuriously refused."""
    import hashlib
    import inspect
    import re

    from dataflow_mm_ray.streaming.processor import StatefulProcessor

    def _src(obj) -> str:
        try:
            return inspect.getsource(obj)
        except (OSError, TypeError):
            import cloudpickle

            return cloudpickle.dumps(obj).hex()

    # exclude ONLY the abstract contract itself (by identity): the
    # built-in processors live in the same module, and filtering by
    # module name would drop their bodies from the hash entirely —
    # an edited built-in would then resume silently
    code = "|".join(
        _src(cls)
        for cls in type(p).__mro__
        if cls is not object and cls is not StatefulProcessor
    )
    stable = re.compile(r" at 0x[0-9a-fA-F]+")

    def _val_digest(v, depth: int = 0) -> str:
        # code-carrying values FIRST — a class repr has no address
        # marker ("<class 'mod.X'>"), so an address-based early return
        # would let an edited helper class resume silently
        try:
            if inspect.isroutine(v) or inspect.isclass(v):
                return _src(v)
        except Exception:
            pass
        # unordered containers repr in hash-randomized iteration order
        # (PYTHONHASHSEED) — canonicalize, or a byte-identical config
        # would hash differently across process starts
        if isinstance(v, (set, frozenset)):
            return "{" + ", ".join(
                sorted(_val_digest(x, depth + 1) for x in v)) + "}"
        if isinstance(v, dict):
            return repr(sorted(
                (repr(k2), _val_digest(v2, depth + 1))
                for k2, v2 in v.items()
            ))
        r = stable.sub(" at 0x..", repr(v))
        if " at 0x.." not in r or depth >= 2:
            return r
        # default (address-bearing) repr: the masked address says
        # nothing about the value — fold in its class SOURCE plus a
        # canonical digest of its instance state. Deliberately NOT
        # pickle bytes: a set attribute pickles in hash-randomized
        # iteration order, which would make a byte-identical processor
        # hash differently every process start and refuse every resume.
        try:
            parts = [r, _src(type(v))]
            state = vars(v) if hasattr(v, "__dict__") else None
            if state is not None:
                parts.append(repr(sorted(
                    (k2, _val_digest(v2, depth + 1))
                    for k2, v2 in state.items()
                )))
            return "|".join(parts)
        except Exception:
            return r

    cfg = repr(sorted((k, _val_digest(v)) for k, v in vars(p).items()))
    return hashlib.sha256((code + "|" + cfg).encode()).hexdigest()[:16]


def _ts_bounds_us(sf_dir: str) -> tuple[int, int]:
    """Global [min, max] event-time bounds in µs over the events table
    (the transcript ``ts`` IS the event timestamp,
    sources/transcripts.py), from parquet FOOTER row-group statistics —
    no data scan, and through the same path abstraction as every other
    read (``table_path``), so multi-file/directory tables and paths
    with SQL-hostile characters work (r4 ADVICE: the old form
    interpolated a single-file local path into driver-side DuckDB SQL).
    Falls back to a pruned ``ts``-column scan when any row group lacks
    stats. Raises on an empty table — silent NaT int64-min bounds would
    otherwise poison every epoch boundary."""
    import pyarrow.dataset as pads

    from dataflow_mm_ray.sources.tables import table_path

    dataset = pads.dataset(table_path(sf_dir, "events"), format="parquet")
    lo = hi = None
    have_stats = True
    for frag in dataset.get_fragments():
        md = frag.metadata
        ts_i = frag.physical_schema.names.index("ts")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            if rg.num_rows == 0:
                continue
            st = rg.column(ts_i).statistics
            if st is None or not st.has_min_max:
                have_stats = False
                break
            smin, smax = pd.Timestamp(st.min), pd.Timestamp(st.max)
            lo = smin if lo is None else min(lo, smin)
            hi = smax if hi is None else max(hi, smax)
        if not have_stats:
            break
    if not have_stats:
        import pyarrow.compute as pc

        t = dataset.to_table(columns=["ts"])
        if len(t):
            mm = pc.min_max(t.column("ts")).as_py()
            lo, hi = pd.Timestamp(mm["min"]), pd.Timestamp(mm["max"])
    if lo is None or hi is None or pd.isna(lo) or pd.isna(hi):
        raise ValueError(
            f"events table under {sf_dir!r} is empty (or all-NULL ts) — "
            "cannot derive event-time epoch bounds for by_ts arrival"
        )
    return int(lo.value // 1000), int(hi.value // 1000)


def prepare_transcripts(sf_dir: str, path: str, n_epochs: int = 5,
                        num_partitions: int = 16,
                        arrival: str = "hash") -> str:
    """Materialize the canonical transcript table once, PARTITIONED BY
    ARRIVAL EPOCH (``path/epoch=N/part-*.parquet``): each engine tick
    then reads only its own slice — the faithful analog of "files that
    arrived since the last tick", and O(N) total scan work instead of
    O(epochs x N).

    ``arrival`` picks the simulated arrival order:

    - ``"hash"`` (default) — epoch = stable hash of (conv_id, turn_idx):
      the ADVERSARIAL worst case where arrival is uncorrelated with
      event time, so any finite lateness quarantines most rows and
      lateness-∞ holds O(input) state until flush. The right mode for
      late-quarantine / repair / exactly-once drills at small scale.
    - ``"by_ts"`` — epoch = event-time range bucket (equal spans of
      [min ts, max ts]): the REALISTIC production shape where arrival
      tracks event time and disorder is bounded. Epoch k+1 rows all
      carry ts ≥ the k/k+1 boundary ≥ any earlier watermark, so with
      any lateness ≥ 0 nothing is quarantined, windows settle
      progressively, and shard state is bounded by the lateness
      horizon × rate instead of the stream length — the property that
      lets the same engine sustain a 10^12-turn stream. Settled
      content of every arrival-invariant stream is identical to the
      hash-arrival lateness-∞ run (pinned by
      tests/test_streaming.py::test_by_ts_arrival_*).
    """
    if arrival not in ("hash", "by_ts"):
        raise ValueError(f"arrival must be 'hash' or 'by_ts'; got {arrival!r}")
    from dataflow_mm_ray.partition import partition_map
    from dataflow_mm_ray.sources.transcripts import transcripts_from_events

    meta_path = os.path.join(path, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        prepared = meta["n_epochs"]
        prep_arrival = meta.get("arrival", "hash")
        if prepared != n_epochs or prep_arrival != arrival:
            raise ValueError(
                f"{path} is already prepared with n_epochs={prepared}, "
                f"arrival={prep_arrival!r}; requested n_epochs={n_epochs}, "
                f"arrival={arrival!r} — use a fresh path"
            )
        return path
    os.makedirs(path, exist_ok=True)
    # a prepare interrupted before _meta.json may have left part files;
    # deterministic filenames differ across n_epochs/input, so stale
    # files would otherwise be unioned into epoch reads — wipe first
    import shutil

    for name in os.listdir(path):
        if name.startswith("epoch="):
            shutil.rmtree(os.path.join(path, name))
    ds = transcripts_from_events(sf_dir, num_partitions=num_partitions)

    if arrival == "by_ts":
        lo_us, hi_us = _ts_bounds_us(sf_dir)
        span_us = max(hi_us - lo_us + 1, 1)

        def add_epoch(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy(deep=False)
            ts_us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            b["__epoch"] = np.minimum(
                (ts_us - lo_us) * n_epochs // span_us, n_epochs - 1
            ).astype(np.int64)
            return b
    else:
        def add_epoch(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy(deep=False)
            b["__epoch"] = _arrival_epoch(b, n_epochs)
            return b

    with_epoch = ds.map_batches(add_epoch, batch_format="pandas")

    def write_epoch_files(part: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dataflow_mm_ray.hashing import stable_hash_array

        counts = []
        for e, g in part.groupby("__epoch", sort=False):
            d = os.path.join(path, f"epoch={int(e)}")
            os.makedirs(d, exist_ok=True)
            token = int(stable_hash_array(np.asarray([g["conv_id"].iloc[0]], dtype=object))[0]) % (1 << 31)
            f = os.path.join(d, f"part-{token:08x}-{len(g)}.parquet")
            pq.write_table(
                pa.Table.from_pandas(g.drop(columns="__epoch"), preserve_index=False), f
            )
            counts.append((int(e), len(g)))
        return pd.DataFrame(counts, columns=["epoch", "rows"])

    partition_map(with_epoch, "conv_id", write_epoch_files, num_partitions=num_partitions).to_pandas()
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_epochs": n_epochs, "arrival": arrival}, f)
    os.replace(tmp, meta_path)
    return path


class StreamingEngine:
    def __init__(
        self,
        transcripts_path: str,
        out_dir: str,
        n_epochs: int = 5,
        n_shards: int = 4,
        width_s: int = 3600,
        gap_s: int = 1800,
        lateness_s: int = 0,
        slide_width_s: int = 7200,
        slide_s: int = 3600,
        cep_within_s: int | None = None,
        alert_deadline_s: int | None = None,
        processors: list | None = None,
        spill_mb: int | None = None,
        spill_buckets: int = 16,
        finalize_waves: int | None = None,
    ):
        self.transcripts_path = transcripts_path
        self.out_dir = out_dir
        self.checkpoint_dir = os.path.join(out_dir, "checkpoints")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        meta_path = os.path.join(transcripts_path, "_meta.json")
        self.epoch_partitioned = os.path.exists(meta_path)
        # arrival regime of the prepared input: recorded into the
        # checkpoint config so a resume against a path prepared with the
        # OTHER arrival mode (same n_epochs, different epoch layouts —
        # rows would drop/double-process) is rejected loudly (r4 ADVICE)
        self.arrival = "unpartitioned"
        if self.epoch_partitioned:
            with open(meta_path) as f:
                meta = json.load(f)
            prep_epochs = meta["n_epochs"]
            self.arrival = meta.get("arrival", "hash")
            if prep_epochs != n_epochs:
                raise ValueError(
                    f"input is partitioned into {prep_epochs} arrival epochs; "
                    f"engine configured for {n_epochs}"
                )
        self.n_epochs = n_epochs
        self.n_shards = n_shards
        self.width_s = width_s
        self.gap_s = gap_s
        self.lateness_us = lateness_s * US
        if slide_width_s % slide_s != 0:
            raise ValueError("slide_width_s must be a multiple of slide_s")
        self.slide_width_s = slide_width_s
        self.slide_s = slide_s
        from dataflow_mm_ray.stages.cep import ALERT_DEADLINE_S, ROUNDTRIP_WITHIN_S

        self.cep_within_s = ROUNDTRIP_WITHIN_S if cep_within_s is None else cep_within_s
        self.alert_deadline_s = (ALERT_DEADLINE_S if alert_deadline_s is None
                                 else alert_deadline_s)
        # plugin stateful processors (streaming/processor.py): each adds
        # one first-class exactly-once output stream
        self.processors = list(processors or [])
        pnames = [p.name for p in self.processors]
        if len(set(pnames)) != len(pnames) or set(pnames) & set(STREAMS):
            raise ValueError(
                f"processor stream names must be unique and distinct from "
                f"the built-in streams {STREAMS}; got {pnames}"
            )
        self.stream_names = STREAMS + tuple(pnames)
        # optional extract columns requested by processors (a processor
        # declares ``needs = ("sh64",)`` to have the scan ship a SimHash
        # signature of the id-stripped text alongside dk1/dk2 — computed
        # only when some processor asks, so the default scan stays lean)
        self._want_sh64 = any(
            "sh64" in getattr(p, "needs", ()) for p in self.processors
        )
        # is_error: whether the turn carries the 'error ' event prefix
        # (identical to the events table's event_type = 'error' whenever
        # props is non-null — the transcript derivation nulls text when
        # props is NULL, and a NULL prefix test is falsy on both sides)
        self._want_is_error = any(
            "is_error" in getattr(p, "needs", ()) for p in self.processors
        )
        self.sink = EpochSink(out_dir, self.stream_names)
        # state spill (per-shard): past spill_mb of resident event-buffer
        # state, page to bucket-partitioned parquet under out_dir/spill —
        # the adversarial hash-arrival + infinite-lateness drill then
        # degrades to disk instead of dying past node memory
        # (state/store.py spill block). Content-transparent: emissions
        # are identical to the unspilled run.
        self.spill_mb = spill_mb
        self.spill_buckets = int(spill_buckets)
        self.finalize_waves = finalize_waves
        self.shards = [
            StateShard.remote(i, width_s, gap_s, slide_width_s,
                              self.cep_within_s, self.alert_deadline_s,
                              processors=self.processors,
                              spill_dir=(os.path.join(out_dir, "spill", f"shard{i}")
                                         if spill_mb is not None else None),
                              spill_threshold_bytes=(spill_mb << 20)
                              if spill_mb is not None else None,
                              spill_buckets=self.spill_buckets)
            for i in range(n_shards)
        ]
        self.watermark_us = -(1 << 62)
        self.next_epoch = 0
        self._maybe_resume()

    # -- checkpointing -----------------------------------------------------
    def _ckpt_path(self, epoch: int) -> str:
        return os.path.join(self.checkpoint_dir, f"ckpt-{epoch}.json")

    def _latest_checkpoint(self) -> int | None:
        epochs = [
            int(n[len("ckpt-") : -len(".json")])
            for n in os.listdir(self.checkpoint_dir)
            if n.startswith("ckpt-") and n.endswith(".json")
        ]
        return max(epochs) if epochs else None

    def _config_record(self) -> dict:
        """Every knob that changes which rows an epoch reads or how
        state evolves — a resumed run must match ALL of them, or the
        replayed epochs silently mix regimes."""
        return {
            "n_epochs": self.n_epochs,
            "arrival": self.arrival,
            "n_shards": self.n_shards,
            "width_s": self.width_s,
            "gap_s": self.gap_s,
            "lateness_us": self.lateness_us,
            "slide_width_s": self.slide_width_s,
            "slide_s": self.slide_s,
            "cep_within_s": self.cep_within_s,
            "alert_deadline_s": self.alert_deadline_s,
            "processors": [p.name for p in self.processors],
            # per-plugin CODE hashes: a silently edited processor body
            # (or changed constructor config) must refuse to resume as
            # loudly as a changed processor list — the replayed epochs
            # would otherwise mix emission semantics
            "processor_code": {p.name: _processor_code_hash(p)
                               for p in self.processors},
            # content-transparent, but staged flush file boundaries
            # depend on it — pin so a resumed flush is byte-identical
            "spill_mb": self.spill_mb,
            "spill_buckets": self.spill_buckets,
        }

    def _checkpoint(self, epoch: int) -> None:
        state_files = {}
        refs = []
        for i, sh in enumerate(self.shards):
            p = os.path.join(self.checkpoint_dir, f"state-{epoch}-shard{i}.parquet")
            refs.append(sh.snapshot.remote(p))
            state_files[str(i)] = p
        ray.get(refs)
        meta = {
            "epoch": epoch,
            "watermark_us": int(self.watermark_us),
            "config": self._config_record(),
            "state_files": state_files,
        }
        tmp = self._ckpt_path(epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ckpt_path(epoch))
        from dataflow_mm_ray.fsutil import fsync_dir

        fsync_dir(self.checkpoint_dir)
        # prune superseded checkpoints: only the latest is ever resumed
        # from (keep one prior epoch as a safety margin) — without this
        # the checkpoint dir grows O(n_epochs x shard state)
        for name in os.listdir(self.checkpoint_dir):
            for prefix, suffix in (("ckpt-", ".json"), ("state-", ".parquet"),
                                   ("state-", ".pkl")):  # .pkl: pre-r5 layout
                if name.startswith(prefix) and name.endswith(suffix):
                    try:
                        e = int(name[len(prefix):].split("-")[0].removesuffix(".json"))
                    except ValueError:
                        continue
                    if e < epoch - 1:
                        os.remove(os.path.join(self.checkpoint_dir, name))

    def _maybe_resume(self) -> None:
        latest = self._latest_checkpoint()
        if latest is None:
            return
        with open(self._ckpt_path(latest)) as f:
            meta = json.load(f)
        want = self._config_record()
        got = meta.get("config", {"n_shards": meta.get("n_shards")})
        mismatched = {k: (got.get(k), want[k]) for k in want
                      if k in got and got[k] != want[k]}
        if mismatched:
            raise ValueError(
                f"resume config mismatch vs checkpoint epoch {meta['epoch']}: "
                + ", ".join(f"{k}: checkpoint={a} requested={b}"
                            for k, (a, b) in mismatched.items())
                + " — resuming with a changed epoch/shard/window/lateness "
                "configuration would silently corrupt output"
            )
        ray.get(
            [
                sh.restore.remote(meta["state_files"][str(i)])
                for i, sh in enumerate(self.shards)
            ]
        )
        self.watermark_us = meta["watermark_us"]
        self.next_epoch = meta["epoch"] + 1

    # -- one epoch ---------------------------------------------------------
    def _extract(self, epoch: int, wm_us: int):
        """Distributed scan: epoch filter, late split, partials, routing."""
        n_epochs, n_shards = self.n_epochs, self.n_shards
        width_us = self.width_s * US

        epoch_partitioned = self.epoch_partitioned
        want_sh64 = self._want_sh64
        want_is_error = self._want_is_error

        def fn(b: pd.DataFrame) -> pd.DataFrame:
            if not epoch_partitioned:
                # unpartitioned input: filter this tick's arrivals
                b = b[_arrival_epoch(b, n_epochs) == epoch]
            if not len(b):
                schema = dict(_EXTRACT_SCHEMA)
                if want_sh64:
                    schema["sh64"] = np.int64
                if want_is_error:
                    schema["is_error"] = bool
                return pd.DataFrame(
                    {c: pd.Series([], dtype=d) for c, d in schema.items()}
                )
            ts_us = b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            out = pd.DataFrame(
                {
                    "conv_id": b["conv_id"].to_numpy(),
                    "turn_idx": b["turn_idx"].to_numpy(dtype=np.int32),
                    "role": b["role"].to_numpy(),
                    "tool": b["tool"].to_numpy(),
                    "ts_us": ts_us,
                    # NULL text contributes 0 chars / not-a-click (the
                    # batch twins' SQL sums skip NULL lengths and a NULL
                    # prefix test is falsy) — without the fills a NaN
                    # would cast to an arbitrary int64 silently
                    "text_len": b["text"].str.len().fillna(0).to_numpy(dtype=np.int64),
                    "is_click": b["text"].str.startswith("click ").fillna(False).to_numpy(dtype=bool),
                }
            )
            out["late"] = out["ts_us"] < wm_us
            out["shard"] = partition_ids(out["conv_id"].to_numpy(), n_shards)
            out["window_start_us"] = (out["ts_us"] // width_us) * width_us
            # windowed-dedup content key: the text with per-event ids
            # stripped (stages/dedup.py add_dedup_key), hashed to
            # 2x64 bits HERE (the only stage that sees raw text — the
            # stream ships hashes, never strings; ~1e-13 collision odds
            # at 1e12 keys). Routed by ITS OWN hash, not conv_id: all
            # copies of a key must land on one shard.
            key = b["text"].fillna("").str.replace(_DEDUP_KEY_RE, " ", regex=True).to_numpy(dtype=object)
            out["dk1"] = pd.util.hash_array(key, categorize=False).view(np.int64)
            out["dk2"] = pd.util.hash_array(
                key, hash_key="graft-dedup-salt", categorize=False
            ).view(np.int64)
            out["dshard"] = (out["dk1"].to_numpy().view(np.uint64)
                             % np.uint64(n_shards)).astype(np.int32)
            if want_sh64:
                # SimHash signature of the same id-stripped content —
                # computed per UNIQUE key (duplicate-heavy streams pay
                # for distinct texts only), shipped as int64 bits
                from dataflow_mm_ray.stages.neardup import simhash64_batch

                uniq, inv = np.unique(key, return_inverse=True)
                out["sh64"] = simhash64_batch(uniq).view(np.int64)[inv]
            if want_is_error:
                out["is_error"] = (
                    b["text"].str.startswith("error ").fillna(False).to_numpy(dtype=bool)
                )
            return out

        from dataflow_mm_ray.sources.tables import read_parquet_split

        if self.epoch_partitioned:
            # a tick reads only its own arrival slice; an epoch that
            # received no rows has no directory — an empty tick, not
            # an error
            d = os.path.join(self.transcripts_path, f"epoch={epoch}")
            if not os.path.isdir(d):
                ds = rd.from_pandas(
                    pd.DataFrame({c: pd.Series([], dtype=object) for c in
                                  ("conv_id", "role", "text", "tool")}
                                 | {"turn_idx": pd.Series([], dtype=np.int32),
                                    "ts": pd.Series([], dtype="datetime64[us]")})
                )
            else:
                ds = rd.read_parquet(d)
        else:
            ds = read_parquet_split(self.transcripts_path)
        return ds.map_batches(fn, batch_format="pandas")

    def run_epoch(self, epoch: int) -> None:
        wm_prev = self.watermark_us
        extracted = self._extract(epoch, wm_prev)

        slide_s_cfg = self.slide_s
        k_slide = self.slide_width_s // self.slide_s
        # Distributed apply: each map task routes ITS rows to the right
        # shard actors (state applies are commutative within an epoch —
        # window sums, session point-inserts and join insorts are
        # order-free; finalize is the only ordered step and runs after
        # the barrier). Only late rows + counters return to the driver.
        # Each apply carries a deterministic content-derived id so a
        # RETRIED map task's re-issued applies are dropped by the shard
        # (idempotence under intra-epoch task retry, not just
        # commutativity).
        shards = self.shards
        out_dir = self.out_dir
        processors = self.processors
        n_shards = self.n_shards

        from dataflow_mm_ray.hashing import stable_hash_array

        def apply_and_collect(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in _APPLY_OUT_SCHEMA.items()})
            late_b = b[b["late"]]
            cur_b = b[~b["late"]]
            refs = []
            for s, g in cur_b.groupby("shard", sort=False):
                partials = group_sum(
                    {
                        "conv_id": g["conv_id"].to_numpy(),
                        "window_start_us": g["window_start_us"].to_numpy(),
                    },
                    {
                        "n_turns": np.ones(len(g), dtype=np.int64),
                        "n_user_turns": (g["role"].to_numpy() == "user").astype(np.int64),
                        "n_tool_calls": (
                            (g["role"].to_numpy() == "assistant") & g["tool"].notna().to_numpy()
                        ).astype(np.int64),
                        "sum_chars": g["text_len"].to_numpy(dtype=np.int64),
                    },
                )
                turns = g[["conv_id", "ts_us"]]
                asof_rows = pd.DataFrame(
                    {
                        "conv_id": g["conv_id"].to_numpy(),
                        "turn_idx": g["turn_idx"].to_numpy(dtype=np.int64),
                        "ts_us": g["ts_us"].to_numpy(dtype=np.int64),
                        "is_click": g["is_click"].to_numpy(dtype=bool),
                    }
                )
                # windowed distinct-conversation sketch updates ride as
                # SPARSE (window, register, rank) triples — 5 bytes/row
                # instead of a dense 4 KiB block per (window, batch);
                # shards densify at finalize (same final registers:
                # max over the same update multiset). The conv hash is
                # shared with the apply-id digest below — one SipHash
                # pass per batch-group.
                from dataflow_mm_ray.stages.sketch import hll_triples_from_hashes
                from dataflow_mm_ray.state.store import _DCOUNT_P

                ch = stable_hash_array(g["conv_id"].to_numpy())
                d_idx, d_rank = hll_triples_from_hashes(ch, _DCOUNT_P)
                dcount = pd.DataFrame(
                    {"window_start_us": g["window_start_us"].to_numpy(dtype=np.int64),
                     "reg_idx": d_idx, "rank": d_rank}
                )
                inv = g[(g["role"] == "assistant") & g["tool"].notna()]
                tool = g[g["role"] == "tool"]
                join_events = pd.concat(
                    [
                        pd.DataFrame(
                            {"conv_id": inv["conv_id"], "kind": "inv", "turn_idx": inv["turn_idx"],
                             "tool": inv["tool"], "ts_us": inv["ts_us"]}
                        ),
                        pd.DataFrame(
                            {"conv_id": tool["conv_id"], "kind": "tool", "turn_idx": tool["turn_idx"],
                             "tool": None, "ts_us": tool["ts_us"]}
                        ),
                    ],
                    ignore_index=True,
                )
                # sliding replicas: one partial row per (conv, sliding
                # window) per batch, k = width/slide replicas per turn
                slide_us = slide_s_cfg * US
                bucket = (g["ts_us"].to_numpy() // slide_us) * slide_us
                n_g = len(g)
                sliding = group_sum(
                    {
                        "conv_id": np.tile(g["conv_id"].to_numpy(), k_slide),
                        "window_start_us": np.concatenate(
                            [bucket - i * slide_us for i in range(k_slide)]
                        ),
                    },
                    {
                        "n_turns": np.ones(n_g * k_slide, dtype=np.int64),
                        "sum_chars": np.tile(g["text_len"].to_numpy(dtype=np.int64), k_slide),
                    },
                )
                # (conv_id, turn_idx) is unique in the stream, so an
                # order-insensitive xor-fold of avalanche-mixed row
                # digests over (conv_id hash, ts_us, turn_idx)
                # identifies this (epoch, shard, block slice) across
                # retries. The conv hash MUST be in the digest: ts can
                # tie across conversations (the derivation breaks ts
                # ties by event_id), and dropping a legitimate block as
                # a "replay" would silently lose data. Mixing matters
                # too: plain column sums are linear ({1,4} vs {2,3}).
                ts = g["ts_us"].to_numpy(dtype=np.int64).view(np.uint64)
                ti = g["turn_idx"].to_numpy(dtype=np.int64).view(np.uint64)
                x = ch ^ (ts * np.uint64(0x9E3779B97F4A7C15)) ^ (
                    ti + np.uint64(0x94D049BB133111EB)
                )
                x ^= x >> np.uint64(30)
                x *= np.uint64(0xBF58476D1CE4E5B9)
                x ^= x >> np.uint64(27)
                x *= np.uint64(0x94D049BB133111EB)
                x ^= x >> np.uint64(31)
                apply_id = (epoch, int(s), len(g), int(np.bitwise_xor.reduce(x)))
                refs.append(
                    shards[int(s)].apply.remote(
                        partials, turns, join_events, sliding, asof_rows, dcount,
                        apply_id=apply_id,
                    )
                )
            # windowed-dedup rows route by the CONTENT-key hash (all
            # copies of a key co-locate), pre-combined per batch: the
            # local (window, key) winner + copy count — the combiner
            # before the shard state
            for ds_, g in cur_b.groupby("dshard", sort=False):
                gs = g.sort_values(["ts_us", "conv_id", "turn_idx"], kind="mergesort")
                win = gs.drop_duplicates(subset=["window_start_us", "dk1", "dk2"], keep="first")
                counts = gs.groupby(["window_start_us", "dk1", "dk2"], sort=False).size()
                dedup_rows = pd.DataFrame(
                    {
                        "window_start_us": win["window_start_us"].to_numpy(dtype=np.int64),
                        "dk1": win["dk1"].to_numpy(dtype=np.int64),
                        "dk2": win["dk2"].to_numpy(dtype=np.int64),
                        "ts_us": win["ts_us"].to_numpy(dtype=np.int64),
                        "conv_id": win["conv_id"].to_numpy(),
                        "turn_idx": win["turn_idx"].to_numpy(dtype=np.int64),
                        "n_copies": counts.loc[
                            pd.MultiIndex.from_frame(win[["window_start_us", "dk1", "dk2"]])
                        ].to_numpy(dtype=np.int64),
                    }
                )
                dh = stable_hash_array(g["conv_id"].to_numpy())
                dts = g["ts_us"].to_numpy(dtype=np.int64).view(np.uint64)
                dti = g["turn_idx"].to_numpy(dtype=np.int64).view(np.uint64)
                dx = dh ^ (dts * np.uint64(0x9E3779B97F4A7C15)) ^ (
                    dti + np.uint64(0x94D049BB133111EB)
                )
                dx ^= dx >> np.uint64(30)
                dx *= np.uint64(0xBF58476D1CE4E5B9)
                dx ^= dx >> np.uint64(31)
                dedup_id = ("dd", epoch, int(ds_), len(g), int(np.bitwise_xor.reduce(dx)))
                refs.append(
                    shards[int(ds_)].apply.remote(
                        None, None, None, dedup_rows=dedup_rows, apply_id=dedup_id,
                    )
                )
            # plugin processors: extract (per-batch combiner), route by
            # the processor's own key, ship with a content-derived
            # apply id (batch digest x shard x name — a retried task
            # re-derives identical ids, so replays drop at the shard)
            if processors and len(cur_b):
                bh = stable_hash_array(cur_b["conv_id"].to_numpy())
                bts = cur_b["ts_us"].to_numpy(dtype=np.int64).view(np.uint64)
                bti = cur_b["turn_idx"].to_numpy(dtype=np.int64).view(np.uint64)
                bx = bh ^ (bts * np.uint64(0x9E3779B97F4A7C15)) ^ (
                    bti + np.uint64(0x94D049BB133111EB)
                )
                bx ^= bx >> np.uint64(30)
                bx *= np.uint64(0xBF58476D1CE4E5B9)
                bx ^= bx >> np.uint64(31)
                batch_digest = int(np.bitwise_xor.reduce(bx))
                for p in processors:
                    pr = p.extract(cur_b)
                    if pr is None or not len(pr):
                        continue
                    ps = partition_ids(pr[p.route_key].to_numpy(), n_shards)
                    for s2 in np.unique(ps):
                        g2 = pr[ps == s2]
                        refs.append(
                            shards[int(s2)].apply.remote(
                                None, None, None,
                                proc_rows={p.name: g2},
                                apply_id=("proc", p.name, epoch, int(s2),
                                          len(cur_b), batch_digest),
                            )
                        )
            ray.get(refs)  # barrier within the task: applies land before it reports
            # late rows are STAGED by this task (never shipped to the
            # driver — at 100x disorder a tight watermark makes them
            # big): deterministic content-derived file name, atomic
            # tmp+rename, fsync — a retried task overwrites the same
            # path with identical bytes, so commit_files never
            # double-counts
            late_file, late_rows = "", np.int64(0)
            if len(late_b):
                # dshard (like shard) is a routing id, a function of the
                # shard COUNT — dropping it keeps the quarantine output
                # shard-count-invariant (the dk1/dk2 content hashes stay:
                # they identify the row regardless of cluster size)
                # text_len STAYS: the late-correction reprocessing pass
                # (streaming/reprocess.py) rebuilds window aggregates
                # (sum_chars) from the quarantine without re-reading the
                # source stream
                out = late_b.drop(
                    columns=["late", "shard", "window_start_us",
                             "is_click", "dshard", "sh64", "is_error"],
                    errors="ignore",
                ).reset_index(drop=True)
                lh = stable_hash_array(out["conv_id"].to_numpy())
                lts = out["ts_us"].to_numpy(dtype=np.int64).view(np.uint64)
                lti = out["turn_idx"].to_numpy(dtype=np.int64).view(np.uint64)
                lx = lh ^ (lts * np.uint64(0x9E3779B97F4A7C15)) ^ (
                    lti + np.uint64(0x94D049BB133111EB)
                )
                lx ^= lx >> np.uint64(30)
                lx *= np.uint64(0xBF58476D1CE4E5B9)
                lx ^= lx >> np.uint64(31)
                digest = int(np.bitwise_xor.reduce(lx))
                stage_dir = os.path.join(out_dir, "staging", "late", f"epoch={epoch}")
                os.makedirs(stage_dir, exist_ok=True)
                path = os.path.join(
                    stage_dir, f"part-{len(out)}-{digest:016x}.parquet"
                )
                import pyarrow as pa
                import pyarrow.parquet as pq

                from dataflow_mm_ray.fsutil import fsync_file_and_dir

                tmp = path + f".tmp-{os.getpid()}"
                pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
                os.replace(tmp, path)
                fsync_file_and_dir(path)
                late_file = os.path.relpath(path, out_dir)
                late_rows = np.int64(len(out))
            return pd.DataFrame(
                {
                    "__applied": [np.int64(len(cur_b))],
                    "__max_ts": [np.int64(cur_b["ts_us"].max()) if len(cur_b) else np.int64(-(1 << 62))],
                    "late_file": [late_file],
                    "late_rows": [late_rows],
                }
            )

        counters = extracted.map_batches(apply_and_collect, batch_format="pandas").to_pandas()
        late_files = [f for f in counters["late_file"] if f]
        n_late = int(counters["late_rows"].sum())
        n_applied = int(counters["__applied"].sum())

        # advance watermark (pure function of data seen)
        if n_applied:
            self.watermark_us = max(
                self.watermark_us, int(counters["__max_ts"].max()) - self.lateness_us
            )
        flush = epoch == self.n_epochs - 1
        # distributed staging: each shard writes its own emission files;
        # the driver only commits manifests over them. finalize_waves
        # limits how many shards consolidate at once: each shard's
        # consolidation holds O(its state) transient frames, so all-
        # shards-concurrent doubles the node's peak at big state — the
        # memory/wall-time trade for memory-constrained nodes
        wave = self.finalize_waves or len(self.shards)
        emissions = []
        for lo in range(0, len(self.shards), wave):
            emissions.extend(ray.get(
                [
                    sh.finalize.remote(self.watermark_us, flush,
                                       stage_root=self.out_dir, epoch=epoch)
                    for sh in self.shards[lo:lo + wave]
                ]
            ))
        emitted_counts = {}
        for stream in ("windows", "sliding", "sessions", "joins", "asof", "cep",
                       "alerts", "upserts", "wdedup",
                       *(p.name for p in self.processors)):
            files = [f for e in emissions for f in e["files"][stream]]
            rows = sum(e["rows"][stream] for e in emissions)
            emitted_counts[stream] = rows
            self.sink.commit_files(stream, epoch, files, rows, self.watermark_us)
        # windowed distinct-conversation sketch: shards return their
        # closed-window register partials (tiny); max-merge across
        # shards, estimate, commit — a cross-shard aggregate the
        # per-conv-keyed staging cannot express
        from dataflow_mm_ray.stages.sketch import hll_estimate, merge_register_frames
        from dataflow_mm_ray.state.store import _DCOUNT_P

        dparts = [e["wdistinct_partials"] for e in emissions if len(e["wdistinct_partials"])]
        if dparts:
            alld = pd.concat(dparts, ignore_index=True)
            wk, wr = merge_register_frames(
                alld["window_start_us"].to_numpy(dtype=np.int64), alld["__regs"], _DCOUNT_P
            )
            wd = pd.DataFrame(
                {"window_start_us": wk.astype(np.int64),
                 "approx_distinct_convs": np.asarray(
                     [hll_estimate(np.frombuffer(r, dtype=np.uint8)) for r in wr],
                     dtype=np.int64)}
            )
        else:
            wd = pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64),
                 "approx_distinct_convs": pd.Series([], dtype=np.int64)}
            )
        emitted_counts["wdistinct"] = int(len(wd))
        self.sink.stage_and_commit("wdistinct", epoch, wd, self.watermark_us)
        # windowed top-k tools: shards return exact per-(window, tool)
        # count partials for closed windows; sum across shards, then
        # the shared rank cut (bit-identical tie-breaks with the batch
        # windowed_top_tools query)
        from dataflow_mm_ray.groupsum import group_sum_df
        from dataflow_mm_ray.stages.stats import TOP_TOOLS_K, window_topk_cut

        tparts = [e["wtopk_partials"] for e in emissions if len(e["wtopk_partials"])]
        if tparts:
            allt = pd.concat(tparts, ignore_index=True)
            wt = window_topk_cut(
                group_sum_df(allt, ["window_start_us", "tool"], ["n_invocations"]),
                TOP_TOOLS_K,
            )
        else:
            wt = pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64),
                 "tool": pd.Series([], dtype=object),
                 "n_invocations": pd.Series([], dtype=np.int64),
                 "rank": pd.Series([], dtype=np.int64)}
            )
        emitted_counts["wtopk"] = int(len(wt))
        self.sink.stage_and_commit("wtopk", epoch, wt, self.watermark_us)
        # windowed latency percentiles: sum the shards' per-window
        # histograms (lossless merge), then the nearest-rank-upper-bound
        # read-out (stages/sketch.py lat_hist_quantile)
        from dataflow_mm_ray.stages.sketch import lat_hist_quantile

        lparts = [e["wlat_partials"] for e in emissions if len(e["wlat_partials"])]
        if lparts:
            alll = pd.concat(lparts, ignore_index=True)
            merged_h: dict[int, np.ndarray] = {}
            for w, hb in zip(alll["window_start_us"].to_numpy(dtype=np.int64),
                             alll["__hist"]):
                h = np.frombuffer(hb, dtype=np.int64)
                prev = merged_h.get(int(w))
                merged_h[int(w)] = h if prev is None else prev + h
            lkeys = sorted(merged_h)
            wl = pd.DataFrame(
                {"window_start_us": np.asarray(lkeys, dtype=np.int64),
                 "n_matched": np.asarray(
                     [int(merged_h[k].sum()) for k in lkeys], dtype=np.int64),
                 "approx_p50_us": np.asarray(
                     [lat_hist_quantile(merged_h[k], 0.5) for k in lkeys], dtype=np.int64),
                 "approx_p95_us": np.asarray(
                     [lat_hist_quantile(merged_h[k], 0.95) for k in lkeys], dtype=np.int64)}
            )
        else:
            wl = pd.DataFrame(
                {"window_start_us": pd.Series([], dtype=np.int64),
                 "n_matched": pd.Series([], dtype=np.int64),
                 "approx_p50_us": pd.Series([], dtype=np.int64),
                 "approx_p95_us": pd.Series([], dtype=np.int64)}
            )
        emitted_counts["wlat"] = int(len(wl))
        self.sink.stage_and_commit("wlat", epoch, wl, self.watermark_us)
        # late rows were staged by the map tasks (distributed, like the
        # six shard-staged streams); the driver commits the manifest only
        self.sink.commit_files("late", epoch, late_files, n_late, self.watermark_us)
        self._record_metrics(epoch, {
            "epoch": epoch,
            "input_rows": int(n_applied + n_late),
            "late_rows": n_late,
            "applied_rows": n_applied,
            "emitted": emitted_counts,
            "watermark_us": int(self.watermark_us),
            "shard_state": ray.get([sh.stats.remote() for sh in self.shards]),
        })
        self._checkpoint(epoch)
        self.next_epoch = epoch + 1

    def _record_metrics(self, epoch: int, metrics: dict) -> None:
        """Per-epoch lineage/metrics manifest (north rule: checkpoints
        record per-partition lineage + metrics). Atomic like the sink."""
        d = os.path.join(self.out_dir, "metrics")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f"epoch-{epoch}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(metrics, f)
        os.replace(tmp, os.path.join(d, f"epoch-{epoch}.json"))

    def metrics(self) -> list[dict]:
        d = os.path.join(self.out_dir, "metrics")
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["epoch"])

    def run(self, stop_after: int | None = None) -> None:
        """Process epochs until done (or stop_after, simulating a kill)."""
        while self.next_epoch < self.n_epochs:
            e = self.next_epoch
            if stop_after is not None and e > stop_after:
                return
            # replay safety: if a crash happened after sink commit but
            # before checkpoint, stage_and_commit no-ops and state replay
            # regenerates identical snapshots.
            self.run_epoch(e)

    # -- results -----------------------------------------------------------
    def results(self) -> dict[str, pd.DataFrame]:
        """Driver-side pandas results (test/verification convenience)."""
        return {s: self.sink.read_committed(s) for s in self.stream_names}

    def results_ds(self) -> dict:
        """Committed outputs as lazy Datasets (manifest-listed
        ``read_parquet``) — the consumer path that never funnels rows
        through the driver. Streams with no committed files map to
        None."""
        return {s: self.sink.read_committed_ds(s) for s in self.stream_names}


_EXTRACT_SCHEMA = {
    "conv_id": object,
    "turn_idx": np.int32,
    "role": object,
    "tool": object,
    "ts_us": np.int64,
    "text_len": np.int64,
    "is_click": bool,
    "late": bool,
    "shard": np.int32,
    "window_start_us": np.int64,
    "dk1": np.int64,
    "dk2": np.int64,
    "dshard": np.int32,
}

# same strip rule as stages/dedup.py add_dedup_key (one compiled regex)
import re as _re

_DEDUP_KEY_RE = _re.compile(r" #\d+ ")

_APPLY_OUT_SCHEMA = {
    "__applied": np.int64,
    "__max_ts": np.int64,
    "late_file": object,
    "late_rows": np.int64,
}
