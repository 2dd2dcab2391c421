"""DuckDB SQL builder for the md5-backed HyperLogLog twin.

Reproduces ``stages/sketch.py`` (md5_hash64 + _ranks +
hll_estimate_sqlexact) exactly for a given precision ``p``: 64-bit
value from the first 16 md5 hex chars, register = top ``p`` bits, rank
= leading zeros of the low ``64-p`` bits + 1 (``64-p+1`` when zero,
found by a 6-step arithmetic bit scan — no lossy log2), estimate from
the EXACT HUGEINT register sum so the final double is bit-equal to the
engine's. The register sum mirrors the engine's fixed 2^51 scaling
(``c << (51 - rank)``; ranks above 51 — probability 2^-51 per hash —
contribute 0 on BOTH sides, like the engine's bincount loop).
"""
from __future__ import annotations


def _nib(i: int) -> str:
    return f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1)"


def _idx_expr(p: int) -> str:
    """Top-p-bits register index from md5 nibbles (0-based hex chars)."""
    full_nibs, rem = divmod(p, 4)
    terms = []
    shift = p
    for i in range(full_nibs):
        shift -= 4
        terms.append(f"{_nib(i)} * {1 << shift}" if shift else _nib(i))
    if rem:
        terms.append(f"{_nib(full_nibs)} // {1 << (4 - rem)}")
    return "(" + " + ".join(terms) + ")"


def _low_expr(p: int) -> str:
    """Low 64-p bits as a BIGINT from md5 nibbles."""
    full_nibs, rem = divmod(p, 4)
    terms = []
    if rem:
        # the straddling nibble contributes its low (4 - rem) bits
        terms.append(f"({_nib(full_nibs)} % {1 << (4 - rem)}) * {1 << (4 * (15 - full_nibs))}")
        start = full_nibs + 1
    else:
        start = full_nibs
    for i in range(start, 16):
        w = 1 << (4 * (15 - i))
        terms.append(f"{_nib(i)} * {w}" if w > 1 else _nib(i))
    return "(" + " + ".join(f"CAST({t} AS BIGINT)" for t in terms) + ")"


def hll_md5_estimate_sql(pairs_sql: str, group_out_expr: str,
                         group_out_name: str, out_col: str, p: int = 14) -> str:
    """SQL whose result is (group_out_name, out_col) — the md5-HLL
    estimate per group at precision ``p`` (MUST match the engine side:
    sketch.HLL_P for approx_distinct, state.store._DCOUNT_P for the
    windowed sketch).

    ``pairs_sql`` must be a SELECT producing DISTINCT (g, v) pairs
    (columns literally named ``g`` and ``v``); ``group_out_expr`` is an
    expression over ``g`` for the output group column (e.g. ``g`` or
    ``make_timestamp(g)``)."""
    m = 1 << p
    lzbits = 64 - p  # width of the rank field
    rank_zero = lzbits + 1  # rank when the low bits are all zero
    return f"""
wc AS ({pairs_sql}),
hv AS (SELECT g, md5(CAST(v AS VARCHAR)) AS h FROM wc),
vi AS (SELECT g, {_idx_expr(p)} AS idx, {_low_expr(p)} AS low FROM hv),
m1 AS (SELECT *, CASE WHEN low >= CAST({1 << 32} AS BIGINT) THEN 32 ELSE 0 END AS p1 FROM vi),
m2 AS (SELECT *, p1 + CASE WHEN (low >> p1) >= 65536 THEN 16 ELSE 0 END AS p2 FROM m1),
m3 AS (SELECT *, p2 + CASE WHEN (low >> p2) >= 256 THEN 8 ELSE 0 END AS p3 FROM m2),
m4 AS (SELECT *, p3 + CASE WHEN (low >> p3) >= 16 THEN 4 ELSE 0 END AS p4 FROM m3),
m5 AS (SELECT *, p4 + CASE WHEN (low >> p4) >= 4 THEN 2 ELSE 0 END AS p5 FROM m4),
m6 AS (SELECT *, p5 + CASE WHEN (low >> p5) >= 2 THEN 1 ELSE 0 END AS msb FROM m5),
ranked AS (SELECT g, idx,
           CASE WHEN low = 0 THEN {rank_zero} ELSE {lzbits} - msb END AS rank FROM m6),
regs AS (SELECT g, idx, max(rank) AS r FROM ranked GROUP BY 1, 2),
agg AS (
  SELECT g, CAST({m} - count(*) AS BIGINT) AS zeros,
         CAST(sum(CAST(CASE WHEN r > 51 THEN 0
                            ELSE CAST(1 AS BIGINT) << (51 - r) END AS HUGEINT))
              + CAST({m} - count(*) AS HUGEINT) * CAST(CAST(1 AS BIGINT) << 51 AS HUGEINT)
              AS DOUBLE) AS sd
  FROM regs GROUP BY 1
), fin AS (
  SELECT g, zeros,
    (0.7213 / (1 + 1.079 / {m}.0)) * {m}.0 * {m}.0 / (sd * power(2.0, -51)) AS e
  FROM agg
)
SELECT {group_out_expr} AS {group_out_name},
  CAST(trunc(CASE WHEN e <= 2.5 * {m}.0 AND zeros > 0
                  THEN {m}.0 * ln({m}.0 / zeros) ELSE e END) AS BIGINT)
    AS {out_col}
FROM fin
"""
