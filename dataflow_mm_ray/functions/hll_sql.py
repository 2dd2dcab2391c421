"""DuckDB SQL builder for the md5-backed HyperLogLog twin.

Reproduces ``stages/sketch.py`` (md5_hash64 + _ranks +
hll_estimate_sqlexact) exactly: 64-bit value from the first 16 md5 hex
chars, register = top 14 bits, rank = leading zeros of the low 50 bits
+ 1 (51 when zero, found by a 6-step arithmetic bit scan — no lossy
log2), estimate from the EXACT HUGEINT register sum so the final
double is bit-equal to the engine's.
"""
from __future__ import annotations

HLL_SQL_P = 14  # must match state.store._DCOUNT_P / sketch.HLL_P


def _nib(i: int) -> str:
    return f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1)"


def hll_md5_estimate_sql(pairs_sql: str, group_out_expr: str,
                         group_out_name: str, out_col: str) -> str:
    """SQL whose result is (group_out_name, out_col) — the md5-HLL
    estimate per group.

    ``pairs_sql`` must be a SELECT producing DISTINCT (g, v) pairs
    (columns literally named ``g`` and ``v``); ``group_out_expr`` is an
    expression over ``g`` for the output group column (e.g. ``g`` or
    ``make_timestamp(g)``)."""
    idx = f"({_nib(0)} * 1024 + {_nib(1)} * 64 + {_nib(2)} * 4 + {_nib(3)} // 4)"
    low_terms = [f"({_nib(3)} % 4) * {1 << 48}"]
    low_terms += [
        f"{_nib(i)} * {1 << (4 * (15 - i))}" if i < 15 else _nib(i) for i in range(4, 16)
    ]
    low = "(" + " + ".join(f"CAST({t} AS BIGINT)" for t in low_terms) + ")"
    m = 1 << HLL_SQL_P
    return f"""
wc AS ({pairs_sql}),
hv AS (SELECT g, md5(CAST(v AS VARCHAR)) AS h FROM wc),
vi AS (SELECT g, {idx} AS idx, {low} AS low FROM hv),
m1 AS (SELECT *, CASE WHEN low >= CAST({1 << 32} AS BIGINT) THEN 32 ELSE 0 END AS p1 FROM vi),
m2 AS (SELECT *, p1 + CASE WHEN (low >> p1) >= 65536 THEN 16 ELSE 0 END AS p2 FROM m1),
m3 AS (SELECT *, p2 + CASE WHEN (low >> p2) >= 256 THEN 8 ELSE 0 END AS p3 FROM m2),
m4 AS (SELECT *, p3 + CASE WHEN (low >> p3) >= 16 THEN 4 ELSE 0 END AS p4 FROM m3),
m5 AS (SELECT *, p4 + CASE WHEN (low >> p4) >= 4 THEN 2 ELSE 0 END AS p5 FROM m4),
m6 AS (SELECT *, p5 + CASE WHEN (low >> p5) >= 2 THEN 1 ELSE 0 END AS msb FROM m5),
ranked AS (SELECT g, idx, CASE WHEN low = 0 THEN 51 ELSE 50 - msb END AS rank FROM m6),
regs AS (SELECT g, idx, max(rank) AS r FROM ranked GROUP BY 1, 2),
agg AS (
  SELECT g, CAST({m} - count(*) AS BIGINT) AS zeros,
         CAST(sum(CAST(CAST(1 AS BIGINT) << (51 - r) AS HUGEINT))
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
