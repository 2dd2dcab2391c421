"""MultimodalMathGenerator (``multimodal_math_generator.py:117-233``)
re-expressed Ray-Data-first.

The reference draws every choice from the global ``random`` module; this
engine derives all of them from md5('math-' + doc_id) nibbles so any
worker, any partitioning and the DuckDB oracle produce identical rows
(the repo-wide per-row-seed determinism rule). Scalar math goes through
``math.sin``/``math.exp`` (platform libm — the same code DuckDB's
``sin()``/``exp()`` calls) rather than numpy's SIMD kernels, so engine
and oracle round identical doubles.

Formatting convention (documented deviation): the reference formats
answers with ``str(round(y, 3))``; this engine does the same and the
oracle uses ``CAST(round(y, 3) AS VARCHAR)`` — both print the shortest
round-trip decimal of the same double, and the rounded quantities never
sit on a decimal half-way point that is exactly representable in
binary, so the two rounds agree (verified per-row by the oracle gate).

The function plot itself (``create_function_plot``, matplotlib) is a
sandbox-absent side effect: the engine emits the reference's
``image_path`` layout (``plots/plot_<doc_id>.png``; the reference keys
by dataframe position, we key by doc_id for partition-independence) and
can stage a deterministic stub payload per path via ``media_dir``.
"""
from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

# (label, f, expr) — multimodal_math_generator.py:124-129
SIMPLE_FUNCS = [
    ("Linear function", lambda x: 2 * x + 1, "f(x) = 2x + 1"),
    ("Quadratic function", lambda x: x * x, "f(x) = x²"),
    ("Sine function", math.sin, "f(x) = sin(x)"),
    ("Exponential function", lambda x: math.exp(x / 2), "f(x) = exp(x/2)"),
]

# (name, f, expr, domain_hi) — multimodal_math_generator.py:199-203
COMPLEX_FUNCS = [
    ("Quadratic", lambda x: x * x, "f(x) = x²", 5),
    ("Sine", math.sin, "f(x) = sin(x)", 6),
    ("Exponential", lambda x: math.exp(x / 2), "f(x) = exp(x/2)", 5),
]


def _nib(h: str, i: int) -> int:
    return int(h[i], 16)


def _linspace(a: float, b: float, n: int) -> list[float]:
    """np.linspace bit-equal: x_i = i * ((b-a)/(n-1)) + a, last = b."""
    delta = (b - a) / (n - 1)
    xs = [i * delta + a for i in range(n)]
    xs[-1] = b
    return xs


def _simple_sample(doc_id: int, h: str) -> tuple[str, str, str]:
    """multimodal_math_generator.py:123-142 with nibble-derived choices:
    func = nib1 % 4, x = 1.0 + ((nib2*16+nib3) % 31)/10."""
    _label, f, expr = SIMPLE_FUNCS[_nib(h, 1) % 4]
    k = (_nib(h, 2) * 16 + _nib(h, 3)) % 31
    x_val = (10 + k) / 10
    y_val = round(float(f(x_val)), 3)
    question = f"The function plot represents {expr}. What is the function value at x={x_val}?"
    answer = str(y_val)
    solution = (
        f"According to the function expression {expr}, substitute x={x_val} to get y={y_val}."
    )
    return question, answer, solution


def _complex_sample(doc_id: int, h: str) -> tuple[str, str, str]:
    """multimodal_math_generator.py:168-210: qtype = nib4 % 3 over
    derivative / extremum / monotonicity, func = nib1 % 3."""
    _name, f, expr, hi = COMPLEX_FUNCS[_nib(h, 1) % 3]
    qtype = _nib(h, 4) % 3
    if qtype == 0:
        # derivative sign at x (reference lines 168-177)
        k = (_nib(h, 5) * 16 + _nib(h, 6)) % (10 * hi + 1)
        x = k / 10
        d = f(x + 0.01) - f(x - 0.01)
        direction = "positive" if d > 0 else "negative" if d < 0 else "zero"
        return (
            f"The function plot represents {expr}. Is the rate of change (derivative) at x={x} positive or negative?",
            direction,
            f"By observing the slope of the plot near x={x}, the rate of change is {direction}.",
        )
    if qtype == 1:
        # extremum over linspace(domain, 100) (reference lines 155-158, 179-186)
        xs = _linspace(0.0, float(hi), 100)
        ys = [f(x) for x in xs]
        i_min = int(np.argmin(ys))
        x_min = round(float(xs[i_min]), 2)
        y_min = round(float(ys[i_min]), 2)
        return (
            f"The function plot represents {expr}. At which x-value does the function reach its minimum value in the shown domain?",
            str(x_min),
            f"From the plot, the minimum occurs at x={x_min}, with y={y_min}",
        )
    # monotonicity over linspace(a, b, 50) (reference lines 159-167, 188-196)
    k1 = (_nib(h, 5) * 16 + _nib(h, 6)) % (10 * hi + 1)
    k2 = (_nib(h, 7) * 16 + _nib(h, 8)) % (10 * hi + 1)
    a, b = sorted((k1 / 10, k2 / 10))
    xs = _linspace(a, b, 50)
    ys = [f(x) for x in xs]
    diffs = np.diff(np.array(ys, dtype=np.float64))
    if len(diffs) and np.all(diffs > 0):
        mono = "increasing"
    elif len(diffs) and np.all(diffs < 0):
        mono = "decreasing"
    else:
        mono = "not monotonic"
    return (
        f"The function plot represents {expr}. Is the function monotonically increasing or decreasing in the interval [{a}, {b}]?",
        mono,
        f"By observing the function value trend in the interval [{a}, {b}], the function is {mono}.",
    )


def math_samples_batch(b: pd.DataFrame, mode_key: str = "mode") -> pd.DataFrame:
    """Vectorizable wrapper: one (image_path, question, answer, solution)
    row per input row — 'simple' mode rows get value-substitution
    questions, anything else the complex derivative/extremum/
    monotonicity set (reference run(), lines 215-233)."""
    doc_ids = b["doc_id"].to_numpy()
    modes = b[mode_key].to_numpy()
    qs, ans, sols, imgs = [], [], [], []
    for doc_id, mode in zip(doc_ids, modes):
        h = hashlib.md5(f"math-{doc_id}".encode()).hexdigest()
        q, a, s = (
            _simple_sample(int(doc_id), h)
            if mode == "simple"
            else _complex_sample(int(doc_id), h)
        )
        qs.append(q)
        ans.append(a)
        sols.append(s)
        imgs.append(f"plots/plot_{doc_id}.png")
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "image_path": np.array(imgs, dtype=object),
            "question": np.array(qs, dtype=object),
            "answer": np.array(ans, dtype=object),
            "solution": np.array(sols, dtype=object),
        }
    )
