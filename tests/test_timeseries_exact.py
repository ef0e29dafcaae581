"""Bit-exactness bars for the vectorized EWMA kernel (_ewma_halving).

The naive per-step loop ``y_i = fl(0.5*x_i + 0.5*y_{i-1})`` DEFINES the
semantics (it is what DuckDB's recursive CTE evaluates); the vectorized
scaled-cumsum kernel must reproduce it bit-for-bit on every input,
including the guard-triggering extremes (huge magnitudes, decay chains
toward zero, mixed exponents). Separately, the sequentiality of
np.cumsum — which the scaled-domain argument relies on — is pinned
directly.
"""

from __future__ import annotations

import numpy as np
import pytest

from adlspark.ops.timeseries import _ewma_halving


def _loop(vals: np.ndarray) -> np.ndarray:
    out = vals.copy()
    for i in range(1, len(out)):
        out[i] = 0.5 * vals[i] + 0.5 * out[i - 1]
    return out


def _assert_bit_equal(a: np.ndarray, b: np.ndarray) -> None:
    assert a.shape == b.shape
    # view as int64 so NaN payloads and -0.0 vs 0.0 also must agree
    assert np.array_equal(a.view(np.int64), b.view(np.int64))


def _cases():
    rng = np.random.default_rng(20260814)
    for trial in range(120):
        n = int(rng.integers(0, 2500))
        kind = trial % 6
        if kind == 0:  # realistic events.value scale
            v = rng.normal(0, 1000, n)
        elif kind == 1:  # tiny but normal-range
            v = rng.uniform(-1e-10, 1e-10, n)
        elif kind == 2:  # overflow-guard extremes
            v = rng.choice(
                [0.0, 1.0, -1.0, 1e300, -1e300, 1e-300, 0.1, 1 / 3], n
            )
        elif kind == 3:  # mixed exponents across ~170 decades
            v = rng.normal(0, 1, n) * np.exp(rng.uniform(-200, 200, n))
        elif kind == 4:  # long zero tail: y halves toward subnormal
            v = np.concatenate([rng.normal(0, 1, n // 2), np.zeros(n - n // 2)])
        else:  # near-cancellation pairs
            base = rng.normal(0, 1, n)
            v = base * rng.choice([1.0, -1.0 + 1e-15], n)
        yield trial, v


@pytest.mark.parametrize("trial,vals", _cases(), ids=lambda c: str(c))
def test_ewma_kernel_bit_exact_vs_loop(trial, vals):
    _assert_bit_equal(_loop(vals), _ewma_halving(vals))


def test_ewma_kernel_edge_lengths():
    for v in (np.array([]), np.array([3.7]), np.array([1.0, 2.0])):
        _assert_bit_equal(_loop(v), _ewma_halving(v))


@pytest.mark.parametrize("split", [1, 2, 3, 511, 512, 513, 1000])
def test_ewma_kernel_carry_matches_unsplit(split):
    # Resuming with prev= across an arbitrary split point must equal the
    # unsplit evaluation bit-for-bit — this is the batch-boundary carry
    # contract mapInPandas relies on.
    rng = np.random.default_rng(7)
    v = rng.normal(0, 1000, 1500)
    whole = _ewma_halving(v)
    split = min(split, len(v))
    head = _ewma_halving(v[:split])
    tail = _ewma_halving(v[split:], prev=head[-1])
    _assert_bit_equal(whole, np.concatenate([head, tail]))


def test_ewma_kernel_carry_guard_extremes():
    # prev participates in the overflow guard: a huge carry with small
    # values must still match the loop exactly (via fallback).
    v = np.full(700, 1e-3)
    prev = 1e305
    ref = v.copy()
    ref[0] = 0.5 * v[0] + 0.5 * prev
    for i in range(1, len(ref)):
        ref[i] = 0.5 * v[i] + 0.5 * ref[i - 1]
    _assert_bit_equal(ref, _ewma_halving(v, prev=prev))


def test_ewma_kernel_subnormal_decay_falls_back():
    # 2000 zeros after a seed of 1.0 drives y to 2^-2000 in real
    # arithmetic — deep in (and past) the subnormal range, where the
    # scaled domain would keep precision the unscaled loop loses. The
    # guard must fall back so the loop semantics win bit-for-bit.
    v = np.concatenate([[1.0], np.zeros(2000)])
    _assert_bit_equal(_loop(v), _ewma_halving(v))


def test_cumsum_is_sequential_left_to_right():
    # The scaled-domain argument requires np.cumsum to perform one
    # correctly-rounded add per element, left to right (no pairwise or
    # reordered accumulation). [1, eps/2, eps/2, eps/2] distinguishes
    # them: sequentially each 1 + eps/2 is an exact tie that rounds to
    # even (back to 1.0); any pairwise variant combines eps/2 terms
    # first and reaches 1 + eps or more.
    eps = np.finfo(np.float64).eps
    out = np.cumsum(np.array([1.0, eps / 2, eps / 2, eps / 2]))
    assert out[-1] == 1.0
