"""The Arrow assignment kernels are batch matmuls, not per-row matvecs
(r12 verdict #1): one X @ C.T per Arrow batch. These tests pin (a) the
batch kernel's value-equivalence to the per-row reference loop it
replaced, and (b) a SANITY speed bound — ≥1.5× at the verdict's
64-dim / 16k-row shape (the real gap is ~10-30×; the bound is
deliberately loose because wall-clock unit assertions couple CI to
host timing — r13 advice: a loaded shared host or a
parallel-throttled BLAS can shrink the gap without any code being
wrong. 1.5× only fails if the matmul kernel has genuinely regressed
to per-row cost; best-of-3 on both sides, and the ratio is skipped
entirely when the 1-minute loadavg exceeds the core count — measured
flaking at 1.4× with a concurrent Spark suite saturating the host,
values still exact). No Spark session: the
kernel math is exercised directly through _finite_rows + the same
expressions the mapInPandas closures run."""

import os
import time

import numpy as np
import pandas as pd
import pytest

from coolplaydruid_spark.operators import similarity


def _mk(rows=16_000, dim=64, k=256, seed=7):
    rng = np.random.RandomState(seed)
    Cv = rng.randn(k, dim)
    vecs = pd.Series(list(rng.randn(rows, dim)))
    return vecs, Cv, (Cv * Cv).sum(axis=1)


def _best_of(fn, n=3):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def test_batch_argmin_kernel_matches_and_beats_per_row_loop():
    vecs, Cv, c2 = _mk()

    def batch():
        rows, M = similarity._finite_rows(vecs)
        return rows, (c2[None, :] - 2.0 * (M @ Cv.T)).argmin(axis=1)

    def per_row():  # the pre-r13 inner loop, verbatim semantics
        cells = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64)
            d = c2 - 2.0 * (Cv @ x)
            cells.append(int(d.argmin()))
        return cells

    (rows, best), t_batch = _best_of(batch)
    loop_cells, t_row = _best_of(per_row)
    assert rows.tolist() == list(range(len(vecs)))
    assert best.tolist() == loop_cells
    load1 = os.getloadavg()[0]
    if load1 > (os.cpu_count() or 4):
        pytest.skip(f"host saturated (load1={load1:.1f}); "
                    "wall-clock ratio not meaningful")
    # r15: the single-shot ratio flaked at load1≈5 (a decaying spike the
    # loadavg guard admits): the 2-thread-capped BLAS gemm best-of-3 read
    # 2.46 s for a 0.26 GFLOP matmul that times 0.04 s idle — memory-
    # bandwidth contention slows the gemm far more than the Python loop.
    # Retry the RATIO a few times: contention has to poison every batch
    # run of every attempt to flake, while a kernel genuinely regressed
    # to per-row cost can never reach 1.5× and still fails all attempts.
    attempts = [(t_batch, t_row)]
    for _ in range(2):
        if t_row >= 1.5 * t_batch:
            break
        _, t_batch = _best_of(batch)
        _, t_row = _best_of(per_row)
        attempts.append((t_batch, t_row))
    assert t_row >= 1.5 * t_batch, (
        f"batch kernel only {t_row / t_batch:.1f}x the per-row loop in "
        f"{len(attempts)} attempts (batch,row)={attempts}")


def test_batch_probe_kernel_matches_per_row_argsort():
    vecs, Cv, c2 = _mk(rows=2_000)
    n_probe = 4
    rows, M = similarity._finite_rows(vecs)
    D = c2[None, :] - 2.0 * (M @ Cv.T)
    order = np.argsort(D, axis=1, kind="stable")[:, :n_probe]
    got = list(zip(np.repeat(rows, order.shape[1]).tolist(),
                   order.ravel().tolist()))
    want = []
    for i, v in enumerate(vecs):
        d = c2 - 2.0 * (Cv @ np.asarray(v, dtype=np.float64))
        for c in np.argsort(d, kind="stable")[:n_probe]:
            want.append((i, int(c)))
    assert got == want


def test_finite_rows_screens_null_and_nonfinite():
    vecs = pd.Series([
        np.array([1.0, 2.0]), None, np.array([np.nan, 1.0]),
        np.array([np.inf, 0.0]), np.array([3.0, 4.0]),
    ])
    rows, M = similarity._finite_rows(vecs)
    assert rows.tolist() == [0, 4]
    assert M.tolist() == [[1.0, 2.0], [3.0, 4.0]]
    empty, none_m = similarity._finite_rows(pd.Series([None, None]))
    assert empty.size == 0 and none_m is None
    zero, zm = similarity._finite_rows(pd.Series([], dtype=object))
    assert zero.size == 0 and zm is None
