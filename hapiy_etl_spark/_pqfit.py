"""Per-subspace PQ codebook fit worker — a DELIBERATELY tiny module.

``_pq_codebooks`` (operators/similarity.py) dispatches its m
independent per-subspace Lloyd fits to a spawn-based process pool
(optimization guide §4.5: the measured thread-pool attempt was 2-4x
SLOWER — the centroid-update loop is many small GIL-bound numpy calls —
and a fork pool under a py4j-attached driver risks the child's GC
finalizing shared JavaObjects over the parent's live gateway socket).
Spawn workers import ONLY this module, so worker startup costs a numpy
import, not a pyspark one, and the pool touches no JVM state at all.

Bit-identity contract: the fit below is the EXACT serial per-subspace
code — same init (indices pre-drawn serially in the parent so the
shared RandomState sequence is unchanged), same distance expression,
same masked-mean update on the same contiguous layout — so the pooled
books are ``np.array_equal`` to the serial fit's
(tests/test_optimization_r16.py pins it per geometry).
"""

from __future__ import annotations


def fit_subspace(x, init_idx, n_codes: int, iters: int):
    """Lloyd k-means for ONE PQ subspace — the loop body of the serial
    ``_pq_codebooks``, verbatim. ``x`` is the (n, sub) sample slice
    (C-contiguous), ``init_idx`` the pre-drawn seed row indices."""
    import numpy as np

    cent = x[init_idx]
    if len(cent) < n_codes:  # degenerate tiny sample: pad by repeat
        cent = np.resize(cent, (n_codes, x.shape[1]))
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_codes):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
    return cent
