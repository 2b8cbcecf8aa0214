#!/usr/bin/env python
"""On-chip probe: NON-recursive full-width sweep as the fit inversion.

tests/test_fit_inverse.py pins that every recursive split of the
Schur/sweep kernel is non-finite on real trajectory-correlated fit
Grams, but NOTES_round3 records that the non-recursive full sweep
(base >= n: one sweep block, no Schur complement) survives.  If its
wall at the flagship fit shape (B=256, k=200 -> padded 256) beats the
blocked-Cholesky kernel (9.85 ms/Adam-iter, fit_chol_nb_ab), it could
retake the fit path.  This measures (1) finiteness + resid on the
regression Gram, (2) standalone inversion wall vs the chol kernel,
(3) fused-fit ms/Adam-iter.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("AB_B", "256"))
    k = int(os.environ.get("AB_K", "200"))
    from bayesian_cbf_tpu.ops import pallas_sweep as ps
    from bayesian_cbf_tpu.ops.pallas_chol import batched_chol_with_inv

    # regression Gram (same generator as tests/test_fit_inverse.py)
    rng = np.random.default_rng(42)
    X = np.cumsum(0.02 * rng.normal(size=(k, 3)), 0).astype(np.float32)
    d = X[:, None, :] - X[None, :, :]
    K0 = np.exp(-0.5 * np.sum(d * d, -1))
    Km = (K0 + 2.5e-4 * np.eye(k)).astype(np.float32)
    M64 = Km.astype(np.float64)

    full_base = ps._padded_size(k, None)
    # smallest base that makes the padded size itself (no recursion):
    # pad to a multiple of base with base >= padded n
    full_base = max(256, ((k + 255) // 256) * 256)

    KB = jnp.asarray(np.broadcast_to(Km, (B, k, k)).copy())

    def fence(x):
        return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))

    out = {}
    # 1) robustness of the full sweep on the real-structure Gram
    Kinv, ld = ps.batched_kinv_logdet(jnp.asarray(Km)[None],
                                      base=full_base)
    Ki = np.asarray(Kinv[0], np.float64)
    finite = bool(np.all(np.isfinite(Ki)))
    resid = float(np.max(np.abs(Ki @ M64 - np.eye(k)))) if finite else None
    sign, ld64 = np.linalg.slogdet(M64)
    out["sweep_full"] = {
        "base": full_base, "finite": finite, "resid": resid,
        "logdet_err": abs(float(ld[0]) - ld64) if finite else None}

    # 2) standalone inversion wall, best-of-3, host-fetch fenced
    def time_fn(f):
        r = f(KB)
        fence(r[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(KB)
            fence(r[0])
            best = min(best, time.perf_counter() - t0)
        return round(best * 1e3, 3)

    out["wall_ms_sweep_full"] = time_fn(
        lambda K: ps.batched_kinv_logdet(K, base=full_base))
    out["wall_ms_sweep_rec"] = time_fn(
        lambda K: ps.batched_kinv_logdet(K))
    out["wall_ms_chol_nb32"] = time_fn(
        lambda K: batched_chol_with_inv(K, nb=32))
    print(json.dumps({"item": "sweep_full_probe", **out}), flush=True)


if __name__ == "__main__":
    main()
