#!/usr/bin/env python
"""On-chip A/B: per-Adam-iteration cost of the batched fused fit vs the
fit-inversion kernel choice, at the flagship shape (B=256, k=200).

Variants: chol kernel at nb in AB_NBS (default 32,64,128) and, for a
timing reference only, the sweep kernel (its VALUES are non-finite on
real fit Grams — records fit_inverse_regression_root_cause — but its
wall is the old 305k stack's refit floor).

One process, host-fetch fenced, best-of-3 (CLAUDE.md timing rules).
Data: synthetic random-walk trajectory buffers (the conditioning regime
that matters; same generator as tests/test_fit_inverse.py).
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
    iters = int(os.environ.get("AB_ITERS", "20"))
    nbs = [int(x) for x in os.environ.get("AB_NBS", "32,64,128").split(",")]

    from bayesian_cbf_tpu.models.mvgp import make_mvgp
    import bayesian_cbf_tpu.models.mvgp as mv
    import bayesian_cbf_tpu.ops.gramsolve as gs
    from bayesian_cbf_tpu.ops import cholinv

    xd, m = 3, 2
    gp = make_mvgp(xd, m)
    rng = np.random.default_rng(0)
    X = np.cumsum(0.02 * rng.normal(size=(B, k, xd)), 1).astype(np.float32)
    U = rng.normal(size=(B, k, m)).astype(np.float32)
    UH = np.concatenate([np.ones((B, k, 1), np.float32), U], -1)
    Xdot = np.cumsum(0.1 * rng.normal(size=(B, k, xd)), 1).astype(np.float32)

    params = gp.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    data0 = gp.empty_data(k, dtype=jnp.float32)
    datas = jax.vmap(lambda x, uh, xd_: data0._replace(
        X=x, UH=uh, Xdot=xd_, mask=jnp.ones((k,), jnp.float32)))(
        jnp.asarray(X), jnp.asarray(UH), jnp.asarray(Xdot))
    paramss = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), params)

    mv.FUSED_FIT = True
    gs.USE_FUSED = None

    def run_variant(tag):
        fit = jax.jit(jax.vmap(
            lambda p, d: gp.fit(p, d, training_iter=iters)))
        out = fit(paramss, datas)
        float(jnp.sum(out.raw_lengthscale))      # compile + fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fit(paramss, datas)
            float(jnp.sum(out.raw_lengthscale))  # host fetch fences
            best = min(best, time.perf_counter() - t0)
        finite = bool(jnp.all(jnp.isfinite(
            jax.vmap(gp.mll)(out, datas))))
        rec = {"variant": tag, "B": B, "k": k, "iters": iters,
               "ms_per_adam_iter": round(best / iters * 1e3, 3),
               "mll_finite": finite}
        print(json.dumps(rec), flush=True)
        return rec

    chunks = [int(x) for x in
              os.environ.get("AB_CHOL_CHUNKS", "0").split(",")]
    asms = os.environ.get("AB_CHOL_ASM", "").split(",") \
        if os.environ.get("AB_CHOL_ASM") else [""]
    kinds = os.environ.get("AB_KINDS", "chol").split(",")
    results = []
    for kind in kinds:
        for nb in nbs:
            for ck in chunks:
                for asm in asms:
                    cholinv.FIT_INVERSE = kind
                    cholinv.FIT_CHOL_NB = nb
                    cholinv.FIT_CHOL_CHUNK = ck
                    cholinv.FIT_CHOL_ASSEMBLY = asm
                    results.append(run_variant(
                        "%s_nb%d_chunk%d%s" % (kind, nb, ck,
                                               ("_" + asm) if asm else "")))
    cholinv.FIT_CHOL_ASSEMBLY = ""
    if not os.environ.get("AB_SKIP_SWEEP"):
        cholinv.FIT_INVERSE = "sweep_full"
        results.append(run_variant("sweep_full"))
        cholinv.FIT_INVERSE = "sweep"
        results.append(run_variant("sweep_reference_timing_only"))
    cholinv.FIT_INVERSE = "chol"
    cholinv.FIT_CHOL_NB = 0
    cholinv.FIT_CHOL_CHUNK = 0
    print(json.dumps({"item": "fit_chol_nb_ab", "results": results}))


if __name__ == "__main__":
    main()
