#!/usr/bin/env python
"""Round-3 refit breakdown with PROPER fencing for the tunneled chip:
`block_until_ready` does not reliably fence here, so every timed window
ends with a host fetch of a scalar reduction (CLAUDE.md timing rule).
All comparisons are within this one process.

Decomposes a vmapped (B=256, k=200) Adam iteration: gram fwd, sweep
kernel fwd (kinv_logdet), solve_and_logdet fwd, MLL fwd, MLL
value_and_grad, full fit scan per-iter marginal.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.models.mvgp import make_mvgp_rank1

B = int(os.environ.get("PROF_B", "256"))
K = int(os.environ.get("PROF_K", "200"))
gp = make_mvgp_rank1(3, 2)
key = jax.random.PRNGKey(0)
params = gp.init_params(key, dtype=jnp.float32)
rng = np.random.default_rng(0)
# ring-buffer-like data: consecutive states dt apart (realistic
# conditioning, which the sweep kernel's pivot path is sensitive to)
dt = 0.01
Xe = np.cumsum(rng.normal(scale=dt, size=(B, K, 3)), axis=1)
X = jnp.asarray(Xe, jnp.float32)
U = jnp.asarray(rng.normal(size=(B, K, 2)), jnp.float32)
Xd = jnp.asarray(rng.normal(size=(B, K, 3)), jnp.float32)
datas = jax.vmap(gp.make_data)(X, U, Xd)
paramss = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), params)


def fetch(out):
    """Force a host fetch so the timed window actually fences."""
    leaves = [l for l in jax.tree.leaves(out)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    return float(sum(jnp.sum(l).astype(jnp.float32) for l in leaves))


def timeit(label, fn, *args, reps=10):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            s = fetch(fn(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{label:44s} {best*1e3:9.3f} ms", flush=True)
    return best


gram_v = jax.jit(jax.vmap(gp.gram_kb))
Kb = gram_v(paramss, datas)
t_gram = timeit("gram build fwd", gram_v, paramss, datas)

from bayesian_cbf_tpu.ops.pallas_sweep import batched_kinv_logdet
t_sweep = timeit("sweep kernel (kinv+logdet)", batched_kinv_logdet, Kb)

from bayesian_cbf_tpu.ops.cholinv import solve_and_logdet
Yv = jax.jit(jax.vmap(gp.residual_Y))(paramss, datas)
sld = jax.jit(jax.vmap(solve_and_logdet))
t_sld = timeit("solve_and_logdet fwd", sld, Kb, Yv)

mll_v = jax.jit(jax.vmap(gp.mll))
t_mll = timeit("mll fwd (incl gram+sweep)", mll_v, paramss, datas)

mll_g = jax.jit(jax.vmap(jax.value_and_grad(gp.mll)))
t_mllg = timeit("mll value_and_grad", mll_g, paramss, datas)


def fit_n(n):
    f = jax.jit(jax.vmap(lambda p, d: gp.fit(p, d, training_iter=n)))
    return f


f5, f25 = fit_n(5), fit_n(25)
t5 = timeit("fit 5 iters", f5, paramss, datas, reps=3)
t25 = timeit("fit 25 iters", f25, paramss, datas, reps=3)
per_iter = (t25 - t5) / 20.0
print(f"{'per-Adam-iter marginal (fit scan)':44s} {per_iter*1e3:9.3f} ms")
print(f"{'  of which mll grad':44s} {t_mllg*1e3:9.3f} ms")
print(f"{'  of which sweep fwd':44s} {t_sweep*1e3:9.3f} ms")
print(f"{'  backward+optax residual':44s} "
      f"{(per_iter - t_mllg)*1e3:9.3f} ms")
