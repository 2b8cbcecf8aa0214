#!/usr/bin/env python
"""Break the MLL-refit cost into parts on the chip: which op dominates a
vmapped (batch=256) Adam iteration at k=200?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.models.mvgp import make_mvgp_rank1

B, K = 256, 200
gp = make_mvgp_rank1(3, 2)
key = jax.random.PRNGKey(0)
params = gp.init_params(key, dtype=jnp.float32)
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(B, K, 3)), jnp.float32)
U = jnp.asarray(rng.normal(size=(B, K, 2)), jnp.float32)
Xd = jnp.asarray(rng.normal(size=(B, K, 3)), jnp.float32)
datas = jax.vmap(gp.make_data)(X, U, Xd)
paramss = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), params)


def timeit(label, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1e3:9.2f} ms", flush=True)
    return dt


mll_v = jax.jit(jax.vmap(gp.mll))
timeit("mll forward", mll_v, paramss, datas)

mll_g = jax.jit(jax.vmap(jax.value_and_grad(gp.mll)))
timeit("mll value_and_grad", mll_g, paramss, datas)

gram_v = jax.jit(jax.vmap(gp.gram_kb))
Kb = gram_v(paramss, datas)
timeit("gram build", gram_v, paramss, datas)

chol_v = jax.jit(jnp.linalg.cholesky)
L = chol_v(Kb)
timeit("batched cholesky fwd", chol_v, Kb)

cholg = jax.jit(jax.grad(lambda k: jnp.sum(
    jnp.log(jnp.maximum(jnp.abs(jnp.diagonal(
        jnp.linalg.cholesky(k), axis1=-2, axis2=-1)), 1e-20)))))
timeit("cholesky fwd+logdet-grad", cholg, Kb)

Yv = jax.vmap(gp.residual_Y)(paramss, datas)
solve_v = jax.jit(lambda L, Y: jax.scipy.linalg.solve_triangular(
    L, Y, lower=True))
timeit("batched tri solve (K,3)", solve_v, L, Yv)

fit5 = jax.jit(jax.vmap(lambda p, d: gp.fit(p, d, training_iter=5)))
t5 = timeit("fit 5 iters (vmapped)", fit5, paramss, datas, reps=3)
fit20 = jax.jit(jax.vmap(lambda p, d: gp.fit(p, d, training_iter=20)))
t20 = timeit("fit 20 iters (vmapped)", fit20, paramss, datas, reps=3)
print(f"per-Adam-iter marginal: {(t20-t5)/15*1e3:.2f} ms", flush=True)
