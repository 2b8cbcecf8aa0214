"""Mesh-sharded Monte-Carlo rollouts.

The reference has no parallelism of any kind (SURVEY.md section 2.11); the
TPU-native scaling story for this workload is horizon x batch: each chip
runs whole episodes (the per-episode scan is inherently sequential), and
the Monte-Carlo batch axis shards across the mesh (`dp`).  Aggregate
safety statistics reduce on-device; with `jax.sharding.NamedSharding`
annotations XLA inserts the psum-style collectives over ICI itself —
no NCCL/MPI shim (SURVEY.md section 5.8).

Tensor-parallel note: GP Gram/Cholesky sizes here are k <= 512, far below
the threshold where sharding the factorization would beat replication, so
`tp` is intentionally a no-op axis for the control loop; it becomes real
for the batched speed-test path where the test-grid axis shards.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sim.rollout import UnicycleSim, _simulate_unicycle_batch


def make_mesh(n_devices: Optional[int] = None,
              axis_names=("dp",)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs[:n]).reshape(shape), axis_names)


def batched_rollouts(sim: UnicycleSim, x0s, keys, mesh: Optional[Mesh] = None):
    """Run a batch of episodes, sharded over the mesh's `dp` axis.

    x0s: (B, n) initial states; keys: (B,) PRNG keys.  B must be divisible
    by the dp axis size.  Returns RolloutOutputs with a leading batch dim.
    Uses the scan-of-vmap runner so the scheduled GP refits stay behind a
    scalar cond (see _simulate_unicycle_batch)."""
    if mesh is None:
        mesh = make_mesh()
    x0s = jnp.asarray(x0s)
    dp = mesh.shape["dp"]
    if x0s.shape[0] % dp != 0:
        raise ValueError(
            "batched_rollouts: batch size B=%d is not divisible by the "
            "dp mesh axis (%d devices); pad the batch to a multiple of "
            "%d or pass a smaller mesh (make_mesh(n_devices=...))"
            % (x0s.shape[0], dp, dp))
    batch_sharding = NamedSharding(mesh, P("dp"))
    x0s = jax.device_put(x0s, batch_sharding)
    keys = jax.device_put(jnp.asarray(keys), batch_sharding)

    fn = jax.jit(lambda a, k: _simulate_unicycle_batch(sim, a, k),
                 in_shardings=(batch_sharding, batch_sharding))
    return fn(x0s, keys)


def sharded_predict_fullmat(gp, params, data, cache, Xtest,
                            mesh: Optional[Mesh] = None,
                            axis="tp"):
    """Tensor-parallel batched posterior: shard the test-point axis of
    `predict_fullmat` over the mesh.

    This is the second (non-batch) parallel axis of the workload: the
    full posterior covariance is Bk(X*, X*') kron A with Bk quadratic in
    the number of test points, so sharding X* row-blocks distributes both
    the O(k^2 b (1+m)) solves and the O(b^2 (1+m)^2) cross-covariance;
    XLA inserts the all-gather of the kb* blocks over ICI itself.  `axis`
    may be a tuple of mesh axes (e.g. ("dp", "tp")) to shard over the
    whole mesh.  b must be divisible by the sharded axis size."""
    if mesh is None:
        mesh = make_mesh(axis_names=("tp",))
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    Xtest = jax.device_put(jnp.asarray(Xtest), shard)
    put_rep = lambda t: jax.tree.map(lambda a: jax.device_put(a, rep), t)
    params = put_rep(params)
    data = put_rep(data)
    cache = put_rep(cache)
    fn = jax.jit(lambda p, d, c, xt: gp.predict_fullmat(p, d, c, xt))
    return fn(params, data, cache, Xtest)


def trainaxis_sharded_predict_fullmat(gp, params, data, cache, Xtest,
                                      mesh: Optional[Mesh] = None,
                                      axis: str = "tp"):
    """Tensor-parallel batched posterior with the TRAIN-POINT (k) axis
    sharded — the SURVEY 5.8 "shard the train-point axis of the
    Cholesky when k grows" capability, made concrete.

    The posterior consumes the factorization only through Linv (the
    explicit triangular inverse in MVGPCache), and every k-contraction
    decomposes over Linv ROW BLOCKS:

        z* = Linv kb*_flat,  zY = Linv Y
        Bk   = prior - sum_r z*_r^T z*_r     (one psum over row blocks)
        mean = M^T  + sum_r z*_r^T zY_r      (same psum pattern)

    so each device holds a (k/d, k) row block of Linv and contributes a
    rank-(k/d) partial outer product; the only communication is two
    psums over the mesh axis (ICI).  The replicated operands (kb*, Y)
    are O(k (1+m)) — negligible next to the O(k^2) factor.  Exact same
    math as `gp.predict_fullmat` (parity oracle in
    tests/test_parallel.py; reference semantics
    bayes_cbf/control_affine_model.py:963-1091)."""
    if mesh is None:
        mesh = make_mesh(axis_names=(axis,))
    d = mesh.shape[axis]
    K = cache.Linv.shape[0]
    if K % d != 0:
        raise ValueError(
            "trainaxis_sharded_predict_fullmat: train capacity K=%d is "
            "not divisible by the %r mesh axis (%d devices); pick a "
            "max_train that is a multiple of the axis size" % (K, axis, d))
    b = Xtest.shape[0]
    mh = 1 + gp.u_dim
    dtype = Xtest.dtype

    # replicated small operands (computed once, O(k (1+m)) each)
    kb = gp._kb_star(params, data, Xtest)               # (b, K, 1+m)
    kb_flat = kb.transpose(1, 0, 2).reshape(K, b * mh)  # (K, b(1+m))
    Y = gp.residual_Y(params, data)                     # (K, n)
    Kss = gp.k_xx(params, Xtest, Xtest)                 # (b, b)
    prior = (Kss[:, :, None, None] * params.B[None, None]
             ).transpose(0, 2, 1, 3).reshape(b * mh, b * mh)

    P_row = P(axis, None)
    P_rep = P()

    def block(Linv_r, kbf, Yf):
        z = Linv_r @ kbf                                # (K/d, b(1+m))
        zY = Linv_r @ Yf                                # (K/d, n)
        cross = jax.lax.psum(z.T @ z, axis)             # (b(1+m), b(1+m))
        madj = jax.lax.psum(z.T @ zY, axis)             # (b(1+m), n)
        return cross, madj

    Linv_sh = jax.device_put(cache.Linv, NamedSharding(mesh, P_row))
    cross, madj = jax.jit(jax.shard_map(
        block, mesh=mesh, in_specs=(P_row, P_rep, P_rep),
        out_specs=(P_rep, P_rep)))(Linv_sh, kb_flat, Y)

    BkXX = prior - cross
    BkXX = 0.5 * (BkXX + BkXX.T)
    from ..utils.linalg import kron
    var = kron(BkXX.astype(dtype), params.A.astype(dtype))
    meanFT = (jnp.broadcast_to(params.mean_M.T[None], (b, gp.x_dim, mh))
              + madj.reshape(b, mh, -1).transpose(0, 2, 1))
    mean = meanFT.transpose(0, 2, 1).reshape(-1)
    return mean, var


def rollout_safety_stats(outs, cbf_centers, cbf_radii, x_goal):
    """On-device aggregate metrics over a (possibly sharded) batch of
    rollouts: collision fraction, mean final goal distance, min clearance.
    Reductions over the sharded batch axis compile to ICI collectives."""
    X = outs.X                                   # (B, T, n)
    pos = X[..., :2]
    d = jnp.linalg.norm(pos[:, :, None, :] - cbf_centers[None, None], axis=-1)
    clearance = d - cbf_radii[None, None, :]
    min_clear = clearance.min(axis=(1, 2))       # (B,)
    collided = (min_clear < 0.0)
    goal_dist = jnp.linalg.norm(X[:, -1, :2] - x_goal[None, :2], axis=-1)
    stats = {
        "collision_fraction": jnp.mean(collided.astype(X.dtype)),
        "mean_goal_distance": jnp.mean(goal_dist),
        "min_clearance": jnp.min(min_clear),
    }
    feas = getattr(getattr(outs, "info", None), "feasible", None)
    if feas is not None:
        stats["feasible_fraction"] = jnp.mean(feas.astype(X.dtype))
    return stats
