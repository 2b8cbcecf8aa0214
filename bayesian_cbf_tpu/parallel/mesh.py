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
    return {
        "collision_fraction": jnp.mean(collided.astype(X.dtype)),
        "mean_goal_distance": jnp.mean(goal_dist),
        "min_clearance": jnp.min(min_clear),
    }
