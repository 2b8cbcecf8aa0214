"""Mesh-sharded batched rollouts over the 8 virtual CPU devices."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.experiments.unicycle import (
    make_ackermann_tracking_sim, STATE_START, STATE_GOAL)
from bayesian_cbf_tpu.parallel import (make_mesh, batched_rollouts,
                                       rollout_safety_stats)


def test_sharded_batch_rollouts():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    sim = make_ackermann_tracking_sim(numSteps=12, dt=0.01, max_train=8,
                                      training_iter=3,
                                      train_every_n_steps=6, socp_iters=12)
    B = 16
    x0 = jnp.asarray(STATE_START)
    x0s = x0[None] + 0.02 * jax.random.normal(jax.random.PRNGKey(0), (B, 3))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    outs = batched_rollouts(sim, x0s, keys, mesh)
    assert outs.X.shape == (B, 12, 3)
    assert bool(jnp.all(jnp.isfinite(outs.X)))
    # the batch axis is actually sharded over the mesh
    shard_devs = {s.device for s in outs.X.addressable_shards}
    assert len(shard_devs) == 8

    centers = jnp.stack([c.center for c in sim.cbfs])
    radii = jnp.stack([jnp.asarray(c.radius) for c in sim.cbfs])
    stats = rollout_safety_stats(outs, centers, radii,
                                 jnp.asarray(STATE_GOAL))
    # cross-shard reductions produce finite scalars
    for v in stats.values():
        assert np.isfinite(float(v))
    assert float(stats["collision_fraction"]) == 0.0
