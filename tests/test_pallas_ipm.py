"""Lane-major whole-IPM Pallas kernel (ops/pallas_ipm.py), interpret
mode on CPU: KKT-score parity with the plain jnp path, analytic optima,
and the solve_socp dispatch wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.ops.pallas_ipm import batched_ipm
from bayesian_cbf_tpu.solvers import socp as socp_mod
from bayesian_cbf_tpu.solvers.socp import (_pad_cones, _score_padded,
                                           _solve_padded_plain, solve_socp)


def _random_batch(seed, B=5, nx=4, dims=(4, 4, 4, 1)):
    rng = np.random.default_rng(seed)
    C, d = len(dims), max(dims)
    e = jnp.zeros((C, d), jnp.float32).at[:, 0].set(1.0)
    cs, Gs, hs = [], [], []
    for _ in range(B):
        c = jnp.asarray(rng.normal(size=nx), jnp.float32)
        blocks, hrows = [], []
        for dd in dims:
            A = (rng.normal(size=(dd - 1, nx)) * 0.5 if dd > 1
                 else np.zeros((0, nx)))
            cv = rng.normal(size=nx) * 0.2
            bvec = rng.normal(size=dd - 1) * 0.1
            blocks.append(np.concatenate([-cv[None, :], -A], 0))
            hrows.append(np.concatenate([[1.5 + rng.uniform()], bvec]))
        G = jnp.asarray(np.concatenate(blocks, 0), jnp.float32)
        h = jnp.asarray(np.concatenate(hrows), jnp.float32)
        Gp, hp = _pad_cones(c, G, h, dims)
        cs.append(c)
        Gs.append(Gp)
        hs.append(hp)
    cB, GB, hB = jnp.stack(cs), jnp.stack(Gs), jnp.stack(hs)
    sx = jnp.zeros((B, nx), jnp.float32)
    sSZ = jnp.broadcast_to(e, (B, C, d))
    return cB, GB, hB, sx, sSZ


def test_kernel_matches_plain_scores():
    """The kernel converges to KKT scores comparable to the plain path
    on random feasible mixed-cone batches (f32 trajectories legitimately
    diverge near the optimum; the score is the correctness oracle)."""
    cB, GB, hB, sx, sSZ = _random_batch(0)
    ref = jax.vmap(lambda *a: _solve_padded_plain(*a, 20, 1e-10))(
        cB, GB, hB, sx, sSZ, sSZ)
    got = batched_ipm(cB, GB, hB, sx, sSZ, sSZ, iters=20, tol=1e-10,
                      interpret=True)
    for b in range(cB.shape[0]):
        sr = float(_score_padded(cB[b], GB[b], hB[b],
                                 ref[0][b], ref[1][b], ref[2][b]))
        sg = float(_score_padded(cB[b], GB[b], hB[b],
                                 got[0][b], got[1][b], got[2][b]))
        assert sg < max(3.0 * sr, 1e-3), (b, sr, sg)
        # near-identical optimal values
        np.testing.assert_allclose(float(cB[b] @ got[0][b]),
                                   float(cB[b] @ ref[0][b]),
                                   rtol=5e-3, atol=5e-3)


def test_kernel_unit_ball_analytic():
    """min c^T x s.t. ||x|| <= 1 -> x* = -c/|c|, batched."""
    cs = jnp.asarray([[3.0, -4.0], [1.0, 0.0], [1.0, 1.0]], jnp.float32)
    G = jnp.asarray([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]], jnp.float32)
    h = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    B = cs.shape[0]
    Gp, hp = _pad_cones(cs[0], G, h, (3,))
    GB = jnp.broadcast_to(Gp, (B,) + Gp.shape)
    hB = jnp.broadcast_to(hp, (B,) + hp.shape)
    e = jnp.zeros((1, 3), jnp.float32).at[:, 0].set(1.0)
    sx = jnp.zeros((B, 2), jnp.float32)
    sSZ = jnp.broadcast_to(e, (B, 1, 3))
    x, S, Z = batched_ipm(cs, GB, hB, sx, sSZ, sSZ, iters=25, tol=1e-10,
                          interpret=True)
    expected = -np.asarray(cs) / np.linalg.norm(np.asarray(cs), axis=1,
                                                keepdims=True)
    np.testing.assert_allclose(np.asarray(x), expected, atol=2e-4)


def test_dispatch_uses_kernel_under_vmap():
    """solve_socp under vmap routes through the kernel when forced, and
    the solutions remain feasible/optimal (controller-shaped cones)."""
    socp_mod.USE_PALLAS_IPM = True
    import bayesian_cbf_tpu.ops.pallas_ipm as pk
    pk.INTERPRET = True
    try:
        cs = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], jnp.float32)
        G = jnp.asarray([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]], jnp.float32)
        h = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        xs = jax.vmap(lambda c: solve_socp(c, G, h, dims=(3,),
                                           iters=25).x)(cs)
        expected = -np.asarray(cs) / np.linalg.norm(np.asarray(cs), axis=1,
                                                    keepdims=True)
        np.testing.assert_allclose(np.asarray(xs), expected, atol=2e-4)
    finally:
        socp_mod.USE_PALLAS_IPM = None
        pk.INTERPRET = False
        socp_mod._socp_dispatch.cache_clear()


def test_kernel_batch_padding():
    """B not a multiple of the lane chunk: edge-replicated padding must
    not perturb the real problems."""
    cB, GB, hB, sx, sSZ = _random_batch(1, B=3)
    got3 = batched_ipm(cB, GB, hB, sx, sSZ, sSZ, iters=15, tol=1e-10,
                       interpret=True)
    got1 = batched_ipm(cB[:1], GB[:1], hB[:1], sx[:1], sSZ[:1], sSZ[:1],
                       iters=15, tol=1e-10, interpret=True)
    np.testing.assert_allclose(np.asarray(got3[0][0]),
                               np.asarray(got1[0][0]), atol=1e-5)


def test_kernel_warm_start_path():
    """Warm-started (interior-shifted, near-optimal) start points through
    the kernel: must converge at reduced iterations to the cold-start
    answer — the rollout scan's steady-state regime."""
    cB, GB, hB, sx, sSZ = _random_batch(2)
    cold = batched_ipm(cB, GB, hB, sx, sSZ, sSZ, iters=25, tol=1e-10,
                       interpret=True)
    from bayesian_cbf_tpu.solvers.socp import _interior_shift
    wS = jax.vmap(_interior_shift)(cold[1])
    wZ = jax.vmap(_interior_shift)(cold[2])
    warm = batched_ipm(cB, GB, hB, cold[0], wS, wZ, iters=10, tol=1e-10,
                       interpret=True)
    for b in range(cB.shape[0]):
        sw = float(_score_padded(cB[b], GB[b], hB[b],
                                 warm[0][b], warm[1][b], warm[2][b]))
        assert sw < 1e-3, (b, sw)
        np.testing.assert_allclose(float(cB[b] @ warm[0][b]),
                                   float(cB[b] @ cold[0][b]),
                                   rtol=5e-3, atol=5e-3)


def test_kernel_larger_cone_structure():
    """C=8 cones of dim 8 with nx=6 — beyond the flagship's (4, 4, 4):
    the static unrolling must generalize across the guard envelope
    (nx <= 8, C, d <= 16)."""
    cB, GB, hB, sx, sSZ = _random_batch(4, B=4, nx=6,
                                        dims=(8, 8, 8, 8, 1, 1, 8, 8))
    ref = jax.vmap(lambda *a: _solve_padded_plain(*a, 20, 1e-10))(
        cB, GB, hB, sx, sSZ, sSZ)
    got = batched_ipm(cB, GB, hB, sx, sSZ, sSZ, iters=20, tol=1e-10,
                      interpret=True)
    for b in range(cB.shape[0]):
        sr = float(_score_padded(cB[b], GB[b], hB[b],
                                 ref[0][b], ref[1][b], ref[2][b]))
        sg = float(_score_padded(cB[b], GB[b], hB[b],
                                 got[0][b], got[1][b], got[2][b]))
        assert sg < max(3.0 * sr, 1e-3), (b, sr, sg)
