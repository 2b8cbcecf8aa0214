"""SOCP solver tests: analytic solutions, KKT optimality on random
feasible problems, scipy cross-check, and vmap batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from bayesian_cbf_tpu.solvers import solve_socp, solve_qp_active_set
from bayesian_cbf_tpu.solvers.socp import cones_from_constraints


def test_unit_ball_analytic():
    """min c^T x s.t. ||x|| <= 1  ->  x* = -c/||c||."""
    c = jnp.array([3.0, -4.0])
    # cone: s0 = 1, s1 = x  ->  G = [[0,0],[-1,0],[0,-1]], h = [1,0,0]
    G = jnp.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])
    h = jnp.array([1.0, 0.0, 0.0])
    sol = solve_socp(c, G, h, dims=(3,))
    np.testing.assert_allclose(np.asarray(sol.x), [-0.6, 0.8], atol=1e-6)
    assert float(sol.pres) < 1e-7 and float(sol.dres) < 1e-7


def test_orthant_lp():
    """min x+y s.t. x >= 1, y >= 2 (two 1-dim cones)."""
    c = jnp.array([1.0, 1.0])
    G = jnp.array([[-1.0, 0.0], [0.0, -1.0]])
    h = jnp.array([-1.0, -2.0])
    sol = solve_socp(c, G, h, dims=(1, 1))
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 2.0], atol=1e-6)


def test_mixed_cones_vs_scipy():
    """Random feasible SOCPs cross-checked against scipy SLSQP."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        nx = 3
        c = rng.normal(size=nx)
        constraints = []
        for _ in range(2):
            A = rng.normal(size=(2, nx))
            b = rng.normal(size=2) * 0.1
            cv = rng.normal(size=nx) * 0.1
            d = 2.0 + rng.uniform()   # strictly feasible at x=0
            constraints.append((jnp.array(A), jnp.array(b),
                                jnp.array(cv), jnp.array(d)))
        # box |x_i| <= 5 as 1-dim cones to keep it bounded
        for i in range(nx):
            ei = np.zeros(nx); ei[i] = 1.0
            constraints.append((jnp.zeros((1, nx)), jnp.zeros((1,)),
                                jnp.array(-ei), jnp.array(5.0)))
            constraints.append((jnp.zeros((1, nx)), jnp.zeros((1,)),
                                jnp.array(ei), jnp.array(5.0)))
        G, h, dims = cones_from_constraints(constraints)
        sol = solve_socp(jnp.array(c), G, h, dims)

        def neg_margin(x):
            out = []
            for (A, b, cv, d) in constraints:
                out.append(float(np.asarray(cv) @ x + np.asarray(d))
                           - np.linalg.norm(np.asarray(A) @ x + np.asarray(b)))
            return np.array(out)

        res = minimize(lambda x: c @ x, np.zeros(nx), method="SLSQP",
                       constraints=[{"type": "ineq", "fun": neg_margin}])
        assert res.success
        # same optimal value
        np.testing.assert_allclose(float(sol.pcost), float(res.fun),
                                   rtol=1e-4, atol=1e-5)
        # our solution is feasible
        assert neg_margin(np.asarray(sol.x)).min() > -1e-6


def test_qp_epigraph():
    """min ||Au+b||^2 s.t. u >= lo elementwise — vs scipy."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(3, 2))
    b = rng.normal(size=3)
    lin_cs = jnp.eye(2)
    lin_ds = jnp.array([0.5, 0.5])    # u_i >= -0.5
    u, sol = solve_qp_active_set(jnp.array(A), jnp.array(b), lin_cs, lin_ds)
    res = minimize(lambda u: np.sum((A @ u + b) ** 2), np.zeros(2),
                   method="SLSQP",
                   constraints=[{"type": "ineq",
                                 "fun": lambda u: u + 0.5}])
    np.testing.assert_allclose(np.asarray(u), res.x, atol=1e-4)


def test_vmap_batch():
    """The solver vmaps: a batch of unit-ball LPs in one call."""
    cs = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    G = jnp.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])
    h = jnp.array([1.0, 0.0, 0.0])
    solve = jax.vmap(lambda c: solve_socp(c, G, h, dims=(3,)).x)
    xs = solve(cs)
    expected = -cs / jnp.linalg.norm(cs, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(expected),
                               atol=1e-6)


def test_controller_shaped_socp():
    """The exact cone structure the Bayes-CBF controller emits:
    epigraph objective + CLC cone + 2 CBC cones, 4 variables."""
    rng = np.random.default_rng(2)
    nx = 4  # [v, omega, relax, t]
    c = jnp.array([0.0, 0.0, 0.0, 1.0])
    constraints = []
    # objective cone ||W(z - ref)|| <= t over z = [v, omega, relax]
    W = np.diag([0.57, 0.57, 0.57])
    Aobj = np.concatenate([-W, np.zeros((3, 1))], axis=1)
    cobj = np.array([0.0, 0.0, 0.0, 1.0])
    constraints.append((jnp.array(Aobj), jnp.zeros(3), jnp.array(cobj),
                        jnp.array(0.0)))
    # CLC/CBC-like cones: rho||A u + b|| <= c^T u + d + (relax for CLC)
    for i in range(3):
        A = np.zeros((3, 4)); A[:, :2] = rng.normal(size=(3, 2)) * 0.3
        b = rng.normal(size=3) * 0.05
        cv = np.zeros(4); cv[:2] = rng.normal(size=2)
        if i == 0:
            cv[2] = 1.0  # relax enters the CLC linearly
        d = 1.5 + rng.uniform()
        constraints.append((jnp.array(A), jnp.array(b), jnp.array(cv),
                            jnp.array(d)))
    G, h, dims = cones_from_constraints(constraints)
    sol = solve_socp(c, G, h, dims)
    assert float(sol.pres) < 1e-6 and float(sol.dres) < 1e-6

    def neg_margin(x):
        return np.array([
            float(np.asarray(cv) @ x + np.asarray(d))
            - np.linalg.norm(np.asarray(A) @ x + np.asarray(b))
            for (A, b, cv, d) in constraints])

    res = minimize(lambda x: np.asarray(c) @ x, np.zeros(nx), method="SLSQP",
                   constraints=[{"type": "ineq", "fun": neg_margin}])
    assert res.success
    np.testing.assert_allclose(float(sol.pcost), float(res.fun),
                               rtol=1e-4, atol=1e-5)


def test_unrolled_kkt_matches_lapack():
    """The statically-unrolled small-system Cholesky path (nx <= 8) must
    reproduce the cho_factor fallback to solver precision on the same
    problem (solvers/socp.py `_chol_unrolled`)."""
    from bayesian_cbf_tpu.solvers import socp as socp_mod
    rng = np.random.default_rng(3)
    nx = 5
    c = jnp.array(rng.normal(size=nx))
    constraints = []
    for _ in range(3):
        A = rng.normal(size=(3, nx))
        b = rng.normal(size=3) * 0.1
        cv = rng.normal(size=nx) * 0.1
        d = 2.0 + rng.uniform()
        constraints.append((jnp.array(A), jnp.array(b),
                            jnp.array(cv), jnp.array(d)))
    for i in range(nx):
        ei = np.zeros(nx); ei[i] = 1.0
        constraints.append((jnp.zeros((1, nx)), jnp.zeros((1,)),
                            jnp.array(-ei), jnp.array(5.0)))
        constraints.append((jnp.zeros((1, nx)), jnp.zeros((1,)),
                            jnp.array(ei), jnp.array(5.0)))
    G, h, dims = cones_from_constraints(constraints)

    raw = solve_socp.__wrapped__          # un-jitted body, re-traces per call
    sol_unrolled = raw(c, G, h, dims)
    saved = socp_mod._UNROLL_MAX_N
    try:
        socp_mod._UNROLL_MAX_N = 0        # force the LAPACK path
        sol_lapack = raw(c, G, h, dims)
    finally:
        socp_mod._UNROLL_MAX_N = saved
    np.testing.assert_allclose(np.asarray(sol_unrolled.x),
                               np.asarray(sol_lapack.x), atol=1e-8)
    np.testing.assert_allclose(float(sol_unrolled.pcost),
                               float(sol_lapack.pcost), atol=1e-8)
    assert float(sol_unrolled.pres) < 1e-8


def test_solver_einsums_pinned_to_full_precision():
    """Round-3 directive 2: every contraction in the IPM must request
    HIGHEST matmul precision — on TPU the default lowers the tiny cone
    contractions to bf16 MXU passes, which was the entire source of the
    f32 plain-path KKT plateau (1e-2..1 vs the kernel's 1e-4; measured
    on-chip, records/tpu_round3.jsonl:ipm_plain_vs_kernel_kkt)."""
    from bayesian_cbf_tpu.solvers.socp import _solve_padded_plain
    C, d, nx = 4, 6, 4
    c = jnp.zeros((nx,), jnp.float32)
    Gp = jnp.zeros((C, d, nx), jnp.float32)
    hp = jnp.ones((C, d), jnp.float32)
    e = jnp.zeros((C, d), jnp.float32).at[:, 0].set(1.0)
    jaxpr = jax.make_jaxpr(
        lambda *a: _solve_padded_plain(*a, 3, 1e-10))(
            c, Gp, hp, jnp.zeros(nx, jnp.float32), e, e)
    s = str(jaxpr)
    assert "HIGHEST" in s
    # no dot_general left at default precision anywhere in the solve
    import re
    defaults = re.findall(r"dot_general\[[^\]]*precision=None", s)
    assert not defaults, defaults[:3]


def test_cvxopt_documentation_example():
    """Independent-oracle anchor: the SOCP worked example from the cvxopt
    user guide (coneprog.html, "Second-Order Cone Programming"), whose
    optimal primal AND dual values are published in the guide itself (and
    which the reference uses as its own solver fixture,
    bayes_cbf/tests/test_optimizers.py:6-119).  The cone data below is
    cvxopt's (c, Gq, hq) with s = h - Gx in Q; asserting both x* and the
    per-cone duals z* against the published values checks our IPM against
    a mature conic solver without importing one."""
    c = jnp.array([-2.0, 1.0, 5.0])
    # cvxopt matrices are column-major: G[0] columns (12,13,12),
    # (6,-3,-12), (-5,-5,6); G[1] columns (3,3,-1,1), (-6,-6,-9,19),
    # (10,-2,-2,-3)
    G0 = np.array([[12.0, 6.0, -5.0],
                   [13.0, -3.0, -5.0],
                   [12.0, -12.0, 6.0]])
    h0 = np.array([-12.0, -3.0, -2.0])
    G1 = np.array([[3.0, -6.0, 10.0],
                   [3.0, -6.0, -2.0],
                   [-1.0, -9.0, -2.0],
                   [1.0, 19.0, -3.0]])
    h1 = np.array([27.0, 0.0, 3.0, -42.0])
    G = jnp.asarray(np.concatenate([G0, G1], 0))
    h = jnp.asarray(np.concatenate([h0, h1]))
    sol = solve_socp(c, G, h, dims=(3, 4), iters=40)
    assert float(sol.pres) < 1e-6 and float(sol.dres) < 1e-6
    # published primal (3 significant digits in the guide)
    np.testing.assert_allclose(np.asarray(sol.x),
                               [-5.0147, -5.7664, -8.5217], atol=2e-3)
    # published duals zq (cone-padded layout: z is (C, dmax))
    z = np.asarray(sol.z)
    np.testing.assert_allclose(z[0, :3], [1.34, -0.0763, -1.34], atol=5e-3)
    np.testing.assert_allclose(z[1, :4], [1.02, 0.402, 0.780, -0.517],
                               atol=5e-3)


def test_controller_cones_match_stored_oracle():
    """Stored independent oracle on the CONTROLLER'S exact cone
    structures (12 problems captured from a real learning episode:
    objective epigraph + CLC + 2 CBC chance cones, 4 vars, 4x4-dim
    cones).  x_expected was computed OFFLINE by scipy SLSQP f64 — an
    independent algorithm family — via scripts/make_socp_oracle.py.
    Besides matching the stored optimum, an optimality certificate is
    verified in plain numpy on the raw cone data: primal feasibility,
    dual cone membership, stationarity, and complementarity.  Plays the
    role of the reference's GUROBI/cvxopt ground truth
    (bayes_cbf/optimizers.py:91-102, tests/test_optimizers.py:6-119)."""
    import os
    data = np.load(os.path.join(os.path.dirname(__file__), "data",
                                "socp_oracle.npz"))
    dims = tuple(int(d) for d in data["dims"])
    for i in range(data["c"].shape[0]):
        c = jnp.asarray(data["c"][i])
        G = jnp.asarray(data["G"][i])
        h = jnp.asarray(data["h"][i])
        sol = solve_socp(c, G, h, dims, iters=40)
        x = np.asarray(sol.x, np.float64)
        xe = data["x_expected"][i]
        scale = max(1.0, float(np.max(np.abs(xe))))
        assert np.max(np.abs(x - xe)) < 2e-4 * scale, (i, x, xe)
        assert abs(float(sol.pcost) - data["cost_expected"][i]) \
            < 2e-4 * scale

        # independent numpy optimality certificate
        cn, Gn, hn = (np.asarray(a, np.float64) for a in (c, G, h))
        z = np.asarray(sol.z, np.float64)
        s = np.asarray(sol.s, np.float64)
        o = 0
        stat = cn.copy()
        for j, d in enumerate(dims):
            Gj, hj = Gn[o:o + d], hn[o:o + d]
            sj = hj - Gj @ x
            # primal feasibility and slack consistency
            assert sj[0] >= -1e-6 * scale
            assert sj[0] + 1e-6 * scale >= np.linalg.norm(sj[1:])
            zj = z[j, :d]
            # dual cone membership (inactive cones carry ~1e-8 dual
            # noise, so the tolerance is absolute at solver precision)
            assert zj[0] >= np.linalg.norm(zj[1:]) - 1e-6
            # complementarity
            assert abs(sj @ zj) < 1e-4 * scale
            stat = stat + Gj.T @ zj
            o += d
        # stationarity: c + sum G_j^T z_j = 0
        assert np.max(np.abs(stat)) < 1e-4 * max(1.0, np.max(np.abs(cn)))
