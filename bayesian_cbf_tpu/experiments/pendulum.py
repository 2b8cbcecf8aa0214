"""L9 — pendulum experiments.

Parity targets (bayes_cbf/pendulum.py):
  * run_pendulum_control_online_learning (:1041-1048): 250 steps, tau=2e-3,
    theta0=7pi/12, epsilon-greedy LQR reference + learned rel-deg-2 CBC
    SOCP, online MVGP refits every 10 steps (ControlPendulumCBFLearned).
  * learn_dynamics / learn_dynamics_matrix_vector (:1091-1303): fit MVGP vs
    CoGP on trajectory data, variance-weighted errors over a test grid.
  * speed_test_matrix_vector (:1305-1395): the paper's headline timing of
    custom_predict_fullmat over a 441-point grid for
    matrix / vector / matrixdiag / vectordiag at k in {256,320,384,512}.
"""
from __future__ import annotations

import math
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..control.learned_socp_controller import (LearnedSOCPControllerConfig,
                                               learned_socp_control)
from ..control.pendulum_safety import RadialCBFRelDegree2
from ..control.secondary import EpsilonGreedyController, LQRController
from ..models.cogp import make_cogp, make_cogp_diag
from ..models.dynamics import (LearnedShiftInvariantDynamics, PendulumDynamics,
                               ZeroDynamics)
from ..models.mvgp import make_mvgp, make_mvgp_diag


# ---------------------------------------------------------------------------
# online-learning control experiment
# ---------------------------------------------------------------------------

class PendulumOnlineSim(NamedTuple):
    """ControlPendulumCBFLearned wiring (pendulum.py:909-962):
    mean dynamics = zero, learned MVGP residual of full dynamics,
    LQR reference control with epsilon-greedy exploration, CBC2 SOCP."""
    true_dynamics: PendulumDynamics
    learned: LearnedShiftInvariantDynamics
    controller: LearnedSOCPControllerConfig
    cbf: RadialCBFRelDegree2
    lqr: LQRController
    egreedy: EpsilonGreedyController
    dt: float
    numSteps: int

    def _step_impl(self, carry, t, learn_fn):
        x, dyn_state, key = carry
        key, ke = jax.random.split(key)
        # epsilon-greedy LQR reference control on the learned mean dynamics
        u_lqr = self.lqr.control_with_model(
            lambda xx: self.learned.f_func(dyn_state, xx),
            lambda xx: self.learned.g_func(dyn_state, xx), x, t)
        u_ref = self.egreedy.perturb(u_lqr, t, ke)
        # infeasible steps fall back to the CLEAN LQR reference, never the
        # exploration-perturbed control (round-4 verdict: an uncertified
        # step must not execute exploration noise; the reference restores
        # the unperturbed u_ref, controllers.py:577-583)
        u, info = self._control(dyn_state, u_ref, x, u_fallback=u_lqr)
        dyn_state = learn_fn(dyn_state, x, u)
        x_next, xdot = self.true_dynamics.step(x, u, self.dt)
        return (x_next, dyn_state, key), (x, u, xdot, info)

    def step(self, carry, t):
        """Self-contained step (in-graph refit cond)."""
        return self._step_impl(carry, t, self.learned.observe)

    def step_no_fit(self, carry, t):
        """Buffer-recording step; refits run between segment scans on the
        static schedule (sim.rollout.fit_segments)."""
        return self._step_impl(carry, t, self.learned.record)

    def _control(self, dyn_state, u_ref, x, u_fallback=None):
        """Build the (f, fu) pair per u so cross-covariances stay linked."""
        cache = {}

        def fu_gp_fn(u):
            pair = self.learned.f_gp_and_fu_gp(dyn_state, u)
            cache["pair"] = pair
            return pair[1]

        def f_gp_fn():
            return cache["pair"][0]

        mdf = ((lambda xx: self.learned.moment_derivatives(dyn_state, xx))
               if self.controller.closed_form else None)
        return learned_socp_control(
            self.controller, self.cbf.cbf, self.cbf.grad_cbf,
            f_gp_fn, fu_gp_fn, u_ref, x, moment_deriv_fn=mdf,
            u_fallback=u_fallback)


def make_pendulum_online_sim(
        numSteps=250, dt=2e-3, max_train=40, training_iter=25,
        train_every_n_steps=10, max_unsafe_prob=0.01,
        k_alpha=(1.0, 3.0), ctrl_range=(-15.0, 15.0),
        egreedy_scheme=(1.0, 0.01), socp_iters=25,
        training_iter_warm=0, continuous_updates=False,
        first_fit_coarse_stride=0, first_fit_refine_iter=15):
    """run_pendulum_control_online_learning configuration
    (pendulum.py:1041-1048; max_train reduced from 200 for CI speed —
    pass max_train=200 for the full config).

    continuous_updates=True enables the per-step O(K^2) rank-1 posterior
    append (batched prefix-only variant) so every sample enters the
    posterior immediately — a capability the reference lacks (it only
    incorporates data at full refits); pair it with a sparser
    train_every_n_steps for the fast gated configuration."""
    pend = PendulumDynamics()
    learned = LearnedShiftInvariantDynamics(
        gp=make_mvgp(2, 1, gamma_prior=(math.pi / 100, math.pi / 100)),
        mean_dynamics=ZeroDynamics(state_size=2, ctrl_size=1),
        max_train=max_train, training_iter=training_iter,
        shift_invariant=False, train_every_n_steps=train_every_n_steps,
        enable_learning=True, dt=dt,
        training_iter_warm=training_iter_warm,
        continuous_updates=continuous_updates,
        continuous_full_refresh=not continuous_updates,
        first_fit_coarse_stride=first_fit_coarse_stride,
        first_fit_refine_iter=first_fit_refine_iter)
    controller = LearnedSOCPControllerConfig(
        u_dim=1, x_dim=2, ctrl_reg=1.0, clf_relax_weight=100.0,
        max_unsafe_prob=max_unsafe_prob, k_alpha=k_alpha,
        socp_iters=socp_iters)
    lqr = LQRController(Q=jnp.eye(2), R=jnp.eye(1),
                        x_goal=jnp.zeros(2), horizon=20, dt=dt,
                        ctrl_range=ctrl_range)
    egreedy = EpsilonGreedyController(numSteps=numSteps,
                                      egreedy_scheme=egreedy_scheme,
                                      ctrl_range=ctrl_range)
    cbf = RadialCBFRelDegree2(model=pend, k_alpha=k_alpha,
                              max_unsafe_prob=max_unsafe_prob)
    return PendulumOnlineSim(true_dynamics=pend, learned=learned,
                             controller=controller, cbf=cbf, lqr=lqr,
                             egreedy=egreedy, dt=dt, numSteps=numSteps)


# jitted-runner cache keyed on the sim object: re-jitting a fresh closure
# per call recompiles the whole segmented episode program every time (the
# flagship pendulum program costs minutes per compile on this host) —
# same pattern as sim.rollout._SIM_CACHE.  Bounded LRU so a long
# parameter sweep in one process doesn't pin every sim + its compiled
# executables forever.
from collections import OrderedDict

_RUN_CACHE: "OrderedDict" = OrderedDict()
_RUN_CACHE_MAX = 8


def _cached_jit(sim, tag, fn):
    key = (id(sim), tag)
    entry = _RUN_CACHE.get(key)
    if entry is None or entry[0] is not sim:
        _RUN_CACHE[key] = (sim, jax.jit(fn))
        while len(_RUN_CACHE) > _RUN_CACHE_MAX:
            _RUN_CACHE.popitem(last=False)
    else:
        _RUN_CACHE.move_to_end(key)
    return _RUN_CACHE[key][1]


def run_pendulum_online_learning(sim: PendulumOnlineSim,
                                 theta0=7 * math.pi / 12, omega0=0.0,
                                 seed=0):
    from ..sim.rollout import scan_with_scheduled_fits
    x0 = jnp.asarray([theta0, omega0])
    key = jax.random.PRNGKey(seed)
    kd, ks = jax.random.split(key)
    dyn_state = sim.learned.init_state(kd, dtype=x0.dtype)

    def run(x0, dyn_state, ks):
        # one scan with the refit behind a scalar in-body cond: same
        # schedule as the segmented runner (pinned by
        # test_single_runner_matches_segmented_reference) but the fit
        # program compiles ONCE instead of once per segment — the
        # 25-segment flagship program took minutes to compile
        lrn = sim.learned
        _, ys = scan_with_scheduled_fits(
            sim.step_no_fit, lrn.fit_now_first, (x0, dyn_state, ks),
            sim.numSteps, lrn.train_every_n_steps,
            lrn.enable_learning,
            fit_fn_warm=(lrn.fit_now_warm if lrn.first_fit_differs
                         else None))
        return ys

    X, U, Xdot, info = _cached_jit(sim, "online_single", run)(
        x0, dyn_state, ks)
    return X, U, Xdot, info


def run_pendulum_online_batch(sim: PendulumOnlineSim, x0s, seed=0):
    """Batched Monte-Carlo online-learning episodes as scan-of-vmap with
    scheduled refits behind a scalar in-scan cond (new capability vs the
    reference's strictly single-rollout loop, pendulum.py:164-252).
    Scan-of-vmap, never vmap-of-scan: the refit cond predicate is scalar
    (static in t), so the Adam loop runs exactly on the scheduled steps;
    one scan body + at most two fit programs in the compiled module
    (the segmented predecessor compiled one of each PER EVENT — 25 for
    the flagship episode, 482 s of compile; round-4 verdict 7).
    Returns (X, U, Xdot, info) with a leading batch dim."""
    from ..sim.rollout import scan_with_scheduled_fits_batched
    x0s = jnp.asarray(x0s)
    B = x0s.shape[0]
    key = jax.random.PRNGKey(seed)
    kd, ks = jax.random.split(key)
    dyn_states = jax.vmap(
        lambda k: sim.learned.init_state(k, dtype=x0s.dtype))(
            jax.random.split(kd, B))
    ekeys = jax.random.split(ks, B)
    lrn = sim.learned

    def step(carry, t):
        X, states, keys = carry

        def one(x, st, k):
            k, ke = jax.random.split(k)
            u_lqr = sim.lqr.control_with_model(
                lambda xx: lrn.f_func(st, xx),
                lambda xx: lrn.g_func(st, xx), x, t)
            u_ref = sim.egreedy.perturb(u_lqr, t, ke)
            # clean-reference fallback on infeasible steps (see _step_impl)
            u, info = sim._control(st, u_ref, x, u_fallback=u_lqr)
            st = lrn.record(st, x, u)
            x_next, xdot = sim.true_dynamics.step(x, u, sim.dt)
            return x_next, u, xdot, info, st, k

        X_next, U, Xdot, info, states, keys = jax.vmap(one)(X, states, keys)
        return (X_next, states, keys), (X, U, Xdot, info)

    def run(x0s, dyn_states, ekeys):
        carry = (x0s, dyn_states, ekeys)
        _, ys = scan_with_scheduled_fits_batched(
            step, lrn.fit_now_first, carry, sim.numSteps,
            lrn.train_every_n_steps, lrn.enable_learning,
            fit_fn_warm=(lrn.fit_now_warm if lrn.first_fit_differs
                         else None))
        return ys

    X, U, Xdot, info = _cached_jit(sim, "online_batch", run)(
        x0s, dyn_states, ekeys)
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    return (swap(X), swap(U), swap(Xdot), jax.tree.map(swap, info))


# ---------------------------------------------------------------------------
# ground-truth CLF-CBF QP controller (PendulumCBFCLFDirect)
# ---------------------------------------------------------------------------

def ground_truth_cbf_clf_control(x, clf, cbf2, ctrl_range=(-15.0, 15.0),
                                 margin_weight=100.0, socp_iters=25):
    """The reference's control_QP_cbf_clf (pendulum.py:770-864): stack the
    affine constraints A_i(x) u <= b_i(x) from EnergyCLF (slack-relaxed)
    and RadialCBFRelDegree2 (hard), minimize ||u||^2 + w * slack^2.

    Here: variables [u, slack, y]; the objective is the NORM epigraph
    ||[u; sqrt(w) slack]|| <= y, minimize y — same argmin as the
    reference's quadratic (sqrt is monotone) but f32-solvable.  The
    rotated-cone homogenization ||[2u; 2 sqrt(w) s; t-1]|| <= t+1 used
    through round 2 puts the SQUARED cost on the epigraph variable
    (t* ~ 5.6e3 at the episode start, vs problem data of scale ~1-20):
    measured round 3, the f32 IPM — plain AND Pallas — diverges from the
    cold start on that scaling at the very first control step (score
    0.97, returns u=0, pendulum swings into the wedge), while the norm
    form (y* ~ 75) solves to pres ~1e-6."""
    import jax.numpy as jnp
    from ..solvers.socp import solve_socp
    dtype = x.dtype
    m = 1
    nvar = m + 2
    sw = math.sqrt(margin_weight)
    # ||[u; sw*s]|| <= y: cone rows [y; u; sw*s]
    A = jnp.zeros((m + 1, nvar), dtype)
    A = A.at[0, 0].set(1.0).at[1, 1].set(sw)
    cvec = jnp.zeros((nvar,), dtype).at[2].set(1.0)
    Gs = [jnp.concatenate([-cvec[None, :], -A], 0)]
    hs = [jnp.zeros((m + 2,), dtype)]
    dims = [m + 2]

    def lin(coef, const):
        Gs.append(-coef[None, :])
        hs.append(jnp.reshape(const, (1,)))
        dims.append(1)

    # CLF: A_clf u - b_clf <= slack
    coef = jnp.zeros((nvar,), dtype).at[0].set(-clf.A(x)[0]).at[1].set(1.0)
    lin(coef, -(-clf.b(x)))
    # CBF rel-deg-2: A u - b <= 0  ->  -A u + b >= 0
    coef = jnp.zeros((nvar,), dtype).at[0].set(-cbf2.A(x)[0])
    lin(coef, cbf2.b(x))
    # box
    lo, hi = ctrl_range
    e0 = jnp.zeros((nvar,), dtype).at[0].set(1.0)
    lin(e0, jnp.asarray(-lo, dtype))
    lin(-e0, jnp.asarray(hi, dtype))

    cobj = jnp.zeros((nvar,), dtype).at[2].set(1.0)
    sol = solve_socp(cobj, jnp.concatenate(Gs, 0), jnp.concatenate(hs, 0),
                     tuple(dims), iters=socp_iters)
    # feasibility gate (design invariant: callers gate on pres with a
    # dtype-aware tolerance and fall back in-graph; the reference raises
    # InfeasibleProblemError here, optimizers.py:74-86)
    feas_tol = 1e-6 if dtype == jnp.float64 else 5e-3
    ok = (sol.pres < feas_tol) & jnp.all(jnp.isfinite(sol.x))
    u = jnp.where(ok, jnp.clip(sol.x[:m], ctrl_range[0], ctrl_range[1]),
                  jnp.zeros((m,), dtype))
    return u, sol


def run_pendulum_ground_truth(numSteps=400, dt=0.01,
                              theta0=5 * math.pi / 12, omega0=0.0):
    """run_pendulum_control_cbf_clf equivalent (pendulum.py:1019-1026):
    ground-truth model, EnergyCLF + RadialCBFRelDegree2 QP."""
    from ..control.pendulum_safety import EnergyCLF, RadialCBFRelDegree2
    pend = PendulumDynamics()
    clf = EnergyCLF(model=pend)
    cbf2 = RadialCBFRelDegree2(model=pend)

    def step(x, _):
        u, sol = ground_truth_cbf_clf_control(x, clf, cbf2)
        xn, xdot = pend.step(x, u, dt)
        return xn, (x, u, sol.pres)

    x0 = jnp.asarray([theta0, omega0])
    _, (X, U, pres) = jax.lax.scan(step, x0, None, length=numSteps)
    return X, U, pres


def pendulum_damage_fraction(theta_traj):
    """Fraction of steps with 0 < theta < pi/4 — the reference's damage
    indicator EXACTLY (pendulum.py:206-207: `if 0<theta_vec[t]<math.pi/4:
    damage_vec[t]=1`, on theta wrapped to [-pi, pi]).  Note this is NOT
    the radial CBF's unsafe wedge |theta - pi/4| < pi/8; see
    `pendulum_wedge_fraction` for that stricter barrier-violation
    metric."""
    th = jnp.asarray(theta_traj)
    th = jnp.mod(th + math.pi, 2 * math.pi) - math.pi
    return jnp.mean(((th > 0) & (th < math.pi / 4)).astype(jnp.float32))


def pendulum_wedge_fraction(theta_traj, theta_c=math.pi / 4,
                            delta_col=math.pi / 8):
    """Fraction of steps inside the radial CBF's unsafe wedge
    |theta - theta_c| < delta_col (h < 0 for RadialCBFRelDegree2) — a
    stricter safety diagnostic than the reference's damage indicator:
    the probabilistic CBC admits per-step violation mass max_unsafe_prob,
    so small wedge grazing is possible by design while reference-damage
    stays 0."""
    d = jnp.abs(jnp.asarray(theta_traj) - theta_c)
    d = jnp.minimum(d, 2 * math.pi - d)
    return jnp.mean((d < delta_col).astype(jnp.float32))


def sample_iid_pendulum(key, n, x_range=(-math.pi, math.pi),
                        w_range=(-3.0, 3.0), u_range=(-10.0, 10.0)):
    """i.i.d. (x, u) -> xdot samples (sample_generator_independent,
    sampling.py:78-90)."""
    pend = PendulumDynamics()
    k1, k2, k3 = jax.random.split(key, 3)
    th = jax.random.uniform(k1, (n,), minval=x_range[0], maxval=x_range[1])
    w = jax.random.uniform(k2, (n,), minval=w_range[0], maxval=w_range[1])
    U = jax.random.uniform(k3, (n, 1), minval=u_range[0], maxval=u_range[1])
    X = jnp.stack([th, w], -1)
    Xdot = jax.vmap(lambda x, u: pend.f_func(x) + pend.g_func(x) @ u)(X, U)
    return X, U, Xdot


# ---------------------------------------------------------------------------
# learn_dynamics + speed test (the paper's benchmark harness)
# ---------------------------------------------------------------------------

def sample_pendulum_data(numSteps=2000, dt=1e-2, theta0=3 * math.pi / 4,
                         omega0=-0.01, seed=0):
    """ControlRandom rollout: u = m g sin(theta) * uniform(0.6, 1.4)
    (pendulum.py:60-78), collected as (X, U, Xdot) with exact xdot."""
    pend = PendulumDynamics()
    key = jax.random.PRNGKey(seed)

    def step(carry, _):
        x, key = carry
        key, ku = jax.random.split(key)
        u_triv = pend.mass * pend.gravity * jnp.sin(x[0])
        u = u_triv * (jax.random.uniform(ku, ()) * 0.8 + 0.6)
        u = jnp.reshape(u, (1,))
        xdot = pend.f_func(x) + pend.g_func(x) @ u
        x_next, _ = pend.step(x, u, dt)
        return (x_next, key), (x, u, xdot)

    (_, _), (X, U, Xdot) = jax.lax.scan(
        step, (jnp.asarray([theta0, omega0]), key), None, length=numSteps)
    return X, U, Xdot


def variance_weighted_error(mean_flat, var_flat, true_flat):
    """sqrt(mean of (F_hat - F)^T Var^{-1} (F_hat - F)) over a test batch
    (measure_batch_error, pendulum.py:1091-1103)."""
    N, D = true_flat.shape
    diff = mean_flat.reshape(N, D) - true_flat
    Ls = jnp.linalg.cholesky(var_flat)
    sols = jax.scipy.linalg.cho_solve((Ls, True), diff[..., None])[..., 0]
    errs = jnp.einsum('nd,nd->n', diff, sols)
    return jnp.sqrt(jnp.sum(errs) / N)


_REGRESSORS = {
    "matrix": make_mvgp,
    "matrixdiag": make_mvgp_diag,
    "vector": make_cogp,
    "vectordiag": make_cogp_diag,
}


def speed_test_matrix_vector(max_train_list=(256, 320, 384, 512),
                             grid=21, ntimes=10, repeat=5,
                             training_iter=50, seed=0,
                             regressors=("matrix", "vector",
                                         "matrixdiag", "vectordiag"),
                             data=None, Xtest=None, Ftrue=None,
                             x_dim=2, u_dim=1):
    """The paper's central performance claim: MVGP O(k^3) vs CoGP O(k^3 n^3)
    posterior inference timing over a (grid x grid) test lattice
    (pendulum.py:1305-1395).  Returns {regressor: {k: {...}}}.

    By default benchmarks on pendulum trajectory data; pass
    (data=(X, U, Xdot), Xtest, Ftrue, x_dim, u_dim) for other systems —
    e.g. the unicycle twin (unicycle_move_to_pose.py:2031-2151)."""
    if data is None:
        X, U, Xdot = sample_pendulum_data(numSteps=2048, seed=seed)
        Xn = np.asarray(X)
        th = np.linspace(Xn[:, 0].min(), Xn[:, 0].max(), grid)
        om = np.linspace(Xn[:, 1].min(), Xn[:, 1].max(), grid)
        Xtest = jnp.asarray(np.stack(np.meshgrid(th, om), -1).reshape(-1, 2))
        pend = PendulumDynamics()
        Ftrue = jax.vmap(lambda x: pend.F_func(x).T.reshape(-1))(Xtest)
    else:
        X, U, Xdot = data

    rng = np.random.default_rng(seed)
    results = {}
    for name in regressors:
        maker = _REGRESSORS[name]
        gp = maker(x_dim, u_dim)
        results[name] = {}
        for k in max_train_list:
            idx = rng.permutation(X.shape[0])[:k]
            params = gp.init_params(jax.random.PRNGKey(seed))
            data = gp.make_data(X[idx], U[idx], Xdot[idx])
            params = jax.jit(lambda p, d: gp.fit(
                p, d, training_iter=training_iter))(params, data)
            predict = jax.jit(lambda p, d: gp.predict_fullmat(
                p, d, gp.refresh_cache(p, d), Xtest))
            mean, var = predict(params, data)   # warmup/compile
            jax.block_until_ready(var)
            times = []
            for _ in range(repeat):
                t0 = time.perf_counter()
                for _ in range(ntimes):
                    mean, var = predict(params, data)
                jax.block_until_ready(var)
                times.append((time.perf_counter() - t0) / ntimes)
            err = float(variance_weighted_error(
                mean, _block_diag_vars(var, Xtest.shape[0]), Ftrue))
            results[name][k] = {"elapsed": min(times), "error": err}
    return results


def learn_dynamics_matrix_vector(max_train=120, training_iter=50,
                                 n_test=128, tries=8, seed=0):
    """MVGP-vs-CoGP learning-error comparison
    (learn_dynamics_matrix_vector, pendulum.py:1091-1303; reference result:
    matrix 0.659 vs vector 3.436, BASELINE.md).  Returns
    {"matrix": err, "vector": err} — median variance-weighted error over
    `tries` random test subsets of a held-out trajectory."""
    X, U, Xdot = sample_pendulum_data(numSteps=2048, seed=seed)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(X.shape[0])
    tr, te = idx[:max_train], idx[max_train:]
    pend = PendulumDynamics()

    out = {}
    for name in ("matrix", "vector"):
        gp = _REGRESSORS[name](2, 1)
        params = gp.init_params(jax.random.PRNGKey(seed))
        data = gp.make_data(X[tr], U[tr], Xdot[tr])
        params = jax.jit(lambda p, d: gp.fit(
            p, d, training_iter=training_iter))(params, data)
        cache = gp.refresh_cache(params, data)
        errs = []
        for _ in range(tries):
            sub = rng.choice(te, size=n_test, replace=False)
            Xtest = jnp.asarray(X[sub])
            Ftrue = jax.vmap(lambda x: pend.F_func(x).T.reshape(-1))(Xtest)
            mean, var = gp.predict_fullmat(params, data, cache, Xtest)
            errs.append(float(variance_weighted_error(
                mean, _block_diag_vars(var, n_test), Ftrue)))
        out[name] = float(np.median(errs))
    return out


def _block_diag_vars(var_full, b):
    """Extract per-test-point (D, D) diagonal blocks from the full
    (bD, bD) covariance."""
    D = var_full.shape[0] // b
    blocks = var_full.reshape(b, D, b, D)
    idx = jnp.arange(b)
    out = blocks[idx, :, idx, :]
    # regularize for the weighted-error solve (dtype-aware: f32 posteriors
    # have ~1e-6 noise floor on near-collapsed variances)
    jit = 1e-9 if var_full.dtype == jnp.float64 else 1e-4
    return out + jit * jnp.eye(D, dtype=var_full.dtype)[None]
