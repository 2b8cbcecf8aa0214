"""Control-affine dynamics models (environments' ground truth and priors).

Parity targets: PolarDynamics / CartesianDynamics / AckermannDrive /
ZeroDynamics (bayes_cbf/unicycle_move_to_pose.py:143-292, misc.py:194-213)
and the online-learning wrapper LearnedShiftInvariantDynamics
(unicycle_move_to_pose.py:295-428), rebuilt as pure pytree state + pure
functions so the whole sense->buffer->refit->predict cycle lives inside a
`jax.lax.scan`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..gp.algebra import DeterministicGP, LeafGP
from .mvgp import MVGP, MVGPCache, MVGPData, MVGPParams


def _tree_finite(tree) -> jax.Array:
    """Scalar bool: every inexact leaf of `tree` is finite AND of sane
    magnitude.  Finiteness alone is not enough: a garbage f32 batched
    factorization of a duplicate-row Gram returns finite values of
    ~1e29 that overflow every downstream matmul (round-5 forensics);
    healthy cache/param leaves are O(1e2) at the flagship configs, so
    1e8 (f32; 1e14 f64) is pure-garbage territory."""
    ok = jnp.ones((), bool)
    for leaf in jax.tree.leaves(tree):
        a = jnp.asarray(leaf)
        if jnp.issubdtype(a.dtype, jnp.inexact):
            lim = 1e8 if a.dtype == jnp.float32 else 1e14
            ok = (ok & jnp.all(jnp.isfinite(a))
                  & (jnp.max(jnp.abs(a)) < lim))
    return ok


class CartesianDynamics(NamedTuple):
    """Unicycle: xdot = [v cos th, v sin th, omega]; f = 0
    (unicycle_move_to_pose.py:167-197)."""
    state_size: int = 3
    ctrl_size: int = 2

    def f_func(self, x):
        return jnp.zeros_like(x)

    def g_func(self, x):
        th = x[2]
        z = jnp.zeros((), x.dtype)
        o = jnp.ones((), x.dtype)
        return jnp.array([[jnp.cos(th), z],
                          [jnp.sin(th), z],
                          [z, o]])

    def F_func(self, x):
        return jnp.concatenate([self.f_func(x)[:, None], self.g_func(x)], 1)

    def fu_func_gp(self, u):
        return LeafGP(
            mean=lambda x: self.f_func(x) + self.g_func(x) @ u,
            knl=lambda x, xp: (u @ u + 1.0) * jnp.eye(self.state_size,
                                                      dtype=u.dtype),
            dim=self.state_size, assume_independence=True,
            name="CartesianDynamics")

    def step(self, x, u, dt):
        xdot = self.f_func(x) + self.g_func(x) @ u
        return x + xdot * dt, xdot


class PolarDynamics(NamedTuple):
    """Unicycle in polar coordinates (unicycle_move_to_pose.py:143-165)."""
    state_size: int = 3
    ctrl_size: int = 2

    def f_func(self, x):
        return jnp.zeros_like(x)

    def g_func(self, x):
        rho, alpha = x[0], x[1]
        z = jnp.zeros((), x.dtype)
        o = jnp.ones((), x.dtype)
        return jnp.array([[-jnp.cos(alpha), z],
                          [-jnp.sin(alpha) / rho, o],
                          [-jnp.sin(alpha) / rho, z]])

    def step(self, x, u, dt):
        xdot = self.f_func(x) + self.g_func(x) @ u
        return x + xdot * dt, xdot


class AckermannDrive(NamedTuple):
    """Ackermann car with wheelbase L: th_dot = u2 / L, u = [v, v tan phi]
    (unicycle_move_to_pose.py:200-292).  `kernel_diag_A` is the prior
    output covariance used when this model serves as the *mean dynamics*
    of the Bayesian controller (B = I)."""
    L: float = 0.2
    kernel_diag_A: Tuple[float, ...] = (1.0, 1.0, 1.0)
    state_size: int = 3
    ctrl_size: int = 2

    def f_func(self, x):
        return jnp.zeros_like(x)

    def g_func(self, x):
        th = x[2]
        z = jnp.zeros((), x.dtype)
        return jnp.array([[jnp.cos(th), z],
                          [jnp.sin(th), z],
                          [z, jnp.asarray(1.0 / self.L, x.dtype)]])

    def F_func(self, x):
        return jnp.concatenate([self.f_func(x)[:, None], self.g_func(x)], 1)

    def fu_func_gp(self, u):
        A = jnp.diag(jnp.asarray(self.kernel_diag_A, dtype=u.dtype))
        uh = jnp.concatenate([jnp.ones((1,), u.dtype), u])
        return LeafGP(
            mean=lambda x: self.f_func(x) + self.g_func(x) @ u,
            knl=lambda x, xp: (uh @ uh) * A,
            dim=self.state_size, assume_independence=True,
            name="AckermannDrive")

    def step(self, x, u, dt):
        xdot = self.f_func(x) + self.g_func(x) @ u
        return x + xdot * dt, xdot

    def predict_fullmat(self, Xtest):
        """Exact prior over vec F: mean = F(x) flattened (1+m major), var =
        I_b kron (B kron A) (unicycle_move_to_pose.py:284-292)."""
        b = Xtest.shape[0]
        A = jnp.diag(jnp.asarray(self.kernel_diag_A, dtype=Xtest.dtype))
        B = jnp.eye(self.ctrl_size + 1, dtype=Xtest.dtype)
        mean = jax.vmap(lambda x: self.F_func(x).T.reshape(-1))(Xtest)
        from ..utils.linalg import kron
        var = kron(jnp.eye(b, dtype=Xtest.dtype), kron(B, A))
        return mean.reshape(-1), var


class ZeroDynamics(NamedTuple):
    """Zero drift and actuation (misc.py:194-213); Bayesian variant has a
    unit-kernel GP (unicycle_move_to_pose.py:794-798)."""
    state_size: int = 3
    ctrl_size: int = 2

    def f_func(self, x):
        return jnp.zeros_like(x)

    def g_func(self, x):
        return jnp.zeros((self.state_size, self.ctrl_size), x.dtype)

    def F_func(self, x):
        return jnp.zeros((self.state_size, 1 + self.ctrl_size), x.dtype)

    def fu_func_gp(self, u):
        return LeafGP(
            mean=lambda x: jnp.zeros((self.state_size,), x.dtype),
            knl=lambda x, xp: (u @ u + 1.0) * jnp.eye(self.state_size,
                                                      dtype=u.dtype),
            dim=self.state_size, assume_independence=True, name="Zero")

    def step(self, x, u, dt):
        return x, jnp.zeros_like(x)


class PendulumDynamics(NamedTuple):
    """Inverted pendulum: x = (theta, omega),
    f = [omega, -(g/l) sin theta], g = [0, 1/(m l)]
    (bayes_cbf/pendulum.py:82-130)."""
    mass: float = 1.0
    gravity: float = 10.0
    length: float = 1.0
    state_size: int = 2
    ctrl_size: int = 1

    def f_func(self, x):
        th, w = x[0], x[1]
        return jnp.stack([w, -(self.gravity / self.length) * jnp.sin(th)])

    def g_func(self, x):
        return jnp.array([[0.0], [1.0 / (self.mass * self.length)]],
                         dtype=x.dtype)

    def F_func(self, x):
        return jnp.concatenate([self.f_func(x)[:, None], self.g_func(x)], 1)

    def fu_func_gp(self, u):
        return LeafGP(
            mean=lambda x: self.f_func(x) + self.g_func(x) @ u,
            knl=lambda x, xp: (u @ u + 1.0) * jnp.eye(self.state_size,
                                                      dtype=u.dtype),
            dim=self.state_size, assume_independence=True, name="Pendulum")

    def step(self, x, u, dt):
        from ..utils.func import normalize_radians
        xdot = self.f_func(x) + self.g_func(x) @ u
        x_next = x + xdot * dt
        # wrap theta to (-pi, pi] (pendulum.py:226)
        x_next = x_next.at[0].set(normalize_radians(x_next[0]))
        return x_next, xdot


# --------------------------------------------------------------------------
# Online-learned residual dynamics with shift invariance
# --------------------------------------------------------------------------

class LearnedDynState(NamedTuple):
    """Carry-state of the online learner (fixed shapes for lax.scan).

    `buf` is the live reservoir; `data` is the snapshot the GP was last
    *fitted* on — predictions use (params, data, cache) so that, exactly
    like the reference (whose ExactGP training set only changes inside
    fit(), control_affine_model.py:289-290), the posterior is constant
    between refits."""
    params: MVGPParams
    buf: MVGPData          # live reservoir buffer, capacity = max_train
    data: MVGPData         # fitted snapshot (same shapes)
    cache: MVGPCache
    prev_x: jax.Array
    prev_u: jax.Array
    have_prev: jax.Array   # bool scalar
    count_pairs: jax.Array # int32: (x,u) pairs recorded (reference's len(Xtrain))
    count_res: jax.Array   # int32: xdot samples offered to the reservoir
    key: jax.Array


class KernelChannels(NamedTuple):
    """Per-step kernel-hyperparameter observability record — the channel
    set the reference's flagship logs every step for the self-triggered
    interval analysis (vis/knl_lengthscale, knl_A, knl_B, Fx_var, Fxu_var;
    unicycle_move_to_pose.py:970-992)."""
    lengthscale: jax.Array   # (n,) ARD RBF lengthscales
    outputscale: jax.Array   # () kernel variance (sf^2)
    A: jax.Array             # (n, n) task row-covariance factor
    B: jax.Array             # (1+m, 1+m) task column-covariance factor
    Fx_var: jax.Array        # () tr var f(x) = Bk[0,0] * tr A
    Fxu_var: jax.Array       # () tr var F(x)u_hom at the applied control


class LearnedShiftInvariantDynamics(NamedTuple):
    """mean dynamics + learned MVGP residual with translation invariance
    (x, y zeroed before entering the kernel: unicycle_move_to_pose.py:326-330).

    The reference buffers every (x, u), and every `train_every_n_steps`
    differences the trajectory for xdot, subtracts the mean-dynamics
    prediction, subsamples uniformly to max_train, and refits
    (unicycle_move_to_pose.py:340-384).  Here the uniform subsample is a
    reservoir (Algorithm R) so the buffer has fixed shape, and the refit is
    a `lax.cond`-guarded jitted Adam loop — the whole learner lives inside
    the rollout scan."""
    gp: MVGP
    mean_dynamics: NamedTuple = AckermannDrive()
    max_train: int = 200
    training_iter: int = 100
    shift_invariant: bool = True
    train_every_n_steps: int = 20
    enable_learning: bool = True
    dt: float = 0.01
    # new capability vs the reference: incorporate every sample into the
    # posterior immediately via an O(K^2) rank-1 Cholesky append
    # (hyperparameters still refit on the train_every_n_steps schedule)
    continuous_updates: bool = False
    # True (serving semantics): once the reservoir is full, replacement
    # steps trigger a per-step O(K^3) full cache refresh so the posterior
    # tracks every replacement (deploy.CompiledController).  False
    # (batched-rollout semantics): replacement steps leave the cache to
    # the scheduled refits — under vmap the refresh cond lowers to a
    # select that would run the K^3 factorization EVERY step.
    continuous_full_refresh: bool = True
    # opt-in perf knob (0 = off, reference semantics): Adam budget for
    # refits AFTER the first one.  Hyperparameters already persist across
    # refits (the reference fits the same torch module every time,
    # unicycle_move_to_pose.py:312-316 + control_affine_model.py:300), so
    # later fits start warm and converge in far fewer iterations; the
    # reference still spends the full training_iter=100 budget on every
    # fit.  Outcome-gated evidence for reduced warm budgets lives in
    # records/tpu_round3.jsonl (warm_refit_iters_ab).  Honored by the
    # segmented batched runners and scan_with_scheduled_fits; the
    # per-step observe() path always uses the full budget.
    training_iter_warm: int = 0
    # opt-in perf knob (0/1 = off): two-stage FIRST fit.  Stage 1 spends
    # the full training_iter Adam budget on a stride-subsampled reservoir
    # (buf[::stride], K/stride rows — the cold-start fit's job is finding
    # the lengthscale/task-matrix REGIME, which a half-size sample
    # determines equally well, while each MLL iteration costs ~K^3);
    # stage 2 refines at full K for first_fit_refine_iter iterations —
    # exactly a warm refit, which records/tpu_round3.jsonl
    # (warm_refit_iters_ab) showed is outcome-identical near an optimum.
    # Rationale: the first fit is 100 of the flagship's 140 total Adam
    # iterations, and records first_fit_iters_ab pinned that naively
    # cutting its BUDGET degrades goal-reaching monotonically — the
    # budget is load-bearing; this keeps the budget and shrinks the
    # per-iteration cost instead.
    first_fit_coarse_stride: int = 0
    first_fit_refine_iter: int = 15

    # ------------------------------------------------------------ state

    def init_state(self, key, dtype=jnp.float64) -> LearnedDynState:
        kp, kr = jax.random.split(key)
        params = self.gp.init_params(kp, dtype=dtype)
        data = self.gp.empty_data(self.max_train, dtype=dtype)
        cache = self.gp.empty_cache(self.max_train, dtype=dtype)
        n, m = self.gp.x_dim, self.gp.u_dim
        return LearnedDynState(
            params=params, buf=data, data=data, cache=cache,
            prev_x=jnp.zeros((n,), dtype), prev_u=jnp.zeros((m,), dtype),
            have_prev=jnp.zeros((), bool),
            count_pairs=jnp.zeros((), jnp.int32),
            count_res=jnp.zeros((), jnp.int32), key=kr)

    def _shift_inv(self, x):
        if not self.shift_invariant:
            return x
        return jnp.concatenate([jnp.zeros_like(x[:-1]), x[-1:]])

    # ------------------------------------------------------------ predict

    def _learned_fu_gp(self, state: LearnedDynState, u):
        gp = self.gp
        si = self._shift_inv
        return LeafGP(
            mean=lambda x: gp.fu_mean(state.params, state.data, state.cache,
                                      u, si(x)),
            knl=lambda x, xp: gp.fu_knl(state.params, state.data,
                                        state.cache, u, si(x), si(xp)),
            dim=gp.x_dim, assume_independence=True, name="learned_fu")

    def fu_func_gp(self, state: LearnedDynState, u):
        """DeterministicGP(mean dynamics) + learned residual GP
        (unicycle_move_to_pose.py:388-398)."""
        md = self.mean_dynamics
        if not self.enable_learning:
            return md.fu_func_gp(u)
        det = DeterministicGP(
            lambda x: md.f_func(x) + md.g_func(x) @ u,
            dim=self.gp.x_dim, name="mean_dyn")
        return det + self._learned_fu_gp(state, u)

    def moments(self, state: LearnedDynState, x):
        """Single-state posterior moments (FT, Bk, A):

            vec F(x) ~ N(vec FT^T, Bk kron A),   FT (n, 1+m)

        One O(k^2 (1+m)) posterior evaluation from which a controller can
        assemble *all* its chance-constraint cones in closed form — the
        TPU-first replacement for re-walking the GP expression tree under
        autodiff once per constraint term (the reference re-enters
        custom_predict per mean/variance/grad evaluation, SURVEY.md 3.1).
        """
        md = self.mean_dynamics
        if not self.enable_learning:
            FT = md.F_func(x)
            A = jnp.diag(jnp.asarray(getattr(md, "kernel_diag_A",
                                             (1.0,) * self.gp.x_dim),
                                     dtype=x.dtype))
            Bk = jnp.eye(1 + self.gp.u_dim, dtype=x.dtype)
            return FT, Bk, A
        xs = self._shift_inv(x)
        FT = (md.F_func(x)
              + self.gp.fT_post(state.params, state.data, state.cache, xs))
        Bk = self.gp.Bk_single(state.params, state.data, state.cache, xs, xs)
        return FT, Bk, state.params.A

    def kernel_channels(self, state: LearnedDynState, moments, u
                        ) -> KernelChannels:
        """Per-step hyperparameter/variance record for the trigger-interval
        pipeline (reference logs these to tensorboard every step,
        unicycle_move_to_pose.py:970-992).  `moments` is the (FT, Bk, A)
        triple already computed for the controller this step — no extra
        posterior evaluation."""
        _, Bk, A = moments
        uh = jnp.concatenate([jnp.ones((1,), u.dtype), u])
        if self.enable_learning:
            p = state.params
            ls, os_ = p.lengthscale, p.outputscale
            B = p.B
        else:
            n = self.gp.x_dim
            dt_ = A.dtype
            ls = jnp.ones((n,), dt_)
            os_ = jnp.ones((), dt_)
            B = jnp.eye(1 + self.gp.u_dim, dtype=dt_)
        return KernelChannels(
            lengthscale=ls, outputscale=os_, A=A, B=B,
            Fx_var=Bk[0, 0] * jnp.trace(A),
            Fxu_var=(uh @ Bk @ uh) * jnp.trace(A))

    def moment_derivatives(self, state: LearnedDynState, x):
        """Posterior moment *derivatives* at a single state x — everything a
        relative-degree-2 chance constraint needs, computed once per step:

            M  (n, 1+m)        posterior mean of F^T (incl. mean dynamics)
            dM (n, 1+m, n)     dM[i, j, a] = d M[i, j] / d x_a
            Bk (1+m, 1+m)      posterior row covariance at (x, x)
            D1 (n, 1+m, 1+m)   D1[a] = d Bk(x, x') / d x_a     | x'=x
            D2 (n, n, 1+m,1+m) D2[a,b] = d^2 Bk / d x_a d x'_b | x'=x
            A  (n, n)          task output covariance

        This is the closed-form replacement for walking GradientGP
        Hessians through the posterior once per cone (the reference's
        custom_predict(grad_gp=True), control_affine_model.py:512-610):
        ONE forward-over-forward pass through Bk_single serves every
        CBC2/CLC cone of the step."""
        md = self.mean_dynamics
        gp = self.gp
        n, mh = gp.x_dim, 1 + gp.u_dim
        dtype = x.dtype
        if not self.enable_learning:
            Mfun = lambda xx: md.F_func(xx)
            M = Mfun(x)
            dM = jax.jacfwd(Mfun)(x)
            A = jnp.diag(jnp.asarray(getattr(md, "kernel_diag_A",
                                             (1.0,) * n), dtype=dtype))
            return (M, dM, jnp.eye(mh, dtype=dtype),
                    jnp.zeros((n, mh, mh), dtype),
                    jnp.zeros((n, n, mh, mh), dtype), A)
        si = self._shift_inv

        def Mfun(xx):
            return md.F_func(xx) + gp.fT_post(state.params, state.data,
                                              state.cache, si(xx))

        def Bkfun(xx, xxp):
            return gp.Bk_single(state.params, state.data, state.cache,
                                si(xx), si(xxp))

        M = Mfun(x)
        dM = jax.jacfwd(Mfun)(x)                          # (n, 1+m, n)
        Bk = Bkfun(x, x)
        D1 = jnp.moveaxis(jax.jacfwd(Bkfun, argnums=0)(x, x), -1, 0)
        D2 = jnp.transpose(
            jax.jacfwd(jax.jacfwd(Bkfun, argnums=0), argnums=1)(x, x),
            (2, 3, 0, 1))
        return M, dM, Bk, D1, D2, state.params.A

    def f_gp_and_fu_gp(self, state: LearnedDynState, u):
        """(f_gp, fu_gp) leaves with their cross-covariance registered —
        needed by the relative-degree-2 CBC (cov(F u, f) registered at
        control_affine_model.py:797 in the reference)."""
        gp = self.gp
        md = self.mean_dynamics
        si = self._shift_inv
        f_leaf = LeafGP(
            mean=lambda x: gp.f_mean(state.params, state.data, state.cache,
                                     si(x)),
            knl=lambda x, xp: gp.f_knl(state.params, state.data, state.cache,
                                       si(x), si(xp)),
            dim=gp.x_dim, name="learned_f")
        fu_leaf = LeafGP(
            mean=lambda x: gp.fu_mean(state.params, state.data, state.cache,
                                      u, si(x)),
            knl=lambda x, xp: gp.fu_knl(state.params, state.data,
                                        state.cache, u, si(x), si(xp)),
            dim=gp.x_dim, name="learned_fu")
        fu_leaf.register_covar(
            f_leaf,
            lambda x, xp: gp.covar_fu_f(state.params, state.data,
                                        state.cache, u, si(x), si(xp)))
        if not self.enable_learning:
            return f_leaf, fu_leaf
        f_det = DeterministicGP(md.f_func, dim=gp.x_dim, name="mean_f")
        fu_det = DeterministicGP(lambda x: md.f_func(x) + md.g_func(x) @ u,
                                 dim=gp.x_dim, name="mean_fu")
        return f_det + f_leaf, fu_det + fu_leaf

    def f_func(self, state, x):
        xs = self._shift_inv(x)
        learned = self.gp.f_mean(state.params, state.data, state.cache, xs)
        return self.mean_dynamics.f_func(x) + learned

    def g_func(self, state, x):
        xs = self._shift_inv(x)
        learned = self.gp.g_mean(state.params, state.data, state.cache, xs)
        return self.mean_dynamics.g_func(x) + learned

    def predict_fullmat(self, state: LearnedDynState, Xtest):
        """mean-dynamics F plus learned residual posterior
        (unicycle_move_to_pose.py:406-428)."""
        if not self.enable_learning:
            return self.mean_dynamics.predict_fullmat(Xtest)
        Xsi = jax.vmap(self._shift_inv)(Xtest)
        dmean, dvar = self.gp.predict_fullmat(state.params, state.data,
                                              state.cache, Xsi)
        mmean = jax.vmap(
            lambda x: self.mean_dynamics.F_func(x).T.reshape(-1))(Xtest)
        return mmean.reshape(-1) + dmean, dvar

    # ------------------------------------------------------------ learn

    def record(self, state: LearnedDynState, x, u) -> LearnedDynState:
        """Buffer update only (no fit): push the finite-difference residual
        of the previous pair into the reservoir and remember (x, u)."""
        gp = self.gp
        md = self.mean_dynamics

        # finite-difference residual from the previous step
        xdot = (x - state.prev_x) / self.dt
        xprev_si = self._shift_inv(state.prev_x)
        xdot_mean = md.f_func(xprev_si) + md.g_func(xprev_si) @ state.prev_u
        resid = xdot - xdot_mean

        key, kslot = jax.random.split(state.key)
        cap = self.max_train
        # reservoir slot: first `cap` samples fill; later ones replace
        # uniformly with probability cap / (count_res + 1)
        j = jax.random.randint(kslot, (), 0, jnp.maximum(state.count_res + 1, 1))
        slot = jnp.where(state.count_res < cap, state.count_res, j)
        accept = state.have_prev & ((state.count_res < cap) | (j < cap))
        slot = jnp.clip(slot, 0, cap - 1)

        uh = jnp.concatenate([jnp.ones((1,), u.dtype), state.prev_u])
        buf = state.buf
        buf = buf._replace(
            X=buf.X.at[slot].set(jnp.where(accept, xprev_si, buf.X[slot])),
            UH=buf.UH.at[slot].set(jnp.where(accept, uh, buf.UH[slot])),
            Xdot=buf.Xdot.at[slot].set(jnp.where(accept, resid,
                                                 buf.Xdot[slot])),
            mask=buf.mask.at[slot].set(jnp.where(accept, 1.0,
                                                 buf.mask[slot])))
        count_res = state.count_res + accept.astype(jnp.int32)

        new_state = state._replace(
            buf=buf, prev_x=x, prev_u=u, have_prev=jnp.ones((), bool),
            count_pairs=state.count_pairs + 1, count_res=count_res, key=key)
        if not self.continuous_updates:
            return new_state

        if not self.continuous_full_refresh:
            # batched-rollout continuous path: row-gated O(K^2) append
            # only (cache_append_row carries the accept/sanity gating in
            # its row writes — no cond, so nothing lowers to a
            # whole-cache select under vmap); once the reservoir is full
            # the scheduled refits own the cache.
            wr = accept & (state.count_res < cap)
            cache = gp.cache_append_row(new_state.params, new_state.buf,
                                        state.cache, slot, wr)
            # row-gated data snapshot: equals buf on accepted rows
            data = jax.tree.map(
                lambda d, b: d.at[slot].set(
                    jnp.where(wr, b[slot], d[slot])),
                state.data, buf)
            return new_state._replace(data=data, cache=cache)

        # serving semantics: rank-1 append while the reservoir is filling
        # (prefix-active), full O(K^3) refresh once replacement begins;
        # data snapshot tracks buf
        def upd(s):
            def append(s2):
                cache = gp.cache_append(s2.params, s2.buf, s2.cache, slot)
                return s2._replace(data=s2.buf, cache=cache)

            def full(s2):
                return s2._replace(data=s2.buf,
                                   cache=gp.refresh_cache(s2.params, s2.buf))

            return jax.lax.cond(state.count_res < cap, append, full, s)

        def upd_guarded(s):
            # same non-finite guard as fit_now: a numerically dependent
            # appended row can break the rank-1 Schur step in f32 — keep
            # the pre-update cache/data (still consistent: they snapshot
            # an older buf) rather than poisoning the posterior
            u_s = upd(s)
            ok = _tree_finite(u_s.cache)
            return jax.tree.map(lambda a, b: jnp.where(ok, a, b), u_s, s)

        return jax.lax.cond(accept, upd_guarded, lambda s: s, new_state)

    def fit_now(self, state: LearnedDynState,
                training_iter: Optional[int] = None) -> LearnedDynState:
        """Unconditional refit on the current reservoir + cache refresh.

        In-graph failure handling (SURVEY 5.3): a trajectory parked at a
        near-equilibrium fills the reservoir with near-duplicate points
        whose Gram is singular beyond the f32 jitter ladder — the
        refreshed cache (or the fitted params) can come back non-finite
        and would poison every later posterior/LQR evaluation (measured:
        2 of 64 flagship pendulum episodes NaN'd from the t=40 refit,
        round-5 forensics).  The reference's analogue is the make_psd
        retry ladder + loud crash (control_affine_model.py:891-921);
        in-scan we keep the PREVIOUS fitted state instead — the model
        just stays at its last finite posterior."""
        params = self.gp.fit(state.params, state.buf,
                             training_iter=(self.training_iter
                                            if training_iter is None
                                            else training_iter))
        new = state._replace(params=params, data=state.buf,
                             cache=self.gp.refresh_cache(params, state.buf))
        ok = _tree_finite((new.params, new.cache))
        return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, state)

    @property
    def first_fit_twostage(self) -> bool:
        """True when the first scheduled fit runs the two-stage
        coarse-subsample + full-K-refine program (first_fit_coarse_stride
        >= 2)."""
        return self.first_fit_coarse_stride >= 2

    def fit_now_first(self, state: LearnedDynState) -> LearnedDynState:
        """The FIRST scheduled fit.  Default: fit_now at the full budget.
        With first_fit_coarse_stride >= 2: stage 1 runs the full Adam
        budget on the stride-subsampled reservoir (every stride-th ring
        slot — consecutive slots are dt apart, so the subsample covers
        the same trajectory span at half the density and the Gram
        shrinks from K^2 to (K/stride)^2); stage 2 warm-refines on the
        full reservoir for first_fit_refine_iter iterations.  The same
        non-finite guard as fit_now wraps the whole two-stage result."""
        if not self.first_fit_twostage:
            return self.fit_now(state)
        stride = self.first_fit_coarse_stride
        sub = jax.tree.map(lambda a: a[::stride], state.buf)
        params = self.gp.fit(state.params, sub,
                             training_iter=self.training_iter)
        params = self.gp.fit(params, state.buf,
                             training_iter=self.first_fit_refine_iter)
        new = state._replace(params=params, data=state.buf,
                             cache=self.gp.refresh_cache(params, state.buf))
        ok = _tree_finite((new.params, new.cache))
        return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, state)

    @property
    def first_fit_differs(self) -> bool:
        """True when the first scheduled fit runs a different program from
        later ones (the reduced warm budget and/or the two-stage coarse
        first fit) — the runners then compile two fit programs and
        dispatch on the event index.  Known edge (benign at experiment
        scale): the runners key "first" on the first SCHEDULED event
        (t == train_every / fit_event == 0), so if that event's fit is
        skipped because the buffer is still empty (count_res == 0 — needs
        train_every steps with no accepted residual pair, which no
        experiment config produces), the first ACTUAL fit would run at
        the reduced warm budget."""
        return self.warm_refits_differ or self.first_fit_twostage

    @property
    def warm_refits_differ(self) -> bool:
        """True when training_iter_warm is set to a budget different from
        the full one (the runners then compile a second, shorter fit
        program for non-first refits)."""
        return self.training_iter_warm not in (0, self.training_iter)

    def fit_now_warm(self, state: LearnedDynState) -> LearnedDynState:
        """fit_now at the (reduced) warm-start Adam budget; identical to
        fit_now when the knob is off."""
        if not self.warm_refits_differ:
            return self.fit_now(state)
        return self.fit_now(state, training_iter=self.training_iter_warm)

    def should_fit_at(self, t):
        """The reference's schedule: len(Xtrain) > 0 and
        len(Xtrain) % train_every_n_steps == 0, checked before appending
        (unicycle_move_to_pose.py:341-344).  count_pairs == t in a rollout,
        so the decision is a *scalar* function of the step index — this is
        what lets batched rollouts hoist the fit out of vmap (a vmapped
        lax.cond lowers to select and would run the Adam loop every step)."""
        return (t > 0) & (t % self.train_every_n_steps == 0) \
            & bool(self.enable_learning)

    def observe(self, state: LearnedDynState, x, u) -> LearnedDynState:
        """record + on-schedule refit (single-rollout path; batched rollouts
        call record/fit_now separately around a scalar cond)."""
        do_fit = self.should_fit_at(state.count_pairs) & (state.count_res > 0)
        state = self.record(state, x, u)

        def fit_branch(s):
            return self.fit_now(s)

        return jax.lax.cond(do_fit, fit_branch, lambda s: s, state)
