"""Matrix-variate Gaussian process regression of control-affine dynamics.

The model (reference: bayes_cbf/control_affine_model.py, docstring at
:1000-1007 and the math at :983-1091):

    xdot = F(x)^T u_hom,   u_hom = [1; u],   F(x) in R^{(1+m) x n}
    F(x) ~ MN( M, B k(x,x'), A )        (matrix-variate GP prior)

so that  cov(vec F(x), vec F(x')) = k(x,x') * (B kron A),  and a training
observation y_i = F(x_i)^T uh_i has

    cov(y_i, y_j) = k(x_i, x_j) * (uh_i^T B uh_j) * A  =:  Kb_ij * A .

Everything is closed-form Cholesky math on the k x k matrix Kb — the insight
the reference itself arrived at after abandoning gpytorch inference
("Gpytorch is complicated ... I take things in my own hands",
bayes_cbf/control_affine_model.py:397-401).  We go further and use the same
explicit math for *training* as well: the exact marginal log-likelihood of
the matrix-normal observation model factorizes as

    log p(Y) = -1/2 [ tr(A^{-1} Y^T Kb^{-1} Y) + n log|Kb| + k log|A|
                      + k n log 2 pi ]

which needs only a k x k and an n x n Cholesky per step — no lazy-tensor CG.

TPU-first design decisions:
  * fixed-shape ring-buffer training set with a validity mask, so the whole
    online-learning loop can live inside one `jax.lax.scan` (SURVEY.md 5.7);
  * the Gram/Cholesky/solve pipeline is batched dense linear algebra that
    XLA maps straight onto the MXU; hyperparameter fitting is an
    `optax`-driven `lax.scan`, jittable and therefore embeddable in the
    rollout scan via `lax.cond`;
  * dtype-polymorphic: float64 for reference-parity tests on CPU, float32
    for the TPU fast path.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.linalg import (kron, masked_cholesky, psd_cholesky,
                            psd_chol_small_ladder,
                            cho_solve_small_unrolled)

_SQRT2PI_LOG = math.log(2.0 * math.pi)

# Route the MLL through the fused gram+invert op (ops/gramsolve.py):
# same masked-Gram expression, but under batched TPU f32 the Gram is
# built inside the sweep kernel's VMEM instead of round-tripping HBM
# every Adam iteration.  False restores the explicit gram_kb +
# solve_and_logdet pipeline (A/B tests compare both).
FUSED_FIT = True


def _softplus(x):
    return jax.nn.softplus(x)


def _inv_softplus(y: float) -> float:
    return float(math.log(math.expm1(y))) if y < 20 else float(y)


class MVGPParams(NamedTuple):
    """Trainable hyperparameters (a pytree).

    A = W_A W_A^T + diag(softplus(raw_vA))   — output-dim task covariance
    B = W_B W_B^T + diag(softplus(raw_vB))   — control-channel task covariance
    k(x,x') = softplus(raw_outputscale) * exp(-1/2 sum_d (dx_d/l_d)^2),
    l = softplus(raw_lengthscale)            — ARD RBF data kernel
    mean_M in R^{(1+m) x n}                  — constant prior mean of F
    """
    raw_lengthscale: jax.Array
    raw_outputscale: jax.Array
    W_A: jax.Array
    raw_vA: jax.Array
    W_B: jax.Array
    raw_vB: jax.Array
    mean_M: jax.Array

    @property
    def lengthscale(self):
        return _softplus(self.raw_lengthscale)

    @property
    def outputscale(self):
        return _softplus(self.raw_outputscale)

    @property
    def A(self):
        return self.W_A @ self.W_A.T + jnp.diag(_softplus(self.raw_vA))

    @property
    def B(self):
        return self.W_B @ self.W_B.T + jnp.diag(_softplus(self.raw_vB))


class MVGPData(NamedTuple):
    """Fixed-shape training buffer.  Rows with mask=0 are inert."""
    X: jax.Array      # (K, n_state)
    UH: jax.Array     # (K, 1+m) homogenized controls [1, u]
    Xdot: jax.Array   # (K, n_state) observed (residual) state derivatives
    mask: jax.Array   # (K,) float/bool validity


class MVGPCache(NamedTuple):
    """Posterior solve cache — the analogue of the reference's
    `_perturbed_cholesky` cache (bayes_cbf/control_affine_model.py:379-395),
    refreshed on refit instead of invalidated.

    `Linv` (the explicit triangular inverse) is the TPU-first addition:
    triangular solves are latency-bound on TPU (sequential back-substitution),
    so the per-control-step posterior evaluations become pure MXU matmuls
    against Linv, paid for by one O(K^3/3) solve-against-identity per refit."""
    L: jax.Array      # (K, K) Cholesky of masked Kb
    alpha: jax.Array  # (K, n) = Kb^{-1} (Xdot - M^T uh)
    Linv: jax.Array   # (K, K) = L^{-1}


class MVGP(NamedTuple):
    """Static model description (shapes/options only; hashable for jit)."""
    x_dim: int
    u_dim: int
    rank_A: int
    rank_B: int
    jitter: float = 1e-6
    gamma_prior: Optional[tuple] = None   # (concentration, rate) on lengthscale
    use_pallas: bool = False              # fused Gram kernel on TPU (inference)

    # ---------------------------------------------------------- init

    def init_params(self, key: jax.Array, dtype=jnp.float64) -> MVGPParams:
        n, mh = self.x_dim, 1 + self.u_dim
        kA, kB = jax.random.split(key)
        raw1 = _inv_softplus(1.0)
        return MVGPParams(
            raw_lengthscale=jnp.full((self.x_dim,), raw1, dtype=dtype),
            raw_outputscale=jnp.asarray(raw1, dtype=dtype),
            W_A=0.3 * jax.random.normal(kA, (n, self.rank_A), dtype=dtype),
            raw_vA=jnp.full((n,), raw1, dtype=dtype),
            W_B=0.3 * jax.random.normal(kB, (mh, self.rank_B), dtype=dtype),
            raw_vB=jnp.full((mh,), raw1, dtype=dtype),
            mean_M=jnp.zeros((mh, n), dtype=dtype),
        )

    def empty_data(self, capacity: int, dtype=jnp.float64) -> MVGPData:
        n, mh = self.x_dim, 1 + self.u_dim
        return MVGPData(
            X=jnp.zeros((capacity, n), dtype=dtype),
            UH=jnp.zeros((capacity, mh), dtype=dtype),
            Xdot=jnp.zeros((capacity, n), dtype=dtype),
            mask=jnp.zeros((capacity,), dtype=dtype),
        )

    def make_data(self, X, U, Xdot) -> MVGPData:
        """Pack a concrete training set (all rows valid)."""
        X = jnp.asarray(X)
        ones = jnp.ones((X.shape[0], 1), dtype=X.dtype)
        return MVGPData(X=X, UH=jnp.concatenate([ones, jnp.asarray(U)], -1),
                        Xdot=jnp.asarray(Xdot),
                        mask=jnp.ones((X.shape[0],), dtype=X.dtype))

    # ---------------------------------------------------------- kernel

    def k_xx(self, params: MVGPParams, X1: jax.Array, X2: jax.Array):
        """ARD RBF data kernel, (b1, b2) Gram.

        DELIBERATELY the broadcast-difference form.  The "faster"
        dot-product form |a|^2 + |b|^2 - 2 a.b cancels catastrophically
        for NEARBY points — and ring-buffer training data are
        consecutive states dt apart, so off-diagonal d^2 ~ 1e-6 while
        the subtracted terms are ~10: measured up to 640% relative
        error on near-diagonal d^2 in f32 (0% for this form), which
        perturbed the Gram's near-duplicate structure enough to flip
        the learning-helps flagship outcome on TPU (f64 was unaffected;
        round-2 regression bisect).  The measured end-to-end "gain" of
        the dot form was 1.6% — noise.  tests/test_mvgp.py pins the
        near-duplicate accuracy so it is not reintroduced."""
        ell = params.lengthscale
        d = (X1[:, None, :] - X2[None, :, :]) / ell
        return params.outputscale * jnp.exp(-0.5 * jnp.sum(d * d, -1))

    def k_xx_single(self, params: MVGPParams, x: jax.Array, xp: jax.Array):
        d = (x - xp) / params.lengthscale
        return params.outputscale * jnp.exp(-0.5 * jnp.sum(d * d))

    def gram_kb(self, params: MVGPParams, data: MVGPData):
        """Masked k x k scalarized Gram: Kb = Kxx o (UH B UH^T) + nugget I.

        The nugget is `jitter` plus a DTYPE-AWARE relative term
        10 * k * eps * mean(diag): ring-buffer training data are
        consecutive states dt apart, so the Gram is near-singular by
        construction and its f32 roundoff indefiniteness reaches
        ~k * eps * scale (measured min eig -1.4e-5 * scale on a real
        buffer).  With only the absolute 1e-6 jitter, EVERY f32 MLL
        factorization failed and the Adam NaN-guard silently rejected
        every step — the flagship TPU fit never moved a hyperparameter
        (round-3 discovery; the f64 path, where the relative term is
        ~4e-13 * scale and changes nothing, always trained fine).  The
        relative nugget is ~2.4e-4 * scale in f32 at k=200 — an
        observation-noise floor four orders below the signal variance."""
        Kxx = self.k_xx(params, data.X, data.X)
        uBu = data.UH @ params.B @ data.UH.T
        Kb = Kxx * uBu
        k = Kb.shape[0]
        eps = jnp.finfo(Kb.dtype).eps
        scale = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(Kb))), 1.0)
        nug = self.jitter + 10.0 * k * eps * scale
        Kb = Kb + nug * jnp.eye(k, dtype=Kb.dtype)
        return Kb

    def residual_Y(self, params: MVGPParams, data: MVGPData):
        """Y_i = xdot_i - M^T uh_i, zeroed on invalid rows.  (K, n)"""
        MX = data.UH @ params.mean_M          # (K, n)
        return (data.Xdot - MX) * data.mask[:, None]

    # ---------------------------------------------------------- MLL / fit

    def mll(self, params: MVGPParams, data: MVGPData):
        """Exact matrix-normal marginal log likelihood, averaged per scalar
        observation (matching gpytorch's ExactMarginalLogLikelihood
        normalization used by the reference fit loop,
        bayes_cbf/control_affine_model.py:310-334)."""
        n = self.x_dim
        kcnt = jnp.sum(data.mask)
        Y = self.residual_Y(params, data)
        # single jittered factorization, NOT the jitter ladder: the Gram
        # already carries +jitter I, and the Adam loop's NaN guard rejects
        # any step whose factorization fails — paying the 9-rung batched
        # ladder per MLL evaluation was the dominant cost of the whole
        # flagship rollout (the refit phase measured 70% of bench wall).
        # The MLL consumes the Gram ONLY through (Kb^{-1} Y, logdet Kb),
        # so `solve_and_logdet` computes the pair with one fused custom
        # VJP: the forward inverts with the FIT_INVERSE kernel (default
        # the blocked-Cholesky kernel — the Schur/sweep recursion is
        # non-finite on these near-singular trajectory Grams in f32,
        # ops/cholinv.py FIT_INVERSE docstring) and the backward reuses
        # the explicit inverse.
        m = data.mask.astype(Y.dtype)
        if FUSED_FIT:
            # fused gram+invert: the masked Gram is built in VMEM by the
            # kernel and never materialized in HBM (ops/gramsolve.py);
            # the expression is algebraically identical to the branch
            # below (same raw-difference distances, same (UH (sB)) UH^T
            # association, same dtype-aware nugget as gram_kb)
            from ..ops.gramsolve import gram_solve_logdet
            k = data.X.shape[0]
            eps = jnp.finfo(Y.dtype).eps
            UB = data.UH @ (params.outputscale * params.B)
            diagKb = jnp.sum(UB * data.UH, -1)          # s * uh B uh
            scale = jnp.maximum(jnp.mean(jnp.abs(diagKb)), 1.0)
            nug = self.jitter + 10.0 * k * eps * scale
            S, logdet_Kb = gram_solve_logdet(
                data.X, UB, data.UH, 1.0 / params.lengthscale,
                nug, m, Y)
        else:
            from ..ops.cholinv import solve_and_logdet
            outer = m[:, None] * m[None, :]
            eye = jnp.eye(data.X.shape[0], dtype=Y.dtype)
            Km = (self.gram_kb(params, data) * outer
                  + eye * (1.0 - m)[:, None])
            S, logdet_Kb = solve_and_logdet(Km, Y)   # (Kb^{-1} Y, logdet)
        # A is n x n (n <= ~9) and PD by construction (W W^T + softplus
        # diag): the statically-unrolled factorization fuses into the
        # loss chain — jnp.linalg.cholesky of a 3x3 here is a ~700 us
        # latency-bound custom call per Adam iteration (round-3 trace)
        LA = psd_chol_small_ladder(params.A, init_jitter=self.jitter)
        # tr(A^{-1} Y^T Kb^{-1} Y)
        G = Y.T @ S
        quad = jnp.trace(cho_solve_small_unrolled(LA, G))
        # masked rows contribute log(1) = 0 to logdet Kb; the tiny-floor
        # guards keep the f32 fast path NaN-free on marginal factorizations
        tiny = jnp.asarray(1e-20, Y.dtype)
        logdet_A = 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.diagonal(LA), tiny)))
        ll = -0.5 * (quad + n * logdet_Kb + kcnt * logdet_A
                     + kcnt * n * _SQRT2PI_LOG)
        if self.gamma_prior is not None:
            conc, rate = self.gamma_prior
            ell = params.lengthscale
            ll = ll + jnp.sum((conc - 1.0) * jnp.log(ell) - rate * ell)
        return ll / jnp.maximum(kcnt * n, 1.0)

    def fit(self, params: MVGPParams, data: MVGPData,
            training_iter: int = 50, lr: float = 0.1) -> MVGPParams:
        """Adam on the negative MLL.  Pure and jittable: the whole fit is
        one lax.scan, so it can run under `lax.cond` inside a rollout scan.

        The LR schedule is the reference's MultiStepLR decay with
        milestones at 30/60/80/90% of the iteration budget (gamma=0.1,
        bayes_cbf/control_affine_model.py:300-303).  A cosine alternative
        and a data-driven first-fit init were measured outcome-neutral or
        worse and removed (records `fit_schedule_ab`,
        `data_init_first_fit_ab`; git history has the code)."""
        boundaries = {int(f * training_iter): 0.1
                      for f in (0.3, 0.6, 0.8, 0.9)}
        sched = optax.piecewise_constant_schedule(lr, boundaries)
        opt = optax.chain(optax.scale_by_adam(),
                          optax.scale_by_schedule(sched),
                          optax.scale(-1.0))
        loss = lambda p: -self.mll(p, data)

        def step(carry, _):
            p, opt_state = carry
            lval, g = jax.value_and_grad(loss)(p)
            updates, opt_new = opt.update(g, opt_state, p)
            p_new = optax.apply_updates(p, updates)
            p_new = jax.tree.map(lambda a: jnp.clip(a, -60.0, 60.0), p_new)
            # reject non-finite steps (the reference NaN-asserts and dies,
            # control_affine_model.py:315-328; inside a scan we skip instead)
            ok = jnp.isfinite(lval)
            for leaf in jax.tree.leaves(g) + jax.tree.leaves(p_new):
                ok = ok & jnp.all(jnp.isfinite(leaf))
            p = jax.tree.map(lambda a, b: jnp.where(ok, a, b), p_new, p)
            opt_state = jax.tree.map(
                lambda a, b: jnp.where(ok, a, b) if hasattr(a, "dtype") else a,
                opt_new, opt_state)
            return (p, opt_state), None

        (params, _), _ = jax.lax.scan(step, (params, opt.init(params)),
                                      None, length=training_iter)
        return params

    # ---------------------------------------------------------- posterior

    def masked_kb(self, params: MVGPParams, data: MVGPData):
        """Masked + jittered Gram.  On the inference path (`use_pallas`),
        a single fused Pallas kernel builds it (ops/gram.py); the MLL fit
        path always uses the XLA expression (it must be differentiable)."""
        if self.use_pallas:
            from ..ops.gram import fused_gram_kb
            LB = psd_chol_small_ladder(params.B, init_jitter=1e-10)
            Xs = data.X / params.lengthscale
            return fused_gram_kb(Xs, data.UH @ LB, data.mask,
                                 params.outputscale, self.jitter)
        Kb = self.gram_kb(params, data)
        m = data.mask.astype(Kb.dtype)
        eye = jnp.eye(Kb.shape[0], dtype=Kb.dtype)
        return Kb * (m[:, None] * m[None, :]) + eye * (1.0 - m)[:, None]

    def empty_cache(self, capacity: int, dtype=jnp.float64) -> MVGPCache:
        """Closed-form cache for an EMPTY buffer: the masked Gram of an
        all-invalid buffer is exactly the identity, so L = Linv = I and
        alpha = 0.  init_state uses this instead of refresh_cache — the
        batched rollout runner vmaps init over every episode, and a
        (B, K, K) XLA cholesky + triangular solve on an identity Gram
        measured ~0.3 s of pure startup waste per compiled program
        (round-3 profiler trace)."""
        eye = jnp.eye(capacity, dtype=dtype)
        return MVGPCache(L=eye, alpha=jnp.zeros((capacity, self.x_dim),
                                                dtype), Linv=eye)

    def refresh_cache(self, params: MVGPParams, data: MVGPData) -> MVGPCache:
        """Factor the masked Gram and precompute alpha = Kb^{-1} Y and
        Linv = L^{-1} (so the in-scan posterior evals are matmuls).

        The factor AND its inverse come from one `chol_with_inv` call —
        under vmap on TPU f32 that is the blocked Pallas factorization
        kernel (ops/pallas_chol.py, ~12 ms at (256, 200, 200)); XLA's
        batched `cholesky` + `triangular_solve` pair here measured
        ~570 ms per refit event in the round-3 profiler trace (they are
        latency-bound loop kernels).  alpha then comes from two MXU
        matmuls instead of cho_solve.  Robustness: the Gram already
        carries the jitter diagonal; if the single factorization still
        fails (non-finite), ONE in-graph retry at 1e3x jitter is
        selected per batch element — the same trust model as the MLL
        fit's single-factorization + NaN-guard (round-2 design)."""
        from ..ops.cholinv import chol_with_inv
        K = self.masked_kb(params, data)
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        # adaptive scale-aware jitter ladder, 3 factorizations max: the
        # ring-buffer Gram holds consecutive states dt apart and GENUINELY
        # goes f32-indefinite mid-episode (measured min eig -3.3e-4 at
        # diag scale 23 on a real pendulum buffer) — psd_cholesky's
        # 9-rung ladder routinely engaged its 1e-5*scale rung there.  A
        # fixed small retry bump produced a finite-but-garbage posterior
        # (75% alpha error) and collapsed pendulum SOCP feasibility
        # 0.96 -> 0.26 before the on-chip gate caught it (round 3).
        scale = jnp.maximum(jnp.mean(jnp.abs(
            jnp.diagonal(K, axis1=-2, axis2=-1)), axis=-1,
            keepdims=True), 1.0)[..., None]
        # Acceptance = finite AND sane magnitude.  A reservoir parked at
        # a near-equilibrium fills with near-duplicate rows whose Gram is
        # singular past the nugget; the f32 batched factorization kernel
        # can then return FINITE garbage (measured max|Linv| 7.8e29 on 2
        # of 64 flagship pendulum episodes, round-5 forensics) that a
        # finiteness-only ladder accepts and every later posterior/LQR
        # matmul overflows on.  With the nugget >= ~1e-4*scale the true
        # bound is max|Linv| <~ 1/sqrt(lambda_min) ~ 1e2-1e3 (healthy
        # flagship max ~52), so 1e6 (f32; 1e12 f64) cleanly separates
        # garbage and triggers the bumped-jitter retries.
        lim = jnp.asarray(1e6 if K.dtype == jnp.float32 else 1e12, K.dtype)

        def sane(Lk, Linvk):
            return (jnp.all(jnp.isfinite(Lk), axis=(-2, -1), keepdims=True)
                    & jnp.all(jnp.isfinite(Linvk), axis=(-2, -1),
                              keepdims=True)
                    & (jnp.max(jnp.abs(Linvk), axis=(-2, -1),
                               keepdims=True) < lim))

        L, Linv = chol_with_inv(K)
        ok = sane(L, Linv)
        bump1 = jnp.where(ok, 0.0, 1e-5 * scale)
        L2, Linv2 = chol_with_inv(K + bump1 * eye)
        L = jnp.where(ok, L, L2)
        Linv = jnp.where(ok, Linv, Linv2)
        ok2 = sane(L, Linv)
        bump2 = jnp.where(ok2, 0.0, 1e-2 * scale)
        L3, Linv3 = chol_with_inv(K + (bump1 + bump2) * eye)
        L = jnp.where(ok2, L, L3)
        Linv = jnp.where(ok2, Linv, Linv3)
        Y = self.residual_Y(params, data)
        hi = jax.lax.Precision.HIGHEST
        alpha = jnp.matmul(jnp.swapaxes(Linv, -1, -2),
                           jnp.matmul(Linv, Y, precision=hi), precision=hi)
        return MVGPCache(L=L, alpha=alpha, Linv=Linv)

    def cache_append(self, params: MVGPParams, data: MVGPData,
                     cache: MVGPCache, slot) -> MVGPCache:
        """O(K^2) rank-1 Cholesky *append* update.

        New capability vs the reference (BASELINE.md north star): the
        reference can only incorporate data by a full refit
        (clear_cache + O(k^3) re-factorization).  When active rows form a
        prefix [0, slot) and row `slot` was just activated in `data`, the
        masked Gram's factor is the block [[L_a, 0], [l21^T, l22], I...]
        with l21 = L_a^{-1} c and l22 = sqrt(d - |l21|^2) — because
        inactive rows are identity, the fixed-shape triangular solve
        against the old L yields l21 directly.

        Tracking guarantee: the appended factor matches a full
        `refresh_cache` of the same buffer up to the DRIFT of the
        dtype-aware Gram nugget (see `gram_kb`): each append bakes the
        nugget of its own tick into its row, while a refresh applies the
        final nugget uniformly, so rows differ by O(k * eps * dScale)
        amplified by sqrt(cond(Kb)) — ~1e-7 in f64 on a kappa ~ 1e8
        ring-buffer Gram (tests/test_deploy.py pins this bound).
        Posterior-level quantities (alpha, predictive means) agree to
        ~1e-6; schedule a periodic full refit in serving if tighter
        factor parity is needed."""
        Kb = self.masked_kb(params, data)
        c_full = Kb[slot, :] * (jnp.arange(Kb.shape[0]) < slot)
        l21 = cache.Linv @ c_full          # == solve_triangular(L, c)
        d = Kb[slot, slot]
        l22 = jnp.sqrt(jnp.maximum(d - jnp.sum(l21 * l21), self.jitter))
        L = cache.L.at[slot, :].set(l21).at[slot, slot].set(l22)
        # O(K^2) Linv update: for the appended block row [l21^T, l22] the
        # inverse's new row is -(l21^T Linv)/l22 with diagonal 1/l22; all
        # other rows (identity beyond the prefix) are unchanged.
        row = -(l21 @ cache.Linv) / l22
        Linv = cache.Linv.at[slot, :].set(row).at[slot, slot].set(1.0 / l22)
        Y = self.residual_Y(params, data)
        alpha = jax.scipy.linalg.cho_solve((L, True), Y)
        return MVGPCache(L=L, alpha=alpha, Linv=Linv)

    def cache_append_row(self, params: MVGPParams, data: MVGPData,
                         cache: MVGPCache, slot, write) -> MVGPCache:
        """Batched-rollout-friendly `cache_append`: same prefix-append
        factor algebra, but

          (a) only the appended Gram ROW is built (O(K (1+m)) — no
              K x K masked Gram per step),
          (b) alpha comes from two Linv matmuls instead of a
              triangular solve (latency-bound on TPU), and
          (c) all cache writes are ROW-gated on `write` — under vmap a
              caller-side `lax.cond` lowers to a select that copies the
              whole (K, K) cache every step; gating the rows keeps the
              per-step footprint at three (K, K) matvec reads.

        Row-level sanity guard (same bound story as refresh_cache): a
        numerically dependent appended row (Schur complement at the
        jitter floor with an insane inverse row) leaves the cache
        unchanged.  `data` must already carry the new row at `slot`."""
        K = data.X.shape[0]
        dtype = data.X.dtype
        x_s = data.X[slot]
        uh_s = data.UH[slot]
        UHB = data.UH @ params.B                              # (K, 1+m)
        kx = self.k_xx(params, x_s[None], data.X)[0]          # (K,)
        # dtype-aware nugget identical to gram_kb's (diag(Kxx) = scale)
        uBu_diag = jnp.sum(UHB * data.UH, axis=1)
        eps = jnp.finfo(dtype).eps
        scale = jnp.maximum(jnp.mean(jnp.abs(
            params.outputscale * uBu_diag)), 1.0)
        nug = self.jitter + 10.0 * K * eps * scale
        c = (kx * (UHB @ uh_s) * data.mask
             * (jnp.arange(K) < slot))                        # (K,)
        d = params.outputscale * (uh_s @ params.B @ uh_s) + nug
        l21 = cache.Linv @ c
        s2 = jnp.maximum(d - jnp.sum(l21 * l21), self.jitter)
        l22 = jnp.sqrt(s2)
        inv_row = -(l21 @ cache.Linv) / l22
        lim = 1e6 if dtype == jnp.float32 else 1e12
        alim = 1e8 if dtype == jnp.float32 else 1e14
        # alpha by the exact rank-1 (RLS) block-inverse identity instead
        # of two full (K, K) @ (K, n) Linv matmuls: with w = A^{-1} c =
        # Linv^T l21 and Schur s2 = l22^2,
        #   alpha_top    += w (c^T alpha - y_s) / s2
        #   alpha[slot]   = (y_s - c^T alpha) / s2
        # (alpha rows beyond the active prefix are y_row under the
        # identity factor and untouched by the update's zero w there).
        Y = self.residual_Y(params, data)
        w = l21 @ cache.Linv                                  # (K,) = w^T
        gain = (c @ cache.alpha - Y[slot]) / s2               # (n,)
        alpha_cand = cache.alpha + jnp.outer(w, gain)
        alpha_cand = alpha_cand.at[slot].set(-gain)
        # sanity gate over EVERY product (incl. alpha — a |Linv| just
        # under the limit still squares past f32 range in alpha)
        ok = (jnp.all(jnp.isfinite(l21)) & jnp.isfinite(l22)
              & (jnp.max(jnp.abs(inv_row)) < lim)
              & jnp.all(jnp.isfinite(alpha_cand))
              & (jnp.max(jnp.abs(alpha_cand)) < alim))
        wr = ok & write
        Lrow = jnp.where(wr, l21.at[slot].set(l22), cache.L[slot])
        L = cache.L.at[slot].set(Lrow)
        Linv_row = jnp.where(wr, inv_row.at[slot].set(1.0 / l22),
                             cache.Linv[slot])
        Linv = cache.Linv.at[slot].set(Linv_row)
        alpha = jnp.where(wr, alpha_cand, cache.alpha)
        return MVGPCache(L=L, alpha=alpha, Linv=Linv)

    def _kb_star(self, params: MVGPParams, data: MVGPData, Xtest: jax.Array):
        """Cross-covariance block 𝔅(XU, x*): (b, K, 1+m), masked."""
        Kxs = self.k_xx(params, Xtest, data.X)                   # (b, K)
        UB = (data.UH @ params.B) * data.mask[:, None]           # (K, 1+m)
        return Kxs[:, :, None] * UB[None, :, :]

    def predict_matrix(self, params: MVGPParams, data: MVGPData,
                       cache: MVGPCache, Xtest: jax.Array,
                       Xtestp: Optional[jax.Array] = None,
                       compute_cov: bool = True):
        """Posterior of F at test states.

        Returns (meanFT, A, Bk) with meanFT (b, n, 1+m) = posterior mean of
        F^T, A (n, n) the output-dim task covariance, and Bk
        (b, b', 1+m, 1+m) the posterior row covariance:
            cov(vec F(x_i), vec F(x_j)) = Bk[i, j] kron A.
        Parity: bayes_cbf/control_affine_model.py:983-1091
        (_custom_predict_matrix), same O(k^2 b (1+m)) solve structure.
        """
        Xtestp_ = Xtest if Xtestp is None else Xtestp
        b = Xtest.shape[0]
        mh = 1 + self.u_dim
        A = params.A
        meanFT = jnp.broadcast_to(params.mean_M.T[None],
                                  (b, self.x_dim, mh))
        kb_star = self._kb_star(params, data, Xtest)             # (b, K, 1+m)
        # mean: M^T + Y^T Kb^{-1} kb_star = M^T + alpha^T kb_star
        meanFT = meanFT + jnp.einsum('kn,bkj->bnj', cache.alpha, kb_star)
        if not compute_cov:
            bp = Xtestp_.shape[0]
            return meanFT, A, jnp.zeros((b, bp, mh, mh), dtype=Xtest.dtype)
        kb_starp = (kb_star if Xtestp is None
                    else self._kb_star(params, data, Xtestp_))
        Kss = self.k_xx(params, Xtest, Xtestp_)                  # (b, b')
        prior = Kss[:, :, None, None] * params.B[None, None]     # (b,b',1+m,1+m)
        Kinv_kbp = jax.scipy.linalg.cho_solve(
            (cache.L, True),
            kb_starp.transpose(1, 0, 2).reshape(cache.L.shape[0], -1))
        bp = Xtestp_.shape[0]
        Kinv_kbp = Kinv_kbp.reshape(-1, bp, mh)                  # (K, b', 1+m)
        cross = jnp.einsum('bki,kcj->bcij', kb_star, Kinv_kbp)
        Bk = prior - cross
        return meanFT, A, Bk

    def predict_fullmat(self, params: MVGPParams, data: MVGPData,
                        cache: MVGPCache, Xtest: jax.Array):
        """Flattened posterior over vec(F) at a batch of test states.

        Returns (mean (b(1+m)n,), var (b(1+m)n, b(1+m)n)) with var =
        Bk_(b(1+m), b(1+m)) kron A — parity with custom_predict_fullmat
        (bayes_cbf/control_affine_model.py:963-977), the speed-test metric.
        """
        meanFT, A, Bk = self.predict_matrix(params, data, cache, Xtest)
        b = Xtest.shape[0]
        mh = 1 + self.u_dim
        # (b, b, 1+m, 1+m) -> (b(1+m), b(1+m))
        BkXX = Bk.transpose(0, 2, 1, 3).reshape(b * mh, b * mh)
        BkXX = 0.5 * (BkXX + BkXX.T)
        var = kron(BkXX, A)
        mean = meanFT.transpose(0, 2, 1).reshape(-1)  # (b, 1+m, n) flat
        return mean, var

    # ------------------------------------------------- pointwise functions
    # Single-state closed forms used by the GP-algebra layer and controllers.
    # All are differentiable in x (needed by GradientGP for rel-deg-2 CBCs).

    def fT_post(self, params, data, cache, x):
        """Posterior mean of F^T(x): (n, 1+m) for a single state x."""
        kb = self._kb_star(params, data, x[None])[0]             # (K, 1+m)
        return params.mean_M.T + jnp.einsum('kn,kj->nj', cache.alpha, kb)

    def Bk_single(self, params, data, cache, x, xp):
        """Posterior row covariance Bk(x, x'): (1+m, 1+m), single states.

        Uses the cached L^{-1} so the in-scan evaluation is two (K, K) @
        (K, 1+m) matmuls (MXU) instead of a latency-bound triangular solve
        per control step."""
        kb = self._kb_star(params, data, x[None])[0]
        kbp = self._kb_star(params, data, xp[None])[0]
        prior = self.k_xx_single(params, x, xp) * params.B
        # plain XLA matmuls: in-program XLA keeps the loop-invariant Linv
        # cache VMEM-resident across scan steps, which a streaming Pallas
        # kernel measurably cannot beat (round-3 negative result — the
        # removed ops/pallas_linvmul kernel won standalone, lost
        # ~0.14 ms/step in-program by breaking the moment-chain fusion)
        vb = cache.Linv @ kb
        vbp = vb if xp is x else cache.Linv @ kbp
        return prior - vb.T @ vbp

    def fu_mean(self, params, data, cache, u, x):
        """mean of F(x)^T [1;u]: (n,)."""
        uh = jnp.concatenate([jnp.ones((1,), dtype=u.dtype), u])
        return self.fT_post(params, data, cache, x) @ uh

    def fu_knl(self, params, data, cache, u, x, xp):
        """cov(F(x)^T uh, F(x')^T uh) = (uh^T Bk uh) A : (n, n)."""
        uh = jnp.concatenate([jnp.ones((1,), dtype=u.dtype), u])
        s = uh @ self.Bk_single(params, data, cache, x, xp) @ uh
        return s * params.A

    def f_mean(self, params, data, cache, x):
        """posterior mean of f(x) = F(x)^T e0: (n,)."""
        return self.fT_post(params, data, cache, x)[:, 0]

    def f_knl(self, params, data, cache, x, xp):
        """cov(f(x), f(x')) = Bk[0,0] A."""
        return self.Bk_single(params, data, cache, x, xp)[0, 0] * params.A

    def g_mean(self, params, data, cache, x):
        """posterior mean of g(x) = F(x)^T[:, 1:]: (n, m)."""
        return self.fT_post(params, data, cache, x)[:, 1:]

    def covar_fu_f(self, params, data, cache, u, x, xp):
        """cross covariance cov(F(x)^T uh, f(x')) = (uh^T Bk e0) A.

        Parity: the registered covariance between the Fu GP and the f GP
        (bayes_cbf/control_affine_model.py:797, covar_fu_f)."""
        uh = jnp.concatenate([jnp.ones((1,), dtype=u.dtype), u])
        s = (uh @ self.Bk_single(params, data, cache, x, xp))[0]
        return s * params.A


def make_mvgp(x_dim: int, u_dim: int, **kw) -> MVGP:
    """Full-rank MVGP (reference ControlAffineRegressorExact)."""
    return MVGP(x_dim, u_dim, rank_A=x_dim, rank_B=1 + u_dim, **kw)


def make_mvgp_rank1(x_dim: int, u_dim: int, **kw) -> MVGP:
    """Rank-1 task factors + near-flat Gamma lengthscale prior
    (reference ControlAffineRegressorExactRankOne, the flagship default)."""
    kw.setdefault("gamma_prior", (1e-3, 1e-3))
    return MVGP(x_dim, u_dim, rank_A=1, rank_B=1, **kw)


def make_mvgp_diag(x_dim: int, u_dim: int, **kw) -> MVGP:
    """Diagonal task covariances (reference ControlAffineRegMatrixDiag)."""
    return MVGP(x_dim, u_dim, rank_A=0, rank_B=0, **kw)
