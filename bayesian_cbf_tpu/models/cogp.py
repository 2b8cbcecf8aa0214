"""Coregionalization (vector-variate) GP baseline — the CoGP of the paper.

Reference: ControlAffineRegressorVector / ControlAffineVectorGP
(bayes_cbf/control_affine_model.py:1106-1331).  Instead of the Kronecker
A/B structure of the MVGP, the CoGP places one dense task covariance
Sigma in R^{(1+m)n x (1+m)n} over vec(F):

    vec F(x) ~ GP( vec M, k(x,x') * Sigma )

An observation y_i = F(x_i)^T uh_i projects with H_i = uh_i^T kron I_n, so
the training Gram is the kn x kn matrix

    G[(i,a),(j,c)] = k(x_i,x_j) * (H_i Sigma H_j^T)[a,c]

with documented complexity O(k^3 n^3) (control_affine_model.py:1236-1243) —
this is the slow baseline the MVGP's O(k^3) beats in the speed benchmark.

vec ordering matches the reference's fullmat layout: index p = r*n + a for
row (control channel) r and output dim a, i.e. (b, 1+m, n) flattened.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.linalg import masked_cholesky, psd_cholesky
from .mvgp import MVGPData, _softplus, _inv_softplus, _SQRT2PI_LOG


class CoGPParams(NamedTuple):
    raw_lengthscale: jax.Array   # (x_dim,) ARD RBF
    raw_outputscale: jax.Array   # ()
    raw_linscale: jax.Array      # () linear-kernel variance
    W_S: jax.Array               # ((1+m)n, rank)
    raw_vS: jax.Array            # ((1+m)n,)
    mean_M: jax.Array            # (1+m, n)

    @property
    def lengthscale(self):
        return _softplus(self.raw_lengthscale)

    @property
    def outputscale(self):
        return _softplus(self.raw_outputscale)

    @property
    def linscale(self):
        return _softplus(self.raw_linscale)

    @property
    def Sigma(self):
        return self.W_S @ self.W_S.T + jnp.diag(_softplus(self.raw_vS))


class CoGPCache(NamedTuple):
    L: jax.Array       # (K*n, K*n)
    alpha: jax.Array   # (K*n,) = G^{-1} vec(Y)


class CoGP(NamedTuple):
    x_dim: int
    u_dim: int
    rank: int
    jitter: float = 1e-6

    @property
    def tasks(self):
        return (1 + self.u_dim) * self.x_dim

    def init_params(self, key, dtype=jnp.float64) -> CoGPParams:
        raw1 = _inv_softplus(1.0)
        t = self.tasks
        return CoGPParams(
            raw_lengthscale=jnp.full((self.x_dim,), raw1, dtype=dtype),
            raw_outputscale=jnp.asarray(raw1, dtype=dtype),
            raw_linscale=jnp.asarray(_inv_softplus(0.1), dtype=dtype),
            W_S=0.3 * jax.random.normal(key, (t, self.rank), dtype=dtype),
            raw_vS=jnp.full((t,), raw1, dtype=dtype),
            mean_M=jnp.zeros((1 + self.u_dim, self.x_dim), dtype=dtype),
        )

    def make_data(self, X, U, Xdot) -> MVGPData:
        X = jnp.asarray(X)
        ones = jnp.ones((X.shape[0], 1), dtype=X.dtype)
        return MVGPData(X=X, UH=jnp.concatenate([ones, jnp.asarray(U)], -1),
                        Xdot=jnp.asarray(Xdot),
                        mask=jnp.ones((X.shape[0],), dtype=X.dtype))

    # ------------------------------------------------------------ kernel

    def k_xx(self, params, X1, X2):
        ell = params.lengthscale
        d = (X1[:, None, :] - X2[None, :, :]) / ell
        rbf = params.outputscale * jnp.exp(-0.5 * jnp.sum(d * d, -1))
        lin = params.linscale * (X1 @ X2.T)
        return rbf + lin

    def _HSH(self, params, UH1, UH2):
        """(k1, k2, n, n) blocks H_i Sigma H_j^T.

        Sigma reshaped to (1+m, n, 1+m, n);  H_i Sigma H_j^T =
        sum_{r,s} uh1_r uh2_s Sigma[r, :, s, :]."""
        n, mh = self.x_dim, 1 + self.u_dim
        S = params.Sigma.reshape(mh, n, mh, n)
        return jnp.einsum('ir,rasc,js->ijac', UH1, S, UH2)

    def gram(self, params, data: MVGPData):
        """Masked (K*n, K*n) Gram."""
        K = data.X.shape[0]
        n = self.x_dim
        Kxx = self.k_xx(params, data.X, data.X)
        blocks = self._HSH(params, data.UH, data.UH)          # (K,K,n,n)
        G = (Kxx[:, :, None, None] * blocks).transpose(0, 2, 1, 3)
        G = G.reshape(K * n, K * n)
        return G + self.jitter * jnp.eye(K * n, dtype=G.dtype)

    def residual_Y(self, params, data: MVGPData):
        MX = data.UH @ params.mean_M
        return (data.Xdot - MX) * data.mask[:, None]

    def _scalar_mask(self, data: MVGPData):
        return jnp.repeat(data.mask, self.x_dim)

    # ------------------------------------------------------------ MLL

    def mll(self, params, data: MVGPData):
        y = self.residual_Y(params, data).reshape(-1)
        smask = self._scalar_mask(data)
        _, L = masked_cholesky(self.gram(params, data), smask,
                               init_jitter=self.jitter)
        Kinv_y = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        quad = jnp.sum(Kinv_y * Kinv_y)
        tiny = jnp.asarray(1e-20, L.dtype)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.diagonal(L), tiny)))
        cnt = jnp.sum(smask)
        ll = -0.5 * (quad + logdet + cnt * _SQRT2PI_LOG)
        return ll / jnp.maximum(cnt, 1.0)

    def fit(self, params, data: MVGPData, training_iter=50, lr=0.1):
        boundaries = {int(f * training_iter): 0.1 for f in (0.3, 0.6, 0.8, 0.9)}
        sched = optax.piecewise_constant_schedule(lr, boundaries)
        opt = optax.chain(optax.scale_by_adam(),
                          optax.scale_by_schedule(sched), optax.scale(-1.0))
        loss = lambda p: -self.mll(p, data)

        def step(carry, _):
            p, st = carry
            lval, g = jax.value_and_grad(loss)(p)
            u, st_new = opt.update(g, st, p)
            p_new = jax.tree.map(lambda a: jnp.clip(a, -60.0, 60.0),
                                 optax.apply_updates(p, u))
            ok = jnp.isfinite(lval)
            for leaf in jax.tree.leaves(g) + jax.tree.leaves(p_new):
                ok = ok & jnp.all(jnp.isfinite(leaf))
            p = jax.tree.map(lambda a, b: jnp.where(ok, a, b), p_new, p)
            st = jax.tree.map(
                lambda a, b: jnp.where(ok, a, b) if hasattr(a, "dtype") else a,
                st_new, st)
            return (p, st), None

        (params, _), _ = jax.lax.scan(step, (params, opt.init(params)),
                                      None, length=training_iter)
        return params

    # ------------------------------------------------------------ posterior

    def refresh_cache(self, params, data: MVGPData) -> CoGPCache:
        smask = self._scalar_mask(data)
        _, L = masked_cholesky(self.gram(params, data), smask,
                               init_jitter=self.jitter)
        y = self.residual_Y(params, data).reshape(-1)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
        return CoGPCache(L=L, alpha=alpha)

    def predict_fullmat(self, params, data: MVGPData, cache: CoGPCache,
                        Xtest):
        """(mean (b(1+m)n,), var (b(1+m)n, b(1+m)n)).

        Parity: ControlAffineRegressorVector.custom_predict_fullmat
        (bayes_cbf/control_affine_model.py:1188-1331)."""
        b = Xtest.shape[0]
        n, mh = self.x_dim, 1 + self.u_dim
        K = data.X.shape[0]
        Kxs = self.k_xx(params, Xtest, data.X)                   # (b, K)
        S = params.Sigma.reshape(mh, n, mh, n)
        UHm = data.UH * data.mask[:, None]
        SH = jnp.einsum('rasc,js->rajc', S, UHm)                 # (mh,n,K,n)
        # cross[(b p),(j c)] = Kxs[b,j] * SH[p, j, c]
        cross = (Kxs[:, None, :, None] *
                 SH.reshape(mh * n, K, n)[None]).reshape(b * mh * n, K * n)
        mean = (jnp.broadcast_to(params.mean_M.reshape(-1)[None], (b, mh * n))
                .reshape(-1) + cross @ cache.alpha)
        Kss = self.k_xx(params, Xtest, Xtest)                    # (b, b)
        prior = (Kss[:, None, :, None] *
                 params.Sigma[None, :, None, :]).reshape(b * mh * n,
                                                         b * mh * n)
        solved = jax.scipy.linalg.cho_solve((cache.L, True), cross.T)
        var = prior - cross @ solved
        var = 0.5 * (var + var.T)
        return mean, var


def make_cogp(x_dim: int, u_dim: int, **kw) -> CoGP:
    return CoGP(x_dim, u_dim, rank=(1 + u_dim) * x_dim, **kw)


def make_cogp_diag(x_dim: int, u_dim: int, **kw) -> CoGP:
    return CoGP(x_dim, u_dim, rank=0, **kw)
