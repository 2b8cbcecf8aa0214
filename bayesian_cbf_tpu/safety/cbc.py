"""L4 — probabilistic control barrier/Lyapunov condition construction.

Builds the CBC/CLC Gaussian processes from barrier functions and the learned
dynamics GP, extracts their (affine-in-u mean, quadratic-in-u variance)
structure, and converts them to second-order cone constraints

    c^T u + d  >=  rho * || A u + b ||

with rho the Cantelli / Gaussian safety factor for risk delta.

Parity: bayes_cbf/cbc2.py, bayes_cbf/cbc1.py, and the cone conversion
`convert_cbc_terms_to_socp_terms` (bayes_cbf/controllers.py:423-482 and its
twin at unicycle_move_to_pose.py:837-878).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..gp.algebra import DeterministicGP, GradientGP, GP
from ..utils.func import affine_terms, quadratic_terms
from ..utils.linalg import psd_cholesky, psd_chol_small_ladder


def cbc1_safety_factor(delta: float) -> float:
    """Gaussian bound sqrt(2) erfinv(1-2 delta) (bayes_cbf/cbc1.py:10-14)."""
    assert delta < 0.5, "require more than 50% safety"
    from scipy.special import erfinv  # host-side: delta is static config
    factor = math.sqrt(2.0) * float(erfinv(1.0 - 2.0 * delta))
    assert factor > 0
    return factor


def cbc2_safety_factor(delta: float) -> float:
    """Cantelli bound sqrt((1-delta)/delta) (bayes_cbf/cbc2.py:36-40)."""
    assert delta < 0.5
    return math.sqrt((1.0 - delta) / delta)


def cbc2_gp(h, grad_h, f_gp_fn, fu_gp_fn, x_dim: int, k_alpha, u) -> GP:
    """Relative-degree-2 CBC GP:

        CBC2 = L2h + k_alpha[0] * h + k_alpha[1] * L1h
        L1h  = grad_h^T f_gp
        L2h  = grad(L1h)^T (F u)_gp

    Parity: bayes_cbf/cbc2.py:26-33.  `f_gp_fn()` and `fu_gp_fn(u)` return
    LeafGPs with their cross-covariance registered (the model supplies it,
    see MVGP.covar_fu_f)."""
    fu_gp = fu_gp_fn(u)   # called first: builders may pair (f, fu) per u
    f_gp = f_gp_fn()
    h_gp = DeterministicGP(lambda x: jnp.reshape(h(x), (1,)), dim=1, name="h")
    grad_h_gp = DeterministicGP(grad_h, dim=x_dim, name="grad_h")
    L1h = grad_h_gp.t() @ f_gp
    L2h = GradientGP(L1h, x_dim=x_dim).t() @ fu_gp
    return L2h + h_gp * k_alpha[0] + L1h * k_alpha[1]


def cbc2_quadratic_terms(cbc_of_u, x, u0):
    """Extract the u-structure of a CBC GP family.

    cbc_of_u: u -> GP.  Returns ((bfe, e), (V, bfv, v), mean, var) with
      mean(x; u) = bfe^T u + e            (affine in u)
      var(x; u)  = u^T V u + bfv^T u + v  (quadratic in u)

    Parity: bayes_cbf/cbc2.py:7-23 via jax.grad / jacfwd instead of torch
    autograd passes (misc.py:268-285)."""
    mean_fn = lambda u: jnp.reshape(cbc_of_u(u).mean(x), ())
    knl_fn = lambda u: jnp.reshape(cbc_of_u(u).knl(x, x), ())
    bfe, e = affine_terms(mean_fn, u0)
    V, bfv, v = quadratic_terms(knl_fn, u0)
    return (bfe, e), (V, bfv, v), mean_fn(u0), knl_fn(u0)


def cbc2_closed_form_moments(h, grad_h, k_alpha, mder, x, u):
    """(mean, variance) of the relative-degree-2 CBC at (x, u) in CLOSED
    FORM from the posterior moment derivatives
    `mder = (M, dM, Bk, D1, D2, A)` (LearnedShiftInvariantDynamics
    .moment_derivatives).

    Exactly the moments the GP-expression path computes (cbc2_gp +
    DotGP/GradientGP Isserlis algebra), but with the posterior evaluated
    once: under vec F(x) ~ N(vec M^T, Bk kron A),

        L1h       = grad_h^T f,           f = F e0
        G := grad L1h  with  mu_G = Hh mu_f + dmu_f^T g1,
        K_G[a,b]  = D2[a,b,0,0] s + d1[a] (HhAg)[b] + d1[b] (HhAg)[a]
                    + Bk00 (Hh A Hh)[a,b],          s = g1^T A g1
        C := cov(G, F uh) = c1 outer (A g1) + b0u * Hh A,
                    c1[a] = D1[a, 0, :] uh,  b0u = Bk[0] uh
        CBC2 = G^T (F uh) + ka0 h + ka1 L1h   (DotGP exact Isserlis).

    The mean is affine and the variance *exactly* quadratic in uh, so the
    downstream Taylor extraction at u0 is exact.  The same small-negative
    eigenvalue clamp (EPS=2e-3) as GradientGP.knl is applied to K_G.
    Replaces the reference's custom_predict(grad_gp=True) route
    (control_affine_model.py:512-610)."""
    from ..gp.algebra import EPS
    M, dM, Bk, D1, D2, A = mder
    uh = jnp.concatenate([jnp.ones((1,), u.dtype), u])
    g1 = grad_h(x)
    Hh = jax.jacfwd(grad_h)(x)
    Hh = 0.5 * (Hh + Hh.T)

    mu_f = M[:, 0]
    mu_Fu = M @ uh
    dmu_f = dM[:, 0, :]                       # (n, n): d mu_f_i / d x_a
    mu_G = Hh @ mu_f + dmu_f.T @ g1

    s = g1 @ A @ g1
    Ag = A @ g1
    HAg = Hh @ Ag
    HAH = Hh @ A @ Hh
    b00 = Bk[0, 0]
    d1 = D1[:, 0, 0]                          # (n,)
    K_G = (D2[:, :, 0, 0] * s + jnp.outer(d1, HAg) + jnp.outer(HAg, d1)
           + b00 * HAH)
    # PSD repair, parity with GradientGP.knl at x == x'
    Ks = 0.5 * (K_G + K_G.T)
    w, vv = jnp.linalg.eigh(Ks)
    w = jnp.where((w < 0) & (w > -EPS), 0.0, w)
    K_G = (vv * w[None, :]) @ vv.T

    c1 = D1[:, 0, :] @ uh                     # (n,)
    b0u = Bk[0] @ uh
    C = jnp.outer(c1, Ag) + b0u * (Hh @ A)    # cov(G, F uh): (n, n)
    K_Fu = (uh @ Bk @ uh) * A

    mean_L2h = mu_G @ mu_Fu + jnp.trace(C)
    knl_L2h = (mu_G @ K_Fu @ mu_G + mu_Fu @ K_G @ mu_Fu
               + 2.0 * (mu_G @ C @ mu_Fu)
               + jnp.sum(K_G * K_Fu) + jnp.sum(C * C))

    mean_L1h = g1 @ mu_f
    K_L1h = b00 * s
    cov_L2h_L1h = mu_G @ (b0u * Ag) + mu_Fu @ (d1 * s + b00 * HAg)

    ka0, ka1 = k_alpha
    mean = mean_L2h + ka0 * jnp.reshape(h(x), ()) + ka1 * mean_L1h
    var = knl_L2h + ka1 ** 2 * K_L1h + 2.0 * ka1 * cov_L2h_L1h
    return mean, var


def cbc2_closed_form_terms(h, grad_h, k_alpha, mder, x, u0):
    """Same contract as cbc2_quadratic_terms — ((bfe, e), (V, bfv, v),
    mean, var) — but through cbc2_closed_form_moments: the u-autodiff runs
    over small tensor polynomials (the posterior tensors are constants),
    not through the GP posterior."""
    mean_fn = lambda u: cbc2_closed_form_moments(
        h, grad_h, k_alpha, mder, x, u)[0]
    var_fn = lambda u: cbc2_closed_form_moments(
        h, grad_h, k_alpha, mder, x, u)[1]
    bfe, e = affine_terms(mean_fn, u0)
    V, bfv, v = quadratic_terms(var_fn, u0)
    return (bfe, e), (V, bfv, v), mean_fn(u0), var_fn(u0)


def cbc_to_socp_cone(bfe, e, V, bfv, v, extravars: int = 2,
                     relax_col: int = -1):
    """Homogenize the variance quadratic and emit SOC data (A, b, c, d).

    [1, u] Asq [1; u] = u^T V u + bfv^T u + v with
    Asq = [[v, bfv/2], [bfv/2, V]];  Cholesky Asq = L L^T gives
    sqrt(var) = || L^T [1; u] ||, so the chance constraint
        mean - rho * sqrt(var) >= 0
    becomes  bfc^T [u; extras] + d >= rho || A [u; extras] + b ||.

    Layout: the cone matrices act on the stacked variable [u; extras]
    where `extravars` trailing slots hold e.g. [relax, t].  If
    relax_col >= 0, that extra column gets coefficient 1 in bfc (the CLC's
    slack enters linearly, unicycle_move_to_pose.py:948-951).

    Parity: convert_cbc_terms_to_socp_terms (controllers.py:423-482),
    with the jitter-laddered Cholesky replacing the symeig fallback."""
    m = bfe.shape[-1]
    nvar = m + extravars
    dtype = bfe.dtype
    Asq = jnp.concatenate([
        jnp.concatenate([jnp.reshape(v, (1, 1)), 0.5 * bfv[None, :]], 1),
        jnp.concatenate([0.5 * bfv[:, None], V], 1)], 0)
    L = psd_chol_small_ladder(Asq, init_jitter=1e-12)
    Lt = L.T                               # (m+1, m+1)
    A = jnp.zeros((m + 1, nvar), dtype).at[:, :m].set(Lt[:, 1:])
    b = Lt[:, 0]
    bfc = jnp.zeros((nvar,), dtype).at[:m].set(bfe)
    if relax_col >= 0:
        bfc = bfc.at[m + relax_col].set(1.0)
    d = e
    return A, b, bfc, d
