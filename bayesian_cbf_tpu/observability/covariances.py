"""L11 — posterior covariance-ellipse analysis figures.

Parity: visualize/unicycle_covariances.py:33-282 in the reference — fit
MVGP and CoGP on unicycle rollout data, take the per-test-point
(1+m)n x (1+m)n posterior covariance blocks, and render 3x3 grids of
3-sigma ellipse projections (Var f, Var g_col1, Var g_col2 on the x-y,
y-theta, theta-x planes) for each model.

TPU-first delta: the experiment phase is jitted batch posterior algebra
(one predict_fullmat per model); only the matplotlib rendering is
host-side.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional

import numpy as np


def unicycle_covariances_exp(max_train: int = 200, numSteps: int = 512,
                             dt: float = 0.01, training_iter: int = 50,
                             seed: int = 0, n_test: int = 4):
    """Fit MVGP (matrix) and CoGP (vector) on a unicycle CLF rollout and
    return per-test-point posterior covariance blocks
    {name: (b, (1+m)n, (1+m)n)} plus the test states
    (unicycle_plot_covariances_exp, visualize/unicycle_covariances.py:33-129)."""
    import jax
    import jax.numpy as jnp
    from ..experiments.pendulum import _block_diag_vars
    from ..experiments.unicycle import make_ackermann_tracking_sim, _run
    from ..models.cogp import make_cogp
    from ..models.mvgp import make_mvgp

    sim = make_ackermann_tracking_sim(numSteps=numSteps, dt=dt,
                                      enable_learning=False, true_L=1.0,
                                      mean_L=1.0)
    out = _run(sim, seed=seed)
    X, U, Xdot = out.X, out.U, out.Xdot

    rng = np.random.default_rng(seed)
    order = rng.permutation(numSteps)
    tr = order[:max_train]
    te = order[max_train:max_train + n_test]
    Xtest = jnp.asarray(np.asarray(X)[te])

    results: Dict[str, np.ndarray] = {}
    for name, maker in (("matrix", make_mvgp), ("vector", make_cogp)):
        gp = maker(3, 2)
        params = gp.init_params(jax.random.PRNGKey(seed))
        data = gp.make_data(X[tr], U[tr], Xdot[tr])
        params = jax.jit(lambda p, d, gp=gp: gp.fit(
            p, d, training_iter=training_iter))(params, data)
        cache = gp.refresh_cache(params, data)
        mean, var = gp.predict_fullmat(params, data, cache, Xtest)
        results[name] = np.asarray(_block_diag_vars(var, Xtest.shape[0]))
    return results, np.asarray(Xtest)


# ---------------------------------------------------------------------------
# rendering (host-side matplotlib)
# ---------------------------------------------------------------------------


def _cov_ellipse(ax, cov, n_std=3.0, scale=1.0):
    """3-sigma ellipse + principal-axis arrows for a 2x2 covariance
    (plot_covariance, visualize/unicycle_covariances.py:215-233)."""
    from matplotlib.patches import Arrow, Ellipse
    eigval, eigvec = np.linalg.eigh(cov)
    width, height = np.sqrt(np.maximum(eigval, 0.0)) * n_std
    angle = math.degrees(math.atan2(eigvec[1, 0], eigvec[0, 0]))
    ax.set_aspect("equal")
    ax.add_patch(Ellipse((0, 0), width, height, angle=angle, fill=False,
                         color="b", linewidth=2 * scale))
    for vec, length in ((eigvec[:, 0], width), (eigvec[:, 1], height)):
        pt = vec * length / 2
        ax.add_patch(Arrow(0, 0, pt[0], pt[1], color="g",
                           width=0.05 * max(width, height)))
    return max(width, height)


def plot_covariance_projections(axes, cov3D, axtitle, scale=1.0):
    """Project a 3x3 covariance onto the x-y, y-theta, theta-x planes
    (visualize/unicycle_covariances.py:235-249)."""
    names = (("x", "y"), ("y", "theta"), ("theta", "x"))
    covs = (cov3D[:2, :2], cov3D[1:, 1:],
            cov3D[np.ix_([2, 0], [2, 0])])
    heights = []
    for ax, axname, cov in zip(axes, names, covs):
        ax.set_title(f"{axtitle} on {axname[0]}-{axname[1]}",
                     fontsize=10 * scale)
        ax.set_xlabel(axname[0])
        ax.set_ylabel(axname[1])
        heights.append(_cov_ellipse(ax, cov, n_std=3.0, scale=scale))
    lim = max(heights) * 1.3 / 2 + 1e-12
    for ax in axes:
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)


def unicycle_covariances_vis(results: Dict[str, np.ndarray],
                             savedir: Optional[str] = None,
                             test_idx: int = 0):
    """Render the MVGP/CoGP 3x3 projection grids
    (unicycle_plot_covariances_vis, visualize/unicycle_covariances.py:252-276).
    Returns the figure paths (or figures if savedir is None)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    out = []
    pretty = {"matrix": "MVGP", "vector": "CoGP"}
    for name, var_blocks in results.items():
        fig, axes = plt.subplots(3, 3, figsize=(7, 7.5), sharey="row")
        fig.suptitle(pretty.get(name, name))
        D = var_blocks.shape[-1]
        n = 3
        for i in range(3):
            cov3D = var_blocks[test_idx, i * n:(i + 1) * n,
                               i * n:(i + 1) * n]
            title = ("Var(f(x))" if i == 0 else f"Var(g(x)[:, {i}])")
            plot_covariance_projections(axes[i, :], cov3D, title)
        fig.tight_layout()
        if savedir is not None:
            import os.path as osp
            path = osp.join(savedir,
                            f"{pretty.get(name, name)}_covariances_proj.png")
            fig.savefig(path, dpi=120)
            plt.close(fig)
            out.append(path)
        else:
            out.append(fig)
    return out
