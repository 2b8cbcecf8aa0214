"""Host-side plotting (optional matplotlib): trajectory + obstacle plots,
covariance ellipses, and the speed-test figure.

Parity: bayes_cbf/plotting.py (draw_ellipse, var_to_scale_theta,
speed_test_matrix_vector_plot) and the Visualizer trajectory rendering
(unicycle_move_to_pose.py:1088-1256).  Pure host-side consumers of rollout
outputs — nothing here touches the device path.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np


def var_to_scale_theta(V):
    """2x2 covariance -> (axis scales, rotation angle)
    (plotting.py:203-212)."""
    w, v = np.linalg.eigh(np.asarray(V))
    theta = math.atan2(v[1, -1], v[0, -1])
    return np.sqrt(np.maximum(w[::-1], 0.0)), theta


def draw_ellipse(ax, V, center, scale=1.0, **kw):
    from matplotlib.patches import Ellipse
    scales, theta = var_to_scale_theta(V)
    e = Ellipse(xy=np.asarray(center), width=2 * scale * scales[0],
                height=2 * scale * scales[1],
                angle=math.degrees(theta), fill=False, **kw)
    ax.add_patch(e)
    return e


def plot_unicycle_run(out, cbfs=None, x_goal=None, ax=None, title=None,
                      savefile: Optional[str] = None):
    """Trajectory + obstacles figure for a RolloutOutputs."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    X = np.asarray(out.X)
    ax.plot(X[:, 0], X[:, 1], "-", lw=1.5, label="trajectory")
    ax.plot(X[0, 0], X[0, 1], "go", label="start")
    if x_goal is not None:
        g = np.asarray(x_goal)
        ax.plot(g[0], g[1], "r*", ms=12, label="goal")
    for cbf in (cbfs or []):
        c = np.asarray(cbf.center)
        circ = plt.Circle(c, float(cbf.radius), color="k", alpha=0.3)
        ax.add_patch(circ)
    ax.set_aspect("equal")
    ax.legend(fontsize=7)
    if title:
        ax.set_title(title)
    if savefile:
        ax.figure.savefig(savefile, bbox_inches="tight", dpi=120)
    return ax


def plot_speed_test(results, savefile: Optional[str] = None):
    """Two-panel (inference time, variance-weighted error) figure over
    max_train, per regressor (plotting.py:219-252)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 3))
    for name, per_k in results.items():
        ks = sorted(per_k)
        ax1.plot(ks, [per_k[k]["elapsed"] for k in ks], "o-", label=name)
        ax2.plot(ks, [per_k[k]["error"] for k in ks], "o-", label=name)
    ax1.set_xlabel("training points k")
    ax1.set_ylabel("inference time (s)")
    ax1.set_yscale("log")
    ax2.set_xlabel("training points k")
    ax2.set_ylabel("variance-weighted error")
    ax1.legend(fontsize=7)
    fig.tight_layout()
    if savefile:
        fig.savefig(savefile, bbox_inches="tight", dpi=120)
    return fig


def plot_learned_dynamics_contours(regressors=("matrix", "vector"),
                                   max_train=120, training_iter=50,
                                   grid=25, seed=0,
                                   savefile: Optional[str] = None):
    """Learned-vs-true pendulum dynamics contour grid — the reference's
    learn-dynamics comparison figure (bayes_cbf/pendulum.py:1108-1240):
    rows = [ground truth, MVGP ("matrix"), CoGP ("vector")], columns =
    [f(x)_1, f(x)_2, g(x)_{1,1}, g(x)_{2,1}] contoured over the
    (theta, omega) plane, training points overlaid, contour levels
    shared column-wise with the ground-truth row."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ..experiments.pendulum import _REGRESSORS, sample_pendulum_data
    from ..models.dynamics import PendulumDynamics

    X, U, Xdot = sample_pendulum_data(numSteps=1024, seed=seed)
    rng = np.random.default_rng(seed)
    tr = rng.permutation(X.shape[0])[:max_train]
    Xn = np.asarray(X)
    th = np.linspace(Xn[:, 0].min(), Xn[:, 0].max(), grid)
    om = np.linspace(Xn[:, 1].min(), Xn[:, 1].max(), grid)
    TH, OM = np.meshgrid(th, om)
    Xtest = jnp.asarray(np.stack([TH, OM], -1).reshape(-1, 2))

    pend = PendulumDynamics()
    # (b, 1+m, n): column blocks [f; g] of F^T
    Ftrue = np.asarray(jax.vmap(lambda x: pend.F_func(x).T)(Xtest))

    rows = [("Ground Truth", Ftrue)]
    for name in regressors:
        gp = _REGRESSORS[name](2, 1)
        params = gp.init_params(jax.random.PRNGKey(seed))
        data = gp.make_data(X[tr], U[tr], Xdot[tr])
        params = jax.jit(lambda p, d: gp.fit(
            p, d, training_iter=training_iter))(params, data)
        cache = gp.refresh_cache(params, data)
        mean, _ = gp.predict_fullmat(params, data, cache, Xtest)
        rows.append((name, np.asarray(mean).reshape(Xtest.shape[0], 2, 2)))

    cols = [("$f(x)_1$", 0, 0), ("$f(x)_2$", 0, 1),
            ("$g(x)_{1,1}$", 1, 0), ("$g(x)_{2,1}$", 1, 1)]
    fig, axs = plt.subplots(len(rows), 4,
                            figsize=(12, 2.6 * len(rows)), squeeze=False)
    # column-shared contour levels over the COMBINED range of all rows:
    # the pendulum's true g columns are constant, so truth-only levels
    # degenerate to machine-noise scales
    levels = []
    for (title, mi, ni) in cols:
        vals = np.concatenate([F[:, mi, ni] for _, F in rows])
        lo, hi = float(vals.min()), float(vals.max())
        if hi - lo < 1e-9:
            lo, hi = lo - 0.5, hi + 0.5
        levels.append(np.linspace(lo, hi, 13))
    for r, (label, F) in enumerate(rows):
        for c, (title, mi, ni) in enumerate(cols):
            Z = F[:, mi, ni].reshape(grid, grid)
            cs = axs[r][c].contourf(TH, OM, Z, levels=levels[c],
                                    cmap="viridis", extend="both")
            if r == 0:
                axs[r][c].set_title(title)
            else:
                axs[r][c].plot(Xn[tr, 0], Xn[tr, 1], "r+", ms=3,
                               linestyle="")
            fig.colorbar(cs, ax=axs[r][c], shrink=0.85)
            axs[r][c].set_xlabel(r"$\theta$")
        axs[r][0].set_ylabel("%s\n$\\omega$" % label)
    fig.tight_layout()
    if savefile:
        fig.savefig(savefile, bbox_inches="tight", dpi=120)
    return fig
