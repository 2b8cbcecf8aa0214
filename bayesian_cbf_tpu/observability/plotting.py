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
