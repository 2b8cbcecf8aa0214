"""L10 — metrics logging, config dump, checkpoint/resume.

The reference's observability is tensorboard event files + config.json,
which double as the experiment checkpoint (SURVEY.md 5.4-5.5).  Here:

  * `MetricsLogger` writes newline-delimited JSON (scalars + small tensors)
    plus a config.json — host-side, fed from device arrays after the jitted
    rollout returns (no per-step host sync inside the scan);
  * `save_checkpoint` / `load_checkpoint` serialize any pytree of jnp
    arrays (MVGP params, buffers, learner state) to .npz — the analogue of
    the reference's state_dict/torch.save protocol
    (control_affine_model.py:201-218,862-874);
  * `replay_run(..., animate=True)` re-renders a logged run to an
    animation from metrics.jsonl + config.json — playback_logfile parity
    (unicycle_move_to_pose.py:1421-1452).
"""
from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(v):
    if hasattr(v, "shape"):
        a = np.asarray(v)
        return a.item() if a.ndim == 0 else a.tolist()
    return v


class MetricsLogger:
    """JSONL scalar/tensor logger with config dump and replay loading.

    Run directory layout (parity with the reference's
    data/runs/<tags>_<version> + config.json, unicycle_move_to_pose.py:
    1740-1778): <runs_dir>/<exp_tags joined>_<stamp>/{config.json,
    metrics.jsonl}."""

    def __init__(self, runs_dir="data/runs", exp_tags=(), config=None,
                 stamp: Optional[str] = None, backend: str = "jsonl"):
        """backend="jsonl" (default, human-readable), "binary" — the
        native fastlog writer (observability/fastlog.py): same channel
        set, ~binary-frame speed for big batched rollouts — or
        "tensorboard": tfevents files the reference's own loaders /
        tensorboard consume directly (observability/tbwriter.py; the
        reference's artifact format, misc.py:320-405)."""
        stamp = stamp or time.strftime("%Y%m%d-%H%M%S")
        name = "_".join(list(exp_tags) + [stamp])
        self.dir = osp.join(runs_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.backend = backend
        self._fl = None
        self._tb = None
        if backend == "binary":
            from .fastlog import FastLogWriter
            self._fl = FastLogWriter(osp.join(self.dir, "metrics.flog"))
            self._fh = None
        elif backend == "tensorboard":
            from .tbwriter import TensorboardWriter
            self._tb = TensorboardWriter(self.dir)
            self._fh = None
        else:
            self._fh = open(osp.join(self.dir, "metrics.jsonl"), "a")
        if config is not None:
            self.dump_config(config)

    def dump_config(self, config: Dict[str, Any]):
        """Write (or merge into) the run's config.json.  Every dump is
        stamped with the package version (+ git describe when run from a
        checkout) — the reference version-stamps artifacts the same way
        (bayes_cbf/__init__.py:1-7 git-describe version, run dirs
        data/runs/<tags>_<gitversion>, misc.py:362-405)."""
        path = osp.join(self.dir, "config.json")
        merged = {}
        if osp.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged.setdefault("_version", version_stamp())
        merged.update(jax.tree.map(_to_host, config))
        with open(path, "w") as f:
            json.dump(merged, f, indent=1, skipkeys=True, default=str)

    def add_scalar(self, tag, value, step):
        if self._fl is not None:
            self._fl.write(tag, step, value)
            return
        if self._tb is not None:
            v = np.asarray(_to_host(value))
            if v.ndim == 0:
                self._tb.add_scalar(tag, v, step)
            else:
                self._tb.add_tensor(tag, v, step)
            return
        self._fh.write(json.dumps(
            {"tag": tag, "step": int(step), "value": _to_host(value)}) + "\n")

    def add_tensor(self, tag, value, step):
        self.add_scalar(tag, value, step)

    def add_rows(self, tag, values, every: int = 1):
        """Bulk-log a whole (T, ...) channel (row t -> step t*every).  On
        the binary backend this is ONE native call for the channel."""
        a = np.asarray(values)
        if self._fl is not None:
            self._fl.write_rows(tag, a[::every], step0=0, stride=every)
            return
        for t in range(0, a.shape[0], every):
            self.add_tensor(tag, a[t], t)

    def log_rollout(self, outs, every: int = 1, sim=None):
        """Dump a RolloutOutputs pytree as per-step records (the reference's
        Logger.setStateCtrl channel set, unicycle_move_to_pose.py:1288-1311,
        plus the vis/knl_* hyperparameter channels of :970-992).

        With `sim`, the experiment geometry (obstacles, goal, dt) and the
        per-step plan are logged too so `replay_run(animate=True)` can
        re-render the full scene from the log alone."""
        X = np.asarray(outs.X)
        U = np.asarray(outs.U)
        self.add_rows("vis/state", X, every)
        self.add_rows("vis/uopt", U, every)
        info = outs.info
        chans = [("opt/rho", info.rho), ("opt/relax", info.relax),
                 ("opt/value", info.pcost),
                 ("opt/feasible", info.feasible),
                 ("vis/clc_mean", info.clc_mean),
                 ("vis/cbc_mean", info.cbc_means),
                 ("vis/cbc_var", info.cbc_vars)]
        knl = getattr(outs, "knl", None)
        if knl is not None:
            chans += [("vis/knl_lengthscale", knl.lengthscale),
                      ("vis/knl_scalefactor", knl.outputscale),
                      ("vis/knl_A", knl.A), ("vis/knl_B", knl.B),
                      ("vis/Fx_var", knl.Fx_var),
                      ("vis/Fxu_var", knl.Fxu_var)]
        for tag, arr in chans:
            self.add_rows(tag, np.asarray(arr), every)
        if sim is not None:
            import jax.numpy as jnp
            geom = {
                "obstacles": [{"center": np.asarray(c.center).tolist(),
                               "radius": float(c.radius)}
                              for c in sim.cbfs],
                "dt": float(sim.dt), "numSteps": int(sim.numSteps),
            }
            planner = getattr(sim, "planner", None)
            if planner is not None:
                plan = np.asarray(jax.vmap(planner.plan)(
                    jnp.arange(X.shape[0])))
                geom["goal"] = plan[-1].tolist()
                self.add_rows("vis/plan_x", plan[:X.shape[0]], every)
            self.dump_config(geom)
        self.flush()

    def flush(self):
        (self._fl or self._tb or self._fh).flush()

    def close(self):
        (self._fl or self._tb or self._fh).close()


def version_stamp() -> str:
    """Package version, refined with `git describe` when running from a
    checkout (bayes_cbf/__init__.py:1-7 parity)."""
    from .. import __version__
    try:
        import subprocess
        desc = subprocess.run(
            ["git", "describe", "--always", "--dirty"],
            cwd=osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
            capture_output=True, text=True, timeout=5)
        if desc.returncode == 0 and desc.stdout.strip():
            return "%s+g%s" % (__version__, desc.stdout.strip())
    except Exception:
        pass
    return __version__


def filter_runs(runs_dir, predicate=None, newest_first=True):
    """Find logged run directories under `runs_dir`, newest first,
    optionally filtered by a predicate over their config.json — the
    analogue of filter_log_files (unicycle_move_to_pose.py:1380-1396),
    which locates the latest event file matching a config condition.

    >>> latest = filter_runs("data/runs",
    ...                      lambda c: c.get("name") == "bayes")[0]
    """
    hits = []
    if not osp.isdir(runs_dir):
        return hits
    for name in os.listdir(runs_dir):
        d = osp.join(runs_dir, name)
        has_log = osp.isdir(d) and (
            osp.exists(osp.join(d, "metrics.jsonl"))
            or osp.exists(osp.join(d, "metrics.flog"))
            or any("tfevents" in f for f in os.listdir(d)))
        if not has_log:
            continue
        cfg = {}
        cfg_path = osp.join(d, "config.json")
        if osp.exists(cfg_path):
            try:
                with open(cfg_path) as f:
                    cfg = json.load(f)
            except json.JSONDecodeError:
                pass
        if predicate is None or predicate(cfg):
            hits.append((osp.getmtime(d), d))
    hits.sort(reverse=newest_first)
    return [d for _, d in hits]


def _is_tfevents_dir(path):
    return (osp.isdir(path)
            and not osp.exists(osp.join(path, "metrics.jsonl"))
            and not osp.exists(osp.join(path, "metrics.flog"))
            and any("tfevents" in f for f in os.listdir(path)))


def load_metrics(path):
    """Stream a metrics.jsonl (or binary metrics.flog) back, grouped by
    tag (the analogue of load_tensorboard_scalars, misc.py:343-359).

    A run dir logged with the `tensorboard` backend (only tfevents files,
    no jsonl/flog) is auto-detected and read through
    tbwriter.load_tensorboard_scalars, so replay_run works on any backend
    — the reference replays straight from event files
    (unicycle_move_to_pose.py:1421-1452)."""
    grouped: Dict[str, list] = {}
    if _is_tfevents_dir(path):
        from .tbwriter import load_tensorboard_scalars
        return load_tensorboard_scalars(path)
    if path.endswith(".flog") or (not path.endswith(".jsonl")
                                  and osp.exists(osp.join(path,
                                                          "metrics.flog"))):
        from .fastlog import read_fastlog
        fp = path if path.endswith(".flog") else osp.join(path,
                                                          "metrics.flog")
        for tag, (steps, values) in read_fastlog(fp).items():
            vlist = list(values) if not isinstance(values, list) else values
            grouped[tag] = [
                (int(s), v.item() if v.size == 1 else v.tolist())
                for s, v in zip(steps, vlist)]
        return grouped
    with open(path if path.endswith(".jsonl")
              else osp.join(path, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            grouped.setdefault(rec["tag"], []).append(
                (rec["step"], rec["value"]))
    return grouped


def replay_run(run_dir, savefile=None, animate=False, fps=25,
               frame_stride=4):
    """Reconstruct a logged run — the analogue of playback_logfile
    (unicycle_move_to_pose.py:1421-1452), which rebuilds the animation from
    the event files + config.json.

    animate=False: static trajectory PNG (returns the axis).
    animate=True : re-render the run as an animation (trajectory trace,
    vehicle pose, obstacles, plan target, Fx-variance halo) and save it to
    `savefile` (.gif via pillow; .mp4 if an ffmpeg writer is available).
    Returns the output path."""
    grouped = load_metrics(run_dir)
    X = np.asarray([v for _, v in sorted(grouped["vis/state"])])
    cfg = {}
    cfg_path = osp.join(run_dir, "config.json")
    if osp.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    obstacles = cfg.get("obstacles", [])
    goal = cfg.get("goal")
    plan = (np.asarray([v for _, v in sorted(grouped["vis/plan_x"])])
            if "vis/plan_x" in grouped else None)
    fx_var = (np.asarray([v for _, v in sorted(grouped["vis/Fx_var"])])
              if "vis/Fx_var" in grouped else None)

    if not animate:
        class _Out:
            pass

        out = _Out()
        out.X = X
        from .plotting import plot_unicycle_run

        class _Circ:
            def __init__(self, c, r):
                self.center = np.asarray(c)
                self.radius = r

        cbfs = [_Circ(o["center"], o["radius"]) for o in obstacles]
        return plot_unicycle_run(out, cbfs=cbfs, x_goal=goal,
                                 title=cfg.get("name", "replay"),
                                 savefile=savefile)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    fig, ax = plt.subplots(figsize=(4.5, 4.5))
    for o in obstacles:
        ax.add_patch(plt.Circle(o["center"], o["radius"], color="k",
                                alpha=0.3))
    if goal is not None:
        ax.plot(goal[0], goal[1], "r*", ms=12)
    pad = 0.5
    ax.set_xlim(X[:, 0].min() - pad, X[:, 0].max() + pad)
    ax.set_ylim(X[:, 1].min() - pad, X[:, 1].max() + pad)
    ax.set_aspect("equal")
    trace, = ax.plot([], [], "b-", lw=1.2)
    body, = ax.plot([], [], "bo", ms=5)
    heading, = ax.plot([], [], "b-", lw=2)
    plan_pt, = ax.plot([], [], "g+", ms=9)
    halo = plt.Circle((0, 0), 0.0, color="c", alpha=0.25)
    ax.add_patch(halo)
    title = ax.set_title("")

    frames = range(1, X.shape[0], frame_stride)

    def draw(t):
        trace.set_data(X[:t, 0], X[:t, 1])
        body.set_data([X[t - 1, 0]], [X[t - 1, 1]])
        th = X[t - 1, 2]
        L = 0.25
        heading.set_data([X[t - 1, 0], X[t - 1, 0] + L * np.cos(th)],
                         [X[t - 1, 1], X[t - 1, 1] + L * np.sin(th)])
        if plan is not None and t - 1 < plan.shape[0]:
            plan_pt.set_data([plan[t - 1, 0]], [plan[t - 1, 1]])
        if fx_var is not None and t - 1 < fx_var.shape[0]:
            halo.center = (X[t - 1, 0], X[t - 1, 1])
            halo.radius = float(np.sqrt(max(fx_var[t - 1], 0.0)) * 0.05)
        title.set_text("step %d" % (t - 1))
        return trace, body, heading, plan_pt, halo

    ani = animation.FuncAnimation(fig, draw, frames=frames, blit=False)
    if savefile is None:
        savefile = osp.join(run_dir, "animation.gif")
    if savefile.endswith(".mp4") and animation.writers.is_available("ffmpeg"):
        ani.save(savefile, writer="ffmpeg", fps=fps)
    else:
        if savefile.endswith(".mp4"):
            savefile = savefile[:-4] + ".gif"
        ani.save(savefile, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return savefile


# -- checkpointing -----------------------------------------------------------

def save_checkpoint(path: str, pytree) -> None:
    """Serialize a pytree of arrays to one .npz + a structure file.

    The sidecar `<path>.tree` is a JSON manifest recording the treedef
    string, per-leaf shapes/dtypes, and the package version; it is
    VALIDATED on load — the analogue of the reference's state_dict
    protocol guarantees (control_affine_model.py:862-874)."""
    leaves, treedef = jax.tree.flatten(pytree)
    arrs = [np.asarray(l) for l in leaves]
    np.savez(path, *arrs)
    manifest = {
        "version": version_stamp(),
        "treedef": str(treedef),
        "shapes": [list(a.shape) for a in arrs],
        "dtypes": [str(a.dtype) for a in arrs],
    }
    with open(path + ".tree", "w") as f:
        json.dump(manifest, f, indent=1)


def load_checkpoint(path: str, like, strict: bool = True):
    """Restore arrays into the structure of `like` (same pytree shape).

    Validates the stored manifest (treedef + leaf shapes) against both
    the archive and `like` before unflattening; a mismatched checkpoint
    raises ValueError with the offending structure instead of silently
    reshaping into the wrong pytree.  strict=False skips the treedef
    string comparison (shape/count checks still apply) for restoring
    into a structurally-compatible but differently-typed container."""
    base = path[:-4] if path.endswith(".npz") else path
    data = np.load(base + ".npz")
    leaves = [data[k] for k in sorted(data.files,
                                      key=lambda s: int(s.split("_")[1]))]
    like_leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != len(like_leaves):
        raise ValueError(
            "checkpoint %s holds %d leaves but the target structure has "
            "%d — wrong checkpoint for this pytree"
            % (path, len(leaves), len(like_leaves)))
    manifest = None
    if osp.exists(base + ".tree"):
        with open(base + ".tree") as f:
            raw = f.read()
        try:
            manifest = json.loads(raw)
        except json.JSONDecodeError:
            manifest = None     # legacy str(treedef)-only sidecar
    if manifest is not None:
        shapes = [tuple(s) for s in manifest.get("shapes", [])]
        got = [tuple(a.shape) for a in leaves]
        if shapes and shapes != got:
            raise ValueError(
                "checkpoint %s: archive leaf shapes %s disagree with its "
                "own manifest %s — corrupt or mixed checkpoint files"
                % (path, got, shapes))
        if strict and manifest.get("treedef") not in (None, str(treedef)):
            raise ValueError(
                "checkpoint %s was saved for pytree structure\n  %s\n"
                "but the target structure is\n  %s\n(saved by version %s; "
                "pass strict=False to restore by position anyway)"
                % (path, manifest.get("treedef"), str(treedef),
                   manifest.get("version", "?")))
    for i, (a, want) in enumerate(zip(leaves, like_leaves)):
        w = np.shape(want)
        if tuple(a.shape) != tuple(w):
            raise ValueError(
                "checkpoint %s: leaf %d has shape %s but the target "
                "expects %s" % (path, i, tuple(a.shape), tuple(w)))
    import jax.numpy as jnp
    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])
