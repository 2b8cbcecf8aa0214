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
  * optional tensorboard export if the `tensorboard` package is present.
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
                 stamp: Optional[str] = None):
        stamp = stamp or time.strftime("%Y%m%d-%H%M%S")
        name = "_".join(list(exp_tags) + [stamp])
        self.dir = osp.join(runs_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self._fh = open(osp.join(self.dir, "metrics.jsonl"), "a")
        if config is not None:
            self.dump_config(config)

    def dump_config(self, config: Dict[str, Any]):
        with open(osp.join(self.dir, "config.json"), "w") as f:
            json.dump(jax.tree.map(_to_host, config), f, indent=1,
                      skipkeys=True, default=str)

    def add_scalar(self, tag, value, step):
        self._fh.write(json.dumps(
            {"tag": tag, "step": int(step), "value": _to_host(value)}) + "\n")

    def add_tensor(self, tag, value, step):
        self.add_scalar(tag, value, step)

    def log_rollout(self, outs, every: int = 1):
        """Dump a RolloutOutputs pytree as per-step records (the reference's
        Logger.setStateCtrl channel set, unicycle_move_to_pose.py:1288-1311)."""
        X = np.asarray(outs.X)
        U = np.asarray(outs.U)
        for t in range(0, X.shape[0], every):
            self.add_tensor("vis/state", X[t], t)
            self.add_tensor("vis/uopt", U[t], t)
        info = outs.info
        for tag, arr in [("opt/rho", info.rho), ("opt/relax", info.relax),
                         ("opt/value", info.pcost),
                         ("opt/feasible", info.feasible),
                         ("vis/clc_mean", info.clc_mean),
                         ("vis/cbc_mean", info.cbc_means)]:
            a = np.asarray(arr)
            for t in range(0, a.shape[0], every):
                self.add_tensor(tag, a[t], t)
        self._fh.flush()

    def close(self):
        self._fh.close()


def load_metrics(path):
    """Stream a metrics.jsonl back, grouped by tag (the analogue of
    load_tensorboard_scalars, misc.py:343-359)."""
    grouped: Dict[str, list] = {}
    with open(path if path.endswith(".jsonl")
              else osp.join(path, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            grouped.setdefault(rec["tag"], []).append(
                (rec["step"], rec["value"]))
    return grouped


def replay_run(run_dir, savefile=None):
    """Reconstruct the trajectory figure from a logged run — the analogue
    of playback_logfile (unicycle_move_to_pose.py:1421-1452), which rebuilds
    the animation from the event files + config.json."""
    import json as _json
    import numpy as np
    grouped = load_metrics(run_dir)
    X = np.asarray([v for _, v in sorted(grouped["vis/state"])])
    cfg = {}
    cfg_path = osp.join(run_dir, "config.json")
    if osp.exists(cfg_path):
        cfg = _json.load(open(cfg_path))

    class _Out:
        pass

    out = _Out()
    out.X = X
    from .plotting import plot_unicycle_run
    return plot_unicycle_run(out, title=cfg.get("name", "replay"),
                             savefile=savefile)


# -- checkpointing -----------------------------------------------------------

def save_checkpoint(path: str, pytree) -> None:
    """Serialize a pytree of arrays to one .npz + a structure file."""
    leaves, treedef = jax.tree.flatten(pytree)
    np.savez(path, *[np.asarray(l) for l in leaves])
    with open(path + ".tree", "w") as f:
        f.write(str(treedef))


def load_checkpoint(path: str, like):
    """Restore arrays into the structure of `like` (same pytree shape)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [data[k] for k in sorted(data.files,
                                      key=lambda s: int(s.split("_")[1]))]
    _, treedef = jax.tree.flatten(like)
    import jax.numpy as jnp
    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])
