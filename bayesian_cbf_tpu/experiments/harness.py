"""Experiment harness: registry, run directories, config dumps, sweeps.

Parity with the reference's configuration machinery:
  * `unicycle_demo`-style harness — every run gets a directory under
    data/runs/<tags>_<stamp> with a config.json of the resolved keyword
    arguments and the logged rollout channels
    (unicycle_move_to_pose.py:1740-1778, extract_keywords :1544-1552);
  * kwplus-style sweeps — `kwvariations` grid expansion and
    `recpartial`-style dotted-key overrides
    (unicycle_move_to_pose.py:28-30, 1851-1885 `*_mult` drivers).

TPU-first delta: experiments are pure functions returning (sim, rollout
outputs); the harness is a thin host-side shell around them — nothing
here enters the jitted path.
"""
from __future__ import annotations

import itertools
import json
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

from ..observability.logger import MetricsLogger

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def _registry() -> Dict[str, Callable]:
    """Experiments following the (sim, RolloutOutputs) contract — the four
    README experiments (unicycle_move_to_pose.py:1888-2012).  Other demos
    (move_to_pose, pendulum, car) have their own output shapes and are
    exposed through the CLI wrappers (bayesian_cbf_tpu/cli.py) instead."""
    from . import unicycle
    return {
        "unicycle_mean_cbf_collides_obstacle":
            unicycle.unicycle_mean_cbf_collides_obstacle,
        "unicycle_bayes_cbf_safe_obstacle":
            unicycle.unicycle_bayes_cbf_safe_obstacle,
        "unicycle_learning_helps_avoid_getting_stuck":
            unicycle.unicycle_learning_helps_avoid_getting_stuck,
        "unicycle_no_learning_gets_stuck":
            unicycle.unicycle_no_learning_gets_stuck,
    }


def experiment_names() -> List[str]:
    return sorted(_registry())


# ---------------------------------------------------------------------------
# kwplus-style sweeps
# ---------------------------------------------------------------------------


def kwvariations(**axes: Iterable) -> List[Dict[str, Any]]:
    """Grid-expand keyword axes into a list of override dicts
    (kwplus.kwvariations / expand_variations parity).

    >>> kwvariations(a=[1, 2], b=['x'])
    [{'a': 1, 'b': 'x'}, {'a': 2, 'b': 'x'}]
    """
    keys = list(axes)
    return [dict(zip(keys, vals))
            for vals in itertools.product(*(axes[k] for k in keys))]


def apply_overrides(base: Dict[str, Any],
                    overrides: Dict[str, Any]) -> Dict[str, Any]:
    """recpartial-style dotted-key overrides:
    apply_overrides({'controller': {'max_risk': 0.5}},
                    {'controller.max_risk': 0.01}) updates the nested key
    (unicycle_move_to_pose.py recpartial usage at :1925-1928).

    >>> apply_overrides({'a': {'b': 1}, 'c': 2}, {'a.b': 9})['a']['b']
    9
    """
    out = json.loads(json.dumps(base)) if base else {}

    def setpath(d, path, value):
        parts = path.split(".")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = value

    for k, v in overrides.items():
        setpath(out, k, v)
    return out


# ---------------------------------------------------------------------------
# run harness
# ---------------------------------------------------------------------------


def run_experiment(name: str, runs_dir: str = "data/runs",
                   log_every: int = 1, plot: bool = False,
                   animate: bool = False, backend: str = "jsonl",
                   **overrides) -> Tuple[Any, Any, str]:
    """Run a registered experiment with a run directory + config.json +
    logged rollout (unicycle_demo parity).  Returns (sim, out, run_dir).
    backend="binary" logs through the native fastlog writer."""
    fn = _registry()[name]
    logger = MetricsLogger(runs_dir=runs_dir, exp_tags=[name],
                           backend=backend,
                           config={"name": name, **overrides})
    sim, out = fn(**overrides)
    logger.log_rollout(out, every=log_every, sim=sim)
    logger.close()
    if plot or animate:
        from ..observability.logger import replay_run
        if plot:
            replay_run(logger.dir, savefile=logger.dir + "/trajectory.png")
        if animate:
            replay_run(logger.dir, animate=True)
    return sim, out, logger.dir


def run_experiment_mult(name: str, variations: List[Dict[str, Any]],
                        runs_dir: str = "data/runs", **common
                        ) -> List[Tuple[Dict[str, Any], str]]:
    """Run an experiment over a list of override dicts (one run dir each)
    — the `*_mult` sweep drivers (unicycle_move_to_pose.py:1851-1885).
    Returns [(overrides, run_dir), ...]."""
    results = []
    for var in variations:
        kw = dict(common)
        kw.update(var)
        _, _, run_dir = run_experiment(name, runs_dir=runs_dir, **kw)
        results.append((var, run_dir))
    return results
