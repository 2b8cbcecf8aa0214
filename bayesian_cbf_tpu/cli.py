"""Console entry points (reference: setup.py:32-40 console_scripts plus
the README's bayes_cbf_unicycle_* run.sh targets).

One umbrella command `bayes-cbf-tpu <experiment> [--set k=v ...]` plus
named per-experiment scripts mirroring the reference's entry-point names.
All experiments run end-to-end on whatever backend JAX selects (TPU when
available); pass --cpu to force the CPU backend with float64.
"""
from __future__ import annotations

import argparse
import ast
import json
import sys


def _force_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def _parse_sets(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main(argv=None):
    from .experiments.harness import (experiment_names, kwvariations,
                                      run_experiment, run_experiment_mult)
    parser = argparse.ArgumentParser(
        prog="bayes-cbf-tpu",
        description="Bayesian-CBF safe-learning-control experiments "
                    "(TPU-native JAX reimplementation of "
                    "wecacuee/Bayesian_CBF)")
    parser.add_argument("experiment", choices=experiment_names())
    parser.add_argument("--set", dest="sets", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="override an experiment keyword (repeatable); "
                             "values parse as Python literals")
    parser.add_argument("--sweep", dest="sweeps", action="append",
                        default=[], metavar="KEY=[v1,v2,...]",
                        help="sweep a keyword over a list of values "
                             "(repeatable; grid product of all sweeps)")
    parser.add_argument("--runs-dir", default="data/runs")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--animate", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend with float64")
    parser.add_argument("--log-backend", choices=("jsonl", "binary"),
                        default="jsonl",
                        help="metrics format: human-readable JSONL or the "
                             "native binary fastlog writer")
    args = parser.parse_args(argv)
    if args.cpu:
        _force_cpu()
    overrides = _parse_sets(args.sets)
    if args.sweeps:
        axes = _parse_sets(args.sweeps)
        variations = kwvariations(**axes)
        results = run_experiment_mult(args.experiment, variations,
                                      runs_dir=args.runs_dir, **overrides)
        for var, run_dir in results:
            print(json.dumps({"overrides": var, "run_dir": run_dir}))
        return 0
    _, out, run_dir = run_experiment(
        args.experiment, runs_dir=args.runs_dir, plot=args.plot,
        animate=args.animate, backend=args.log_backend, **overrides)
    import numpy as np
    print(json.dumps({
        "run_dir": run_dir,
        "feasible_frac": float(np.mean(np.asarray(out.info.feasible))),
        "final_state": np.asarray(out.X[-1]).tolist(),
    }))
    return 0


def _simple(fn_import, result_fn=None):
    """Build a console main() around a plain experiment function."""
    def _main(argv=None):
        parser = argparse.ArgumentParser()
        parser.add_argument("--set", dest="sets", action="append",
                            default=[], metavar="KEY=VALUE")
        parser.add_argument("--cpu", action="store_true")
        args = parser.parse_args(argv)
        if args.cpu:
            _force_cpu()
        fn = fn_import()
        res = fn(**_parse_sets(args.sets))
        if result_fn is not None:
            print(json.dumps(result_fn(res)))
        return 0
    return _main


def _pendulum_online():
    from .experiments.pendulum import (make_pendulum_online_sim,
                                       run_pendulum_online_learning)

    def run(**kw):
        sim = make_pendulum_online_sim(**kw)
        X, U, Xdot, info = run_pendulum_online_learning(sim)
        import numpy as np
        from .experiments.pendulum import pendulum_damage_fraction
        return {"damage_fraction": float(pendulum_damage_fraction(X[:, 0])),
                "final_state": np.asarray(X[-1]).tolist()}
    return run


def _pendulum_ground_truth():
    from .experiments.pendulum import (run_pendulum_ground_truth,
                                       pendulum_damage_fraction)

    def run(**kw):
        X, U, pres = run_pendulum_ground_truth(**kw)
        import numpy as np
        return {"damage_fraction": float(pendulum_damage_fraction(X[:, 0])),
                "max_pres": float(np.max(np.asarray(pres)))}
    return run


def _pendulum_learn():
    from .experiments.pendulum import learn_dynamics_matrix_vector
    return learn_dynamics_matrix_vector


def _speed_test():
    from .experiments.pendulum import speed_test_matrix_vector
    return speed_test_matrix_vector


def _unicycle_speed_test():
    from .experiments.unicycle import unicycle_speed_test
    return unicycle_speed_test


def _car_learn():
    from .experiments.car import car_learn_dynamics
    return car_learn_dynamics


def _monte_carlo():
    from .experiments.montecarlo import monte_carlo_unicycle

    def run(**kw):
        import numpy as np
        sim, outs, stats = monte_carlo_unicycle(**kw)
        return {k: float(np.asarray(v)) for k, v in stats.items()}
    return run


pendulum_control_online_learning = _simple(_pendulum_online, lambda r: r)
pendulum_control_ground_truth = _simple(_pendulum_ground_truth, lambda r: r)
pendulum_learn_dynamics = _simple(_pendulum_learn, lambda r: r)
speed_test_matrix_vector = _simple(_speed_test, lambda r: r)
unicycle_speed_test = _simple(_unicycle_speed_test, lambda r: r)
car_learn_dynamics = _simple(_car_learn, lambda r: r)
monte_carlo_unicycle = _simple(_monte_carlo, lambda r: r)


if __name__ == "__main__":
    sys.exit(main())
