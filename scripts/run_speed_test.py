#!/usr/bin/env python
"""Run the paper's speed benchmark (pendulum MVGP vs CoGP posterior
inference over a 441-point grid) and the learning-error comparison, and
print the results against the reference's recorded numbers (BASELINE.md).

Usage: python scripts/run_speed_test.py [--cpu] [--quick]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if "--cpu" in sys.argv:
    # env vars are too late on this host (sitecustomize pre-imports jax)
    jax.config.update("jax_platforms", "cpu")

REFERENCE = {  # docs/saved-runs/speed_test_matrix_vector_v1.6.1 (BASELINE.md)
    256: {"matrix": 0.0436},
    320: {"matrix": 0.0453, "vector": 0.0865,
          "matrixdiag": 0.0363, "vectordiag": 0.0818},
    384: {"matrix": 0.0503, "vector": 0.1168,
          "matrixdiag": 0.0417, "vectordiag": 0.1123},
    512: {"matrix": 0.0775, "vector": 0.1915,
          "matrixdiag": 0.0511, "vectordiag": 0.1786},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--large", action="store_true",
                    help="k in {768, 1024, 2048}: past the Pallas "
                         "kernel cap, where the MVGP O(k^3) vs CoGP "
                         "O(k^3 n^3) separation must re-emerge (the "
                         "CoGP kn Gram exceeds the n<=1024 kernel cap "
                         "from k=512 up and runs the XLA fallback)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_enable_x64", True)

    from bayesian_cbf_tpu.experiments.pendulum import (
        speed_test_matrix_vector, learn_dynamics_matrix_vector)

    ks = ((64, 128) if args.quick
          else (768, 1024, 2048) if args.large
          else (256, 320, 384, 512))
    res = speed_test_matrix_vector(
        max_train_list=ks, grid=21,
        ntimes=3 if args.quick else 10, repeat=2 if args.quick else 5,
        training_iter=20 if args.quick else 50)
    print(json.dumps(res, indent=1))
    for k in ks:
        for name in res:
            ref = REFERENCE.get(k, {}).get(name)
            ours = res[name][k]["elapsed"]
            line = f"k={k:4d} {name:11s} ours={ours*1e3:8.2f} ms"
            if ref:
                line += f"  reference={ref*1e3:8.2f} ms  speedup={ref/ours:6.1f}x"
            print(line)

    if not args.quick and not args.large:
        ld = learn_dynamics_matrix_vector()
        print("learning error (reference: matrix 0.659, vector 3.436):",
              json.dumps(ld))

    os.makedirs("data", exist_ok=True)
    with open("data/speed_test.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
