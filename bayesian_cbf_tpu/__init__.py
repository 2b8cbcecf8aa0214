"""bayesian_cbf_tpu — TPU-native Bayesian Control Barrier Functions.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
wecacuee/Bayesian_CBF ("Control Barriers in Bayesian Learning of System
Dynamics", IEEE TAC 2021): online matrix-variate Gaussian-process (MVGP)
learning of control-affine dynamics, probabilistic CBF/CLF chance
constraints compiled to second-order-cone programs, and a fully jitted
sense -> learn -> solve -> step control loop that runs as a single
`jax.lax.scan` on device.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):

- :mod:`bayesian_cbf_tpu.utils`    — L0 substrate (kron, PSD Cholesky, term extraction)
- :mod:`bayesian_cbf_tpu.models`   — L2 MVGP / CoGP regressors + dynamics models
- :mod:`bayesian_cbf_tpu.gp`       — L3 GP expression algebra
- :mod:`bayesian_cbf_tpu.safety`   — L4 CBC/CLC chance constraints
- :mod:`bayesian_cbf_tpu.solvers`  — L6 jitted batched SOCP/QP solvers
- :mod:`bayesian_cbf_tpu.control`  — L5/L7 controllers + planners + CLF/CBFs
- :mod:`bayesian_cbf_tpu.sim`      — L8 lax.scan rollouts + online-learning carry
- :mod:`bayesian_cbf_tpu.parallel` — mesh-sharded Monte-Carlo rollouts
- :mod:`bayesian_cbf_tpu.experiments` — L9 reference-parity experiment drivers
- :mod:`bayesian_cbf_tpu.observability` — L10 logging (native fastlog), replay, analysis
- :mod:`bayesian_cbf_tpu.deploy`   — serving: AOT-compiled per-tick controller
- :mod:`bayesian_cbf_tpu.ops`      — Pallas TPU kernels (Gram, Cholesky, Schur/sweep inverse)
"""

__version__ = "0.2.0"


def __getattr__(name):
    # lazy: deploy pulls in jax at import; keep bare-package import light
    if name == "CompiledController":
        from .deploy import CompiledController
        return CompiledController
    raise AttributeError(name)
