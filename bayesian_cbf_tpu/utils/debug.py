"""Numerical sanitizers (SURVEY.md 5.2 parity, TPU-style).

The reference sprinkles hard NaN asserts through its hot paths (kernel
forward matrix_variate_multitask_kernel.py:188-202, fit iterations
control_affine_model.py:315-328) and ships torch gradcheck harnesses
(custom_predict(grad_check=True) control_affine_model.py:512-610,
gradgradcheck misc.py:248-259).  In-graph on TPU, asserts cannot raise
— the production guards are the in-graph ones (NaN-step rejection in
the Adam fit, jitter ladders, log floors).  This module is the DEBUG
complement:

  * `checkify_nan(fn)` — wrap any jittable function so NaN/Inf
    production raises on the host with a located error
    (jax.experimental.checkify); run a failing config once under this
    to find WHERE the first non-finite value appears;
  * `gradcheck(fn, args)` — central-difference check of `jax.grad`
    (the torch gradcheck analogue) over every float leaf;
  * `gradgradcheck(fn, args)` — same for the Hessian-vector product
    (misc.py:248-259 analogue).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checkify_nan(fn: Callable, also_div: bool = True) -> Callable:
    """Wrap `fn` so any NaN/Inf produced inside raises (host-side) with
    the originating primitive located.  The wrapped function runs the
    checkified computation and calls `.throw()` on the error."""
    errs = checkify.nan_checks | (checkify.div_checks if also_div
                                  else frozenset())
    checked = checkify.checkify(fn, errors=errs)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def _flat_float_leaves(tree):
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, l in enumerate(leaves)
           if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    return leaves, treedef, idx


def gradcheck(fn: Callable, args, eps: float = 1e-6, rtol: float = 1e-4,
              atol: float = 1e-6) -> bool:
    """Central-difference check of jax.grad(fn) w.r.t. every float leaf
    of args[0] (a pytree).  `fn(params, *rest) -> scalar`.  Raises
    AssertionError with the offending leaf/coordinate on mismatch."""
    params, *rest = args
    g = jax.grad(lambda p: fn(p, *rest))(params)
    leaves, treedef, idx = _flat_float_leaves(params)
    gleaves = jax.tree.flatten(g)[0]
    for i in idx:
        a = np.asarray(leaves[i], dtype=np.float64)
        ga = np.asarray(gleaves[i], dtype=np.float64)
        flat = a.reshape(-1)
        for j in range(flat.size):
            def at(v):
                f2 = flat.copy()
                f2[j] = v
                ls = list(leaves)
                ls[i] = jnp.asarray(f2.reshape(a.shape), leaves[i].dtype)
                return float(fn(jax.tree.unflatten(treedef, ls), *rest))
            fd = (at(flat[j] + eps) - at(flat[j] - eps)) / (2 * eps)
            got = ga.reshape(-1)[j]
            if not np.isclose(fd, got, rtol=rtol, atol=atol):
                raise AssertionError(
                    "gradcheck failed at leaf %d[%d]: fd=%.6g grad=%.6g"
                    % (i, j, fd, got))
    return True


def gradgradcheck(fn: Callable, args, eps: float = 1e-5,
                  rtol: float = 2e-3, atol: float = 1e-5) -> bool:
    """Check the Hessian-vector product of `fn(params, *rest) -> scalar`
    against central differences of jax.grad (misc.py:248-259 analogue).
    Uses a fixed pseudo-random tangent per leaf."""
    params, *rest = args
    gfn = jax.grad(lambda p: fn(p, *rest))
    leaves, treedef, idx = _flat_float_leaves(params)
    rng = np.random.default_rng(0)
    tangent = [jnp.asarray(rng.normal(size=np.shape(l)),
                           jnp.asarray(l).dtype)
               if i in idx else jnp.zeros_like(jnp.asarray(l))
               for i, l in enumerate(leaves)]
    vt = jax.tree.unflatten(treedef, tangent)
    hvp = jax.jvp(gfn, (params,), (vt,))[1]

    def shift(s):
        ls = [jnp.asarray(l) + s * t for l, t in zip(leaves, tangent)]
        return jax.tree.unflatten(treedef, ls)

    gp = gfn(shift(eps))
    gm = gfn(shift(-eps))
    fd = jax.tree.map(lambda a, b: (np.asarray(a, np.float64)
                                    - np.asarray(b, np.float64))
                      / (2 * eps), gp, gm)
    for a, b in zip(jax.tree.leaves(fd), jax.tree.leaves(hvp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)
    return True
