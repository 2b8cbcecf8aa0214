"""Debug sanitizers (utils/debug.py): checkify NaN localization and the
gradcheck/gradgradcheck harnesses (reference parity: hard NaN asserts +
torch gradcheck, SURVEY.md 5.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.utils.debug import (checkify_nan, gradcheck,
                                          gradgradcheck)


def test_checkify_nan_raises_and_localizes():
    def bad(x):
        return jnp.log(x - 2.0).sum()      # NaN for x < 2

    wrapped = checkify_nan(bad)
    assert np.isfinite(float(wrapped(jnp.asarray([3.0, 4.0]))))
    with pytest.raises(Exception, match="nan"):
        wrapped(jnp.asarray([1.0, 4.0]))


def test_checkify_clean_on_mll():
    """The MVGP MLL produces no NaN on healthy data under checkify."""
    from bayesian_cbf_tpu.models.mvgp import make_mvgp_rank1
    gp = make_mvgp_rank1(2, 1)
    params = gp.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    data = gp.make_data(jnp.asarray(rng.normal(size=(16, 2))),
                        jnp.asarray(rng.normal(size=(16, 1))),
                        jnp.asarray(rng.normal(size=(16, 2))))
    val = checkify_nan(lambda p: gp.mll(p, data))(params)
    assert np.isfinite(float(val))


def test_gradcheck_mll():
    """jax.grad of the MLL matches central differences over every
    hyperparameter leaf (the reference runs torch gradcheck on its
    kernel/posterior, control_affine_model.py:512-610)."""
    from bayesian_cbf_tpu.models.mvgp import make_mvgp_rank1
    gp = make_mvgp_rank1(2, 1)
    params = gp.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    data = gp.make_data(jnp.asarray(rng.normal(size=(8, 2))),
                        jnp.asarray(rng.normal(size=(8, 1))),
                        jnp.asarray(rng.normal(size=(8, 2))))
    assert gradcheck(lambda p, d: gp.mll(p, d), (params, data),
                     eps=1e-6, rtol=5e-4, atol=1e-6)


def test_gradcheck_catches_wrong_grad():
    class Lied:
        pass

    def f(p):
        return jnp.sum(p["a"] ** 2)

    # a correct function passes...
    assert gradcheck(lambda p: f(p), ({"a": jnp.asarray([1.0, 2.0])},))
    # ...and a broken custom gradient is caught

    @jax.custom_vjp
    def wrong(x):
        return jnp.sum(x ** 2)

    wrong.defvjp(lambda x: (jnp.sum(x ** 2), x),
                 lambda x, g: (3.0 * g * x,))      # should be 2 g x
    with pytest.raises(AssertionError):
        gradcheck(lambda p: wrong(p["a"]), ({"a": jnp.asarray([1.0, 2.0])},))


def test_gradgradcheck_quadratic():
    def f(p):
        x = p["x"]
        return jnp.sum(x ** 3) + jnp.sum(x[0] * x[1])

    assert gradgradcheck(f, ({"x": jnp.asarray([0.7, -0.3, 1.1])},))
