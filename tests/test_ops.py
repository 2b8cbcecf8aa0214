"""Pallas kernel tests (interpret mode on CPU) against the XLA oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from bayesian_cbf_tpu.ops import fused_gram_kb, fused_gram_kb_reference


def test_fused_gram_matches_oracle():
    rng = np.random.default_rng(0)
    K, n, mh = 19, 3, 3
    Xs = jnp.asarray(rng.normal(size=(K, n)), jnp.float32)
    UHB = jnp.asarray(rng.normal(size=(K, mh)), jnp.float32)
    mask = jnp.asarray((rng.uniform(size=K) > 0.3).astype(np.float32))
    got = fused_gram_kb(Xs, UHB, mask, 1.7, 1e-6, interpret=True)
    want = fused_gram_kb_reference(Xs, UHB, mask, 1.7, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_gram_psd_on_valid_block():
    rng = np.random.default_rng(1)
    K = 32
    Xs = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    UHB = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    mask = jnp.ones((K,), jnp.float32)
    Kb = np.asarray(fused_gram_kb(Xs, UHB, mask, 1.0, 1e-5, interpret=True))
    w = np.linalg.eigvalsh(Kb)
    assert w.min() > -1e-4
