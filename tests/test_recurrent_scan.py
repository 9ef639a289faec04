"""RecurrentBlock: nn.scan path must match the static unroll exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medseg_tpu.nn.blocks import RecurrentBlock


@pytest.mark.parametrize("t", [1, 3])
def test_scan_matches_unroll_eval(t, rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 8, 8, 4)).astype(np.float32))
    unroll = RecurrentBlock(4, t=t, use_scan=False)
    scan = RecurrentBlock(4, t=t, use_scan=True)
    variables = unroll.init(jax.random.key(0), x)
    out_u = unroll.apply(variables, x)
    out_s = scan.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-6, atol=1e-6)


def test_scan_matches_unroll_train_stats(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 8, 8, 4)).astype(np.float32))
    unroll = RecurrentBlock(4, t=2, use_scan=False)
    scan = RecurrentBlock(4, t=2, use_scan=True)
    variables = unroll.init(jax.random.key(0), x)
    out_u, mu = unroll.apply(variables, x, train=True, mutable=["batch_stats"])
    out_s, ms = scan.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        mu["batch_stats"], ms["batch_stats"])
