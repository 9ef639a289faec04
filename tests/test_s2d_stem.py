"""Space-to-depth folded stem: numerics identical to the standard 7x7/s2
stem with THE SAME parameter tree (PERF.md stem lever, VERDICT r1 #3)."""

import numpy as np

import jax
import jax.numpy as jnp

from medseg_tpu.core.registry import get_model
from medseg_tpu.ops.augment import augment_batch, preprocess_eval_batch
from medseg_tpu.ops.image import space_to_depth


def test_space_to_depth_layout():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    y = np.asarray(space_to_depth(jnp.asarray(x)))
    assert y.shape == (2, 2, 2, 12)
    for c in range(3):
        for dy in range(2):
            for dx in range(2):
                np.testing.assert_array_equal(
                    y[:, :, :, c * 4 + dy * 2 + dx],
                    x[:, dy::2, dx::2, c])


def test_folded_stem_matches_standard_resnet(rng_np):
    """Same params, s2d input + FoldedStem == NHWC input + 7x7/s2 stem."""
    x = rng_np.standard_normal((2, 64, 64, 3)).astype(np.float32)
    std_model = get_model("ResNet18")["factory"]()
    s2d_model = get_model("ResNet18")["factory"](stem_s2d=True)
    variables = std_model.init(jax.random.key(0), jnp.asarray(x))
    want = std_model.apply(variables, jnp.asarray(x))
    got = s2d_model.apply(variables, space_to_depth(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_augment_s2d_equals_posthoc_shuffle(rng_np):
    imgs = rng_np.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    key = jax.random.key(7)
    x_std, _ = augment_batch(key, jnp.asarray(imgs))
    x_s2d, _ = augment_batch(key, jnp.asarray(imgs), s2d=True)
    np.testing.assert_allclose(np.asarray(x_s2d),
                               np.asarray(space_to_depth(x_std)),
                               rtol=1e-6, atol=1e-6)
    e_std, _ = preprocess_eval_batch(jnp.asarray(imgs))
    e_s2d, _ = preprocess_eval_batch(jnp.asarray(imgs), s2d=True)
    np.testing.assert_allclose(np.asarray(e_s2d),
                               np.asarray(space_to_depth(e_std)),
                               rtol=1e-6, atol=1e-6)
