"""Shape/dtype smoke tests for the model zoo (tiny inputs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg_tpu.core.registry import get_model, list_models
from medseg_tpu.models import (
    AttentionUNet,
    CLIPClassifier,
    CLIPSegModel,
    R2UNet,
    ResNetUnet,
)
from medseg_tpu.nn.vit import TowerConfig


def _init_and_run(model, x, **kw):
    variables = model.init(jax.random.key(0), x, **kw)
    out = model.apply(variables, x, **kw)
    return variables, out


def test_registry_lists_full_zoo():
    assert list_models("classification") == ["CLIP", "ResNet18", "ResNet50", "VGG16", "VGG19"]
    assert list_models("segmentation") == [
        "AttentionUNet", "CLIPSeg", "R2AttUnet", "R2Unet", "ResNetUnet"]


@pytest.mark.parametrize("name", ["ResNet18", "ResNet50"])
def test_resnet_classifier_shapes(name):
    model = get_model(name)["factory"]()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables, out = _init_and_run(model, x)
    assert out.shape == (2, 3)
    assert "batch_stats" in variables
    # train mode mutates batch stats and needs dropout rng
    out2, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)})
    assert out2.shape == (2, 3)
    assert "batch_stats" in mutated


def test_vgg_classifier_shapes():
    model = get_model("VGG16")["factory"]()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 3)


def test_resnet_unet_shapes():
    model = ResNetUnet()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 64, 64, 1)


def test_attention_unet_shapes():
    model = AttentionUNet()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 32, 32, 1)


def test_r2u_net_shapes():
    model = R2UNet(t=2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 32, 32, 1)


def test_r2attu_net_shapes():
    model = R2UNet(t=1, attention=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 32, 32, 1)


TINY_VISION = TowerConfig(32, 2, 2, 64, image_size=32, patch_size=8)
TINY_TEXT = TowerConfig(32, 2, 2, 64, vocab_size=100, max_positions=16,
                        eos_token_id=99)


def test_clip_classifier_tiny():
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    text_feats = jnp.ones((3, 16), jnp.float32) / 4.0
    variables = model.init(jax.random.key(0), x, text_feats)
    out = model.apply(variables, x, text_feats)
    assert out.shape == (2, 3)


def test_clipseg_tiny():
    model = CLIPSegModel(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT,
                         projection_dim=16, extract_layers=(0, 1),
                         reduce_dim=16)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    ids = jnp.full((1, 5), 1, jnp.int32).at[:, -1].set(99)
    variables = model.init(jax.random.key(0), x, ids)
    out = model.apply(variables, x, ids)
    # HF head upsamples by (patch/4)^2 = 4x for patch 8 (16x only at patch 16,
    # where it equals full resolution): grid 4 -> 16.
    assert out.shape == (2, 16, 16)


def test_clipseg_pos_interp_offsize():
    """ViT trained at 32 runs at 48 via bicubic position interpolation."""
    model = CLIPSegModel(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT,
                         projection_dim=16, extract_layers=(0, 1),
                         reduce_dim=16)
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    ids = jnp.full((1, 5), 1, jnp.int32).at[:, -1].set(99)
    variables = model.init(jax.random.key(0), x, ids)
    out = model.apply(variables, x, ids)
    assert out.shape == (1, 24, 24)  # grid 6 -> 4x upsample


def test_resnet_data_parallel_forward():
    """Forward under jit over a data-sharded batch on the 8-device CPU mesh."""
    from medseg_tpu.parallel import batch_sharding, data_parallel_mesh, replicated

    mesh = data_parallel_mesh()
    model = get_model("ResNet18")["factory"]()
    x = np.zeros((16, 32, 32, 3), np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x[:2]))
    xs = jax.device_put(x, batch_sharding(mesh))
    vs = jax.device_put(variables, replicated(mesh))
    out = jax.jit(lambda v, b: model.apply(v, b))(vs, xs)
    assert out.shape == (16, 3)
