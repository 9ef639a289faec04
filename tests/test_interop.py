"""Numerical parity: torch/HF forward == flax forward with converted weights.

These are the bit-faithfulness tests that make metric parity reachable
without retraining (SURVEY.md §7 'Weight interop').
"""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medseg_tpu import interop  # noqa: E402
from medseg_tpu.models import (  # noqa: E402
    AttentionUNet,
    CLIPSegModel,
    R2UNet,
    ResNetUnet,
)
from medseg_tpu.core.registry import get_model  # noqa: E402
from tests.torch_oracles import (  # noqa: E402
    TAttentionUNet,
    TR2UNet,
    TResNet,
    TResNetUnet,
    TVGG,
    randomize_bn_stats,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def _nchw(x_np):
    return torch.from_numpy(x_np.transpose(0, 3, 1, 2))


def _cmp(torch_out, flax_out, tol=TOL):
    t = torch_out.detach().numpy()
    f = np.asarray(flax_out)
    if t.ndim == 4:  # NCHW -> NHWC
        t = t.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(f, t, **tol)


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet_classifier_parity(depth, rng_np):
    tm = randomize_bn_stats(TResNet(depth)).eval()
    variables = interop.convert_resnet_classifier(tm.state_dict(), depth)
    model = get_model(f"ResNet{depth}")["factory"]()
    x = rng_np.standard_normal((2, 64, 64, 3)).astype(np.float32)
    template = model.init(jax.random.key(0), jnp.asarray(x))
    interop.verify_tree_shapes(
        jax.tree.map(lambda a: a, template), variables)
    with torch.no_grad():
        want = tm(_nchw(x))
    got = model.apply(variables, jnp.asarray(x))
    _cmp(want, got)


@pytest.mark.parametrize("depth", [16, 19])
def test_vgg_classifier_parity(depth, rng_np):
    tm = randomize_bn_stats(TVGG(depth)).eval()
    variables = interop.convert_vgg_classifier(tm.state_dict(), depth)
    model = get_model(f"VGG{depth}")["factory"]()
    x = rng_np.standard_normal((1, 64, 64, 3)).astype(np.float32)
    template = model.init(jax.random.key(0), jnp.asarray(x))
    interop.verify_tree_shapes(jax.tree.map(lambda a: a, template), variables)
    with torch.no_grad():
        want = tm(_nchw(x))
    got = model.apply(variables, jnp.asarray(x))
    _cmp(want, got, tol=dict(rtol=1e-3, atol=1e-3))


def test_resnet_unet_parity(rng_np):
    tm = randomize_bn_stats(TResNetUnet()).eval()
    variables = interop.convert_resnet_unet(tm.state_dict())
    model = ResNetUnet()
    x = rng_np.standard_normal((1, 64, 64, 3)).astype(np.float32)
    template = model.init(jax.random.key(0), jnp.asarray(x))
    interop.verify_tree_shapes(jax.tree.map(lambda a: a, template), variables)
    with torch.no_grad():
        want = tm(_nchw(x))
    got = model.apply(variables, jnp.asarray(x))
    _cmp(want, got, tol=dict(rtol=1e-3, atol=1e-3))


def test_attention_unet_parity(rng_np):
    tm = randomize_bn_stats(TAttentionUNet()).eval()
    variables = interop.convert_attention_unet(tm.state_dict())
    model = AttentionUNet()
    x = rng_np.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(_nchw(x))
    got = model.apply(variables, jnp.asarray(x))
    _cmp(want, got, tol=dict(rtol=1e-3, atol=1e-3))


@pytest.mark.parametrize("attention", [False, True])
def test_r2u_net_parity(attention, rng_np):
    t = 2
    tm = randomize_bn_stats(TR2UNet(t=t, attention=attention)).eval()
    variables = interop.convert_r2u_net(tm.state_dict(), attention=attention)
    model = R2UNet(t=t, attention=attention)
    x = rng_np.standard_normal((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(_nchw(x))
    got = model.apply(variables, jnp.asarray(x))
    _cmp(want, got, tol=dict(rtol=1e-3, atol=1e-3))


# --------------------------- CLIP / CLIPSeg vs HF ---------------------------

def _tiny_clip_config():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
    return CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=16, vocab_size=100,
                       projection_dim=24, eos_token_id=99,
                       bos_token_id=98, pad_token_id=97),
        CLIPVisionConfig(hidden_size=40, intermediate_size=80,
                         num_hidden_layers=2, num_attention_heads=2,
                         image_size=32, patch_size=8, projection_dim=24),
        projection_dim=24)


def _tower_cfgs():
    from medseg_tpu.nn.vit import TowerConfig
    vis = TowerConfig(40, 2, 2, 80, image_size=32, patch_size=8)
    txt = TowerConfig(32, 2, 2, 64, vocab_size=100, max_positions=16,
                      eos_token_id=99)
    return vis, txt


def test_clip_parity_vs_hf(rng_np):
    from transformers import CLIPModel as HFCLIPModel
    from medseg_tpu.models.clip import CLIPModule

    torch.manual_seed(0)
    hf = HFCLIPModel(_tiny_clip_config()).eval()
    vis, txt = _tower_cfgs()
    model = CLIPModule(vision_cfg=vis, text_cfg=txt, projection_dim=24)
    variables = interop.convert_clip(hf.state_dict(), num_layers=2)

    x = rng_np.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = np.array([[98, 5, 7, 99], [98, 9, 99, 97]], dtype=np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), pixel_values=_nchw(x))
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got),
                               out.logits_per_image.numpy(), rtol=1e-4, atol=1e-4)


def test_clip_classifier_conversion(rng_np):
    from transformers import CLIPModel as HFCLIPModel
    from medseg_tpu.models.clip import CLIPClassifier

    torch.manual_seed(1)
    hf = HFCLIPModel(_tiny_clip_config()).eval()
    vis, _ = _tower_cfgs()
    model = CLIPClassifier(vision_cfg=vis, projection_dim=24)
    variables = interop.convert_clip_classifier(hf.state_dict(), num_layers=2)

    x = rng_np.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = np.array([[98, 5, 99], [98, 7, 99], [98, 11, 99]], dtype=np.int64)
    with torch.no_grad():
        tf = hf.get_text_features(torch.from_numpy(ids))
        tf = tf / tf.norm(dim=-1, keepdim=True)
        imf = hf.get_image_features(_nchw(x))
        imf = imf / imf.norm(dim=-1, keepdim=True)
        want = hf.logit_scale.exp() * imf @ tf.T
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(tf.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_clipseg_parity_vs_hf(rng_np):
    from transformers import CLIPSegConfig, CLIPSegTextConfig, CLIPSegVisionConfig
    from transformers import CLIPSegForImageSegmentation

    cfg = CLIPSegConfig.from_text_vision_configs(
        CLIPSegTextConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          max_position_embeddings=16, vocab_size=100,
                          projection_dim=24, eos_token_id=99,
                          bos_token_id=98, pad_token_id=97),
        CLIPSegVisionConfig(hidden_size=40, intermediate_size=80,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=32, patch_size=8, projection_dim=24),
        projection_dim=24, reduce_dim=16, extract_layers=[0, 1],
        decoder_num_attention_heads=2, decoder_intermediate_size=32,
        use_complex_transposed_convolution=True)
    torch.manual_seed(2)
    hf = CLIPSegForImageSegmentation(cfg).eval()

    vis, txt = _tower_cfgs()
    from medseg_tpu.models.clipseg import CLIPSegModel as FlaxSeg
    model = FlaxSeg(vision_cfg=vis, text_cfg=txt, projection_dim=24,
                    extract_layers=(0, 1), reduce_dim=16,
                    decoder_heads=2, decoder_intermediate=32)
    variables = interop.convert_clipseg(hf.state_dict(), num_layers=2,
                                        extract_depth=2)

    x = rng_np.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = np.array([[98, 5, 99], [98, 7, 99]], dtype=np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), pixel_values=_nchw(x),
                 attention_mask=torch.ones_like(torch.from_numpy(ids)))
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), out.logits.numpy(),
                               rtol=5e-4, atol=5e-4)
