"""Reverse interop: flax -> torch round-trips are bit-exact and torch-loadable."""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import jax  # noqa: E402

from medseg_tpu import interop  # noqa: E402
from medseg_tpu.interop import export_torch as X  # noqa: E402
from tests.torch_oracles import TResNet, TResNetUnet, TVGG, randomize_bn_stats  # noqa: E402


def _assert_roundtrip(sd_exported, tm):
    """Exported dict loads strictly into the torch oracle and matches."""
    want = tm.state_dict()
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd_exported.items()}
    missing = [k for k in want if k not in tensors
               and "num_batches_tracked" not in k]
    assert not missing, missing
    tm.load_state_dict(tensors, strict=False)
    for k, v in tm.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_allclose(v.numpy(), want[k].numpy(), atol=1e-6,
                                   err_msg=k)


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet_export_roundtrip(depth):
    tm = randomize_bn_stats(TResNet(depth)).eval()
    variables = interop.convert_resnet_classifier(tm.state_dict(), depth)
    sd = X.export_resnet_classifier(variables, depth)
    _assert_roundtrip(sd, tm)


def test_vgg_export_roundtrip():
    tm = randomize_bn_stats(TVGG(16)).eval()
    variables = interop.convert_vgg_classifier(tm.state_dict(), 16)
    sd = X.export_vgg_classifier(variables, 16)
    _assert_roundtrip(sd, tm)


def test_resnet_unet_export_roundtrip(tmp_path):
    tm = randomize_bn_stats(TResNetUnet()).eval()
    variables = interop.convert_resnet_unet(tm.state_dict())
    sd = X.export_resnet_unet(variables)
    _assert_roundtrip(sd, tm)
    # and the .pt writer produces a torch-loadable file
    X.save_torch_checkpoint(sd, str(tmp_path / "ResNetUnet_best_loss.pt"))
    loaded = torch.load(tmp_path / "ResNetUnet_best_loss.pt",
                        weights_only=True)
    assert "decoder5.up_sample.weight" in loaded


def test_attention_unet_export_roundtrip():
    from tests.torch_oracles import TAttentionUNet

    tm = randomize_bn_stats(TAttentionUNet()).eval()
    variables = interop.convert_attention_unet(tm.state_dict())
    sd = X.export_attention_unet(variables)
    _assert_roundtrip(sd, tm)


@pytest.mark.parametrize("attention", [False, True])
def test_r2u_net_export_roundtrip(attention):
    from tests.torch_oracles import TR2UNet

    tm = randomize_bn_stats(TR2UNet(t=2, attention=attention)).eval()
    variables = interop.convert_r2u_net(tm.state_dict(), attention=attention)
    sd = X.export_r2u_net(variables, attention=attention)
    _assert_roundtrip(sd, tm)
