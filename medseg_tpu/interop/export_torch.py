"""Reverse interop: medseg_tpu flax variables -> reference torch state_dicts.

The forward converters (torch_cnn.py) let reference users bring their
weights here; these exporters let weights trained HERE go back — the same
key names and layouts the reference's `torch.load` paths expect
(utils/tester.py:602-617, utils/pipeline.py:213-250), so a model finetuned on
TPU drops straight into the reference's tester/pipeline.

Implementation: invert the exact layout primitives of interop/common.py.
Round-trip (convert -> export -> convert) is bit-exact and tested.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np


def _inv_conv(kernel: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(kernel).transpose(3, 2, 0, 1))


def _inv_conv_transpose(kernel: np.ndarray) -> np.ndarray:
    k = np.asarray(kernel)[::-1, ::-1]
    return np.ascontiguousarray(k.transpose(2, 3, 0, 1))


def _inv_linear(kernel: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(kernel).T)


class _Writer:
    def __init__(self):
        self.sd: Dict[str, np.ndarray] = {}

    def conv(self, prefix: str, p: Mapping, bias: bool = True):
        self.sd[f"{prefix}.weight"] = _inv_conv(p["kernel"])
        if bias:
            self.sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def conv_t(self, prefix: str, p: Mapping):
        self.sd[f"{prefix}.weight"] = _inv_conv_transpose(p["kernel"])
        self.sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def linear(self, prefix: str, p: Mapping, bias: bool = True):
        self.sd[f"{prefix}.weight"] = _inv_linear(p["kernel"])
        if bias:
            self.sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def bn(self, prefix: str, params: Mapping, stats: Mapping):
        self.sd[f"{prefix}.weight"] = np.asarray(params["scale"])
        self.sd[f"{prefix}.bias"] = np.asarray(params["bias"])
        self.sd[f"{prefix}.running_mean"] = np.asarray(stats["mean"])
        self.sd[f"{prefix}.running_var"] = np.asarray(stats["var"])
        self.sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _export_resnet_trunk(w: _Writer, p: Mapping, s: Mapping,
                         stage_sizes: Sequence[int], bottleneck: bool,
                         stem=("conv1", "bn1"),
                         stage_names: Mapping[int, str] | None = None):
    w.conv(stem[0], p["conv1"], bias=False)
    w.bn(stem[1], p["bn1"], s["bn1"])
    convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
    for stage, n_blocks in enumerate(stage_sizes):
        layer = (stage_names or {}).get(stage, f"layer{stage + 1}")
        for i in range(n_blocks):
            bp = p[f"layer{stage + 1}_{i}"]
            bs = s[f"layer{stage + 1}_{i}"]
            for c in convs:
                w.conv(f"{layer}.{i}.{c}", bp[c], bias=False)
                w.bn(f"{layer}.{i}.{c.replace('conv', 'bn')}",
                     bp[c.replace("conv", "bn")], bs[c.replace("conv", "bn")])
            if "down_conv" in bp:
                w.conv(f"{layer}.{i}.downsample.0", bp["down_conv"], bias=False)
                w.bn(f"{layer}.{i}.downsample.1", bp["down_bn"], bs["down_bn"])


def export_resnet_classifier(variables: Mapping, depth: int) -> Dict[str, np.ndarray]:
    """-> torchvision-style state_dict with the adapted head at fc.1.*"""
    w = _Writer()
    stage_sizes = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}[depth]
    _export_resnet_trunk(w, variables["params"]["encoder"],
                         variables["batch_stats"]["encoder"],
                         stage_sizes, bottleneck=depth >= 50)
    w.linear("fc.1", variables["params"]["head"]["fc"])
    return w.sd


def export_vgg_classifier(variables: Mapping, depth: int) -> Dict[str, np.ndarray]:
    """-> torchvision-style state_dict with the adapted head at classifier.7.*"""
    from medseg_tpu.interop.torch_cnn import _vgg_feature_indices

    w = _Writer()
    stages = {16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}[depth]
    fp = variables["params"]["features"]
    fs = variables["batch_stats"]["features"]
    for stage, pairs in enumerate(_vgg_feature_indices(stages)):
        for i, (ci, bi) in enumerate(pairs):
            w.conv(f"features.{ci}", fp[f"conv{stage}_{i}"])
            w.bn(f"features.{bi}", fp[f"bn{stage}_{i}"], fs[f"bn{stage}_{i}"])
    w.linear("classifier.0", variables["params"]["fc1"])
    w.linear("classifier.3", variables["params"]["fc2"])
    w.linear("classifier.7", variables["params"]["head_fc"])
    return w.sd


def export_resnet_unet(variables: Mapping) -> Dict[str, np.ndarray]:
    """-> reference ResNetUnet state_dict (ResnetUnet.py module tree)."""
    w = _Writer()
    p = variables["params"]
    s = variables["batch_stats"]
    _export_resnet_trunk(w, p["encoder"], s["encoder"], (3, 4, 6, 3), True,
                         stem=("encoder1.0", "encoder1.1"),
                         stage_names={0: "encoder2", 1: "encoder3",
                                      2: "encoder4", 3: "encoder5"})

    def double_conv(prefix, bp, bs, indices=(0, 1, 3, 4)):
        c0, b0, c1, b1 = indices
        w.conv(f"{prefix}.{c0}", bp["conv1"]["conv"])
        w.bn(f"{prefix}.{b0}", bp["conv1"]["bn"], bs["conv1"]["bn"])
        w.conv(f"{prefix}.{c1}", bp["conv2"]["conv"])
        w.bn(f"{prefix}.{b1}", bp["conv2"]["bn"], bs["conv2"]["bn"])

    for i in range(5, 1, -1):
        w.conv_t(f"decoder{i}.up_sample", p[f"decoder{i}"]["up"])
        double_conv(f"decoder{i}.basic_block", p[f"decoder{i}"]["block"],
                    s[f"decoder{i}"]["block"])
    w.conv_t("decoder1.0", p["up1"])
    w.conv("decoder1.1", p["conv1"])
    w.bn("decoder1.2", p["bn1"], s["bn1"])
    w.conv("out", p["out"])
    return w.sd


def _export_double_conv(w: _Writer, prefix: str, bp: Mapping, bs: Mapping,
                        indices=(0, 1, 3, 4)):
    c0, b0, c1, b1 = indices
    w.conv(f"{prefix}.{c0}", bp["conv1"]["conv"])
    w.bn(f"{prefix}.{b0}", bp["conv1"]["bn"], bs["conv1"]["bn"])
    w.conv(f"{prefix}.{c1}", bp["conv2"]["conv"])
    w.bn(f"{prefix}.{b1}", bp["conv2"]["bn"], bs["conv2"]["bn"])


def _export_up_conv(w: _Writer, prefix: str, bp: Mapping, bs: Mapping):
    w.conv(f"{prefix}.up.1", bp["conv"]["conv"])
    w.bn(f"{prefix}.up.2", bp["conv"]["bn"], bs["conv"]["bn"])


def _export_att_gate(w: _Writer, prefix: str, bp: Mapping, bs: Mapping):
    for ours, theirs in (("w_g", "W_g"), ("w_x", "W_x"), ("psi", "psi")):
        w.conv(f"{prefix}.{theirs}.0", bp[ours]["conv"])
        w.bn(f"{prefix}.{theirs}.1", bp[ours]["bn"], bs[ours]["bn"])


def export_attention_unet(variables: Mapping) -> Dict[str, np.ndarray]:
    """-> reference AttentionUNet state_dict (AttentionUNet.py module tree)."""
    w = _Writer()
    p = variables["params"]
    s = variables["batch_stats"]
    for i in range(1, 6):
        _export_double_conv(w, f"conv{i}", p[f"conv{i}"], s[f"conv{i}"])
    for i in range(5, 1, -1):
        _export_up_conv(w, f"up{i}", p[f"up{i}"], s[f"up{i}"])
        _export_att_gate(w, f"att{i}", p[f"att{i}"], s[f"att{i}"])
        _export_double_conv(w, f"up_conv{i}", p[f"up_conv{i}"], s[f"up_conv{i}"])
    w.conv("out", p["out"])
    return w.sd


def _export_rrcnn(w: _Writer, prefix: str, bp: Mapping, bs: Mapping):
    w.conv(f"{prefix}.conv_1x1", bp["conv_1x1"])
    for i, name in enumerate(("rcnn1", "rcnn2")):
        w.conv(f"{prefix}.RCNN.{i}.conv.0", bp[name]["conv"]["conv"])
        w.bn(f"{prefix}.RCNN.{i}.conv.1", bp[name]["conv"]["bn"],
             bs[name]["conv"]["bn"])


def export_r2u_net(variables: Mapping, attention: bool = False) -> Dict[str, np.ndarray]:
    """-> reference R2U_Net / R2AttU_Net state_dict."""
    w = _Writer()
    p = variables["params"]
    s = variables["batch_stats"]
    for i in range(1, 6):
        _export_rrcnn(w, f"RRCNN{i}", p[f"rrcnn{i}"], s[f"rrcnn{i}"])
    for i in range(5, 1, -1):
        _export_up_conv(w, f"up{i}", p[f"up{i}"], s[f"up{i}"])
        if attention:
            _export_att_gate(w, f"att{i}", p[f"att{i}"], s[f"att{i}"])
        _export_rrcnn(w, f"up_RRCNN{i}", p[f"up_rrcnn{i}"], s[f"up_rrcnn{i}"])
    w.conv("conv_1x1", p["out"])
    return w.sd


def save_torch_checkpoint(state_dict: Dict[str, np.ndarray], path: str):
    """Write a torch-loadable .pt file (torch must be available)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state_dict.items()}, path)
