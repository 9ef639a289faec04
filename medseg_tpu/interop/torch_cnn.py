"""Converters: torchvision/reference CNN state_dicts -> medseg_tpu flax trees.

Covers the reference's five torch-module families whose checkpoints
(`weights/**/*.pt`, reference utils/helpers.py:394-400) must load at metric
parity:

- ResNet18/50 classifiers (torchvision hub graph + Dropout/Linear head,
  `fc.1.*` after `add_dropout_to_fc`, utils/helpers.py:124-134)
- VGG16/19-BN classifiers (torchvision hub graph; adapted head serializes as
  `classifier.7.*`, utils/pipeline.py:223-238)
- ResNetUnet, AttentionUNet, R2U-Net/R2AttU-Net (reference
  models/segmentation_models/*.py module trees)

Each converter returns a flax `variables` dict {params, batch_stats} and
asserts every torch key was consumed, so silent drift is impossible.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

from medseg_tpu.interop.common import (
    ConversionError,
    StateDict,
    take_bn,
    take_conv,
    take_conv_transpose,
    take_linear,
)


def _resnet_encoder(sd: StateDict, stage_sizes: Sequence[int], bottleneck: bool,
                    stem=("conv1", "bn1"),
                    stage_names: Mapping[int, str] | None = None):
    """Shared trunk mapping; `stem`/`stage_names` override torch key paths
    (the ResNetUnet renames them: encoder1.0/encoder1.1 + encoder2..5,
    reference ResnetUnet.py:34-43)."""
    p: Dict = {}
    s: Dict = {}

    def bn_into(dst_p, dst_s, name, torch_prefix):
        params, stats = take_bn(sd, torch_prefix)
        dst_p[name] = params
        dst_s[name] = stats

    p["conv1"] = take_conv(sd, stem[0], bias=False)
    bn_into(p, s, "bn1", stem[1])
    convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
    for stage, n_blocks in enumerate(stage_sizes):
        layer = (stage_names or {}).get(stage, f"layer{stage + 1}")
        for i in range(n_blocks):
            bp: Dict = {}
            bs: Dict = {}
            for c in convs:
                bp[c] = take_conv(sd, f"{layer}.{i}.{c}", bias=False)
                bn_into(bp, bs, c.replace("conv", "bn"), f"{layer}.{i}.{c.replace('conv', 'bn')}")
            if sd.has(f"{layer}.{i}.downsample.0.weight"):
                bp["down_conv"] = take_conv(sd, f"{layer}.{i}.downsample.0", bias=False)
                bn_into(bp, bs, "down_bn", f"{layer}.{i}.downsample.1")
            p[f"layer{stage + 1}_{i}"] = bp
            s[f"layer{stage + 1}_{i}"] = bs
    return p, s


def convert_resnet_classifier(state_dict: Mapping, depth: int) -> Dict:
    """torchvision resnet18/50 (+head-adapted) state_dict -> flax variables."""
    sd = StateDict(state_dict)
    stage_sizes = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}[depth]
    enc_p, enc_s = _resnet_encoder(sd, stage_sizes, bottleneck=depth >= 50)
    head: Dict = {}
    if sd.has("fc.1.weight"):  # adapted: fc = Sequential(Dropout, Linear)
        head["fc"] = take_linear(sd, "fc.1")
    elif sd.has("fc.weight"):  # raw torchvision (1000-class)
        head["fc"] = take_linear(sd, "fc")
    else:
        raise ConversionError("no classifier head weights (fc.* / fc.1.*)")
    sd.assert_fully_consumed()
    return {"params": {"encoder": enc_p, "head": head},
            "batch_stats": {"encoder": enc_s}}


def _vgg_feature_indices(stages: Sequence[int]):
    """torchvision features.Sequential indices for (conv, bn) per stage conv."""
    idx = 0
    table = []
    for n_convs in stages:
        stage = []
        for _ in range(n_convs):
            stage.append((idx, idx + 1))
            idx += 3  # conv, bn, relu
        idx += 1  # maxpool
        table.append(stage)
    return table


def convert_vgg_classifier(state_dict: Mapping, depth: int) -> Dict:
    """torchvision vgg16_bn/vgg19_bn (+head-adapted) state_dict -> variables."""
    sd = StateDict(state_dict)
    stages = {16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}[depth]
    fp: Dict = {}
    fs: Dict = {}
    for stage, pairs in enumerate(_vgg_feature_indices(stages)):
        for i, (ci, bi) in enumerate(pairs):
            fp[f"conv{stage}_{i}"] = take_conv(sd, f"features.{ci}")
            params, stats = take_bn(sd, f"features.{bi}")
            fp[f"bn{stage}_{i}"] = params
            fs[f"bn{stage}_{i}"] = stats
    p: Dict = {"features": fp}
    p["fc1"] = take_linear(sd, "classifier.0")
    p["fc2"] = take_linear(sd, "classifier.3")
    if sd.has("classifier.7.weight"):  # adapted head (pipeline.py:223-238)
        p["head_fc"] = take_linear(sd, "classifier.7")
    elif sd.has("classifier.6.weight"):
        p["head_fc"] = take_linear(sd, "classifier.6")
    else:
        raise ConversionError("no VGG classifier head (classifier.6/7)")
    sd.assert_fully_consumed()
    return {"params": p, "batch_stats": {"features": fs}}


def _double_conv(sd: StateDict, prefix: str, indices=(0, 1, 3, 4)):
    """reference `basic_block` Sequential: Conv,BN,ReLU,Conv,BN,ReLU."""
    c0, b0, c1, b1 = indices
    p: Dict = {}
    s: Dict = {}
    p["conv1"] = {"conv": take_conv(sd, f"{prefix}.{c0}")}
    bnp, bns = take_bn(sd, f"{prefix}.{b0}")
    p["conv1"]["bn"] = bnp
    s["conv1"] = {"bn": bns}
    p["conv2"] = {"conv": take_conv(sd, f"{prefix}.{c1}")}
    bnp, bns = take_bn(sd, f"{prefix}.{b1}")
    p["conv2"]["bn"] = bnp
    s["conv2"] = {"bn": bns}
    return p, s


def convert_resnet_unet(state_dict: Mapping) -> Dict:
    """reference ResNetUnet state_dict -> flax variables.

    torch module tree (ResnetUnet.py:29-58): encoder1=Seq(conv1,bn1,relu),
    encoder2..5 = resnet50 layer1..4, decoder5..2 = DecoderBlock(up_sample,
    basic_block), decoder1 = Seq(ConvT, Conv, BN, ReLU), out = 1x1 conv.
    """
    sd = StateDict(state_dict)
    enc_p, enc_s = _resnet_encoder(
        sd, (3, 4, 6, 3), bottleneck=True, stem=("encoder1.0", "encoder1.1"),
        stage_names={0: "encoder2", 1: "encoder3", 2: "encoder4", 3: "encoder5"})
    p: Dict = {"encoder": enc_p}
    s: Dict = {"encoder": enc_s}
    for i in range(5, 1, -1):
        dp: Dict = {}
        ds: Dict = {}
        dp["up"] = take_conv_transpose(sd, f"decoder{i}.up_sample")
        bp, bs = _double_conv(sd, f"decoder{i}.basic_block")
        dp["block"] = bp
        ds["block"] = bs
        p[f"decoder{i}"] = dp
        s[f"decoder{i}"] = ds
    p["up1"] = take_conv_transpose(sd, "decoder1.0")
    p["conv1"] = take_conv(sd, "decoder1.1")
    bnp, bns = take_bn(sd, "decoder1.2")
    p["bn1"] = bnp
    s["bn1"] = bns
    p["out"] = take_conv(sd, "out")
    sd.assert_fully_consumed()
    return {"params": p, "batch_stats": s}


def _conv_bn(sd: StateDict, conv_key: str, bn_key: str):
    p = {"conv": take_conv(sd, conv_key)}
    bnp, bns = take_bn(sd, bn_key)
    p["bn"] = bnp
    return p, {"bn": bns}


def _attention_gate(sd: StateDict, prefix: str):
    p: Dict = {}
    s: Dict = {}
    for ours, theirs in (("w_g", "W_g"), ("w_x", "W_x"), ("psi", "psi")):
        cp, cs = _conv_bn(sd, f"{prefix}.{theirs}.0", f"{prefix}.{theirs}.1")
        p[ours] = cp
        s[ours] = cs
    return p, s


def _up_conv(sd: StateDict, prefix: str):
    """reference UpConv: Seq(Upsample, Conv@1, BN@2, ReLU)."""
    cp, cs = _conv_bn(sd, f"{prefix}.up.1", f"{prefix}.up.2")
    return {"conv": cp}, {"conv": cs}


def convert_attention_unet(state_dict: Mapping) -> Dict:
    sd = StateDict(state_dict)
    p: Dict = {}
    s: Dict = {}
    for i in range(1, 6):
        bp, bs = _double_conv(sd, f"conv{i}")
        p[f"conv{i}"] = bp
        s[f"conv{i}"] = bs
    for i in range(5, 1, -1):
        up_p, up_s = _up_conv(sd, f"up{i}")
        p[f"up{i}"] = up_p
        s[f"up{i}"] = up_s
        ap, as_ = _attention_gate(sd, f"att{i}")
        p[f"att{i}"] = ap
        s[f"att{i}"] = as_
        bp, bs = _double_conv(sd, f"up_conv{i}")
        p[f"up_conv{i}"] = bp
        s[f"up_conv{i}"] = bs
    p["out"] = take_conv(sd, "out")
    sd.assert_fully_consumed()
    return {"params": p, "batch_stats": s}


def _rrcnn(sd: StateDict, prefix: str):
    """reference RRCNN_block: conv_1x1 + RCNN=Seq(Recurrent_block x2),
    each Recurrent_block.conv = Seq(Conv@0, BN@1, ReLU)."""
    p: Dict = {"conv_1x1": take_conv(sd, f"{prefix}.conv_1x1")}
    s: Dict = {}
    for i, name in enumerate(("rcnn1", "rcnn2")):
        cp, cs = _conv_bn(sd, f"{prefix}.RCNN.{i}.conv.0", f"{prefix}.RCNN.{i}.conv.1")
        p[name] = {"conv": cp}
        s[name] = {"conv": cs}
    return p, s


def convert_r2u_net(state_dict: Mapping, attention: bool = False) -> Dict:
    sd = StateDict(state_dict)
    p: Dict = {}
    s: Dict = {}
    for i in range(1, 6):
        bp, bs = _rrcnn(sd, f"RRCNN{i}")
        p[f"rrcnn{i}"] = bp
        s[f"rrcnn{i}"] = bs
    for i in range(5, 1, -1):
        up_p, up_s = _up_conv(sd, f"up{i}")
        p[f"up{i}"] = up_p
        s[f"up{i}"] = up_s
        if attention:
            ap, as_ = _attention_gate(sd, f"att{i}")
            p[f"att{i}"] = ap
            s[f"att{i}"] = as_
        bp, bs = _rrcnn(sd, f"up_RRCNN{i}")
        p[f"up_rrcnn{i}"] = bp
        s[f"up_rrcnn{i}"] = bs
    p["out"] = take_conv(sd, "conv_1x1")
    sd.assert_fully_consumed()
    return {"params": p, "batch_stats": s}
