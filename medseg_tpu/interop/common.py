"""Layout conversion primitives: torch state_dict tensors -> flax params.

Conventions (validated numerically in tests/test_interop.py):
- Conv2d weight  [out, in, kh, kw]  -> flax kernel (kh, kw, in, out)
- ConvTranspose2d weight [in, out, kh, kw] -> flax default-layout kernel
  (kh, kw, in, out) with BOTH spatial axes flipped (flax's
  transpose_kernel=False convention)
- Linear weight [out, in] -> flax kernel (in, out)
- BatchNorm: weight->scale, bias->bias; running stats -> batch_stats

The converter consumes a plain {key: np.ndarray} dict, so it works with
`torch.load(...state dict...)`, torchvision hub downloads, or HF
`model.state_dict()` equally — torch itself is only needed to produce the
dict, never at conversion time.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


class ConversionError(RuntimeError):
    pass


class StateDict:
    """A consume-tracking view over a torch state_dict (numpy values)."""

    def __init__(self, sd: Mapping):
        self.sd = {k: self._to_np(v) for k, v in sd.items()}
        self.used: set[str] = set()

    @staticmethod
    def _to_np(v) -> np.ndarray:
        if isinstance(v, np.ndarray):
            return v
        # torch tensor without importing torch at module scope
        return v.detach().cpu().numpy()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise ConversionError(f"missing key: {key}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self, ignore_substrings=("num_batches_tracked", "position_ids")):
        return [
            k for k in self.sd
            if k not in self.used and not any(s in k for s in ignore_substrings)
        ]

    def assert_fully_consumed(self):
        leftover = self.unused()
        if leftover:
            raise ConversionError(f"unconsumed torch keys: {leftover[:10]}"
                                  f" (+{max(0, len(leftover) - 10)} more)")


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def take_conv(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": conv_kernel(sd.take(f"{prefix}.weight"))}
    if bias:
        out["bias"] = sd.take(f"{prefix}.bias")
    return out


def take_conv_transpose(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": conv_transpose_kernel(sd.take(f"{prefix}.weight"))}
    if bias:
        out["bias"] = sd.take(f"{prefix}.bias")
    return out


def take_linear(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": linear_kernel(sd.take(f"{prefix}.weight"))}
    if bias:
        out["bias"] = sd.take(f"{prefix}.bias")
    return out


def take_bn(sd: StateDict, prefix: str):
    """Returns (params, stats) for flax BatchNorm."""
    params = {"scale": sd.take(f"{prefix}.weight"), "bias": sd.take(f"{prefix}.bias")}
    stats = {"mean": sd.take(f"{prefix}.running_mean"),
             "var": sd.take(f"{prefix}.running_var")}
    return params, stats


def take_ln(sd: StateDict, prefix: str) -> Dict:
    return {"scale": sd.take(f"{prefix}.weight"), "bias": sd.take(f"{prefix}.bias")}


def verify_tree_shapes(template, built, path="") -> None:
    """Check the converted tree matches the model-init template's shapes."""
    if isinstance(template, Mapping):
        t_keys = set(template.keys())
        b_keys = set(built.keys())
        if t_keys != b_keys:
            raise ConversionError(
                f"at {path or '<root>'}: template keys {sorted(t_keys - b_keys)} "
                f"missing from converted; extra {sorted(b_keys - t_keys)}")
        for k in t_keys:
            verify_tree_shapes(template[k], built[k], f"{path}/{k}")
    else:
        ts = tuple(np.shape(template))
        bs = tuple(np.shape(built))
        if ts != bs:
            raise ConversionError(f"at {path}: shape {bs} != template {ts}")
