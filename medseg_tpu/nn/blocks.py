"""Reusable flax.linen building blocks for the model zoo.

All modules are NHWC (TPU-native layout) with float32 parameters and a
configurable compute dtype (bfloat16 by default in training — the TPU
equivalent of the reference's CUDA AMP autocast).  BatchNorm uses
torch-compatible semantics: momentum 0.1 (flax momentum 0.9), eps 1e-5,
batch statistics during training.  Under jit over a data-sharded batch, the
batch statistics reduce over the GLOBAL batch (XLA inserts the collective),
giving cross-replica sync BN for free — important because per-chip batches
are small (reference bs 8-16; SURVEY.md §7 "BatchNorm under data
parallelism").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def max_pool(x, window: int = 2, stride: int | None = None, padding: int = 0):
    stride = stride or window
    pad = ((padding, padding), (padding, padding))
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=pad)


def upsample_nearest2x(x):
    """torch nn.Upsample(scale_factor=2) default (nearest) for NHWC."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def adaptive_avg_pool(x, out_h: int, out_w: int):
    """torch AdaptiveAvgPool2d semantics: bin i = [floor(i*n/o), ceil((i+1)*n/o))."""
    import numpy as np

    def pool_matrix(n_in, n_out):
        m = np.zeros((n_out, n_in), dtype=np.float32)
        for i in range(n_out):
            s = (i * n_in) // n_out
            e = -(-((i + 1) * n_in) // n_out)
            m[i, s:e] = 1.0 / (e - s)
        return m

    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    a_h = jnp.asarray(pool_matrix(h, out_h))
    a_w = jnp.asarray(pool_matrix(w, out_w))
    x = jnp.einsum("oh,bhwc->bowc", a_h, x.astype(jnp.float32))
    x = jnp.einsum("pw,bowc->bopc", a_w, x)
    return x


class _Dot1x1(nn.Module):
    """A 1x1 convolution lowered as a channel-contraction einsum.

    Parameter tree is identical to ``nn.Conv(features, (1, 1))`` — kernel
    [1, 1, C_in, C_out] + optional bias — so checkpoints/converters are
    unaffected; only the HLO changes (dot_general instead of convolution).
    Motivation: XLA lowers a C_out=1 convolution onto the MXU with 127/128
    output lanes padded away; expressing it as a contraction lets the
    compiler fuse it into the surrounding elementwise ops.  Measured on
    v5e (PERF.md "Segmentation backward"): the AttentionGate psi step drops
    from 31.6 to 27.9 ms f+b at att2 scale (B=64, 256px)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features), jnp.float32)
        y = jnp.einsum("bhwc,co->bhwo", x.astype(self.dtype),
                       kernel[0, 0].astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ConvBN(nn.Module):
    """Conv (torch-style explicit padding) + BatchNorm, optional ReLU.

    ``as_dot=True`` (valid only for kernel=1, stride=1, padding=0) lowers
    the conv as a channel einsum with an unchanged param tree — see
    ``_Dot1x1``; used by AttentionGate's psi projection."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    relu: bool = True
    as_dot: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.as_dot:
            assert (self.kernel, self.stride, self.padding) == (1, 1, 0), \
                "as_dot requires a pointwise conv"
            x = _Dot1x1(self.features, use_bias=self.use_bias,
                        dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((self.padding, self.padding), (self.padding, self.padding)),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DoubleConv(nn.Module):
    """Two Conv3x3+BN+ReLU — the U-Nets' `basic_block`
    (reference models/segmentation_models/AttentionUNet.py:4-13)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN(self.features, dtype=self.dtype, name="conv2")(x, train)
        return x


class UpConv(nn.Module):
    """Nearest 2x upsample + Conv3x3 + BN + ReLU
    (reference models/segmentation_models/AttentionUNet.py:15-27)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_nearest2x(x)
        return ConvBN(self.features, dtype=self.dtype, name="conv")(x, train)


class _Conv1x1Params(nn.Module):
    """Declaration-only twin of nn.Conv(features, (k,k)): same param tree
    (kernel [k,k,C_in,F] + bias), same initializers — but returns the raw
    parameters instead of applying the conv, so a caller can fold BatchNorm
    into them (_FusedConvBN1x1) or re-lay them out (nn/s2d.py)."""

    features: int
    c_in: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, self.c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _BNVars(nn.Module):
    """Declaration-only twin of nn.BatchNorm's variables: scale/bias params
    and mean/var batch_stats, same names/initializers/momentum blend — the
    caller supplies the batch statistics (computed algebraically upstream)."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        if batch_mean is not None and not self.is_initializing():
            # flax BatchNorm's exact running-stat blend (momentum 0.9)
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * batch_mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * batch_var)
        return scale, bias, ra_mean.value, ra_var.value


class _FusedConvBN1x1(nn.Module):
    """BN-folded pointwise conv with ALGEBRAIC train-mode statistics.

    Variable tree is identical to ConvBN(kernel=1, relu=False) —
    conv/{kernel,bias} + bn/{scale,bias} params, bn/{mean,var} batch_stats —
    so checkpoints and torch converters are untouched.  Returns the folded
    affine (A [C_in, F], c [F]) instead of applying the conv; the caller
    applies `y = x @ A + c` (and can merge several branches into one pass).

    Train-mode trick: a 1x1 conv is linear in channels, so its output batch
    statistics are exact functions of the INPUT's channel mean m and Gram
    matrix G = E[x x^T] (tiny MXU matmuls):

        mean(Wx + b) = W^T m + b
        var(Wx + b)  = diag(W^T (G - m m^T) W) = diag(W^T G W) - (W^T m)^2

    This removes the full-resolution stat pass over the conv output that
    makes train-mode BN the dominant cost of the attention gates (PERF.md
    r3: three BNs per gate, gates = 21% of the AttentionUNet step at 1-9%
    MFU).  Same fast-variance formula (E[u^2]-E[u]^2, f32, clipped at 0)
    flax BatchNorm uses, so numerics agree to reduction-order tolerance."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, in_mean, in_gram, train: bool):
        c_in = in_mean.shape[-1]
        kernel, bias = _Conv1x1Params(self.features, c_in, name="conv")()
        w = kernel[0, 0]  # [C_in, F] f32
        if train:
            mu_raw = in_mean @ w                       # [F]
            mean = mu_raw + bias
            e2 = jnp.einsum("cf,cd,df->f", w, in_gram, w)
            var = jnp.maximum(e2 - mu_raw * mu_raw, 0.0)
            scale, bn_bias, _, _ = _BNVars(self.features, self.momentum,
                                           name="bn")(mean, var)
        else:
            scale, bn_bias, mean, var = _BNVars(self.features, self.momentum,
                                                name="bn")()
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        return w * inv[None, :], bn_bias + (bias - mean) * inv


def _channel_stats(x):
    """(mean [C], Gram E[x x^T] [C,C]) over (B,H,W) — f32 accumulation."""
    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    n = x2d.shape[0]
    mean = jnp.mean(x2d.astype(jnp.float32), axis=0)
    gram = jnp.einsum("nc,nd->cd", x2d, x2d,
                      preferred_element_type=jnp.float32) / n
    return mean, gram


class AttentionGate(nn.Module):
    """Additive spatial attention gate on a skip connection
    (reference models/segmentation_models/AttentionUNet.py:29-54):
    psi = sigmoid(BN(1x1(relu(W_g g + W_x x)))); returns x * psi.

    fused_stats=True: the W_g/W_x ConvBNs lower as BN-folded affine
    contractions whose train-mode batch statistics come from the inputs'
    channel mean/Gram (see _FusedConvBN1x1) — the gate's three
    full-resolution BN materialization passes collapse to two fused
    einsum passes plus tiny [C,C] matmuls.  Identical variable tree and
    (to reduction-order tolerance) identical numerics as the unfused path;
    equality is pinned by tests/test_fused_gate.py and the torch-oracle
    parity tests.

    DEFAULT OFF after the r4 hardware A/B (PERF.md "Fused gate / s2d
    post-mortem"): isolated, the fusion is 2x (f+b 28.7 -> 14.5 ms at
    B=64); inside the full AttentionUNet train step it is a 2-16%
    REGRESSION (B=16: 80-83 ms unfused vs 84-85 fused; B=64: 316 vs
    367 ms) — in-graph, XLA already fuses the plain BN stat/normalize
    passes into the surrounding convs, while the Gram contractions
    (E[x x^T] over all pixels, both inputs) and their backward are new
    un-fusable full-tensor matmuls."""

    f_int: int
    dtype: jnp.dtype = jnp.float32
    fused_stats: bool = False

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        if not self.fused_stats:
            g1 = ConvBN(self.f_int, kernel=1, padding=0, relu=False,
                        dtype=self.dtype, name="w_g")(g, train)
            x1 = ConvBN(self.f_int, kernel=1, padding=0, relu=False,
                        dtype=self.dtype, name="w_x")(x, train)
            psi = nn.relu(g1 + x1)
        else:
            if train:
                mg, gram_g = _channel_stats(g)
                mx, gram_x = _channel_stats(x)
            else:
                mg = jnp.zeros((g.shape[-1],), jnp.float32)
                mx = jnp.zeros((x.shape[-1],), jnp.float32)
                gram_g = gram_x = None
            a_g, c_g = _FusedConvBN1x1(self.f_int, name="w_g")(mg, gram_g,
                                                               train)
            a_x, c_x = _FusedConvBN1x1(self.f_int, name="w_x")(mx, gram_x,
                                                               train)
            dt = self.dtype
            psi = nn.relu(
                jnp.einsum("bhwc,cf->bhwf", g.astype(dt), a_g.astype(dt))
                + jnp.einsum("bhwc,cf->bhwf", x.astype(dt), a_x.astype(dt))
                + (c_g + c_x).astype(dt))
        psi = ConvBN(1, kernel=1, padding=0, relu=False, as_dot=True,
                     dtype=self.dtype, name="psi")(psi, train)
        psi = nn.sigmoid(psi)
        return x * psi


class RecurrentBlock(nn.Module):
    """Weight-tied conv recurrence (reference models/segmentation_models/R2U_Net.py:4-20):
    x1 = f(x); repeat t times: x1 = f(x + x1), with f = Conv3x3+BN+ReLU.

    The conv/BN parameters are shared across iterations (one `f` module called
    t+1 times); BatchNorm running statistics update sequentially per call,
    matching the torch semantics of calling the same module in a loop.

    `use_scan=True` wraps the t weight-tied applications in nn.scan
    (compile-size constant in t, SURVEY.md §7 'Recurrent blocks'); the
    default static unroll lets XLA fuse across iterations.  Both paths share
    parameters and numerics (tested equal).
    """

    features: int
    t: int = 2
    use_scan: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = ConvBN(self.features, dtype=self.dtype, name="conv")
        x1 = f(x, train)
        if not self.use_scan or self.t == 0:
            for _ in range(self.t):
                x1 = f(x + x1, train)
            return x1

        def body(module, carry, _):
            return module(x + carry, train), None

        if train:
            # batch_stats mutate sequentially per iteration (torch semantics)
            scan = nn.scan(body, variable_broadcast="params",
                           variable_carry="batch_stats",
                           split_rngs={"params": False}, length=self.t)
        else:
            scan = nn.scan(body,
                           variable_broadcast=["params", "batch_stats"],
                           split_rngs={"params": False, "batch_stats": False},
                           length=self.t)
        x1, _ = scan(f, x1, None)
        return x1


class RRCNNBlock(nn.Module):
    """1x1 channel map + two recurrent blocks + outer residual
    (reference models/segmentation_models/R2U_Net.py:36-48)."""

    features: int
    t: int = 2
    use_scan: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv_1x1")(x)
        x1 = RecurrentBlock(self.features, t=self.t, use_scan=self.use_scan,
                            dtype=self.dtype, name="rcnn1")(x, train)
        x1 = RecurrentBlock(self.features, t=self.t, use_scan=self.use_scan,
                            dtype=self.dtype, name="rcnn2")(x1, train)
        return x + x1


class ClassifierHead(nn.Module):
    """Dropout(p) + Linear(num_classes) — the transfer-learning head the
    reference swaps onto every classifier (utils/helpers.py:124-144)."""

    num_classes: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train, name="dropout")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
