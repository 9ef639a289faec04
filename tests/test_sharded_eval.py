"""Sharded evaluation on the 8-virtual-device mesh: per-sample metric
semantics must be preserved when batches shard across devices."""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

import jax

from medseg_tpu.core.registry import get_model
from medseg_tpu.data import BatchLoader, synthetic_seg
from medseg_tpu.eval import evaluate_model
from medseg_tpu.parallel import batch_sharding, data_parallel_mesh, replicated


def test_sharded_seg_eval_matches_single_device():
    mesh = data_parallel_mesh()
    ds = synthetic_seg(n=16, img_size=32)
    model = get_model("AttentionUNet")["factory"]()
    variables = model.init(jax.random.key(0),
                           np.zeros((1, 32, 32, 3), np.float32))

    plain = BatchLoader(ds, 8, shuffle=False)
    res_plain = evaluate_model("AttentionUNet", plain, variables,
                               log=lambda *_: None)

    sharded = BatchLoader(ds, 8, shuffle=False,
                          sharding=batch_sharding(mesh))
    v_repl = jax.device_put(variables, replicated(mesh))
    res_sharded = evaluate_model("AttentionUNet", sharded, v_repl,
                                 log=lambda *_: None)

    for k in res_plain:
        assert res_sharded[k] == pytest.approx(res_plain[k], rel=1e-4), k


def test_sharded_seg_eval_ragged_tail_matches_single_device():
    """13 samples / batch 8 -> final batch of 5 on an 8-device mesh: the
    loader pads by repeating the last sample, the harness trims the padded
    rows off the per-sample metric vectors — results must match the plain
    single-device pass exactly (no sample dropped, none double-counted)."""
    mesh = data_parallel_mesh()
    ds = synthetic_seg(n=13, img_size=32)
    model = get_model("AttentionUNet")["factory"]()
    variables = model.init(jax.random.key(0),
                           np.zeros((1, 32, 32, 3), np.float32))

    plain = BatchLoader(ds, 8, shuffle=False)
    res_plain = evaluate_model("AttentionUNet", plain, variables,
                               log=lambda *_: None)

    sharded = BatchLoader(ds, 8, shuffle=False)
    res_sharded = evaluate_model("AttentionUNet", sharded, variables,
                                 log=lambda *_: None, mesh=mesh)
    # the caller's loader must come back untouched (r3 advisor: eval used to
    # leave sharding+padding set, corrupting later mesh-less reuse)
    assert sharded.pad_to_multiple is None and sharded.sharding is None

    for k in res_plain:
        assert res_sharded[k] == pytest.approx(res_plain[k], rel=1e-4), k


def test_sharded_cls_eval_ragged_tail_matches_single_device():
    from medseg_tpu.data import synthetic_cls

    mesh = data_parallel_mesh()
    ds = synthetic_cls(n=13, img_size=32)
    model = get_model("ResNet18")["factory"]()
    variables = model.init(jax.random.key(0),
                           np.zeros((1, 32, 32, 3), np.float32))

    res_plain = evaluate_model("ResNet18", BatchLoader(ds, 8, shuffle=False),
                               variables, log=lambda *_: None)
    res_sharded = evaluate_model("ResNet18", BatchLoader(ds, 8, shuffle=False),
                                 variables, log=lambda *_: None, mesh=mesh)
    for k in ("accuracy", "precision", "recall", "f1"):
        assert res_sharded[k] == pytest.approx(res_plain[k], rel=1e-4), k
