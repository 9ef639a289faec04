"""Sharded evaluation on the 8-virtual-device mesh: per-sample metric
semantics must be preserved when batches shard across devices."""

import numpy as np
import pytest

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
