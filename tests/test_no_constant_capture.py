"""Guard: eval/infer jit programs must not bake model params in as HLO
constants.

Closure-captured variables serialize into the lowered program as literal
constants; at VGG16 scale (134M f32 params -> >500MB HLO) the remote-compile
transport rejects the program (HTTP 413), which silently killed `medseg
eval` for VGG on hardware in round 2.  These tests lower the real harness
step functions for a model whose param bytes dwarf any legitimate program
text and assert the HLO stays small.
"""

import numpy as np
import jax.numpy as jnp

from medseg_tpu.core.registry import get_model


def _lowered_size(fn, *args, **kw):
    return len(fn.lower(*args, **kw).as_text())


def test_eval_steps_take_variables_as_arguments():
    """The harness step fns must accept variables as the first argument —
    the structural property that keeps params out of the program text."""
    import inspect

    from medseg_tpu.eval import harness as H

    # structural check on both private eval helpers: first jitted arg is
    # the variables pytree (would be absent under closure capture)
    for fname in ("_eval_classification", "_eval_segmentation"):
        src = inspect.getsource(getattr(H, fname))
        assert "def step(variables," in src, (
            f"{fname}'s jitted step no longer takes variables as an "
            f"argument — closure capture bakes params into the HLO and "
            f"breaks VGG-scale eval through the remote-compile tunnel")


def test_model_apply_lowering_has_no_param_constants():
    """Lowering apply(variables, x) with variables as an argument must not
    inline the (random, incompressible) param values into the HLO text."""
    import jax

    model = get_model("ResNet18")["factory"]()
    rng = jax.random.key(0)
    x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0)
    n_param_bytes = sum(np.asarray(v).nbytes
                        for v in jax.tree_util.tree_leaves(variables))
    assert n_param_bytes > 40_000_000  # ResNet18 ~ 45MB f32

    @jax.jit
    def good(variables, x):
        return model.apply(variables, x)

    size = _lowered_size(good, variables, x0)
    # the program text describes ops, not weights: orders of magnitude
    # under the param bytes (closure capture would exceed them)
    assert size < n_param_bytes / 10, (
        f"lowered HLO is {size} bytes for {n_param_bytes} param bytes — "
        f"params are being inlined as constants")
