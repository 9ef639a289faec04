from medseg_tpu.utils.profiling import StepTimer, trace_context  # noqa: F401
from medseg_tpu.utils.debug import nan_check_mode, assert_finite  # noqa: F401
