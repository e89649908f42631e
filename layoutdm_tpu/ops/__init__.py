from layoutdm_tpu.ops.log_math import (  # noqa: F401
    LOG_EPS,
    alpha_schedule,
    log_1_min_a,
    log_add_exp,
    log_onehot,
)
from layoutdm_tpu.ops.samplers import sample_tokens  # noqa: F401
