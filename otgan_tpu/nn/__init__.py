from otgan_tpu.nn.layers import (
    Scope,
    make_module,
    dense,
    conv2d,
    global_avg_pool,
    apply_pre_activation,
    nn_upsample,
    glu,
    l2_normalize_rows,
    save_point,
    save_point_half,
)
from otgan_tpu.nn.optim import (
    adam_init,
    adam_update,
    adamax_init,
    adamax_update,
    nesterov_init,
    nesterov_update,
    make_optimizer,
)
from otgan_tpu.nn.ema import ema_init, ema_update
