from merlot_reserve_tpu.models.model import (  # noqa: F401
    MerlotReserve,
    PretrainedMerlotReserve,
)
from merlot_reserve_tpu.models.pretrainer import (  # noqa: F401
    MerlotReservePretrainer,
    loss_fn_given_preds,
)
