from merlot_reserve_tpu.parallel.mesh import make_mesh  # noqa: F401
from merlot_reserve_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    opt_state_shardings,
    state_shardings,
)
