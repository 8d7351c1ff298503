from merlot_reserve_tpu.parallel.comm import (  # noqa: F401
    collective_summary,
    parse_hlo_collectives,
    summarize_collectives,
)
from merlot_reserve_tpu.parallel.mesh import (  # noqa: F401
    activate_mesh,
    current_mesh,
    make_mesh,
)
from merlot_reserve_tpu.parallel.pipeline import pipeline_transformer  # noqa: F401
from merlot_reserve_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    opt_state_shardings,
    state_shardings,
)
