from mpc_blaster_tpu.utils.metrics import SolveStats, summarize  # noqa: F401
from mpc_blaster_tpu.utils.profiling import Timer, trace  # noqa: F401
from mpc_blaster_tpu.utils.checkpoint import (  # noqa: F401
    load_pytree,
    save_pytree,
)
