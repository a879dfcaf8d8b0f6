from mpc_blaster_tpu.qp.data import QPData, QPSolution  # noqa: F401
from mpc_blaster_tpu.qp.riccati import lqr_solve  # noqa: F401
from mpc_blaster_tpu.qp.ipm import (  # noqa: F401
    IpmWarmStart,
    box_qp_solve,
    warm_start_from,
)
from mpc_blaster_tpu.qp.pscan import lqr_solve_pscan  # noqa: F401
from mpc_blaster_tpu.qp.soft import (  # noqa: F401
    SoftBounds,
    SoftPenalty,
    SoftQPSolution,
    soft_box_qp_solve,
)
