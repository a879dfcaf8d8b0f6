from mpc_blaster_tpu.qp.data import QPData, QPSolution  # noqa: F401
from mpc_blaster_tpu.qp.riccati import lqr_solve  # noqa: F401
from mpc_blaster_tpu.qp.ipm import box_qp_solve  # noqa: F401
