from mpc_blaster_tpu.ocp.spec import OCPSpec, build_spec  # noqa: F401
from mpc_blaster_tpu.ocp.terminal import lqr_terminal_weight  # noqa: F401
