from mpc_blaster_tpu.sim.closedloop import (  # noqa: F401
    ClosedLoopResult,
    closed_loop,
    make_closed_loop,
)
