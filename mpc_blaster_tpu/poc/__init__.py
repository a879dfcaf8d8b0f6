from mpc_blaster_tpu.poc.jet import jet_state, jet_init_conditions  # noqa: F401
from mpc_blaster_tpu.poc.solver import (  # noqa: F401
    PocSolver,
    poc_jacobians,
    solve_poc,
    time_of_impact,
)
