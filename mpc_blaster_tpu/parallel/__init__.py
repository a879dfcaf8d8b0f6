from mpc_blaster_tpu.parallel.mesh import (  # noqa: F401
    batched_rti_step,
    make_mesh,
    sharded_rti_step,
    sharded_sweep,
)
