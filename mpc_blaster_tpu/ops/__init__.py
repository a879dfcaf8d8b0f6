from mpc_blaster_tpu.ops.pallas_ipm import (  # noqa: F401
    pallas_available,
    pallas_box_qp_solve,
)
