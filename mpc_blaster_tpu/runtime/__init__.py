from mpc_blaster_tpu.runtime.bindings import (  # noqa: F401
    NativeQPSolver,
    PoseRingBuffer,
    RateLoop,
    load_native,
    native_available,
)
