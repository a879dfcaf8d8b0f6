from mpc_blaster_tpu.io.flight import (  # noqa: F401
    AttitudeTarget,
    CollectAdapter,
    FlightNode,
    thruster_cumul,
)
from mpc_blaster_tpu.io.telemetry import PoseProbe, PoseSample  # noqa: F401
