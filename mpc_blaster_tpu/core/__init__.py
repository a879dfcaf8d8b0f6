from mpc_blaster_tpu.core import htm as htm  # noqa: F401
from mpc_blaster_tpu.core import rotations as rotations  # noqa: F401
