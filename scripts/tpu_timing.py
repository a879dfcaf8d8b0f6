"""Back-compat shim: the timing helpers live in the package now
(`mpc_blaster_tpu.utils.timing`) so bench.py and library users share one
validated methodology. See that module's docstring for why
block_until_ready cannot be trusted on the tunnel platform."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpc_blaster_tpu.utils.timing import (  # noqa: F401
    device_time, fetch_scalar, measure_rtt)
