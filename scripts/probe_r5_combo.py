"""r5 diagnosis 7: combinations at the unstable N=20 sim config:
{hard, soft} x {preset Qt, LQR Qt}. Expect soft (feasibility repair) and
LQR terminal (short-horizon stability) to address different halves."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from mpc_blaster_tpu import config as cfg  # noqa: E402
from mpc_blaster_tpu.ocp.spec import build_spec  # noqa: E402
from mpc_blaster_tpu.qp.soft import SoftBounds  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import probe_r5_infeas as pi  # noqa: E402
from probe_r5_terminal import lqr_terminal  # noqa: E402


def main():
    sim = cfg.simulation_preset()
    n = 20
    ocp = dataclasses.replace(
        sim.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(sim.ocp.solver,
                                   qp_backend="riccati", ipm_iters=8))
    spec = build_spec(ocp, yref=sim.loop.yref, dtype=jnp.float32)
    Qt = lqr_terminal(ocp, spec)
    soft = SoftBounds.state_bounds(n, cfg.NX, cfg.NU, Zl=1e4, zl=1e3)

    for tag, qt, sf in (("hard+presetQt", None, None),
                        ("hard+lqrQt", Qt, None),
                        ("soft+presetQt", None, soft),
                        ("soft+lqrQt", Qt, soft)):
        err, eq, viol = pi.loop(ocp, sim.loop.yref, soft=sf, qt_override=qt)
        print(f"{tag:16s} final={err[-1]:.4f} tailmax={err[-50:].max():.4f} "
              f"eq={eq[-50:].max():.2e} violmax={viol.max():.4f}",
              flush=True)


if __name__ == "__main__":
    main()
