"""r5 diagnosis 8: morph the sim preset toward the flight preset at N=20
one knob at a time to find what flips the offset-free loop from hunting
(sim: ~1.4 m limit cycle) to settling (flight: 0.022 m)."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from mpc_blaster_tpu import config as cfg  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import probe_r5_infeas as pi  # noqa: E402


def main():
    sim = cfg.simulation_preset()
    fl = cfg.flight_preset()
    n = 20
    base = dataclasses.replace(
        sim.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(sim.ocp.solver,
                                   qp_backend="riccati", ipm_iters=8))
    fc = fl.ocp.cost
    fb = fl.ocp.bounds

    def show(tag, ocp, yref):
        err, eq, viol = pi.loop(ocp, yref)
        print(f"{tag:22s} final={err[-1]:.4f} tailmax={err[-50:].max():.4f} "
              f"eq={eq[-50:].max():.2e} violmax={viol.max():.4f}",
              flush=True)

    show("sim (hunt)", base, sim.loop.yref)
    show("+flight Q/Qt/R", dataclasses.replace(base, cost=fc),
         sim.loop.yref)
    show("+flight vbox", dataclasses.replace(
        base, bounds=dataclasses.replace(
            base.bounds, lbx=base.bounds.lbx[:6] + fb.lbx[6:9]
            + base.bounds.lbx[9:],
            ubx=base.bounds.ubx[:6] + fb.ubx[6:9] + base.bounds.ubx[9:])),
        sim.loop.yref)
    show("+flight yref", base, fl.loop.yref)
    show("+flight Q&vbox", dataclasses.replace(
        base, cost=fc, bounds=dataclasses.replace(
            base.bounds, lbx=base.bounds.lbx[:6] + fb.lbx[6:9]
            + base.bounds.lbx[9:],
            ubx=base.bounds.ubx[:6] + fb.ubx[6:9] + base.bounds.ubx[9:])),
        sim.loop.yref)
    # full flight at N=20 as the settling anchor
    show("flight anchor", dataclasses.replace(
        fl.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(fl.ocp.solver,
                                   qp_backend="riccati", ipm_iters=8)),
        fl.loop.yref)


if __name__ == "__main__":
    main()
