"""Task library: waypoint tracking, figure-8, blasting — BASELINE.md configs.

The reference only ever tracks a fixed setpoint (`simulation_blaster.py:48`,
`mavros_blaster_sim.py:61`). These tasks exercise the same controller on the
benchmark configurations: a time-varying figure-8 reference (config 2) and
the nozzle-pointing blasting task with live POC Jacobians (config 3). The
tracking loop streams a waypoint window over the horizon with
`lax.dynamic_slice` inside the scan — fully on-device, no host round-trips.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ocp.spec import OCPSpec, build_spec, total_cost
from mpc_blaster_tpu.sqp.rti import RTIState, init_rti_state, rti_step


class TrackingResult(NamedTuple):
    xs: jnp.ndarray      # (Nsim+1, nx)
    us: jnp.ndarray      # (Nsim, nu)
    refs: jnp.ndarray    # (Nsim, nx) stage-0 reference per tick
    kkt_stat: jnp.ndarray
    kkt_eq: jnp.ndarray


def figure8_refs(n_points: int, dt: float, amplitude_x: float = 1.0,
                 amplitude_y: float = 0.75, period_s: float = 12.0,
                 z: float = 2.0) -> np.ndarray:
    """(n_points, nx) state references along a lemniscate at altitude z."""
    t = np.arange(n_points) * dt
    w = 2.0 * np.pi / period_s
    refs = np.zeros((n_points, cfg.NX))
    refs[:, 0] = amplitude_x * np.sin(w * t)
    refs[:, 1] = amplitude_y * np.sin(2.0 * w * t)
    refs[:, 2] = z
    # velocity feedforward (consistent reference derivative)
    refs[:, 6] = amplitude_x * w * np.cos(w * t)
    refs[:, 7] = amplitude_y * 2.0 * w * np.cos(2.0 * w * t)
    return refs


def make_tracking_loop(ocp: cfg.OCPConfig, n_steps: int, dtype=jnp.float32,
                       plant_substeps: int = 1, warm_start: bool = False):
    """run(spec, x0, ref_traj) with ref_traj (n_steps + N + 1, nx).

    Per tick i the controller tracks stage references ref_traj[i+1 : i+N+1]
    (terminal = last of the window), mirroring how the reference would be
    fed in a receding-horizon deployment.

    warm_start=True carries IPM slack/dual warm starts between ticks; pair
    with reduced `ocp.solver.ipm_iters` (and `qp_backend="pallas"` on TPU)
    for the latency-critical deployment loop.
    """
    params = BlasterParams.from_config(ocp.model, dtype)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    F_plant = discrete_dynamics(blaster_ode, ocp.dt,
                                num_steps=plant_substeps)
    solver = ocp.solver
    N = ocp.N

    @jax.jit
    def run(spec: OCPSpec, x0: jnp.ndarray, ref_traj: jnp.ndarray
            ) -> TrackingResult:
        x0 = jnp.asarray(x0, dtype)
        ref_traj = jnp.asarray(ref_traj, dtype)
        rti0 = init_rti_state(ocp, x0, dtype)
        plant_params = spec.stage_params[0]

        def window_spec(i):
            window = jax.lax.dynamic_slice(
                ref_traj, (i + 1, 0), (N, cfg.NX))
            return spec._replace(yref_x=window, yref_e=window[-1]), window

        if warm_start:
            from mpc_blaster_tpu.qp.ipm import IpmWarmStart
            from mpc_blaster_tpu.sqp.rti import rti_step_warm
            warm0 = IpmWarmStart.zeros(N, cfg.NX, cfg.NU, dtype)
            warm0 = jax.tree.map(lambda a: a + 0.0 * x0[0], warm0)

            def tick(carry, i):
                state, warm, x = carry
                spec_i, window = window_spec(i)
                u0, state_new, warm_new, diag = rti_step_warm(
                    spec_i, state, warm, x, params, F, solver)
                x_next = F_plant(x, u0, plant_params, params)
                out = (x_next, u0, window[0], diag.qp_kkt_stat,
                       diag.qp_kkt_eq)
                return (state_new, warm_new, x_next), out

            _, (xs, us, refs, stat, eq) = jax.lax.scan(
                tick, (rti0, warm0, x0), jnp.arange(n_steps))
        else:
            def tick(carry, i):
                state, x = carry
                spec_i, window = window_spec(i)
                u0, state_new, diag = rti_step(spec_i, state, x, params, F,
                                               solver)
                x_next = F_plant(x, u0, plant_params, params)
                out = (x_next, u0, window[0], diag.qp_kkt_stat,
                       diag.qp_kkt_eq)
                return (state_new, x_next), out

            _, (xs, us, refs, stat, eq) = jax.lax.scan(
                tick, (rti0, x0), jnp.arange(n_steps))
        xs = jnp.concatenate([x0[None], xs], axis=0)
        return TrackingResult(xs=xs, us=us, refs=refs, kkt_stat=stat,
                              kkt_eq=eq)

    return run


def run_figure8(preset: Optional[cfg.Preset] = None, n_steps: int = 240,
                dtype=jnp.float32, warm_start: bool = False,
                **fig_kwargs) -> TrackingResult:
    """BASELINE config 2: figure-8 waypoint tracking, single trajectory."""
    preset = preset or cfg.simulation_preset()
    ocp = preset.ocp
    refs = figure8_refs(n_steps + ocp.N + 1, ocp.dt, **fig_kwargs)
    spec = build_spec(ocp, dtype=dtype)
    run = make_tracking_loop(ocp, n_steps, dtype=dtype,
                             warm_start=warm_start)
    x0 = np.zeros(cfg.NX)
    x0[0:3] = refs[0, 0:3]
    x0[6:9] = refs[0, 6:9]
    return run(spec, jnp.asarray(x0, dtype), jnp.asarray(refs, dtype))


def run_blasting(preset: Optional[cfg.Preset] = None, n_steps: int = 200,
                 dtype=jnp.float32):
    """BASELINE config 3: nozzle-pointing task with live POC Jacobians.

    Full pipeline: jet POC solve + Jacobians at the hover pose -> 25-dim
    stage parameters -> NMPC drives position AND point-of-contact targets
    (the reference's `simulation_blaster.py` wiring, but with the POC
    linearized at the actual operating pose instead of the canonical one).
    """
    from mpc_blaster_tpu.dynamics.blaster import pack_stage_params
    from mpc_blaster_tpu.poc.solver import PocSolver
    from mpc_blaster_tpu.sim.closedloop import make_closed_loop

    preset = preset or cfg.simulation_preset()
    ocp = preset.ocp
    solver = PocSolver.from_config(preset.poc)
    # Linearize at the task's hover pose (z = 3.5 target altitude).
    solver.solve_jacobians(jnp.zeros(3), jnp.zeros(2),
                           jnp.asarray([0.0, 0.0, 3.5]))
    j_mot, j_eul, j_pos = solver.get_jacobians()
    t_blast = 2.2 * 9.81 if ocp.quirks.hardcode_t_blast \
        else ocp.model.blast_thruster
    p = pack_stage_params(j_mot, j_eul, j_pos, t_blast)
    spec = build_spec(ocp, yref=preset.loop.yref,
                      stage_params=np.asarray(p), dtype=dtype)
    run = make_closed_loop(ocp, n_steps, dtype=dtype)
    return run(spec, jnp.asarray(preset.loop.x0, dtype)), solver
