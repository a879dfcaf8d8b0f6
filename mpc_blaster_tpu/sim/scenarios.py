"""Scenario generation + disturbance-robustness sweeps (BASELINE config 4).

The reference simulates exactly one nominal trajectory with a perfect model
(`simulation_blaster.py:56-107`). Production controller validation needs
fans of perturbed scenarios: initial-state draws, constant wind (model
mismatch: the controller's model does NOT see it), and target offsets. The
whole sweep — every scenario's full closed loop — is one vmapped/shardable
on-device computation.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ocp.spec import OCPSpec
from mpc_blaster_tpu.sqp.rti import init_rti_state, rti_step


class ScenarioBatch(NamedTuple):
    x0: jnp.ndarray        # (B, nx) initial states
    wind: jnp.ndarray      # (B, 3) constant wind acceleration [m/s^2]
    target: jnp.ndarray    # (B, 3) position targets


class SweepResult(NamedTuple):
    final_states: jnp.ndarray   # (B, nx)
    pos_err: jnp.ndarray        # (B,) final position error
    worst_kkt_eq: jnp.ndarray   # (B,)
    settled: jnp.ndarray        # (B,) bool: err < 0.25 m


def sample_scenarios(batch: int, seed: int = 0,
                     pos_spread: float = 0.4,
                     wind_max: float = 1.0,
                     target_spread: float = 0.3,
                     base_target=(0.0, 0.0, 3.5)) -> ScenarioBatch:
    rng = np.random.default_rng(seed)
    x0 = np.zeros((batch, cfg.NX), np.float32)
    x0[:, 0:2] = rng.uniform(-pos_spread, pos_spread, (batch, 2))
    x0[:, 2] = rng.uniform(0.0, 0.5, batch)
    wind = rng.uniform(-wind_max, wind_max, (batch, 3)).astype(np.float32)
    wind[:, 2] *= 0.3  # vertical gusts weaker
    target = (np.asarray(base_target, np.float32)
              + rng.uniform(-target_spread, target_spread,
                            (batch, 3)).astype(np.float32))
    target[:, 2] = np.clip(target[:, 2], 1.0, 4.5)
    return ScenarioBatch(x0=jnp.asarray(x0), wind=jnp.asarray(wind),
                         target=jnp.asarray(target))


def _windy_plant_ode(x, u, p, params, wind):
    """Plant-side model mismatch: constant wind acceleration on v."""
    xdot = blaster_ode(x, u, p, params)
    return xdot.at[cfg.IDX_V].add(wind)


def disturbance_sweep(spec: OCPSpec, ocp: cfg.OCPConfig,
                      scenarios: ScenarioBatch, n_steps: int = 120,
                      dtype=jnp.float32) -> SweepResult:
    """Closed loop per scenario: controller is blind to the wind and the
    per-scenario target enters through yref. Fully vmapped; jit once."""
    params = BlasterParams.from_config(ocp.model, dtype)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    solver = ocp.solver
    plant_p = spec.stage_params[0].at[-1].set(2.2 * 9.81)

    def plant(x, u, wind):
        return discrete_dynamics(
            lambda xx, uu, pp, par: _windy_plant_ode(xx, uu, pp, par, wind),
            ocp.dt, num_steps=1)(x, u, plant_p, params)

    def one(x0, wind, target):
        spec_i = spec._replace(
            yref_x=spec.yref_x.at[:, 0:3].set(target[None, :]),
            yref_e=spec.yref_e.at[0:3].set(target))
        st0 = init_rti_state(ocp, x0, dtype)

        def tick(carry, _):
            st, x = carry
            u0, st, diag = rti_step(spec_i, st, x, params, F, solver)
            x_next = plant(x, u0, wind)
            return (st, x_next), diag.qp_kkt_eq

        (_, x_fin), eqs = jax.lax.scan(tick, (st0, x0), None,
                                       length=n_steps)
        err = jnp.linalg.norm(x_fin[0:3] - target)
        return x_fin, err, jnp.max(eqs)

    finals, errs, kkts = jax.jit(jax.vmap(one))(
        jnp.asarray(scenarios.x0, dtype), jnp.asarray(scenarios.wind, dtype),
        jnp.asarray(scenarios.target, dtype))
    return SweepResult(final_states=finals, pos_err=errs,
                       worst_kkt_eq=kkts, settled=errs < 0.25)
