"""Plotting — parity with the reference's matplotlib output.

`simulation_blaster.py:109-128` plots position, POC, Euler angles and
gimbal angles after the run; `Jacobian_POC_Solver._simulateBlastPlot`
(`Jacobian_POC_Solver.py:192-225`) draws the 3-D jet trajectory. Same
figures here, off the ClosedLoopResult / jet solver outputs, plus a
controls figure the reference lacks. Headless-safe (Agg backend).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from mpc_blaster_tpu import config as cfg  # noqa: E402


def plot_closed_loop(result, dt: float, path: Optional[str] = None):
    """4-panel figure: position, POC, Euler, gimbal (reference panels) +
    rotor thrusts."""
    xs = np.asarray(result.xs)
    us = np.asarray(result.us)
    t = np.arange(xs.shape[0]) * dt

    fig, axes = plt.subplots(5, 1, figsize=(9, 14), sharex=True)
    for i, lbl in enumerate("xyz"):
        axes[0].plot(t, xs[:, i], label=lbl)
    axes[0].set_ylabel("position [m]"); axes[0].legend()
    for i, lbl in zip(range(14, 17), ("POC_x", "POC_y", "POC_z")):
        axes[1].plot(t, xs[:, i], label=lbl)
    axes[1].set_ylabel("POC [m]"); axes[1].legend()
    for i, lbl in zip(range(3, 6), ("phi", "theta", "psi")):
        axes[2].plot(t, xs[:, i], label=lbl)
    axes[2].set_ylabel("euler [rad]"); axes[2].legend()
    for i, lbl in zip(range(12, 14), ("alpha1", "alpha2")):
        axes[3].plot(t, xs[:, i], label=lbl)
    axes[3].set_ylabel("gimbal [rad]"); axes[3].legend()
    for i in range(4):
        axes[4].plot(t[:-1], us[:, i], label=f"T{i+1}")
    axes[4].set_ylabel("thrust [N]"); axes[4].set_xlabel("t [s]")
    axes[4].legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig


def plot_jet_trajectory(euler, alpha, position, stream_velocity=150.0,
                        drag=1.0, n_points: int = 120,
                        path: Optional[str] = None):
    """3-D jet trajectory from nozzle to ground (the reference's
    `_simulateBlastPlot`), using the closed-form solution."""
    import jax.numpy as jnp

    from mpc_blaster_tpu.poc.jet import jet_init_conditions, jet_state
    from mpc_blaster_tpu.poc.solver import time_of_impact

    init = jet_init_conditions(jnp.asarray(euler), jnp.asarray(alpha),
                               jnp.asarray(position), stream_velocity)
    T = float(time_of_impact(init, drag))
    ts = np.linspace(0.0, T, n_points)
    pts = np.stack([np.asarray(jet_state(jnp.asarray(t), init, drag)[0:3])
                    for t in ts])

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot3D(pts[:, 0], pts[:, 1], pts[:, 2])
    ax.scatter(*pts[-1], color="r", label="POC")
    ax.set_xlabel("X"); ax.set_ylabel("Y"); ax.set_zlabel("Z")
    ax.legend()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig
