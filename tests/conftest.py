"""Test configuration: run everything on a virtual 8-device CPU mesh with f64.

The reference has no tests at all (see SURVEY.md §4); our strategy is:
  - unit tests of dynamics/kinematics vs scipy f64 references,
  - FD-vs-autodiff Jacobian checks,
  - QP KKT-residual tests,
  - SQP convergence + golden closed-loop trajectories,
  - sharding tests on a fake 8-device CPU mesh.

NOTE: in this image a sitecustomize preimports jax and pins the real-TPU
platform, so env vars alone are too late — we must use jax.config.update.
XLA_FLAGS is still honored because the CPU client initializes lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
