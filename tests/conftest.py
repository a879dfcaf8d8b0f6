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

# Opt-in persistent compilation cache for repeat local runs. Measured ~15%
# on this box (execution, not compile, dominates several suites) and the
# XLA:CPU AOT loader spams machine-feature warnings when reloading, so it
# stays off by default; enable with MPC_TEST_CACHE=1 when iterating.
if os.environ.get("MPC_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache_cpu_tests"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
