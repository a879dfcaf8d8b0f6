"""Worker process for the 2-process jax.distributed test.

Launched by `tests/test_distributed.py::test_two_process_sharded_rti` as
`python distributed_worker.py <coordinator> <num_procs> <pid>`. Each
process owns 4 virtual CPU devices; the global mesh spans 8 devices across
both processes — a faithful miniature of the BASELINE.md pod-scale layout
(host-sharded scenario batch, local QP solves, cross-host reductions).
Prints one "RESULT <json>" line for the parent to assert on.
"""
import json
import os
import sys


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from mpc_blaster_tpu.parallel.distributed import (
        global_mesh, host_local_batch, initialize, make_global_array)

    ok = initialize(coordinator_address=coordinator,
                    num_processes=num_procs, process_id=pid)
    assert ok, "distributed initialize failed"
    assert jax.process_count() == num_procs
    assert jax.device_count() == 4 * num_procs
    assert jax.local_device_count() == 4

    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.parallel.mesh import sharded_rti_step
    from mpc_blaster_tpu.sqp.rti import init_rti_state

    dtype = jnp.float32
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=8, Tf=8 / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)

    mesh = global_mesh()
    B_global = 16
    B_local = host_local_batch(B_global)
    assert B_local == 8

    # every process draws the FULL deterministic scenario set, then keeps
    # its host shard — so the global problem is process-count invariant
    rng = np.random.default_rng(0)
    x0s_all = np.zeros((B_global, cfg.NX), dtype=np.float32)
    x0s_all[:, 0:3] = rng.uniform(-0.3, 0.3, (B_global, 3))
    x0s_all[:, 2] += 2.0
    lo = pid * B_local
    x0s_local = x0s_all[lo:lo + B_local]

    x0s = make_global_array(x0s_local, mesh)
    states_local = jax.vmap(
        lambda x: init_rti_state(ocp, jnp.asarray(x), dtype))(
            jnp.asarray(x0s_local))
    states = jax.tree.map(lambda a: make_global_array(np.asarray(a), mesh),
                          states_local)

    step = sharded_rti_step(ocp, mesh, dtype=dtype)
    u0s, new_states, mean_step, worst_kkt = step(spec, states, x0s)
    jax.block_until_ready(u0s)

    # cross-process reductions must agree bitwise on every process
    local_u0 = np.asarray(
        [s.data for s in u0s.addressable_shards]).reshape(-1, cfg.NU)
    print("RESULT " + json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "mean_step": float(mean_step),
        "worst_kkt": float(worst_kkt),
        "local_u0_mean": float(local_u0[:, 0:4].mean()),
        "finite": bool(np.isfinite(local_u0).all()),
    }), flush=True)


if __name__ == "__main__":
    main()
