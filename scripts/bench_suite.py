"""Full benchmark suite over the BASELINE.md configurations.

Measures, on the local device (TPU if available):
  1. hover single-solve latency (N=20)                 [config 1]
  2. figure-8 single-trajectory loop rate (N=30)       [config 2]
  3. blasting task closed-loop rate (N=30, live POC)   [config 3]
  4. batched scenario throughput, 4096 draws (N=20)    [config 4]
  5. sharded sweep over all local devices              [config 5 proxy]

Writes BENCH_SUITE.json at the repo root. Run in background on the TPU;
first compiles take minutes through the tunnel.
"""
# TIMING CAVEAT (round 3): this script predates the discovery that
# jax.block_until_ready does NOT reliably wait on the axon tunnel platform.
# Its absolute wall-clock numbers are unreliable; use
# mpc_blaster_tpu.utils.timing.device_time (fetch-based) for new work.
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.parallel.mesh import batched_rti_step, make_mesh, \
        sharded_rti_step
    from mpc_blaster_tpu.sqp.rti import init_rti_state, make_rti_step
    from mpc_blaster_tpu.sim.tasks import figure8_refs, make_tracking_loop
    from mpc_blaster_tpu.ops.pallas_ipm import pallas_available

    dtype = jnp.float32
    out = {"device": str(jax.devices()[0]),
           "n_devices": jax.device_count(),
           "pallas": pallas_available()}
    preset = cfg.simulation_preset()

    # 1. hover single-solve latency, N=20 (chained on-device)
    ocp20 = dataclasses.replace(preset.ocp, N=20, Tf=20 / 30.0)
    spec20 = build_spec(ocp20, yref=preset.loop.yref, dtype=dtype)
    step = make_rti_step(ocp20, dtype=dtype, jit=False)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0)
    st = init_rti_state(ocp20, x0, dtype)
    K = 64

    @jax.jit
    def chain(spec, st, x0):
        def body(c, _):
            u0, c2, _ = step(spec, c, x0)
            return c2, u0[0]
        s, _ = jax.lax.scan(body, st, None, length=K)
        return s

    lat = timeit(lambda: chain(spec20, st, x0)) / K
    out["hover_single_solve_ms_N20"] = round(lat * 1e3, 3)
    out["hover_single_solve_hz_N20"] = round(1.0 / lat, 1)

    # 2. figure-8 tracking loop, N=30 (the reference flight horizon)
    ocp30 = dataclasses.replace(preset.ocp, N=30, Tf=1.0)
    spec30 = build_spec(ocp30, dtype=dtype)
    n_steps = 60
    refs = jnp.asarray(figure8_refs(n_steps + ocp30.N + 1, ocp30.dt),
                       dtype)
    run = make_tracking_loop(ocp30, n_steps, dtype=dtype)
    # start ON the moving reference incl. velocity feedforward
    x0f_np = np.zeros(cfg.NX, np.float32)
    x0f_np[0:3] = np.asarray(refs[0, 0:3])
    x0f_np[6:9] = np.asarray(refs[0, 6:9])
    x0f = jnp.asarray(x0f_np, dtype)
    t = timeit(lambda: run(spec30, x0f, refs), reps=2)
    out["figure8_loop_rate_hz_N30"] = round(n_steps / t, 1)
    res = run(spec30, x0f, refs)
    err = np.linalg.norm(np.asarray(res.xs)[1:, 0:2]
                         - np.asarray(res.refs)[:, 0:2], axis=1)
    out["figure8_tracking_err_m_after_settle"] = round(float(
        err[30:].max()), 4)

    # 3. batched scenarios (config 4): 4096 draws, N=20
    B = 4096
    rng = np.random.default_rng(0)
    x0s = np.zeros((B, cfg.NX), np.float32)
    x0s[:, 0:3] = rng.uniform(-0.4, 0.4, (B, 3))
    x0s[:, 2] += 2.0
    x0s = jnp.asarray(x0s)
    states = jax.vmap(lambda x: init_rti_state(ocp20, x, dtype))(x0s)
    for backend in (["xla", "pallas"] if pallas_available() else ["xla"]):
        try:
            bstep = batched_rti_step(ocp20, dtype=dtype, backend=backend)
            t = timeit(lambda: bstep(spec20, states, x0s), reps=3)
            out[f"batched4096_solves_per_s_{backend}"] = round(B / t, 1)
        except Exception as e:
            out[f"batched4096_solves_per_s_{backend}"] = f"error: {e}"[:120]

    # 3b. flight-horizon batched throughput (N=30, pallas P-streaming mode)
    if pallas_available():
        try:
            spec30b = build_spec(ocp30, yref=preset.loop.yref, dtype=dtype)
            B30 = 1024
            x30 = jnp.asarray(x0s[:B30])
            st30 = jax.vmap(lambda x: init_rti_state(ocp30, x, dtype))(x30)
            pstep = batched_rti_step(ocp30, dtype=dtype, backend="pallas")
            t = timeit(lambda: pstep(spec30b, st30, x30), reps=3)
            out["batched1024_N30_solves_per_s_pallas"] = round(B30 / t, 1)
        except Exception as e:
            out["batched1024_N30_solves_per_s_pallas"] = f"error: {e}"[:120]

    # 4. sharded sweep over all local devices
    try:
        mesh = make_mesh()
        n_dev = jax.device_count()
        Bs = 128 * n_dev
        sstep = sharded_rti_step(ocp20, mesh, dtype=dtype)
        x0s_s = x0s[:Bs]
        states_s = jax.tree.map(lambda a: a[:Bs], states)
        t = timeit(lambda: sstep(spec20, states_s, x0s_s), reps=3)
        out["sharded_solves_per_s"] = round(Bs / t, 1)
        out["sharded_devices"] = n_dev
    except Exception as e:
        out["sharded_solves_per_s"] = f"error: {e}"[:120]

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_SUITE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
