"""Trustworthy device-latency measurement (TPU tunnel included).

`jax.block_until_ready` does NOT reliably wait on the remote-tunnel
("axon") TPU platform in this environment — measured: a 32-tick N=20
closed loop "completes" in 0.1 ms by block_until_ready while a value
fetch shows ~300 ms of device work in flight. The only sound completion
signal is a device->host VALUE transfer, which costs one tunnel
round-trip (RTT, ~20 ms here). Methodology:

    time(reps calls queued back-to-back; fetch ONE scalar from the last
    result) = reps * device_time + RTT
    => device_time = (total - RTT) / reps

with RTT measured on a trivial jitted op and `reps` chosen large enough
that the correction is small. Every hardware number in bench.py and
scripts/ goes through this helper. (The round-1/2 bench snapshots used
block_until_ready and are superseded; see bench.py's bridge note.)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def fetch_scalar(out) -> float:
    """Force completion: pull one scalar from an arbitrary pytree."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


_RTT_CACHE: dict = {}


def measure_rtt(reps: int = 10) -> float:
    """Dispatch+fetch round-trip floor for a trivial jitted op (cached)."""
    if "rtt" in _RTT_CACHE:
        return _RTT_CACHE["rtt"]
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    fetch_scalar(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_scalar(f(x))
        best = min(best, time.perf_counter() - t0)
    _RTT_CACHE["rtt"] = best
    return best


def device_time(fn, reps: int = 20, warmup: int = 2) -> float:
    """Seconds of device time per `fn()` call (RTT-corrected).

    `fn` must return a jax pytree; successive calls are queued without
    host sync (they serialize on the device), and one scalar fetch at the
    end forces completion of the whole queue.
    """
    rtt = measure_rtt()
    out = None
    for _ in range(max(warmup, 1)):
        out = fn()
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch_scalar(out)
    total = time.perf_counter() - t0
    return max(total - rtt, 1e-9) / reps
