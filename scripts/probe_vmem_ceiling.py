"""Evidence probe for the round-3 VMEM discovery: the oft-quoted "16 MB
VMEM" is only XLA's default scoped reservation. This kernel allocates a
VMEM scratch buffer of the requested size, writes both ends, and checks
the values — on this v5e it passes up to 120 MB (physical VMEM is
128 MiB), which is why ops/pallas_ipm.py keeps the whole reference
envelope resident and requests its computed footprint via
CompilerParams(vmem_limit_bytes=...).

Run on the TPU: python scripts/probe_vmem_ceiling.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def try_mb(mb: float) -> bool:
    rows = int(mb * 1024 * 1024 / (128 * 4)) - 16

    def kernel(x_ref, o_ref, big):
        big[0] = x_ref[0]
        big[rows - 1] = x_ref[0] * 2.0
        o_ref[0] = big[rows - 1] + big[0]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((mb + 2) * 1024 * 1024)),
    )
    try:
        out = f(jnp.ones((1, 128), jnp.float32))
        return float(out[0, 0]) == 3.0
    except Exception as e:
        print(f"  {mb} MB failed: {str(e)[:160]}", flush=True)
        return False


if __name__ == "__main__":
    for mb in (16, 24, 32, 48, 64, 96, 120):
        ok = try_mb(mb)
        print(f"scratch {mb} MB: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            break
