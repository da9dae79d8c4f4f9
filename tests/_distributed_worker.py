"""Worker for the 2-process jax.distributed test (spawned by test_parallel).

Each process owns 2 virtual CPU devices; after init_distributed the global
mesh spans 4 devices across the 2 processes (the DCN shape: process axis =
cross-host, local axis = ICI). Verifies a cross-host collective and a
global-array reduction, printing RESULT lines the parent asserts on.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opticommpy_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    is_multihost,
    local_device_count,
)


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    proc_index, proc_count = init_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid)
    assert proc_index == pid and proc_count == 2
    assert is_multihost()
    assert local_device_count() == 2
    devices = jax.devices()
    assert len(devices) == 4, len(devices)

    # DCN-shaped mesh: hosts (processes) x local devices
    mesh = Mesh(np.array(devices).reshape(2, 2), ("host", "local"))

    # global (8,) array sharded over both axes; each process materializes
    # only its addressable half
    gshape = (8,)
    sharding = NamedSharding(mesh, P(("host", "local"),))
    global_data = np.arange(8, dtype=np.float32)
    arr = jax.make_array_from_callback(
        gshape, sharding, lambda idx: global_data[idx])

    @jax.jit
    def total(x):
        return jnp.sum(x)  # pjit inserts the cross-host psum

    s = float(total(arr))
    print(f"RESULT sum {pid} {s}", flush=True)

    # explicit shard_map collective across the host (DCN) axis
    from functools import partial
    from jax.experimental.shard_map import shard_map

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(("host", "local"),),
             out_specs=P())
    def host_psum(x):
        return jax.lax.psum(jnp.sum(x), ("host", "local"))

    s2 = float(jnp.ravel(host_psum(arr))[0])
    print(f"RESULT psum {pid} {s2}", flush=True)


if __name__ == "__main__":
    main()
