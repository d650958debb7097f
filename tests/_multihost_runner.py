"""Subprocess body for the multi-host test (tests/test_multihost.py).

Runs as one of two cooperating processes: initializes jax.distributed
against a shared coordinator, builds a global mesh over both processes'
CPU devices, and validates:

1. cross-host collective arithmetic (global sum over a host-sharded array);
2. per-host Loader shards covering the dataset exactly once globally;
3. a jitted train-like step on host-sharded data whose gradient (psum'd by
   XLA under the sharding) matches the single-process value.

Prints "PROC <i> OK" on success; any assertion kills the exit code.
"""

import sys

pid = int(sys.argv[1])
port = sys.argv[2]
store_path = sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))

# --- 1. cross-host collective: global sum of host-contributed rows ---
local = np.full((2, 4), float(pid), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local)
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == 8.0, float(total)  # 8 zeros + 8 ones

# --- 2. per-host loader shards cover the store exactly once globally ---
from medical_image_segmentation_tpu.data.loader import SEQUENTIAL, Loader

loader = Loader(store_path, batch_size=4, order=SEQUENTIAL,
                shard=(jax.process_index(), jax.process_count()),
                use_native=False, prefetch=0)
local_labels = np.concatenate([l for _, l in loader])
g_labels = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local_labels.astype(np.float32)
)
label_sum = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(g_labels)
assert float(label_sum) == float(np.arange(16).sum()), float(label_sum)

# --- 3. gradient psum-by-sharding matches single-process math ---
w = jnp.ones((4, 4))


def loss(w, x):
    return jnp.mean((x @ w) ** 2)


local_x = np.full((2, 4), 1.0 + pid, np.float32)  # host0: ones, host1: twos
gx = jax.make_array_from_process_local_data(sharding, local_x)
grad = jax.jit(jax.grad(loss), out_shardings=NamedSharding(mesh, P()))(w, gx)
# single-process reference
ref_x = np.concatenate([np.full((2, 4), 1.0), np.full((2, 4), 2.0)]).astype(np.float32)
ref = jax.jit(jax.grad(loss))(np.ones((4, 4), np.float32), ref_x)
np.testing.assert_allclose(np.asarray(grad), np.asarray(ref), rtol=1e-6)

# --- 4. production shard_batch assembles global arrays from per-host shards ---
from medical_image_segmentation_tpu.parallel.mesh import make_mesh, shard_batch

mesh2 = make_mesh()
local_batch = np.full((2, 4), float(pid), np.float32)
out = shard_batch(mesh2, {"x": local_batch})
assert out["x"].shape == (4, 4), out["x"].shape  # global, not local
s2 = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh2, P()))(out["x"])
assert float(s2) == 8.0, float(s2)

# indivisible multi-host batches must raise the clear error, not mis-shard
try:
    shard_batch(mesh2, {"x": np.zeros((3, 4), np.float32)})
    raise AssertionError("expected ValueError for indivisible multi-host batch")
except ValueError:
    pass

print(f"PROC {pid} OK")
