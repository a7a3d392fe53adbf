"""Sharded Merkle build across every available device, with metrics and
checkpoint/resume.

Run:  python examples/multichip_merkle.py
(on a CPU-only host it forces an 8-device virtual mesh; on TPU it uses the
real chips and the fused kernel automatically.)
"""

import os
import tempfile

import jax

# Decide the platform WITHOUT initializing a backend: jax.default_backend()
# would (a) lock out the jax_num_cpu_devices update below and (b) block
# inside a TPU-relay plugin if the relay is down. An explicit TPU platform
# in the environment (e.g. a plugin name) is honored; otherwise force the
# 8-device virtual CPU mesh.
if os.environ.get("JAX_PLATFORMS", "cpu") in ("", "cpu"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from hades252_tpu.models.merkle import merkle_root
from hades252_tpu.parallel import dist
from hades252_tpu.utils import checkpoint, metrics
from hades252_tpu.utils.encoding import ints_to_digits

metrics.enable()

n = 1 << 8
leaves = jnp.asarray(ints_to_digits(list(range(n)), shape=(n,)))

# sharded build over all devices; root is bit-identical to single-device
mesh = dist.make_mesh()
root_sharded = dist.merkle_root_sharded(leaves, mesh)
root_single = merkle_root(leaves)
assert np.array_equal(np.asarray(root_sharded), np.asarray(root_single))
print(f"{n} leaves over {mesh.shape[dist.AXIS]} devices: roots match")

# checkpointed build: kill/restart-safe for long jobs
with tempfile.TemporaryDirectory() as d:
    root_ckpt = checkpoint.merkle_root_checkpointed(leaves, d)
    assert np.array_equal(np.asarray(root_ckpt), np.asarray(root_single))
    resumed = checkpoint.merkle_root_checkpointed(leaves, d)  # from disk
    assert np.array_equal(np.asarray(resumed), np.asarray(root_single))
print("checkpoint/resume: roots match")

print("--- metrics ---")
print(metrics.report())
