"""Multi-host (multi-process) execution: jax.distributed setup helpers.

The reference is single-threaded (SURVEY.md §2.5); this is the DCN side of
the framework's scale-out story. Within a pod slice, collectives ride ICI
(parallel/dist.py meshes); across hosts/slices, `jax.distributed` attaches
every process to one global runtime so the same `shard_map` code runs over
the global device set — the Merkle `all_gather` then crosses DCN
transparently.

Tested for real (not mocked) in tests/test_multihost.py: two local
processes on the CPU backend form one 8-device global mesh and must produce
a sharded Merkle root bit-identical to the single-process build.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: int | None = None) -> None:
    """Attach this process to the global JAX runtime.

    coordinator_address: "host:port" of process 0.
    local_device_count: for CPU-backend testing, how many virtual devices
    this process contributes (TPU backends discover their own devices).
    """
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "data") -> jax.sharding.Mesh:
    """1-D mesh over every device in the global (multi-process) runtime."""
    return jax.make_mesh((len(jax.devices()),), (axis,))


def is_primary() -> bool:
    return jax.process_index() == 0
