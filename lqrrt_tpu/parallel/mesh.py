"""Device mesh construction helpers.

The reference has no distributed anything (SURVEY.md section 2.4); the new
framework scales over a jax.sharding.Mesh with XLA collectives riding ICI —
the TPU-native equivalent of an NCCL backend (SURVEY.md section 5.8).

Mesh axes:
  "dp"       — candidate-batch data parallelism (P1): each device samples and
               steers a shard of the round's candidate batch.
  "scenario" — fleet parallelism (P4): independent planner instances
               (1k-boat replanning config) sharded across devices.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D mesh over the first n_devices local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_fleet_mesh(n_devices: int | None = None) -> Mesh:
    return make_mesh(n_devices, axis="scenario")


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host bring-up (P5): jax.distributed.initialize.

    On a real pod slice every host calls this before building the mesh; all
    jax.devices() then spans the slice and collectives ride ICI/DCN.  No-op
    when everything is single-process (the common dev path).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis))
