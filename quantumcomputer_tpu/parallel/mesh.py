"""Device mesh + sharding policy for the distributed state vector.

The 2^n amplitude vector is sharded over its *leading global index bits*:
with D = 2^d devices on a 1D mesh axis 'q', device k holds the contiguous
index range [k * 2^(n-d), (k+1) * 2^(n-d)) — equivalently, the top d qubits
[n-d, n) are "global" (their bit value selects the device), the rest are
shard-local.  This is the quantum-simulator analog of tensor/sequence
parallelism (SURVEY.md §2): gates on local qubits run shard-local; gates on
global qubits exchange whole shards over ICI via collective_permute.

The reference has no distributed story (single-threaded by design,
Report §IV.D); this module is a pure build deliverable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "q"


def build_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over 2^d devices (state sharding needs a power of two).

    An explicitly requested non-power-of-two device count is an error (a
    silently truncated mesh would surprise `--devices 6` users); with no
    explicit request, the largest power-of-two prefix of the available
    devices is used."""
    explicit = num_devices is not None or devices is not None
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            if num_devices > len(devices):
                raise ValueError(f"requested {num_devices} devices, only {len(devices)} available")
            devices = devices[:num_devices]
    devices = list(devices)
    d = len(devices).bit_length() - 1
    if len(devices) != 1 << d:
        if explicit:
            raise ValueError(
                f"state sharding needs a power-of-two device count, got {len(devices)}"
            )
        devices = devices[: 1 << d]
    return Mesh(np.array(devices), (AXIS,))


def mesh_degree(mesh: Mesh) -> int:
    """log2(number of devices) = number of global qubits."""
    D = mesh.shape[AXIS]
    d = D.bit_length() - 1
    assert D == 1 << d, f"mesh size {D} must be a power of two"
    return d


def state_sharding(mesh: Mesh) -> NamedSharding:
    """Planar (2, 2^n) state: shard the amplitude axis, replicate planes."""
    return NamedSharding(mesh, P(None, AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
