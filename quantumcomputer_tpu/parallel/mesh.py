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


def comm_domain(dev) -> int:
    """Communication domain of a device: devices in the same domain talk
    over ICI; crossing domains rides DCN.  TPU slices expose slice_index;
    multi-host CPU/GPU fall back to process_index; single-domain otherwise."""
    for attr in ("slice_index", "process_index"):
        v = getattr(dev, attr, None)
        if v is not None:
            return int(v)
    return 0


def order_devices_for_ici(devices: Sequence) -> list:
    """Order devices so ICI neighbors occupy the LOW mesh-index bits.

    The sharded engine's collectives are ppermute exchanges at offset 2^p
    for global-qubit bit p (parallel/sharded.py).  Grouping each comm
    domain (slice/host) contiguously puts the bits below
    log2(devices_per_domain) entirely intra-domain, so those butterflies
    ride ICI; only the top mesh bits — the RAREST exchanges for circuits
    that keep hot qubits low — cross the DCN (SURVEY.md §5, distributed
    communication backend)."""
    return sorted(devices, key=lambda dv: (comm_domain(dv), getattr(dv, "id", 0)))


def build_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over 2^d devices (state sharding needs a power of two),
    ordered so intra-slice (ICI) neighbors take the low mesh bits and DCN
    crossings only occur on the high bits.

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
    devices = order_devices_for_ici(devices)
    d = len(devices).bit_length() - 1
    if len(devices) != 1 << d:
        if explicit:
            raise ValueError(
                f"state sharding needs a power-of-two device count, got {len(devices)}"
            )
        devices = devices[: 1 << d]
    return Mesh(np.array(devices), (AXIS,))


def ici_degree(mesh: Mesh) -> int:
    """Number of LOW global-qubit bits whose exchanges stay intra-domain
    (ICI) under this mesh's device order; bits >= this cross DCN."""
    devs = list(mesh.devices.ravel())
    domains = [comm_domain(dv) for dv in devs]
    if len(set(domains)) <= 1:
        return mesh_degree(mesh)
    per = len(devs) // len(set(domains))
    b = max(per, 1).bit_length() - 1
    # verify the ordering actually groups domains contiguously
    for start in range(0, len(devs), 1 << b):
        if len({domains[i] for i in range(start, min(start + (1 << b), len(devs)))}) > 1:
            return 0
    return b


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
