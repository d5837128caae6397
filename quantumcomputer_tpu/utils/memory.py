"""Device memory model: how much HBM a compiled program may claim.

Round 2 hard-coded a 16 GB v5e (14.5 GiB usable) into both the fusion
planner and the benchmark sizing, so a 32 GB v4 or 95 GB v5p would
under-fuse and under-size.  This module derives the budget from the
device's own report (`memory_stats()["bytes_limit"]` — the XLA allocator's
actual HBM pool, already net of runtime reservations), falling back to the
measured v5e value when the backend exposes no stats (CPU, some tunnels).

The reference has no memory model at all — it mallocs two state vectors
and hopes (qc_shor.c:1316-1321, ALLOC_CHECK never aborts); here the budget
gates which kernel forms (in-place vs out-of-place) a program may use.
"""

from __future__ import annotations

import os
from typing import Optional

# Measured usable HBM on a 16 GB v5e: the XLA pool minus runtime/scoped
# reservations that round-2 sizing validated at the n=30 ceiling.
_V5E_FALLBACK = int(14.5 * (1 << 30))

# Fraction of the allocator pool a single program may plan to occupy:
# leaves headroom for the program's own temporaries (collective buffers,
# donation copies the tunnel may force) on parts where bytes_limit is the
# full pool.  14.5 GiB / v5e's ~15.7 GB pool ~= 0.92.
_USABLE_FRACTION = 0.92

_cached: Optional[int] = None


def device_hbm_budget(device=None) -> int:
    """Usable per-chip HBM budget in bytes for program planning.

    Order of precedence: QC_TPU_HBM_BYTES env override (testing / unusual
    deployments), the device's memory_stats()["bytes_limit"] scaled by the
    usable fraction, then the v5e fallback."""
    global _cached
    env = os.environ.get("QC_TPU_HBM_BYTES")
    if env:
        try:
            val = int(env)
        except ValueError:
            val = -1
        if val > 0:
            return val
        # Malformed or non-positive: fall back rather than raising an
        # uncontextualized ValueError (or a zero budget that fails every
        # fits() check) from deep inside program planning.
        from quantumcomputer_tpu.utils.logging import get_logger

        get_logger("memory").warning(
            "ignoring invalid QC_TPU_HBM_BYTES=%r (want a positive byte count)", env
        )
    if device is None:
        if _cached is not None:
            return _cached
    limit = _query_bytes_limit(device)
    budget = int(limit * _USABLE_FRACTION) if limit else _V5E_FALLBACK
    if device is None:
        _cached = budget
    return budget


def _query_bytes_limit(device=None) -> Optional[int]:
    import jax

    try:
        dev = device if device is not None else jax.local_devices()[0]
    except Exception:
        return None
    if getattr(dev, "platform", None) != "tpu" and device is None:
        # CPU/GPU hosts report host RAM (or nothing); planning against host
        # RAM would let TPU-sized programs "fit" in tests — keep the v5e
        # fallback so planner decisions match the target hardware.
        return None
    stats = getattr(dev, "memory_stats", None)
    if stats is None:
        return None
    try:
        s = stats()
    except Exception:
        return None
    if not s:  # some tunnels (axon) return None instead of raising
        return None
    limit = s.get("bytes_limit") or s.get("bytes_reservable_limit")
    return int(limit) if limit else None


def _reset_cache_for_tests() -> None:
    global _cached
    _cached = None
