"""Backend initialization guards for tunneled TPU runtimes.

On this class of runtime (axon) a dead tunnel makes the FIRST device
contact — even ``jax.devices()`` — block indefinitely rather than raise.
Anything that initializes the backend on a user's behalf (the CLI, bench)
must therefore bound that first contact with a hard deadline, and users
need an escape hatch to force the CPU platform without editing code
(``QC_TPU_PLATFORM=cpu``; the profile's JAX_PLATFORMS is overridden by
the axon plugin, so the env var alone is not enough — the config update
must happen in-process before backend init).
"""

from __future__ import annotations

import os
import sys
import threading
from typing import Callable, Optional

DEFAULT_INIT_TIMEOUT_S = 420.0  # covers the legitimate 60-130 s first contact

_KNOWN_PLATFORMS = {"cpu", "tpu", "gpu", "cuda", "rocm", "axon"}


def _backend_already_initialized() -> bool:
    """Best-effort check WITHOUT triggering initialization (a late
    jax_platforms update succeeds silently but has no effect — the
    backend registry is already populated)."""
    try:
        from jax._src import xla_bridge

        return bool(getattr(xla_bridge, "_backends", None))
    except Exception:
        return False


def apply_platform_override() -> Optional[str]:
    """Honor QC_TPU_PLATFORM (e.g. "cpu") BEFORE any backend init.
    Returns the applied platform or None.  Safe to call multiple times.
    Unknown platform names are rejected here with a clear message (JAX
    would otherwise accept the config and fail cryptically at first
    device contact); a too-late call (backend already initialized) warns
    that the override cannot take effect."""
    plat = os.environ.get("QC_TPU_PLATFORM")
    if not plat:
        return None
    from quantumcomputer_tpu.utils.logging import get_logger

    tokens = [t.strip() for t in plat.split(",") if t.strip()]
    if not tokens or any(t not in _KNOWN_PLATFORMS for t in tokens):
        get_logger("backend").warning(
            "ignoring QC_TPU_PLATFORM=%r (want one of %s)", plat, sorted(_KNOWN_PLATFORMS)
        )
        return None
    import jax

    if _backend_already_initialized():
        get_logger("backend").warning(
            "QC_TPU_PLATFORM=%s set after the JAX backend initialized — the "
            "override has no effect in this process", plat,
        )
        return None
    try:
        jax.config.update("jax_platforms", plat)
        return plat
    except Exception as e:
        get_logger("backend").warning("QC_TPU_PLATFORM=%s ignored: %s", plat, e)
        return None


def devices_or_die(
    timeout_s: float = DEFAULT_INIT_TIMEOUT_S,
    on_timeout: Optional[Callable[[str], None]] = None,
):
    """First device contact with a hard deadline: returns jax.devices(),
    or prints a diagnostic (plus the optional on_timeout callback, e.g.
    bench's JSON error line) and exits the process when the backend does
    not come up in time.  os._exit because the init thread is unkillably
    blocked inside the plugin."""
    # Every guarded init honors the documented escape hatch itself —
    # callers (bench, CLI) need no separate apply_platform_override call
    # for the timeout message's remedy to actually work on rerun.
    apply_platform_override()
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            msg = (
                f"backend init exceeded {timeout_s:.0f}s (TPU tunnel down?). "
                "Set QC_TPU_PLATFORM=cpu to run on the host instead."
            )
            print(f"error: {msg}", file=sys.stderr)
            if on_timeout is not None:
                try:
                    on_timeout(msg)
                except Exception:
                    pass
            sys.stderr.flush()
            os._exit(1)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax

    try:
        devs = jax.devices()
    finally:
        done.set()  # a fast RAISE must also disarm the watchdog: a caller
        # that catches the error and recovers would otherwise be killed by
        # a misleading delayed os._exit
    return devs
