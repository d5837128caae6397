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


def apply_platform_override() -> Optional[str]:
    """Honor QC_TPU_PLATFORM (e.g. "cpu") BEFORE any backend init.
    Returns the applied platform or None.  Safe to call multiple times;
    a too-late call (backend already initialized) logs and is ignored."""
    plat = os.environ.get("QC_TPU_PLATFORM")
    if not plat:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        return plat
    except Exception as e:
        from quantumcomputer_tpu.utils.logging import get_logger

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

    devs = jax.devices()
    done.set()
    return devs
