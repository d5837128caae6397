"""utils/backend: init deadline guard + platform escape hatch."""

import jax


def test_devices_or_die_returns_devices():
    from quantumcomputer_tpu.utils.backend import devices_or_die

    called = []
    devs = devices_or_die(timeout_s=60.0, on_timeout=called.append)
    assert devs == jax.devices()
    assert not called  # watchdog never fired


def test_apply_platform_override_is_safe(monkeypatch):
    """With the backend already initialized the override logs and is
    ignored — never raises out of the CLI."""
    from quantumcomputer_tpu.utils.backend import apply_platform_override

    monkeypatch.delenv("QC_TPU_PLATFORM", raising=False)
    assert apply_platform_override() is None
    monkeypatch.setenv("QC_TPU_PLATFORM", "cpu")
    # Already on cpu (conftest) — jax accepts or rejects depending on init
    # state; either way this must not raise.
    apply_platform_override()
