"""Bounded backend probing (mvd_tpu/utils/backend.py).

The axon tunnel can make TPU backend init raise OR hang; the driver entry
points (__graft_entry__.py, bench.py) must never hang, so they probe in a
subprocess with a timeout.  These tests pin the probe's control flow with a
monkeypatched subprocess — no real backend is touched.
"""

import subprocess

import pytest

from mvd_tpu.utils import backend


class _Proc:
    def __init__(self, rc):
        self.returncode = rc


def test_skip_env_bypasses_probe(monkeypatch):
    monkeypatch.setenv("MVD_SKIP_TPU_PROBE", "1")

    def boom(*a, **k):  # probe must not run at all
        raise AssertionError("probe subprocess spawned despite skip env")

    monkeypatch.setattr(subprocess, "run", boom)
    assert backend.tpu_usable() is True


@pytest.mark.parametrize("rc,expect", [(0, True), (3, False), (1, False)])
def test_tpu_usable_maps_returncodes(monkeypatch, rc, expect):
    monkeypatch.delenv("MVD_SKIP_TPU_PROBE", raising=False)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Proc(rc))
    assert backend.tpu_usable() is expect


def test_hanging_probe_reports_false(monkeypatch):
    monkeypatch.delenv("MVD_SKIP_TPU_PROBE", raising=False)

    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1.0)

    monkeypatch.setattr(subprocess, "run", hang)
    assert backend.tpu_usable(timeout=1.0) is False
    assert backend.devices_available(8, timeout=1.0) is False


def test_devices_available_strips_child_guard(monkeypatch):
    """The probe env must not inherit _MVD_DRYRUN_CHILD — a stale guard
    would make the re-exec'd dryrun child skip its own provisioning."""
    monkeypatch.setenv("_MVD_DRYRUN_CHILD", "1")
    seen = {}

    def fake_run(cmd, env=None, timeout=None, **k):
        seen["env"] = env
        return _Proc(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert backend.devices_available(4) is True
    assert "_MVD_DRYRUN_CHILD" not in seen["env"]


def test_require_backend_pins_cpu_on_failed_probe(monkeypatch):
    monkeypatch.delenv("MVD_SKIP_TPU_PROBE", raising=False)
    monkeypatch.setattr(backend, "tpu_usable", lambda timeout=120.0: False)
    # conftest already pinned this process to CPU; require_backend must
    # report "no TPU" and leave the process on a usable platform.
    assert backend.require_backend() is False
    import jax

    assert jax.default_backend() == "cpu"
