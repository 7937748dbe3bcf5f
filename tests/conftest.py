"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's CPU-only float64 test strategy; multi-chip
sharding is exercised on a virtual 8-device CPU mesh. NOTE: this
environment pre-imports jax via sitecustomize (TPU tunnel), so
`jax.config.update` — not environment variables — is the only effective
way to select the backend.
"""
import os
import signal
import threading

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Per-test timeout guard (pytest-timeout is not available in this image):
# a silent environment stall once hung a full-suite run indefinitely, so a
# SIGALRM turns any hang into a loud failure. Generous default — the
# 2-process distributed test and notebook executions take minutes.
_TEST_TIMEOUT = int(os.environ.get("BNN_TEST_TIMEOUT", "900"))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    if _TEST_TIMEOUT <= 0 or threading.current_thread() is not threading.main_thread():
        return (yield)

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded {_TEST_TIMEOUT}s "
            "(BNN_TEST_TIMEOUT to adjust)")

    previous = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(_TEST_TIMEOUT)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, previous)
