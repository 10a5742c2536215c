"""Tunnel fail-fast guard (utils/tunnel.py).

Round-3 incident: the axon relay keeper died and `jax.devices()` hung
forever — the guard exists so bench.py / tpu_checks.py abort in bounded
time with an actionable message instead of hanging the driver.
"""

from __future__ import annotations

import socket
import time

import pytest

from human_3d_reconstruction_tpu.utils.tunnel import (
    check_tpu_tunnel,
    is_tunneled_platform,
)


class TestTunnelGuard:
    def test_non_tunneled_platform_is_a_noop(self):
        env = {"JAX_PLATFORMS": "cpu"}
        assert is_tunneled_platform(env) is False
        # Dead ports, but not tunneled -> returns immediately, no probe.
        t0 = time.monotonic()
        assert check_tpu_tunnel(deadline_s=30.0, ports=(1,), environ=env)
        assert time.monotonic() - t0 < 1.0

    def test_empty_env_is_a_noop(self):
        assert check_tpu_tunnel(deadline_s=30.0, ports=(1,), environ={})

    def test_live_relay_passes(self):
        env = {"JAX_PLATFORMS": "axon"}
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        try:
            srv.bind(("127.0.0.1", 0))
            srv.listen(1)
            port = srv.getsockname()[1]
            assert check_tpu_tunnel(deadline_s=5.0, ports=(port,), environ=env)
        finally:
            srv.close()

    def test_dead_relay_raises_within_deadline(self):
        env = {"JAX_PLATFORMS": "axon"}
        # Grab-and-release an ephemeral port: nothing listens on it now.
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        t0 = time.monotonic()
        with pytest.raises(RuntimeError, match="relay"):
            check_tpu_tunnel(deadline_s=1.0, ports=(port,), environ=env)
        assert time.monotonic() - t0 < 10.0

    def test_recovers_when_relay_appears_mid_probe(self):
        env = {"JAX_PLATFORMS": "axon"}
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        try:
            srv.bind(("127.0.0.1", 0))
            port = srv.getsockname()[1]
            # Not listening yet -> first probes fail; listen() after a beat.
            import threading

            def arm():
                time.sleep(0.8)
                srv.listen(1)

            threading.Thread(target=arm, daemon=True).start()
            assert check_tpu_tunnel(deadline_s=10.0, ports=(port,), environ=env)
        finally:
            srv.close()

    def test_in_process_cpu_config_overrides_env(self):
        """jax.config.update('jax_platforms','cpu') (the suite's own state)
        must make the guard a no-op even when the real environment still
        says axon — that's exactly how CPU smoke of tpu_checks runs on this
        image (utils/tunnel.py is_tunneled_platform's config-first rule)."""
        import os

        from human_3d_reconstruction_tpu.utils.tunnel import is_tunneled_platform

        assert os.environ.get("JAX_PLATFORMS", "axon") == "axon"
        # conftest set jax_platforms=cpu in-process: not tunneled.
        assert not is_tunneled_platform()
        # An injected environ opts out of the config check (the tests above
        # rely on that to simulate a tunneled process).
        assert is_tunneled_platform({"JAX_PLATFORMS": "axon"})
