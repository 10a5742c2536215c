"""Fail-fast health check for the tunneled TPU platform.

On this image the single TPU chip is reached through the **axon** relay: a
stdio pump (`/root/.tpu_init.py`) that listens on a fixed set of loopback
ports and forwards bytes to the orchestrator. When that relay process dies
(observed in round 3 after hard-killing a training run with large in-flight
transfers), nothing listens on those ports anymore and the axon PJRT plugin
retries forever — `jax.devices()` then HANGS instead of raising. A driver
or CI lane calling `bench.py` in that state would block indefinitely.

`check_tpu_tunnel` turns that hang into a bounded, actionable error:

- If the process isn't configured for the axon platform (`JAX_PLATFORMS`
  doesn't name it), the deployment isn't tunneled — return immediately.
  Real TPU hosts and CPU test runs are never blocked by this guard.
- Otherwise probe the relay's loopback ports until one ACCEPTS a TCP
  connection (relay alive → return) or the deadline passes with every
  probe REFUSED (relay dead → raise RuntimeError naming the fix).

Connection-refused is unambiguous on loopback: nothing is listening. The
probe sends no bytes — the relay treats an open+close as a client that
went away (it emits its 0-byte open marker and an EOF downstream), which
is the same footprint as any health check.
"""

from __future__ import annotations

import os
import socket
import time

# The relay's listening ports (see /root/.tpu_init.py PORTS). The guard only
# needs ONE of them to accept; probing three spreads the check across
# independent listener threads.
RELAY_PORTS = (8082, 8083, 8087)
RELAY_HOST = "127.0.0.1"


def is_tunneled_platform(environ=os.environ) -> bool:
    """True when this process will init JAX against the axon relay.

    An in-process `jax.config.update('jax_platforms', 'cpu')` overrides the
    environment (that's how CPU work runs on this image, where sitecustomize
    pins JAX_PLATFORMS=axon) — so when jax is already imported, its config
    value is the truth, and the env var is only the fallback. A caller
    injecting a custom `environ` (tests) opts out of the config check.
    """
    import sys

    jax = sys.modules.get("jax") if environ is os.environ else None
    if jax is not None:
        try:
            configured = jax.config.jax_platforms
        except AttributeError:
            configured = None
        if configured:  # explicit override (env-seeded or config.update)
            return "axon" in configured.lower()
    return "axon" in environ.get("JAX_PLATFORMS", "").lower()


def _probe_once(host: str, port: int, timeout_s: float) -> bool:
    """One TCP connect attempt; True iff something accepted."""
    try:
        with socket.create_connection((host, port), timeout=timeout_s):
            return True
    except OSError:
        return False


def check_tpu_tunnel(
    deadline_s: float = 20.0,
    *,
    ports=RELAY_PORTS,
    host: str = RELAY_HOST,
    environ=os.environ,
) -> bool:
    """Verify the TPU relay is reachable before initializing JAX.

    Returns True when the platform is healthy (or not tunneled at all).
    Raises RuntimeError after `deadline_s` of nothing-listening, so callers
    fail in seconds instead of hanging in the PJRT plugin's retry loop.
    """
    if not is_tunneled_platform(environ):
        return True
    deadline = time.monotonic() + deadline_s
    while True:
        for port in ports:
            if _probe_once(host, port, timeout_s=2.0):
                return True
        if time.monotonic() >= deadline:
            raise RuntimeError(
                f"TPU tunnel relay is not listening on {host}:{ports} after "
                f"{deadline_s:.0f}s — JAX_PLATFORMS={environ.get('JAX_PLATFORMS')!r} "
                "would hang in jax.devices(). The relay keeper "
                "(/root/.tpu_init.py) has died and only the harness can "
                "restart it (its stdio belongs to the orchestrator). Run "
                "CPU-side work via jax.config.update('jax_platforms','cpu') "
                "until the tunnel is restored."
            )
        time.sleep(0.5)
