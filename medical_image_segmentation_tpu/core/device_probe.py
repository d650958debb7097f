"""Hang-guarded JAX device probe, shared by every entry point.

The axon sitecustomize registers a remote-TPU plugin whose first
``jax.devices()`` call blocks INDEFINITELY when the tunnel is down (env
``JAX_PLATFORMS=cpu`` cannot prevent this once the hook has run). Probing in
a daemon thread turns that hang into a timeout the caller can act on —
``bench.py`` aborts with a nonzero exit code, ``__graft_entry__`` falls back
to fresh forced-CPU interpreters that never touch the tunnel.
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple


def probe_device_count(timeout_s: float = 45.0) -> Tuple[Optional[int], Optional[str]]:
    """``len(jax.devices())`` with a hang guard.

    Returns ``(count, None)`` on success, ``(0, reason)`` when the backend
    initialized but errored (responsive, just no devices), and
    ``(None, reason)`` when init did not complete within ``timeout_s``
    (the tunnel-down hang).
    """
    out = {}

    def _probe():
        try:
            import jax

            out["n"] = len(jax.devices())
        except Exception as e:  # backend init failure: report, don't hang
            out["n"] = 0
            out["err"] = repr(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "n" in out:
        return out["n"], out.get("err")
    return None, f"jax backend init did not complete in {timeout_s:g} s"
