"""Accelerator reachability probe shared by the driver entry points.

On the tunneled axon platform a relay outage makes ``jax.devices()``
hang indefinitely, turning ``bench.py`` and the ``entry()`` compile
gate into undiagnosable timeouts.  Probing device enumeration in a
bounded subprocess converts that into an explicit, fast failure.
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional


def probe_devices(timeout_s: int = 180) -> Optional[str]:
    """None when device enumeration answers (or the probe is skipped
    via ``VAE_GSLM_SKIP_DEVICE_PROBE=1`` / forced-CPU mode); otherwise
    a short description of the failure."""
    if os.environ.get("VAE_GSLM_SKIP_DEVICE_PROBE") == "1" \
            or os.environ.get("VAE_GSLM_FORCE_CPU"):
        return None
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True)
        return None
    except (subprocess.TimeoutExpired,
            subprocess.CalledProcessError) as e:
        return (f"device enumeration failed/timed out "
                f"({type(e).__name__}) — axon tunnel outage?")
