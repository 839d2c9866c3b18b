"""Make explicit ``JAX_PLATFORMS`` requests win over host-pinned backends.

Some hosts register a preferred JAX backend for *every* Python process
from ``sitecustomize`` via ``jax.config.update("jax_platforms", ...)``
(e.g. the axon TPU-tunnel harness pins ``"axon,cpu"``). A config update
outranks the ``JAX_PLATFORMS`` environment variable, so a child process
launched with ``JAX_PLATFORMS=cpu`` — the standard way tests and tools
request the virtual CPU mesh — still initializes the pinned backend, and
fails outright if that backend is unreachable.

:func:`honor_env_platforms` restores the intuitive contract at our
process entry points (``cli.main``, ``cli.tools``, ``__graft_entry__``):
if the environment explicitly names platforms and none of them is the
host's pinned backend, re-apply the environment's choice over the pin.
When the env var is unset, or names the pinned backend (the host's
normal operating mode), nothing changes.
"""

from __future__ import annotations

import os

_PINNED = ("axon",)  # backends a sitecustomize may pin over the env


def honor_env_platforms() -> None:
    """Re-assert ``JAX_PLATFORMS`` over a sitecustomize config pin.

    Safe to call any time before the first backend use; a no-op when the
    env var is unset/empty, names a pinned backend, or already matches
    the active config.
    """
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if not env:
        return
    requested = [p.strip() for p in env.split(",") if p.strip()]
    if any(p in _PINNED for p in requested):
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)
