"""Shared CLI backend-selection guard.

The axon TPU plugin registers its backend from a sitecustomize hook,
which overrides the JAX_PLATFORMS environment variable; a user (or
test) asking for `JAX_PLATFORMS=cpu python -m tpukaldi.tools.*` would
still land on the real accelerator — and hang if the device tunnel is
unreachable.  Every jax-running CLI entry point calls this before its
first device use so the env var keeps its documented meaning.
"""

from __future__ import annotations

import os
import sys


def honor_jax_platforms() -> None:
    """Apply JAX_PLATFORMS via jax.config (wins over site-hook plugin
    registration as long as no backend is initialized yet).  Warns on
    stderr when the override cannot take effect instead of silently
    proceeding on the wrong backend."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        jax.config.update("jax_platforms", want)
    except Exception as e:  # backend already initialized / malformed value
        print(
            f"[tpukaldi] WARNING: could not apply JAX_PLATFORMS={want!r} "
            f"({type(e).__name__}: {e}); continuing on the default backend",
            file=sys.stderr,
        )
