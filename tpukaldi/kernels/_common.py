"""Shared helpers for the pallas recurrence kernels."""

from __future__ import annotations

import logging

_log = logging.getLogger("tpukaldi.kernels")
_warned: set = set()

# cell -> last backward impl that dispatched, with its shape — surfaced by
# bench.py as an impl_dispatch_<cell> row so a VMEM fallback can never
# masquerade as the fused kernel in the perf record (VERDICT r4 #7)
_dispatched: dict = {}


def record_dispatch(cell: str, impl: str, B: int, H: int) -> None:
    _dispatched[cell] = f"{impl}@B{B}xH{H}"


def get_dispatch(cell: str) -> str:
    return _dispatched.get(cell, "unrecorded")


def log_vmem_fallback(cell: str, B: int, H: int) -> None:
    """Warn (once per shape) when a fused pallas backward silently
    downgrades to the hoisted-scan path because resident U + dU plus the
    streamed blocks exceed the VMEM budget — at those shapes the user sees
    slower steps and deserves a line explaining why."""
    key = (cell, B, H)
    if key in _warned:
        return
    _warned.add(key)
    _log.warning(
        "%s: fused pallas backward does not fit VMEM at B=%d H=%d; "
        "falling back to the (slower) hoisted-scan backward",
        cell, B, H,
    )
