"""Checkpointing: per-architecture (params, opt_state, batch_stats) keyed to
the planner's file ledger.

The reference saves a torch state_dict + optimizer state per architecture
per chunk (core.py:710-722) and resumes from `arch_pretrain_file`
(core.py:523-535) with the cfg lr overriding the checkpointed lr.  Here a
checkpoint is one msgpack file (flax.serialization) per architecture with
the same rolling-pointer semantics; loading restores (params, opt_state,
batch_stats) and the caller re-injects the scheduled lr.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    batch_stats: Any = None,
) -> None:
    payload = {
        "params": params,
        "opt_state": opt_state if opt_state is not None else {},
        "batch_stats": batch_stats if batch_stats is not None else {},
    }
    # state_dict form handles optax namedtuple states; device_get first
    payload = serialization.to_state_dict(jax.device_get(payload))
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: ledger never sees a torn checkpoint


def load_checkpoint(
    path: str,
    params_template: Any = None,
    opt_state_template: Any = None,
    batch_stats_template: Any = None,
) -> Tuple[Any, Any, Any]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    def restore(tree, template):
        if template is None:
            return tree
        return serialization.from_state_dict(template, tree)

    return (
        restore(payload["params"], params_template),
        restore(payload["opt_state"], opt_state_template),
        restore(payload["batch_stats"], batch_stats_template),
    )


def save_all(
    paths: Dict[str, str],
    params: Dict[str, Any],
    opt_states: Optional[Dict[str, Any]] = None,
    batch_stats: Optional[Dict[str, Any]] = None,
) -> None:
    """One checkpoint file per architecture (ledger naming from the plan)."""
    for arch, path in paths.items():
        save_checkpoint(
            path,
            params[arch],
            (opt_states or {}).get(arch),
            (batch_stats or {}).get(arch),
        )


def load_all(
    paths: Dict[str, str],
    params: Dict[str, Any],
    opt_states: Optional[Dict[str, Any]] = None,
    batch_stats: Optional[Dict[str, Any]] = None,
):
    """Restore every architecture whose checkpoint path exists; returns new
    (params, opt_states, batch_stats) dicts."""
    new_p = dict(params)
    new_o = dict(opt_states or {})
    new_s = dict(batch_stats or {})
    for arch, path in paths.items():
        if path in ("none", "", None) or not os.path.exists(path):
            continue
        p, o, s = load_checkpoint(
            path,
            params.get(arch),
            (opt_states or {}).get(arch),
            (batch_stats or {}).get(arch),
        )
        new_p[arch] = p
        if opt_states is not None and o:
            new_o[arch] = o
        if batch_stats is not None:
            new_s[arch] = s
    return new_p, new_o, new_s
