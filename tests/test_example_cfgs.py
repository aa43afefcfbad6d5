"""Every shipped example cfg parses and validates structurally
(paths/N_out not materialized — template mode)."""

import glob
import os

import pytest

from tpukaldi.config import load_config

CFGS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "cfg", "**", "*.cfg"),
              recursive=True)
)


@pytest.mark.parametrize("cfg", CFGS, ids=[os.path.basename(c) for c in CFGS])
def test_example_cfg_validates(cfg):
    exp = load_config(cfg, strict_paths=False, resolve_nout=False)
    assert exp.archs
    assert any(s.op == "compute" for s in exp.model)
    assert exp.forward.outs


def test_example_set_nonempty():
    assert len(CFGS) >= 38  # full reference matrix (37) + minimalGRU extra
