"""PASE waveform-encoder wrapper (reference neural_networks.py:2023-2055).

The reference imports the external `pase` package and loads a pretrained
checkpoint; neither ships with either framework.  This wrapper keeps the
same config surface (pase_cfg json with emb_dim, pase_model checkpoint) and
gates cleanly: if `pase` (a torch package) is importable the encoder runs
on host torch-CPU as a frozen front-end; otherwise construction raises an
actionable error.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict


class PASE:
    def __init__(self, options: Dict[str, Any], inp_dim: int):
        self.input_dim = inp_dim
        self.pase_cfg = options["pase_cfg"]
        self.pase_model = options["pase_model"]
        try:
            from pase.models.frontend import wf_builder  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "PASE requires the external 'pase' package (dev branch of "
                "github.com/santi-pdp/pase) plus its pretrained checkpoint; "
                "neither is bundled. Install it, or swap the front-end for "
                "the native SincNet/logMelFb models."
            ) from e
        self.pase = wf_builder(self.pase_cfg)
        self.pase.load_pretrained(self.pase_model, load_last=True, verbose=True)
        with open(self.pase_cfg) as f:
            self.out_dim = int(json.load(f)["emb_dim"])

    @staticmethod
    def compute_out_dim(options: Dict[str, Any], inp_dim: int) -> int:
        with open(options["pase_cfg"]) as f:
            return int(json.load(f)["emb_dim"])

    def __call__(self, x, train: bool = False):
        import numpy as np
        import torch

        with torch.no_grad():
            t = torch.from_numpy(np.asarray(x)).float()
            out = self.pase(t.unsqueeze(0).unsqueeze(0))
        return np.asarray(out)
