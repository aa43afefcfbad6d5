"""Chunk loading: ark features + alignment labels -> one contiguous chunk.

Re-implements the semantics of the reference's host data plane
(data_io.py:16-281 `load_dataset`/`load_chunk`, data_io.py:522-647
`read_lab_fea`) as a typed pipeline:

  read feats (native scp/ark + fea_opts pipeline)
  -> sentence split at max_seq_length with the min-tail rule (len/4)
  -> sort by length, concatenate, end-index arrays
  -> context-window splice (roll semantics), per-chunk CMVN
  -> label min-subtraction + cw trim
  -> multi-stream column stacking with cw_max compensation
  -> optional frame shuffle (non-sequential models)

Features and labels stay in separate arrays (float32 / int32) instead of the
reference's single float matrix with label columns; the layout dicts map
stream names to column ranges.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config.cfg import DatasetSpec, FeatureSpec, LabelSpec
from ..io import feats as F
from ..io import kaldi_io as kio
from ..io.pipeline import apply_pipeline, parse_pipeline
from .labels import read_label_stream


@dataclass
class ChunkData:
    """One loaded chunk, ready for batching."""

    names: List[str]  # per (possibly split) sentence
    feats: np.ndarray  # (N_frames, D) float32, all feature streams stacked
    labs: np.ndarray  # (N_frames, L) int32, one column per label stream
    end_index: np.ndarray  # cumulative sentence end rows
    fea_layout: Dict[str, Tuple[int, int]]  # stream -> column range
    lab_layout: Dict[str, int]  # stream -> label column
    shuffled: bool = False

    @property
    def n_frames(self) -> int:
        return self.feats.shape[0]

    @property
    def n_sentences(self) -> int:
        return len(self.names)

    @property
    def sentence_lengths(self) -> np.ndarray:
        starts = np.concatenate([[0], self.end_index[:-1]])
        return self.end_index - starts

    def fea_dim(self, name: str) -> int:
        beg, end = self.fea_layout[name]
        return end - beg


def _split_sentence(
    fea: np.ndarray, lab: Optional[np.ndarray], max_len: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Split one utterance into <=max_len chunks with the reference's
    min-tail rule: the final piece absorbs up to max_len + max_len/4 frames
    (data_io.py:68-115)."""
    n = len(fea)
    if lab is None:
        lab = np.zeros((n,), dtype=np.int64)
    if max_len <= 0 or n <= max_len:
        return [(fea, lab)]
    out = []
    threshold = max_len + max_len / 4
    start = 0
    while True:
        remaining = n - start
        if remaining > threshold:
            out.append((fea[start : start + max_len], lab[start : start + max_len]))
            start += max_len
        else:
            out.append((fea[start:], lab[start:]))
            break
    return out


def load_dataset_stream(
    fea: FeatureSpec,
    lab: Optional[LabelSpec],
    max_seq_length: int,
    fea_only: bool = False,
) -> Tuple[List[str], np.ndarray, np.ndarray, np.ndarray]:
    """Read one (feature, label) stream pair and produce concatenated,
    length-sorted sentence chunks (reference load_dataset, data_io.py:16-210).

    Returns (names, fea_conc, lab_conc, end_index).
    """
    stages = parse_pipeline(fea.opts) if fea.opts else []
    # wav-vs-feature sniffing by RIFF header (data_io.py:19-28)
    first_rx = next(iter(kio.read_scp_entries(fea.lst)), None)
    if first_rx is None:
        raise ValueError(f"empty feature list {fea.lst!r}")
    is_wav = False
    path = first_rx[1].rpartition(":")[0] or first_rx[1]
    with open(path, "rb") as f:
        head = f.read(64)
        is_wav = b"RIFF" in head

    feats: Dict[str, np.ndarray] = {}
    for key, rx in kio.read_scp_entries(fea.lst):
        mat = kio.read_vec_flt(rx)[:, None] if is_wav else kio.read_mat(rx)
        feats[key] = apply_pipeline(stages, key, mat) if stages else mat

    labels: Dict[str, np.ndarray] = {}
    if not fea_only and lab is not None:
        labels = read_label_stream(lab.folder, lab.opts)
        # keep only utterances with both fea and lab (data_io.py:50-55)
        common = [k for k in feats if k in labels]
        feats = {k: feats[k] for k in common}
        labels = {k: labels[k] for k in common}

    names: List[str] = []
    fea_parts: List[np.ndarray] = []
    lab_parts: List[np.ndarray] = []
    # sort keys alphabetically then (stable) by length — data_io.py:135
    ordered = sorted(sorted(feats.keys()), key=lambda k: len(feats[k]))
    for key in ordered:
        pieces = _split_sentence(
            feats[key], labels.get(key) if labels else None, max_seq_length
        )
        for j, (fp, lp) in enumerate(pieces):
            names.append(f"{key}_split{j}" if len(pieces) > 1 else key)
            fea_parts.append(fp)
            lab_parts.append(lp)

    # final sort of the split pieces by length (data_io.py:146-150)
    order = np.argsort([p.shape[0] for p in fea_parts], kind="stable")
    names = [names[i] for i in order]
    fea_parts = [fea_parts[i] for i in order]
    lab_parts = [lab_parts[i] for i in order]

    end_index = np.cumsum([p.shape[0] for p in fea_parts])
    fea_conc = np.concatenate(fea_parts) if fea_parts else np.zeros((0, 1))
    lab_conc = np.concatenate(lab_parts) if lab_parts else np.zeros((0,))
    return names, fea_conc, lab_conc, end_index


def load_chunk_stream(
    fea: FeatureSpec,
    lab: Optional[LabelSpec],
    max_seq_length: int,
    fea_only: bool = False,
):
    """load_dataset + splice + per-chunk CMVN + label trim
    (reference load_chunk, data_io.py:244-274)."""
    names, fea_conc, lab_conc, end_index = load_dataset_stream(
        fea, lab, max_seq_length, fea_only
    )
    left, right = fea.cw_left, fea.cw_right
    if left != 0 or right != 0:
        fea_conc = F.splice(fea_conc, left, right)
    end_index = end_index - left
    end_index[-1] = end_index[-1] - right
    fea_conc = F.chunk_cmvn(fea_conc)
    if not fea_only and lab_conc.size:
        lab_conc = lab_conc - lab_conc.min()
    lab_conc = lab_conc[left : len(lab_conc) - right if right > 0 else None]
    return names, fea_conc.astype(np.float32), lab_conc.astype(np.int64), end_index


def load_chunk(
    dataset: DatasetSpec,
    fea_names: List[str],
    lab_names: List[str],
    max_seq_length: int,
    fea_only: bool = False,
    shuffle_frames: bool = False,
    seed: int = 0,
    fea_lst_override: Optional[Dict[str, str]] = None,
) -> ChunkData:
    """Assemble the full multi-stream chunk (reference read_lab_fea,
    data_io.py:522-647): per-stream load, cw_max compensation, column stack,
    consistency checks, optional frame shuffle."""
    feas = [dataset.features[n] for n in fea_names]
    if fea_lst_override:
        import dataclasses

        feas = [
            dataclasses.replace(f, lst=fea_lst_override.get(f.name, f.lst))
            for f in feas
        ]
    labs = [dataset.labels[n] for n in lab_names] if not fea_only else []
    cw_left_max = max(f.cw_left for f in feas)
    cw_right_max = max(f.cw_right for f in feas)

    data_set = None
    all_labs: List[np.ndarray] = []
    names = end_index = None
    fea_layout: Dict[str, Tuple[int, int]] = {}
    col = 0
    for fi, fea in enumerate(feas):
        lab_sources = labs if labs else [None]
        for li, lab in enumerate(lab_sources):
            n_, f_, l_, e_ = load_chunk_stream(fea, lab, max_seq_length, fea_only)
            # compensate different context windows across streams
            # (data_io.py:577-581)
            lo = cw_left_max - fea.cw_left
            hi = f_.shape[0] - (cw_right_max - fea.cw_right)
            f_, l_ = f_[lo:hi], l_[lo:hi]
            e_ = e_ - lo
            e_[-1] = e_[-1] - (cw_right_max - fea.cw_right)
            if fi == 0 and li == 0:
                names, end_index = n_, e_
            else:
                if n_ != names:
                    raise ValueError(
                        "different sentence sets across feature/label streams"
                    )
                if not np.array_equal(e_, end_index):
                    raise ValueError("end indexes differ across streams")
            if li == 0:
                data_set = f_ if data_set is None else np.column_stack((data_set, f_))
                fea_layout[fea.name] = (col, col + f_.shape[1])
            if fi == 0 and not fea_only:
                all_labs.append(l_)
        col = fea_layout[fea.name][1]

    lab_layout = {lab.name: i for i, lab in enumerate(labs)}
    labs_arr = (
        np.stack(all_labs, axis=1).astype(np.int64)
        if all_labs
        else np.zeros((data_set.shape[0], 0), dtype=np.int64)
    )

    chunk = ChunkData(
        names=names,
        feats=np.ascontiguousarray(data_set, dtype=np.float32),
        labs=labs_arr,
        end_index=np.asarray(end_index),
        fea_layout=fea_layout,
        lab_layout=lab_layout,
    )
    if shuffle_frames:
        rng = np.random.default_rng(seed)
        perm = rng.permutation(chunk.n_frames)
        chunk.feats = chunk.feats[perm]
        if chunk.labs.size:
            chunk.labs = chunk.labs[perm]
        chunk.shuffled = True
    return chunk
