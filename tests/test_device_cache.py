"""HBM-resident corpus cache: the device-assembled batches must reproduce
the host data path (data/chunk_loader.py + data/batching.py) exactly —
same rows, same padding, same random-left-offset sequence, same CMVN up to
statistics accumulation order (host: single-pass f32/f64; cache: f64
moments with exact per-lag excluded-row corrections)."""

import os

import numpy as np
import pytest

from tpukaldi.config import load_config
from tpukaldi.data.batching import iter_frame_batches, iter_seq_batches
from tpukaldi.data.chunk_loader import load_chunk
from tpukaldi.data.device_cache import (
    DeviceCorpusCache,
    iter_frame_index_batches,
    iter_seq_index_batches,
)
from tpukaldi.data.synth import generate_corpus, load_corpus, write_cfg


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    root = tmp_path_factory.mktemp("devcache")
    corp = os.path.join(str(root), "corpus")
    generate_corpus(corp, n_utts=18, feat_dim=12, n_classes=16,
                    min_len=40, max_len=140, seed=9)
    corpus = load_corpus(corp)
    out = os.path.join(str(root), "exp")
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=1, n_chunks=1,
                    batch_size=8, cw=3, lr=0.02)
    return load_config(cfg, [])


def _host_and_cache_chunks(exp, msl, shuffle, seed):
    ds = exp.datasets[exp.train_with[0]]
    fea_names = list(ds.features)
    lab_names = list(ds.labels)
    host = load_chunk(ds, fea_names, lab_names, msl,
                      shuffle_frames=shuffle, seed=seed)
    cache = DeviceCorpusCache()
    cm = cache.load_chunk_index(ds, fea_names, lab_names, msl,
                                shuffle_frames=shuffle, seed=seed)
    return host, cache, cm


def test_metadata_matches_host(exp):
    host, _, cm = _host_and_cache_chunks(exp, 100, False, 0)
    assert cm.names == host.names
    np.testing.assert_array_equal(cm.end_index, host.end_index)
    assert cm.fea_layout == host.fea_layout
    assert cm.lab_layout == host.lab_layout
    assert cm.n_frames == host.n_frames


def test_seq_batches_match_host(exp):
    host, cache, cm = _host_and_cache_chunks(exp, 100, False, 0)
    rng_h = np.random.default_rng(7)
    rng_c = np.random.default_rng(7)
    hb = list(iter_seq_batches(host, 4, rng=rng_h))
    cb = list(iter_seq_index_batches(cm, 4, rng=rng_c))
    assert len(hb) == len(cb) > 0
    for h, c in zip(hb, cb):
        feats, labs = cache.assemble(cm, c.fea_idx, c.lab_idx)
        assert h.names == c.names
        assert h.n_valid_t == c.n_valid_t
        # CMVN stats accumulate in a different (more precise) order; the
        # normalized values agree to f32 rounding
        np.testing.assert_allclose(
            np.asarray(feats), h.feats, rtol=2e-6, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(labs), h.labs)


def test_frame_batches_with_shuffle_match_host(exp):
    host, cache, cm = _host_and_cache_chunks(exp, 100, True, 5)
    hb = list(iter_frame_batches(host, 16))
    cb = list(iter_frame_index_batches(cm, 16))
    assert len(hb) == len(cb) > 0
    for h, c in zip(hb[:4] + hb[-2:], cb[:4] + cb[-2:]):
        feats, labs = cache.assemble(cm, c.fea_idx, c.lab_idx)
        np.testing.assert_allclose(
            np.asarray(feats), h.feats, rtol=2e-6, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(labs), h.labs)


def test_split_sentences_match_host(exp):
    # msl small enough to force the min-tail splitting rule
    host, cache, cm = _host_and_cache_chunks(exp, 48, False, 0)
    assert cm.names == host.names
    assert any("_split" in n for n in cm.names)
    np.testing.assert_array_equal(cm.end_index, host.end_index)
    hb = list(iter_seq_batches(host, 4))
    cb = list(iter_seq_index_batches(cm, 4))
    for h, c in zip(hb, cb):
        feats, _ = cache.assemble(cm, c.fea_idx, c.lab_idx)
        np.testing.assert_allclose(
            np.asarray(feats), h.feats, rtol=2e-6, atol=2e-6)


def test_e2e_trajectory_matches_host_path(tmp_path):
    """Full driver with the cache FORCED on vs off: identical batch
    composition means near-identical loss/err trajectories."""
    import re

    from tpukaldi.tools.run_exp import run_experiment

    corp = str(tmp_path / "corpus")
    generate_corpus(corp, n_utts=16, feat_dim=10, n_classes=12,
                    min_len=30, max_len=80, seed=3)
    corpus = load_corpus(corp)

    def run(mode, sub):
        out = str(tmp_path / sub)
        cfg = write_cfg(corpus, out, arch="MLP", n_epochs=2, n_chunks=2,
                        batch_size=16, cw=2, lr=0.05)
        prev = os.environ.get("TPUKALDI_DEVICE_CACHE")
        os.environ["TPUKALDI_DEVICE_CACHE"] = mode
        try:
            run_experiment(cfg)
        finally:
            if prev is None:
                os.environ.pop("TPUKALDI_DEVICE_CACHE", None)
            else:
                os.environ["TPUKALDI_DEVICE_CACHE"] = prev
        vals = []
        for line in open(os.path.join(out, "res.res")):
            vals += [float(v) for v in re.findall(r"(?:loss|err)=([\d.]+)", line)]
        return np.asarray(vals)

    on = run("1", "on")
    off = run("0", "off")
    assert on.size == off.size > 0
    np.testing.assert_allclose(on, off, rtol=5e-3, atol=5e-3)
