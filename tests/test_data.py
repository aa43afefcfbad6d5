"""Data-pipeline tests: chunk loading semantics (splitting, sorting, CMVN,
splice trim, end indexes), batching shapes, prefetcher, planner ledger."""

import numpy as np
import pytest

from tpukaldi.config import load_config
from tpukaldi.data import (
    ChunkPrefetcher,
    bucket_for,
    iter_forward_utterances,
    iter_frame_batches,
    iter_seq_batches,
    load_chunk,
)
from tpukaldi.data.chunk_loader import _split_sentence
from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.plan import build_plan, split_chunks, validation_points


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return generate_corpus(str(root), n_utts=12, seed=7)


@pytest.fixture(scope="module")
def exp(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("exp")
    cfg_path = write_cfg(corpus, str(out), arch="MLP", n_epochs=2, n_chunks=2)
    return load_config(cfg_path)


def test_split_sentence_min_tail_rule():
    from tpukaldi.data.chunk_loader import _chunk_config

    cc = _chunk_config(500)
    fea = np.arange(625)[:, None].astype(float)
    lab = np.arange(625)
    # len 625 > 500 + 125 threshold boundary: reference splits at >625
    pieces = _split_sentence(fea, lab, cc)
    assert [len(p[0]) for p in pieces] == [625]  # 625 <= 625 stays whole
    pieces = _split_sentence(np.arange(626)[:, None].astype(float), np.arange(626), cc)
    assert [len(p[0]) for p in pieces] == [500, 126]
    pieces = _split_sentence(np.arange(1300)[:, None].astype(float), np.arange(1300), cc)
    assert [len(p[0]) for p in pieces] == [500, 500, 300]
    # labels stay aligned
    np.testing.assert_array_equal(pieces[1][1], np.arange(500, 1000))
    # different fea/lab rates: 10 samples per label frame
    cc2 = _chunk_config([1000, 1000, 100, 100, 10, 10])
    fea = np.arange(2500)[:, None].astype(float)
    lab = np.arange(250)
    pieces = _split_sentence(fea, lab, cc2)
    assert [len(p[0]) for p in pieces] == [1000, 1000, 500]
    assert [len(p[1]) for p in pieces] == [100, 100, 50]
    np.testing.assert_array_equal(pieces[1][1], np.arange(100, 200))


def test_load_chunk_structure(exp):
    ds = exp.datasets["synth_tr"]
    chunk = load_chunk(ds, ["mfcc"], ["lab_cd"], max_seq_length=1000)
    # splice cw 2/2 -> 13*5 = 65 columns
    assert chunk.feats.shape[1] == 65
    assert chunk.fea_layout["mfcc"] == (0, 65)
    assert chunk.labs.shape == (chunk.n_frames, 1)
    assert chunk.end_index[-1] == chunk.n_frames
    # per-chunk CMVN applied
    np.testing.assert_allclose(chunk.feats.mean(axis=0), 0.0, atol=1e-4)
    # sorted by length
    assert (np.diff(chunk.sentence_lengths) >= 0).all()
    # labels still within class range
    assert chunk.labs.min() >= 0 and chunk.labs.max() < 10


def test_load_chunk_fea_only(exp):
    ds = exp.datasets["synth_te"]
    chunk = load_chunk(ds, ["mfcc"], [], max_seq_length=-1, fea_only=True)
    assert chunk.labs.shape[1] == 0
    assert chunk.n_sentences == len(chunk.names)


def test_frame_batches(exp):
    ds = exp.datasets["synth_tr"]
    chunk = load_chunk(
        ds, ["mfcc"], ["lab_cd"], max_seq_length=1000, shuffle_frames=True, seed=3
    )
    assert chunk.shuffled
    batches = list(iter_frame_batches(chunk, 32))
    assert len(batches) == chunk.n_frames // 32
    assert batches[0].feats.shape == (32, 65)
    assert batches[0].labs.shape == (32, 1)


def test_seq_batches_bucketed(exp):
    ds = exp.datasets["synth_tr"]
    chunk = load_chunk(ds, ["mfcc"], ["lab_cd"], max_seq_length=1000)
    rng = np.random.default_rng(0)
    batches = list(iter_seq_batches(chunk, 4, rng=rng, pad_to_bucket=True))
    assert len(batches) == chunk.n_sentences // 4
    for b in batches:
        T = b.feats.shape[0]
        assert T == bucket_for(int(b.lengths.max()))
        assert b.feats.shape[1] == 4
        # padded region is zeros
        assert b.labs.min() >= 0


def test_forward_utterances(exp):
    ds = exp.datasets["synth_te"]
    chunk = load_chunk(ds, ["mfcc"], ["lab_cd"], max_seq_length=-1)
    utts = list(iter_forward_utterances(chunk))
    assert len(utts) == chunk.n_sentences
    assert all(u.feats.shape[1] == 1 for u in utts)
    total = sum(u.feats.shape[0] for u in utts)
    assert total == chunk.n_frames


def test_prefetcher(exp):
    ds = exp.datasets["synth_tr"]
    pf = ChunkPrefetcher()
    pf.start(lambda: load_chunk(ds, ["mfcc"], ["lab_cd"], 1000))
    chunk = pf.take()
    assert chunk.n_frames > 0
    pf.start(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    with pytest.raises(RuntimeError, match="boom"):
        pf.take()


def test_planner_structure(exp):
    plan = build_plan(exp)
    assert len(plan.epochs) == 2
    train_tasks = [t for t in plan.epochs[0].tasks if t.phase == "train"]
    valid_tasks = [t for t in plan.epochs[0].tasks if t.phase == "valid"]
    assert len(train_tasks) == 2  # n_chunks=2
    assert len(valid_tasks) == 1  # one valid point per epoch, dev n_chunks=1
    # rolling checkpoints: chunk 1 trains from chunk 0's output
    assert train_tasks[1].pretrain_files == train_tasks[0].ckpt_files
    # forward reads final checkpoints
    assert plan.forward_tasks[0].pretrain_files == plan.final_ckpts
    # chunks partition the utterance list
    all_utts = sorted(
        line for t in train_tasks for line in t.fea_lists["mfcc"]
    )
    assert len(all_utts) == 12
    assert len(set(all_utts)) == 12
    # epochs are differently shuffled
    ep1_tasks = [t for t in plan.epochs[1].tasks if t.phase == "train"]
    assert (
        train_tasks[0].fea_lists["mfcc"] != ep1_tasks[0].fea_lists["mfcc"]
        or train_tasks[1].fea_lists["mfcc"] != ep1_tasks[1].fea_lists["mfcc"]
    )
    # ledger: tasks not done until .info exists
    assert not train_tasks[0].done
    train_tasks[0].write_lst_files()
    import os

    assert os.path.exists(train_tasks[0].lst_files["mfcc"])


def test_split_chunks_and_validation_points():
    assert split_chunks(list(range(10)), 3) == [[0, 1, 2], [3, 4, 5, 6], [7, 8, 9]]
    assert validation_points(5, 1) == [4]
    assert validation_points(10, 2) == [4, 9]


def test_deterministic_plan(exp):
    p1 = build_plan(exp)
    p2 = build_plan(exp)
    t1 = [t.fea_lists for t in p1.epochs[0].tasks]
    t2 = [t.fea_lists for t in p2.epochs[0].tasks]
    assert t1 == t2


def test_forward_task_host_sharding(exp):
    plan = build_plan(exp)
    # 3 hosts partition the forward tasks completely and disjointly
    shards = [plan.shard_forward_tasks(h, 3) for h in range(3)]
    all_ids = [id(t) for s in shards for t in s]
    assert sorted(all_ids) == sorted(id(t) for t in plan.forward_tasks)
    assert len(set(all_ids)) == len(all_ids)


def test_forward_batches_exact_reassembly(exp):
    """Bucketed batched forward preserves every utterance exactly: padded
    batches slice back to the per-utterance streams, names/lengths align,
    every utterance appears exactly once, batch axis is padded to size."""
    from tpukaldi.data import iter_forward_batches

    ds = exp.datasets["synth_tr"]
    chunk = load_chunk(ds, ["mfcc"], ["lab_cd"], max_seq_length=1000)
    per_utt = {u.names[0]: u.feats[:, 0] for u in iter_forward_utterances(chunk)}

    seen = []
    for b in iter_forward_batches(chunk, batch_size=4):
        assert b.feats.shape[1] == 4  # batch axis always padded
        for k, name in enumerate(b.names):
            ln = int(b.lengths[k])
            np.testing.assert_array_equal(b.feats[:ln, k], per_utt[name])
            # rows past the true length are zero padding
            assert not b.feats[ln:, k].any()
            seen.append(name)
        # padded rows beyond the real group have zero length
        assert not b.lengths[len(b.names):].any()
    assert sorted(seen) == sorted(chunk.names)


def test_batching_consumes_exact_reference_frame_count():
    """Tail batches that do not fill batch_size are dropped (reference
    N_batches = N // batch_size, core.py:558-559).  Assert the EXACT
    number of frames/sentences consumed so silent under-consumption can
    never regress unnoticed (ADVICE r1: tail-drop is documented parity,
    but must stay observable)."""
    from tpukaldi.data.batching import (iter_frame_batches, iter_seq_batches,
                                        n_frame_batches, n_seq_batches)
    from tpukaldi.data.synth import generate_corpus
    from tpukaldi.config.cfg import DatasetSpec
    from tpukaldi.data import load_chunk
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        corpus = generate_corpus(tmp + "/c", n_utts=7, seed=23)
        from tpukaldi.config import load_config
        from tpukaldi.data.synth import write_cfg

        cfg = write_cfg(corpus, tmp + "/e", arch="MLP", batch_size=64, cw=0)
        ds = load_config(cfg).datasets["synth_tr"]

        chunk = load_chunk(ds, ["mfcc"], ["lab_cd"], 1000)
        # frame mode: 64-frame batches, tail dropped
        bs = 64
        frames = sum(b.feats.shape[0] for b in iter_frame_batches(chunk, bs))
        assert frames == (chunk.n_frames // bs) * bs
        assert frames == n_frame_batches(chunk, bs) * bs
        assert chunk.n_frames - frames < bs  # dropped tail is < one batch

        # sequence mode: 2-sentence batches, tail sentence dropped
        sents = sum(len(b.names) for b in iter_seq_batches(chunk, 2))
        assert sents == (chunk.n_sentences // 2) * 2
        assert sents == n_seq_batches(chunk, 2) * 2
        # and every consumed sentence's true frames are present exactly once
        consumed = sum(
            int(l) for b in iter_seq_batches(chunk, 2) for l in b.lengths
        )
        starts = chunk.end_index[: (chunk.n_sentences // 2) * 2]
        assert consumed == int(starts[-1])
