"""End-to-end smoke: the full experiment driver on the synthetic corpus —
config -> plan -> train (2 epochs, chunked, with validation + annealing) ->
res.res -> final checkpoints -> forward posterior arks; then ledger resume
and the data-parallel mesh path on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

from tpukaldi.data.synth import generate_corpus, write_cfg
from tpukaldi.io import read_mat_ark
from tpukaldi.tools.run_exp import run_experiment


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return generate_corpus(str(root / "corpus"), n_utts=10, seed=5, noise=0.4)


def test_full_mlp_experiment(corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp_out"))
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=3, n_chunks=2,
                    batch_size=64, lr=0.3)
    exp = run_experiment(cfg)

    # res.res has one line per epoch in the reference format
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    assert len(lines) == 3
    assert lines[0].startswith("ep=0 tr=")
    assert "valid=synth_dev" in lines[0]
    assert "lr_MLP_layers1=" in lines[0]

    # training made progress: err decreased across epochs
    import re

    losses = [float(re.search(r"valid=\S+ loss=(\d+\.\d+)", l).group(1))
              for l in lines]
    assert losses[-1] < losses[0]

    # final checkpoint + posterior ark exist; posteriors decode-ready
    ef = os.path.join(out, "exp_files")
    assert os.path.exists(os.path.join(ef, "final_MLP_layers1.ckpt"))
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    assert arks
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    assert all(m.shape[1] == 10 and np.isfinite(m).all() for m in posts.values())
    # prior-normalized log-softmax: rows do NOT sum to 1 in prob space
    # (priors subtracted), but raw magnitudes stay sane
    assert all(np.abs(m).max() < 50 for m in posts.values())

    # ledger resume: second invocation skips all done tasks quickly
    exp2 = run_experiment(cfg)
    assert exp2.n_epochs == 3


def test_full_ligru_experiment_mesh(corpus, tmp_path_factory):
    """Sequential (liGRU) path end-to-end on the 8-device CPU mesh."""
    out = str(tmp_path_factory.mktemp("exp_ligru"))
    cfg = write_cfg(corpus, out, arch="liGRU", hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=2, lr=0.2)
    run_experiment(cfg, use_mesh=True)
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    assert len(lines) == 1
    ef = os.path.join(out, "exp_files")
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    # forward emits one matrix per utterance with the utterance's length
    assert len(posts) >= 3


def test_chunk_cfgs_materialized(corpus, tmp_path_factory):
    """Per-chunk .cfg ledger artifacts are written in the reference's
    global_chunk format and re-validate against the chunk proto."""
    import configparser

    from tpukaldi.config import protos
    from tpukaldi.config.schema import validate_section

    out = str(tmp_path_factory.mktemp("ckcfg"))
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=1, n_chunks=2,
                    batch_size=64, lr=0.2)
    run_experiment(cfg)
    ef = os.path.join(out, "exp_files")
    chunk_cfgs = sorted(f for f in os.listdir(ef) if f.endswith(".cfg"))
    # 2 train + 1 valid + 1 forward
    assert len(chunk_cfgs) == 4
    cp = configparser.ConfigParser()
    cp.read(os.path.join(ef, chunk_cfgs[0]))
    assert cp["exp"]["to_do"] in ("train", "valid", "forward")
    assert cp["exp"]["out_info"].endswith(".info")
    # chunk fea list points at the materialized .lst
    assert "_mfcc.lst" in cp["data_chunk"]["fea"]
    # validates against the chunk proto's exp section
    proto = dict(protos.GLOBAL_CHUNK["exp"])
    validate_section(cp["exp"], proto, "exp")
    # train chunk 1 pretrains from chunk 0's checkpoint
    cp1 = configparser.ConfigParser()
    train_cfgs = [f for f in chunk_cfgs if f.startswith("train")]
    cp1.read(os.path.join(ef, train_cfgs[1]))
    assert "_ck0_MLP_layers1.ckpt" in cp1["architecture1"]["arch_pretrain_file"]


@pytest.mark.parametrize("arch,hidden", [("QLSTM", 16), ("SRU", 16),
                                         ("GRU", 12), ("LSTM", 12)])
def test_other_arch_experiments(arch, hidden, corpus, tmp_path_factory):
    """Full driver e2e for the remaining sequential families."""
    out = str(tmp_path_factory.mktemp(f"exp_{arch}"))
    if arch == "QLSTM":
        # quaternion dims must be multiples of 4: 12-dim feats, cw 0
        corpus = generate_corpus(os.path.join(out, "c"), n_utts=10,
                                 feat_dim=12, seed=5, noise=0.4)
        cfg = write_cfg(corpus, out, arch=arch, hidden=hidden, n_epochs=1,
                        n_chunks=1, batch_size=2, lr=0.1, cw=0)
    else:
        cfg = write_cfg(corpus, out, arch=arch, hidden=hidden, n_epochs=1,
                        n_chunks=1, batch_size=2, lr=0.1)
    run_experiment(cfg)
    lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
    assert len(lines) == 1
    ef = os.path.join(out, "exp_files")
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    assert all(m.shape[1] == 10 and np.isfinite(m).all()
               for m in posts.values())


def test_fusion_rnn_experiment(tmp_path_factory):
    """6-mic fusionRNN through the full driver (DIRHA 6ch pattern): the
    corpus stacks 6 noisy copies of the clean features as 'microphones'."""
    import dataclasses

    from tpukaldi.io import ArkScpWriter, read_mat_scp

    root = tmp_path_factory.mktemp("fus")
    corpus = generate_corpus(str(root / "c"), n_utts=8, seed=6, noise=0.3)
    rng = np.random.default_rng(0)
    for split, scp in corpus.feats_scp.items():
        d = os.path.dirname(scp)
        with ArkScpWriter(os.path.join(d, "mc.ark"),
                          os.path.join(d, "mc.scp")) as w:
            for key, mat in read_mat_scp(scp):
                mics = [mat + 0.2 * rng.standard_normal(mat.shape)
                        for _ in range(6)]
                w.write(key, np.concatenate(mics, axis=1).astype(np.float32))
        corpus.feats_scp[split] = os.path.join(d, "mc.scp")
    out = str(tmp_path_factory.mktemp("fus_exp"))
    cfg = write_cfg(corpus, out, arch="fusionRNN", hidden=12, n_epochs=1,
                    n_chunks=1, batch_size=2, lr=0.002, cw=0)
    run_experiment(cfg)
    ef = os.path.join(out, "exp_files")
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    posts = dict(read_mat_ark(os.path.join(ef, arks[0])))
    assert all(m.shape[1] == 10 and np.isfinite(m).all()
               for m in posts.values())


def test_mid_run_crash_resume_matches_uninterrupted(corpus, tmp_path_factory,
                                                    monkeypatch):
    """Kill the driver mid-epoch-1, resume in a fresh invocation: the ledger
    (.info skip + rolling checkpoint restore) must reproduce the
    uninterrupted run's per-epoch results exactly (SURVEY.md §7.4 item 6)."""
    import re
    from tpukaldi.train.chunk_runtime import ChunkRuntime

    def run(out, crash_after=None):
        cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=2,
                        n_chunks=2, batch_size=32, lr=0.2)
        if crash_after is not None:
            real = ChunkRuntime.run_task
            calls = {"n": 0}

            def crashing(self, task, **kw):
                if calls["n"] >= crash_after and task.phase == "train":
                    raise KeyboardInterrupt("simulated crash")
                calls["n"] += 1
                return real(self, task, **kw)

            monkeypatch.setattr(ChunkRuntime, "run_task", crashing)
            with pytest.raises(KeyboardInterrupt):
                run_experiment(cfg)
            monkeypatch.setattr(ChunkRuntime, "run_task", real)
        run_experiment(cfg)
        lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
        return [re.sub(r"time\(s\)=\d+", "", l) for l in lines]

    control = run(str(tmp_path_factory.mktemp("ctl")))
    resumed = run(str(tmp_path_factory.mktemp("crash")), crash_after=3)
    # the resumed run re-dumps finished epochs from the ledger, then the
    # live ones: its last len(control) lines must equal the control run
    assert resumed[-len(control):] == control


def test_crash_after_last_info_before_ckpt_flush_replays(corpus,
                                                         tmp_path_factory):
    """The end-of-training crash window: every train .info exists but the
    LAST chunk's async checkpoint never flushed.  Resume must detect the
    missing state and replay the tail instead of running the forward stage
    on freshly initialized params (silent-garbage-posteriors hazard)."""
    import glob
    import re

    def res_lines(out):
        lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
        return [re.sub(r"time\(s\)=\d+", "", l) for l in lines]

    control = str(tmp_path_factory.mktemp("cw_ctl"))
    cfg = write_cfg(corpus, control, arch="MLP", hidden=16, n_epochs=2,
                    n_chunks=2, batch_size=32, lr=0.2)
    run_experiment(cfg)
    want = res_lines(control)

    crashed = str(tmp_path_factory.mktemp("cw"))
    cfg = write_cfg(corpus, crashed, arch="MLP", hidden=16, n_epochs=2,
                    n_chunks=2, batch_size=32, lr=0.2)
    run_experiment(cfg)
    ef = os.path.join(crashed, "exp_files")
    # simulate the crash window: last train chunk's ckpt (and everything
    # derived from it) never hit disk, but its .info did
    for f in glob.glob(os.path.join(ef, "train_synth_tr_ep1_ck1_*.ckpt")):
        os.remove(f)
    for f in glob.glob(os.path.join(ef, "final_*.ckpt")):
        os.remove(f)
    for f in glob.glob(os.path.join(ef, "forward_*")) + glob.glob(
        os.path.join(ef, "decoding_*")
    ):
        os.remove(f)
    os.remove(os.path.join(crashed, "res.res"))
    run_experiment(cfg)
    got = res_lines(crashed)
    assert got[-len(want):] == want
    assert glob.glob(os.path.join(ef, "final_*.ckpt"))


def test_finished_run_with_only_final_ckpts_is_noop_resume(corpus,
                                                           tmp_path_factory):
    """Rolling train checkpoints deleted after final promotion (normal disk
    hygiene) must NOT trigger a tail replay: intact final_*.ckpt files mean
    the run's final state is on disk and a re-invocation is a no-op."""
    import glob

    from tpukaldi.config import load_config
    from tpukaldi.plan import build_plan
    from tpukaldi.plan.planner import repair_resume_point

    out = str(tmp_path_factory.mktemp("noop"))
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=2,
                    n_chunks=2, batch_size=32, lr=0.2)
    run_experiment(cfg)
    ef = os.path.join(out, "exp_files")
    rolling = glob.glob(os.path.join(ef, "train_*_ck*_*.ckpt"))
    assert rolling
    for f in rolling:
        os.remove(f)
    assert glob.glob(os.path.join(ef, "final_*.ckpt"))
    plan = build_plan(load_config(cfg))
    assert repair_resume_point(plan) == []  # no ledger invalidation
    infos = set(glob.glob(os.path.join(ef, "train_*.info")))
    run_experiment(cfg)  # full driver re-invocation is also a no-op
    assert set(glob.glob(os.path.join(ef, "train_*.info"))) == infos
    # rolling checkpoints were NOT regenerated (nothing retrained)
    assert not glob.glob(os.path.join(ef, "train_*_ck*_*.ckpt"))


def test_ckpt_cadence_matches_per_chunk(corpus, tmp_path_factory, monkeypatch):
    """TPUKALDI_CKPT_EVERY=N must not change any result: identical res.res
    (modulo wall time) and identical posteriors, with rolling checkpoints
    written only at the cadence points + the last chunk of each epoch."""
    import re

    def run(out, every):
        if every is not None:
            monkeypatch.setenv("TPUKALDI_CKPT_EVERY", str(every))
        else:
            monkeypatch.delenv("TPUKALDI_CKPT_EVERY", raising=False)
        cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=2,
                        n_chunks=4, batch_size=32, lr=0.2)
        run_experiment(cfg)
        lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
        return [re.sub(r"time\(s\)=\d+", "", l) for l in lines]

    out_ctl = str(tmp_path_factory.mktemp("cad_ctl"))
    out_cad = str(tmp_path_factory.mktemp("cad_4"))
    control = run(out_ctl, None)
    cadenced = run(out_cad, 4)
    monkeypatch.delenv("TPUKALDI_CKPT_EVERY", raising=False)
    assert cadenced == control
    ef_ctl = os.path.join(out_ctl, "exp_files")
    ef_cad = os.path.join(out_cad, "exp_files")
    ctl_ckpts = sorted(f for f in os.listdir(ef_ctl)
                       if f.startswith("train") and f.endswith(".ckpt"))
    cad_ckpts = sorted(f for f in os.listdir(ef_cad)
                       if f.startswith("train") and f.endswith(".ckpt"))
    assert len(ctl_ckpts) == 8  # 2 epochs x 4 chunks
    assert len(cad_ckpts) == 2 and all("ck3" in f for f in cad_ckpts)
    # the final promoted checkpoints agree bit-for-bit (same training math)
    fa = open(os.path.join(ef_ctl, "final_MLP_layers1.ckpt"), "rb").read()
    fb = open(os.path.join(ef_cad, "final_MLP_layers1.ckpt"), "rb").read()
    assert fa == fb


def test_ckpt_cadence_crash_resume_replays(corpus, tmp_path_factory,
                                           monkeypatch):
    """Crash after a NON-checkpointed chunk under cadence: resume must
    invalidate the un-restorable ledger tail and replay it deterministically,
    reproducing the uninterrupted run exactly."""
    import re
    from tpukaldi.train.chunk_runtime import ChunkRuntime

    monkeypatch.setenv("TPUKALDI_CKPT_EVERY", "4")

    def run(out, crash_after=None):
        cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=2,
                        n_chunks=4, batch_size=32, lr=0.2)
        if crash_after is not None:
            real = ChunkRuntime.run_task
            calls = {"n": 0}

            def crashing(self, task, **kw):
                if calls["n"] >= crash_after and task.phase == "train":
                    raise KeyboardInterrupt("simulated crash")
                calls["n"] += 1
                return real(self, task, **kw)

            monkeypatch.setattr(ChunkRuntime, "run_task", crashing)
            with pytest.raises(KeyboardInterrupt):
                run_experiment(cfg)
            monkeypatch.setattr(ChunkRuntime, "run_task", real)
            ef = os.path.join(out, "exp_files")
            # the crash point is mid-cadence: .info files exist with no ckpt
            infos = [f for f in os.listdir(ef)
                     if f.startswith("train") and f.endswith(".info")]
            ckpts = [f for f in os.listdir(ef)
                     if f.startswith("train") and f.endswith(".ckpt")]
            assert infos and not ckpts
        run_experiment(cfg)
        lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
        return [re.sub(r"time\(s\)=\d+", "", l) for l in lines]

    control = run(str(tmp_path_factory.mktemp("cadctl")))
    resumed = run(str(tmp_path_factory.mktemp("cadcrash")), crash_after=2)
    monkeypatch.delenv("TPUKALDI_CKPT_EVERY", raising=False)
    assert resumed[-len(control):] == control


def test_multistep_fusion_reproduces_unfused(corpus, tmp_path_factory,
                                             monkeypatch):
    """TPUKALDI_MULTISTEP=K fuses K train AND eval batches into single
    dispatches; the fused run must reproduce the unfused run's res.res
    exactly (identical math, one launch)."""
    import re

    def run(out, k):
        monkeypatch.setenv("TPUKALDI_MULTISTEP", str(k))
        cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=2,
                        n_chunks=2, batch_size=16, lr=0.2)
        run_experiment(cfg)
        lines = [l for l in open(os.path.join(out, "res.res")).read().strip().splitlines() if not l.startswith("phases ")]
        return [re.sub(r"time\(s\)=\d+", "", l) for l in lines]

    unfused = run(str(tmp_path_factory.mktemp("k1")), 1)
    fused = run(str(tmp_path_factory.mktemp("k4")), 4)
    monkeypatch.delenv("TPUKALDI_MULTISTEP", raising=False)
    assert fused == unfused


def test_host_prefetch_reproduces_inline(corpus, tmp_path_factory,
                                         monkeypatch):
    """TPUKALDI_HOST_PREFETCH=1 (default) assembles batches on a
    background thread to overlap with device dispatch; it must reproduce
    the inline (=0) run's res.res exactly — same batch order, same
    fold_in dropout indices (chunk_runtime assembly_plan docstring)."""
    import re

    def run(out, prefetch):
        monkeypatch.setenv("TPUKALDI_HOST_PREFETCH", prefetch)
        monkeypatch.setenv("TPUKALDI_MULTISTEP", "3")  # mixed group/single
        try:
            cfg = write_cfg(corpus, out, arch="liGRU", hidden=16,
                            n_epochs=2, n_chunks=2, batch_size=4, lr=0.1)
            run_experiment(cfg)
        finally:
            monkeypatch.delenv("TPUKALDI_HOST_PREFETCH", raising=False)
            monkeypatch.delenv("TPUKALDI_MULTISTEP", raising=False)
        lines = [l for l in open(os.path.join(out, "res.res")).read()
                 .strip().splitlines() if not l.startswith("phases ")]
        return [re.sub(r"time\(s\)=\d+", "", l) for l in lines]

    inline = run(str(tmp_path_factory.mktemp("pf0")), "0")
    prefetched = run(str(tmp_path_factory.mktemp("pf1")), "1")
    assert prefetched == inline


def test_forward_d2h_quantization_knob(corpus, tmp_path_factory, monkeypatch):
    """TPUKALDI_FORWARD_D2H=float16 quantizes the posteriors on device
    before the D2H copy (transfer-bound links); the emitted ark must stay
    float32 on disk with values within f16 quantization of the exact run."""
    import re

    def run(out, d2h):
        if d2h:
            monkeypatch.setenv("TPUKALDI_FORWARD_D2H", d2h)
        else:
            monkeypatch.delenv("TPUKALDI_FORWARD_D2H", raising=False)
        cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                        n_chunks=1, batch_size=32, lr=0.2)
        run_experiment(cfg)
        ef = os.path.join(out, "exp_files")
        ark = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")][0]
        return dict(read_mat_ark(os.path.join(ef, ark)))

    exact = run(str(tmp_path_factory.mktemp("d2h_f32")), None)
    quant = run(str(tmp_path_factory.mktemp("d2h_f16")), "float16")
    monkeypatch.delenv("TPUKALDI_FORWARD_D2H", raising=False)
    assert set(exact) == set(quant)
    for k in exact:
        assert quant[k].dtype == np.float32  # ark is still FM float32
        assert exact[k].shape == quant[k].shape
        # f16 has ~2^-11 relative precision; log posteriors are O(10)
        np.testing.assert_allclose(quant[k], exact[k], atol=0.05, rtol=1e-3)
        # and the quantization is real: runs are NOT bit-identical
    assert any((exact[k] != quant[k]).any() for k in exact)


def test_restore_from_skips_writer_join_when_resident(corpus,
                                                      tmp_path_factory):
    """The rolling train flow keeps state resident; chunk starts must NOT
    block on the previous chunk's async checkpoint serialize+write (that
    join gated every chunk and masked the ckpt-cadence knob in round 2)."""
    from tpukaldi.config import load_config
    from tpukaldi.train.chunk_runtime import ChunkRuntime

    out = str(tmp_path_factory.mktemp("resjoin"))
    cfg = write_cfg(corpus, out, arch="MLP", hidden=16, n_epochs=1,
                    n_chunks=1, batch_size=32, lr=0.2)
    exp = load_config(cfg)
    rt = ChunkRuntime(exp)
    waits = []
    real_wait = rt.checkpointer.wait
    rt.checkpointer.wait = lambda: waits.append(1) or real_wait()

    # resident case: pretrain pointers exactly match what mark_saved
    # recorded -> no join, no load
    rt._loaded_from = {"MLP_layers1": "/x/ck0.ckpt"}
    rt.restore_from({"MLP_layers1": "/x/ck0.ckpt"})
    assert not waits

    # reload case (crash resume / transfer): a differing pointer joins the
    # writer before checking the file
    rt.restore_from({"MLP_layers1": "/x/other.ckpt"})
    assert waits
