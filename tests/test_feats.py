"""Feature-op tests: splice semantics vs a naive reference, CMVN stats
arithmetic, Kaldi delta coefficients."""

import numpy as np

from tpukaldi.io import feats as F


def _naive_splice(fea, left, right):
    """Per-frame gather equivalent of the reference's context_window_old
    (only valid away from edges, which both impls drop)."""
    n, d = fea.shape
    out = np.empty((n - left - right, d * (left + right + 1)))
    for t in range(left, n - right):
        out[t - left] = np.concatenate(
            [fea[t + lag] for lag in range(-left, right + 1)]
        )
    return out


def test_splice_matches_naive():
    rng = np.random.default_rng(1)
    fea = rng.standard_normal((40, 6))
    for left, right in [(0, 0), (1, 1), (5, 5), (3, 0), (0, 4), (2, 7)]:
        got = F.splice(fea, left, right)
        if left == 0 and right == 0:
            np.testing.assert_array_equal(got, fea)
        else:
            np.testing.assert_allclose(got, _naive_splice(fea, left, right))


def test_chunk_cmvn():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1000, 13)) * 3.0 + 5.0
    y = F.chunk_cmvn(x)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=1e-5)


def test_apply_cmvn_roundtrip():
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((200, 13)) * 2.0 + 1.0
    stats = F.compute_cmvn_stats(feats)
    out = F.apply_cmvn(feats, stats, norm_vars=True)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-6)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-3)
    out_mean_only = F.apply_cmvn(feats, stats, norm_vars=False)
    np.testing.assert_allclose(out_mean_only.mean(axis=0), 0.0, atol=1e-6)


def test_delta_scales_order1():
    # Kaldi window=2 slope filter: [-2,-1,0,1,2]/10
    scales = F._delta_scales(1, 2)
    np.testing.assert_allclose(scales[1], np.array([-2, -1, 0, 1, 2]) / 10.0)


def test_add_deltas_shapes_and_linear_ramp():
    n, d = 50, 4
    feats = np.tile(np.arange(n, dtype=np.float64)[:, None], (1, d))
    out = F.add_deltas(feats, order=2, window=2)
    assert out.shape == (n, 3 * d)
    # slope of a unit ramp is 1 away from the clamped edges
    np.testing.assert_allclose(out[5:-5, d : 2 * d], 1.0, atol=1e-5)
    # second derivative of a ramp is 0 away from edges
    np.testing.assert_allclose(out[5:-5, 2 * d :], 0.0, atol=1e-5)


def test_counts_roundtrip(tmp_path):
    counts = np.array([10.0, 2.5, 300.0], dtype=np.float32)
    path = tmp_path / "counts"
    F.save_counts(counts, str(path))
    np.testing.assert_allclose(F.load_counts(str(path)), counts)


def test_pipeline_apply_cmvn_and_deltas(tmp_path):
    from tpukaldi.io import ArkScpWriter, apply_pipeline, parse_pipeline, write_mat

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((30, 13)).astype(np.float32)
    stats = F.compute_cmvn_stats(feats)
    cmvn_ark = tmp_path / "cmvn.ark"
    with open(cmvn_ark, "wb") as f:
        write_mat(f, stats.astype(np.float64), key="spk1")
    u2s = tmp_path / "utt2spk"
    u2s.write_text("utt1 spk1\n")
    opts = (
        f"apply-cmvn --utt2spk=ark:{u2s} ark:{cmvn_ark} ark:- ark:- |"
        " add-deltas --delta-order=2 ark:- ark:- |"
    )
    stages = parse_pipeline(opts)
    out = apply_pipeline(stages, "utt1", feats)
    assert out.shape == (30, 39)
    expect = F.add_deltas(F.apply_cmvn(feats, stats), order=2, window=2)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_pipeline_apply_cmvn_scp_indirection(tmp_path):
    """Standard Kaldi recipes reference cmvn stats through an scp
    (compute_cmvn_stats.sh -> cmvn.scp); `apply-cmvn ... scp:cmvn.scp`
    must honor the indirection, matching the direct-ark result."""
    from tpukaldi.io import ArkScpWriter, apply_pipeline, parse_pipeline

    rng = np.random.default_rng(8)
    feats = rng.standard_normal((20, 7)).astype(np.float32)
    stats = F.compute_cmvn_stats(feats)
    with ArkScpWriter(str(tmp_path / "cmvn.ark"),
                      str(tmp_path / "cmvn.scp")) as w:
        w.write("spk1", stats.astype(np.float64))
    u2s = tmp_path / "utt2spk"
    u2s.write_text("utt1 spk1\n")
    stages = parse_pipeline(
        f"apply-cmvn --utt2spk=ark:{u2s} scp:{tmp_path}/cmvn.scp "
        "ark:- ark:- |"
    )
    out = apply_pipeline(stages, "utt1", feats)
    np.testing.assert_allclose(out, F.apply_cmvn(feats, stats), rtol=1e-5)


def test_pipeline_splice_feats_edge_replication():
    """splice-feats replicates edge frames (Kaldi semantics, distinct from
    the chunk-level roll splice at data_io.py:228); asymmetric contexts."""
    from tpukaldi.io import apply_pipeline, parse_pipeline

    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    stages = parse_pipeline(
        "splice-feats --left-context=2 --right-context=1 ark:- ark:- |"
        " copy-feats ark:- ark:- |"
    )
    out = apply_pipeline(stages, "u", feats)
    assert out.shape == (6, 2 * 4)
    # first row: frames [-2,-1,0,1] clip to [0,0,0,1]
    np.testing.assert_array_equal(out[0], np.concatenate(
        [feats[0], feats[0], feats[0], feats[1]]))
    # last row: frames [3,4,5,6] clip to [3,4,5,5]
    np.testing.assert_array_equal(out[-1], np.concatenate(
        [feats[3], feats[4], feats[5], feats[5]]))
