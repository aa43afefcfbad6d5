"""Decode-bridge tests: conf generation, script invocation (stubbed
decode_dnn.sh), WER harvesting, res.res integration, save_out_file
cleanup."""

import os
import stat

import pytest

from tpukaldi.config.cfg import DecodingSpec, LabelSpec
from tpukaldi.decode import harvest_wer, run_decode, write_decoding_conf


STUB = """#!/bin/bash
# decode_dnn.sh stub: <conf> <out_dir> "<ark files>"
conf=$1; out=$2; arks=$3
mkdir -p "$out"
grep -q "alidir" "$conf" || exit 1
for a in $arks; do [ -f "$a" ] || exit 2; done
echo "%WER 18.1 [ 1234 / 6820 ]" > "$out/wer_4"
echo "%WER 17.2 [ 1173 / 6820 ]" > "$out/wer_5"
echo "%WER 17.9 [ 1220 / 6820 ]" > "$out/wer_6"
exit 0
"""


def _fake_exp(tmp_path, script):
    class Exp:
        pass

    exp = Exp()
    exp.out_folder = str(tmp_path / "out")
    os.makedirs(exp.out_folder, exist_ok=True)
    exp.decoding = DecodingSpec(
        script_folder=str(tmp_path),
        script=os.path.basename(script),
        options={"beam": "13.0", "acwt": "0.2", "min_active": "200"},
    )
    return exp


def test_write_decoding_conf(tmp_path):
    lab = LabelSpec("lab_cd", str(tmp_path), "ali-to-pdf",
                    data_folder=str(tmp_path), graph=str(tmp_path))
    dec = DecodingSpec(options={"beam": "13.0", "acwt": "0.2"})
    conf = write_decoding_conf(str(tmp_path / "d.conf"), dec, lab, "/o")
    text = open(conf).read()
    assert "[decoding]" in text
    assert "beam = 13.0" in text
    assert f"alidir = {tmp_path}" in text
    assert "out_folder = /o" in text


def test_run_decode_and_harvest(tmp_path):
    script = tmp_path / "decode_dnn.sh"
    script.write_text(STUB)
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    ark = tmp_path / "post.ark"
    ark.write_bytes(b"dummy")
    exp = _fake_exp(tmp_path, str(script))
    lab = LabelSpec("lab_cd", str(tmp_path), "ali-to-pdf",
                    data_folder=str(tmp_path), graph=str(tmp_path))
    log = str(tmp_path / "log.log")
    dec_dir = run_decode(exp, lab, "out_dnn1", "test", [str(ark)], log)
    assert dec_dir and os.path.isdir(dec_dir)
    best = harvest_wer(dec_dir)
    assert best["wer"] == 17.2  # min over LM weights
    assert best["file"].endswith("wer_5")


def test_run_decode_missing_script_logs_and_skips(tmp_path):
    exp = _fake_exp(tmp_path, str(tmp_path / "nonexistent.sh"))
    lab = LabelSpec("lab_cd", str(tmp_path), "", data_folder=str(tmp_path),
                    graph=str(tmp_path))
    log = str(tmp_path / "log.log")
    out = run_decode(exp, lab, "o", "d", ["a.ark"], log)
    assert out is None
    assert "skipped" in open(log).read()


def test_run_decode_failure_raises(tmp_path):
    script = tmp_path / "decode_dnn.sh"
    script.write_text("#!/bin/bash\nexit 3\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    exp = _fake_exp(tmp_path, str(script))
    lab = LabelSpec("lab_cd", str(tmp_path), "", data_folder=str(tmp_path),
                    graph=str(tmp_path))
    with pytest.raises(RuntimeError, match="decode script failed"):
        run_decode(exp, lab, "o", "d", [], str(tmp_path / "log.log"))


def test_e2e_decode_with_stub(tmp_path):
    """Full experiment with a stubbed decode script: WER lands in res.res
    and save_out_file=False removes the posterior arks."""
    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    script = tmp_path / "decode_dnn.sh"
    script.write_text(STUB)
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=8)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="MLP", n_epochs=1,
                    n_chunks=1, batch_size=64)
    text = open(cfg).read()
    text += f"""
[decoding]
decoding_script_folder = {tmp_path}
decoding_script = decode_dnn.sh
decoding_proto = proto/decoding.proto
beam = 13.0
acwt = 0.2
"""
    cfg2 = tmp_path / "dec.cfg"
    cfg2.write_text(text)
    run_experiment(str(cfg2))
    res = open(tmp_path / "e" / "res.res").read()
    assert "%WER 17.2" in res
    # save_out_file=False -> arks removed after decode
    ef = tmp_path / "e" / "exp_files"
    assert not [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]


def test_cmd_launcher_prefix(tmp_path):
    """[exp] cmd prepends a launcher (queue.pl-style wrapper) to the decode
    command line (reference run_exp.py:595)."""
    import types

    script = tmp_path / "decode.sh"
    script.write_text("#!/bin/bash\nmkdir -p $2\n")
    script.chmod(0o755)
    wrapper = tmp_path / "launcher.sh"
    wrapper.write_text(f'#!/bin/bash\necho "$@" > {tmp_path}/launched.txt\nexec "$@"\n')
    wrapper.chmod(0o755)
    ark = tmp_path / "post.ark"
    ark.write_bytes(b"")
    exp = types.SimpleNamespace(
        out_folder=str(tmp_path), cmd=str(wrapper),
        decoding=DecodingSpec(script_folder=str(tmp_path), script="decode.sh",
                              options={}),
    )
    lab = LabelSpec("lab_cd", str(tmp_path), "", data_folder=str(tmp_path),
                    graph=str(tmp_path))
    run_decode(exp, lab, "o", "d", [str(ark)], str(tmp_path / "log"))
    assert "decode.sh" in (tmp_path / "launched.txt").read_text()


STUB_DETAIL = """#!/bin/bash
# decode_dnn.sh stub with full kaldi compute-wer detail lines + call marker
conf=$1; out=$2; arks=$3
mkdir -p "$out"
echo run >> "$out/../decode_calls.txt"
grep -q "alidir" "$conf" || exit 1
for a in $arks; do [ -f "$a" ] || exit 2; done
echo "%WER 18.10 [ 1234 / 6820, 210 ins, 310 del, 714 sub ]" > "$out/wer_4"
echo "%WER 17.20 [ 1173 / 6820, 198 ins, 295 del, 680 sub ]" > "$out/wer_5"
exit 0
"""


def _write_stub(tmp_path, text=STUB_DETAIL):
    script = tmp_path / "decode_dnn.sh"
    script.write_text(text)
    script.chmod(0o755)
    return script


def _decoding_section(tmp_path):
    return f"""
[decoding]
decoding_script_folder = {tmp_path}
decoding_script = decode_dnn.sh
decoding_proto = proto/decoding.proto
beam = 13.0
acwt = 0.2
"""


def test_full_wer_line_in_res(tmp_path):
    """res.res carries the reference best_wer.sh content: the full best line
    with ins/del/sub detail and the per-LM-weight file it came from."""
    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    _write_stub(tmp_path)
    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=8)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="MLP", n_epochs=1,
                    n_chunks=1, batch_size=64)
    cfg2 = tmp_path / "dec.cfg"
    cfg2.write_text(open(cfg).read() + _decoding_section(tmp_path))
    run_experiment(str(cfg2))
    res = open(tmp_path / "e" / "res.res").read()
    assert "%WER 17.20 [ 1173 / 6820, 198 ins, 295 del, 680 sub ]" in res
    assert "wer_5" in res


def test_decode_resume_ledger(tmp_path):
    """decoding_<data>_<out>.info gates the decode stage: a restart after
    decoding runs ZERO decode subprocesses and appends no duplicate WER
    line (the reference checks this file at run_exp.py:548,592)."""
    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    _write_stub(tmp_path)
    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=8)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="MLP", n_epochs=1,
                    n_chunks=1, batch_size=64)
    cfg2 = tmp_path / "dec.cfg"
    cfg2.write_text(open(cfg).read() + _decoding_section(tmp_path))
    run_experiment(str(cfg2))
    ef = tmp_path / "e" / "exp_files"
    info = ef / "decoding_synth_te_out_dnn1.info"
    assert info.exists(), os.listdir(ef)
    assert "wer=17.2" in info.read_text()
    calls = tmp_path / "e" / "decode_calls.txt"
    assert calls.read_text().count("run") == 1
    # restart: everything ledgered -> no new decode call, no duplicate WER
    run_experiment(str(cfg2))
    assert calls.read_text().count("run") == 1
    res = open(tmp_path / "e" / "res.res").read()
    assert res.count("%WER") == 1


def test_production_decode_with_stub(tmp_path):
    """Production (lab_name=none) decoding: data/graphdir come from the
    lab_data_folder/lab_graph kept in the none block, alidir is graphdir's
    parent, and the decode script runs (reference run_exp.py:571-583)."""
    import re as _re

    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    _write_stub(tmp_path)
    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=8)
    out = str(tmp_path / "e")
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=1, n_chunks=1,
                    batch_size=64)
    cfg2 = tmp_path / "dec.cfg"
    cfg2.write_text(open(cfg).read() + _decoding_section(tmp_path))
    run_experiment(str(cfg2))  # trains and writes final ckpts

    graph_dir = tmp_path / "model" / "graph"
    graph_dir.mkdir(parents=True)
    data_dir = tmp_path / "c" / "test"
    # rewrite dataset3's lab block to the production shape
    text = cfg2.read_text()
    head, _, tail = text.partition("[dataset3]")
    tail = _re.sub(
        r"lab = lab_name=lab_cd\n(\tlab_\w+=.*\n)+",
        f"lab = lab_name=none\n\tlab_data_folder={data_dir}\n"
        f"\tlab_graph={graph_dir}\n",
        tail,
        count=1,
    )
    prod_cfg = tmp_path / "prod.cfg"
    prod_cfg.write_text(head + "[dataset3]" + tail)
    # clear forward + decode ledgers so production redoes both stages
    ef = tmp_path / "e" / "exp_files"
    for fn in os.listdir(ef):
        if fn.startswith(("forward_", "decoding_")):
            os.remove(os.path.join(ef, fn))
    exp = run_experiment(str(prod_cfg))
    assert exp.production
    conf = (tmp_path / "e" / "decoding_synth_te_out_dnn1.conf").read_text()
    assert f"data = {data_dir}" in conf
    assert f"graphdir = {graph_dir}" in conf
    assert f"alidir = {tmp_path / 'model'}" in conf  # graphdir's parent
    calls = tmp_path / "e" / "decode_calls.txt"
    assert calls.read_text().count("run") == 2  # labeled run + production run
    assert (ef / "decoding_synth_te_out_dnn1.info").exists()


def test_harvest_ignores_ser_lines(tmp_path):
    """compute-wer writes %SER lines too; best_wer.sh greps only WER, so a
    low SER must never be reported as the best WER."""
    d = tmp_path / "dec"
    d.mkdir()
    (d / "wer_4").write_text(
        "%WER 104.10 [ 7100 / 6820, 3000 ins, 100 del, 4000 sub ]\n"
        "%SER 99.00 [ 190 / 192 ]\n"
    )
    (d / "wer_5").write_text(
        "%WER 103.50 [ 7059 / 6820, 2950 ins, 99 del, 4010 sub ]\n"
        "%SER 98.00 [ 188 / 192 ]\n"
    )
    best = harvest_wer(str(d))
    assert best["wer"] == 103.5
    assert "%WER 103.50" in best["line"]


STUB_NO_WER = """#!/bin/bash
# decode stub whose scoring produces nothing parseable
conf=$1; out=$2; arks=$3
mkdir -p "$out"
echo run >> "$out/../decode_calls.txt"
exit 0
"""


def test_no_wer_keeps_decode_retryable(tmp_path):
    """If decode runs but scoring yields no WER, the ledger must NOT be
    written and the posterior arks must survive, so a restart re-runs the
    decode (the reference always re-decodes, run_exp.py:548,592)."""
    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    _write_stub(tmp_path, STUB_NO_WER)
    corpus = generate_corpus(str(tmp_path / "c"), n_utts=6, seed=8)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="MLP", n_epochs=1,
                    n_chunks=1, batch_size=64)
    cfg2 = tmp_path / "dec.cfg"
    cfg2.write_text(open(cfg).read() + _decoding_section(tmp_path))
    run_experiment(str(cfg2))
    ef = tmp_path / "e" / "exp_files"
    assert not (ef / "decoding_synth_te_out_dnn1.info").exists()
    arks = [f for f in os.listdir(ef) if f.endswith("_to_decode.ark")]
    assert arks, "posterior arks must survive a failed scoring"
    calls = tmp_path / "e" / "decode_calls.txt"
    assert calls.read_text().count("run") == 1
    # scoring fixed -> restart decodes again and the ledger completes
    _write_stub(tmp_path)
    run_experiment(str(cfg2))
    assert calls.read_text().count("run") == 2
    assert (ef / "decoding_synth_te_out_dnn1.info").exists()
    assert "%WER 17.20" in open(tmp_path / "e" / "res.res").read()
