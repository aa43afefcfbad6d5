"""The shipped decode/scoring scripts (tpukaldi/decode/scripts/): same call
contract as the reference's kaldi_decoding_scripts/decode_dnn.sh, exercised
against stub Kaldi binaries — one latgen job per posterior ark, lattice
archives written, LM-weight sweep producing wer_<lmwt> files the harvest
reads, and the bridge fallback when the configured folder doesn't exist."""

import gzip
import os
import stat
import subprocess

import pytest

import tpukaldi.decode.bridge as bridge
from tpukaldi.config.cfg import DecodingSpec, LabelSpec
from tpukaldi.decode import harvest_wer, run_decode

SCRIPTS = os.path.join(
    os.path.dirname(os.path.abspath(bridge.__file__)), "scripts"
)

# ---- stub Kaldi binaries --------------------------------------------------

LATGEN_STUB = """#!/bin/bash
# fake latgen-faster-mapped: record the invocation, honor the piped
# "ark:|gzip -c > ..." wspecifier so lat.N.gz really appears
echo "$@" >> "$STUB_LOG"
for last; do :; done
cmd="${last#ark:|}"
echo "utt1 fake-lattice" | eval "$cmd"
"""

BEST_PATH_STUB = """#!/bin/bash
# fake lattice-best-path: write an integer transcript to the ark,t: target
echo "$@" >> "$STUB_LOG"
for a; do case "$a" in ark,t:*) out="${a#ark,t:}";; esac; done
printf 'utt1 3 4\\n' > "$out"
"""

COMPUTE_WER_STUB = """#!/bin/bash
# fake compute-wer: checks the hyp words resolved through words.txt, then
# emits kaldi-shaped %WER/%SER lines (WER varies with an env knob so the
# sweep has a unique minimum)
echo "$@" >> "$STUB_LOG"
hyp="${@: -1}"
hyp="${hyp#ark:}"
grep -q "utt1 alpha beta" "$hyp" || { echo "bad hyp: $(cat "$hyp")" >&2; exit 1; }
echo "%WER ${FAKE_WER:-18.40} [ 95 / 518, 9 ins, 19 del, 67 sub ]"
echo "%SER 10.00 [ 1 / 10 ]"
"""


@pytest.fixture
def kaldi_env(tmp_path, monkeypatch):
    """PATH with stub kaldi binaries + graph/ali/data trees + 2 arks."""
    bins = tmp_path / "bin"
    bins.mkdir()
    for name, text in (
        ("latgen-faster-mapped", LATGEN_STUB),
        ("lattice-best-path", BEST_PATH_STUB),
        ("compute-wer", COMPUTE_WER_STUB),
    ):
        p = bins / name
        p.write_text(text)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bins}:{os.environ['PATH']}")
    monkeypatch.setenv("STUB_LOG", str(tmp_path / "stub_calls.log"))

    graph = tmp_path / "model" / "graph"
    graph.mkdir(parents=True)
    (graph / "HCLG.fst").write_bytes(b"fst")
    (graph / "words.txt").write_text("<eps> 0\nalpha 3\nbeta 4\n")
    (tmp_path / "model" / "final.mdl").write_bytes(b"mdl")
    data = tmp_path / "data"
    data.mkdir()
    (data / "feats.scp").write_text("utt1 x.ark:0\n")
    (data / "text").write_text("utt1 alpha beta\n")

    arks = []
    for i in range(2):
        ark = tmp_path / f"post{i}.ark"
        ark.write_bytes(b"posteriors")
        arks.append(str(ark))
    return {"tmp": tmp_path, "graph": graph, "data": data,
            "alidir": tmp_path / "model", "arks": arks}


def _conf(env, path, extra=""):
    path.write_text(
        "[decoding]\n"
        "min_active = 200\nmax_active = 7000\nmax_mem = 50000000\n"
        "beam = 13.0\nlatbeam = 8.0\nacwt = 0.2\n"
        'scoring_opts = "--min-lmwt 2 --max-lmwt 4"\n'
        f"alidir = {env['alidir']}\n"
        f"data = {env['data']}\n"
        f"graphdir = {env['graph']}\n"
        f"out_folder = {env['tmp'] / 'dec'}\n" + extra
    )
    return str(path)


def test_shipped_decode_script_end_to_end(kaldi_env):
    env = kaldi_env
    conf = _conf(env, env["tmp"] / "d.conf")
    out = env["tmp"] / "dec"
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf, str(out),
         " ".join(env["arks"])],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    # one lattice archive per posterior ark, really gzipped
    assert (out / "num_jobs").read_text().strip() == "2"
    for j in (1, 2):
        with gzip.open(out / f"lat.{j}.gz") as f:
            assert b"fake-lattice" in f.read()
    # latgen knobs forwarded from the conf
    calls = (env["tmp"] / "stub_calls.log").read_text()
    assert "--beam=13.0" in calls and "--acoustic-scale=0.2" in calls
    assert "--lattice-beam=8.0" in calls
    # scoring swept lmwt 2..4 (scoring_opts) through the int->word mapping
    for lmwt in (2, 3, 4):
        assert "%WER 18.40" in (out / f"wer_{lmwt}").read_text()
    assert not (out / "wer_1").exists() and not (out / "wer_5").exists()
    # the model was staged for scorers that expect it one level up
    assert (out.parent / "final.mdl").exists()
    best = harvest_wer(str(out))
    assert best["wer"] == 18.4


def test_skip_scoring(kaldi_env):
    env = kaldi_env
    conf = _conf(env, env["tmp"] / "d.conf", "skip_scoring = true\n")
    out = env["tmp"] / "dec2"
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf, str(out),
         env["arks"][0]],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert (out / "lat.1.gz").exists()
    assert not list(out.glob("wer_*"))


def test_missing_graph_fails_loudly(kaldi_env):
    env = kaldi_env
    os.remove(env["graph"] / "HCLG.fst")
    conf = _conf(env, env["tmp"] / "d.conf")
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf,
         str(env["tmp"] / "dec3"), env["arks"][0]],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "HCLG.fst" in r.stderr


def test_bridge_falls_back_to_shipped_scripts(kaldi_env, tmp_path):
    """A recipe pointing at a non-existent kaldi_decoding_scripts/ folder
    (the reference cfg default) still decodes via the shipped scripts."""
    import types

    env = kaldi_env
    exp = types.SimpleNamespace(
        out_folder=str(tmp_path / "exp"),
        decoding=DecodingSpec(
            script_folder=str(tmp_path / "does_not_exist"),
            script="decode_dnn.sh",
            options={"beam": "13.0", "acwt": "0.2", "latbeam": "8.0",
                     "min_active": "200", "max_active": "7000",
                     "max_mem": "50000000",
                     "scoring_opts": '"--min-lmwt 3 --max-lmwt 3"'},
        ),
    )
    os.makedirs(exp.out_folder)
    lab = LabelSpec("lab_cd", str(env["alidir"]), "",
                    data_folder=str(env["data"]), graph=str(env["graph"]))
    log = str(tmp_path / "log.log")
    dec_dir = run_decode(exp, lab, "out_dnn1", "te", env["arks"], log)
    assert dec_dir is not None
    assert "shipped" in open(log).read()
    best = harvest_wer(dec_dir)
    assert best is not None and best["wer"] == 18.4


def test_latgen_argv_matches_reference(kaldi_env):
    """The exact latgen-faster-mapped invocation must match the reference's
    kaldi_decoding_scripts/decode_dnn.sh:84 argument sequence (flags, model,
    fst, rspec, gzip wspecifier) so real Kaldi accepts it verbatim."""
    env = kaldi_env
    conf = _conf(env, env["tmp"] / "argv.conf")
    out = env["tmp"] / "dec_argv"
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf, str(out),
         env["arks"][0]],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    latgen_calls = [
        line for line in
        (env["tmp"] / "stub_calls.log").read_text().splitlines()
        if "--allow-partial" in line
    ]
    assert len(latgen_calls) == 1
    argv = latgen_calls[0].split()
    assert argv[:8] == [
        "--min-active=200", "--max-active=7000", "--max-mem=50000000",
        "--beam=13.0", "--lattice-beam=8.0", "--acoustic-scale=0.2",
        "--allow-partial=true",
        f"--word-symbol-table={env['graph']}/words.txt",
    ]
    assert argv[8] == f"{env['alidir']}/final.mdl"
    assert argv[9] == f"{env['graph']}/HCLG.fst"
    # positional 10: the posterior rspec; positional 11+: gzip wspecifier
    assert " ".join(argv[10:]).startswith("ark,s,cs:")
    assert f"gzip -c > {out}/lat.1.gz" in latgen_calls[0]


def test_conf_key_whitelist(kaldi_env):
    """A hostile/stray conf key (e.g. `dir`, `arks`, `PATH`) must not
    clobber script state (advisor r2: the reference's source-based conf
    loader had this flaw)."""
    env = kaldi_env
    conf = _conf(
        env, env["tmp"] / "evil.conf",
        f"dir = /nonexistent\narks = bogus\nPATH = /nowhere\n"
        "threads = 4\n",
    )
    out = env["tmp"] / "dec_evil"
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf, str(out),
         env["arks"][0]],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert (out / "lat.1.gz").exists()  # wrote into $2, not conf's `dir`


def test_score_wer_drops_stale_wer_files(kaldi_env):
    """Re-scoring into the same decode dir (run_exp re-decodes on restart)
    must not leave stale wer_<lmwt> files from a previous sweep visible to
    the harvest (advisor r2)."""
    env = kaldi_env
    conf = _conf(env, env["tmp"] / "stale.conf")
    out = env["tmp"] / "dec_stale"
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf, str(out),
         env["arks"][0]],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    # plant a stale out-of-sweep wer file, then re-run scoring
    (out / "wer_9").write_text("%WER 1.00 [ 1 / 100, 0 ins, 0 del, 1 sub ]\n")
    r = subprocess.run(
        [os.path.join(SCRIPTS, "score_wer.sh"), "--min-lmwt", "2",
         "--max-lmwt", "4", str(env["data"]), str(env["graph"]), str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert not (out / "wer_9").exists()
    best = harvest_wer(str(out))
    assert best["wer"] == 18.4  # not the stale 1.00


def test_score_per_phone_folding(kaldi_env, tmp_path):
    """The shipped score_per.sh folds 48->39 phones (reference
    local/score.sh:33-40 protocol via timit_norm_trans) before the
    compute-wer sweep, so TIMIT PER is scoreable without sctk (VERDICT r2
    #6).  Stub best-path emits phone ids; the map folds ix->ih, deletes q,
    and sil is dropped as compute-wer's optional-token stand-in."""
    import stat as _stat

    env = kaldi_env
    # phone-world graph: words.txt maps ids to 48-set phones
    (env["graph"] / "words.txt").write_text(
        "<eps> 0\nsil 1\nih 2\nix 3\nq 4\naa 5\n")
    (env["data"] / "text").write_text("utt1 sil ix q aa sil\n")
    pmap = tmp_path / "phones.60-48-39.map"
    pmap.write_text(
        "sil sil sil\nih ih ih\nix ix ih\nq q\naa aa aa\n")
    # best-path stub emitting phone-id transcripts: "sil ih q aa" -> after
    # folding hyp = [ih aa], ref = [ih aa] -> PER 0; higher lmwt flips one
    bp = env["tmp"] / "bin" / "lattice-best-path"
    bp.write_text(
        "#!/bin/bash\n"
        'for a; do case "$a" in ark,t:*) out="${a#ark,t:}";; esac; done\n'
        'case "$out" in *"/2.tra") printf "utt1 1 2 4 5\\n" > "$out";;\n'
        '*) printf "utt1 1 3 4 2\\n" > "$out";; esac\n'
    )
    bp.chmod(bp.stat().st_mode | _stat.S_IEXEC)
    cw = env["tmp"] / "bin" / "compute-wer"
    cw.write_text(
        "#!/bin/bash\n"
        'ref="${@: -2:1}"; hyp="${@: -1}"\n'
        'ref_t=$(grep utt1 "${ref#ark:}" | cut -d" " -f2-)\n'
        'hyp_t=$(grep utt1 "${hyp#ark:}" | cut -d" " -f2-)\n'
        'if [ "$ref_t" = "$hyp_t" ]; then\n'
        '  echo "%WER 0.00 [ 0 / 2, 0 ins, 0 del, 0 sub ]"\n'
        "else\n"
        '  echo "%WER 50.00 [ 1 / 2, 0 ins, 0 del, 1 sub ]"\n'
        "fi\n"
    )
    cw.chmod(cw.stat().st_mode | _stat.S_IEXEC)
    out = env["tmp"] / "dec_per"
    conf = _conf(env, env["tmp"] / "per.conf")
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf, str(out),
         env["arks"][0]],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [os.path.join(SCRIPTS, "score_per.sh"), "--min-lmwt", "2",
         "--max-lmwt", "3", "--phone-map", str(pmap),
         str(env["data"]), str(env["graph"]), str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    # folded reference: "ih aa" (ix->ih, q deleted, sil dropped)
    ref = (out / "scoring" / "ref_39phn").read_text().strip()
    assert ref == "utt1 ih aa"
    # lmwt=2 hyp "sil ih q aa" folds to "ih aa" -> PER 0; lmwt=3 "ix q ih"
    # folds to "ih ih" -> one substitution
    assert "%WER 0.00" in (out / "wer_2").read_text()
    assert "%WER 50.00" in (out / "wer_3").read_text()
    best = harvest_wer(str(out))
    assert best["wer"] == 0.0


def test_fallback_prefers_per_scorer_with_phone_map(kaldi_env, tmp_path):
    """When the configured scoring_script is absent and the data tree
    carries a TIMIT phone map, decode_dnn.sh falls back to score_per.sh
    (folded PER) instead of the generic word scorer."""
    import stat as _stat

    env = kaldi_env
    (env["graph"] / "words.txt").write_text("<eps> 0\nsil 1\naa 2\n")
    (env["data"] / "text").write_text("utt1 aa aa\n")
    (env["data"] / "phones.60-48-39.map").write_text("sil sil sil\naa aa aa\n")
    bp = env["tmp"] / "bin" / "lattice-best-path"
    bp.write_text(
        "#!/bin/bash\n"
        'for a; do case "$a" in ark,t:*) out="${a#ark,t:}";; esac; done\n'
        'printf "utt1 1 2 2\\n" > "$out"\n'
    )
    bp.chmod(bp.stat().st_mode | _stat.S_IEXEC)
    cw = env["tmp"] / "bin" / "compute-wer"
    cw.write_text(
        "#!/bin/bash\n"
        'hyp="${@: -1}"\n'
        # the folded hyp must have dropped sil: "aa aa"
        'grep -q "utt1 aa aa" "${hyp#ark:}" || { echo bad >&2; exit 1; }\n'
        'echo "%WER 0.00 [ 0 / 2, 0 ins, 0 del, 0 sub ]"\n'
    )
    cw.chmod(cw.stat().st_mode | _stat.S_IEXEC)
    out = env["tmp"] / "dec_permap"
    conf = _conf(env, env["tmp"] / "permap.conf",
                 "scoring_script = /nonexistent/score.sh\n")
    r = subprocess.run(
        [os.path.join(SCRIPTS, "decode_dnn.sh"), conf, str(out),
         env["arks"][0]],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "score_per.sh" in r.stderr  # fallback warning names the scorer
    assert (out / "scoring" / "ref_39phn").exists()
    assert "%WER 0.00" in (out / "wer_2").read_text()
