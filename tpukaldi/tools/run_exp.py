"""Experiment driver CLI — the `run_exp.py` equivalent (reference
run_exp.py:1-621).

  python -m tpukaldi.tools.run_exp cfg/exp.cfg [--section,field=value ...]

Drives: config load -> plan -> (train chunk -> interleaved validation ->
new-bob lr annealing) x epochs -> res.res -> final checkpoints -> forward
posteriors -> Kaldi decode bridge.  Crash recovery via the `.info` ledger:
completed tasks are skipped on restart (reference run_exp.py:253).

TPU specifics vs the reference: one resident ChunkRuntime (no per-chunk
process respawn), background chunk prefetch overlapping host IO with device
steps, optional data-parallel mesh over all local devices.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np

from ..config import ConfigError, load_config
from ..config.cfg import ExperimentConfig
from ..plan import ChunkTask, build_plan, repair_resume_point
from ..plan.chunk_cfg import write_chunk_cfg
from ..train.chunk_runtime import ChunkResult, ChunkRuntime, read_info
from ..decode.bridge import harvest_wer, run_decode


def _log(out_folder: str, msg: str) -> None:
    print(msg)
    with open(os.path.join(out_folder, "log.log"), "a") as f:
        f.write(msg + "\n")


def _aggregate(results: List[ChunkResult]):
    if not results:
        return 0.0, 0.0, 0.0
    return (
        float(np.mean([r.loss for r in results])),
        float(np.mean([r.err for r in results])),
        float(np.sum([r.elapsed for r in results])),
    )


def _result_from_info(task: ChunkTask) -> ChunkResult:
    info = read_info(task.info_file)
    return ChunkResult(
        loss=info.get("loss", 0.0),
        err=info.get("err", 0.0),
        elapsed=info.get("elapsed_time_chunk", 0.0),
        n_batches=1,
    )


def dump_epoch_results(
    res_file: str,
    epoch: int,
    n_epochs: int,
    train_with: List[str],
    tr_loss: float,
    tr_err: float,
    valid_perf: Dict[str, ChunkResult],
    lr: Dict[str, List[float]],
    elapsed: float,
) -> None:
    """Append the reference-format epoch line (utils.py:2423-2476)."""
    width = max(len(str(n_epochs - 1)), 1)
    parts = [
        f"ep={epoch:0{width}d} tr={train_with} loss={tr_loss:0.3f} err={tr_err:0.3f}"
    ]
    for name, perf in valid_perf.items():
        parts.append(f"valid={name} loss={perf.loss:0.3f} err={perf.err:0.3f}")
    for arch, sched in lr.items():
        parts.append(f"lr_{arch}={sched[epoch]}")
    parts.append(f"time(s)={int(elapsed)}")
    line = " ".join(parts)
    with open(res_file, "a") as f:
        f.write(line + "\n")
    print(line)


def run_experiment(
    cfg_file: str,
    overrides: Optional[List[str]] = None,
    use_mesh: bool = False,
) -> ExperimentConfig:
    # profiling (SURVEY.md §5.1 rebuild note): set TPUKALDI_PROFILE_DIR to
    # capture a jax profiler trace of the whole run (view with tensorboard
    # or xprof); per-chunk frames/sec always lands in the .info ledger
    profile_dir = os.environ.get("TPUKALDI_PROFILE_DIR")
    # TPUKALDI_MATMUL_PRECISION=bfloat16|tensorfloat32|float32 sets the XLA
    # default matmul precision for the whole run (bf16 is the MXU-native
    # fast path; the reference recipe trains fine in f32 — opt-in knob)
    precision = os.environ.get("TPUKALDI_MATMUL_PRECISION")
    import jax

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        if precision:
            with jax.default_matmul_precision(precision):
                return _run_experiment(cfg_file, overrides, use_mesh)
        return _run_experiment(cfg_file, overrides, use_mesh)
    finally:
        if profile_dir:
            jax.profiler.stop_trace()


def _run_experiment(
    cfg_file: str,
    overrides: Optional[List[str]] = None,
    use_mesh: bool = False,
) -> ExperimentConfig:
    exp = load_config(cfg_file, overrides=overrides)
    # reference multi_gpu flag (DataParallel) maps to the data-parallel mesh
    use_mesh = use_mesh or exp.multi_gpu
    out_folder = exp.out_folder
    os.makedirs(os.path.join(out_folder, "exp_files"), exist_ok=True)
    # snapshot the resolved config (reference run_exp.py:122-124)
    with open(os.path.join(out_folder, "conf.cfg"), "w") as f:
        exp.raw.write(f)

    # model diagram (reference renders model.svg at startup, utils.py:1703)
    try:
        from .diagram import create_block_diagram

        create_block_diagram(exp, os.path.join(out_folder, "model.svg"))
    except Exception as e:  # diagram failure must never block training
        _log(out_folder, f"[diagram] skipped: {e}")

    # optional nr_of_valid_per_epoch in [exp] (reference utils.py:771-782)
    n_valid = int(exp.raw["exp"].get("nr_of_valid_per_epoch", "1"))
    # checkpoint cadence: save rolling ckpts every N train chunks (default
    # 1 = the reference's per-chunk behavior).  Higher N cuts the per-chunk
    # device->host checkpoint traffic — which dominates epoch time on a
    # slow device link — at the cost of replaying up to N-1 chunks on crash
    # resume (exact replay, see plan.repair_resume_point).  Env overrides
    # the optional [exp] ckpt_every_n_chunks field.
    ckpt_every = int(
        os.environ.get(
            "TPUKALDI_CKPT_EVERY",
            exp.raw["exp"].get("ckpt_every_n_chunks", "1"),
        )
    )
    plan = build_plan(exp, n_valid_per_epoch=n_valid, ckpt_every=ckpt_every)
    for removed in repair_resume_point(plan):
        _log(
            out_folder,
            f"[resume] {removed} invalidated (no restorable checkpoint); "
            f"the chunk will be replayed deterministically",
        )
    mesh = None
    if use_mesh:
        from ..dist.mesh import data_parallel_mesh

        mesh = data_parallel_mesh()
    runtime = ChunkRuntime(exp, mesh=mesh)

    res_file = os.path.join(out_folder, "res.res")
    if not os.path.exists(res_file):
        open(res_file, "w").close()

    # lr schedules are mutable state for new-bob annealing; annealing is on
    # iff the user gave a single-value schedule (reference run_exp.py:151-161)
    lr: Dict[str, List[float]] = {a: list(s.lr) for a, s in exp.archs.items()}
    auto_anneal = {
        a: "|" not in exp.raw[s.section]["arch_lr"]
        for a, s in exp.archs.items()
    }
    prev_valid_err: Optional[float] = None

    # ---------------- chunk prefetch feeder ----------------
    # Background-load chunk N+1 while the device trains on chunk N
    # (reference core.py:509-512; here across the whole schedule incl. the
    # forward stage).  msl/batch params are static per (phase, epoch), so
    # the full loader schedule is known upfront.
    def _task_msl(task):
        return exp.batches.msl_for_phase(task.phase, task.epoch)

    # multi-host: partition the embarrassingly parallel forward stage
    # BEFORE the prefetch schedule is built, so the feeder only ever loads
    # this host's chunks (TPUKALDI_HOST_ID / TPUKALDI_NUM_HOSTS)
    n_hosts = int(os.environ.get("TPUKALDI_NUM_HOSTS", "1"))
    if n_hosts > 1:
        host_id = int(os.environ.get("TPUKALDI_HOST_ID", "0"))
        plan.forward_tasks = plan.shard_forward_tasks(host_id, n_hosts)

    schedule = [t for ep_plan in plan.epochs for t in ep_plan.tasks]
    schedule += plan.forward_tasks
    schedule_index = {id(t): i for i, t in enumerate(schedule)}
    from ..data.prefetch import ChunkPrefetcher

    feeder_state = {"prefetcher": ChunkPrefetcher(), "for_task": None}

    def _start_prefetch(after_index: int):
        for nxt in schedule[after_index + 1 :]:
            if not nxt.done:
                pf = feeder_state["prefetcher"]
                pf.start(lambda t=nxt: runtime.load_task_chunk(t, _task_msl(t)))
                feeder_state["for_task"] = nxt
                return
        feeder_state["for_task"] = None

    # un-overlapped host-side chunk wait per epoch (prefetch hits cost ~0;
    # misses and take()-blocking show up here) — VERDICT r2 #2 observability
    host_load = {"s": 0.0}

    def get_chunk(task):
        t0 = time.perf_counter()
        idx = schedule_index[id(task)]
        pf = feeder_state["prefetcher"]
        chunk = None
        if pf.in_flight:
            prefetched = pf.take()
            if feeder_state["for_task"] is task:
                chunk = prefetched
        if chunk is None:
            chunk = runtime.load_task_chunk(task, _task_msl(task))
        _start_prefetch(idx)
        host_load["s"] += time.perf_counter() - t0
        return chunk

    # ---------------- training ----------------
    for ep_plan in plan.epochs:
        ep = ep_plan.epoch
        t_ep = time.time()
        host_load["s"] = 0.0
        _producer_base = feeder_state["prefetcher"].producer_seconds

        def _producer_s(_base=_producer_base):
            return feeder_state["prefetcher"].producer_seconds - _base
        tr_results: List[ChunkResult] = []
        ep_valid_results: List[ChunkResult] = []
        valid_perf: Dict[str, ChunkResult] = {}
        batch_size = exp.batches.batch_size_train[ep]
        msl = exp.batches.seq_length_for_epoch(ep)
        _log(out_folder, f"------ Epoch {ep} / {exp.n_epochs - 1} ------")

        # group: train tasks execute in order; each valid point aggregates
        # the valid tasks that follow it in the plan
        pending_valid: List[ChunkResult] = []
        valid_names: List[str] = []

        def flush_valid_point():
            nonlocal prev_valid_err, pending_valid, valid_names
            if not pending_valid:
                return
            by_name: Dict[str, List[ChunkResult]] = {}
            for name, res in zip(valid_names, pending_valid):
                by_name.setdefault(name, []).append(res)
            for name, results in by_name.items():
                l, e, t = _aggregate(results)
                valid_perf[name] = ChunkResult(l, e, t, len(results))
            err_mean = float(np.mean([v.err for v in valid_perf.values()]))
            if prev_valid_err is not None:
                for arch in lr:
                    spec = exp.archs[arch]
                    improvement = (prev_valid_err - err_mean) / max(err_mean, 1e-12)
                    if (
                        ep < exp.n_epochs - 1
                        and auto_anneal[arch]
                        and improvement < spec.improvement_threshold
                    ):
                        new_lr = lr[arch][ep] * spec.halving_factor
                        for i in range(ep + 1, exp.n_epochs):
                            lr[arch][i] = new_lr
                        _log(
                            out_folder,
                            f"[new-bob] halving lr of {arch} -> {new_lr}",
                        )
            prev_valid_err = err_mean
            pending_valid, valid_names = [], []

        for task in ep_plan.tasks:
            if task.done:  # ledger resume (reference run_exp.py:253)
                res = _result_from_info(task)
            else:
                epoch_lr = {a: lr[a][ep] for a in lr}
                bs = batch_size if task.phase == "train" else exp.batches.batch_size_valid
                m = _task_msl(task)
                task.write_lst_files()
                write_chunk_cfg(exp, task, lr=epoch_lr, batch_size=bs,
                                max_seq_length=m)
                res = runtime.run_task(
                    task, epoch_lr=epoch_lr, max_seq_length=m, batch_size=bs,
                    chunk=get_chunk(task),
                )
                if not os.path.exists(task.info_file):
                    _log(out_folder, f"ERROR: task {task.info_file} produced no info")
                    sys.exit(1)
            if task.phase == "train":
                flush_valid_point()
                tr_results.append(res)
            else:
                pending_valid.append(res)
                valid_names.append(task.dataset)
                ep_valid_results.append(res)
        flush_valid_point()

        tr_loss, tr_err, tr_time = _aggregate(tr_results)
        epoch_wall = time.time() - t_ep
        dump_epoch_results(
            res_file, ep, exp.n_epochs, exp.train_with, tr_loss, tr_err,
            valid_perf, lr, epoch_wall,
        )
        # per-phase breakdown line (skipped by "ep="-prefixed parsers):
        # where the epoch's wall time actually went, split into the chunk
        # runtime's internal phases plus host load and driver residue
        def _sum_phase(results, key):
            return sum((r.phases or {}).get(key, 0.0) for r in results)

        valid_wall = sum(r.elapsed for r in ep_valid_results)
        accounted = tr_time + valid_wall + host_load["s"]
        with open(res_file, "a") as rf:
            rf.write(
                f"phases ep={ep}"
                f" host_load={host_load['s']:.2f}"
                f" train_wall={tr_time:.2f}"
                f" valid_wall={valid_wall:.2f}"
                # host_load_producer: seconds the prefetch thread actually
                # spent loading this epoch (overlapped with device work —
                # NOT additive with the other phases; host_load above is
                # the un-overlapped remainder the driver waited on)
                f" host_load_producer={_producer_s():.2f}"
                + "".join(
                    f" {k}={_sum_phase(tr_results + ep_valid_results, k):.2f}"
                    for k in ("h2d", "dispatch", "drain", "drain_compute",
                              "drain_fetch", "ckpt_block",
                              "restore_wait", "host_batch")
                )
                + f" driver_other={max(epoch_wall - accounted, 0.0):.2f}"
                f" epoch_wall={epoch_wall:.2f}\n"
            )

    # training curves (reference utils.py:2495-2614)
    if plan.epochs:
        try:
            from .metrics import create_curves, export_txt

            export_txt(res_file, out_folder)
            create_curves(res_file, out_folder)
        except Exception as e:
            _log(out_folder, f"[curves] skipped: {e}")

    # final checkpoints (reference run_exp.py:412-414); the async
    # checkpointer must finish before the files are promoted/copied
    runtime.checkpointer.wait()
    if plan.epochs:
        last_train = [
            t for t in plan.epochs[-1].tasks if t.phase == "train"
        ][-1]
        import shutil as _sh

        for arch, final in plan.final_ckpts.items():
            src = last_train.ckpt_files[arch]
            if os.path.exists(src) and not os.path.exists(final):
                _sh.copyfile(src, final)

    # ---------------- forward ----------------
    # multi-host: partition the embarrassingly parallel forward stage
    # (TPUKALDI_HOST_ID / TPUKALDI_NUM_HOSTS; the .info ledger makes the
    # union complete and resumable — SURVEY.md §2.4); the prefetch schedule
    # was already built from the sharded task list above, so the feeder
    # never loads another host's chunks

    # production mode consumes final checkpoints from a previous training
    # run (reference run_exp.py:168-174) — fail loudly if they are missing
    # instead of forwarding with random parameters
    if exp.production:
        missing = [p for p in plan.final_ckpts.values()
                   if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                "production mode needs trained final checkpoints; missing: "
                + ", ".join(missing)
            )

    # resolve normalize_with_counts_from (native analyze-counts when
    # counts name a label with lab_count_file=auto)
    from ..forward.counts import resolve_count_files

    resolve_count_files(exp, os.path.join(out_folder, "exp_files"))

    ark_files: Dict[str, List[str]] = {}
    for task in plan.forward_tasks:
        if task.done:
            res = _result_from_info(task)
        else:
            task.write_lst_files()
            write_chunk_cfg(exp, task)
            res = runtime.run_task(task, chunk=get_chunk(task))
        for i, out in enumerate(exp.forward.outs):
            suffix = (
                "_to_decode.ark" if exp.forward.require_decoding[i] else ".ark"
            )
            ark = task.info_file.replace(".info", f"_{out}{suffix}")
            if os.path.exists(ark):
                ark_files.setdefault(f"{task.dataset}|{out}", []).append(ark)

    # ---------------- decode ----------------
    log_file = os.path.join(out_folder, "log.log")
    for key, arks in ark_files.items():
        ds_name, out_name = key.split("|")
        i = exp.forward.outs.index(out_name)
        if not exp.forward.require_decoding[i]:
            continue
        ds = exp.datasets[ds_name]
        # production: lab_name=none still carries lab_data_folder/lab_graph
        # for the decode conf; alidir = graphdir's parent
        # (reference run_exp.py:571-583)
        lab = (
            next(iter(ds.labels.values())) if ds.labels else ds.prod_lab
        )
        if lab is None:
            continue
        # decode-stage ledger (decoding_<data>_<out>.info): skip the decode
        # script AND the ark cleanup on resume, so a restart after decoding
        # never re-runs latgen or re-deletes arks (the reference gates on
        # this file at run_exp.py:548,592 but never writes it — always
        # re-decoding; writing it here makes the resume contract real)
        dec_info = os.path.join(
            out_folder, "exp_files", f"decoding_{ds_name}_{out_name}.info"
        )
        if os.path.exists(dec_info):
            continue
        dec_dir = run_decode(exp, lab, out_name, ds_name, arks, log_file)
        if dec_dir:
            best = harvest_wer(dec_dir)
            if best is None:
                # decode ran but scoring produced nothing parseable: do NOT
                # write the ledger (and keep the arks), so a restart retries
                # the whole decode+score — the reference's always-re-decode
                # behavior (run_exp.py:548,592); writing it here would
                # permanently lock out WER harvesting
                _log(
                    out_folder,
                    f"[decode] no WER found under {dec_dir}; ledger not "
                    f"written — decoding will re-run on restart",
                )
                continue
            line = best["line"]
            with open(res_file, "a") as f:
                f.write(line + "\n")
            _log(out_folder, line)
            with open(dec_info, "w") as f:
                f.write("[decoding]\n")
                f.write(f"decode_folder={dec_dir}\n")
                f.write(f"wer={best['wer']}\n")
                f.write(f"wer_line={best['line']}\n")
            # save_out_file=False drops the posterior arks after decoding
            # (reference run_exp.py:611-615); only once scoring succeeded,
            # so a retried decode still has its inputs
            if not exp.forward.save_out_file[i]:
                for ark in arks:
                    if os.path.exists(ark):
                        os.remove(ark)
    return exp


def main(argv: Optional[List[str]] = None) -> int:
    from ._platform import honor_jax_platforms

    honor_jax_platforms()
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(
            "usage: python -m tpukaldi.tools.run_exp <cfg> [--mesh] "
            "[--check-data] [--sec,field=value ...]"
        )
        return 2
    cfg_file = argv[0]
    rest = argv[1:]
    use_mesh = "--mesh" in rest
    check_data = "--check-data" in rest
    overrides = [a for a in rest if a not in ("--mesh", "--check-data")]
    try:
        if check_data:
            # preflight-only: validate the real data tree the cfg points
            # at (scp targets, ali.gz+final.mdl, counts, graph dirs) and
            # exit without training (VERDICT r3 #8)
            from .check_data import run_check

            return run_check(cfg_file, overrides)
        run_experiment(cfg_file, overrides=overrides, use_mesh=use_mesh)
    except ConfigError as e:
        print(f"config error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
