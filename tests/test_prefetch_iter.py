"""Unit tests for the host batch-assembly prefetch iterator
(`chunk_runtime._prefetch_iter`): ordering, producer-exception
propagation, and early-consumer-exit unblocking (the producer must not
stay wedged on its bounded queue when the consumer abandons iteration)."""

import threading
import time

import pytest

from tpukaldi.train.chunk_runtime import _prefetch_iter


def test_preserves_order_and_exhausts():
    assert list(_prefetch_iter(iter(range(50)), depth=2)) == list(range(50))


def test_empty_iterator():
    assert list(_prefetch_iter(iter(()), depth=2)) == []


def test_producer_exception_reraises_at_consumer():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("assembly failed")

    it = _prefetch_iter(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="assembly failed"):
        list(it)


def test_early_consumer_exit_unblocks_producer():
    produced = []
    done = threading.Event()

    def gen():
        try:
            for i in range(1000):
                produced.append(i)
                yield i
        finally:
            done.set()

    it = _prefetch_iter(gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons; stop flag must release the producer
    # the producer thread notices within its 0.2 s put timeout
    deadline = time.time() + 5
    while not done.is_set() and time.time() < deadline:
        time.sleep(0.05)
    assert done.is_set(), "producer thread stayed blocked after close()"
    assert len(produced) < 1000


def test_write_lst_files_atomic_under_concurrent_rewrites(tmp_path):
    """Regression: the driver re-materializes a task's .lst right before
    dispatch while the whole-schedule feeder may be mid-read of the same
    file — a truncating rewrite let readers observe an EMPTY list (flaky
    'empty feature list' under full-suite load).  write_lst_files must be
    atomic: every read observes the complete list."""
    import threading

    from tpukaldi.plan.planner import ChunkTask

    path = str(tmp_path / "ep0_ck0_mfcc.lst")
    lines = [f"utt{i:03d} /x/feats.ark:{i}" for i in range(50)]
    task = ChunkTask(
        phase="train", dataset="d", epoch=0, chunk=0, seed=1,
        fea_lists={"mfcc": lines}, lst_files={"mfcc": path},
        info_file=str(tmp_path / "i.info"),
    )
    task.write_lst_files()
    stop = threading.Event()
    bad = []

    def reader():
        # record exceptions too: a reader error (e.g. FileNotFoundError
        # from an unlink-then-recreate rewrite) is also an atomicity
        # violation, and must not let the test pass vacuously
        try:
            while not stop.is_set():
                got = [l.rstrip("\n") for l in open(path)]
                if got != lines:
                    bad.append(len(got))
                    return
        except Exception as e:
            bad.append(repr(e))

    t = threading.Thread(target=reader)
    t.start()
    for _ in range(300):
        task.write_lst_files()
    stop.set()
    t.join()
    assert not bad, f"reader observed incomplete lists (lens {bad[:5]})"
