"""Real multi-process validation (VERDICT r3 item 6, r4 item 7): 2 and
4 OS processes under genuine ``jax.distributed.initialize`` (CPU
devices, Gloo collectives) drive one bucketed training epoch + one
sharded validation epoch through the real Trainer.

This is the multi-controller launch the 8-device single-process mesh
tests cannot exercise: per-host batch assembly into global arrays
(``parallel/mesh.py:put_batch``), the lock-step bucketed schedule
(every host must issue identical batch-shape sequences — including the
wrap-padded rounds that appear when a bucket holds fewer batches than
shards at ``num_shards`` 4), and the cross-host ``reduce_dict`` metric
sums.  Reference equivalent: ``torchrun --standalone --nproc_per_node``
DDP (``/root/reference/main.py:72-94``, ``run_training_ddp.sh:23-31``)."""

import json
import os
import socket
import subprocess
import sys
import tempfile

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, timeout: int = 1500):
    """Launch ``nproc`` workers with stdout+stderr on temp FILES (a
    PIPE would deadlock: a worker emitting more than the ~64KB pipe
    buffer while the parent is blocked on another worker stalls its
    Gloo collectives and hangs every process until the timeout)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    procs, files = [], []
    for i in range(nproc):
        f = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        files.append(f)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), str(nproc)],
            stdout=f, stderr=subprocess.STDOUT, cwd=REPO, env=env))
    outs = []
    try:
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for f in files:
        f.seek(0)
        outs.append(f.read())
        f.close()
    return procs, outs


def _collect_results(procs, outs) -> dict:
    results = {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {i} failed (rc={p.returncode}):\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"worker {i} printed no RESULT line:\n{out[-4000:]}"
        results[i] = json.loads(lines[-1][len("RESULT "):])
    return results


@pytest.mark.parametrize("nproc", [2, 4])
def test_multiprocess_train_and_validate(nproc):
    procs, outs = _run_workers(nproc)
    results = _collect_results(procs, outs)

    for i in range(nproc):
        assert results[i]["processes"] == nproc
        assert results[i]["global_devices"] == 2 * nproc

    # the cross-host reductions must give every process the same view
    for i in range(1, nproc):
        assert results[i]["val_acc"] == results[0]["val_acc"]
        assert results[i]["val_loss"] == results[0]["val_loss"]
        # train loss meters are host-local averages of psum'd per-batch
        # sums — identical programs, identical values
        assert results[i]["train_loss"] == results[0]["train_loss"]
    # untrained CE over 32 synthetic answers starts near ln(32)
    import math

    assert abs(results[0]["val_loss"] - math.log(32)) < 1.5
