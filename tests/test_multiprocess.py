"""Real multi-process validation (VERDICT r3 item 6): two OS processes
under genuine ``jax.distributed.initialize`` (CPU devices, Gloo
collectives) drive one bucketed training epoch + one sharded
validation epoch through the real Trainer.

This is the multi-controller launch the 8-device single-process mesh
tests cannot exercise: per-host batch assembly into global arrays
(``parallel/mesh.py:put_batch``), the lock-step bucketed schedule
(every host must issue identical batch-shape sequences), and the
cross-host ``reduce_dict`` metric sums.  Reference equivalent:
``torchrun --standalone --nproc_per_node`` DDP
(``/root/reference/main.py:72-94``, ``run_training_ddp.sh:23-31``)."""

import json
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_and_validate():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {i} failed (rc={p.returncode}):\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"worker {i} printed no RESULT line:\n{out[-4000:]}"
        results[i] = json.loads(lines[-1][len("RESULT "):])

    for i in (0, 1):
        assert results[i]["processes"] == 2
        assert results[i]["global_devices"] == 4

    # the cross-host reductions must give every process the same view
    assert results[0]["val_acc"] == results[1]["val_acc"]
    assert results[0]["val_loss"] == results[1]["val_loss"]
    # train loss meters are host-local averages of psum'd per-batch
    # sums — identical programs, identical values
    assert results[0]["train_loss"] == results[1]["train_loss"]
    # untrained CE over 32 synthetic answers starts near ln(32)
    import math

    assert abs(results[0]["val_loss"] - math.log(32)) < 1.5
