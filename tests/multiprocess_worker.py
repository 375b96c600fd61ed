"""Subprocess worker for ``test_multiprocess.py``: drives ONE bucketed
training epoch + one sharded validation epoch through the real Trainer
under a genuine N-process ``jax.distributed`` runtime (CPU, Gloo) —
the multi-controller analogue of the reference's ``torchrun`` DDP
launch (``/root/reference/main.py:72-94``).

Each process runs this file with ``<port> <process_id> <num_processes>``
and prints one JSON line of its view of the metrics; the parent test
asserts both processes agree (the cross-host ``reduce_dict`` sums and
the lock-step bucketed schedule are what's under test)."""

import json
import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # env must be set before jax touches its backends
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    for extra in ("--xla_force_host_platform_device_count=2",
                  "--xla_cpu_collective_call_terminate_timeout_seconds=1800"):
        if extra.split("=")[0] not in flags:
            flags = (flags + " " + extra).strip()
    os.environ["XLA_FLAGS"] = flags
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc      # 2 local CPU devs each

    from isubgvqa_tpu.config import Config
    from isubgvqa_tpu.data.build import build_datasets
    from isubgvqa_tpu.models.build import build_model
    from isubgvqa_tpu.train.loop import Trainer
    from isubgvqa_tpu.utils.compile_cache import enable_compilation_cache

    # CPU compiles of the train/eval steps dominate this test's
    # runtime; the persistent cache makes reruns near-instant
    enable_compilation_cache()

    # global batch must divide over all 2*nproc CPU devices; 2 per
    # device keeps the 2-proc shapes identical to prior rounds (warm
    # compile cache) while 4 procs get batch 8
    batch = max(4, 2 * nproc)
    cfg = Config(
        synthetic=True, synthetic_size=64, batch_size=batch,
        eval_batch_factor=1, question_len=12, max_nodes_per_graph=32,
        max_edges_per_graph=128, bucket_node_caps=(16, 32),
        bucket_question_lens=(12,), text_vocab_size=512,
        num_answers=32, compute_dtype="float32",
        sampler_type="gumbel", sample_k=3, epochs=1,
        meta_dir="/nonexistent",          # synthetic vocab + answers
        use_pallas=False,                 # XLA path; CPU-kernel speed
        output_dir="",
    )
    data = build_datasets(cfg)
    import dataclasses

    cfg = dataclasses.replace(cfg, num_answers=len(data.answers))
    model = build_model(cfg, data.vocab)
    trainer = Trainer(cfg, model, data)

    train_loss = trainer.train_epoch(0)
    acc, vloss = trainer.validate_epoch(0)
    print("RESULT " + json.dumps({
        "pid": pid,
        "processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "train_loss": round(float(train_loss), 6),
        "val_acc": round(float(acc), 6),
        "val_loss": round(float(vloss), 6),
    }), flush=True)


if __name__ == "__main__":
    main()
