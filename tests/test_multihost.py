"""REAL multi-process (2-"host") integration test of the training path
(VERDICT r2 item 1 — the one BASELINE mandate that previously had zero
executed evidence).

Two subprocesses, each with 4 virtual CPU devices
(``--xla_force_host_platform_device_count=4``), bootstrap through
``jax.distributed.initialize`` (coordinator on localhost), build the SAME
8-device global ('data', 'model') mesh, and run the full ``train()``
driver: per-host batch placement via ``parallel.mesh.put_global``
(``make_array_from_callback`` — a bare ``device_put`` is invalid when the
sharding spans non-addressable devices), cross-device in-batch negatives,
a row-sharded embedding table, mesh corpus evaluation, and process-0
artifact export. The reference has nothing to match (single-device,
ref: backend/main.py:60-66); this validates the build-mandated comm
backend (SURVEY.md §2b).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
RUNNER = Path(__file__).resolve().parent / "multihost_runner.py"
EPOCHS = 2
MESH = (4, 2)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    from twotowermlretrieval_tpu.data.synthetic import generate_corpus

    out = tmp_path_factory.mktemp("mh_synth")
    generate_corpus(out, num_queries=120, num_topics=10, words_per_topic=15, embed_dim=16)
    return out


def _launch_pair(corpus_dir, out, extra_args=(), num_processes=2):
    """Launch all processes of an ``num_processes``-process run; return
    their parsed MULTIHOST_RESULT payloads."""
    port = _free_port()
    env = os.environ.copy()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTEST_CURRENT_TEST", None)
    # the runner is launched by path, so its sys.path[0] is tests/ — make
    # the package importable without requiring a pip install of the repo.
    # Only append the existing value when non-empty: a trailing separator
    # would add an empty entry, which Python resolves to the CWD.
    existing = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = str(ROOT) + (os.pathsep + existing if existing else "")
    # stdout goes to FILES, not pipes: the parent waits on the processes
    # sequentially while both run one SPMD program — if process 1 filled a
    # ~64 KB stdout pipe mid-collective while the parent still blocked on
    # process 0, both children would deadlock until the timeout.
    procs, logs = [], []
    out.mkdir(parents=True, exist_ok=True)
    for pid in range(num_processes):
        log = open(out / f"proc{pid}.log", "w+")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, str(RUNNER),
                    "--coordinator", f"localhost:{port}",
                    "--process-id", str(pid),
                    "--num-processes", str(num_processes),
                    "--corpus", str(corpus_dir),
                    "--out", str(out / f"proc{pid}"),
                    "--mesh-data", str(MESH[0]),
                    "--mesh-model", str(MESH[1]),
                    *extra_args,
                ],
                stdout=log, stderr=subprocess.STDOUT,
                env=env, cwd=ROOT, text=True,
            )
        )
    outputs = []
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait(timeout=60)
        for log in logs:
            log.flush()
            log.seek(0)
            outputs.append(log.read())
            log.close()
    results = []
    for i, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {i} failed:\n{stdout[-4000:]}"
        lines = [l for l in stdout.splitlines() if l.startswith("MULTIHOST_RESULT ")]
        assert lines, f"process {i} printed no result:\n{stdout[-4000:]}"
        results.append(json.loads(lines[-1].split(" ", 1)[1]))
    return results


@pytest.fixture(scope="module")
def two_process_results(corpus_dir, tmp_path_factory):
    """Launch the 2-process run once; several tests assert on it."""
    out = tmp_path_factory.mktemp("mh_out")
    return _launch_pair(corpus_dir, out, ("--epochs", str(EPOCHS))), out


def test_two_process_train_runs_and_agrees(two_process_results):
    """Both processes complete the full driver on the shared 8-device mesh
    and report IDENTICAL metrics (replicated outputs of the same SPMD
    program)."""
    (r0, r1), _ = two_process_results
    assert r0["num_devices"] == 8 and r1["num_devices"] == 8
    assert {r0["process_index"], r1["process_index"]} == {0, 1}
    for key in ("avg_train_loss", "avg_val_loss", "batch_MRR", "batch_Recall@10",
                "corpus_Recall@10"):
        assert np.isfinite(r0[key]), key
        assert r0[key] == pytest.approx(r1[key], rel=1e-6), key


def test_two_process_matches_single_process_mesh(two_process_results, corpus_dir, tmp_path):
    """The 2-process 4x2 run reproduces the single-process 8-virtual-device
    4x2 run: same batches, same init, same collectives — only the process
    boundary differs (fp reduction order may shift slightly)."""
    from twotowermlretrieval_tpu.data.synthetic import synthetic_config
    from twotowermlretrieval_tpu.train.loop import train

    (r0, _), _ = two_process_results
    config = synthetic_config(
        corpus_dir,
        hidden_dim=16, lr=5e-3, epochs=EPOCHS, batch_size=16, dropout=0.0,
        mesh_data=MESH[0], mesh_model=MESH[1], shard_embedding_table=True,
        loss_type="triplet+in_batch", cross_device_negatives=True, seed=0,
    )
    res = train(config, output_root=tmp_path / "sp", run_name="sp-mesh")
    s = res["epochs"][-1]
    assert r0["avg_train_loss"] == pytest.approx(s["avg_train_loss"], rel=1e-3)
    assert r0["avg_val_loss"] == pytest.approx(s["avg_val_loss"], rel=1e-3)
    assert r0["batch_MRR"] == pytest.approx(s["batch_MRR"], abs=0.02)


def test_process_zero_exports_artifacts(two_process_results):
    """Artifact export runs on process 0 only (host-side file writes are
    not collective); the directory serves single-device afterwards."""
    (r0, r1), out = two_process_results
    by_pid = {r["process_index"]: r for r in (r0, r1)}
    assert by_pid[0]["exported_artifacts"] is True
    assert by_pid[1]["exported_artifacts"] is False
    art = out / "proc0" / "mh-0"
    assert (art / "model.npz").exists() or any(art.glob("*")), list(art.parent.glob("*"))

    from twotowermlretrieval_tpu.serve.engine import SearchEngine

    engine = SearchEngine(art, use_pallas=False)
    hit = engine.search("t0w1 t0w2 t0w3", alpha=0.7)
    assert hit["results"] and np.isfinite(hit["results"][0]["score"])


def test_two_process_transformer_tp(corpus_dir, tmp_path_factory):
    """Megatron-TP transformer towers (BASELINE config 5) across two OS
    processes: column/row-sharded attention+FFN over 'model', composed
    with DP + cross-device negatives + the row-sharded embedding table.
    Both processes must report the identical replicated loss."""
    out = tmp_path_factory.mktemp("mh_tp")
    r0, r1 = _launch_pair(
        corpus_dir, out, ("--epochs", "1", "--tower-type", "transformer")
    )
    assert np.isfinite(r0["avg_train_loss"])
    assert r0["avg_train_loss"] == pytest.approx(r1["avg_train_loss"], rel=1e-6)
    assert r0["batch_MRR"] == pytest.approx(r1["batch_MRR"], rel=1e-6)


def test_two_process_checkpoint_resume(corpus_dir, tmp_path_factory):
    """Distributed (Orbax) checkpointing across the process boundary:
    run 1 saves mid-training checkpoints from BOTH processes (process 0
    writes metadata + the data position, collective array save, barriers
    around the host-side file mutations); run 2 — two FRESH processes —
    restores the sharded TrainState onto the same global mesh, resumes the
    deterministic data order, and finishes. Pod preemption-tolerance
    (SURVEY §5 failure/recovery), exercised for real."""
    out = tmp_path_factory.mktemp("mh_ckpt")
    ckpt = out / "ck"
    first = _launch_pair(
        corpus_dir, out / "a",
        ("--epochs", "1", "--checkpoint-dir", str(ckpt),
         "--checkpoint-every-steps", "4"),
    )
    assert all(np.isfinite(r["avg_train_loss"]) for r in first)
    assert any(ckpt.glob("step_*")), "no checkpoint written"

    second = _launch_pair(
        corpus_dir, out / "b",
        ("--epochs", "2", "--checkpoint-dir", str(ckpt), "--resume",
         "--checkpoint-every-steps", "4"),
    )
    r0, r1 = second
    assert r0["avg_train_loss"] == pytest.approx(r1["avg_train_loss"], rel=1e-6)
    # the resumed run continued training (loss kept moving down vs run 1)
    assert r0["avg_train_loss"] < first[0]["avg_train_loss"]


def test_elastic_restore_across_process_counts(corpus_dir, tmp_path_factory):
    """Preemption recovery with a CHANGED topology (VERDICT r3 #7): a
    checkpoint saved by a 2-process 8-device 4x2 run restores into
    (a) a single-process 8-virtual-device run — no process boundary — and
    (b) a single-process 4-device 2x2 run — half the devices. The global
    array shapes are topology-independent (params replicated or sharded
    over 'model'=2 in all three meshes), so Orbax reshards on restore;
    the loss trajectory must CONTINUE in both (the resumed final-epoch
    loss drops below run-1's)."""
    import shutil

    out = tmp_path_factory.mktemp("mh_elastic")
    ckpt = out / "ck"
    first = _launch_pair(
        corpus_dir, out / "a",
        ("--epochs", "1", "--checkpoint-dir", str(ckpt),
         "--checkpoint-every-steps", "4"),
    )
    first_loss = first[0]["avg_train_loss"]
    assert any(ckpt.glob("step_*")), "no checkpoint written"

    # (a) 2 processes -> 1 process, same 8-device 4x2 mesh (this pytest
    # interpreter already runs 8 virtual CPU devices)
    from twotowermlretrieval_tpu.data.synthetic import synthetic_config
    from twotowermlretrieval_tpu.train.loop import train

    ck_a = out / "ck_a"
    shutil.copytree(ckpt, ck_a)
    config = synthetic_config(
        corpus_dir,
        hidden_dim=16, lr=5e-3, epochs=2, batch_size=16, dropout=0.0,
        mesh_data=MESH[0], mesh_model=MESH[1], shard_embedding_table=True,
        loss_type="triplet+in_batch", cross_device_negatives=True, seed=0,
        checkpoint_every_steps=4,
    )
    res = train(config, output_root=out / "sp8", run_name="elastic-a",
                checkpoint_dir=ck_a, resume=True)
    assert res["epochs"][-1]["avg_train_loss"] < first_loss

    # (b) 8 devices -> 4 (2x2 mesh), single process, fresh interpreter
    ck_b = out / "ck_b"
    shutil.copytree(ckpt, ck_b)
    (r,) = _launch_pair(
        corpus_dir, out / "b",
        ("--epochs", "2", "--checkpoint-dir", str(ck_b), "--resume",
         "--checkpoint-every-steps", "4",
         "--mesh-data", "2", "--mesh-model", "2"),
        num_processes=1,
    )
    assert r["num_devices"] == 4
    assert r["avg_train_loss"] < first_loss
