"""Subprocess entry point for the 2-process ``jax.distributed`` integration
test (tests/test_multihost.py — VERDICT r2 item 1).

Each process pins the CPU platform with 4 virtual devices (XLA_FLAGS set by
the parent BEFORE interpreter start), bootstraps via
``initialize_multihost``, builds the 8-device global mesh, and runs the
FULL train() driver — sharded batch placement through
``make_array_from_callback``, cross-device negatives, row-sharded embedding
table, mesh corpus evaluation, process-0 artifact export. The final-epoch
metrics are printed as one ``MULTIHOST_RESULT {json}`` line for the parent
to compare across processes and against the single-process mesh run.

Named without the ``test_`` prefix so pytest does not collect it.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--mesh-data", type=int, default=4)
    parser.add_argument("--mesh-model", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--checkpoint-every-steps", type=int, default=500)
    parser.add_argument("--tower-type", default="rnn", choices=["rnn", "transformer"])
    args = parser.parse_args()

    import jax

    # this environment's sitecustomize pins an 'axon' TPU platform via
    # jax.config, which beats the JAX_PLATFORMS env var — override it
    # before the first backend client is created (same as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from twotowermlretrieval_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == args.num_processes * n_local, (n_global, n_local)

    from twotowermlretrieval_tpu.data.synthetic import synthetic_config
    from twotowermlretrieval_tpu.train.loop import train

    tower_kwargs = {}
    if args.tower_type == "transformer":
        # Megatron TP over the 'model' axis, composed with DP +
        # cross-device negatives — the BASELINE config 5 shape, here
        # exercised across two OS processes
        tower_kwargs = dict(tower_type="transformer", num_heads=2, ffn_dim=32,
                            num_layers=2)
    config = synthetic_config(
        Path(args.corpus),
        hidden_dim=16, lr=5e-3, epochs=args.epochs, batch_size=16, dropout=0.0,
        mesh_data=args.mesh_data, mesh_model=args.mesh_model,
        shard_embedding_table=True,
        loss_type="triplet+in_batch", cross_device_negatives=True, seed=0,
        checkpoint_every_steps=args.checkpoint_every_steps,
        **tower_kwargs,
    )
    res = train(
        config, output_root=args.out, run_name=f"mh-{args.process_id}",
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
    )
    last = dict(res["epochs"][-1])
    last["process_index"] = jax.process_index()
    last["num_devices"] = n_global
    last["exported_artifacts"] = "artifacts_dir" in res
    print("MULTIHOST_RESULT " + json.dumps(last), flush=True)


if __name__ == "__main__":
    main()
