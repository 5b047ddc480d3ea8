"""End-to-end mesh-native training: the FULL train() driver on the 8-device
virtual CPU mesh — sharded batches, distributed train/eval steps,
cross-device negatives, row-sharded embedding table, sharded checkpoints —
and numerical agreement with the single-device run (VERDICT r1 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotowermlretrieval_tpu.train.loop import build_mesh, train


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from twotowermlretrieval_tpu.data.synthetic import generate_corpus, synthetic_config

    out = tmp_path_factory.mktemp("mesh_synth")
    generate_corpus(out, num_queries=120, num_topics=10, words_per_topic=15, embed_dim=16)

    def make_config(**overrides):
        base = dict(hidden_dim=16, lr=5e-3, epochs=2, batch_size=16, dropout=0.0)
        base.update(overrides)
        return synthetic_config(out, **base)

    return out, make_config


def test_build_mesh_from_config(corpus):
    _, make_config = corpus
    assert build_mesh(make_config(mesh_data=1, mesh_model=1)) is None
    mesh = build_mesh(make_config(mesh_data=4, mesh_model=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh_all = build_mesh(make_config(mesh_data=-1, mesh_model=1))
    assert dict(mesh_all.shape) == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        build_mesh(make_config(mesh_data=16, mesh_model=1))
    with pytest.raises(ValueError):
        # batch not divisible by the data axis
        train(make_config(mesh_data=3, mesh_model=1, batch_size=16))


def test_full_pipeline_on_mesh(corpus, tmp_path):
    """train() with mesh 4x2, cross-device negatives and a row-sharded
    embedding table must produce working artifacts end to end (the serving
    engine answers queries against them) and metrics matching the
    single-device run within fp-reduction tolerance."""
    out, make_config = corpus
    kwargs = dict(
        loss_type="triplet+in_batch",
        cross_device_negatives=True,
        seed=0,
    )
    config_mesh = make_config(
        mesh_data=4, mesh_model=2, shard_embedding_table=True, **kwargs
    )
    config_single = make_config(mesh_data=1, mesh_model=1, **kwargs)

    res_mesh = train(config_mesh, output_root=tmp_path / "mesh", run_name="mesh-run")
    res_single = train(config_single, output_root=tmp_path / "single", run_name="single-run")

    for res in (res_mesh, res_single):
        assert np.isfinite(res["epochs"][-1]["avg_train_loss"])

    m, s = res_mesh["epochs"][-1], res_single["epochs"][-1]
    # same batches, same init, deterministic shuffle -> only fp reduction
    # order and the all-gather column order differ
    assert m["avg_train_loss"] == pytest.approx(s["avg_train_loss"], rel=1e-3)
    assert m["avg_val_loss"] == pytest.approx(s["avg_val_loss"], rel=1e-3)
    assert m["batch_MRR"] == pytest.approx(s["batch_MRR"], abs=0.02)
    assert m["batch_Recall@10"] == pytest.approx(s["batch_Recall@10"], abs=0.05)

    # artifacts from the mesh run serve correctly on a single device
    from twotowermlretrieval_tpu.serve.engine import SearchEngine

    engine = SearchEngine(res_mesh["artifacts_dir"], use_pallas=False)
    hit = engine.search("t0w1 t0w2 t0w3", alpha=0.7)
    assert hit["results"] and np.isfinite(hit["results"][0]["score"])


def test_mesh_checkpoint_resume(corpus, tmp_path):
    """Mid-run checkpoint of the SHARDED TrainState restores and resumes on
    the mesh (deterministic data-order resume included)."""
    out, make_config = corpus
    config = make_config(
        mesh_data=4, mesh_model=2, shard_embedding_table=True,
        loss_type="triplet+in_batch", cross_device_negatives=True,
        epochs=1, checkpoint_every_steps=2, steps_per_dispatch=1,
    )
    ckpt_dir = tmp_path / "ckpt"
    res1 = train(config, output_root=tmp_path / "a", checkpoint_dir=ckpt_dir, run_name="r1")

    # resume from the latest checkpoint and finish the remaining epochs
    config2 = config.replace(epochs=2)
    res2 = train(
        config2, output_root=tmp_path / "b", checkpoint_dir=ckpt_dir,
        resume=True, run_name="r2",
    )
    assert np.isfinite(res2["epochs"][-1]["avg_train_loss"])
    # the resumed run continued past the first run's final step
    assert res2["epochs"][-1]["avg_train_loss"] <= res1["epochs"][-1]["avg_train_loss"] * 1.5


def test_sharded_state_checkpoint_cross_mesh(corpus, tmp_path):
    """Orbax round-trip of a mesh-sharded TrainState, restored onto a
    DIFFERENTLY-shaped mesh (4x2 -> 8x1), must reproduce every leaf."""
    from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
    from twotowermlretrieval_tpu.parallel.distributed import replicate_state
    from twotowermlretrieval_tpu.parallel.mesh import make_mesh
    from twotowermlretrieval_tpu.train.checkpoint import CheckpointManager
    from twotowermlretrieval_tpu.train.loop import setup
    from twotowermlretrieval_tpu.train.train_step import create_train_state

    _, make_config = corpus
    config, tokenizer, table = setup(make_config(shard_embedding_table=True))
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(0), spec, pretrained_embeddings=table)

    mesh_a = make_mesh(data=4, model=2)
    state = create_train_state(jax.random.key(1), params, config)
    state = replicate_state(state, mesh_a, shard_embedding=True)
    ckpt = CheckpointManager(tmp_path / "x")
    ckpt.save(state, {"epoch": 0, "batch_index": 3})

    mesh_b = make_mesh(data=8, model=1)
    template = create_train_state(jax.random.key(2), params, config)
    template = replicate_state(template, mesh_b, shard_embedding=True)
    restored, position = ckpt.restore(template)
    assert position == {"epoch": 0, "batch_index": 3}
    sa = state._replace(rng=jax.random.key_data(state.rng))
    sb = restored._replace(rng=jax.random.key_data(restored.rng))
    for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_pipeline_transformer_tp(corpus, tmp_path):
    """End-to-end train() with a TP-sharded transformer tower (mesh 4x2):
    runs, learns, exports artifacts that serve single-device."""
    _, make_config = corpus
    config = make_config(
        tower_type="transformer", num_heads=2, ffn_dim=32, num_layers=1,
        mesh_data=4, mesh_model=2, shard_embedding_table=True,
        loss_type="triplet+in_batch", cross_device_negatives=True, epochs=1,
    )
    res = train(config, output_root=tmp_path / "tp", run_name="tp-run")
    assert np.isfinite(res["epochs"][-1]["avg_train_loss"])

    from twotowermlretrieval_tpu.serve.engine import SearchEngine

    engine = SearchEngine(res["artifacts_dir"], use_pallas=False)
    hit = engine.search("t0w1 t0w2 t0w3", alpha=1.0)
    assert hit["results"] and np.isfinite(hit["results"][0]["score"])


def test_mesh_with_length_buckets(corpus, tmp_path):
    """Length-bucketed batching (variable packed widths, one executable
    per bucket) composes with the mesh-native driver: bucket-width changes
    flush dispatch groups and every width shards over 'data' cleanly."""
    _, make_config = corpus
    config = make_config(
        mesh_data=4, mesh_model=1, epochs=1, steps_per_dispatch=2,
        length_buckets=[8, 16], loss_type="triplet+in_batch",
        cross_device_negatives=True,
    )
    res = train(config, output_root=tmp_path / "b", run_name="bucket-mesh")
    assert np.isfinite(res["epochs"][-1]["avg_train_loss"])
    assert res["epochs"][-1]["batch_Recall@10"] > 0.2


def test_mesh_corpus_eval_stays_on_device(corpus, tmp_path, monkeypatch):
    """Per-epoch corpus/test evaluation on a mesh must NOT gather the full
    param tree to host (VERDICT r2 item 4): _host_params runs exactly once
    per run — at artifact export — even over multiple epochs, and the
    corpus metrics still match the single-device evaluator's protocol."""
    import twotowermlretrieval_tpu.train.loop as loop_mod

    _, make_config = corpus
    calls = []
    orig = loop_mod._host_params

    def spy(params, on_mesh, mesh=None):
        calls.append(on_mesh)
        return orig(params, on_mesh, mesh)

    monkeypatch.setattr(loop_mod, "_host_params", spy)
    kwargs = dict(loss_type="triplet+in_batch", cross_device_negatives=True, seed=0)
    config = make_config(mesh_data=4, mesh_model=2, shard_embedding_table=True,
                         epochs=2, **kwargs)
    res = train(config, output_root=tmp_path / "m", run_name="ondevice-eval")
    assert calls == [True], f"_host_params ran {len(calls)}x (want once, at export)"
    # the mesh-encoded corpus metrics agree with the single-device run
    single = train(make_config(mesh_data=1, mesh_model=1, epochs=2, **kwargs),
                   output_root=tmp_path / "s", run_name="single-eval")
    m, s = res["epochs"][-1], single["epochs"][-1]
    assert m["corpus_Recall@10"] == pytest.approx(s["corpus_Recall@10"], abs=0.05)
    assert m["corpus_Hit@10"] == pytest.approx(s["corpus_Hit@10"], abs=0.05)
