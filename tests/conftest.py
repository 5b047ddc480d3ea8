"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the standard JAX substitute is
a host-platform device-count override, which lets every sharding/collective
test run the real GSPMD paths on 8 virtual devices (SURVEY.md §4).

Note: this environment's sitecustomize registers an 'axon' TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so plain env vars are too
late — we must use jax.config.update (effective until the first backend
client is created). XLA_FLAGS is still honored lazily at CPU-client init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """A session-scoped synthetic corpus (parquet + embeddings + vocab)."""
    from twotowermlretrieval_tpu.data.synthetic import generate_corpus

    out = tmp_path_factory.mktemp("synth")
    generate_corpus(out, num_queries=120, num_topics=12, words_per_topic=20, embed_dim=32)
    return out


@pytest.fixture(scope="session")
def synth_config(synth_dir):
    from twotowermlretrieval_tpu.data.synthetic import synthetic_config

    return synthetic_config(synth_dir)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
