"""Test harness: force an 8-virtual-device CPU mesh.

The TPU-native analog of the reference's CUDA spoof layer
(reference: tests/conftest.py + tests/_zoo_aggressive_cuda_spoof.py): the
reference fakes torch.cuda on GPU-less CI runners; we instead run JAX on
CPU with 8 virtual devices so multi-chip sharding logic executes for real
(SURVEY §4 "Lesson for the rebuild").

Must run before jax initializes its backends — conftest import time is
early enough as long as no other conftest/plugin imports jax first.
"""

import os

# Force CPU regardless of pre-set platform (e.g. JAX_PLATFORMS=axon for the
# tunneled TPU) — tests must be fast and hardware-independent. The axon
# sitecustomize registers its plugin at interpreter startup, so env vars are
# not enough; jax.config wins as long as no computation ran yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def tiny_config():
    from unsloth_tpu.models.config import ModelConfig

    return ModelConfig(
        model_type="llama",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
    )
