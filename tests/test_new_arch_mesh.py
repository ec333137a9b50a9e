"""Round-2-continuation architectures under an fsdp x tp mesh: the
placer must shard (or safely replicate) every new param name (minimax
lightn_*, granitemoehybrid mamba_* + experts, zamba2 blocks/adapters)
and the loss must match the unsharded value."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from unsloth_tpu.models.loader import FastLanguageModel
from unsloth_tpu.parallel.mesh import create_mesh


def _minimax_ckpt(tmp_path_factory):
    from transformers import MiniMaxConfig, MiniMaxForCausalLM

    cfg = MiniMaxConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        layer_types=["linear_attention", "full_attention"], block_size=8,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("mm_mesh"))
    MiniMaxForCausalLM(cfg).save_pretrained(path, safe_serialization=True)
    return path


def _gmh_ckpt(tmp_path_factory):
    from transformers import (GraniteMoeHybridConfig,
                              GraniteMoeHybridForCausalLM)

    cfg = GraniteMoeHybridConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        shared_intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1,
        num_local_experts=4, num_experts_per_tok=2,
        layers_block_type=["mamba", "attention"], mamba_n_heads=4,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2, mamba_n_groups=1,
        mamba_chunk_size=8, max_position_embeddings=64,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("gmh_mesh"))
    GraniteMoeHybridForCausalLM(cfg).save_pretrained(
        path, safe_serialization=True)
    return path


@pytest.mark.slow
@pytest.mark.parametrize("maker", [_minimax_ckpt, _gmh_ckpt])
def test_new_arch_loss_matches_on_mesh(tmp_path_factory, maker):
    path = maker(tmp_path_factory)
    ids = np.random.RandomState(0).randint(1, 96, (4, 32)).astype(np.int32)
    batch = {"input_ids": jnp.asarray(ids),
             "labels": jnp.asarray(np.roll(ids, -1, 1))}

    m0, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                              dtype="float32")
    base = float(m0.loss_fn(None, batch, remat=False))

    mesh = create_mesh(dp=1, fsdp=4, tp=2)
    m, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                             dtype="float32", mesh=mesh)
    with mesh:
        sharded = float(m.loss_fn(None, batch, remat=False))
    np.testing.assert_allclose(sharded, base, rtol=2e-5, atol=2e-5)
