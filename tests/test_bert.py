"""BERT encoder parity vs transformers (sentence-transformer backbone)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def bert_ckpt(tmp_path_factory):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("bert"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_bert_parity(bert_ckpt):
    from unsloth_tpu.models.bert import bert_forward, load_bert

    path, hf_model = bert_ckpt
    params, cfg = load_bert(path)
    ids = np.arange(2, 18).reshape(1, 16) % 100
    mask = np.ones((1, 16), np.int64)
    mask[0, 12:] = 0
    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask)
                          ).last_hidden_state.numpy()
    ours = np.asarray(bert_forward(params, jnp.asarray(ids, jnp.int32),
                                   jnp.asarray(mask, jnp.int32), cfg))
    np.testing.assert_allclose(ours, hf_out, atol=2e-4, rtol=2e-3)


def test_bert_mean_pool_embeddings(bert_ckpt):
    from unsloth_tpu.models.bert import BertEncoderModel, load_bert
    from unsloth_tpu.models.sentence_transformer import mean_pool

    path, _ = bert_ckpt
    params, cfg = load_bert(path)
    m = BertEncoderModel(params, cfg)
    ids = jnp.asarray(np.arange(2, 10).reshape(1, 8) % 100, jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    h = m.encode_hidden(ids, mask)
    emb = mean_pool(h, mask)
    assert emb.shape == (1, 32)
    assert bool(jnp.all(jnp.isfinite(emb)))
