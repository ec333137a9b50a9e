"""Pipeline parallelism (pp axis): GPipe microbatch schedule over
shard_map + ppermute must reproduce the single-device loss and grads
exactly (fp32). The reference has no pipeline parallelism at all
(reference models/loader_utils.py:73-106 is DDP-only), so the parity
oracle is our own list-layout `loss_fn`."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.decoder import loss_fn, stack_lora, stack_params
from unsloth_tpu.models.params import (init_lora_tree, init_params,
                                       quantize_params)
from unsloth_tpu.parallel.pipeline import (create_pp_mesh,
                                           pipeline_loss_fn,
                                           place_pipeline_tree)

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _cfg(num_layers=8):
    return ModelConfig(vocab_size=512, hidden_size=128,
                       intermediate_size=256, num_layers=num_layers,
                       num_heads=4, num_kv_heads=2,
                       max_position_embeddings=128)


def _setup(rng, num_layers=8, batch=8, quantized=False):
    cfg = _cfg(num_layers)
    params = init_params(cfg, rng, dtype=jnp.float32)
    if quantized:
        params = quantize_params(params, cfg, dtype=jnp.float32)
    lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    ids = jax.random.randint(rng, (batch, 64), 0, cfg.vocab_size)
    batch_d = {"input_ids": ids, "labels": ids}
    return cfg, params, lora, batch_d


@pytest.mark.slow
@requires_8
@pytest.mark.parametrize("pp,dp,M", [(4, 1, 4), (8, 1, 2), (4, 2, 2)])
def test_pipeline_loss_matches_single_device(pp, dp, M, rng):
    cfg, params, lora, batch = _setup(rng)
    ref = float(loss_fn(params, lora, batch, cfg, remat=False))

    mesh = create_pp_mesh(pp=pp, dp=dp)
    sp = place_pipeline_tree(stack_params(params), mesh)
    sl = place_pipeline_tree(stack_lora(lora), mesh)

    with mesh:
        loss = jax.jit(lambda p, l, b: pipeline_loss_fn(
            p, l, b, cfg, mesh, num_microbatches=M, remat=False))(
                sp, sl, batch)
    assert np.isclose(float(loss), ref, rtol=2e-5, atol=2e-5), \
        (float(loss), ref)


@pytest.mark.slow
@requires_8
def test_pipeline_grads_match_single_device(rng):
    cfg, params, lora, batch = _setup(rng)
    ref_grads = jax.grad(
        lambda l: loss_fn(params, l, batch, cfg, remat=False))(lora)

    mesh = create_pp_mesh(pp=4, dp=2)
    sp = place_pipeline_tree(stack_params(params), mesh)
    sl = place_pipeline_tree(stack_lora(lora), mesh)

    with mesh:
        grads = jax.jit(jax.grad(lambda l: pipeline_loss_fn(
            sp, l, batch, cfg, mesh, num_microbatches=2, remat=False)))(sl)

    from unsloth_tpu.models.decoder import stack_lora as _sl
    ref_stacked = _sl(ref_grads)
    flat_ref, _ = jax.tree_util.tree_flatten(ref_stacked)
    flat_got, _ = jax.tree_util.tree_flatten(
        jax.device_get(grads))
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.slow
@requires_8
def test_pipeline_train_step_nf4(rng):
    """One full pp=4 train step over an NF4-quantized base (the QLoRA
    configuration) decreases loss and stays finite."""
    import optax

    cfg, params, lora, batch = _setup(rng, quantized=True)
    mesh = create_pp_mesh(pp=4, dp=2)
    sp = place_pipeline_tree(stack_params(params), mesh)
    sl = place_pipeline_tree(stack_lora(lora), mesh)
    tx = optax.adamw(1e-2)
    opt_state = tx.init(sl)

    @jax.jit
    def step(l, s):
        loss, g = jax.value_and_grad(lambda l_: pipeline_loss_fn(
            sp, l_, batch, cfg, mesh, num_microbatches=2))(l)
        u, s = tx.update(g, s, l)
        return optax.apply_updates(l, u), s, loss

    with mesh:
        l1, opt_state, loss1 = step(sl, opt_state)
        _, _, loss2 = step(l1, opt_state)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)


@pytest.mark.slow
@requires_8
def test_pipeline_remat_matches_no_remat(rng):
    cfg, params, lora, batch = _setup(rng)
    mesh = create_pp_mesh(pp=4, dp=2)
    sp = place_pipeline_tree(stack_params(params), mesh)
    sl = place_pipeline_tree(stack_lora(lora), mesh)
    with mesh:
        g1 = jax.jit(jax.grad(lambda l: pipeline_loss_fn(
            sp, l, batch, cfg, mesh, num_microbatches=2,
            remat=False)))(sl)
        g2 = jax.jit(jax.grad(lambda l: pipeline_loss_fn(
            sp, l, batch, cfg, mesh, num_microbatches=2,
            remat=True)))(sl)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@requires_8
def test_sft_trainer_with_pipeline(rng):
    """SFTTrainer routes through the pp schedule when enable_pipeline was
    called, and the loss trajectory matches the plain single-mesh run."""
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.parallel.pipeline import enable_pipeline
    from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer

    def make_model():
        cfg = _cfg(num_layers=4)
        params = init_params(cfg, rng, dtype=jnp.float32)
        model = LanguageModel(cfg=cfg, params=params, max_seq_length=64)
        model.lora = init_lora_tree(cfg, rng, r=4, alpha=8)
        return model

    np_rng = np.random.RandomState(3)
    ds = [{"input_ids": np_rng.randint(3, 500,
                                       np_rng.randint(20, 40)).tolist()}
          for _ in range(16)]
    args = SFTConfig(per_device_train_batch_size=4, max_steps=6,
                     learning_rate=1e-2, max_seq_length=64,
                     packing=True, logging_steps=1, warmup_steps=0,
                     lr_scheduler_type="constant")

    ref = SFTTrainer(model=make_model(), train_dataset=ds, args=args)
    ref_out = ref.train()
    ref_losses = [e["loss"] for e in ref.state_log]

    model = enable_pipeline(make_model(), pp=4, dp=2, num_microbatches=2)
    tr = SFTTrainer(model=model, train_dataset=ds, args=args)
    out = tr.train()
    losses = [e["loss"] for e in tr.state_log]

    assert out.global_step == ref_out.global_step
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4, atol=1e-4)


@requires_8
def test_pipeline_rejects_bad_shapes(rng):
    cfg, params, lora, batch = _setup(rng, num_layers=6)
    mesh = create_pp_mesh(pp=4, dp=1)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_loss_fn(stack_params(params), None, batch, cfg, mesh,
                         num_microbatches=2)

    cfg2, params2, _, batch2 = _setup(rng, num_layers=8, batch=6)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_loss_fn(stack_params(params2), None, batch2, cfg2, mesh,
                         num_microbatches=4)
