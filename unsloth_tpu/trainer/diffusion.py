"""Masked-diffusion LM trainer (text-diffusion fine-tuning).

Parity target: the reference trains FastDiffusionModel checkpoints through
the ordinary HF Trainer after its PEFT helper (reference:
models/diffusion.py:275-329 get_peft_model + loader.py:1134-1147 routing);
here the denoising objective is first-class: one jitted step samples the
mask (on-device RNG), computes the 1/t-weighted masked CE
(models/diffusion.diffusion_loss), and updates the trainables.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.diffusion import diffusion_loss
from .sft import SFTConfig, SFTTrainer, TrainOutput, build_optimizer


class DiffusionTrainer(SFTTrainer):
    """SFTTrainer with the masked-denoising loss; data prep (tokenize /
    pad, no packing — diffusion canvases are fixed windows) is inherited."""

    def __init__(self, model, tokenizer=None, train_dataset=None,
                 args: Optional[SFTConfig] = None, **kwargs):
        if args is None:
            args = SFTConfig()
        args.packing = False
        super().__init__(model, tokenizer=tokenizer,
                         train_dataset=train_dataset, args=args, **kwargs)
        assert model.cfg.mask_token_id is not None, \
            "diffusion model needs mask_token_id (FastDiffusionModel sets it)"

    def _make_train_step(self, tx):
        model = self.model
        cfg = model.cfg
        full_ft = model.lora is None
        gc_mode = getattr(model, "gc_mode", True)

        def step(trainables, opt_state, base_params, batch, key):
            params = trainables if full_ft else base_params
            lora = None if full_ft else trainables

            def loss_for(tr):
                p = tr if full_ft else base_params
                l = None if full_ft else tr
                return diffusion_loss(p, l, batch, cfg, key,
                                      remat=gc_mode)

            loss, grads = jax.value_and_grad(loss_for)(trainables)
            updates, opt_state = tx.update(grads, opt_state, trainables)
            return optax.apply_updates(trainables, updates), opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def train(self, resume_from_checkpoint=None) -> TrainOutput:
        args = self.args
        batches = self.prepare_batches()
        total_steps = args.max_steps if args.max_steps > 0 else \
            max(int(len(batches) * args.num_train_epochs), 1)

        full_ft = self.model.lora is None
        trainables = self.model.params if full_ft else self.model.lora
        trainables = self._place_train_state(trainables, full_ft)
        tx, schedule = build_optimizer(args, total_steps, trainables)
        opt_state = tx.init(trainables)
        base_params = self.model.params
        step_fn = self._make_train_step(tx)
        key = jax.random.PRNGKey(args.seed)

        losses = []
        t0 = time.time()
        global_step = 0
        while global_step < total_steps:
            for pb in batches:
                if global_step >= total_steps:
                    break
                batch = {
                    "input_ids": jnp.asarray(pb.input_ids),
                    "segment_ids": jnp.asarray(pb.segment_ids),
                    "positions": jnp.asarray(pb.positions),
                }
                key, sk = jax.random.split(key)
                trainables, opt_state, loss = step_fn(
                    trainables, opt_state, base_params, batch, sk)
                global_step += 1
                if global_step % args.logging_steps == 0:
                    entry = {"loss": float(loss), "step": global_step,
                             "learning_rate": float(schedule(global_step))}
                    losses.append(float(loss))
                    self.state_log.append(entry)
                    self.metrics_logger.log(entry)

        if full_ft:
            self.model.params = trainables
        else:
            self.model.lora = trainables
        return TrainOutput(
            global_step,
            float(np.mean(losses)) if losses else float("nan"),
            {"train_runtime": time.time() - t0})
