"""Jitted train/eval steps over a data-parallel mesh.

The step functions are plain jit with sharding-annotated inputs: batches
arrive split on the batch axis, state replicated; under SPMD XLA inserts
the gradient all-reduce over ICI. Donation of the state avoids a full
parameter copy per step.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from vqa_project_tpu.ops import multilabel_soft_margin_loss, vqa_score
from vqa_project_tpu.parallel import batch_sharding, replicated_sharding
from vqa_project_tpu.train.state import TrainState


def build_train_step(model, tx, mesh) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    metrics = {'loss': scalar, 'score': summed vqa score} — both already
    reduced across the whole (global) batch.
    """
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    def step(state: TrainState, batch: Dict[str, jax.Array]
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, drop_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logits, _, _ = model.apply(
                params, batch["question"], batch["image"], batch["qlen"],
                train=True, rngs={"dropout": drop_rng})
            loss = multilabel_soft_margin_loss(logits, batch["answers"])
            score = vqa_score(logits, batch["votes"])
            return loss, score

        (loss, score), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state,
            step=state.step + 1, rng=rng)
        return new_state, {"loss": loss, "score": score}

    batch_spec = {
        "question": bsh, "answers": bsh, "votes": bsh, "image": bsh,
        "qlen": bsh, "qid": bsh, "mask": bsh, "index": bsh,
    }
    return jax.jit(
        step,
        in_shardings=(rep, batch_spec),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def build_eval_step(model, mesh) -> Callable:
    """Returns eval_step(params, batch) -> (predictions, score).

    predictions: (B,) int32 argmax answer ids (valid rows only matter);
    score: masked summed vqa score for the batch.
    """
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    def step(params, batch):
        logits, adjacency, _ = model.apply(
            params, batch["question"], batch["image"], batch["qlen"],
            train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        votes = batch["votes"].astype(jnp.float32)
        picked = jnp.take_along_axis(votes, preds[:, None].astype(jnp.int32),
                                     axis=-1)[:, 0]
        score = jnp.sum(jnp.minimum(picked / 3.0, 1.0) * batch["mask"])
        return preds, score, adjacency

    batch_spec = {
        "question": bsh, "answers": bsh, "votes": bsh, "image": bsh,
        "qlen": bsh, "qid": bsh, "mask": bsh, "index": bsh,
    }
    return jax.jit(step, in_shardings=(rep, batch_spec),
                   out_shardings=(rep, rep, rep))
