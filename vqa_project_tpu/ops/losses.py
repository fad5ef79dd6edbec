"""Loss and metric functions.

Parity targets:
- nn.MultiLabelSoftMarginLoss with soft targets (/root/reference/run.py:165,
  213): mean over classes, then mean over batch, of the binary
  cross-entropy with logits.
- total_vqa_score (/root/reference/utils.py:47-55): the official VQA metric
  min(#votes[pred] / 3, 1) summed over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_margin_per_sample(logits: jnp.ndarray,
                           targets: jnp.ndarray) -> jnp.ndarray:
    """Per-sample class-mean of the soft-target BCE-with-logits, (B,).

    The elementwise core of multilabel_soft_margin_loss, exposed so the
    data-parallel bf16-reduction step can apply its own (global-count)
    batch reduction without duplicating the numerics.
    """
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    elem = y * jax.nn.softplus(-x) + (1.0 - y) * jax.nn.softplus(x)
    return jnp.mean(elem, axis=-1)


def multilabel_soft_margin_loss(
    logits: jnp.ndarray, targets: jnp.ndarray,
    sample_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Soft-target multi-label BCE-with-logits, torch reduction semantics.

    loss = mean_b mean_c [ y * softplus(-x) + (1 - y) * softplus(x) ]

    which equals -(y*log sigmoid(x) + (1-y)*log sigmoid(-x)) elementwise.

    Args:
      logits:  (B, C) float.
      targets: (B, C) soft labels in [0, 1].
      sample_mask: optional (B,) 0/1 validity weights — padded rows of
        locality-partitioned batches contribute nothing; with an all-ones
        mask this reduces exactly to the unmasked mean.
    Returns:
      scalar float32 loss.
    """
    per_sample = soft_margin_per_sample(logits, targets)
    if sample_mask is None:
        return jnp.mean(per_sample)
    m = sample_mask.astype(jnp.float32)
    # where(), not multiply: padded rows may hold garbage features whose
    # logits are inf/NaN, and 0 * inf would poison the masked mean
    per_sample = jnp.where(m > 0, per_sample, 0.0)
    return jnp.sum(per_sample) / jnp.maximum(jnp.sum(m), 1.0)


def vqa_score(logits: jnp.ndarray, n_votes: jnp.ndarray,
              sample_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Summed official VQA score of the argmax predictions.

    Args:
      logits:  (B, C).
      n_votes: (B, C) per-answer vote counts.
      sample_mask: optional (B,) — padded rows contribute 0.
    Returns:
      scalar float32: sum over batch of min(votes[argmax]/3, 1).
    """
    pred = jnp.argmax(logits, axis=-1)
    votes = jnp.take_along_axis(
        n_votes.astype(jnp.float32), pred[:, None], axis=-1
    )[:, 0]
    score = jnp.minimum(votes / 3.0, 1.0)
    if sample_mask is not None:
        score = score * sample_mask
    return jnp.sum(score)
