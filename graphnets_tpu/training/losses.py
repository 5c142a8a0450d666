"""Masked losses over padded graph batches.

The reference computes losses on mask-selected real slots
(``flatunpaddednf/ef``, ``/root/reference/src/views.jl:80-98``, used at
``/root/reference/examples/sort/sort.jl:76-78``).  Under jit we keep static
shapes and weight by the mask instead — numerically identical: Flux's
``logitcrossentropy`` is the mean over samples of
``-sum(targets .* logsoftmax(logits))``, so the masked mean over real slots
matches exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import GraphsTuple

Array = jax.Array

__all__ = ["masked_logit_crossentropy", "sort_task_loss",
           "graph_loss_nf_ef", "masked_accuracy", "graph_accuracy",
           "per_graph_correct"]


def masked_logit_crossentropy(logits: Array, targets: Array,
                              mask: Array) -> Array:
    """Mean softmax cross-entropy over rows where ``mask`` is True.

    ``logits, targets: [T, C]``; ``mask: [T]`` bool.  Matches Flux
    ``logitcrossentropy`` restricted to real slots.
    """
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_row = -jnp.sum(targets.astype(jnp.float32) * logz, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def graph_loss_nf_ef(pred: GraphsTuple, target: GraphsTuple) -> Array:
    """Node-CE + edge-CE, masked to real slots — the sort-task loss
    (``/root/reference/examples/sort/sort.jl:76-78``)."""
    loss = masked_logit_crossentropy(pred.nf, target.nf, pred.node_mask)
    loss += masked_logit_crossentropy(pred.ef, target.ef, pred.edge_mask)
    return loss


sort_task_loss = graph_loss_nf_ef


def per_graph_correct(pred: GraphsTuple, target: GraphsTuple) -> Array:
    """``[G]`` int32: 1 where EVERY real node and edge prediction of the
    graph is correct (garbage on padding graph slots — mask with
    ``graph_mask``)."""
    G = pred.num_graph_slots

    def per_graph_all_correct(logits, targets, mask, seg):
        ok = (jnp.argmax(logits, -1) == jnp.argmax(targets, -1)) | ~mask
        return jax.ops.segment_min(ok.astype(jnp.int32), seg,
                                   num_segments=G,
                                   indices_are_sorted=True)

    g_ok = per_graph_all_correct(pred.nf, target.nf, pred.node_mask,
                                 pred.node_graph)
    return g_ok * per_graph_all_correct(pred.ef, target.ef, pred.edge_mask,
                                        pred.edge_graph)


def graph_accuracy(pred: GraphsTuple, target: GraphsTuple) -> Array:
    """Fraction of real graphs whose EVERY real node and edge prediction is
    correct — the task-level accuracy the flagship sort run reports."""
    g_ok = per_graph_correct(pred, target)
    gm = pred.graph_mask.astype(jnp.float32)
    return jnp.sum(g_ok.astype(jnp.float32) * gm) / jnp.maximum(
        jnp.sum(gm), 1.0)


def masked_accuracy(logits: Array, targets: Array, mask: Array) -> Array:
    """Fraction of real slots where argmax(logits) == argmax(targets)."""
    correct = (jnp.argmax(logits, -1) == jnp.argmax(targets, -1))
    m = mask.astype(jnp.float32)
    return jnp.sum(correct.astype(jnp.float32) * m) / jnp.maximum(
        jnp.sum(m), 1.0)
