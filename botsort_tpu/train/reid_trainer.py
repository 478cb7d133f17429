"""Batch-hard triplet-loss trainer for the ReID encoders, data-parallel
over a TPU mesh.

The reference is inference-only: its mot17/mot20 SBS-S50 weights come
from the upstream FastReID torch training stack (README.md:57-66 lists
the pretrained variants). This module provides the TPU-native equivalent
capability: fine-tune the Flax encoders on labeled crops with the
standard batch-hard triplet objective (the core of the FastReID recipe),
sharded over devices with `jax.sharding` — gradients reduced over ICI by
XLA-inserted collectives, params replicated.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def batch_hard_triplet_loss(features: jnp.ndarray, labels: jnp.ndarray,
                            margin: float = 0.3) -> jnp.ndarray:
    """Hermans et al. batch-hard triplet loss on L2-normalized features.

    features: [N, D] (normalized); labels: [N] int32.
    """
    # Cosine distance = 1 - f @ f.T for normalized features.
    dist = 1.0 - features @ features.T                     # [N, N]
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    hardest_pos = jnp.max(jnp.where(pos_mask, dist, -jnp.inf), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, dist, jnp.inf), axis=1)
    valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)
    loss = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def make_trainer(model, mesh: Mesh, learning_rate: float = 3.5e-4):
    """Build (init_fn, train_step) for data-parallel ReID fine-tuning.

    Batches shard over the mesh's first axis; params/optimizer state are
    replicated; XLA inserts the gradient all-reduce over ICI.
    """
    tx = optax.adamw(learning_rate)
    axis = mesh.axis_names[0]
    replicated = NamedSharding(mesh, P())

    def init_fn(rng, sample_batch) -> TrainState:
        params = model.init(rng, sample_batch)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.int32(0))
        return jax.device_put(state, replicated)

    def loss_fn(params, images, labels):
        feats = model.apply(params, images)
        return batch_hard_triplet_loss(feats, labels)

    @functools.partial(
        jax.jit,
        in_shardings=(
            replicated,
            NamedSharding(mesh, P(axis)),
            NamedSharding(mesh, P(axis)),
        ),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
    def train_step(state: TrainState, images, labels
                   ) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images,
                                                  labels)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, train_step
