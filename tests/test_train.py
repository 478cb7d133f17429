"""Data-parallel ReID trainer: loss sanity + sharded step execution."""

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from botsort_tpu.models import FastReIDSBS
from botsort_tpu.parallel.streams import make_mesh
from botsort_tpu.runtime.assets import MINI
from botsort_tpu.train.reid_trainer import (
    batch_hard_triplet_loss,
    make_trainer,
)


def unit_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_triplet_loss_orders_correctly():
    # Two identities, clearly separated -> zero loss; interleaved -> high.
    a = unit_rows(np.array([[1, 0, 0], [0.99, 0.1, 0]], np.float32))
    b = unit_rows(np.array([[0, 1, 0], [0.1, 0.99, 0]], np.float32))
    feats = jnp.asarray(np.concatenate([a, b]))
    labels = jnp.asarray([0, 0, 1, 1])
    good = float(batch_hard_triplet_loss(feats, labels, margin=0.3))
    assert good < 0.05

    feats_bad = jnp.asarray(unit_rows(np.array(
        [[1, 0, 0], [0, 1, 0], [1, 0.05, 0], [0, 1, 0.05]], np.float32)))
    bad = float(batch_hard_triplet_loss(feats_bad, labels, margin=0.3))
    assert bad > good


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_train_step_reduces_loss():
    mesh = make_mesh(8)
    model = FastReIDSBS(**MINI["body"])
    init_fn, train_step = make_trainer(model, mesh, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(16, 64, 32, 3)).astype(
        np.float32))
    labels = jnp.asarray((np.arange(16) % 4).astype(np.int32))
    state = init_fn(jax.random.PRNGKey(0), images[:1])
    images = jax.device_put(images, NamedSharding(mesh, P("stream")))
    labels = jax.device_put(labels, NamedSharding(mesh, P("stream")))

    losses = []
    for _ in range(4):
        state, loss = train_step(state, images, labels)
        losses.append(float(loss))
    assert losses[-1] <= losses[0] + 1e-3
    assert int(state.step) == 4
