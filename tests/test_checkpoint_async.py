"""AsyncCheckpointWriter semantics: latest-wins, flush durability, pacing."""

import time

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiobd_tpu.train.checkpoint import AsyncCheckpointWriter, load_checkpoint
from audiobd_tpu.train.state import TrainState


def _state(value: float) -> TrainState:
    params = {"dense": {"kernel": jnp.full((4, 4), value)}}
    tx = optax.adam(1e-3)
    return TrainState(params=params, batch_stats={}, opt_state=tx.init(params),
                      step=jnp.asarray(int(value)))


SPEC = {"attack": "badnets", "model": "smallcnn", "num_classes": 10,
        "feature_size": 3072, "n_mfcc": 40}


def test_flush_writes_latest_submission(tmp_path):
    writer = AsyncCheckpointWriter(min_interval=30.0)
    record_dir = str(tmp_path / "run")
    # Rapid-fire submissions: pacing means none need have hit disk yet, and
    # intermediate states may be skipped entirely — only the last must land.
    for v in (1.0, 2.0, 3.0):
        writer.submit(record_dir, _state(v), SPEC)
    writer.close()
    tree, spec = load_checkpoint(record_dir)
    assert float(np.asarray(tree["params"]["dense"]["kernel"])[0, 0]) == 3.0
    assert int(tree["step"]) == 3
    assert spec == SPEC


def test_submit_does_not_block_and_paces_writes(tmp_path):
    writer = AsyncCheckpointWriter(min_interval=60.0)
    record_dir = str(tmp_path / "run")
    writer.submit(record_dir, _state(1.0), SPEC)
    writer.flush()  # first write lands (flush overrides pacing)
    t0 = time.perf_counter()
    writer.submit(record_dir, _state(2.0), SPEC)
    assert time.perf_counter() - t0 < 1.0  # submit returns immediately
    # Within the 60 s interval the second write is still pending...
    tree, _ = load_checkpoint(record_dir)
    assert int(tree["step"]) == 1
    # ...until a flush forces it through.
    writer.close()
    tree, _ = load_checkpoint(record_dir)
    assert int(tree["step"]) == 2


def test_submit_after_close_raises(tmp_path):
    writer = AsyncCheckpointWriter()
    writer.close()
    with pytest.raises(RuntimeError):
        writer.submit(str(tmp_path / "run"), _state(1.0), SPEC)


def test_device_copy_survives_donating_step():
    """Early-stopping holders must deep-copy: make_train_step donates its
    input state, deleting raw 'best so far' references (the FlowMur full-
    budget crash: RuntimeError 'Array has been deleted')."""
    import jax
    import jax.numpy as jnp

    from audiobd_tpu.models import build_model
    from audiobd_tpu.train.loop import make_train_step

    model = build_model("smallcnn", 10, 224)
    tx = optax.adam(1e-3)
    x = jnp.zeros((8, 1, 32, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)
    batch = {
        "x": x,
        "y": jnp.zeros((8,), jnp.int32),
        "indicator": jnp.zeros((8,), jnp.int32),
        "mask": jnp.ones((8,), bool),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    held = state.device_copy()
    state, _ = step(state, batch, jax.random.PRNGKey(2))  # donates the input
    # the held copy must still be fully readable
    total = sum(float(jnp.sum(leaf)) for leaf in jax.tree_util.tree_leaves(held.params))
    assert np.isfinite(total)
