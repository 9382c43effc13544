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
