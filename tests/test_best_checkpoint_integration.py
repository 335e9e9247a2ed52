"""Integration of the decisive-criterion chain: Training loop -> events ->
MetadataKeeper.is_last_best -> Checkpoints `_best`/`_last` symlinks.

The reference picks the `_best` checkpoint by MIN validation loss
(validation.py:58 + eventprocessor.py:122-134 + learning.py:72); with a
validation frequency > 1 the skipped epochs must never become best. `_last`
always tracks the final epoch. This is the end-to-end guarantee that eval
loads the right fine-tuned weights.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gandtr_tpu.learning.checkpoints import Checkpoints
from gandtr_tpu.learning.events import EventBroker, MetadataKeeper
from gandtr_tpu.learning.training import Training


class _State:
    def __init__(self):
        self.variables = {"net": {"params": {"w": jnp.zeros(3)}}}

    def replace(self, **kw):
        return self


class _Loader:
    dataset = None

    def __len__(self):
        return 1

    def __iter__(self):
        yield (np.zeros(1, np.float32),)


class _ScriptedValidation:
    """Logs a scripted val loss on epochs its frequency allows."""

    def __init__(self, losses, frequency):
        self.losses = losses
        self.frequency = frequency

    def __call__(self, state, epoch, events):
        if self.frequency and epoch % self.frequency != 0:
            return
        events.logger("", epoch)("val/learning/loss:total",
                                 self.losses[epoch], "scalar/loss")


def _run(tmp_path, losses, frequency, epochs):
    def step(state, x):
        # mark the epoch into the weights so we can identify which one a
        # checkpoint file holds
        step._epoch += 1
        state.variables = {"net": {"params": {
            "w": jnp.full(3, float(step._epoch))}}}
        return state, {"total": jnp.float32(0.1)}

    step._epoch = 0
    events = EventBroker(metadata=MetadataKeeper("val/learning/loss:total"))
    ckpt = Checkpoints(str(tmp_path), store_every=0, checkpoint_every=1)
    tr = Training(step_fn=step, loader=_Loader(), epochs=epochs,
                  events=events, checkpoints=ckpt,
                  validations=[_ScriptedValidation(losses, frequency)])
    tr.run(_State())
    return ckpt


def _epoch_of(ckpt, suffix):
    import flax.serialization
    path = os.path.join(ckpt.epochs_dir, "net%s.ckpt" % suffix)
    with open(path, "rb") as f:
        w = flax.serialization.from_bytes(
            {"params": {"w": np.zeros(3)}}, f.read())
    return int(w["params"]["w"][0])


def test_best_tracks_min_val_loss(tmp_path):
    # val runs every epoch; min loss at epoch 2 of 4
    ckpt = _run(tmp_path, {1: 0.5, 2: 0.2, 3: 0.4, 4: 0.3}, 1, 4)
    assert _epoch_of(ckpt, "_best") == 2
    assert _epoch_of(ckpt, "_last") == 4


def test_skipped_epochs_never_best(tmp_path):
    # frequency 2: val runs at 2 and 4 only; min at epoch 2
    ckpt = _run(tmp_path, {2: 0.2, 4: 0.9}, 2, 4)
    assert _epoch_of(ckpt, "_best") == 2
    assert _epoch_of(ckpt, "_last") == 4


def test_tie_moves_best_to_later_epoch(tmp_path):
    # exact tie: the later epoch wins is_last_best (eventprocessor.py:131-134)
    ckpt = _run(tmp_path, {1: 0.3, 2: 0.3, 3: 0.5}, 1, 3)
    assert _epoch_of(ckpt, "_best") == 2
    assert _epoch_of(ckpt, "_last") == 3


def test_no_criterion_best_tracks_last(tmp_path):
    def step(state, x):
        return state, {"total": jnp.float32(0.1)}

    events = EventBroker(metadata=MetadataKeeper(None))
    ckpt = Checkpoints(str(tmp_path), store_every=0, checkpoint_every=1)
    tr = Training(step_fn=step, loader=_Loader(), epochs=2, events=events,
                  checkpoints=ckpt, validations=[])
    tr.run(_State())
    best = os.path.realpath(os.path.join(ckpt.epochs_dir, "net_best.ckpt"))
    last = os.path.realpath(os.path.join(ckpt.epochs_dir, "net_last.ckpt"))
    assert best == last
