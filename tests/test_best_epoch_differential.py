"""Differential test of MetadataKeeper best-epoch / is-last-best semantics vs
the reference's ACTUAL eventprocessor.MetadataKeeper (loaded standalone with
daan/matplotlib-safe stubs).

These two functions gate which checkpoint becomes `_best` — i.e. which model
the eval stage (and the published mAP rows) ultimately load. Pinned:

- direction from the metric DTYPE: scalar/score -> argmax, else argmin
  (eventprocessor.py:131-134, 148-151);
- the "epoch" criterion marks every epoch best;
- a criterion that skipped the latest epoch (validation frequency > 1) is
  never "last best";
- exact ties: the LAST epoch counts as best for is_last_best, while
  best_epoch reports the FIRST best index;
- NaN iteration values are dropped before the epoch aggregate.

Reference: /root/reference/mdir/tools/eventprocessor.py:64-153.
"""
import os
import random
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.learning.events import EventBroker, MetadataKeeper

_EP = "/root/reference/mdir/tools/eventprocessor.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_EP),
                                     reason="reference tree not mounted")


def _load(fullname, path, search=None):
    spec = ilu.spec_from_file_location(fullname, path,
                                       submodule_search_locations=search)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_keeper_cls():
    for name in ("daan", "daan.presentation"):
        sys.modules.setdefault(name, types.ModuleType(name))
    pres = types.ModuleType("daan.presentation.presentation")
    sys.modules["daan.presentation.presentation"] = pres
    sys.modules["daan.presentation"].presentation = pres
    pkg = types.ModuleType("refmdir")
    pkg.__path__ = []
    sys.modules["refmdir"] = pkg
    tools = types.ModuleType("refmdir.tools")
    tools.__path__ = []
    sys.modules["refmdir.tools"] = tools
    _load("refmdir.tools.plots", "/root/reference/mdir/tools/plots.py")
    ep = _load("refmdir.tools.eventprocessor", _EP)
    return ep.MetadataKeeper


def _ref_feed(keeper, epoch, present):
    """Feed one closed epoch into the reference keeper.

    `present` maps data_key -> (dtype, [iteration values]) for the keys that
    logged anything this epoch (eventprocessor.py:75-114 structure)."""
    data = {}
    for key, (dtype, values) in present.items():
        data[key] = {"dtype": dtype,
                     "data": {"total": list(values)},
                     "relative_iteration": list(range(len(values))),
                     "epoch_size": max(len(values), 1)}
    keeper.register_epoch_data(epoch, data, {})


def _our_feed(broker, epoch, present):
    for key, (dtype, values) in present.items():
        for i, v in enumerate(values):
            broker.register_data(epoch, i, len(values),
                                 key + ":total", v, dtype)
    broker.close_epoch(epoch)


def _random_trace(rng, n_epochs, keys):
    """Per-epoch dict of key -> (dtype, values); keys may skip epochs."""
    trace = []
    for _ in range(n_epochs):
        present = {}
        for key, (dtype, freq) in keys.items():
            if rng.random() < freq:
                n = rng.randint(1, 4)
                # coarse grid -> frequent exact ties; occasional NaN
                values = [round(rng.choice([0.1, 0.2, 0.3]) +
                                rng.choice([0.0, 0.0, 0.01]), 3)
                          for _ in range(n)]
                if rng.random() < 0.1:
                    values[rng.randrange(n)] = float("nan")
                if all(np.isnan(v) for v in values):
                    values[0] = 0.2  # both sides agree only on non-empty
                present[key] = (dtype, values)
        trace.append(present)
    return trace


@needs_reference
@pytest.mark.parametrize("decisive,dtype", [
    ("g/loss:total", "scalar/loss"),
    ("val/learning/score_avg:total", "scalar/score"),
])
def test_fuzz_vs_reference(ref_keeper_cls, decisive, dtype):
    data_key = decisive.rsplit(":", 1)[0]
    mismatches = []
    for seed in range(300):
        rng = random.Random(seed)
        keys = {data_key: (dtype, rng.choice([1.0, 1.0, 0.5])),
                "other/loss": ("scalar/loss", 0.8)}
        trace = _random_trace(rng, rng.randint(1, 8), keys)

        ref = ref_keeper_cls(None)
        ours = EventBroker(metadata=MetadataKeeper(decisive))
        for epoch, present in enumerate(trace):
            _ref_feed(ref, epoch, present)
            _our_feed(ours, epoch, present)
            r = ref.is_last_best(decisive)
            o = ours.metadata.is_last_best()
            if r != o:
                mismatches.append((seed, epoch, "is_last_best", r, o, trace))
        rbest = ref.best_epoch(decisive)
        obest = ours.metadata.best_epoch()
        rbest_idx = rbest["index"] if rbest is not None else None
        if rbest_idx != obest:
            mismatches.append((seed, None, "best_epoch", rbest_idx, obest,
                               trace))
    assert not mismatches, mismatches[:3]


@needs_reference
def test_epoch_criterion_vs_reference(ref_keeper_cls):
    ref = ref_keeper_cls(None)
    ours = EventBroker(metadata=MetadataKeeper("epoch"))
    for epoch in range(3):
        present = {"g/loss": ("scalar/loss", [0.5 - 0.1 * epoch])}
        _ref_feed(ref, epoch, present)
        _our_feed(ours, epoch, present)
        assert ref.is_last_best("epoch") is True
        assert ours.metadata.is_last_best() is True
    assert ref.best_epoch("epoch")["index"] == 2
    assert ours.metadata.best_epoch() == 2


def test_loss_criterion_picks_min():
    """The finetune wiring regression: a loss decisive criterion must pick the
    MIN epoch, and epochs the validation skipped must not be 'best'."""
    ours = EventBroker(metadata=MetadataKeeper("val/learning/loss:total"))
    flags = []
    # validation runs on epochs 0, 2, 4 (frequency 2); losses 0.5, 0.2, 0.4
    for epoch, loss in enumerate([0.5, None, 0.2, None, 0.4]):
        present = {"train/loss": ("scalar/loss", [1.0])}
        if loss is not None:
            present["val/learning/loss"] = ("scalar/loss", [loss])
        _our_feed(ours, epoch, present)
        flags.append(ours.metadata.is_last_best())
    assert flags == [True, False, True, False, False]
    assert ours.metadata.best_epoch() == 2


def test_score_criterion_picks_max_with_tie():
    ours = EventBroker(metadata=MetadataKeeper("val/score:total"))
    flags = []
    for epoch, score in enumerate([0.3, 0.7, 0.5, 0.7]):
        _our_feed(ours, epoch, {"val/score": ("scalar/score", [score])})
        flags.append(ours.metadata.is_last_best())
    # tie at the last epoch still counts as best (eventprocessor.py:131-134)
    assert flags == [True, True, False, True]
    # ... while best_epoch reports the FIRST best index (argmax)
    assert ours.metadata.best_epoch() == 1


def test_nan_iterations_dropped():
    ours = EventBroker(metadata=MetadataKeeper("g/loss:total"))
    _our_feed(ours, 0, {"g/loss": ("scalar/loss",
                                   [0.4, float("nan"), 0.2])})
    assert ours.metadata.series("g/loss:total") == [pytest.approx(0.3)]


def test_state_roundtrip_preserves_semantics():
    ours = EventBroker(metadata=MetadataKeeper("val/loss:total"))
    for epoch, loss in enumerate([0.5, 0.2]):
        _our_feed(ours, epoch, {"val/loss": ("scalar/loss", [loss])})
    clone = EventBroker(metadata=MetadataKeeper(None))
    clone.load_state_dict(ours.state_dict())
    _our_feed(clone, 2, {"val/loss": ("scalar/loss", [0.9])})
    assert clone.metadata.is_last_best() is False
    assert clone.metadata.best_epoch() == 1


@needs_reference
def test_aggregation_values_vs_reference(ref_keeper_cls):
    """Per-epoch aggregated VALUES across all three scalar dtypes: loss/score
    average, time SUM (eventprocessor.py:88), NaN iterations dropped first
    (:106-108). Compares the reference keeper's stored epoch series against
    our broker history."""
    rng = random.Random(11)
    for _ in range(50):
        keys = {"g/loss": ("scalar/loss", 1.0),
                "val/score": ("scalar/score", 1.0),
                "t/time": ("scalar/time", 1.0)}
        trace = _random_trace(rng, rng.randint(1, 5), keys)
        ref = ref_keeper_cls(None)
        ours = EventBroker(metadata=MetadataKeeper(None))
        for epoch, present in enumerate(trace):
            _ref_feed(ref, epoch, present)
            _our_feed(ours, epoch, present)
        for key in keys:
            want = ref.data.get((key, "total"))
            if want is None:
                continue
            got = [h["metrics"][key + ":total"] for h in ours.history
                   if key + ":total" in h["metrics"]]
            np.testing.assert_allclose(got, want["data"], rtol=1e-12,
                                       err_msg=key)
