"""Differential test of validation semantics vs the reference's ACTUAL
mdir/learning/validation.py (loaded standalone with stub parent packages).

Pinned semantics:

- should_validate: `epoch is None or (frequency and (epoch+1) % frequency
  == 0)` with the reference's 0-based epochs — ours are 1-based, so the
  mapping is ref_epoch + 1. In particular a falsy frequency (null/0) NEVER
  validates during training (the reference's eval.yml uses `frequency: null`
  so its validations only run in the explicit validate stage, epoch=None).
- sum-reduction criteria are batch-normalized before logging
  (validation.py:99-101), and the epoch aggregate is the mean over batches.
- MultiCriterialValidation filters children by should_validate.

Reference: /root/reference/mdir/learning/validation.py.
"""
import os
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.learning.training import (LossValidation,
                                          MultiCriterialValidation,
                                          should_validate)

_VAL = "/root/reference/mdir/learning/validation.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_VAL),
                                     reason="reference tree not mounted")


def _load(fullname, path, search=None):
    spec = ilu.spec_from_file_location(fullname, path,
                                       submodule_search_locations=search)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_validation():
    """Load the reference validation.py with stub ancestors: its initialize_*
    imports are only exercised by .initialize classmethods, which these tests
    bypass by constructing the classes directly."""
    torch = pytest.importorskip("torch")  # noqa: F841  (loss_value needs it)
    pkg = types.ModuleType("refl")
    pkg.__path__ = []
    sys.modules["refl"] = pkg
    learning = types.ModuleType("refl.learning")
    learning.__path__ = []
    sys.modules["refl.learning"] = learning
    tools = types.ModuleType("refl.tools")
    tools.__path__ = []
    sys.modules["refl.tools"] = tools
    lv = _load("refl.tools.loss_value",
               "/root/reference/mdir/tools/loss_value.py")
    tools.loss_value = lv
    tsr = _load("refl.tools.tensors", "/root/reference/mdir/tools/tensors.py")
    tools.tensors = tsr

    stats = types.ModuleType("refl.tools.stats")

    class StopWatch:
        def lap(self, name):
            pass

        def reset(self, include_total=True):
            return {}

    stats.StopWatch = StopWatch
    sys.modules["refl.tools.stats"] = stats
    tools.stats = stats

    utils = types.ModuleType("refl.tools.utils")
    utils.indent = lambda s: s
    sys.modules["refl.tools.utils"] = utils
    tools.utils = utils

    comp = types.ModuleType("refl.components")
    comp.__path__ = []
    sys.modules["refl.components"] = comp
    for name, fn in (("optim.criterion", "initialize_criterion"),
                     ("optim.score", "initialize_score"),
                     ("data.dataset", "initialize_dataset_loader")):
        parts = name.split(".")
        parent = comp
        full = "refl.components"
        for part in parts:
            full += "." + part
            mod = sys.modules.get(full)
            if mod is None:
                mod = types.ModuleType(full)
                mod.__path__ = []
                sys.modules[full] = mod
                setattr(parent, part, mod)
            parent = mod
        setattr(parent, fn, lambda *a, **k: None)

    return _load("refl.learning.validation", _VAL)


class _RefNetwork:
    """Minimal reference Network stand-in for SingleValidation.validate."""

    def __init__(self, fn):
        self.fn = fn

    def overlay_params(self, overlay, device):
        assert overlay is None
        return self

    def eval(self):
        pass

    def forward(self, images):
        return self.fn(images)


class _RefLoader(list):
    def __init__(self, batches):
        super().__init__(batches)
        self.dataset = object()  # no prepare_epoch


class _SumCriterion:
    reduction = "sum"

    def __call__(self, output, target):
        import torch
        return (output - target).abs().sum()


class _MeanCriterion(_SumCriterion):
    reduction = "mean"

    def __call__(self, output, target):
        import torch
        return (output - target).abs().mean()


@needs_reference
class TestShouldValidate:
    def test_grid_vs_reference(self, ref_validation):
        """should_validate over (epoch × frequency), mapping our 1-based
        epochs to the reference's 0-based ones."""
        for freq in (None, 0, 1, 2, 3, 5, 7, 50):
            ref = ref_validation.SingleValidation(
                data_loader=None, criterion=None, network_overlay=None,
                frequency=freq, decisive_criterion="x",
                criterion_mean_reduction=None)
            assert bool(should_validate(freq, None)) == \
                bool(ref.should_validate(None)), freq
            for ref_epoch in range(0, 25):
                ours = bool(should_validate(freq, ref_epoch + 1))
                theirs = bool(ref.should_validate(ref_epoch))
                assert ours == theirs, (freq, ref_epoch)

    def test_falsy_frequency_never_validates_in_training(self):
        calls = []

        class _Loader(list):
            dataset = object()

        val = LossValidation(lambda *_: calls.append(1) or 0.0,
                             _Loader([(np.zeros(1),)]), frequency=None)

        class _Events:
            def logger(self, *a, **k):
                return lambda *a2, **k2: None

        for epoch in range(1, 8):
            val(None, epoch, _Events())
        assert not calls

    def test_multicriterial_children_self_gate(self, ref_validation):
        """The reference's MultiCriterialValidation.validations filters by
        each child's should_validate; our children gate themselves inside
        __call__ — same observable validation schedule."""
        ran = []

        def make_child(name, freq):
            class _Loader(list):
                dataset = object()

            return LossValidation(
                lambda *_: ran.append(name) or 0.0,
                _Loader([(np.zeros(1),)]), frequency=freq)

        ours = MultiCriterialValidation(
            {"a": make_child("a", 2), "b": make_child("b", 3)},
            decisive_criterion="epoch")

        ref_children = {
            "a": ref_validation.SingleValidation(
                data_loader=None, criterion=None, network_overlay=None,
                frequency=2, decisive_criterion="x",
                criterion_mean_reduction=None),
            "b": ref_validation.SingleValidation(
                data_loader=None, criterion=None, network_overlay=None,
                frequency=3, decisive_criterion="x",
                criterion_mean_reduction=None),
        }
        ref_multi = ref_validation.MultiCriterialValidation("epoch",
                                                            ref_children)

        class _Events:
            def logger(self, *a, **k):
                return lambda *a2, **k2: None

        for ref_epoch in range(0, 13):
            ran.clear()
            ours(None, ref_epoch + 1, _Events())
            expected = sorted(k for k, _ in ref_multi.validations(ref_epoch))
            assert sorted(ran) == expected, ref_epoch


@needs_reference
class TestBatchNormalization:
    def _ref_epoch_loss(self, ref_validation, criterion, batches):
        """Run the reference SingleValidation.validate and aggregate its
        logged batch losses the way MetadataKeeper does (mean over events)."""
        val = ref_validation.SingleValidation(
            data_loader=_RefLoader(batches), criterion=criterion,
            network_overlay=None, frequency=1, decisive_criterion="x",
            criterion_mean_reduction=criterion.reduction == "mean")
        logged = []

        def logger(i, n, key, value, dtype):
            if key == "loss":
                logged.append(value["total"])

        net = _RefNetwork(lambda images: images)
        acc = val.validate(net, "cpu", logger)
        assert logged == [float(x) for x in acc]
        return float(np.mean(logged))

    @pytest.mark.parametrize("reduction", ["sum", "mean"])
    def test_epoch_loss_equals_reference(self, ref_validation, reduction):
        import torch
        rng = np.random.RandomState(17)
        # variable batch sizes: the sum-reduction normalization divides by
        # the per-batch length, so unequal batches distinguish the orders
        batches = []
        for size in (3, 1, 4, 2):
            imgs = torch.tensor(rng.rand(size, 5), dtype=torch.float64)
            tgts = torch.tensor(rng.rand(size, 5), dtype=torch.float64)
            batches.append((imgs, tgts))
        criterion = _SumCriterion() if reduction == "sum" else _MeanCriterion()
        ref_loss = self._ref_epoch_loss(ref_validation, criterion, batches)

        class _Loader(list):
            dataset = object()

        def loss_fn(state, imgs, tgts):
            diff = np.abs(np.asarray(imgs) - np.asarray(tgts))
            return diff.sum() if reduction == "sum" else diff.mean()

        logged = []

        class _Events:
            def logger(self, *a, **k):
                return lambda key, value, dtype: logged.append(value)

        ours = LossValidation(
            loss_fn, _Loader([(np.asarray(i), np.asarray(t))
                              for i, t in batches]),
            frequency=1, criterion_mean_reduction=reduction == "mean")
        ours(None, 1, _Events())
        assert logged and abs(logged[0] - ref_loss) < 1e-12
