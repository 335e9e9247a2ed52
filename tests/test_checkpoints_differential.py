"""Differential fuzz of checkpoint retention/GC/shortcut/adoption semantics vs
the reference's ACTUAL Checkpoints (loaded standalone with daan stubs; torch
CPU for its .pth serialization).

Both implementations drive the same randomized training timelines (epochs x
{store_every, checkpoint_every} x best-epoch sets x frozen nets) into separate
directories, then the OBSERVABLE state is compared:

- the set of resumable epochs (training files on disk),
- the set of net payloads recoverable from ANY file in the epochs dir
  (file NAMES may differ by design: the reference renames a GC'd best epoch
  file into `_bestsofar` while we keep the epoch file protected by the `_best`
  symlink — the recoverable contents must match),
- what `_last` and the end-of-run best shortcut resolve to.

Reference: /root/reference/mdir/learning/checkpoints.py:60-204.
"""
import os
import random
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.learning.checkpoints import Checkpoints

torch = pytest.importorskip("torch")

_CP = "/root/reference/mdir/learning/checkpoints.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_CP),
                                     reason="reference tree not mounted")


def _load(fullname, path):
    spec = ilu.spec_from_file_location(fullname, path)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_cls():
    for name in ("daan", "daan.core", "daan.data"):
        sys.modules.setdefault(name, types.ModuleType(name))
    pr = types.ModuleType("daan.core.path_resolver")
    pr.resolve_path = lambda p: p
    sys.modules["daan.core.path_resolver"] = pr
    sys.modules["daan.core"].path_resolver = pr
    fsd = types.ModuleType("daan.data.fs_driver")
    fsd.fs_driver = lambda *a, **k: None
    sys.modules["daan.data.fs_driver"] = fsd
    sys.modules["daan.data"].fs_driver = fsd
    return _load("ref_checkpoints", _CP).Checkpoints


# --- timeline drivers ------------------------------------------------------

def _run_reference(cls, root, epochs, best_epochs, store_every,
                   checkpoint_every, frozen_aux):
    ck = cls(str(root), store_every, checkpoint_every, None)
    for e1 in range(1, epochs + 1):
        nets = {"net": {"frozen": False, "payload": ("net", e1)}}
        nets["aux"] = {"frozen": frozen_aux,
                       "payload": ("aux", 0 if frozen_aux else e1)}
        ck.save_epoch(nets, {"epoch": e1}, e1 - 1,
                      is_best=(e1 in best_epochs), is_last=(e1 == epochs))
    # every real reference run has an epochs/blobs dir (event processor);
    # the reference's adoption path copytrees it unconditionally
    os.makedirs(os.path.join(str(root), "epochs", "blobs"), exist_ok=True)
    return ck


def _run_ours(root, epochs, best_epochs, store_every, checkpoint_every,
              frozen_aux):
    ck = Checkpoints(str(root), store_every=store_every,
                     checkpoint_every=checkpoint_every)
    for e1 in range(1, epochs + 1):
        nets = {"net": _var("net", e1),
                "aux": _var("aux", 0 if frozen_aux else e1)}
        ck.save_epoch(e1, nets, train_state={"epoch": e1},
                      frozen=("aux",) if frozen_aux else (),
                      is_best=(e1 in best_epochs), is_last=(e1 == epochs))
    return ck


def _var(name, e1):
    # distinct, epoch-identifying payload per net
    code = float(e1 * 10 + (1 if name == "net" else 2))
    return {"params": {"w": np.full((2,), code, np.float32)}}


def _payload_of_var(var):
    code = int(var["params"]["w"][0])
    return ("net" if code % 10 == 1 else "aux", code // 10)


# --- observable summaries --------------------------------------------------

def _summarize_reference(epochs_dir):
    files = sorted(os.listdir(epochs_dir))
    resumable = {int(fn[len("learning_epoch_"):-len(".pth")])
                 for fn in files
                 if fn.startswith("learning_epoch_") and fn.endswith(".pth")}
    payloads = {"net": set(), "aux": set()}
    shortcuts = {}
    for fn in files:
        path = os.path.join(epochs_dir, fn)
        if fn.startswith("learning_epoch_") or fn.endswith(".tmp") \
                or os.path.isdir(path):
            continue
        name = fn.split("_")[0]
        state = torch.load(os.path.realpath(path), weights_only=False)
        payloads[name].add(state["payload"])
        for suffix in ("_last.pth", "_best.pth", "_bestsofar.pth"):
            if fn == name + suffix:
                shortcuts[(name, suffix[1:-4])] = state["payload"]
    return resumable, payloads, shortcuts


def _summarize_ours(ck, epochs_dir):
    import flax.serialization
    template = _var("net", 0)
    files = sorted(os.listdir(epochs_dir))
    resumable = set(ck.available_epochs())
    payloads = {"net": set(), "aux": set()}
    shortcuts = {}
    for fn in files:
        if not fn.endswith(".ckpt"):
            continue
        name = fn.split("_")[0]
        with open(os.path.join(epochs_dir, fn), "rb") as f:
            var = flax.serialization.from_bytes(template, f.read())
        payloads[name].add(_payload_of_var(var))
        for suffix in ("_last.ckpt", "_best.ckpt"):
            if fn == name + suffix:
                shortcuts[(name, suffix[1:-5])] = _payload_of_var(var)
    return resumable, payloads, shortcuts


# --- tests ------------------------------------------------------------------

@needs_reference
class TestRetentionDifferential:
    def test_fuzz_timelines(self, ref_cls, tmp_path):
        rng = random.Random(20260818)
        for case in range(120):
            epochs = rng.randint(1, 12)
            store_every = rng.choice([0, 1, 2, 3, 5, 10])
            checkpoint_every = rng.choice([1, 2, 3, 5])
            n_best = rng.randint(0, epochs)
            best_epochs = set(rng.sample(range(1, epochs + 1), n_best))
            frozen_aux = rng.random() < 0.4

            rdir = tmp_path / ("ref_%d" % case)
            odir = tmp_path / ("ours_%d" % case)
            _run_reference(ref_cls, rdir, epochs, best_epochs, store_every,
                           checkpoint_every, frozen_aux)
            ours = _run_ours(odir, epochs, best_epochs, store_every,
                             checkpoint_every, frozen_aux)

            ref = _summarize_reference(str(rdir / "epochs"))
            got = _summarize_ours(ours, str(odir / "epochs"))
            ctx = ("case=%d epochs=%d store=%d ckpt=%d best=%s frozen=%s"
                   % (case, epochs, store_every, checkpoint_every,
                      sorted(best_epochs), frozen_aux))
            assert got[0] == ref[0], "resumable epochs diverge: %s" % ctx
            assert got[1] == ref[1], "recoverable payloads diverge: %s" % ctx
            # the reference renames _bestsofar -> _best at is_last; ours keeps
            # one _best shortcut throughout — compare the end-of-run meaning
            for name in ("net", "aux"):
                assert got[2].get((name, "last")) == ref[2].get((name, "last")), \
                    "_last diverges for %s: %s" % (name, ctx)
                ref_best = ref[2].get((name, "best"),
                                      ref[2].get((name, "bestsofar")))
                assert got[2].get((name, "best")) == ref_best, \
                    "best shortcut diverges for %s: %s" % (name, ctx)


@needs_reference
class TestAdoptionDifferential:
    """Cross-experiment resume: both implementations trained a sibling
    `exp_<k>ep`, then a fresh `exp_5ep` adopts it through the same 3-group
    directory_epoch_regex (reference checkpoints.py:171-204)."""

    def _regex(self):
        return r"(^.*/exp_)(\d+)(ep/epochs$)"

    @pytest.mark.parametrize("prev_epochs", [1, 2, 3, 4])
    def test_adopts_same_sibling(self, ref_cls, tmp_path, prev_epochs):
        base_r = tmp_path / "ref"
        base_o = tmp_path / "ours"
        _run_reference(ref_cls, base_r / ("exp_%dep" % prev_epochs),
                       prev_epochs, {1}, 10, 2, False)
        _run_ours(base_o / ("exp_%dep" % prev_epochs),
                  prev_epochs, {1}, 10, 2, False)

        rck = ref_cls(str(base_r / "exp_5ep"), 10, 2, self._regex())
        got_ref = rck.load_latest_epoch(5)
        assert got_ref is not None
        ref_net, ref_training = got_ref

        ock = Checkpoints(str(base_o / "exp_5ep"), store_every=10,
                          checkpoint_every=2,
                          directory_epoch_regex=self._regex())
        epoch, training = ock.load_latest_epoch()

        assert epoch == ref_training["epoch"] == prev_epochs
        assert training["epoch"] == ref_training["epoch"]
        for name in ("net", "aux"):
            ours_var = ock.load_net(name, epoch, _var(name, 0))
            assert _payload_of_var(ours_var) == ref_net[name]["payload"]

    def test_picks_largest_finished_sibling(self, ref_cls, tmp_path):
        base_r = tmp_path / "ref"
        base_o = tmp_path / "ours"
        for k in (1, 3):
            # siblings must have a best epoch: the reference's adoption copies
            # net_best.pth unconditionally (a finished run always has one)
            _run_reference(ref_cls, base_r / ("exp_%dep" % k), k, {1},
                           10, 2, False)
            _run_ours(base_o / ("exp_%dep" % k), k, {1}, 10, 2, False)

        rck = ref_cls(str(base_r / "exp_5ep"), 10, 2, self._regex())
        _, ref_training = rck.load_latest_epoch(5)
        ock = Checkpoints(str(base_o / "exp_5ep"), store_every=10,
                          checkpoint_every=2,
                          directory_epoch_regex=self._regex())
        epoch, training = ock.load_latest_epoch()
        assert epoch == ref_training["epoch"] == 3
        assert training["epoch"] == 3

    def test_adopt_then_continue_protects_adopted_epoch(self, ref_cls,
                                                        tmp_path):
        """After adoption the previous-checkpoint GC must never delete the
        adopted epoch's files (reference epoch_externally_loaded guard,
        checkpoints.py:66-67,202) — continue training to the end and compare
        the full observable state."""
        base_r = tmp_path / "ref"
        base_o = tmp_path / "ours"
        _run_reference(ref_cls, base_r / "exp_3ep", 3, {1}, 10, 2, False)
        _run_ours(base_o / "exp_3ep", 3, {1}, 10, 2, False)

        epochs, best_epochs = 6, {5}
        rck = ref_cls(str(base_r / "exp_6ep"), 10, 2, self._regex())
        assert rck.load_latest_epoch(epochs) is not None
        for e1 in range(4, epochs + 1):
            nets = {"net": {"frozen": False, "payload": ("net", e1)},
                    "aux": {"frozen": False, "payload": ("aux", e1)}}
            rck.save_epoch(nets, {"epoch": e1}, e1 - 1,
                           is_best=(e1 in best_epochs), is_last=(e1 == epochs))

        ock = Checkpoints(str(base_o / "exp_6ep"), store_every=10,
                          checkpoint_every=2,
                          directory_epoch_regex=self._regex())
        epoch, _ = ock.load_latest_epoch()
        assert epoch == 3
        for e1 in range(4, epochs + 1):
            ock.save_epoch(e1, {"net": _var("net", e1),
                                "aux": _var("aux", e1)},
                           train_state={"epoch": e1},
                           is_best=(e1 in best_epochs),
                           is_last=(e1 == epochs))

        ref = _summarize_reference(str(base_r / "exp_6ep" / "epochs"))
        got = _summarize_ours(ock, str(base_o / "exp_6ep" / "epochs"))
        assert got[0] == ref[0], "resumable epochs diverge after adoption"
        # the adopted epoch's files stay in the SIBLING dir (reference reads
        # them from there; nothing is copied locally except _best + blobs)
        assert 3 not in got[0]
        assert got[1] == ref[1], "recoverable payloads diverge after adoption"
        for name in ("net", "aux"):
            assert got[2].get((name, "last")) == ref[2].get((name, "last"))
            ref_best = ref[2].get((name, "best"),
                                  ref[2].get((name, "bestsofar")))
            assert got[2].get((name, "best")) == ref_best

    def test_none_when_no_sibling(self, ref_cls, tmp_path):
        rck = ref_cls(str(tmp_path / "ref" / "exp_5ep"), 10, 2, self._regex())
        assert rck.load_latest_epoch(5) is None
        ock = Checkpoints(str(tmp_path / "ours" / "exp_5ep"), store_every=10,
                          checkpoint_every=2,
                          directory_epoch_regex=self._regex())
        assert ock.load_latest_epoch() == (None, None)
