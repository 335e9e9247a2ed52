"""Differential fuzz of compound GAN losses vs the reference's ACTUAL code.

Loads /root/reference/mdir/components/optim/criterion/ standalone (with
mdir.tools.loss_value + cirtorch.layers.{functional,loss} loaded the same
way) and fuzzes:

- DiscriminatorLoss (single + multiscale list, mse/bce_with_logits, the
  inverted real->0/fake->1 target convention)
- PatchNCELoss / MultilayerPatchNCELoss (temperature, bmm batching, the
  exp(-10) diagonal fill)
- MultiheadLoss / CombinationLoss (scalar + dict weights, normalize_weights)
- ContrastiveLossMultipleDescriptors (weighted multi-descriptor variant)

The one-step/multi-step golden trajectories pin these end-to-end; this pins
them directly over randomized inputs. Reference:
/root/reference/mdir/components/optim/criterion/compound_losses.py,
cirlosses.py.
"""
import os
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest
import jax.numpy as jnp

from gandtr_tpu.ops import losses as L
from gandtr_tpu.learning import criteria as C

_CRIT = "/root/reference/mdir/components/optim/criterion"
_REF_EXT = "/root/reference/mdir/external"

needs_reference = pytest.mark.skipif(not os.path.isdir(_CRIT),
                                     reason="reference tree not mounted")
torch = pytest.importorskip("torch")


def _load(fullname, path):
    spec = ilu.spec_from_file_location(fullname, path)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    for pkg in ("cirtorch", "cirtorch.layers", "mdir", "mdir.tools",
                "refcrit"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    lv = _load("mdir.tools.loss_value",
               "/root/reference/mdir/tools/loss_value.py")
    sys.modules["mdir.tools"].loss_value = lv
    layers = os.path.join(_REF_EXT, "cirtorch", "layers")
    lf = _load("cirtorch.layers.functional",
               os.path.join(layers, "functional.py"))
    sys.modules["cirtorch.layers"].functional = lf
    closs = _load("cirtorch.layers.loss", os.path.join(layers, "loss.py"))
    sys.modules["cirtorch.layers"].loss = closs

    # the criterion package proper: compound_losses does `from .. import
    # criterion` (two levels), so give it a real parent package and pre-bind
    # the partially-initialized criterion module like normal import does
    parent = types.ModuleType("refoptim")
    parent.__path__ = [os.path.dirname(_CRIT)]
    sys.modules["refoptim"] = parent
    spec = ilu.spec_from_file_location(
        "refoptim.criterion", os.path.join(_CRIT, "__init__.py"),
        submodule_search_locations=[_CRIT])
    critmod = ilu.module_from_spec(spec)
    sys.modules["refoptim.criterion"] = critmod
    parent.criterion = critmod
    spec.loader.exec_module(critmod)
    return types.SimpleNamespace(comp=critmod.compound_losses,
                                 cirl=critmod.cirlosses, lv=lv)


def _total(v):
    """Reference losses return Tensor or TotalWithIntermediate (total +
    .partial dict, loss_value.py:36-53)."""
    if hasattr(v, "total"):
        return float(v.total), {k: float(x) for k, x in v.partial.items()}
    return float(v), {}


def _ours_total(v):
    if hasattr(v, "total"):
        return float(v.total), {k: float(x) for k, x in v.partial.items()}
    if isinstance(v, tuple):
        return float(v[0]), {k: float(x) for k, x in v[1].items()}
    return float(v), {}


@needs_reference
def test_discriminator_loss_fuzz(ref):
    rng = np.random.RandomState(0)
    for crit_name in ("mse", "bce_with_logits"):
        for _ in range(8):
            multiscale = rng.rand() < 0.5
            shapes = [(2, rng.randint(2, 8), rng.randint(2, 8), 1)
                      for _ in range(rng.randint(2, 4) if multiscale else 1)]
            outs = [rng.randn(*s).astype(np.float32) for s in shapes]
            is_real = bool(rng.rand() < 0.5)

            rl = ref.comp.DiscriminatorLoss({"loss": crit_name})
            t_out = [torch.from_numpy(o) for o in outs]
            want, want_partial = _total(
                rl(t_out if multiscale else t_out[0], is_real, "cpu"))

            crit = {"mse": L.mse_loss,
                    "bce_with_logits": L.bce_with_logits_loss}[crit_name]
            got, got_partial = L.discriminator_loss(
                [jnp.asarray(o) for o in outs] if multiscale
                else jnp.asarray(outs[0]), is_real, criterion=crit)
            np.testing.assert_allclose(float(got), want, rtol=1e-5,
                                       atol=1e-6, err_msg=crit_name)
            for k, v in want_partial.items():
                np.testing.assert_allclose(float(got_partial[k]), v,
                                           rtol=1e-5, atol=1e-6, err_msg=k)


@needs_reference
def test_patch_nce_fuzz(ref):
    rng = np.random.RandomState(1)
    for _ in range(10):
        b = rng.choice([1, 2, 4])
        per = rng.randint(2, 20)
        num = int(b) * per
        dim = rng.randint(4, 64)
        fq = rng.randn(num, dim).astype(np.float32)
        fk = rng.randn(num, dim).astype(np.float32)
        temp = float(rng.uniform(0.03, 0.3))

        rl = ref.comp.PatchNCELoss(batch_dim_for_bmm=int(b), temperature=temp)
        want = rl(torch.from_numpy(fq), torch.from_numpy(fk)).detach().numpy()
        got = np.asarray(L.patch_nce_loss(jnp.asarray(fq), jnp.asarray(fk),
                                          batch_dim_for_bmm=int(b),
                                          temperature=temp))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_reference
def test_multilayer_patch_nce_fuzz(ref):
    rng = np.random.RandomState(2)
    for _ in range(5):
        n_layers = rng.randint(1, 5)
        dim = rng.randint(4, 32)
        num = 2 * rng.randint(2, 10)
        weight = float(rng.uniform(0.5, 4.0))
        temp = float(rng.uniform(0.05, 0.2))
        fqs = [rng.randn(num, dim).astype(np.float32) for _ in range(n_layers)]
        fks = [rng.randn(num, dim).astype(np.float32) for _ in range(n_layers)]

        rl = ref.comp.MultilayerPatchNCELoss(
            batch_dim_for_bmm=2, nce_layers=",".join(
                str(i) for i in range(n_layers)),
            num_patches=num, temperature=temp, weight=weight)
        want, want_partial = _total(rl([torch.from_numpy(f) for f in fqs],
                                       [torch.from_numpy(f) for f in fks]))
        got, got_partial = _ours_total(L.multilayer_patch_nce_loss(
            [jnp.asarray(f) for f in fqs], [jnp.asarray(f) for f in fks],
            batch_dim_for_bmm=2, temperature=temp, weight=weight))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert len(got_partial) == len(want_partial)


@needs_reference
def test_multihead_and_combination_fuzz(ref):
    rng = np.random.RandomState(3)
    for _ in range(8):
        keys = ["h%d" % i for i in range(rng.randint(1, 4))]
        shapes = {k: (2, rng.randint(2, 6), 3) for k in keys}
        outs = {k: rng.randn(*shapes[k]).astype(np.float32) for k in keys}
        tgts = {k: rng.randn(*shapes[k]).astype(np.float32) for k in keys}
        scalar_w = rng.rand() < 0.5
        weights = (float(rng.uniform(0.5, 2.0)) if scalar_w else
                   {k: float(rng.uniform(0.5, 2.0)) for k in keys})
        normalize = bool(rng.rand() < 0.5)
        losses_cfg = {k: {"loss": "l1" if rng.rand() < 0.5 else "mse"}
                      for k in keys}

        import copy
        rl = ref.comp.MultiheadLoss(copy.deepcopy(weights), normalize,
                                    **copy.deepcopy(losses_cfg))
        want, want_partial = _total(rl(
            {k: torch.from_numpy(v) for k, v in outs.items()},
            {k: torch.from_numpy(v) for k, v in tgts.items()}))
        ours = C.MultiheadLoss(copy.deepcopy(weights), normalize,
                               **copy.deepcopy(losses_cfg))
        got, got_partial = _ours_total(ours(
            {k: jnp.asarray(v) for k, v in outs.items()},
            {k: jnp.asarray(v) for k, v in tgts.items()}))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        for k in want_partial:
            np.testing.assert_allclose(got_partial[k], want_partial[k],
                                       rtol=1e-5, atol=1e-6, err_msg=k)

        # CombinationLoss: every head applied to the SAME output/target
        x = rng.randn(2, 5, 3).astype(np.float32)
        t = rng.randn(2, 5, 3).astype(np.float32)
        rc = ref.comp.CombinationLoss(copy.deepcopy(weights), normalize,
                                      **copy.deepcopy(losses_cfg))
        want, _ = _total(rc(torch.from_numpy(x), torch.from_numpy(t)))
        oc = C.CombinationLoss(copy.deepcopy(weights), normalize,
                               **copy.deepcopy(losses_cfg))
        got, _ = _ours_total(oc(jnp.asarray(x), jnp.asarray(t)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@needs_reference
def test_contrastive_multidesc_fuzz(ref):
    rng = np.random.RandomState(4)
    for _ in range(8):
        d = rng.randint(4, 32)
        nq, s = rng.randint(1, 4), rng.randint(3, 7)
        n_desc = rng.randint(2, 4)
        xs = [rng.randn(d, nq * s).astype(np.float32) for _ in range(n_desc)]
        label = np.zeros(nq * s, np.float32)
        label[::s] = -1.0
        label[1::s] = 1.0
        margin = float(rng.uniform(0.3, 1.0))
        weights = (None if rng.rand() < 0.5 else
                   ",".join("%g" % rng.uniform(0.2, 2.0)
                            for _ in range(n_desc)))

        rl = ref.cirl.ContrastiveLossMultipleDescriptors(margin, weights)
        want, want_partial = _total(rl([torch.from_numpy(x) for x in xs],
                                       torch.from_numpy(label)))
        ours = C.ContrastiveLossMultipleDescriptors(margin=margin,
                                                    weights=weights)
        got, got_partial = _ours_total(ours([jnp.asarray(x) for x in xs],
                                            jnp.asarray(label),
                                            num_tuples=nq))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        for k in want_partial:
            np.testing.assert_allclose(got_partial[k], want_partial[k],
                                       rtol=1e-4, atol=1e-5, err_msg=k)


@needs_reference
def test_triplet_fuzz(ref):
    """Reference TripletLoss (cirlosses.py:48-58 over functional.py:160-173)
    gathers anchors/positives/negatives by LABEL MASK and pairs anchor i with
    its own S-2 negatives via repeat+view; ours assumes the TuplesDataset
    per-tuple [anchor, positive, negatives...] layout that every reference
    config produces. Fuzz both over that layout, incl. the list-label concat
    branch and sum reduction."""
    rng = np.random.RandomState(5)
    for _ in range(10):
        d = rng.randint(4, 64)
        nq, s = rng.randint(1, 5), rng.randint(3, 9)
        x = rng.randn(d, nq * s).astype(np.float32)
        label = np.zeros(nq * s, np.float32)
        label[::s] = -1.0
        label[1::s] = 1.0
        margin = float(rng.uniform(0.05, 0.5))

        rl = ref.cirl.TripletLoss(margin)
        if rng.rand() < 0.5:  # list-of-labels branch (cirlosses.py:55-57)
            parts = np.split(label, nq)
            want = float(rl(torch.from_numpy(x),
                            [torch.from_numpy(p) for p in parts]))
        else:
            want = float(rl(torch.from_numpy(x), torch.from_numpy(label)))

        got = float(L.triplet_loss(jnp.asarray(x), jnp.asarray(label),
                                   num_tuples=nq, margin=margin))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        crit = C.initialize_criterion({"loss": "triplet", "margin": margin})
        got2, _ = _ours_total(crit(jnp.asarray(x), jnp.asarray(label),
                                   num_tuples=nq))
        np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-5)
