"""Configurable criterion registry (learning/criteria.py) vs the reference's
optim/criterion semantics (torch oracles where the math is nontrivial)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from gandtr_tpu.learning import criteria as C
from gandtr_tpu.ops import losses as L


def test_registry_keys_match_reference():
    # criterion/__init__.py:4-18
    assert set(C.CRITERIA) == {
        "l1", "mse", "bce", "bce_with_logits", "contrastive",
        "contrastive_multidesc", "triplet", "cycle_loss",
        "discriminator_loss", "loss_set", "multihead_loss",
        "combination_loss", "multilayer_patchnce_loss"}


def test_base_losses_vs_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7).astype(np.float32)
    t = rng.rand(4, 7).astype(np.float32)
    np.testing.assert_allclose(
        C.initialize_criterion({"loss": "l1"})(jnp.asarray(x), jnp.asarray(t)),
        torch.nn.L1Loss()(torch.tensor(x), torch.tensor(t)).numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        C.initialize_criterion({"loss": "mse"})(jnp.asarray(x), jnp.asarray(t)),
        torch.nn.MSELoss()(torch.tensor(x), torch.tensor(t)).numpy(), rtol=1e-6)
    p = 1 / (1 + np.exp(-x))
    np.testing.assert_allclose(
        C.initialize_criterion({"loss": "bce"})(jnp.asarray(p), jnp.asarray(t)),
        torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t)).numpy(),
        rtol=1e-5)
    np.testing.assert_allclose(
        C.initialize_criterion({"loss": "bce_with_logits",
                                "pos_weight": 2.5})(jnp.asarray(x),
                                                    jnp.asarray(t)),
        torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([2.5]))(
            torch.tensor(x), torch.tensor(t)).numpy(), rtol=1e-5)


def test_bce_detaches_target():
    # base_losses.py:22-23: gradient must not flow into the target
    crit = C.initialize_criterion({"loss": "bce"})
    p = jnp.asarray([0.3, 0.8])
    g = jax.grad(lambda t: crit(p, t))(jnp.asarray([0.5, 0.5]))
    assert np.all(np.asarray(g) == 0.0)


def test_contrastive_label_concat_matches_plain():
    rng = np.random.RandomState(1)
    d = rng.randn(8, 6).astype(np.float32)
    d = d / np.linalg.norm(d, axis=0, keepdims=True)
    lbl = np.array([-1, 1, 0, 0, 0, 0], np.float32)
    crit = C.initialize_criterion({"loss": "contrastive", "margin": 0.7})
    a = crit(jnp.asarray(d), jnp.asarray(lbl))
    b = crit(jnp.asarray(d), [jnp.asarray(lbl[:3]), jnp.asarray(lbl[3:])])
    np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(
        a, L.contrastive_loss(jnp.asarray(d), jnp.asarray(lbl), 1, 0.7))


def test_contrastive_multidesc_weights():
    rng = np.random.RandomState(2)
    d1 = rng.randn(8, 6).astype(np.float32)
    d2 = rng.randn(8, 6).astype(np.float32)
    lbl = jnp.asarray([-1, 1, 0, 0, 0, 0], jnp.float32)
    crit = C.initialize_criterion({"loss": "contrastive_multidesc",
                                   "margin": 0.7, "weights": "0.25,0.75"})
    out = crit([jnp.asarray(d1), jnp.asarray(d2)], lbl)
    base = C.ContrastiveLoss(margin=0.7)
    l1 = base(jnp.asarray(d1), lbl)
    l2 = base(jnp.asarray(d2), lbl)
    np.testing.assert_allclose(out.total, 0.25 * l1 + 0.75 * l2, rtol=1e-6)
    np.testing.assert_allclose(out.partial["0"], l1)
    # single-matrix input falls back to the plain loss (cirlosses.py:32-34)
    np.testing.assert_allclose(crit(jnp.asarray(d1), lbl), l1)


def test_discriminator_loss_multiscale_layer_keys():
    rng = np.random.RandomState(3)
    outs = [jnp.asarray(rng.randn(2, 5, 5, 1).astype(np.float32))
            for _ in range(3)]
    crit = C.initialize_criterion(
        {"loss": "discriminator_loss", "criterion": {"loss": "mse"}})
    res = crit(outs, True)
    # end-counted keys (compound_losses.py:37-39)
    assert set(res.partial) == {"layer0", "layer1", "layer2"}
    # real -> target 0 (inverted, :47-50)
    np.testing.assert_allclose(res.partial["layer2"],
                               jnp.mean(outs[0] ** 2), rtol=1e-6)
    np.testing.assert_allclose(
        res.total, sum(jnp.mean(o ** 2) for o in outs), rtol=1e-6)
    single = crit(outs[0], False)
    np.testing.assert_allclose(single.total,
                               jnp.mean((outs[0] - 1.0) ** 2), rtol=1e-6)


def test_multihead_and_combination_losses():
    rng = np.random.RandomState(4)
    oa = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    ob = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    ta = jnp.zeros((3, 4), jnp.float32)
    tb = jnp.ones((3, 4), jnp.float32)
    crit = C.initialize_criterion({
        "loss": "multihead_loss", "weights": {"a": 2.0, "b": 1.0},
        "normalize_weights": True,
        "a": {"loss": "mse"}, "b": {"loss": "l1"}})
    res = crit({"a": oa, "b": ob}, {"a": ta, "b": tb})
    exp = (2 / 3) * jnp.mean(oa ** 2) + (1 / 3) * jnp.mean(jnp.abs(ob - tb))
    np.testing.assert_allclose(res.total, exp, rtol=1e-6)

    comb = C.initialize_criterion({
        "loss": "combination_loss", "weights": 1.0,
        "normalize_weights": False,
        "m": {"loss": "mse"}, "l": {"loss": "l1"}})
    res2 = comb(oa, ta)
    np.testing.assert_allclose(
        res2.total, jnp.mean(oa ** 2) + jnp.mean(jnp.abs(oa)), rtol=1e-6)

    with pytest.raises(AssertionError):
        C.initialize_criterion({
            "loss": "multihead_loss", "weights": {"a": 1.0},
            "normalize_weights": False,
            "a": {"loss": "mse"}, "b": {"loss": "l1"}})


def test_multilayer_patchnce_vs_ops():
    rng = np.random.RandomState(5)
    fq = [jnp.asarray(rng.randn(12, 16).astype(np.float32))
          for _ in range(2)]
    fk = [jnp.asarray(rng.randn(12, 16).astype(np.float32))
          for _ in range(2)]
    crit = C.initialize_criterion({
        "loss": "multilayer_patchnce_loss", "batch_dim_for_bmm": 1,
        "nce_layers": "0,4", "num_patches": 12, "temperature": 0.07,
        "weight": 0.5})
    res = crit(fq, fk)
    exp = sum(jnp.mean(L.patch_nce_loss(q, k, 1, 0.07)) * 0.5
              for q, k in zip(fq, fk)) / 2
    np.testing.assert_allclose(res.total, exp, rtol=1e-6)
    assert set(res.partial) == {"layer0", "layer4"}


def test_loss_set_and_cycle_loss_are_containers():
    ls = C.initialize_criterion({"loss": "loss_set",
                                 "adv": {"loss": "mse"},
                                 "rec": {"loss": "l1"}})
    assert ls.loss_names == {"adv", "rec"}
    assert isinstance(ls.adv, C.MSELoss)
    with pytest.raises(NotImplementedError):
        ls()
    cyc = C.initialize_criterion({
        "loss": "cycle_loss",
        "loss_G_X": {"loss": "mse"}, "loss_G_Y": {"loss": "mse"},
        "loss_D_X": {"loss": "mse"}, "loss_D_Y": {"loss": "l1"}})
    assert isinstance(cyc.loss_D_Y, C.L1Loss)
    with pytest.raises(NotImplementedError):
        cyc()


def test_total_with_intermediate_pytree_and_arith():
    t = C.TotalWithIntermediate(jnp.asarray(2.0), a=jnp.asarray(1.0),
                                b=C.TotalWithIntermediate(jnp.asarray(3.0),
                                                          c=jnp.asarray(3.0)))
    # nested flattening keeps the parent total too (loss_value.py:57-65)
    assert set(t.partial) == {"a", "b", "b.c"}
    np.testing.assert_allclose(t.partial["b"], 3.0)
    s = C.ZERO + t
    assert s is t
    doubled = t * 2.0
    np.testing.assert_allclose(doubled.total, 4.0)
    np.testing.assert_allclose(doubled.partial["a"], 2.0)  # scalar scales all
    # pytree round-trip through jit
    out = jax.jit(lambda v: v * 2.0)(t)
    np.testing.assert_allclose(out.total, 4.0)
    np.testing.assert_allclose(out.partial["a"], 2.0)
    d = t.as_dict("loss")
    assert set(d) == {"loss", "loss/a", "loss/b", "loss/b.c"}
    fp = C.TotalWithIntermediate.from_partial(x=jnp.asarray(1.0),
                                              y=jnp.asarray(2.0))
    np.testing.assert_allclose(fp.total, 3.0)
    # + requires matching keys (loss_value.py:85-88)
    summed = fp + fp
    np.testing.assert_allclose(summed.total, 6.0)
    np.testing.assert_allclose(summed.partial["x"], 2.0)


def test_finetune_step_accepts_triplet_criterion():
    # build_finetune_step(criterion=...) routes tuples through the registry
    from gandtr_tpu.learning import supervised
    from gandtr_tpu.learning.network import build_single_net
    import optax

    model = build_single_net({
        "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                  "pooling": "gem", "local_whitening": False,
                  "whitening": False},
        "runtime": {"wrappers": "", "data": {}}})
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32, 3),
                       jnp.float32)
    var = dict(model.init(jax.random.PRNGKey(0), imgs[0]))
    opt = optax.sgd(1e-3)
    variables = {"embed": var}
    state = supervised.make_finetune_state(variables, opt)
    crit = C.initialize_criterion({"loss": "triplet", "margin": 0.1})
    step = jax.jit(supervised.build_finetune_step(
        {"embed": model}, opt, criterion=crit, fakebatch=False))
    lbls = jnp.asarray([[-1, 1, 0], [-1, 1, 0]], jnp.float32)
    pmask = jnp.zeros((2, 3), bool)
    state2, metrics = step(state, imgs, jnp.ones((2, 3, 32, 32)), lbls, pmask)
    assert np.isfinite(float(metrics["total"]))
