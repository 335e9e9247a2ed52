"""Golden one-step parity: our jitted HED-GAN train step vs a torch oracle.

Same weights (imported), same batch, one optimization step: losses and updated
parameters must match. This pins the full training semantics — forward parity,
the inverted adversarial targets, D-then-G ordering, BN batch-stat updates,
and torch-Adam equivalence — in one end-to-end check (SURVEY.md §7.6 oracle).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.utils import torch_import as ti

from test_models_parity import (build_torch_resnet_generator,
                                build_torch_discriminator, TorchHed, seq_state)


def build_torch_hed_small():
    """Width-scaled torch HED matching width_mult=0.0625."""
    class Small(tnn.Module):
        def __init__(self):
            super().__init__()
            widths = [(3, [4, 4]), (4, [8, 8]), (8, [16, 16, 16]),
                      (16, [32, 32, 32]), (32, [32, 32, 32])]
            for bi, (cin, ws) in enumerate(widths, 1):
                acc = [] if bi == 1 else [tnn.MaxPool2d(2, 2)]
                c = cin
                for w in ws:
                    acc += [tnn.Conv2d(c, w, 3, padding=1), tnn.ReLU(True)]
                    c = w
                setattr(self, f"vgg{bi}", tnn.Sequential(*acc))
                setattr(self, f"score{bi}", tnn.Conv2d(c, 1, 1))
            self.fusion = tnn.Sequential(tnn.Conv2d(5, 1, 1))

        def forward(self, x, no_sigmoid=False):
            feats = []
            h = x
            for i in range(1, 6):
                h = getattr(self, f"vgg{i}")(h)
                s = getattr(self, f"score{i}")(h)
                feats.append(F.interpolate(s, size=x.shape[2:], mode="bilinear",
                                           align_corners=False))
            out = self.fusion(torch.cat(feats, 1))
            return out if no_sigmoid else torch.sigmoid(out)
    return Small()


def torch_hedgan_step(G, D, H, real_X, real_Y, w_adv=1.0, w_edge=5.0, lr=2e-4):
    """Reference HED-GAN step in torch (edges_epochs.py:8-54 semantics)."""
    optG = torch.optim.Adam(G.parameters(), lr=lr, betas=(0.5, 0.999))
    optD = torch.optim.Adam(D.parameters(), lr=lr, betas=(0.5, 0.999))

    fake_Y = G(real_X)

    # (1) D step — real→0 target convention (compound_losses.py:47-50)
    optD.zero_grad()
    pred_real = D(real_Y)
    pred_fake = D(fake_Y.detach())
    d_real = w_adv * F.mse_loss(pred_real, torch.zeros_like(pred_real))
    d_fake = w_adv * F.mse_loss(pred_fake, torch.ones_like(pred_fake))
    d_loss = (d_real + d_fake) * 0.5
    d_loss.backward()
    optD.step()

    # (2) G step against updated D
    optG.zero_grad()
    fake_Y2 = G(real_X)
    pred_fake2 = D(fake_Y2)
    fake_E = H(fake_Y2)
    with torch.no_grad():
        real_E = H(real_X)
    g_gan = w_adv * F.mse_loss(pred_fake2, torch.zeros_like(pred_fake2))
    g_hed = w_edge * F.l1_loss(fake_E, real_E)
    g_loss = g_gan + g_hed
    g_loss.backward()
    optG.step()

    return {"D_real": d_real.item(), "D_fake": d_fake.item(),
            "G_gan": g_gan.item(), "G_hed": g_hed.item()}


def test_hedgan_one_step_matches_torch():
    torch.manual_seed(0)
    tG = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
    tD = build_torch_discriminator(ndf=8, n_layers=2, norm="instance").train()
    tH = build_torch_hed_small().eval()

    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture": "official_resnet_generator",
                                     "ngf": 8, "n_blocks": 1,
                                     "norm_layer": "instance"},
                           "runtime": {"wrappers": "", "data": {}}},
           "discriminator_Y": {"model": {"architecture": "official_p2p_discriminator",
                                         "ndf": 8, "n_layers": 2,
                                         "norm_layer": "instance"},
                               "runtime": {"wrappers": "", "data": {}}},
           "detector": {"model": {"architecture": "hed_interpolation",
                                  "width_mult": 0.0625},
                        "runtime": {"wrappers": "", "data": {}}}}
    ms, _ = build_model_set(cfg)
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    variables["generator_X"] = ti.convert_torch_state(
        variables["generator_X"], seq_state(tG))
    variables["discriminator_Y"] = ti.convert_torch_state(
        variables["discriminator_Y"], seq_state(tD))
    variables["detector"] = ti.convert_torch_state(
        variables["detector"], ti.torch_state_to_numpy(tH.state_dict()),
        key_map=ti.hed_key_map)

    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y")}
    state = gan_steps.make_gan_state(variables, optimizers)
    step = jax.jit(gan_steps.build_hedgan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5}))

    torch.manual_seed(1)
    real_X = torch.rand(2, 3, 32, 32) * 2 - 1
    real_Y = torch.rand(2, 3, 32, 32) * 2 - 1
    jX = jnp.asarray(real_X.numpy().transpose(0, 2, 3, 1))
    jY = jnp.asarray(real_Y.numpy().transpose(0, 2, 3, 1))

    new_state, metrics, _ = step(state, jX, jY)
    ref_metrics = torch_hedgan_step(tG, tD, tH, real_X, real_Y)

    for k in ("D_real", "D_fake", "G_gan", "G_hed"):
        np.testing.assert_allclose(float(metrics[k]), ref_metrics[k],
                                   rtol=2e-3, atol=2e-4), k

    # updated generator weights match torch's post-Adam weights
    tstate = seq_state(tG)
    ours = new_state.variables["generator_X"]["params"]
    theirs = ti.convert_torch_state(
        {"params": state.variables["generator_X"]["params"]}, tstate)["params"]
    for path in (("model_1", "conv", "kernel"), ("model_18", "conv", "bias")):
        a = ours
        b = theirs
        for p in path:
            a, b = a[p], b[p]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def torch_hedngan_step(G, D, Hs, Ht, real_X, real_Y, w_adv=1.0, w_edge=5.0,
                       w_hed=1.0, lr=2e-4):
    """Reference HED^N-GAN step in torch (edges_epochs.py:61-121 semantics):
    D step, student-detector distillation from the frozen teacher
    (pre-sigmoid), then G step against updated D and student."""
    optG = torch.optim.Adam(G.parameters(), lr=lr, betas=(0.5, 0.999))
    optD = torch.optim.Adam(D.parameters(), lr=lr, betas=(0.5, 0.999))
    optE = torch.optim.Adam(Hs.parameters(), lr=lr, betas=(0.5, 0.999))

    fake_Y = G(real_X)

    # (1) D step — real→0 target convention
    optD.zero_grad()
    pred_real = D(real_Y)
    pred_fake = D(fake_Y.detach())
    d_real = w_adv * F.mse_loss(pred_real, torch.zeros_like(pred_real))
    d_fake = w_adv * F.mse_loss(pred_fake, torch.ones_like(pred_fake))
    ((d_real + d_fake) * 0.5).backward()
    optD.step()

    # (2) detector distillation (pre-sigmoid, edges_epochs.py:105-121)
    optE.zero_grad()
    with torch.no_grad():
        target_M = Ht(real_X, no_sigmoid=True)
    real_M = Hs(real_X, no_sigmoid=True)
    fake_M = Hs(fake_Y.detach(), no_sigmoid=True)
    e_real = w_hed * F.l1_loss(real_M, target_M)
    e_fake = w_hed * F.l1_loss(fake_M, target_M)
    (e_real + e_fake).backward()
    optE.step()

    # (3) G step: updated D + updated student, teacher real_E
    optG.zero_grad()
    fake_E = Hs(fake_Y)
    with torch.no_grad():
        real_E = Ht(real_X)
    pred_fake2 = D(fake_Y)
    g_gan = w_adv * F.mse_loss(pred_fake2, torch.zeros_like(pred_fake2))
    g_hed = w_edge * F.l1_loss(fake_E, real_E)
    (g_gan + g_hed).backward()
    optG.step()

    return {"D_real": d_real.item(), "D_fake": d_fake.item(),
            "G_gan": g_gan.item(), "G_hed": g_hed.item(),
            "E_real": e_real.item(), "E_fake": e_fake.item()}


def test_hedngan_one_step_matches_torch():
    import copy
    torch.manual_seed(2)
    tG = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
    tD = build_torch_discriminator(ndf=8, n_layers=2, norm="instance").train()
    tHs = build_torch_hed_small().eval()
    tHt = copy.deepcopy(tHs)  # the reference loads one checkpoint into both

    hed_cfg = {"model": {"architecture": "hed_interpolation",
                         "width_mult": 0.0625},
               "runtime": {"wrappers": "", "data": {}}}
    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture": "official_resnet_generator",
                                     "ngf": 8, "n_blocks": 1,
                                     "norm_layer": "instance"},
                           "runtime": {"wrappers": "", "data": {}}},
           "discriminator_Y": {"model": {"architecture": "official_p2p_discriminator",
                                         "ndf": 8, "n_layers": 2,
                                         "norm_layer": "instance"},
                               "runtime": {"wrappers": "", "data": {}}},
           "detector": dict(hed_cfg),
           "detector_frozen": {**hed_cfg,
                               "runtime": {"frozen": True, "wrappers": "",
                                           "data": {}}}}
    ms, _ = build_model_set(cfg)
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    variables["generator_X"] = ti.convert_torch_state(
        variables["generator_X"], seq_state(tG))
    variables["discriminator_Y"] = ti.convert_torch_state(
        variables["discriminator_Y"], seq_state(tD))
    hstate = ti.torch_state_to_numpy(tHs.state_dict())
    variables["detector"] = ti.convert_torch_state(
        variables["detector"], hstate, key_map=ti.hed_key_map)
    variables["detector_frozen"] = ti.convert_torch_state(
        variables["detector_frozen"], hstate, key_map=ti.hed_key_map)

    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y", "detector")}
    state = gan_steps.make_gan_state(variables, optimizers)
    step = jax.jit(gan_steps.build_hedngan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5, "hed": 1}))

    torch.manual_seed(3)
    real_X = torch.rand(2, 3, 32, 32) * 2 - 1
    real_Y = torch.rand(2, 3, 32, 32) * 2 - 1
    jX = jnp.asarray(real_X.numpy().transpose(0, 2, 3, 1))
    jY = jnp.asarray(real_Y.numpy().transpose(0, 2, 3, 1))

    new_state, metrics, _ = step(state, jX, jY)
    # snapshot BEFORE the torch oracle runs: on CPU jnp.asarray may alias the
    # torch-backed numpy views, and torch's in-place Adam step would mutate
    # the "pre-step" jax arrays under us
    teacher_before = [np.array(x, copy=True) for x in jax.tree_util.tree_leaves(
        state.variables["detector_frozen"]["params"])]
    ref = torch_hedngan_step(tG, tD, tHs, tHt, real_X, real_Y)

    for k in ("D_real", "D_fake", "G_gan", "G_hed", "E_real", "E_fake"):
        np.testing.assert_allclose(float(metrics[k]), ref[k],
                                   rtol=2e-3, atol=2e-4), k

    # post-Adam weights: generator AND distilled student match torch
    tstate = seq_state(tG)
    ours = new_state.variables["generator_X"]["params"]
    theirs = ti.convert_torch_state(
        {"params": state.variables["generator_X"]["params"]}, tstate)["params"]
    for path in (("model_1", "conv", "kernel"), ("model_18", "conv", "bias")):
        a, b = ours, theirs
        for p in path:
            a, b = a[p], b[p]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
    hs_after = ti.convert_torch_state(
        {"params": state.variables["detector"]["params"]},
        ti.torch_state_to_numpy(tHs.state_dict()),
        key_map=ti.hed_key_map)["params"]
    a = new_state.variables["detector"]["params"]
    for key in ("fusion",):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(a[key])[0]),
            np.asarray(jax.tree_util.tree_leaves(hs_after[key])[0]),
            rtol=5e-3, atol=5e-5)
    # frozen teacher untouched
    for x, y in zip(
            teacher_before,
            jax.tree_util.tree_leaves(new_state.variables["detector_frozen"]["params"])):
        np.testing.assert_array_equal(x, np.asarray(y))
