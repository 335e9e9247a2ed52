"""Golden one-step parity: our jitted CycleGAN train step vs a torch oracle.

First step: the 50-image pools are still filling, so pool queries return their
inputs (gan_image_pool.py:50-55) and the oracle needs no pool emulation. Covers
the joint G_X/G_Y backward through the shared cycle graph, the D updates on
pooled fakes, and torch-Adam equivalence.
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.learning.image_pool import init_pool
from gandtr_tpu.utils import torch_import as ti

from test_models_parity import (build_torch_resnet_generator,
                                build_torch_discriminator, seq_state)


def torch_cyclegan_step(GX, GY, DX, DY, real_X, real_Y, w_adv=1.0, w_cyc=10.0,
                        lr=2e-4):
    """Reference CycleGAN step (gan_epochs.py:61-140), pools pass-through."""
    opts = {m: torch.optim.Adam(m.parameters(), lr=lr, betas=(0.5, 0.999))
            for m in (GX, GY, DX, DY)}

    fake_Y = GX(real_X)
    rec_X = GY(fake_Y)
    fake_X = GY(real_Y)
    rec_Y = GX(fake_X)

    # (1) joint generators step
    for m in (GX, GY):
        opts[m].zero_grad()
    pred_fake_Y = DX(fake_Y)
    pred_fake_X = DY(fake_X)
    loss_GX = w_adv * F.mse_loss(pred_fake_Y, torch.zeros_like(pred_fake_Y)) \
        + w_cyc * F.l1_loss(rec_X, real_X)
    loss_GY = w_adv * F.mse_loss(pred_fake_X, torch.zeros_like(pred_fake_X)) \
        + w_cyc * F.l1_loss(rec_Y, real_Y)
    loss_GX.backward(retain_graph=True)
    loss_GY.backward()
    opts[GX].step()
    opts[GY].step()

    # (2) D steps with (pass-through) pooled fakes
    def d_step(D, real, fake):
        opts[D].zero_grad()
        pr = D(real)
        pf = D(fake.detach())
        lr_ = F.mse_loss(pr, torch.zeros_like(pr))
        lf_ = F.mse_loss(pf, torch.ones_like(pf))
        loss = (lr_ + lf_) * 0.5
        loss.backward()
        opts[D].step()
        return loss.item()

    dx = d_step(DX, real_Y, fake_Y)
    dy = d_step(DY, real_X, fake_X)
    return {"netG_X_total": loss_GX.item(), "netG_Y_total": loss_GY.item(),
            "netD_X_total": dx, "netD_Y_total": dy}


def test_cyclegan_one_step_matches_torch():
    torch.manual_seed(0)
    tGX = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
    tGY = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
    tDX = build_torch_discriminator(ndf=8, n_layers=2, norm="instance")
    tDY = build_torch_discriminator(ndf=8, n_layers=2, norm="instance")

    gen_cfg = {"model": {"architecture": "official_resnet_generator", "ngf": 8,
                         "n_blocks": 1, "norm_layer": "instance"},
               "runtime": {"wrappers": "", "data": {}}}
    disc_cfg = {"model": {"architecture": "official_p2p_discriminator",
                          "ndf": 8, "n_layers": 2, "norm_layer": "instance"},
                "runtime": {"wrappers": "", "data": {}}}
    ms, _ = build_model_set({"type": "NetworkSet",
                             "generator_X": dict(gen_cfg),
                             "generator_Y": dict(gen_cfg),
                             "discriminator_X": dict(disc_cfg),
                             "discriminator_Y": dict(disc_cfg)})
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    for name, tm in (("generator_X", tGX), ("generator_Y", tGY),
                     ("discriminator_X", tDX), ("discriminator_Y", tDY)):
        variables[name] = ti.convert_torch_state(variables[name], seq_state(tm))

    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999}
    optimizers = {n: initialize_optimizer(dict(adam))[0] for n in ms.nets}
    pools = {"fake_X_pool": init_pool(8, (32, 32, 3)),
             "fake_Y_pool": init_pool(8, (32, 32, 3))}
    state = gan_steps.make_gan_state(variables, optimizers, pools)
    step = jax.jit(gan_steps.build_cyclegan_step(
        ms.nets, optimizers, {"adversarial": 1, "cycle": 10},
        {"adversarial": 1, "cycle": 10}))

    torch.manual_seed(1)
    real_X = torch.rand(2, 3, 32, 32) * 2 - 1
    real_Y = torch.rand(2, 3, 32, 32) * 2 - 1
    jX = jnp.asarray(real_X.numpy().transpose(0, 2, 3, 1))
    jY = jnp.asarray(real_Y.numpy().transpose(0, 2, 3, 1))

    new_state, metrics, _ = step(state, jX, jY)
    ref = torch_cyclegan_step(tGX, tGY, tDX, tDY, real_X, real_Y)

    for k in ("netG_X_total", "netG_Y_total", "netD_X_total", "netD_Y_total"):
        np.testing.assert_allclose(float(metrics[k]), ref[k],
                                   rtol=3e-3, atol=3e-4), k

    # joint-backward shared-graph gradients: generator weights updated to match
    ours = new_state.variables["generator_Y"]["params"]
    theirs = ti.convert_torch_state(
        {"params": new_state.variables["generator_Y"]["params"]},
        seq_state(tGY))["params"]
    a = np.asarray(ours["model_1"]["conv"]["kernel"])
    b = np.asarray(theirs["model_1"]["conv"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)
