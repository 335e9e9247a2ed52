"""Multi-step golden trajectories vs torch oracles.

One-step parity (test_*_golden.py) cannot catch compounding drift: Adam
moment evolution, BN running-stat drift across steps, scheduler boundaries,
and image-pool state evolution only reveal errors over several optimization
steps. These tests run 6-8 steps with persistent optimizers, a lambda_p2p
scheduler boundary mid-run, and batch-norm discriminators, asserting losses
at every step and final weights. Reference semantics:
/root/reference/mdir/learning/epoch_iteration/gan_epochs.py:61-140,
edges_epochs.py:61-121, base_schedulers.py:28-45, gan_image_pool.py:15-65.
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import (initialize_optimizer,
                                            param_group_mults)
from gandtr_tpu.learning.training import set_epoch_lr
from gandtr_tpu.learning.schedules import lambda_p2p_schedule
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.learning.image_pool import init_pool, pool_query
from gandtr_tpu.utils import torch_import as ti

from test_models_parity import (build_torch_resnet_generator,
                                build_torch_discriminator, seq_state)
from test_gan_step_golden import build_torch_hed_small

LR = 2e-4
NEPOCHS, DECAY = 4, 2  # lambda_p2p: factors 1, 1, 2/3, 1/3
STEPS_PER_EPOCH = 2


def _set_torch_lr(opts, lr):
    for opt in opts:
        for g in opt.param_groups:
            g["lr"] = lr


def _batches(seed, n, batch=2, hw=32):
    torch.manual_seed(seed)
    return [(torch.rand(batch, 3, hw, hw) * 2 - 1,
             torch.rand(batch, 3, hw, hw) * 2 - 1) for _ in range(n)]


def _j(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def _hed_torch_param_groups(model, lr, weight_decay):
    """Torch param groups exactly like the reference's HED parameter_groups
    (hed.py:86-112): lr_mult/decay_mult tables keyed by layer family."""
    from collections import defaultdict
    lr_mult = {"conv.weight": 1, "conv.bias": 2, "conv5.weight": 100,
               "conv5.bias": 200, "score.weight": 0.01, "score.bias": 0.02,
               "fusion.weight": 0.001, "fusion.bias": 0.002}
    decay_mult = {"conv.weight": 1, "conv.bias": 0, "conv5.weight": 1,
                  "conv5.bias": 0, "score.weight": 1, "score.bias": 0,
                  "fusion.weight": 1, "fusion.bias": 0}
    groups = defaultdict(list)
    for name, param in model.named_parameters():
        parts = name.split(".")
        if parts[0] in {"vgg1", "vgg2", "vgg3", "vgg4"}:
            key = "conv.%s" % parts[2]
        elif parts[0] == "vgg5":
            key = "conv5.%s" % parts[2]
        elif parts[0].startswith("score"):
            key = "score.%s" % parts[1]
        elif parts[0] == "fusion":
            key = "fusion.%s" % parts[2]
        else:
            raise KeyError(name)
        groups[key].append(param)
    return [{"params": ps, "lr": lr_mult[k] * lr,
             "weight_decay": decay_mult[k] * weight_decay}
            for k, ps in groups.items()]


class TestHedNGanTrajectory:
    def test_eight_steps_bn_discriminator_scheduler(self):
        import copy
        torch.manual_seed(10)
        tG = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
        tD = build_torch_discriminator(ndf=8, n_layers=2, norm="batch").train()
        tHs = build_torch_hed_small().eval()
        tHt = copy.deepcopy(tHs)

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
                                             "norm_layer": "batch"},
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
        for n in ("detector", "detector_frozen"):
            variables[n] = ti.convert_torch_state(variables[n], hstate,
                                                  key_map=ti.hed_key_map)

        adam = {"algorithm": "adam", "lr": LR, "beta1": 0.5, "beta2": 0.999}
        # the detector trains through the reference's HED parameter groups
        # (hed.py:86-112 via network.py:66-72): per-layer lr multipliers and
        # bias decay 0 — with train_hedngan.yml:103-108's actual detector
        # hyperparams (lr 1e-6, beta1 0.9, wd 2e-4; conv5 at lr x100)
        det_lr, det_wd = 1e-6, 2e-4
        optimizers = {n: initialize_optimizer(dict(adam))[0]
                      for n in ("generator_X", "discriminator_Y")}
        optimizers["detector"] = initialize_optimizer(
            {"algorithm": "adam", "lr": det_lr, "beta1": 0.9,
             "beta2": 0.999, "weight_decay": det_wd},
            group_mults=param_group_mults(
                "hed_interpolation", variables["detector"]["params"]))[0]
        state = gan_steps.make_gan_state(variables, optimizers)
        step = jax.jit(gan_steps.build_hedngan_step(
            ms.nets, optimizers, {"adversarial": 1, "edge": 5, "hed": 1}))

        # torch oracle: persistent optimizers + LambdaLR (p2p rule)
        optG = torch.optim.Adam(tG.parameters(), lr=LR, betas=(0.5, 0.999))
        optD = torch.optim.Adam(tD.parameters(), lr=LR, betas=(0.5, 0.999))
        optE = torch.optim.Adam(_hed_torch_param_groups(tHs, det_lr, det_wd),
                                lr=det_lr, betas=(0.9, 0.999),
                                weight_decay=det_wd)
        n_fix = NEPOCHS - DECAY
        rule = lambda e: 1.0 - max(0, e + 1 - n_fix) / float(DECAY + 1)
        scheds = [torch.optim.lr_scheduler.LambdaLR(o, lr_lambda=rule)
                  for o in (optG, optD, optE)]
        factor = lambda_p2p_schedule(NEPOCHS, DECAY)

        data = _batches(11, NEPOCHS * STEPS_PER_EPOCH)
        it = 0
        for epoch in range(NEPOCHS):
            # During epoch e torch LambdaLR holds lr = LR * rule(e) (rule(0)
            # at init, rule(e) after e scheduler.step() calls); our injected
            # factor must agree with the torch optimizer's actual lr.
            np.testing.assert_allclose(optG.param_groups[0]["lr"],
                                       LR * factor(epoch), rtol=1e-9)
            opt_states = dict(state.opt_states)
            for n in opt_states:
                base = det_lr if n == "detector" else LR
                opt_states[n] = set_epoch_lr(opt_states[n], base,
                                             factor(epoch))
            state = state.replace(opt_states=opt_states)

            for _ in range(STEPS_PER_EPOCH):
                real_X, real_Y = data[it]
                it += 1
                state, metrics, _ = step(state, _j(real_X), _j(real_Y))

                # --- torch step (edges_epochs.py:61-121)
                fake_Y = tG(real_X)
                optD.zero_grad()
                pred_real = tD(real_Y)
                pred_fake = tD(fake_Y.detach())
                d_real = F.mse_loss(pred_real, torch.zeros_like(pred_real))
                d_fake = F.mse_loss(pred_fake, torch.ones_like(pred_fake))
                ((d_real + d_fake) * 0.5).backward()
                optD.step()

                optE.zero_grad()
                with torch.no_grad():
                    target_M = tHt(real_X, no_sigmoid=True)
                real_M = tHs(real_X, no_sigmoid=True)
                fake_M = tHs(fake_Y.detach(), no_sigmoid=True)
                e_real = F.l1_loss(real_M, target_M)
                e_fake = F.l1_loss(fake_M, target_M)
                (e_real + e_fake).backward()
                optE.step()

                optG.zero_grad()
                fake_E = tHs(fake_Y)
                with torch.no_grad():
                    real_E = tHt(real_X)
                pred_fake2 = tD(fake_Y)
                g_gan = F.mse_loss(pred_fake2, torch.zeros_like(pred_fake2))
                g_hed = 5.0 * F.l1_loss(fake_E, real_E)
                (g_gan + g_hed).backward()
                optG.step()

                ref = {"D_real": d_real.item(), "D_fake": d_fake.item(),
                       "G_gan": g_gan.item(), "G_hed": g_hed.item(),
                       "E_real": e_real.item(), "E_fake": e_fake.item()}
                for k, v in ref.items():
                    np.testing.assert_allclose(
                        float(metrics[k]), v, rtol=2e-2, atol=2e-3,
                        err_msg=f"step {it} {k}")
            for s in scheds:
                s.step()

        # final weights: generator + BN running stats of the discriminator
        theirs = ti.convert_torch_state(
            {"params": state.variables["generator_X"]["params"]},
            seq_state(tG))["params"]
        a = np.asarray(
            state.variables["generator_X"]["params"]["model_1"]["conv"]["kernel"])
        b = np.asarray(theirs["model_1"]["conv"]["kernel"])
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-4)

        td = ti.convert_torch_state(
            {k: v for k, v in state.variables["discriminator_Y"].items()},
            seq_state(tD))
        ours_bs = state.variables["discriminator_Y"]["batch_stats"]
        for path in (("model_3", "mean"), ("model_3", "var")):
            x = ours_bs
            y = td["batch_stats"]
            for p in path:
                x, y = x[p], y[p]
            # atol 5e-4: running means of near-zero channels accumulate f32
            # conv-backend noise over 8 coupled G/D/E steps
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-2, atol=5e-4,
                                       err_msg=str(path))

        # detector weights through the parameter groups: conv5 trains at
        # lr x100 (8 steps x 1e-4 adam steps => ~1e-3 element motion), vgg1
        # bias at x2 — a group mix-up moves these by orders of magnitude
        th = ti.convert_torch_state(
            {"params": state.variables["detector"]["params"]},
            ti.torch_state_to_numpy(tHs.state_dict()),
            key_map=ti.hed_key_map)["params"]
        ours_det = state.variables["detector"]["params"]
        # conv5 (lr x100) takes ~1e-4 adam steps whose per-element SIGNS are
        # chaotic in f32 over 8 coupled steps — compare the movement NORM
        # (a group mix-up changes it by ~100x), elementwise for slow groups
        init_v5 = np.asarray(hstate["vgg5.1.weight"]).transpose(2, 3, 1, 0)
        got_v5 = np.asarray(ours_det["vgg5_0"]["conv"]["kernel"])
        ref_v5 = np.asarray(th["vgg5_0"]["conv"]["kernel"])
        got_move = np.linalg.norm(got_v5 - init_v5)
        ref_move = np.linalg.norm(ref_v5 - init_v5)
        assert ref_move > 1e-4, "conv5 should have moved ~lr*100 per step"
        np.testing.assert_allclose(got_move, ref_move, rtol=0.2)
        # ... and the movement DIRECTION must agree: per-element signs are
        # f32-chaotic but the aggregate displacement is not — a wrong-group
        # bug with a coincidentally-close norm would still decorrelate this
        d_got = (got_v5 - init_v5).ravel()
        d_ref = (ref_v5 - init_v5).ravel()
        cos = float(d_got @ d_ref / (np.linalg.norm(d_got) *
                                     np.linalg.norm(d_ref)))
        assert cos > 0.8, "conv5 movement direction diverged (cos=%.3f)" % cos
        for path in (("vgg1_0", "conv", "bias"),
                     ("score1", "conv", "bias"), ("fusion", "conv", "kernel")):
            x, y = ours_det, th
            for p in path:
                x, y = x[p], y[p]
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=1e-6,
                                       err_msg=str(path))


class TestCycleGanTrajectory:
    def test_six_steps_pool_filling(self):
        torch.manual_seed(20)
        tms = {"generator_X": build_torch_resnet_generator(1, "instance", 8),
               "generator_Y": build_torch_resnet_generator(1, "instance", 8),
               "discriminator_X": build_torch_discriminator(8, 2, "instance"),
               "discriminator_Y": build_torch_discriminator(8, 2, "instance")}
        gen_cfg = {"model": {"architecture": "official_resnet_generator",
                             "ngf": 8, "n_blocks": 1, "norm_layer": "instance"},
                   "runtime": {"wrappers": "", "data": {}}}
        disc_cfg = {"model": {"architecture": "official_p2p_discriminator",
                              "ndf": 8, "n_layers": 2,
                              "norm_layer": "instance"},
                    "runtime": {"wrappers": "", "data": {}}}
        ms, _ = build_model_set({"type": "NetworkSet",
                                 "generator_X": dict(gen_cfg),
                                 "generator_Y": dict(gen_cfg),
                                 "discriminator_X": dict(disc_cfg),
                                 "discriminator_Y": dict(disc_cfg)})
        x0 = jnp.zeros((2, 32, 32, 3))
        variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
        for name, tm in tms.items():
            variables[name] = ti.convert_torch_state(variables[name],
                                                     seq_state(tm))

        adam = {"algorithm": "adam", "lr": LR, "beta1": 0.5, "beta2": 0.999}
        optimizers = {n: initialize_optimizer(dict(adam))[0] for n in ms.nets}
        # pool larger than total inserts (6 steps x batch 2) => pass-through
        # fill phase, matching the reference's not-full behavior
        pools = {"fake_X_pool": init_pool(16, (32, 32, 3)),
                 "fake_Y_pool": init_pool(16, (32, 32, 3))}
        state = gan_steps.make_gan_state(variables, optimizers, pools)
        step = jax.jit(gan_steps.build_cyclegan_step(
            ms.nets, optimizers, {"adversarial": 1, "cycle": 10},
            {"adversarial": 1, "cycle": 10}))

        opts = {n: torch.optim.Adam(tms[n].parameters(), lr=LR,
                                    betas=(0.5, 0.999)) for n in tms}
        tGX, tGY = tms["generator_X"], tms["generator_Y"]
        tDX, tDY = tms["discriminator_X"], tms["discriminator_Y"]

        data = _batches(21, 6)
        fakes_Y = []
        for si, (real_X, real_Y) in enumerate(data):
            state, metrics, _ = step(state, _j(real_X), _j(real_Y))

            fake_Y = tGX(real_X)
            rec_X = tGY(fake_Y)
            fake_X = tGY(real_Y)
            rec_Y = tGX(fake_X)
            opts["generator_X"].zero_grad()
            opts["generator_Y"].zero_grad()
            pred_fake_Y = tDX(fake_Y)
            pred_fake_X = tDY(fake_X)
            loss_GX = F.mse_loss(pred_fake_Y, torch.zeros_like(pred_fake_Y)) \
                + 10.0 * F.l1_loss(rec_X, real_X)
            loss_GY = F.mse_loss(pred_fake_X, torch.zeros_like(pred_fake_X)) \
                + 10.0 * F.l1_loss(rec_Y, real_Y)
            loss_GX.backward(retain_graph=True)
            loss_GY.backward()
            opts["generator_X"].step()
            opts["generator_Y"].step()

            def d_step(name, D, real, fake):
                opts[name].zero_grad()
                pr = D(real)
                pf = D(fake.detach())
                loss = (F.mse_loss(pr, torch.zeros_like(pr))
                        + F.mse_loss(pf, torch.ones_like(pf))) * 0.5
                loss.backward()
                opts[name].step()
                return loss.item()

            dx = d_step("discriminator_X", tDX, real_Y, fake_Y)
            dy = d_step("discriminator_Y", tDY, real_X, fake_X)
            fakes_Y.append(fake_Y.detach().numpy().transpose(0, 2, 3, 1))

            ref = {"netG_X_total": loss_GX.item(),
                   "netG_Y_total": loss_GY.item(),
                   "netD_X_total": dx, "netD_Y_total": dy}
            for k, v in ref.items():
                np.testing.assert_allclose(float(metrics[k]), v,
                                           rtol=2e-2, atol=2e-3,
                                           err_msg=f"step {si} {k}")

        # pool evolution: the fill phase stored the 12 fake_Y images in
        # insertion order (gan_image_pool.py:50-55 not-full branch)
        pool = state.pools["fake_X_pool"]
        assert int(pool.count) == 12
        stored = np.asarray(pool.images[:12])
        expected = np.concatenate(fakes_Y, axis=0)
        # insertion ORDER is the semantic claim; values carry the two
        # implementations' trajectory drift (amplified where tanh saturates)
        np.testing.assert_allclose(stored, expected, atol=2e-2)
        # order check is meaningful: images from different steps differ by far
        # more than the tolerance
        assert np.abs(stored[:2] - expected[2:4]).max() > 0.1

        theirs = ti.convert_torch_state(
            {"params": state.variables["generator_Y"]["params"]},
            seq_state(tGY))["params"]
        a = np.asarray(
            state.variables["generator_Y"]["params"]["model_1"]["conv"]["kernel"])
        np.testing.assert_allclose(
            a, np.asarray(theirs["model_1"]["conv"]["kernel"]),
            rtol=2e-2, atol=2e-4)


class TestPoolReplaySemantics:
    def test_full_pool_matches_reference_algorithm(self):
        """Replay phase: emulate the reference's per-image sequential logic
        (gan_image_pool.py:15-65) on host with the SAME uniform/randint draws
        the device scan consumes; outputs and buffers must match exactly."""
        pool_size, B = 4, 8
        rng = jax.random.PRNGKey(42)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (B, 2, 2, 1))
        full = init_pool(pool_size, (2, 2, 1))
        prefill = jax.random.normal(jax.random.PRNGKey(2),
                                    (pool_size, 2, 2, 1))
        full = full.replace(images=prefill,
                            count=jnp.asarray(pool_size, jnp.int32))

        new_state, out = pool_query(full, imgs, rng)

        # host emulation with identical draws
        keys = jax.random.split(rng, B)
        buf = np.asarray(prefill).copy()
        expect = np.zeros_like(np.asarray(imgs))
        for i in range(B):
            k1, k2 = jax.random.split(keys[i])
            p = float(jax.random.uniform(k1))
            rid = int(jax.random.randint(k2, (), 0, pool_size))
            img = np.asarray(imgs[i])
            if p > 0.5:  # reference: return a buffered image, store the new
                expect[i] = buf[rid]
                buf[rid] = img
            else:
                expect[i] = img
        np.testing.assert_array_equal(np.asarray(out), expect)
        np.testing.assert_array_equal(np.asarray(new_state.images), buf)
        assert int(new_state.count) == pool_size


class TestCutTrajectory:
    def test_six_steps_gamma_scheduler(self):
        """CUT (NCE family): 6 steps with persistent Adam + gamma
        (ExponentialLR) schedule boundary every 2 steps, fixed patch ids.
        Covers the joint G+F backward and the second scheduler flavor."""
        import torch.nn as tnn
        from test_cut_nce_golden import torch_cut_step  # noqa: F401
        from gandtr_tpu.learning.schedules import gamma_schedule

        torch.manual_seed(30)
        tG = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
        tD = build_torch_discriminator(ndf=8, n_layers=2,
                                       norm="instance").train()
        layers = [0, 4]
        x_probe = torch.zeros(1, 3, 32, 32)
        feats, h = [], x_probe
        for i, layer in enumerate(tG):
            h = layer(h)
            if i in layers:
                feats.append(h)
        mlps = [tnn.Sequential(tnn.Linear(f.shape[1], 16), tnn.ReLU(),
                               tnn.Linear(16, 16)) for f in feats]

        ms, _ = build_model_set({
            "type": "NetworkSet",
            "generator_X": {"model": {"architecture": "official_resnet_generator",
                                      "ngf": 8, "n_blocks": 1,
                                      "norm_layer": "instance"},
                            "runtime": {"wrappers": "", "data": {}}},
            "discriminator_Y": {"model": {"architecture":
                                          "official_p2p_discriminator",
                                          "ndf": 8, "n_layers": 2,
                                          "norm_layer": "instance"},
                                "runtime": {"wrappers": "", "data": {}}},
            "featdown": {"model": {"architecture": "official_p2p_mlp",
                                   "nc": 16},
                         "runtime": {"wrappers": "", "data": {}}}})
        x0 = jnp.zeros((1, 32, 32, 3))
        gvar = ti.convert_torch_state(
            dict(ms["generator_X"].init(jax.random.PRNGKey(0), x0)),
            seq_state(tG))
        dvar = ti.convert_torch_state(
            dict(ms["discriminator_Y"].init(jax.random.PRNGKey(0), x0)),
            seq_state(tD))
        jfeats = ms["generator_X"].apply(gvar, x0, train=False, layers=layers,
                                         encode_only=True)
        fvar = dict(ms["featdown"].module.init(
            jax.random.PRNGKey(1), jfeats, num_patches=4,
            rng=jax.random.PRNGKey(2)))
        mlp_state = {}
        for i, m in enumerate(mlps):
            for kk, v in ti.torch_state_to_numpy(m.state_dict()).items():
                mlp_state[f"mlp_{i}.{kk}"] = v
        fvar = ti.convert_torch_state(fvar, mlp_state,
                                      key_map=ti.patchsample_key_map)
        variables = {"generator_X": gvar, "discriminator_Y": dvar,
                     "featdown": fvar}

        adam = {"algorithm": "adam", "lr": LR, "beta1": 0.5, "beta2": 0.999}
        optimizers = {n: initialize_optimizer(dict(adam))[0]
                      for n in ("generator_X", "discriminator_Y", "featdown")}
        state = gan_steps.make_gan_state(variables, optimizers)
        patch_ids = [np.asarray([3, 17, 99, 512]), np.asarray([1, 7, 31, 63])]
        step = jax.jit(gan_steps.build_cut_step(
            ms.nets, optimizers, {"adversarial": 1, "identity": 10},
            nce_layers=layers, num_patches=4, fixed_patch_ids=patch_ids))

        optG = torch.optim.Adam(tG.parameters(), lr=LR, betas=(0.5, 0.999))
        optD = torch.optim.Adam(tD.parameters(), lr=LR, betas=(0.5, 0.999))
        optF = torch.optim.Adam([p for m in mlps for p in m.parameters()],
                                lr=LR, betas=(0.5, 0.999))
        gamma = 0.9
        scheds = [torch.optim.lr_scheduler.ExponentialLR(o, gamma=gamma)
                  for o in (optG, optD, optF)]
        factor = gamma_schedule(nepochs=3, gamma=gamma)

        import torch.nn.functional as TF
        data = _batches(31, 6, batch=1)
        it = 0
        for epoch in range(3):
            # During 0-indexed epoch e, ExponentialLR holds LR * gamma^e;
            # factor(e) must agree directly (no special case)
            fac = factor(epoch)
            np.testing.assert_allclose(optG.param_groups[0]["lr"], LR * fac,
                                       rtol=1e-9)
            opt_states = dict(state.opt_states)
            for n in opt_states:
                opt_states[n] = set_epoch_lr(opt_states[n], LR, fac)
            state = state.replace(opt_states=opt_states)

            for _ in range(2):
                real_X, real_Y = data[it]
                it += 1
                state, metrics, _ = step(state, _j(real_X), _j(real_Y))
                ref = torch_cut_step_persistent(
                    tG, tD, mlps, optG, optD, optF, real_X, real_Y,
                    layers, patch_ids)
                for k, v in ref.items():
                    np.testing.assert_allclose(
                        float(metrics[k]), v, rtol=3e-2, atol=3e-3,
                        err_msg=f"step {it} {k}")
            for s in scheds:
                s.step()

        theirs = ti.convert_torch_state(
            {"params": state.variables["generator_X"]["params"]},
            seq_state(tG))["params"]
        a = np.asarray(
            state.variables["generator_X"]["params"]["model_1"]["conv"]["kernel"])
        np.testing.assert_allclose(
            a, np.asarray(theirs["model_1"]["conv"]["kernel"]),
            rtol=3e-2, atol=3e-4)


def torch_cut_step_persistent(tG, tD, mlps, optG, optD, optF, real_X, real_Y,
                              layers, patch_ids, w_adv=1.0, w_idt=10.0):
    """One reference CUT step with caller-owned optimizers
    (cut_epochs.py:18-77 semantics, as in test_cut_nce_golden but without
    per-step optimizer construction)."""
    import torch.nn.functional as F

    real = torch.cat((real_X, real_Y), dim=0)
    fake = tG(real)
    n = real_X.size(0)
    fake_Y, idt_Y = fake[:n], fake[n:]

    optD.zero_grad()
    pred_real = tD(real_Y)
    pred_fake = tD(fake_Y.detach())
    d_real = w_adv * F.mse_loss(pred_real, torch.zeros_like(pred_real))
    d_fake = w_adv * F.mse_loss(pred_fake, torch.ones_like(pred_fake))
    ((d_real + d_fake) * 0.5).backward()
    optD.step()

    def nce(src, dst):
        def taps(x):
            feats, h = [], x
            for i, layer in enumerate(tG):
                h = layer(h)
                if i in layers:
                    feats.append(h)
            return feats

        def sample(feats):
            out = []
            for fid, feat in enumerate(feats):
                flat = feat.permute(0, 2, 3, 1).flatten(1, 2)
                pid = torch.as_tensor(patch_ids[fid], dtype=torch.long)
                x = flat[:, pid, :].flatten(0, 1)
                x = mlps[fid](x)
                norm = x.pow(2).sum(1, keepdim=True).pow(0.5)
                out.append(x / (norm + 1e-7))
            return out

        fq, fk = sample(taps(dst)), sample(taps(src))
        total = 0.0
        for q, k in zip(fq, fk):
            P = q.shape[0]
            l_pos = torch.bmm(q.view(P, 1, -1),
                              k.detach().view(P, -1, 1)).view(P, 1)
            l_neg = torch.bmm(q.view(1, -1, q.shape[1]),
                              k.detach().view(1, -1, q.shape[1]).transpose(2, 1))
            l_neg.masked_fill_(
                torch.eye(l_neg.shape[1], dtype=torch.bool)[None], -10.0)
            logits = torch.cat((l_pos, l_neg.view(-1, l_neg.shape[2])), 1) / 0.07
            total = total + F.cross_entropy(
                logits, torch.zeros(logits.shape[0], dtype=torch.long),
                reduction="none").mean()
        return total / len(fq)

    optG.zero_grad()
    optF.zero_grad()
    pred_fake2 = tD(fake_Y)
    g_gan = w_adv * F.mse_loss(pred_fake2, torch.zeros_like(pred_fake2))
    g_nce = nce(real_X, fake_Y)
    g_idt = w_idt * nce(real_Y, idt_Y)
    g_nce_total = (g_nce + g_idt) * 0.5
    (g_gan + g_nce_total).backward()
    optG.step()
    optF.step()
    return {"D_real": d_real.item(), "D_fake": d_fake.item(),
            "G_gan": g_gan.item(), "G_nce": g_nce_total.item(),
            "G_idt": g_idt.item()}


class TestHedGanTrajectory:
    def test_six_steps_lambda_scheduler(self):
        """HED-GAN (non-distilled, 4th family): 6 steps with the `lambda`
        (fixed-then-linear-decay, base_schedulers.py:15-20) schedule —
        with this all four scheduler flavors have trajectory coverage
        (const trivial, lambda here, lambda_p2p in HED^N-GAN, gamma in CUT)."""
        from gandtr_tpu.learning.schedules import lambda_schedule

        torch.manual_seed(40)
        tG = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
        tD = build_torch_discriminator(ndf=8, n_layers=2,
                                       norm="instance").train()
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

        adam = {"algorithm": "adam", "lr": LR, "beta1": 0.5, "beta2": 0.999}
        optimizers = {n: initialize_optimizer(dict(adam))[0]
                      for n in ("generator_X", "discriminator_Y")}
        state = gan_steps.make_gan_state(variables, optimizers)
        step = jax.jit(gan_steps.build_hedgan_step(
            ms.nets, optimizers, {"adversarial": 1, "edge": 5}))

        optG = torch.optim.Adam(tG.parameters(), lr=LR, betas=(0.5, 0.999))
        optD = torch.optim.Adam(tD.parameters(), lr=LR, betas=(0.5, 0.999))
        nepochs, fixed_ratio = 3, 1.0 / 3.0
        rule = lambda e: 1 - max(0, e + 1 - fixed_ratio * nepochs) / float(
            (1 - fixed_ratio) * nepochs + 1)
        scheds = [torch.optim.lr_scheduler.LambdaLR(o, lr_lambda=rule)
                  for o in (optG, optD)]
        factor = lambda_schedule(nepochs, fixed_ratio)

        data = _batches(41, 6)
        it = 0
        for epoch in range(3):
            np.testing.assert_allclose(optG.param_groups[0]["lr"],
                                       LR * factor(epoch), rtol=1e-9)
            opt_states = dict(state.opt_states)
            for n in opt_states:
                opt_states[n] = set_epoch_lr(opt_states[n], LR, factor(epoch))
            state = state.replace(opt_states=opt_states)

            for _ in range(2):
                real_X, real_Y = data[it]
                it += 1
                state, metrics, _ = step(state, _j(real_X), _j(real_Y))

                # torch step (edges_epochs.py:8-54)
                fake_Y = tG(real_X)
                optD.zero_grad()
                pred_real = tD(real_Y)
                pred_fake = tD(fake_Y.detach())
                d_real = F.mse_loss(pred_real, torch.zeros_like(pred_real))
                d_fake = F.mse_loss(pred_fake, torch.ones_like(pred_fake))
                ((d_real + d_fake) * 0.5).backward()
                optD.step()

                optG.zero_grad()
                fake_Y2 = tG(real_X)
                pred_fake2 = tD(fake_Y2)
                fake_E = tH(fake_Y2)
                with torch.no_grad():
                    real_E = tH(real_X)
                g_gan = F.mse_loss(pred_fake2, torch.zeros_like(pred_fake2))
                g_hed = 5.0 * F.l1_loss(fake_E, real_E)
                (g_gan + g_hed).backward()
                optG.step()

                ref = {"D_real": d_real.item(), "D_fake": d_fake.item(),
                       "G_gan": g_gan.item(), "G_hed": g_hed.item()}
                for k, v in ref.items():
                    np.testing.assert_allclose(
                        float(metrics[k]), v, rtol=2e-2, atol=2e-3,
                        err_msg=f"step {it} {k}")
            for s in scheds:
                s.step()

        theirs = ti.convert_torch_state(
            {"params": state.variables["generator_X"]["params"]},
            seq_state(tG))["params"]
        a = np.asarray(
            state.variables["generator_X"]["params"]["model_1"]["conv"]["kernel"])
        np.testing.assert_allclose(
            a, np.asarray(theirs["model_1"]["conv"]["kernel"]),
            rtol=2e-2, atol=3e-4)


class TestConcatStudentEquality:
    """Round-4 E-substep lever (concat-batched student forward, 1.14x on
    chip) and the L1 tie-subgradient parity it surfaced. The concat form is
    OPT-IN (default off): at the published protocol's init the student
    EQUALS the frozen teacher, so real_M - target_M == 0 bit-exactly and the
    reference's L1 backward is exactly 0 there — a batch-2N forward perturbs
    real_M by ulps and turns sign(0) into spurious +-1s. These tests pin
    (a) torch's tie subgradient in our l1_loss, (b) exact-zero e_real grads
    at student==teacher in the default form, (c) grad equality of the two
    forms once the student has drifted."""

    def _build(self):
        hed_cfg = {"model": {"architecture": "hed_interpolation",
                             "width_mult": 0.0625},
                   "runtime": {"wrappers": "", "data": {}}}
        cfg = {"type": "NetworkSet",
               "detector": dict(hed_cfg),
               "detector_frozen": {**hed_cfg,
                                   "runtime": {"frozen": True, "wrappers": "",
                                               "data": {}}}}
        ms, _ = build_model_set(cfg)
        x0 = jnp.zeros((2, 32, 32, 3))
        variables = ms.init_all(jax.random.PRNGKey(3), {n: x0 for n in ms.nets})
        variables["detector_frozen"] = variables["detector"]
        return ms, variables

    def test_l1_tie_subgradient_matches_torch(self):
        from gandtr_tpu.ops import losses as L
        x = torch.zeros(4, requires_grad=True)
        torch.nn.functional.l1_loss(x, torch.zeros(4)).backward()
        assert x.grad.abs().max().item() == 0.0
        g = jax.grad(lambda v: L.l1_loss(v, jnp.zeros(4)))(jnp.zeros(4))
        assert float(jnp.abs(g).max()) == 0.0
        # and the usual sign everywhere else
        g2 = jax.grad(lambda v: L.l1_loss(v, jnp.zeros(2)))(
            jnp.asarray([3.0, -2.0]))
        np.testing.assert_allclose(np.asarray(g2), [0.5, -0.5])

    def test_tie_e_real_grad_exactly_zero(self):
        from gandtr_tpu.ops import losses as L
        ms, variables = self._build()
        H_s, H_t = ms.nets["detector"], ms.nets["detector_frozen"]
        rng = np.random.RandomState(7)
        Xg = jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1, jnp.float32)
        tM = H_t.apply(variables["detector_frozen"], Xg, train=False,
                       no_sigmoid=True)

        def e_real(h_params):
            rm = H_s.apply({**variables["detector"], "params": h_params},
                           Xg, train=False, no_sigmoid=True)
            return L.l1_loss(rm, tM)

        g = jax.grad(e_real)(variables["detector"]["params"])
        assert max(float(jnp.abs(a).max())
                   for a in jax.tree_util.tree_leaves(g)) == 0.0

    def test_concat_grads_equal_once_drifted(self):
        from gandtr_tpu.ops import losses as L
        ms, variables = self._build()
        H_s, H_t = ms.nets["detector"], ms.nets["detector_frozen"]
        rng = np.random.RandomState(7)
        Xg = jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1, jnp.float32)
        Fg = jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1, jnp.float32)
        tM = H_t.apply(variables["detector_frozen"], Xg, train=False,
                       no_sigmoid=True)
        rs = np.random.RandomState(0)
        drifted = jax.tree_util.tree_map(
            lambda x: (x + 1e-3 * np.sign(rs.randn(*x.shape))
                       .astype(np.float32)),
            variables["detector"]["params"])

        def e_loss(h_params, concat):
            hvar = {**variables["detector"], "params": h_params}
            if concat:
                both = H_s.apply(hvar, jnp.concatenate([Xg, Fg], 0),
                                 train=False, no_sigmoid=True)
                rm, fm = both[:2], both[2:]
            else:
                rm = H_s.apply(hvar, Xg, train=False, no_sigmoid=True)
                fm = H_s.apply(hvar, Fg, train=False, no_sigmoid=True)
            return L.l1_loss(rm, tM) + L.l1_loss(fm, tM)

        g_sep = jax.grad(lambda p: e_loss(p, False))(drifted)
        g_cat = jax.grad(lambda p: e_loss(p, True))(drifted)
        for a, b in zip(jax.tree_util.tree_leaves(g_sep),
                        jax.tree_util.tree_leaves(g_cat)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6)
