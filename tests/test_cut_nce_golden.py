"""Golden parity for CUT's NCE pipeline with fixed patch ids: generator taps →
PatchSampleF MLPs → multilayer PatchNCE loss vs a torch oracle composition."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.ops import losses as L
from gandtr_tpu.utils import torch_import as ti

from test_models_parity import build_torch_resnet_generator, seq_state


def torch_nce(tG, mlps, src, dst, layers, patch_ids, temperature=0.07):
    """calculate_nce_loss (cut_epochs.py:79-89) with given patch ids."""
    def taps(x):
        # mirror the reference's encode_only EARLY RETURN
        # (p2p_networks.py:330-332): the loop stops at layers[-1], so the
        # last tap is never mutated by a following ReLU(inplace=True) —
        # running all layers here entrenched the mutated value until the
        # CUT cross-engine oracle caught it (round 5)
        feats = []
        h = x
        for i, layer in enumerate(tG):
            h = layer(h)
            if i in layers:
                feats.append(h)
            if i == layers[-1]:
                break
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

    fq = sample(taps(dst))
    fk = sample(taps(src))
    total = 0.0
    for q, k in zip(fq, fk):
        P = q.shape[0]
        l_pos = torch.bmm(q.view(P, 1, -1), k.detach().view(P, -1, 1)).view(P, 1)
        l_neg = torch.bmm(q.view(1, -1, q.shape[1]),
                          k.detach().view(1, -1, q.shape[1]).transpose(2, 1))
        l_neg.masked_fill_(torch.eye(l_neg.shape[1], dtype=torch.bool)[None], -10.0)
        logits = torch.cat((l_pos, l_neg.view(-1, l_neg.shape[2])), 1) / temperature
        total = total + F.cross_entropy(
            logits, torch.zeros(logits.shape[0], dtype=torch.long),
            reduction="none").mean()
    return (total / len(fq)).item()


def test_cut_nce_pipeline_matches_torch():
    torch.manual_seed(0)
    tG = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
    layers = [0, 4]
    # probe tap channel counts
    x_probe = torch.zeros(1, 3, 32, 32)
    feats = []
    h = x_probe
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
        "featdown": {"model": {"architecture": "official_p2p_mlp", "nc": 16},
                     "runtime": {"wrappers": "", "data": {}}}})
    x0 = jnp.zeros((1, 32, 32, 3))
    gvar = dict(ms["generator_X"].init(jax.random.PRNGKey(0), x0))
    gvar = ti.convert_torch_state(gvar, seq_state(tG))
    jfeats = ms["generator_X"].apply(gvar, x0, train=False, layers=layers,
                                     encode_only=True)
    fvar = dict(ms["featdown"].module.init(jax.random.PRNGKey(1), jfeats,
                                           num_patches=8,
                                           rng=jax.random.PRNGKey(2)))
    mlp_state = {}
    for i, m in enumerate(mlps):
        for k, v in ti.torch_state_to_numpy(m.state_dict()).items():
            mlp_state[f"mlp_{i}.{k}"] = v
    fvar = ti.convert_torch_state(fvar, mlp_state,
                                  key_map=ti.patchsample_key_map)

    torch.manual_seed(3)
    src_t = torch.rand(1, 3, 32, 32) * 2 - 1
    dst_t = torch.rand(1, 3, 32, 32) * 2 - 1
    patch_ids = [np.asarray([3, 17, 99, 512]), np.asarray([1, 7, 31, 63])]

    ref = torch_nce(tG, mlps, src_t, dst_t, layers, patch_ids)

    src = jnp.asarray(src_t.numpy().transpose(0, 2, 3, 1))
    dst = jnp.asarray(dst_t.numpy().transpose(0, 2, 3, 1))
    fq = ms["generator_X"].apply(gvar, dst, train=False, layers=layers,
                                 encode_only=True)
    fk = ms["generator_X"].apply(gvar, src, train=False, layers=layers,
                                 encode_only=True)
    ids = [jnp.asarray(p) for p in patch_ids]
    fk_pool, _ = ms["featdown"].apply(fvar, fk, num_patches=4, patch_ids=ids)
    fq_pool, _ = ms["featdown"].apply(fvar, fq, num_patches=4, patch_ids=ids)
    total, _ = L.multilayer_patch_nce_loss(fq_pool, fk_pool, 1, 0.07, 1.0)
    np.testing.assert_allclose(float(total), ref, rtol=2e-3, atol=1e-4)


def torch_cut_step(tG, tD, mlps, real_X, real_Y, layers, patch_ids,
                   w_adv=1.0, w_idt=10.0, lr=2e-4):
    """Reference CUT step in torch (cut_epochs.py:18-77): concat-batch
    forward, D step (real→0 convention), joint G+F backward with NCE + idt."""
    optG = torch.optim.Adam(tG.parameters(), lr=lr, betas=(0.5, 0.999))
    optD = torch.optim.Adam(tD.parameters(), lr=lr, betas=(0.5, 0.999))
    optF = torch.optim.Adam([p for m in mlps for p in m.parameters()],
                            lr=lr, betas=(0.5, 0.999))

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
            feats = []
            h = x
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
            l_pos = torch.bmm(q.view(P, 1, -1), k.detach().view(P, -1, 1)).view(P, 1)
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


def test_cut_one_step_matches_torch():
    from test_models_parity import build_torch_discriminator
    from gandtr_tpu.learning.optimizers import initialize_optimizer
    from gandtr_tpu.learning import gan_steps

    torch.manual_seed(4)
    tG = build_torch_resnet_generator(n_blocks=1, norm="instance", ngf=8)
    tD = build_torch_discriminator(ndf=8, n_layers=2, norm="instance").train()
    layers = [0, 4]
    x_probe = torch.zeros(1, 3, 32, 32)
    feats = []
    h = x_probe
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
        "featdown": {"model": {"architecture": "official_p2p_mlp", "nc": 16},
                     "runtime": {"wrappers": "", "data": {}}}})
    x0 = jnp.zeros((1, 32, 32, 3))
    gvar = dict(ms["generator_X"].init(jax.random.PRNGKey(0), x0))
    gvar = ti.convert_torch_state(gvar, seq_state(tG))
    dvar = dict(ms["discriminator_Y"].init(jax.random.PRNGKey(0), x0))
    dvar = ti.convert_torch_state(dvar, seq_state(tD))
    jfeats = ms["generator_X"].apply(gvar, x0, train=False, layers=layers,
                                     encode_only=True)
    fvar = dict(ms["featdown"].module.init(jax.random.PRNGKey(1), jfeats,
                                           num_patches=4,
                                           rng=jax.random.PRNGKey(2)))
    mlp_state = {}
    for i, m in enumerate(mlps):
        for k, v in ti.torch_state_to_numpy(m.state_dict()).items():
            mlp_state[f"mlp_{i}.{k}"] = v
    fvar = ti.convert_torch_state(fvar, mlp_state,
                                  key_map=ti.patchsample_key_map)
    variables = {"generator_X": gvar, "discriminator_Y": dvar,
                 "featdown": fvar}

    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y", "featdown")}
    state = gan_steps.make_gan_state(variables, optimizers)
    patch_ids = [np.asarray([3, 17, 99, 512]), np.asarray([1, 7, 31, 63])]
    step = jax.jit(gan_steps.build_cut_step(
        ms.nets, optimizers, {"adversarial": 1, "identity": 10},
        nce_layers=layers, num_patches=4, fixed_patch_ids=patch_ids))

    torch.manual_seed(5)
    real_X = torch.rand(1, 3, 32, 32) * 2 - 1
    real_Y = torch.rand(1, 3, 32, 32) * 2 - 1
    jX = jnp.asarray(real_X.numpy().transpose(0, 2, 3, 1))
    jY = jnp.asarray(real_Y.numpy().transpose(0, 2, 3, 1))

    new_state, metrics, _ = step(state, jX, jY)
    ref = torch_cut_step(tG, tD, mlps, real_X, real_Y, layers, patch_ids)

    for k in ("D_real", "D_fake", "G_gan", "G_nce", "G_idt"):
        np.testing.assert_allclose(float(metrics[k]), ref[k],
                                   rtol=3e-3, atol=3e-4), k

    # post-Adam weights: generator and featdown MLPs match torch
    tstate = seq_state(tG)
    ours = new_state.variables["generator_X"]["params"]
    theirs = ti.convert_torch_state(
        {"params": state.variables["generator_X"]["params"]}, tstate)["params"]
    for path in (("model_1", "conv", "kernel"),):
        a, b = ours, theirs
        for p in path:
            a, b = a[p], b[p]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
    mlp_after = {}
    for i, m in enumerate(mlps):
        for k, v in ti.torch_state_to_numpy(m.state_dict()).items():
            mlp_after[f"mlp_{i}.{k}"] = v
    f_theirs = ti.convert_torch_state(
        {"params": state.variables["featdown"]["params"]}, mlp_after,
        key_map=ti.patchsample_key_map)["params"]
    for a, b in zip(
            jax.tree_util.tree_leaves(new_state.variables["featdown"]["params"]),
            jax.tree_util.tree_leaves(f_theirs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
