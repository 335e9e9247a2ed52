"""Jitted GAN train steps: CycleGAN, CUT, HED-GAN, HED^N-GAN.

Functional re-design of the reference epoch iterations
(/root/reference/mdir/learning/epoch_iteration/{gan,cut,edges}_epochs.py):
each family is a builder returning a pure `step(state, real_X, real_Y)` that
performs the reference's exact optimization order inside ONE compiled graph —
D step, (detector step,) G step — including the inverted adversarial target
convention (real→0, fake→1), the 50-image replay pools (on-device), and the
BatchNorm running-stat update pattern of the torch code (D/H stats also update
during the G step forward; G stats update once per step).

Data parallelism: the step is shardable by GSPMD — shard `real_X`/`real_Y`
over the mesh 'data' axis and gradients are all-reduced by XLA automatically.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
import flax.struct

from gandtr_tpu.ops import losses as L
from gandtr_tpu.learning.image_pool import pool_query, init_pool


@flax.struct.dataclass
class GanState:
    variables: Dict[str, Any]
    opt_states: Dict[str, Any]
    pools: Dict[str, Any]
    rng: Any
    step: Any


def make_gan_state(variables, optimizers, pools=None, seed=0):
    opt_states = {name: tx.init(variables[name]["params"])
                  for name, tx in optimizers.items()}
    return GanState(variables=variables, opt_states=opt_states,
                    pools=pools or {}, rng=jax.random.PRNGKey(seed),
                    step=jnp.zeros((), jnp.int32))


def _apply(net, variables, x, train=True, rngs=None, ctx=None, **kw):
    """Apply a WrappedNet, returning (out, new_batch_stats or None)."""
    if net.has_batch_stats(variables):
        out, upd = net.apply(variables, x, train=train, ctx=ctx,
                             mutable=["batch_stats"], rngs=rngs, **kw)
        return out, upd["batch_stats"]
    return net.apply(variables, x, train=train, ctx=ctx, rngs=rngs, **kw), None


def _with_stats(variables, batch_stats):
    if batch_stats is None:
        return variables
    return {**variables, "batch_stats": batch_stats}


def _update(tx, opt_state, grads, params):
    updates, new_opt = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt


def _d_loss(models, variables, name, real_Y, fake_Y_sg, w_adv, train=True):
    """Discriminator loss with the reference's sequential BN-stat updates
    (real forward first, then fake — gan_epochs.py:19-37)."""
    D = models[name]

    def loss_fn(d_params):
        var = {**variables[name], "params": d_params}
        pred_real, bs1 = _apply(D, var, real_Y, train=train)
        pred_fake, bs2 = _apply(D, _with_stats(var, bs1), fake_Y_sg, train=train)
        lr_, _ = L.discriminator_loss(pred_real, True, L.mse_loss)
        lf_, _ = L.discriminator_loss(pred_fake, False, L.mse_loss)
        loss_real = w_adv * lr_
        loss_fake = w_adv * lf_
        loss = (loss_real + loss_fake) * 0.5
        return loss, (loss_real, loss_fake, bs2)

    return loss_fn


def build_hedgan_step(models, optimizers, weights):
    """HED-GAN (edges_epochs.py:8-54): D step then G step with edge-consistency
    L1 between HED maps of fake_Y and real_X."""
    w_adv = weights.get("adversarial", 1.0)
    w_edge = weights.get("edge", 5.0)

    def step(state, real_X, real_Y):
        rng, _ = jax.random.split(state.rng)
        variables = dict(state.variables)
        G, D, H = models["generator_X"], models["discriminator_Y"], models["detector"]

        # ONE generator forward with retained VJP (see build_hedngan_step)
        def g_fwd(g_params):
            gvar = {**variables["generator_X"], "params": g_params}
            fy, bs = _apply(G, gvar, real_X, train=True)
            return fy, bs

        fake_Y, g_vjp, g_bs = jax.vjp(g_fwd, variables["generator_X"]["params"],
                                      has_aux=True)
        fake_Y_sg = jax.lax.stop_gradient(fake_Y)

        # (1) D step
        d_loss_fn = _d_loss(models, variables, "discriminator_Y", real_Y,
                            fake_Y_sg, w_adv)
        (d_loss, (d_lr, d_lf, d_bs)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(variables["discriminator_Y"]["params"])
        d_params, d_opt = _update(optimizers["discriminator_Y"],
                                  state.opt_states["discriminator_Y"], d_grads,
                                  variables["discriminator_Y"]["params"])
        variables["discriminator_Y"] = _with_stats(
            {**variables["discriminator_Y"], "params": d_params}, d_bs)

        # (2) G step (uses updated D)
        real_E = jax.lax.stop_gradient(
            H.apply(variables["detector"], real_X, train=False))

        def g_loss_from_fy(fy):
            pred_fake, d_bs2 = _apply(D, variables["discriminator_Y"], fy, train=True)
            fake_E = H.apply(variables["detector"], fy, train=False)
            adv, _ = L.discriminator_loss(pred_fake, True, L.mse_loss)
            g_gan = w_adv * adv
            g_hed = w_edge * L.l1_loss(fake_E, real_E)
            # fake_E's last sample rides the aux for the debug blobs
            # (edges_epochs.py:36-37) — reused from the loss forward, free
            return g_gan + g_hed, (g_gan, g_hed, d_bs2,
                                   jax.lax.stop_gradient(fake_E[-1]))

        (g_loss, (g_gan, g_hed, d_bs2, fake_E_dbg)), dfy = jax.value_and_grad(
            g_loss_from_fy, has_aux=True)(fake_Y)
        (g_grads,) = g_vjp(dfy)
        g_params, g_opt = _update(optimizers["generator_X"],
                                  state.opt_states["generator_X"], g_grads,
                                  variables["generator_X"]["params"])
        variables["generator_X"] = _with_stats(
            {**variables["generator_X"], "params": g_params}, g_bs)
        variables["discriminator_Y"] = _with_stats(
            variables["discriminator_Y"], d_bs2)

        metrics = {"total": g_loss + d_loss, "D_real": d_lr, "D_fake": d_lf,
                   "G_gan": g_gan, "G_hed": g_hed}
        debug = {"real_X": real_X[-1], "real_Y": real_Y[-1],
                 "fake_Y": fake_Y_sg[-1], "real_E": real_E[-1],
                 "fake_E": fake_E_dbg}
        new_state = GanState(
            variables=variables,
            opt_states={**state.opt_states, "discriminator_Y": d_opt,
                        "generator_X": g_opt},
            pools=state.pools, rng=rng, step=state.step + 1)
        return new_state, metrics, debug

    return step


def build_hedngan_step(models, optimizers, weights, concat_student=False,
                       external_targets=False, emit_targets=False):
    """HED^N-GAN (edges_epochs.py:61-121): D step, student-detector
    distillation step (pre-sigmoid, from the frozen teacher), then G step
    against the updated student.

    concat_student (OPT-IN, default off): run the E-step's two student
    forwards (real_X, fake_Y) as ONE batch-2N forward. HED is per-sample
    (convs/relu/maxpool/bilinear, no cross-batch ops) so the math is the two
    separate forwards, and on chip it measured 145.6 -> 127.7 ms/step
    (1.14x, scripts/perf_hedngan_concat.py). It is NOT the protocol default
    because of a tie-subgradient hazard: the student is initialized EQUAL to
    the frozen teacher, so at the start of training real_M - target_M == 0
    bit-exactly (separate forwards of identical nets are bit-identical, both
    here and in torch) and the L1 subgradient is exactly 0 — but the
    batch-2N graph tiles reductions differently, perturbing real_M by ulps
    and flipping sign(0) into correlated +-1s: an O(1) spurious gradient on
    the first E steps. Safe once the student has drifted (|real_M -
    target_M| >> ulp); tests/test_multistep_golden.py pins both the drifted
    grad equality and the tie semantics.

    external_targets: the step takes a 4th argument — a precomputed
    target_M — and skips the frozen teacher's forward (the cross-epoch
    teacher-target cache for deterministic data pipelines; see
    learning/teacher_cache.py and docs/PERF.md "frozen-teacher caching" for
    why the published protocol cannot benefit). emit_targets: return
    target_M in the debug dict so a cache can store it without a second
    teacher forward."""
    w_adv = weights.get("adversarial", 1.0)
    w_edge = weights.get("edge", 5.0)
    w_hed = weights.get("hed", 1.0)

    def step(state, real_X, real_Y, *ext):
        rng, _ = jax.random.split(state.rng)
        variables = dict(state.variables)
        G, D = models["generator_X"], models["discriminator_Y"]
        H_s, H_t = models["detector"], models["detector_frozen"]

        # ONE generator forward, with its VJP retained for the G step (the
        # torch reference also backprops through the single retained graph,
        # edges_epochs.py:41-54 — a naive re-forward inside the G-step grad
        # would double the generator FLOPs)
        def g_fwd(g_params):
            gvar = {**variables["generator_X"], "params": g_params}
            fy, bs = _apply(G, gvar, real_X, train=True)
            return fy, bs

        fake_Y, g_vjp, g_bs = jax.vjp(g_fwd, variables["generator_X"]["params"],
                                      has_aux=True)
        fake_Y_sg = jax.lax.stop_gradient(fake_Y)

        # (1) D step
        d_loss_fn = _d_loss(models, variables, "discriminator_Y", real_Y,
                            fake_Y_sg, w_adv)
        (d_loss, (d_lr, d_lf, d_bs)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(variables["discriminator_Y"]["params"])
        d_params, d_opt = _update(optimizers["discriminator_Y"],
                                  state.opt_states["discriminator_Y"], d_grads,
                                  variables["discriminator_Y"]["params"])
        variables["discriminator_Y"] = _with_stats(
            {**variables["discriminator_Y"], "params": d_params}, d_bs)

        # (2) detector distillation step (edges_epochs.py:105-121)
        if external_targets:
            (target_M,) = ext
            target_M = jax.lax.stop_gradient(target_M)
        else:
            assert not ext
            target_M = jax.lax.stop_gradient(
                H_t.apply(variables["detector_frozen"], real_X, train=False,
                          no_sigmoid=True))

        def e_loss_fn(h_params):
            hvar = {**variables["detector"], "params": h_params}
            if concat_student:
                n = real_X.shape[0]
                both_M = H_s.apply(hvar,
                                   jnp.concatenate([real_X, fake_Y_sg], 0),
                                   train=False, no_sigmoid=True)
                real_M, fake_M = both_M[:n], both_M[n:]
            else:
                real_M = H_s.apply(hvar, real_X, train=False, no_sigmoid=True)
                fake_M = H_s.apply(hvar, fake_Y_sg, train=False,
                                   no_sigmoid=True)
            e_real = w_hed * L.l1_loss(real_M, target_M)
            e_fake = w_hed * L.l1_loss(fake_M, target_M)
            return e_real + e_fake, (e_real, e_fake)

        (e_loss, (e_real, e_fake)), e_grads = jax.value_and_grad(
            e_loss_fn, has_aux=True)(variables["detector"]["params"])
        h_params, e_opt = _update(optimizers["detector"],
                                  state.opt_states["detector"], e_grads,
                                  variables["detector"]["params"])
        variables["detector"] = {**variables["detector"], "params": h_params}

        # (3) G step (updated D and student). real_E is the teacher's
        # sigmoided output — exactly sigmoid(target_M), no second teacher
        # forward (the torch reference recomputes it; numerically identical)
        real_E = jax.lax.stop_gradient(jax.nn.sigmoid(target_M))

        def g_loss_from_fy(fy):
            pred_fake, d_bs2 = _apply(D, variables["discriminator_Y"], fy, train=True)
            fake_E = H_s.apply(variables["detector"], fy, train=False)
            adv, _ = L.discriminator_loss(pred_fake, True, L.mse_loss)
            g_gan = w_adv * adv
            g_hed = w_edge * L.l1_loss(fake_E, real_E)
            # last fake edge map for the debug blobs (edges_epochs.py:36-37)
            return g_gan + g_hed, (g_gan, g_hed, d_bs2,
                                   jax.lax.stop_gradient(fake_E[-1]))

        (g_loss, (g_gan, g_hed, d_bs2, fake_E_dbg)), dfy = jax.value_and_grad(
            g_loss_from_fy, has_aux=True)(fake_Y)
        (g_grads,) = g_vjp(dfy)
        g_params, g_opt = _update(optimizers["generator_X"],
                                  state.opt_states["generator_X"], g_grads,
                                  variables["generator_X"]["params"])
        variables["generator_X"] = _with_stats(
            {**variables["generator_X"], "params": g_params}, g_bs)
        variables["discriminator_Y"] = _with_stats(
            variables["discriminator_Y"], d_bs2)

        metrics = {"total": g_loss + d_loss, "D_real": d_lr, "D_fake": d_lf,
                   "G_gan": g_gan, "G_hed": g_hed, "E_real": e_real,
                   "E_fake": e_fake}
        # real_E_check = UPDATED student on real_X (edges_epochs.py:89,104):
        # the student-vs-teacher drift blob; last sample only (one 1-image
        # HED forward per step — negligible next to the batch G/D/E passes)
        real_E_check = jax.lax.stop_gradient(
            H_s.apply(variables["detector"], real_X[-1:], train=False)[0])
        debug = {"real_X": real_X[-1], "real_Y": real_Y[-1],
                 "fake_Y": fake_Y_sg[-1], "real_E": real_E[-1],
                 "fake_E": fake_E_dbg, "real_E_check": real_E_check}
        if emit_targets:
            debug["target_M"] = target_M
        new_state = GanState(
            variables=variables,
            opt_states={**state.opt_states, "discriminator_Y": d_opt,
                        "generator_X": g_opt, "detector": e_opt},
            pools=state.pools, rng=rng, step=state.step + 1)
        return new_state, metrics, debug

    return step


def build_cut_step(models, optimizers, weights, nce_layers=(4, 8, 12, 16),
                   num_patches=256, temperature=0.07, nce_weight=1.0,
                   batch_dim_for_bmm=1, fixed_patch_ids=None):
    """CUT (cut_epochs.py): concat-batch identity trick, PatchNCE via generator
    encoder features + featdown MLPs with shared patch ids.

    `fixed_patch_ids` (per-layer index arrays) replaces the per-step random
    patch sampling — the golden-parity test hook (the torch reference's
    determinism is its global seed, which has no jax analog)."""
    w_adv = weights.get("adversarial", 1.0)
    w_idt = weights.get("identity", 10.0)
    w_nce = nce_weight
    nce_layers = list(nce_layers)

    def nce_loss(g_var, f_params, src, dst, rng, models_, variables):
        G, F = models_["generator_X"], models_["featdown"]

        def encode(x):
            # batch-norm generators need mutable batch_stats under train=True
            # (flax refuses otherwise); the encoder-pass stat updates are
            # DISCARDED — the torch reference lets these extra forwards drift
            # the running stats, a bookkeeping-only divergence (eval-time
            # normalization), and no published CUT config uses BN
            if "batch_stats" in g_var:
                out, _ = G.apply(g_var, x, train=True, layers=nce_layers,
                                 encode_only=True, mutable=["batch_stats"])
                return out
            return G.apply(g_var, x, train=True, layers=nce_layers,
                           encode_only=True)

        feat_q = encode(dst)
        feat_k = encode(src)
        fvar = {**variables["featdown"], "params": f_params}
        if fixed_patch_ids is not None:
            fixed = [jnp.asarray(p) for p in fixed_patch_ids]
            feat_k_pool, ids = F.apply(fvar, feat_k, num_patches=num_patches,
                                       patch_ids=fixed)
        else:
            feat_k_pool, ids = F.apply(fvar, feat_k, num_patches=num_patches,
                                       rng=rng)
        feat_q_pool, _ = F.apply(fvar, feat_q, num_patches=num_patches, patch_ids=ids)
        # reference quirk (cut_epochs.py:60-66): the criterion's own weight
        # multiplies each layer INSIDE MultilayerPatchNCELoss.forward AND is
        # used again as the OUTER w_nce factor — the nce term scales by
        # weight^2 and the identity term by w_idt*weight. Identical at the
        # published weight 1.0; divergent otherwise (found by review).
        total, _ = L.multilayer_patch_nce_loss(
            feat_q_pool, feat_k_pool, batch_dim_for_bmm, temperature, w_nce)
        return total

    def step(state, real_X, real_Y):
        rng, r_nce1, r_nce2 = jax.random.split(state.rng, 3)
        variables = dict(state.variables)
        G, D = models["generator_X"], models["discriminator_Y"]

        real = jnp.concatenate([real_X, real_Y], axis=0)
        fake, g_bs = _apply(G, variables["generator_X"], real, train=True)
        n = real_X.shape[0]
        fake_Y = fake[:n]
        idt_Y = fake[n:]
        fake_Y_sg = jax.lax.stop_gradient(fake_Y)

        # (1) D step
        d_loss_fn = _d_loss(models, variables, "discriminator_Y", real_Y,
                            fake_Y_sg, w_adv)
        (d_loss, (d_lr, d_lf, d_bs)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(variables["discriminator_Y"]["params"])
        d_params, d_opt = _update(optimizers["discriminator_Y"],
                                  state.opt_states["discriminator_Y"], d_grads,
                                  variables["discriminator_Y"]["params"])
        variables["discriminator_Y"] = _with_stats(
            {**variables["discriminator_Y"], "params": d_params}, d_bs)

        # (2) G + F step (joint grads, like the shared backward in torch)
        def gf_loss_fn(params):
            g_params, f_params = params
            gvar = {**variables["generator_X"], "params": g_params}
            fk, _ = _apply(G, gvar, real, train=True)
            fy, iy = fk[:n], fk[n:]
            pred_fake, d_bs2 = _apply(D, variables["discriminator_Y"], fy, train=True)
            adv, _ = L.discriminator_loss(pred_fake, True, L.mse_loss)
            g_gan = w_adv * adv
            g_nce = w_nce * nce_loss(gvar, f_params, real_X, fy, r_nce1,
                                     models, variables)
            if w_idt > 0.0 and w_nce > 0.0:
                g_idt = w_idt * nce_loss(gvar, f_params, real_Y, iy, r_nce2,
                                         models, variables)
                g_nce_total = (g_nce + g_idt) * 0.5
            else:
                g_idt = 0.0
                g_nce_total = g_nce
            total = g_gan + g_nce_total
            return total, (g_gan, g_nce_total, g_idt, d_bs2)

        (g_loss, (g_gan, g_nce, g_idt, d_bs2)), grads = jax.value_and_grad(
            gf_loss_fn, has_aux=True)((variables["generator_X"]["params"],
                                       variables["featdown"]["params"]))
        g_grads, f_grads = grads
        g_params, g_opt = _update(optimizers["generator_X"],
                                  state.opt_states["generator_X"], g_grads,
                                  variables["generator_X"]["params"])
        f_params, f_opt = _update(optimizers["featdown"],
                                  state.opt_states["featdown"], f_grads,
                                  variables["featdown"]["params"])
        variables["generator_X"] = _with_stats(
            {**variables["generator_X"], "params": g_params}, g_bs)
        variables["featdown"] = {**variables["featdown"], "params": f_params}
        variables["discriminator_Y"] = _with_stats(
            variables["discriminator_Y"], d_bs2)

        metrics = {"total": g_loss + d_loss, "D_real": d_lr, "D_fake": d_lf,
                   "G_gan": g_gan, "G_nce": g_nce, "G_idt": g_idt}
        debug = {"real_X": real_X[-1], "real_Y": real_Y[-1],
                 "fake_Y": fake_Y_sg[-1], "idt_Y": jax.lax.stop_gradient(idt_Y)[-1]}
        new_state = GanState(
            variables=variables,
            opt_states={**state.opt_states, "discriminator_Y": d_opt,
                        "generator_X": g_opt, "featdown": f_opt},
            pools=state.pools, rng=rng, step=state.step + 1)
        return new_state, metrics, debug

    return step


def build_cyclegan_step(models, optimizers, weights_GX=None, weights_GY=None):
    """CycleGAN (gan_epochs.py:61-140): joint G_X/G_Y update (shared graph),
    then D updates with 50-image replay pools."""
    w_adv_x = (weights_GX or {}).get("adversarial", 1.0)
    w_cyc_x = (weights_GX or {}).get("cycle", 10.0)
    w_adv_y = (weights_GY or {}).get("adversarial", 1.0)
    w_cyc_y = (weights_GY or {}).get("cycle", 10.0)

    def step(state, real_X, real_Y):
        rng, r_px, r_py = jax.random.split(state.rng, 3)
        variables = dict(state.variables)
        GX, GY = models["generator_X"], models["generator_Y"]
        DX, DY = models["discriminator_X"], models["discriminator_Y"]

        # (1) joint generators step
        def g_loss_fn(params):
            gx_params, gy_params = params
            gx = {**variables["generator_X"], "params": gx_params}
            gy = {**variables["generator_Y"], "params": gy_params}
            fake_Y, gx_bs = _apply(GX, gx, real_X, train=True)
            rec_X, gy_bs = _apply(GY, gy, fake_Y, train=True)
            fake_X, gy_bs2 = _apply(GY, _with_stats(gy, gy_bs), real_Y, train=True)
            rec_Y, gx_bs2 = _apply(GX, _with_stats(gx, gx_bs), fake_X, train=True)

            pred_fake_Y, dx_bs = _apply(DX, variables["discriminator_X"], fake_Y, train=True)
            pred_fake_X, dy_bs = _apply(DY, variables["discriminator_Y"], fake_X, train=True)
            advx, _ = L.discriminator_loss(pred_fake_Y, True, L.mse_loss)
            advy, _ = L.discriminator_loss(pred_fake_X, True, L.mse_loss)
            # WEIGHTED partials, logged under the reference's MultiheadLoss
            # key forms (compound_losses.py:88-92 — partial[loss] carries the
            # weight; gan_epochs.py:113-116 logs netG_X_<head>)
            adv_X = w_adv_x * advx
            cyc_X = w_cyc_x * L.l1_loss(rec_X, real_X)
            adv_Y = w_adv_y * advy
            cyc_Y = w_cyc_y * L.l1_loss(rec_Y, real_Y)
            loss_GX = adv_X + cyc_X
            loss_GY = adv_Y + cyc_Y
            aux = (loss_GX, loss_GY, adv_X, cyc_X, adv_Y, cyc_Y,
                   fake_Y, fake_X, rec_X, rec_Y,
                   gx_bs2, gy_bs2, dx_bs, dy_bs)
            return loss_GX + loss_GY, aux

        (g_total, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            (variables["generator_X"]["params"], variables["generator_Y"]["params"]))
        (loss_GX, loss_GY, adv_X, cyc_X, adv_Y, cyc_Y,
         fake_Y, fake_X, rec_X, rec_Y,
         gx_bs, gy_bs, dx_bs, dy_bs) = aux
        gx_grads, gy_grads = grads
        gx_params, gx_opt = _update(optimizers["generator_X"],
                                    state.opt_states["generator_X"], gx_grads,
                                    variables["generator_X"]["params"])
        gy_params, gy_opt = _update(optimizers["generator_Y"],
                                    state.opt_states["generator_Y"], gy_grads,
                                    variables["generator_Y"]["params"])
        variables["generator_X"] = _with_stats(
            {**variables["generator_X"], "params": gx_params}, gx_bs)
        variables["generator_Y"] = _with_stats(
            {**variables["generator_Y"], "params": gy_params}, gy_bs)
        variables["discriminator_X"] = _with_stats(variables["discriminator_X"], dx_bs)
        variables["discriminator_Y"] = _with_stats(variables["discriminator_Y"], dy_bs)

        fake_Y_sg = jax.lax.stop_gradient(fake_Y)
        fake_X_sg = jax.lax.stop_gradient(fake_X)

        # (2) D steps with pools (reference: D_X judges domain-Y images)
        pools = dict(state.pools)
        new_pool_x, fake_Y_pool = pool_query(pools["fake_X_pool"], fake_Y_sg, r_px)
        new_pool_y, fake_X_pool = pool_query(pools["fake_Y_pool"], fake_X_sg, r_py)
        pools["fake_X_pool"], pools["fake_Y_pool"] = new_pool_x, new_pool_y

        def d_step(name, real, fake):
            loss_fn = _d_loss(models, variables, name, real, fake, 1.0)
            (loss, (lr_, lf_, bs)), dgr = jax.value_and_grad(loss_fn, has_aux=True)(
                variables[name]["params"])
            p, o = _update(optimizers[name], state.opt_states[name], dgr,
                           variables[name]["params"])
            variables[name] = _with_stats({**variables[name], "params": p}, bs)
            return loss, o

        dx_loss, dx_opt = d_step("discriminator_X", real_Y, fake_Y_pool)
        dy_loss, dy_opt = d_step("discriminator_Y", real_X, fake_X_pool)

        metrics = {"total": g_total + dx_loss + dy_loss,
                   "netG_X_total": loss_GX, "netG_Y_total": loss_GY,
                   "netG_X_adversarial": adv_X, "netG_X_cycle": cyc_X,
                   "netG_Y_adversarial": adv_Y, "netG_Y_cycle": cyc_Y,
                   "netD_X_total": dx_loss, "netD_Y_total": dy_loss}
        debug = {"real_X": real_X[-1], "fake_Y": fake_Y_sg[-1],
                 "rec_X": jax.lax.stop_gradient(rec_X)[-1],
                 "real_Y": real_Y[-1], "fake_X": fake_X_sg[-1],
                 "rec_Y": jax.lax.stop_gradient(rec_Y)[-1]}
        new_state = GanState(
            variables=variables,
            opt_states={**state.opt_states, "generator_X": gx_opt,
                        "generator_Y": gy_opt, "discriminator_X": dx_opt,
                        "discriminator_Y": dy_opt},
            pools=pools, rng=rng, step=state.step + 1)
        return new_state, metrics, debug

    return step


GAN_STEPS = {
    "SupervisedGanEpoch": build_hedgan_step,
    "SupervisedHEDGANEpoch": build_hedgan_step,
    "SupervisedHEDNGANEpoch": build_hedngan_step,
    "SupervisedCUTEpoch": build_cut_step,
    "SupervisedCycleGanEpoch": build_cyclegan_step,
}
