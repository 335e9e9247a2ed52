"""Round-3: HED^N-GAN train-step substep ablation + few-lane conv audit
(VERDICT r2 next #3).

Measures, each as its own in-graph fori loop on the chip (CLAUDE.md timing
rules): the full jitted step, then standalone graphs for (a) generator
forward, (b) D substep (loss+grad+adam), (c) E distillation substep,
(d) G substep (loss through D+student, generator backward, adam), and
finally forward+backward timings for every ≤32-output-channel conv in the
step (HED score heads / fusion, PatchGAN final, generator stem+RGB) vs their
MXU-ideal times — the round-2 open question whether the 3-lane disease
fastconv fixed for inference also bites under grad.

Run AFTER bench.py finishes (one chip; serialize TPU work).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, HW = 10, 256
PEAK_TFLOPS = 197.0


def bench_graph(fn, args, iters, reps=3):
    jfn = jax.jit(fn)
    out = jax.device_get(jfn(*args))
    assert np.all(np.isfinite(np.asarray(out))), "non-finite"
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def loop(body, iters):
    def fn(*args):
        def b(i, acc):
            return acc + body(i, *args)
        return jax.lax.fori_loop(0, iters, b, jnp.float32(0.0))
    return fn, iters


def build():
    from gandtr_tpu.learning.network import build_model_set
    from gandtr_tpu.learning.optimizers import initialize_optimizer
    from gandtr_tpu.learning import gan_steps

    hed = {"model": {"architecture": "hed_interpolation"},
           "runtime": {"wrappers": "rgb2bgr_pre", "data": {},
                       "dtype": "bfloat16"}}
    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture":
                                     "official_resnet_generator",
                                     "n_blocks": 9, "norm_layer": "batch",
                                     "no_antialias": True,
                                     "no_antialias_up": True},
                           "runtime": {"wrappers": "", "data": {},
                                       "dtype": "bfloat16"}},
           "detector": dict(hed),
           "detector_frozen": {**hed, "runtime": {**hed["runtime"],
                                                  "frozen": True}},
           "discriminator_Y": {"model": {"architecture":
                                         "official_p2p_discriminator",
                                         "norm_layer": "batch"},
                               "runtime": {"wrappers": "", "data": {},
                                           "dtype": "bfloat16"}}}
    ms, _ = build_model_set(cfg)
    x0 = jnp.zeros((B, HW, HW, 3), jnp.float32)
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    variables["detector_frozen"] = variables["detector"]
    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y", "detector")}
    state = gan_steps.make_gan_state(variables, optimizers)
    step = gan_steps.build_hedngan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5, "hed": 1})
    return ms, variables, optimizers, state, step


def main():
    from gandtr_tpu.learning import gan_steps
    from gandtr_tpu.learning.gan_steps import _apply, _update, _d_loss
    from gandtr_tpu.ops import losses as L

    ms, variables, optimizers, state, step = build()
    G, D = ms.nets["generator_X"], ms.nets["discriminator_Y"]
    H_s, H_t = ms.nets["detector"], ms.nets["detector_frozen"]

    X = jax.random.uniform(jax.random.PRNGKey(1), (B, HW, HW, 3)) * 2 - 1
    Y = jax.random.uniform(jax.random.PRNGKey(2), (B, HW, HW, 3)) * 2 - 1
    fake = jax.random.uniform(jax.random.PRNGKey(3), (B, HW, HW, 3)) * 2 - 1

    IT = 5

    # --- full step ---
    def full_body(i, st_x, st_y):
        s2, _, _ = step(state, st_x + i.astype(st_x.dtype) * 1e-5, st_y)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in
                   jax.tree_util.tree_leaves(
                       s2.variables["generator_X"]["params"]))
    fn, it = loop(full_body, IT)
    t_full = bench_graph(fn, (X, Y), it)
    print("full step: %.2f ms (%.1f img/s)" % (t_full * 1e3, B / t_full),
          flush=True)

    # --- (a) generator forward only ---
    def g_fwd_body(i, x):
        fy, _ = _apply(G, variables["generator_X"],
                       x + i.astype(x.dtype) * 1e-5, train=True)
        return jnp.sum(fy.astype(jnp.float32))
    fn, it = loop(g_fwd_body, IT)
    t_gf = bench_graph(fn, (X,), it)
    print("G forward: %.2f ms" % (t_gf * 1e3), flush=True)

    # --- (b) D substep ---
    def d_body(i, ry, fy):
        d_loss_fn = _d_loss(ms.nets, variables, "discriminator_Y",
                            ry + i.astype(ry.dtype) * 1e-5, fy, 1.0)
        (dl, _), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            variables["discriminator_Y"]["params"])
        d_params, _ = _update(optimizers["discriminator_Y"],
                              state.opt_states["discriminator_Y"], d_grads,
                              variables["discriminator_Y"]["params"])
        return dl + sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(d_params))
    fn, it = loop(d_body, IT)
    t_d = bench_graph(fn, (Y, fake), it)
    print("D substep: %.2f ms" % (t_d * 1e3), flush=True)

    # --- (c) E distillation substep ---
    def e_body(i, x, fy):
        x = x + i.astype(x.dtype) * 1e-5
        target_M = jax.lax.stop_gradient(
            H_t.apply(variables["detector_frozen"], x, train=False,
                      no_sigmoid=True))

        def e_loss_fn(h_params):
            hvar = {**variables["detector"], "params": h_params}
            real_M = H_s.apply(hvar, x, train=False, no_sigmoid=True)
            fake_M = H_s.apply(hvar, fy, train=False, no_sigmoid=True)
            return L.l1_loss(real_M, target_M) + L.l1_loss(fake_M, target_M)

        el, e_grads = jax.value_and_grad(e_loss_fn)(
            variables["detector"]["params"])
        h_params, _ = _update(optimizers["detector"],
                              state.opt_states["detector"], e_grads,
                              variables["detector"]["params"])
        return el + sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(h_params))
    fn, it = loop(e_body, IT)
    t_e = bench_graph(fn, (X, fake), it)
    print("E substep (incl. teacher fwd): %.2f ms" % (t_e * 1e3), flush=True)

    # --- (d) G substep: vjp-retained forward + loss through D+student +
    #         generator backward + adam ---
    def g_body(i, x, tm):
        x = x + i.astype(x.dtype) * 1e-5

        def g_fwd(g_params):
            gvar = {**variables["generator_X"], "params": g_params}
            fy, bs = _apply(G, gvar, x, train=True)
            return fy, bs

        fy, g_vjp, _ = jax.vjp(g_fwd, variables["generator_X"]["params"],
                               has_aux=True)
        real_E = jax.lax.stop_gradient(jax.nn.sigmoid(tm))

        def g_loss_from_fy(fyy):
            pred_fake, _ = _apply(D, variables["discriminator_Y"], fyy,
                                  train=True)
            fake_E = H_s.apply(variables["detector"], fyy, train=False)
            adv, _ = L.discriminator_loss(pred_fake, True, L.mse_loss)
            return adv + 5.0 * L.l1_loss(fake_E, real_E)

        gl, dfy = jax.value_and_grad(g_loss_from_fy)(fy)
        (g_grads,) = g_vjp(dfy)
        g_params, _ = _update(optimizers["generator_X"],
                              state.opt_states["generator_X"], g_grads,
                              variables["generator_X"]["params"])
        return gl + sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(g_params))

    tm0 = H_t.apply(variables["detector_frozen"], X, train=False,
                    no_sigmoid=True)
    fn, it = loop(g_body, IT)
    t_g = bench_graph(fn, (X, tm0), it)
    print("G substep (fwd+loss+bwd+adam): %.2f ms" % (t_g * 1e3), flush=True)

    print("sum of substeps (D+E+G): %.2f ms vs full %.2f ms"
          % ((t_d + t_e + t_g) * 1e3, t_full * 1e3), flush=True)

    lane_audit()


def conv_ideal_ms(n, h, w, cin, cout, k, dtype_factor=1.0):
    flops = 2.0 * n * h * w * cin * cout * k * k
    return flops / (PEAK_TFLOPS * 1e12) * 1e3 * dtype_factor


def lane_audit():
    """Forward AND forward+backward timing for each few-lane conv of the
    step, vs its MXU-ideal. Grad of a conv needs dL/dx (conv with cin/cout
    swapped — 3-lane disease when cin is small) and dL/dW."""
    import flax.linen as nn

    cases = [
        # (label, N, H, W, cin, cout, k, stride)
        ("gen stem 7x7 3->64", B, 262, 262, 3, 64, 7, 1),
        ("gen RGB 7x7 64->3", B, 262, 262, 64, 3, 7, 1),
        ("HED score 1x1 64->1", B, 256, 256, 64, 1, 1, 1),
        ("HED score 1x1 512->1", B, 32, 32, 512, 1, 1, 1),
        ("HED fusion 1x1 5->1", B, 256, 256, 5, 1, 1, 1),
        ("PatchGAN final 4x4 512->1", B, 31, 31, 512, 1, 4, 1),
        ("D stem 4x4 3->64 s2", B, 256, 256, 3, 64, 4, 2),
    ]
    IT = 20
    for label, n, h, w, cin, cout, k, s in cases:
        conv = nn.Conv(cout, (k, k), strides=(s, s), padding="VALID")
        x = jax.random.uniform(jax.random.PRNGKey(0), (n, h, w, cin),
                               jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(1), x)

        def fwd_body(i, xx):
            y = conv.apply(v, xx + i.astype(xx.dtype) * jnp.bfloat16(1e-3))
            return jnp.sum(y.astype(jnp.float32))
        fn, it = loop(fwd_body, IT)
        t_f = bench_graph(fn, (x,), it)

        def fb_body(i, xx):
            def loss(params, z):
                y = conv.apply(params, z)
                return jnp.sum(y.astype(jnp.float32))
            gl, (gv, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                v, xx + i.astype(xx.dtype) * jnp.bfloat16(1e-3))
            return gl + sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree_util.tree_leaves(gv)) \
                + jnp.sum(gx.astype(jnp.float32))
        fn, it = loop(fb_body, IT)
        t_fb = bench_graph(fn, (x,), it)

        ho = (h - k) // s + 1
        wo = (w - k) // s + 1
        ideal_f = conv_ideal_ms(n, ho, wo, cin, cout, k)
        print("%-28s fwd %7.3f ms (ideal %6.3f, %4.1f%%)  fwd+bwd %7.3f ms "
              "(ideal %6.3f, %4.1f%%)"
              % (label, t_f * 1e3, ideal_f, 100 * ideal_f / (t_f * 1e3),
                 t_fb * 1e3, 3 * ideal_f,
                 100 * 3 * ideal_f / (t_fb * 1e3)), flush=True)


if __name__ == "__main__":
    main()
