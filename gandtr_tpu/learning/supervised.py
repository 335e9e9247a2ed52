"""Supervised / metric-learning train steps (the reference's SupervisedEpoch
with fakebatch, /root/reference/mdir/learning/epoch_iteration/
supervised_epoch.py:50-107, specialized for the GeM fine-tune with
GAN-augmentation-in-the-loop, SURVEY.md §3.2).

TPU-first redesign:
- the whole augment→CLAHE→embed→contrastive chain is ONE compiled graph —
  the reference's per-image CPU ClahePost round-trip (wrapper.py:325-348)
  becomes the on-device ClahePost wrapper;
- "fakebatch" grad accumulation becomes a `lax.scan` over tuples with
  rematerialization (jax.checkpoint), trading FLOPs for memory exactly like
  per-image backward did;
- the md5-name augmentation gating arrives as a per-image boolean `pass_mask`
  computed on host (deterministic, wrappers.cir_hash_passthrough);
- tuple images are padded to a static bucket shape with validity masks
  (masked GeM) instead of per-image dynamic shapes.
"""
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
import flax.struct

from gandtr_tpu.ops import losses as L


@flax.struct.dataclass
class FinetuneState:
    variables: Dict[str, Any]   # {'embed': vars, 'augment': vars}
    opt_state: Any
    rng: Any
    step: Any


def make_finetune_state(variables, optimizer, seed=0):
    return FinetuneState(variables=variables,
                         opt_state=optimizer.init(variables["embed"]["params"]),
                         rng=jax.random.PRNGKey(seed),
                         step=jnp.zeros((), jnp.int32))


def build_finetune_step(models, optimizer, margin=0.75, fakebatch=True,
                        criterion=None, augment_positions=None):
    """models: {'embed': WrappedNet(GemRetrievalNet), 'augment':
    WrappedNet(generator, frozen, wrappers=[meanstd_post, clahepost,
    cir_ratio_pass_through])}.

    Returns step(state, images, masks, labels, pass_mask):
      images:    (T, S, H, W, C) tuple batches, generator-normalized (0.5/0.5)
      masks:     (T, S, H, W) validity masks (padded-bucket mode) or None
      labels:    (T, S) float: -1 query, 1 positive, 0 negative
      pass_mask: (T, S) bool: GAN-augmentation gate per image

    `augment_positions` (static, e.g. (0,)) restricts the generator module to
    the tuple positions whose label the ratio gate can ever match (the anchor
    under the published 'anc' gate): identical results — `pass_mask` is
    False elsewhere by construction (cir_datasets.py tuple layout) — at 1/S
    of the generator FLOPs. Wrappers (CLAHE, meanstd) still see every image,
    matching the reference postprocess chain (wrapper.py:120-146,325-348).
    """
    embed = models["embed"]
    augment = models.get("augment")
    if criterion is None:
        crit_fn = lambda d, l: L.contrastive_loss(d, l, num_tuples=1,
                                                  margin=margin)
    else:
        # configurable criterion (learning/criteria.py CRITERIA): any
        # (D x N, label) -> scalar callable, e.g. ContrastiveLoss/TripletLoss
        crit_fn = lambda d, l: criterion(d, l, num_tuples=1)

    def tuple_loss(embed_params, variables, imgs, msk, lbl, pmask):
        """Tuple metric loss (S images) through the configured criterion."""
        x = imgs
        if augment is not None:
            ctx = {"pass_mask": pmask}
            out = augment.apply(variables["augment"], x, train=True, ctx=ctx,
                                model_positions=augment_positions, mask=msk)
            if isinstance(out, tuple):
                # exact padded-bucket mode: the generator changes the valid
                # rectangle (4·ceil arithmetic) and the ratio gate blends it
                # per image — embed must pool over the UPDATED rectangle
                x, msk = out
            else:
                x = out
            x = jax.lax.stop_gradient(x)  # frozen generator branch
        evar = {**variables["embed"], "params": embed_params}
        descs = embed.apply(evar, x, train=True, mask=msk)  # (S, D)
        return crit_fn(descs.T, lbl)

    def step(state, images, masks, labels, pass_mask):
        rng, _ = jax.random.split(state.rng)
        T = images.shape[0]
        variables = state.variables

        if fakebatch:
            # scan over tuples, rematerialized — grad accumulation like the
            # reference's per-tuple backward (supervised_epoch.py:58-76)
            loss_fn = jax.checkpoint(tuple_loss, static_argnums=())

            def body(carry, inp):
                grads_acc, loss_acc = carry
                imgs, msk, lbl, pm = inp
                loss, grads = jax.value_and_grad(loss_fn)(
                    variables["embed"]["params"], variables, imgs, msk, lbl, pm)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), None

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, variables["embed"]["params"])
            (grads, total_loss), _ = jax.lax.scan(
                body, (zero_grads, 0.0),
                (images, masks, labels, pass_mask))
        else:
            def batch_loss(embed_params):
                losses = jax.vmap(
                    lambda i, m, l, p: tuple_loss(embed_params, variables, i, m, l, p)
                )(images, masks, labels, pass_mask)
                return jnp.sum(losses)

            total_loss, grads = jax.value_and_grad(batch_loss)(
                variables["embed"]["params"])

        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            variables["embed"]["params"])
        new_params = optax.apply_updates(variables["embed"]["params"], updates)
        new_variables = {**variables,
                         "embed": {**variables["embed"], "params": new_params}}
        metrics = {"total": total_loss / T}  # reported averaged (fakebatch
        # batch_average=False path, supervised_epoch.py:78-80)
        return (FinetuneState(variables=new_variables, opt_state=new_opt,
                              rng=rng, step=state.step + 1), metrics)

    return step


def build_embed_fn(models, multiscale=None, whiten=None):
    """Descriptor-extraction forward for validation/mining/eval: embeds a
    batch (optionally masked) without augmentation."""
    embed = models["embed"] if isinstance(models, dict) else models

    def embed_fn(variables, images, masks=None):
        var = variables["embed"] if isinstance(variables, dict) and "embed" in variables else variables
        return embed.apply(var, images, train=False, mask=masks)

    return embed_fn
