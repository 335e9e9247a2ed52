"""Optax optimizers with torch-equivalent semantics.

Mirrors /root/reference/mdir/components/optim/optimizer/base_optimizers.py:
adam(lr, beta1, beta2, weight_decay) and sgd(lr, momentum, weight_decay), where
weight_decay is torch-style L2 added to the gradient (not decoupled AdamW).
Learning-rate schedule factors are injected per epoch via
`optax.inject_hyperparams` (see schedules.py) — the functional analog of the
reference's per-epoch `scheduler.step()`.

Per-parameter-group LR/decay multipliers (cirnet pool-p ×10, HED group table —
cirnet.py:11-33, hed.py:98-112; MultiheadNetwork config-level groups,
network.py:764,844) are expressed as per-leaf multiplier pytrees passed via
`initialize_optimizer(..., group_mults=(lr_tree, wd_tree))`: decay is added
per-leaf BEFORE the moment updates and the LR multiplier scales per-leaf AFTER
`scale_by_learning_rate` — exactly torch's per-group `lr`/`weight_decay`
semantics. Build with `param_group_mults` (architecture tables) or
`multihead_group_mults` (config parameter_groups).
"""
from typing import Any, NamedTuple

import optax
import jax
import jax.numpy as jnp


def _decay_per_leaf(weight_decay, wd_mults):
    """Torch-style coupled L2 with a per-leaf decay multiplier (the reference
    parameter groups carry `weight_decay: mult * wd`)."""
    def update_fn(updates, state, params):
        assert params is not None, "per-group weight decay needs params"
        upd = jax.tree_util.tree_map(
            lambda u, p, m: u + (weight_decay * m) * p,
            updates, params, wd_mults)
        return upd, state
    return optax.GradientTransformation(
        lambda _: optax.EmptyState(), update_fn)


def _scale_per_leaf(lr_mults):
    """Per-leaf multiplier on the FINAL update — the exact analog of torch
    per-group lr (adam/sgd updates are linear in lr, so scaling after the
    moments equals running the group at lr_mult * lr)."""
    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(
            lambda u, m: u * m, updates, lr_mults), state
    return optax.GradientTransformation(
        lambda _: optax.EmptyState(), update_fn)


def adam(learning_rate, beta1=0.9, beta2=0.999, weight_decay=0.0, eps=1e-8,
         group_mults=None):
    lr_mults, wd_mults = group_mults or (None, None)
    chain = []
    if weight_decay:
        chain.append(_decay_per_leaf(weight_decay, wd_mults)
                     if wd_mults is not None
                     else optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    if lr_mults is not None:
        chain.append(_scale_per_leaf(lr_mults))
    return optax.chain(*chain)


def sgd(learning_rate, momentum=0.0, weight_decay=0.0, group_mults=None):
    lr_mults, wd_mults = group_mults or (None, None)
    chain = []
    if weight_decay:
        chain.append(_decay_per_leaf(weight_decay, wd_mults)
                     if wd_mults is not None
                     else optax.add_decayed_weights(weight_decay))
    if momentum:
        chain.append(optax.trace(decay=momentum))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    if lr_mults is not None:
        chain.append(_scale_per_leaf(lr_mults))
    return optax.chain(*chain)


OPTIMIZERS = {"adam": adam, "sgd": sgd}


def initialize_optimizer(params, group_mults=None):
    """Build an inject_hyperparams-wrapped optimizer from a reference-style
    config dict: {algorithm, lr, beta1, beta2, weight_decay, ...}.

    `group_mults`, when given, is the `(lr_mults, wd_mults)` pair of pytrees
    from `param_group_mults` — the torch param-group semantics of the
    reference's `model.parameter_groups(optimizer_opts)`
    (network.py:66-72).

    Returns an optax.GradientTransformation whose opt_state exposes
    `hyperparams['learning_rate']` for per-epoch schedule updates.
    """
    params = dict(params)
    algorithm = params.pop("algorithm")
    lr = float(params.pop("lr"))

    if algorithm == "adam":
        def make_adam(learning_rate, beta1, beta2, weight_decay, eps=1e-8):
            return adam(learning_rate, beta1, beta2, weight_decay, eps,
                        group_mults=group_mults)
        factory = optax.inject_hyperparams(
            make_adam, static_args=("beta1", "beta2", "weight_decay", "eps"))
        return factory(learning_rate=lr,
                       beta1=float(params.pop("beta1", 0.9)),
                       beta2=float(params.pop("beta2", 0.999)),
                       weight_decay=float(params.pop("weight_decay", 0.0))), lr
    if algorithm == "sgd":
        def make_sgd(learning_rate, momentum, weight_decay):
            return sgd(learning_rate, momentum, weight_decay,
                       group_mults=group_mults)
        factory = optax.inject_hyperparams(
            make_sgd, static_args=("momentum", "weight_decay"))
        return factory(learning_rate=lr,
                       momentum=float(params.pop("momentum", 0.0)),
                       weight_decay=float(params.pop("weight_decay", 0.0))), lr
    raise NotImplementedError(algorithm)


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate in-place (returns new state pytree)."""
    if isinstance(opt_state, AlternationState):
        return opt_state._replace(inner=set_learning_rate(opt_state.inner, lr))
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


class AlternationState(NamedTuple):
    count: Any   # () int32 — training-step counter (shared semantics)
    inner: Any   # wrapped optimizer state


def alternation_active(count, index, n_optimizers, alternate_iteration):
    """Whether member `index` is the active optimizer at 0-based training
    step `count`, per the reference OptimizerAlternation.step() arithmetic
    (/root/reference/mdir/components/optim/optimizer/optimizer_compositions.py:39-47):
    the current optimizer advances every `alternate_iteration` calls, so
    active(t) = (t // n) % K. 0/None = all active every step; negative n
    behaves like abs(n): Python's negative-divisor modulo makes
    `current_iteration % n == 0` true exactly every |n| calls (t % -2 is 0
    for even t), so the rotation cadence is |n| — the \"-1 = only one
    optimizer\" comment does not match the code, and the code is
    authoritative."""
    n = alternate_iteration
    if n in (None, 0):
        return jnp.asarray(True)
    n = abs(int(n))
    return (jnp.asarray(count, jnp.int32) // n) % n_optimizers == index


def alternate_gate(tx, index, n_optimizers, alternate_iteration):
    """Wrap member `index` of a round-robin OptimizerAlternation.

    Jit-friendly functional form of the reference's stateful rotation: every
    wrapped optimizer's update() runs each training step (the steps call all
    optimizers unconditionally), but an inactive member emits ZERO updates
    and keeps its inner state untouched — exactly \"step() was not called\",
    including torch-adam bias-correction counts. The step counter lives in
    the state, so resume restores the rotation phase.
    """
    import optax as _optax

    def init(params):
        return AlternationState(count=jnp.zeros((), jnp.int32),
                                inner=tx.init(params))

    def update(grads, state, params=None):
        active = alternation_active(state.count, index, n_optimizers,
                                    alternate_iteration)
        new_updates, new_inner = tx.update(grads, state.inner, params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(active, u, jnp.zeros_like(u)), new_updates)
        inner = jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), new_inner, state.inner)
        return updates, AlternationState(count=state.count + 1, inner=inner)

    return _optax.GradientTransformation(init, update)


# --- reference parameter-group semantics -----------------------------------
#
# The reference wires per-module lr/weight-decay multipliers through
# `model.parameter_groups(optimizer_opts)` (network.py:66-72). Two model
# families define them:
#  - cirnet (cirnet.py:11-33,79-82,127-131): GeM pool p at lr x10 / wd 0,
#    EdgeFilter preprocessing at lr x10, attention at lr x100, rest x1;
#  - HED (hed.py:86-112): per-layer lr_mult {conv.w 1, conv.b 2, conv5.w 100,
#    conv5.b 200, score.w .01, score.b .02, fusion.w .001, fusion.b .002} and
#    decay_mult {weights 1, biases 0}.
# RCF and the p2p GAN nets have NO groups (flat optimizer).

CIRNET_GROUP_ARCHS = ("cirnet", "cirnet_inchan", "cirnet_attention",
                      "gem_retrieval")
HED_GROUP_ARCHS = ("hed_interpolation",)


def _cirnet_leaf_mults(keys):
    if keys[-1] == "gem_p":
        return 10.0, 0.0
    if keys[0] == "preprocessing":
        return 10.0, 1.0
    if keys[0] == "attention":
        return 100.0, 1.0
    return 1.0, 1.0


def _hed_leaf_mults(keys):
    top, leaf = keys[0], keys[-1]
    is_weight = leaf != "bias"
    if top.startswith("vgg5"):
        return (100.0, 1.0) if is_weight else (200.0, 0.0)
    if top.startswith("vgg"):
        return (1.0, 1.0) if is_weight else (2.0, 0.0)
    if top.startswith("score"):
        return (0.01, 1.0) if is_weight else (0.02, 0.0)
    if top.startswith("fusion"):
        return (0.001, 1.0) if is_weight else (0.002, 0.0)
    raise KeyError("HED parameter not recognized %r (hed.py:96)"
                   % "/".join(keys))


def multihead_group_mults(parameter_groups, variables):
    """Reference MultiheadNetwork config-level groups (network.py:764,
    482-496): `parameter_groups` maps subnet name -> {"lr": mult,
    "weight_decay": mult}; every leaf of that subnet's params gets the
    multiplier (missing nets/keys default to 1.0). `variables` is the
    multihead variables dict {'base': {...}, '<head>': {...}}; returns
    (lr_mults, wd_mults) trees over {name: variables[name]['params']}."""
    params = {name: v["params"] for name, v in variables.items()}

    def tree_for(idx):
        return {
            name: jax.tree_util.tree_map(
                lambda _: float(parameter_groups.get(name, {}).get(
                    ("lr", "weight_decay")[idx], 1.0)), sub)
            for name, sub in params.items()}
    return tree_for(0), tree_for(1)


def param_group_mults(architecture, params):
    """(lr_mults, wd_mults) pytrees matching `params` for architectures the
    reference gives parameter groups, else None."""
    if architecture in CIRNET_GROUP_ARCHS:
        classify = _cirnet_leaf_mults
    elif architecture in HED_GROUP_ARCHS:
        classify = _hed_leaf_mults
    else:
        return None

    def keys_of(path):
        return [getattr(e, "key", getattr(e, "name", str(e))) for e in path]

    lr = jax.tree_util.tree_map_with_path(
        lambda p, _: classify(keys_of(p))[0], params)
    wd = jax.tree_util.tree_map_with_path(
        lambda p, _: classify(keys_of(p))[1], params)
    return lr, wd
