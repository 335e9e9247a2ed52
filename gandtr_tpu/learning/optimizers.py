"""Optax optimizers with torch-equivalent semantics.

Mirrors /root/reference/mdir/components/optim/optimizer/base_optimizers.py:
adam(lr, beta1, beta2, weight_decay) and sgd(lr, momentum, weight_decay), where
weight_decay is torch-style L2 added to the gradient (not decoupled AdamW).
Learning-rate schedule factors are injected per epoch via
`optax.inject_hyperparams` (see schedules.py) — the functional analog of the
reference's per-epoch `scheduler.step()`.

Per-parameter-group LR/decay multipliers (cirnet pool-p ×10, HED group table —
cirnet.py:11-33, hed.py:98-112) are expressed with `lr_mult_labels` masks.
"""
import optax
import jax


def adam(learning_rate, beta1=0.9, beta2=0.999, weight_decay=0.0, eps=1e-8):
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def sgd(learning_rate, momentum=0.0, weight_decay=0.0):
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        chain.append(optax.trace(decay=momentum))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


OPTIMIZERS = {"adam": adam, "sgd": sgd}


def initialize_optimizer(params):
    """Build an inject_hyperparams-wrapped optimizer from a reference-style
    config dict: {algorithm, lr, beta1, beta2, weight_decay, ...}.

    Returns an optax.GradientTransformation whose opt_state exposes
    `hyperparams['learning_rate']` for per-epoch schedule updates.
    """
    params = dict(params)
    algorithm = params.pop("algorithm")
    lr = float(params.pop("lr"))
    if algorithm == "adam":
        factory = optax.inject_hyperparams(
            adam, static_args=("beta1", "beta2", "weight_decay", "eps"))
        return factory(learning_rate=lr,
                       beta1=float(params.pop("beta1", 0.9)),
                       beta2=float(params.pop("beta2", 0.999)),
                       weight_decay=float(params.pop("weight_decay", 0.0))), lr
    if algorithm == "sgd":
        factory = optax.inject_hyperparams(
            sgd, static_args=("momentum", "weight_decay"))
        return factory(learning_rate=lr,
                       momentum=float(params.pop("momentum", 0.0)),
                       weight_decay=float(params.pop("weight_decay", 0.0))), lr
    raise NotImplementedError(algorithm)


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate in-place (returns new state pytree)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def multiplied(base, lr_mults, params_labels):
    """Per-group LR multipliers applied to the final update (matching torch
    param groups, where each group has its own lr — for Adam this must scale
    the post-moment update, not the gradient).

    `params_labels` is a pytree (same structure as params) of string labels;
    `lr_mults` maps label -> multiplier. Unlabeled leaves get 1.0.
    """
    def scale_fn(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map(
            lambda u, lbl: u * lr_mults.get(lbl, 1.0), updates, params_labels)
        return scaled, state
    post = optax.GradientTransformation(lambda p: optax.EmptyState(), scale_fn)
    return optax.chain(base, post)
