"""Configurable criterion layer: the reference's `optim/criterion` registry
(mdir/components/optim/criterion/__init__.py:4-26) rebuilt as pure callables.

Reference semantics preserved:
- base losses default to mean reduction; BCE detaches its target
  (base_losses.py:22-23); BCEWithLogitsLoss accepts a float pos_weight.
- cir losses (cirlosses.py:7-59): sum reduction, D x N column-descriptor
  layout, label lists concatenated; ContrastiveLossMultipleDescriptors
  weights per-descriptor losses (equal split when weights is None).
- compound losses (compound_losses.py): DiscriminatorLoss builds inverted
  targets (real->0, fake->1, :47-50) and sums multiscale lists with
  "layer<i>" partial keys counted from the END of the list (:37-42);
  MultiheadLoss/CombinationLoss weight dict-keyed sub-losses (scalar weight
  broadcast, optional normalization, :65-97); MultilayerPatchNCELoss averages
  per-layer means scaled by `weight` (:157-173).
- CycleLoss / LossSet are *containers*: the reference raises on forward()
  ("handled manually through epoch") — here they expose their sub-criteria
  for the jitted GAN step builders (learning/gan_steps.py) to consume.

Loss values: `TotalWithIntermediate` mirrors mdir/tools/loss_value.py:36-117
as a jit-transparent pytree (total + flat partial dict, nested flattening
with "<k>:<sub>" keys); `ZERO` is the algebraic identity (:9-27).

All criteria are dataclass callables whose config is static at trace time, so
any of them can be closed over inside `jax.jit`.
"""
import dataclasses

import jax
import jax.numpy as jnp

from gandtr_tpu.ops import losses as L


# ---------------------------------------------------------------------------
# loss values


class Zero:
    """Algebraic identity: first addition replaces it with the other operand
    (loss_value.py:9-27)."""

    def __add__(self, obj):
        return obj

    def __radd__(self, obj):
        return obj

    def __sub__(self, obj):
        return -obj

    def __mul__(self, obj):
        return self

    def __truediv__(self, obj):
        return self

    def __str__(self):
        return "Zero()"


ZERO = Zero()


@jax.tree_util.register_pytree_node_class
class TotalWithIntermediate:
    """Total + flattened intermediate values (loss_value.py:36-117).

    Registered as a pytree: flows through jit/grad; arithmetic applies to the
    total and broadcasts over partials the way the reference's operator
    overloads do (total-only semantics for scalar ops).
    """

    def __init__(self, total, **partial):
        self.total = total
        self.partial = self._flatten(partial)

    @classmethod
    def from_partial(cls, **partial):
        flat = cls._flatten(partial)
        total = ZERO
        for v in flat.values():
            total = total + v
        return cls(total, **flat)

    @staticmethod
    def _flatten(partial):
        # loss_value.py:57-65: nested partials flatten to "<k>.<sub>" keys and
        # the nested TOTAL is kept under the parent key too.
        flat = {}
        for key, value in partial.items():
            if isinstance(value, TotalWithIntermediate):
                for sub, v in value.partial.items():
                    flat["%s.%s" % (key, sub)] = v
                value = value.total
            flat[key] = value
        return flat

    # arithmetic (loss_value.py:79-117): + / - require matching keys and act
    # elementwise; * and / accept scalars and scale partials too; ops with a
    # raw array act on the total alone.
    def __add__(self, other):
        if isinstance(other, TotalWithIntermediate):
            assert self.partial.keys() == other.partial.keys()
            merged = {k: self.partial[k] + other.partial[k]
                      for k in self.partial}
            return TotalWithIntermediate(self.total + other.total, **merged)
        if isinstance(other, Zero):
            return self
        return self.total + other

    def __radd__(self, other):
        if isinstance(other, Zero):
            return self
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, TotalWithIntermediate):
            assert self.partial.keys() == other.partial.keys()
            merged = {k: self.partial[k] - other.partial[k]
                      for k in self.partial}
            return TotalWithIntermediate(self.total - other.total, **merged)
        return self.total - other

    def __mul__(self, other):
        merged = {k: v * other for k, v in self.partial.items()}
        return TotalWithIntermediate(self.total * other, **merged)

    __rmul__ = __mul__

    def __truediv__(self, other):
        merged = {k: v / other for k, v in self.partial.items()}
        return TotalWithIntermediate(self.total / other, **merged)

    def __float__(self):
        return float(self.total)

    def item(self):
        return float(self.total)

    def as_dict(self, prefix="loss"):
        out = {prefix: self.total}
        for k, v in self.partial.items():
            out["%s/%s" % (prefix, k)] = v
        return out

    def tree_flatten(self):
        keys = tuple(sorted(self.partial))
        return (self.total,) + tuple(self.partial[k] for k in keys), keys

    @classmethod
    def tree_unflatten(cls, keys, children):
        obj = cls.__new__(cls)
        obj.total = children[0]
        obj.partial = dict(zip(keys, children[1:]))
        return obj


# ---------------------------------------------------------------------------
# base losses (base_losses.py)


def _reduce(d, reduction):
    """torch reduction semantics: mean / sum / none (the reference forwards
    the kwarg to the torch losses; ignoring it silently rescaled configured
    losses — found by review)."""
    if reduction == "mean":
        return jnp.mean(d)
    if reduction == "sum":
        return jnp.sum(d)
    if reduction == "none":
        return d
    raise ValueError("unknown reduction %r" % (reduction,))


@dataclasses.dataclass
class L1Loss:
    reduction: str = "mean"

    def __call__(self, x, target):
        # torch tie subgradient (0 at exact zeros) — see ops/losses.l1_loss
        d = x - target
        return _reduce(jnp.where(d == 0, 0.0, jnp.abs(d)), self.reduction)


@dataclasses.dataclass
class MSELoss:
    reduction: str = "mean"

    def __call__(self, x, target):
        return _reduce((x - target) ** 2, self.reduction)


@dataclasses.dataclass
class BCELoss:
    """Detaches target (base_losses.py:22-23)."""
    reduction: str = "mean"

    def __call__(self, p, target):
        target = jax.lax.stop_gradient(target)
        eps = 1e-12
        p = jnp.clip(p, eps, 1.0 - eps)
        d = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
        return _reduce(d, self.reduction)


@dataclasses.dataclass
class BCEWithLogitsLoss:
    pos_weight: float = None
    reduction: str = "mean"

    def __call__(self, logits, target):
        log_p = jax.nn.log_sigmoid(logits)
        log_not_p = jax.nn.log_sigmoid(-logits)
        if self.pos_weight is None:
            d = -(target * log_p + (1.0 - target) * log_not_p)
        else:
            d = -(self.pos_weight * target * log_p
                  + (1.0 - target) * log_not_p)
        return _reduce(d, self.reduction)


# ---------------------------------------------------------------------------
# cir losses (cirlosses.py)


def _concat_label(label):
    if isinstance(label, (list, tuple)):
        label = jnp.concatenate([jnp.asarray(l) for l in label])
    return label


@dataclasses.dataclass
class ContrastiveLoss:
    """Sum-reduced contrastive over D x N column descriptors. The deprecated
    eps parameter is accepted and ignored (cirlosses.py:12-15)."""
    margin: float = 0.7
    eps: float = None
    reduction: str = "sum"

    def __call__(self, x, label, num_tuples=1):
        return L.contrastive_loss(x, _concat_label(label), num_tuples,
                                  margin=self.margin)


@dataclasses.dataclass
class ContrastiveLossMultipleDescriptors(ContrastiveLoss):
    """Weighted sum over a list of descriptor matrices (cirlosses.py:22-45)."""
    weights: object = None

    def __call__(self, x, label, num_tuples=1):
        if not isinstance(x, list):
            return super().__call__(x, label, num_tuples)
        weights = self.weights
        if isinstance(weights, str):
            weights = [float(w) for w in weights.split(",")]
        if weights is None:
            weights = [1.0 / len(x)] * len(x)
        assert len(weights) == len(x), (len(weights), len(x))
        partial = {}
        total = ZERO
        for i, xi in enumerate(x):
            loss = super().__call__(xi, label, num_tuples)
            partial[str(i)] = loss
            total = total + weights[i] * loss
        return TotalWithIntermediate(total, **partial)


@dataclasses.dataclass
class TripletLoss:
    margin: float = 0.1
    reduction: str = "sum"

    def __call__(self, x, label, num_tuples=1):
        return L.triplet_loss(x, _concat_label(label), num_tuples,
                              margin=self.margin)


# ---------------------------------------------------------------------------
# compound losses (compound_losses.py)


class CycleLoss:
    """Container of the four CycleGAN sub-criteria (compound_losses.py:10-23);
    consumed by build_cyclegan_step, never called directly."""

    def __init__(self, loss_G_X, loss_G_Y, loss_D_X, loss_D_Y):
        self.loss_G_X = initialize_criterion(dict(loss_G_X))
        self.loss_G_Y = initialize_criterion(dict(loss_G_Y))
        self.loss_D_X = initialize_criterion(dict(loss_D_X))
        self.loss_D_Y = initialize_criterion(dict(loss_D_Y))
        self.reduction = "mixed"

    def __call__(self, *inputs):
        raise NotImplementedError(
            "CycleLoss sub-criteria are consumed by the cyclegan step builder")


class DiscriminatorLoss:
    """Adversarial loss with the reference's inverted targets (real->0,
    fake->1, compound_losses.py:47-50) and multiscale list summation with
    end-counted layer keys (:37-42)."""

    def __init__(self, criterion):
        self.criterion = initialize_criterion(dict(criterion))
        self.reduction = "mixed"

    def __call__(self, output, is_target_real):
        if isinstance(output, list):
            total = ZERO
            partial = {}
            for i, y in enumerate(output):
                key = "layer" + str(len(output) - 1 - i)
                partial[key] = self.criterion(
                    y, L.adversarial_target(y.shape, is_target_real, y.dtype))
                total = total + partial[key]
            return TotalWithIntermediate(total, **partial)
        total = self.criterion(
            output, L.adversarial_target(output.shape, is_target_real,
                                         output.dtype))
        return TotalWithIntermediate(total)


class LossSet:
    """Named sub-criteria container (compound_losses.py:55-64); epochs pull
    members by name."""

    def __init__(self, **losses):
        self.losses = {k: initialize_criterion(dict(v))
                       for k, v in losses.items()}
        self.loss_names = set(losses.keys())
        self.reduction = "mixed"
        for k, v in self.losses.items():
            setattr(self, k, v)

    def __call__(self, *inputs):
        raise NotImplementedError(
            "LossSet members are consumed by the step builders")


class MultiheadLoss:
    """Weighted dict-keyed loss over multi-head outputs
    (compound_losses.py:67-97)."""

    def __init__(self, weights, normalize_weights=False, **losses):
        self.losses = {k: initialize_criterion(dict(v))
                       for k, v in losses.items()}
        if isinstance(weights, (int, float)):
            weights = {key: weights for key in self.losses}
        if normalize_weights:
            s = sum(weights.values())
            weights = {k: v / s for k, v in weights.items()}
        assert self.losses.keys() == weights.keys(), \
            str(self.losses.keys()) + "!=" + str(weights.keys())
        self.weights = weights
        reductions = [getattr(x, "reduction", "mean")
                      for x in self.losses.values()]
        self.reduction = (reductions[0] if len(set(reductions)) == 1
                          else "mixed")

    def __call__(self, output, target):
        total = ZERO
        partial = {}
        for key in self.losses:
            partial[key] = self.weights[key] * self.losses[key](output[key],
                                                                target[key])
            total = total + partial[key]
        return TotalWithIntermediate(total, **partial)


class CombinationLoss(MultiheadLoss):
    """Sum of multiple losses on the SAME output/target
    (compound_losses.py:100-109)."""

    def __call__(self, output, target):
        total = ZERO
        partial = {}
        for key in self.losses:
            partial[key] = self.weights[key] * self.losses[key](output, target)
            total = total + partial[key]
        return TotalWithIntermediate(total, **partial)


@dataclasses.dataclass
class PatchNCELoss:
    """Per-patch InfoNCE (compound_losses.py:113-154); returns the unreduced
    per-patch vector like the reference's reduction='none' CE."""
    batch_dim_for_bmm: int = 1
    temperature: float = 0.07
    reduction: str = "mixed"

    def __call__(self, feat_q, feat_k):
        return L.patch_nce_loss(feat_q, feat_k, self.batch_dim_for_bmm,
                                self.temperature)


class MultilayerPatchNCELoss:
    """Mean over layers of weight-scaled per-layer means
    (compound_losses.py:157-173)."""

    def __init__(self, batch_dim_for_bmm, nce_layers, num_patches,
                 temperature, weight):
        self.nce_layers = [int(i) for i in str(nce_layers).split(",")]
        self.num_patches = num_patches
        self.weight = weight
        self.batch_dim_for_bmm = batch_dim_for_bmm
        self.temperature = temperature
        self.reduction = "mixed"

    def __call__(self, feat_q_pool, feat_k_pool):
        total = ZERO
        partial = {}
        for feat_q, feat_k, layer in zip(feat_q_pool, feat_k_pool,
                                         self.nce_layers):
            key = "layer" + str(layer)
            per_patch = L.patch_nce_loss(feat_q, feat_k,
                                         self.batch_dim_for_bmm,
                                         self.temperature)
            partial[key] = jnp.mean(per_patch) * self.weight
            total = total + partial[key]
        return TotalWithIntermediate(total / len(self.nce_layers), **partial)


# ---------------------------------------------------------------------------
# registry (criterion/__init__.py:4-26)

CRITERIA = {
    "l1": L1Loss,
    "mse": MSELoss,
    "bce": BCELoss,
    "bce_with_logits": BCEWithLogitsLoss,
    "contrastive": ContrastiveLoss,
    "contrastive_multidesc": ContrastiveLossMultipleDescriptors,
    "triplet": TripletLoss,
    "cycle_loss": CycleLoss,
    "discriminator_loss": DiscriminatorLoss,
    "loss_set": LossSet,
    "multihead_loss": MultiheadLoss,
    "combination_loss": CombinationLoss,
    "multilayer_patchnce_loss": MultilayerPatchNCELoss,
}


def initialize_criterion(params):
    if not params:
        return None
    params = dict(params)
    return CRITERIA[params.pop("loss")](**params)
