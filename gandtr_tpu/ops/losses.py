"""Loss functions (pure JAX).

Semantics match the reference exactly so training curves reproduce:
- contrastive/triplet over D×N descriptor columns:
  /root/reference/mdir/external/cirtorch/layers/functional.py:141-173
- adversarial target convention: real→0, fake→1 (sic):
  /root/reference/mdir/components/optim/criterion/compound_losses.py:47-50
- PatchNCE: /root/reference/mdir/components/optim/criterion/compound_losses.py:113-154

All functions return scalars (or per-element arrays where the reference does) and
are differentiable/jit-safe. "detach" in the reference maps to
`jax.lax.stop_gradient` here.
"""
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# basic regressions (base_losses.py — mean reduction)
# ---------------------------------------------------------------------------

def l1_loss(x, target):
    """Mean absolute error with torch's tie subgradient: d|0|/dx = 0.

    jnp.abs alone back-props 1.0 at exact zeros; torch.nn.L1Loss gives 0.
    The difference is live in HED^N-GAN distillation, where the student is
    INITIALIZED equal to the frozen teacher so real_M - target_M == 0
    bit-exactly on every pixel of the first step (edges_epochs.py:107-121) —
    with abs-grad-1 semantics the whole first E step gets a spurious O(1)
    gradient. The where() routes the cotangent to the constant branch at
    ties, matching torch exactly; forward value is unchanged."""
    d = x - target
    return jnp.mean(jnp.where(d == 0, 0.0, jnp.abs(d)))


def mse_loss(x, target):
    return jnp.mean((x - target) ** 2)


def bce_loss(p, target, eps=1e-12):
    """BCE on probabilities; target is stop-gradiented (base_losses.py:22-23)."""
    target = jax.lax.stop_gradient(target)
    p = jnp.clip(p, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def bce_with_logits_loss(logits, target, pos_weight=None):
    """Numerically-stable BCE-with-logits, mean reduction (torch convention)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is None:
        loss = -(target * log_p + (1.0 - target) * log_not_p)
    else:
        loss = -(pos_weight * target * log_p + (1.0 - target) * log_not_p)
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# metric-learning losses (D×N descriptor-column layout)
# ---------------------------------------------------------------------------

def contrastive_loss(x, label, num_tuples, margin=0.7, eps=1e-6):
    """Contrastive loss over tuple descriptor columns, sum reduction.

    x: (D, N) with N = num_tuples * S columns; label: (N,) with -1 = query,
    1 = positive, 0 = negative. Query of each tuple is column t*S; the
    remaining S-1 columns are compared to it. `num_tuples` must be static
    (the tuple structure is fixed by the data pipeline in the reference too).
    Exact port of functional.py:141-157 including the `(dif+eps)^2` inside the
    distance (the reference adds eps to the difference, not the norm).
    """
    D, N = x.shape
    S = N // num_tuples
    # queries repeated against their tuple's non-query columns
    x = x.T.reshape(num_tuples, S, D)  # (nq, S, D)
    q = x[:, :1, :]                    # (nq, 1, D)
    rest = x[:, 1:, :]                 # (nq, S-1, D)
    lbl = label.reshape(num_tuples, S)[:, 1:]
    dif = q - rest
    dist = jnp.sqrt(jnp.sum((dif + eps) ** 2, axis=-1))  # (nq, S-1)
    y = 0.5 * lbl * dist ** 2 + 0.5 * (1 - lbl) * jnp.clip(margin - dist, min=0.0) ** 2
    return jnp.sum(y)


def triplet_loss(x, label, num_tuples, margin=0.1):
    """Triplet loss (functional.py:160-173). x: (D, N); tuples are
    (anchor, positive, S-2 negatives)."""
    D, N = x.shape
    S = N // num_tuples
    x = x.T.reshape(num_tuples, S, D)
    xa = x[:, 0:1, :]
    xp = x[:, 1:2, :]
    xn = x[:, 2:, :]
    dist_pos = jnp.sum((xa - xp) ** 2, axis=-1)  # (nq, 1)
    dist_neg = jnp.sum((xa - xn) ** 2, axis=-1)  # (nq, S-2)
    return jnp.sum(jnp.clip(dist_pos - dist_neg + margin, min=0.0))


# ---------------------------------------------------------------------------
# GAN losses
# ---------------------------------------------------------------------------

def adversarial_target(shape, is_target_real, dtype=jnp.float32):
    """Reference convention (compound_losses.py:47-50): real→0.0, fake→1.0."""
    return jnp.full(shape, float(not is_target_real), dtype=dtype)


def discriminator_loss(output, is_target_real, criterion=mse_loss):
    """Adversarial loss vs the constant target map. `output` may be a list for
    multiscale discriminators (losses summed; compound_losses.py:33-45)."""
    if isinstance(output, (list, tuple)):
        partial = {}
        total = 0.0
        for i, y in enumerate(output):
            key = "layer" + str(len(output) - 1 - i)
            partial[key] = criterion(y, adversarial_target(y.shape, is_target_real, y.dtype))
            total = total + partial[key]
        return total, partial
    total = criterion(output, adversarial_target(output.shape, is_target_real, output.dtype))
    return total, {}


def patch_nce_loss(feat_q, feat_k, batch_dim_for_bmm=1, temperature=0.07):
    """PatchNCE loss per patch (compound_losses.py:126-154), no reduction.

    feat_q, feat_k: (num_patches_total, dim); feat_k is stop-gradiented.
    Returns (num_patches_total,) cross-entropy values.
    """
    num_patches, dim = feat_q.shape
    feat_k = jax.lax.stop_gradient(feat_k)

    l_pos = jnp.sum(feat_q * feat_k, axis=1, keepdims=True)  # (P, 1)

    fq = feat_q.reshape(batch_dim_for_bmm, -1, dim)
    fk = feat_k.reshape(batch_dim_for_bmm, -1, dim)
    npatches = fq.shape[1]
    l_neg = jnp.einsum("bpd,bqd->bpq", fq, fk,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    diag = jnp.eye(npatches, dtype=bool)[None, :, :]
    l_neg = jnp.where(diag, -10.0, l_neg).reshape(-1, npatches)

    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    # cross entropy with target class 0
    return -jax.nn.log_softmax(logits, axis=1)[:, 0]


def multilayer_patch_nce_loss(feats_q, feats_k, batch_dim_for_bmm=1,
                              temperature=0.07, weight=1.0):
    """Mean-per-layer PatchNCE, averaged over layers (compound_losses.py:157-173)."""
    partial = {}
    total = 0.0
    for i, (fq, fk) in enumerate(zip(feats_q, feats_k)):
        val = jnp.mean(patch_nce_loss(fq, fk, batch_dim_for_bmm, temperature) * weight)
        partial[f"layer{i}"] = val
        total = total + val
    return total / len(feats_q), partial
