"""PatchSampleF for CUT's PatchNCE (flax.linen).

Re-implementation of /root/reference/mdir/components/model/network/
p2p_networks.py:607-671: per-NCE-layer 2-layer MLPs over randomly sampled
feature-map patches, shared patch ids between query/key passes, L2-normalized.

Functional differences from torch (by design): patch ids are drawn from an
explicit JAX PRNG key (no hidden global RNG), and MLPs are created eagerly from
the static layer spec — there is no lazy `create_mlp` path because shapes are
known at trace time.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _safe_norm(x, axis):
    """sqrt(sum(x**2)) with a finite gradient at an exactly-zero row
    (double-where): a zero mlp output (zero-init biases + an all-zero relu
    patch, realistic at small channel counts) otherwise backprops
    inf*0 = NaN through the sqrt. Forward values are bit-identical to the
    reference's x.pow(2).sum().pow(.5) for nonzero rows."""
    s = jnp.sum(x ** 2, axis=axis, keepdims=True)
    safe = jnp.where(s > 0, s, 1.0)
    return jnp.where(s > 0, safe ** 0.5, 0.0)


class PatchSampleF(nn.Module):
    nc: int = 256
    use_mlp: bool = True

    @nn.compact
    def __call__(self, feats, num_patches=64, patch_ids=None, rng=None):
        """feats: list of (B, H, W, C) maps. Returns (samples, ids); each sample
        is ((B*num_patches), nc) L2-normalized."""
        return_ids = []
        return_feats = []
        for feat_id, feat in enumerate(feats):
            B, H, W, C = feat.shape
            flat = feat.reshape(B, H * W, C)
            if num_patches > 0:
                if patch_ids is not None:
                    patch_id = patch_ids[feat_id]
                else:
                    if rng is None:
                        rng = self.make_rng("patches")
                    rng, sub = jax.random.split(rng)
                    n = min(num_patches, H * W)
                    patch_id = jax.random.permutation(sub, H * W)[:n]
                sample = flat[:, patch_id, :].reshape(-1, C)
            else:
                sample = flat.reshape(-1, C)
                patch_id = jnp.zeros((0,), jnp.int32)
            if self.use_mlp:
                sample = nn.Dense(self.nc, name=f"mlp_{feat_id}_0")(sample)
                sample = nn.relu(sample)
                sample = nn.Dense(self.nc, name=f"mlp_{feat_id}_1")(sample)
            return_ids.append(patch_id)
            if num_patches == 0:
                # full-map mode: the reference keeps (B, HW, C) and its
                # Normalize sums over dim 1 — the SPATIAL axis
                # (p2p_networks.py:595-603, 664-666), not channels
                sample = sample.reshape(B, H * W, -1)
                sample = (sample / (_safe_norm(sample, axis=1) + 1e-7)
                          ).reshape(B, H, W, -1)
            else:
                sample = sample / (_safe_norm(sample, axis=-1) + 1e-7)
            return_feats.append(sample)
        return return_feats, return_ids
