"""Pure-JAX numerical ops: pooling, normalization, losses, whitening, ranking,
colorspaces, CLAHE, resize. All ops take NHWC feature maps / (N, D) descriptor
matrices and are jit-safe (static shapes, no Python data-dependent control flow).
"""
from gandtr_tpu.ops.pooling import gem, mac, spoc, rmac
from gandtr_tpu.ops.norm import l2n, powerlaw, instance_norm
