"""On-device GAN image replay pool.

TPU-native redesign of the reference's host-side GanImagePool
(/root/reference/mdir/tools/gan_image_pool.py:15-65): the 50-image history
buffer lives in HBM as part of the train state and the query runs inside the
jitted train step (a lax.scan over the batch, matching the reference's
sequential per-image insert/replace semantics).
"""
from typing import Any

import jax
import jax.numpy as jnp
import flax.struct


@flax.struct.dataclass
class PoolState:
    images: Any   # (pool_size, H, W, C)
    count: Any    # int32 scalar


def init_pool(pool_size, shape, dtype=jnp.float32):
    return PoolState(images=jnp.zeros((pool_size,) + tuple(shape), dtype),
                     count=jnp.zeros((), jnp.int32))


def pool_query(state, images, rng):
    """Query the pool with a batch. Returns (new_state, images_for_D).

    Per image (sequentially, like the reference): while the buffer is not full,
    insert and return the input; once full, with p>0.5 swap with a random
    buffered image and return the old one, else return the input.
    """
    pool_size = state.images.shape[0]
    if pool_size == 0:
        # reference supports pool_size <= 0 as "no buffer" (query returns the
        # input unchanged, gan_image_pool.py:24-26); the scan below would
        # gather from a size-0 axis
        return state, images
    keys = jax.random.split(rng, images.shape[0])

    def body(carry, inp):
        buf, count = carry
        img, key = inp
        k1, k2 = jax.random.split(key)
        not_full = count < pool_size
        p = jax.random.uniform(k1)
        rid = jax.random.randint(k2, (), 0, pool_size)
        idx = jnp.where(not_full, count, rid)
        swap = not_full | (p > 0.5)
        old = buf[idx]
        ret = jnp.where(not_full | (p <= 0.5), img, old)
        buf = jnp.where(swap, buf.at[idx].set(img), buf)
        return (buf, count + not_full.astype(count.dtype)), ret

    (buf, count), out = jax.lax.scan(body, (state.images, state.count), (images, keys))
    return PoolState(images=buf, count=count), out
