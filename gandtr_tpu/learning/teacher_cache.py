"""Cross-epoch cache of the frozen HED teacher's distillation targets.

The HED^N-GAN E substep recomputes the frozen teacher's edge maps on real_X
every training step (/root/reference/mdir/learning/epoch_iteration/
edges_epochs.py:107-121 — the teacher is `no_sigmoid` and never updated), so
for a data pipeline that REPEATS batches across epochs the forward is pure
recomputation. This cache removes it: content-keyed (md5 of the raw batch
bytes, so any change in images, order, crops, or augmentation recomputes —
the cache can never alter semantics), device-resident values, LRU-capped.

Dispatch rule (exactness at the distillation tie):
- MISS: run the normal step with the teacher forward INSIDE the jitted graph
  (bit-identical to the uncached step, including the student==teacher tie at
  init where the L1 subgradient is exactly 0 — ops/losses.l1_loss), and
  store the target_M the step itself computed (emit_targets — no second
  teacher forward).
- HIT: dispatch the external-targets step variant, skipping the teacher.
  A hit implies the same batch content was trained on before, so the
  student has drifted from the teacher by at least one optimizer step and
  |real_M - target_M| >> ulp — the external graph's float-level differences
  cannot flip L1 signs (tests/test_teacher_cache.py pins trajectory
  equality).

IMPORTANT — the published iccv23 protocol CANNOT benefit: RandomDomainsPair
re-samples image indices every epoch (domain_datasets.py:44-46) and
`scalecrop` draws a fresh random crop per access, so no batch content ever
repeats and the hit rate is exactly 0 (docs/PERF.md "frozen-teacher
caching"). The cache is therefore OPT-IN (`epoch_iteration.
cache_teacher_targets`) for deterministic pipelines (e.g. Pregenerated*
datasets or augmentation-free fine-tuning), where it removes the teacher
forward (~18 ms of the 131 ms step at batch 10 @256²) from every step after
the first epoch.
"""
import hashlib
from collections import OrderedDict

import numpy as np
import jax.numpy as jnp


class TeacherTargetCachingStep:
    """Callable step wrapper: (state, X, Y) -> (state, metrics, debug).

    internal_step must be built with emit_targets=True (its debug dict
    carries "target_M"); external_step with external_targets=True. Hash keys
    come from `batch_to_args` (hashing the HOST numpy batch before device
    upload — hashing device arrays would cost a download per step through
    the TPU tunnel).
    """

    def __init__(self, internal_step, external_step, max_items=64):
        self.internal_step = internal_step
        self.external_step = external_step
        self.max_items = int(max_items)
        self._cache = OrderedDict()
        self.hits = 0
        self.misses = 0

    def batch_to_args(self, batch):
        # The key travels WITH the batch args (advisor r4): pairing through
        # hidden instance state would silently mis-key a target if batch
        # conversion were ever prefetched or an exception fell between the
        # two calls.
        xb = np.asarray(batch[0])
        key = hashlib.md5(xb.tobytes()).hexdigest()
        return (jnp.asarray(xb), jnp.asarray(batch[1]), key)

    def __call__(self, state, real_X, real_Y, key=None):
        target = self._cache.get(key) if key is not None else None
        if target is not None:
            self._cache.move_to_end(key)
            self.hits += 1
            return self.external_step(state, real_X, real_Y, target)
        out = self.internal_step(state, real_X, real_Y)
        self.misses += 1
        if key is not None and len(out) == 3:
            debug = dict(out[2])
            target_m = debug.pop("target_M", None)
            if target_m is not None:
                self._cache[key] = target_m
                while len(self._cache) > self.max_items:
                    self._cache.popitem(last=False)
            out = (out[0], out[1], debug)
        return out
