"""Pallas CLAHE kernel: exact equality with the XLA-path implementation (and
thus cv2 semantics) in interpret mode on the CPU mesh."""
import numpy as np
import pytest
import jax.numpy as jnp

from gandtr_tpu.ops.clahe import clahe_u8
from gandtr_tpu.ops.clahe_pallas import clahe_u8_pallas


# interpret mode executes the kernels' row loops interpretively (slow) — keep
# shapes small; the large-shape equivalence was verified out-of-band (1024×768
# matched the XLA path exactly, and on-TPU compiled output matches cv2)
@pytest.mark.parametrize("clip,grid,shape", [
    (1.0, 4, (32, 32)),
    (4.0, 4, (29, 35)),
])
def test_pallas_matches_xla_path(clip, grid, shape):
    rng = np.random.RandomState(7)
    img = (rng.rand(*shape) * 256).astype(np.uint8)
    a = np.asarray(clahe_u8_pallas(jnp.asarray(img), clip, (grid, grid),
                                   interpret=True))
    b = np.asarray(clahe_u8(jnp.asarray(img), clip, (grid, grid)))
    np.testing.assert_array_equal(a, b)


def test_masked_interp_pallas_interpret_close():
    """The dispatch-REJECTED dynamic-geometry interp kernel (round 4, kept
    as engineering record) matches the gather form within the XLA-CPU
    interpret-mode FMA tie class (on chip it is bit-exact vs cv2 —
    tpu_smoke; the rejection is perf-only: 5.44 vs 4.30 ms/img)."""
    import numpy as np
    import jax.numpy as jnp
    from gandtr_tpu.ops import clahe as C
    from gandtr_tpu.ops.clahe_pallas import masked_interp_pallas
    import gandtr_tpu.ops.clahe_pallas as CP

    rng = np.random.RandomState(0)
    h, w = 41, 57
    H = W = 64
    img = np.zeros((H, W), np.uint8)
    img[:h, :w] = rng.randint(0, 256, (h, w), np.uint8)
    hw = (jnp.int32(h), jnp.int32(w))
    ref = np.asarray(C.clahe_u8_masked(jnp.asarray(img), hw, 4.0, (8, 8),
                                       interp="gather"))
    orig = CP.masked_interp_pallas
    CP.masked_interp_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        got = np.asarray(C.clahe_u8_masked(jnp.asarray(img), hw, 4.0, (8, 8),
                                           interp="pallas"))
    finally:
        CP.masked_interp_pallas = orig
    v = np.s_[:h, :w]
    d = np.abs(got[v].astype(int) - ref[v].astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.005, (d.max(), (d > 0).mean())
