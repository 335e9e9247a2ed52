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
