"""RCF forward parity vs a torch oracle (reference rcf.py semantics: VGG16
convs with dilated conv5, ceil-mode pools, 21-ch down convs summed per stage,
fixed-bilinear deconvs with the reference's crop offsets, 1x1 fuse). The
reference module hardcodes `.cuda()` so the oracle re-creates it CPU-side."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gandtr_tpu.models import initialize_model
from gandtr_tpu.models.rcf import rcf_key_map
from gandtr_tpu.utils import torch_import as ti

_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
           (512, 512, 512))


class TorchRCF(tnn.Module):
    """CPU re-creation of the reference RCF (rcf.py:21-157) with the same
    parameter names."""

    def __init__(self):
        super().__init__()
        in_ch = 3
        for si, widths in enumerate(_STAGES, start=1):
            for ci, w in enumerate(widths, start=1):
                d = 2 if si == 5 else 1
                setattr(self, f"conv{si}_{ci}",
                        tnn.Conv2d(in_ch, w, 3, padding=d, dilation=d))
                setattr(self, f"conv{si}_{ci}_down", tnn.Conv2d(w, 21, 1))
                in_ch = w
            setattr(self, f"score_dsn{si}", tnn.Conv2d(21, 1, 1))
        self.score_fuse = tnn.Conv2d(5, 1, 1)

    @staticmethod
    def _bilinear(size):
        factor = (size + 1) // 2
        center = factor - 1 if size % 2 == 1 else factor - 0.5
        og = np.ogrid[:size, :size]
        filt = (1 - abs(og[0] - center) / factor) * \
               (1 - abs(og[1] - center) / factor)
        return torch.from_numpy(filt).float()[None, None]

    def forward(self, x, no_sigmoid=False):
        img_h, img_w = x.shape[2], x.shape[3]
        h = x
        scores = []
        for si, widths in enumerate(_STAGES, start=1):
            if si > 1:
                h = F.max_pool2d(h, 2, stride=1 if si == 5 else 2,
                                 ceil_mode=True)
            downs = []
            for ci in range(1, len(widths) + 1):
                h = F.relu(getattr(self, f"conv{si}_{ci}")(h))
                downs.append(getattr(self, f"conv{si}_{ci}_down")(h))
            scores.append(getattr(self, f"score_dsn{si}")(sum(downs)))

        outs = [scores[0]]
        for s, (size, stride, crop) in zip(
                scores[1:], ((4, 2, 1), (8, 4, 2), (16, 8, 4), (16, 8, 0))):
            up = F.conv_transpose2d(s, self._bilinear(size), stride=stride)
            outs.append(up[:, :, crop:crop + img_h, crop:crop + img_w])
        fuse = self.score_fuse(torch.cat(outs, dim=1))
        return fuse if no_sigmoid else torch.sigmoid(fuse)


def test_rcf_forward_matches_torch():
    torch.manual_seed(0)
    oracle = TorchRCF().eval()
    # down-scale deep weights so sigmoids don't saturate
    state = {k: (v * 0.2 if v.ndim == 4 else v * 0.1)
             for k, v in oracle.state_dict().items()}
    oracle.load_state_dict(state)

    model = initialize_model({"architecture": "rcf"})
    x = np.random.RandomState(1).rand(1, 35, 43, 3).astype(np.float32) * 2 - 1
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = ti.convert_torch_state(
        dict(variables), {k: v.numpy() for k, v in state.items()},
        key_map=rcf_key_map)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ref_pre = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         no_sigmoid=True).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    ours_pre = np.asarray(model.apply(variables, jnp.asarray(x),
                                      no_sigmoid=True, train=False))
    np.testing.assert_allclose(ours[..., 0], ref[:, 0], atol=2e-5)
    np.testing.assert_allclose(ours_pre[..., 0], ref_pre[:, 0], atol=2e-4)


def test_rcf_import_full_magnitude_weights():
    """Full-magnitude import parity (pre-sigmoid). The scaled-weight test
    above attenuates stage-5 contributions ~0.2^3: an I/O-swapped conv5
    kernel import (square 512->512, shape-check blind) passed it with
    maxdiff ~4e-8 while differing by ~2.4 on real-magnitude weights."""
    torch.manual_seed(3)
    oracle = TorchRCF().eval()
    state = oracle.state_dict()

    model = initialize_model({"architecture": "rcf"})
    x = np.random.RandomState(4).rand(1, 33, 37, 3).astype(np.float32) * 2 - 1
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = ti.convert_torch_state(
        dict(variables), {k: v.numpy() for k, v in state.items()},
        key_map=rcf_key_map, min_coverage=1.0)

    with torch.no_grad():
        ref_pre = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         no_sigmoid=True).numpy()
    ours_pre = np.asarray(model.apply(variables, jnp.asarray(x),
                                      no_sigmoid=True, train=False))
    scale = max(1.0, float(np.abs(ref_pre).max()))
    np.testing.assert_allclose(ours_pre[..., 0] / scale, ref_pre[:, 0] / scale,
                               atol=5e-5)
