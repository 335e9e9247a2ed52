"""Minimal torchvision stub so the REFERENCE engine (/root/reference/mdir)
can run on this image (no torchvision wheel): the reference needs only
transforms.{Compose,ToTensor,Normalize,RandomCrop}, functional.normalize,
get_image_backend, and models.vgg16's `.features` layout (sliced by
imageretrievalnet.py:174-196). Standard public-API reimplementations in
torch — used exclusively by tests/test_cross_engine_oracle.py to drive the
reference as an end-to-end oracle."""
import sys, types
import numpy as np
import torch
import torch.nn as nn


def install():
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    tv = types.ModuleType("torchvision"); tv.__path__ = []
    tv.__file__ = __file__  # CodeVersion reads module __file__/__version__
    tv.__version__ = "0.0-stub"
    tvm = types.ModuleType("torchvision.models")
    tvt = types.ModuleType("torchvision.transforms")
    tvtf = types.ModuleType("torchvision.transforms.functional")

    class Compose:
        def __init__(self, transforms): self.transforms = list(transforms)
        def __call__(self, x):
            for t in self.transforms: x = t(x)
            return x

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2: arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if arr.dtype == np.uint8:
                return t.float() / 255.0
            return t.float()

    def normalize(tensor, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=tensor.dtype)[:, None, None]
        std = torch.as_tensor(std, dtype=tensor.dtype)[:, None, None]
        if inplace:
            return tensor.sub_(mean).div_(std)
        return (tensor - mean) / std

    class Normalize:
        def __init__(self, mean, std): self.mean, self.std = mean, std
        def __call__(self, t): return normalize(t, self.mean, self.std)

    class RandomCrop:
        def __init__(self, size, padding=None, pad_if_needed=False, fill=0,
                     padding_mode="constant"):
            self.size = (size, size) if isinstance(size, int) else tuple(size)
            self.padding = padding; self.pad_if_needed = pad_if_needed
        @staticmethod
        def get_params(img, output_size):
            w, h = img.size
            th, tw = output_size
            if w == tw and h == th: return 0, 0, th, tw
            import random
            i = random.randint(0, h - th)
            j = random.randint(0, w - tw)
            return i, j, th, tw
        def __call__(self, img):
            i, j, h, w = self.get_params(img, self.size)
            return img.crop((j, i, j + w, i + h))

    def vgg16(pretrained=False, **kw):
        # torchvision vgg16 layout: .features Sequential (13 convs, 5 pools)
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1),
                           nn.ReLU(inplace=True)]
                in_ch = v
        m = nn.Module()
        m.features = nn.Sequential(*layers)
        return m

    tvt.Compose = Compose; tvt.ToTensor = ToTensor
    tvt.Normalize = Normalize; tvt.RandomCrop = RandomCrop
    tvt.functional = tvtf; tvtf.normalize = normalize
    tvm.vgg16 = vgg16
    tv.get_image_backend = lambda: "PIL"
    tv.models = tvm; tv.transforms = tvt
    sys.modules.update({"torchvision": tv, "torchvision.models": tvm,
                        "torchvision.transforms": tvt,
                        "torchvision.transforms.functional": tvtf})

    # torchviz stub: the graphviz `dot` binary is absent on this image; the
    # reference renders an architecture-graph blob at train start
    # (network.py:262-280) and only needs a readable PNG at fname+".png"
    tvz = types.ModuleType("torchviz")
    tvzd = types.ModuleType("torchviz.dot")

    class _FakeDot:
        def render(self, fname, cleanup=True):
            from PIL import Image as _I
            _I.new("RGB", (4, 4)).save(fname + ".png")

    tvzd.make_dot = lambda *a, **k: _FakeDot()
    tvz.dot = tvzd
    sys.modules["torchviz"] = tvz
    sys.modules["torchviz.dot"] = tvzd
    return tv
