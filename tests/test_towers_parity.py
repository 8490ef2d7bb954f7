"""VGG16-perceptual and LPIPS parity vs independent torch reimplementations.

The inception FID tower already has this treatment (tests/test_inception.py);
this extends it to the remaining learned metric towers (VERDICT r2 'next'
#8): torchvision-layout VGG16 ``features`` and the official-lpips-layout
alex backbone + learned 1x1 heads are reimplemented in plain torch here,
saved as .pt state dicts, loaded through metrics/load_towers.py (the same
path real weight files take), and the metric VALUES are compared end-to-end.
Reference consumers: val.py:84-104, src/training/losses.py:21-56.
"""

import math

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from mvd_tpu.metrics.load_towers import load_towers
from tests.test_torch_layer_parity import snr_db

torch.manual_seed(2)

# torchvision vgg16 cfg "D"
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
_ALEX = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
         (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]


def _tv_vgg16_features() -> tnn.Sequential:
    """torchvision.models.vgg16().features layer/index layout."""
    layers, in_c = [], 3
    for c in _VGG_CFG:
        if c == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_c, c, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_c = c
    return tnn.Sequential(*layers)


def _tv_alexnet_features() -> tnn.Sequential:
    """torchvision.models.alexnet().features layout (indices 0,3,6,8,10)."""
    layers = []
    for i, (ic, oc, k, s, p) in enumerate(_ALEX):
        layers.append(tnn.Conv2d(ic, oc, k, stride=s, padding=p))
        layers.append(tnn.ReLU(inplace=False))
        if i in (0, 1):
            layers.append(tnn.MaxPool2d(3, 2))
    return tnn.Sequential(*layers)


def test_vgg_perceptual_parity(tmp_path):
    """reference losses.py:21-56: VGG16 features[:29] (through conv5_3,
    pre-relu), ImageNet-normalized inputs, feature MSE."""
    vgg = _tv_vgg16_features().eval()
    path = tmp_path / "vgg16.pt"
    torch.save({f"features.{k}": v for k, v in vgg.state_dict().items()}, path)

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    nchw = lambda x: torch.from_numpy(x).permute(0, 3, 1, 2)
    norm = lambda x: ((nchw(x) * 0.5 + 0.5) - mean) / std
    trunk = vgg[:29]  # through conv5_3, NO final relu
    with torch.no_grad():
        fa, fb = trunk(norm(a)), trunk(norm(b))
        want = float(F.mse_loss(fa, fb))

    towers = load_towers(vgg_weights=str(path))
    perc = towers["perceptual"]
    assert perc.available
    got = float(perc(jnp.asarray(a), jnp.asarray(b)))
    assert math.isfinite(got)
    rel = abs(got - want) / max(abs(want), 1e-12)
    assert rel < 1e-4, f"perceptual loss mismatch: torch {want} vs jax {got}"
    # feature-map parity too (pins layout, pooling, normalization)
    fj = perc.model.apply(
        perc.params,
        (jnp.asarray(a) * 0.5 + 0.5 - jnp.asarray([0.485, 0.456, 0.406]))
        / jnp.asarray([0.229, 0.224, 0.225]),
    )["conv5_3"]
    db = snr_db(fa.permute(0, 2, 3, 1).numpy(), np.asarray(fj))
    assert db >= 60, f"conv5_3 parity {db:.1f} dB < 60"


def _t_lpips_alex(trunk, lins, a, b):
    """Official LPIPS forward (Zhang et al.): scaling layer, per-slice relu
    features, channel-unit-normalize, squared diff, 1x1 lin head, spatial
    mean, sum over slices."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    slices = [trunk[0:2], trunk[2:5], trunk[5:8], trunk[8:10], trunk[10:12]]

    def feats(x):
        h = (x - shift) / scale
        out = []
        for sl in slices:
            h = sl(h)
            out.append(h)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / torch.sqrt((xa**2).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb**2).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = lins[i].view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean()
    return float(total)


def test_lpips_alex_parity(tmp_path):
    """reference val.py:84: LPIPS(alex). Trunk + learned heads saved in the
    official lpips checkpoint layout (net.features.N.*, linN.model.1.weight),
    loaded through load_towers, value-compared against the official forward
    math reimplemented independently above."""
    alex = _tv_alexnet_features().eval()
    chans = [64, 192, 384, 256, 256]
    g = torch.Generator().manual_seed(3)
    lins = [torch.rand(c, generator=g) * 0.1 for c in chans]

    sd = {f"net.features.{k}": v for k, v in alex.state_dict().items()}
    for i, w in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = w.view(1, -1, 1, 1).clone()
    path = tmp_path / "lpips_alex.pt"
    torch.save(sd, path)

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.2 * rng.normal(size=a.shape).astype(np.float32), -1, 1)

    nchw = lambda x: torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        want = _t_lpips_alex(alex, lins, nchw(a), nchw(b))

    towers = load_towers(lpips_weights=str(path), lpips_net="alex")
    lp = towers["lpips"]
    assert lp.available
    got = float(lp(jnp.asarray(a), jnp.asarray(b)))
    rel = abs(got - want) / max(abs(want), 1e-12)
    assert rel < 1e-4, f"LPIPS mismatch: torch {want} vs jax {got}"
    # sanity: identical images -> 0
    assert float(lp(jnp.asarray(a), jnp.asarray(a))) < 1e-6
