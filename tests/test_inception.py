"""InceptionV3 FID tower: output shape, converter structure, avg-pool quirk."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from flax.traverse_util import flatten_dict

from mvd_tpu.metrics.inception import (
    InceptionV3Features,
    avg_pool_nopad,
    inception_from_torch,
    preprocess,
)


def test_avg_pool_nopad_matches_torch():
    x = np.random.default_rng(0).standard_normal((1, 7, 7, 4)).astype(np.float32)
    got = np.asarray(avg_pool_nopad(jnp.asarray(x)))
    want = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=1, padding=1,
        count_include_pad=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_inception_shapes_and_converter():
    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (1, 2048)

    # synthetic torch sd with pytorch-fid naming built from our own shapes:
    # <module>.conv.weight (OIHW) and <module>.bn.{weight,bias,running_*}
    sd = {}
    inv_bn = {
        "bn_scale": "bn.weight",
        "bn_bias": "bn.bias",
        "bn_mean": "bn.running_mean",
        "bn_var": "bn.running_var",
    }
    for path, val in flatten_dict(params["params"]).items():
        parts = list(path)
        leaf = parts[-1]
        if leaf == "kernel":  # path ends (.., 'conv', 'kernel')
            sd[".".join(parts[:-1]) + ".weight"] = np.asarray(val).transpose(3, 2, 0, 1)
        else:  # bn params live on the BasicConv2d module itself
            sd[".".join(parts[:-1]) + "." + inv_bn[leaf]] = np.asarray(val)
    got = inception_from_torch(sd)
    fw = flatten_dict(params["params"])
    fg = flatten_dict(got["params"])
    assert set(fg) == set(fw), (set(fw) - set(fg), set(fg) - set(fw))
    for k in fw:
        assert fg[k].shape == fw[k].shape, k


def _t_basic_conv(in_ch, out_ch, **kw):
    import torch.nn as tnn

    m = tnn.Sequential()
    m.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **kw)
    m.bn = tnn.BatchNorm2d(out_ch, eps=1e-3)
    return m


def _bc_fwd(m, x):
    import torch.nn.functional as F

    return F.relu(m.bn(m.conv(x)))


def _t_avgpool(x):
    import torch.nn.functional as F

    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class _TorchFIDInception(torch.nn.Module):
    """Independent reimplementation of the pytorch-fid InceptionV3 trunk
    (TF-ported variant: BN eps 1e-3, count_include_pad=False branch pools,
    Mixed_7c max-pool branch), emitting pytorch-fid state-dict keys."""

    def __init__(self):
        super().__init__()
        tnn = torch.nn
        self.Conv2d_1a_3x3 = _t_basic_conv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _t_basic_conv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _t_basic_conv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _t_basic_conv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _t_basic_conv(80, 192, kernel_size=3)

        def blockA(mod, in_ch, pool):
            mod.branch1x1 = _t_basic_conv(in_ch, 64, kernel_size=1)
            mod.branch5x5_1 = _t_basic_conv(in_ch, 48, kernel_size=1)
            mod.branch5x5_2 = _t_basic_conv(48, 64, kernel_size=5, padding=2)
            mod.branch3x3dbl_1 = _t_basic_conv(in_ch, 64, kernel_size=1)
            mod.branch3x3dbl_2 = _t_basic_conv(64, 96, kernel_size=3, padding=1)
            mod.branch3x3dbl_3 = _t_basic_conv(96, 96, kernel_size=3, padding=1)
            mod.branch_pool = _t_basic_conv(in_ch, pool, kernel_size=1)

        def blockC(mod, in_ch, c7):
            mod.branch1x1 = _t_basic_conv(in_ch, 192, kernel_size=1)
            mod.branch7x7_1 = _t_basic_conv(in_ch, c7, kernel_size=1)
            mod.branch7x7_2 = _t_basic_conv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            mod.branch7x7_3 = _t_basic_conv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            mod.branch7x7dbl_1 = _t_basic_conv(in_ch, c7, kernel_size=1)
            mod.branch7x7dbl_2 = _t_basic_conv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            mod.branch7x7dbl_3 = _t_basic_conv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            mod.branch7x7dbl_4 = _t_basic_conv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            mod.branch7x7dbl_5 = _t_basic_conv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            mod.branch_pool = _t_basic_conv(in_ch, 192, kernel_size=1)

        def blockE(mod, in_ch):
            mod.branch1x1 = _t_basic_conv(in_ch, 320, kernel_size=1)
            mod.branch3x3_1 = _t_basic_conv(in_ch, 384, kernel_size=1)
            mod.branch3x3_2a = _t_basic_conv(384, 384, kernel_size=(1, 3), padding=(0, 1))
            mod.branch3x3_2b = _t_basic_conv(384, 384, kernel_size=(3, 1), padding=(1, 0))
            mod.branch3x3dbl_1 = _t_basic_conv(in_ch, 448, kernel_size=1)
            mod.branch3x3dbl_2 = _t_basic_conv(448, 384, kernel_size=3, padding=1)
            mod.branch3x3dbl_3a = _t_basic_conv(384, 384, kernel_size=(1, 3), padding=(0, 1))
            mod.branch3x3dbl_3b = _t_basic_conv(384, 384, kernel_size=(3, 1), padding=(1, 0))
            mod.branch_pool = _t_basic_conv(in_ch, 192, kernel_size=1)

        for name, in_ch, pool in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64)):
            mod = tnn.Module()
            blockA(mod, in_ch, pool)
            setattr(self, name, mod)
        m6a = tnn.Module()
        m6a.branch3x3 = _t_basic_conv(288, 384, kernel_size=3, stride=2)
        m6a.branch3x3dbl_1 = _t_basic_conv(288, 64, kernel_size=1)
        m6a.branch3x3dbl_2 = _t_basic_conv(64, 96, kernel_size=3, padding=1)
        m6a.branch3x3dbl_3 = _t_basic_conv(96, 96, kernel_size=3, stride=2)
        self.Mixed_6a = m6a
        for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)):
            mod = tnn.Module()
            blockC(mod, 768, c7)
            setattr(self, name, mod)
        m7a = tnn.Module()
        m7a.branch3x3_1 = _t_basic_conv(768, 192, kernel_size=1)
        m7a.branch3x3_2 = _t_basic_conv(192, 320, kernel_size=3, stride=2)
        m7a.branch7x7x3_1 = _t_basic_conv(768, 192, kernel_size=1)
        m7a.branch7x7x3_2 = _t_basic_conv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        m7a.branch7x7x3_3 = _t_basic_conv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        m7a.branch7x7x3_4 = _t_basic_conv(192, 192, kernel_size=3, stride=2)
        self.Mixed_7a = m7a
        for name, in_ch in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
            mod = tnn.Module()
            blockE(mod, in_ch)
            setattr(self, name, mod)

    def forward(self, x):
        import torch.nn.functional as F

        x = _bc_fwd(self.Conv2d_1a_3x3, x)
        x = _bc_fwd(self.Conv2d_2a_3x3, x)
        x = _bc_fwd(self.Conv2d_2b_3x3, x)
        x = F.max_pool2d(x, 3, stride=2)
        x = _bc_fwd(self.Conv2d_3b_1x1, x)
        x = _bc_fwd(self.Conv2d_4a_3x3, x)
        x = F.max_pool2d(x, 3, stride=2)

        def blkA(m, x):
            b1 = _bc_fwd(m.branch1x1, x)
            b5 = _bc_fwd(m.branch5x5_2, _bc_fwd(m.branch5x5_1, x))
            bd = _bc_fwd(m.branch3x3dbl_3, _bc_fwd(m.branch3x3dbl_2, _bc_fwd(m.branch3x3dbl_1, x)))
            bp = _bc_fwd(m.branch_pool, _t_avgpool(x))
            return torch.cat([b1, b5, bd, bp], 1)

        def blkC(m, x):
            b1 = _bc_fwd(m.branch1x1, x)
            b7 = _bc_fwd(m.branch7x7_3, _bc_fwd(m.branch7x7_2, _bc_fwd(m.branch7x7_1, x)))
            bd = x
            for i in (1, 2, 3, 4, 5):
                bd = _bc_fwd(getattr(m, f"branch7x7dbl_{i}"), bd)
            bp = _bc_fwd(m.branch_pool, _t_avgpool(x))
            return torch.cat([b1, b7, bd, bp], 1)

        def blkE(m, x, maxpool):
            b1 = _bc_fwd(m.branch1x1, x)
            b3 = _bc_fwd(m.branch3x3_1, x)
            b3 = torch.cat([_bc_fwd(m.branch3x3_2a, b3), _bc_fwd(m.branch3x3_2b, b3)], 1)
            bd = _bc_fwd(m.branch3x3dbl_2, _bc_fwd(m.branch3x3dbl_1, x))
            bd = torch.cat([_bc_fwd(m.branch3x3dbl_3a, bd), _bc_fwd(m.branch3x3dbl_3b, bd)], 1)
            bp = F.max_pool2d(x, 3, stride=1, padding=1) if maxpool else _t_avgpool(x)
            bp = _bc_fwd(m.branch_pool, bp)
            return torch.cat([b1, b3, bd, bp], 1)

        x = blkA(self.Mixed_5b, x)
        x = blkA(self.Mixed_5c, x)
        x = blkA(self.Mixed_5d, x)
        b3 = _bc_fwd(self.Mixed_6a.branch3x3, x)
        bd = _bc_fwd(self.Mixed_6a.branch3x3dbl_3, _bc_fwd(self.Mixed_6a.branch3x3dbl_2, _bc_fwd(self.Mixed_6a.branch3x3dbl_1, x)))
        x = torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)
        x = blkC(self.Mixed_6b, x)
        x = blkC(self.Mixed_6c, x)
        x = blkC(self.Mixed_6d, x)
        x = blkC(self.Mixed_6e, x)
        m = self.Mixed_7a
        b3 = _bc_fwd(m.branch3x3_2, _bc_fwd(m.branch3x3_1, x))
        b7 = x
        for i in (1, 2, 3, 4):
            b7 = _bc_fwd(getattr(m, f"branch7x7x3_{i}"), b7)
        x = torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)
        x = blkE(self.Mixed_7b, x, maxpool=False)
        x = blkE(self.Mixed_7c, x, maxpool=True)
        return x.mean(dim=(2, 3))


def test_inception_torch_numerical_parity():
    """Flax tower == independent torch pytorch-fid InceptionV3 at random
    init with perturbed BN running stats, through inception_from_torch
    (closes 'converter structure-tested only': this pins the numerics the
    real pt_inception weights would flow through)."""
    torch.manual_seed(0)
    tm = _TorchFIDInception().eval()
    # nontrivial BN stats so conversion of running_mean/var is exercised
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                c = mod.num_features
                mod.weight.copy_(0.5 + torch.rand(c, generator=g))
                mod.bias.copy_(0.1 * torch.randn(c, generator=g))
                mod.running_mean.copy_(0.1 * torch.randn(c, generator=g))
                mod.running_var.copy_(0.5 + torch.rand(c, generator=g))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = inception_from_torch(sd)

    model = InceptionV3Features()
    ref_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    assert set(flatten_dict(ref_shapes["params"])) == set(flatten_dict(params["params"]))

    x = np.random.default_rng(2).uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    err = np.mean((want - got) ** 2)
    db = float(10 * np.log10(np.mean(want.astype(np.float64) ** 2) / max(err, 1e-30)))
    assert db >= 60, f"InceptionV3 parity {db:.1f} dB < 60"


def test_preprocess_range():
    imgs = jnp.ones((2, 64, 64, 3)) * 0.5
    out = preprocess(imgs)
    assert out.shape == (2, 299, 299, 3)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)
