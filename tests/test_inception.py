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


def test_preprocess_range():
    imgs = jnp.ones((2, 64, 64, 3)) * 0.5
    out = preprocess(imgs)
    assert out.shape == (2, 299, 299, 3)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)
