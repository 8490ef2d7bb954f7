"""FID: streaming feature moments + Fréchet distance, extractor-pluggable.

The reference uses torchmetrics' FrechetInceptionDistance with streaming
``update`` calls (reference src/training/losses.py:101-125, training.py:
107-117). This module reimplements the statistics machinery in numpy/JAX:

  * ``RunningMoments`` — streaming mean/covariance over feature batches
    (the torchmetrics ``update`` equivalent; exact, not minibatch-biased),
  * ``frechet_distance`` — ||mu1-mu2||² + tr(S1+S2-2 sqrt(S1 S2)) with the
    matrix square root computed from the eigendecomposition of S1·S2
    (numerically guarded, no scipy dependency),
  * ``FID`` — ties both to a feature extractor. The standard extractor is
    InceptionV3-pool3; in this hermetic environment any extractor params
    must be converted from a local torch state dict, so the extractor is a
    constructor argument (e.g. metrics.towers.VGG16Features with converted
    weights — producing a "FID-VGG"; documented as non-comparable to
    Inception-FID numbers, matching what is possible without a model zoo).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


class RunningMoments:
    def __init__(self, dim: int):
        self.dim = dim
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        assert feats.ndim == 2 and feats.shape[1] == self.dim
        self.n += feats.shape[0]
        self.sum += feats.sum(0)
        self.outer += feats.T @ feats

    @property
    def mean(self) -> np.ndarray:
        return self.sum / max(self.n, 1)

    @property
    def cov(self) -> np.ndarray:
        if self.n < 2:
            return np.zeros((self.dim, self.dim))
        mu = self.mean
        return (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)

    def reset(self):
        self.n = 0
        self.sum[:] = 0
        self.outer[:] = 0


def _sqrtm_trace(a: np.ndarray, b: np.ndarray) -> float:
    """tr(sqrtm(a @ b)) via eigenvalues of the (non-symmetric) product.

    a, b are PSD; a@b has real non-negative spectrum up to numerical noise —
    clip tiny negative/imaginary parts."""
    eigs = np.linalg.eigvals(a @ b)
    eigs = np.real(eigs)
    eigs[eigs < 0] = 0.0
    return float(np.sqrt(eigs).sum())


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64) + eps * np.eye(len(mu1))
    cov2 = np.asarray(cov2, np.float64) + eps * np.eye(len(mu2))
    diff = mu1 - mu2
    return float(
        diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * _sqrtm_trace(cov1, cov2)
    )


class FID:
    """Streaming FID between 'real' and 'fake' image sets."""

    def __init__(
        self,
        extractor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        dim: Optional[int] = None,
    ):
        self.extractor = extractor
        self._real: Optional[RunningMoments] = None
        self._fake: Optional[RunningMoments] = None
        if dim is not None:
            self._real = RunningMoments(dim)
            self._fake = RunningMoments(dim)

    @property
    def available(self) -> bool:
        return self.extractor is not None

    def _moments(self, real: bool) -> RunningMoments:
        bank = self._real if real else self._fake
        assert bank is not None, "update() must run once to set the dim"
        return bank

    def update(self, images01: np.ndarray, real: bool):
        assert self.extractor is not None
        feats = np.asarray(self.extractor(images01))
        if self._real is None:
            self._real = RunningMoments(feats.shape[1])
            self._fake = RunningMoments(feats.shape[1])
        self._moments(real).update(feats)

    def compute(self) -> float:
        r, f = self._moments(True), self._moments(False)
        return frechet_distance(r.mean, r.cov, f.mean, f.cov)

    def reset(self):
        if self._real is not None:
            self._real.reset()
            self._fake.reset()


def vgg_pool_extractor(model, params, layer: str = "relu5_3"):
    """Feature extractor from a VGG16Features tower: spatial-mean of a late
    relu map ('FID-VGG')."""
    import jax

    @jax.jit
    def run(x01):
        from .towers import _imagenet_norm

        feats = model.apply(params, _imagenet_norm(x01 * 2 - 1))
        return feats[layer].mean(axis=(1, 2))

    return lambda imgs: np.asarray(run(jnp.asarray(imgs)))
