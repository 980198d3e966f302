"""Gaussian-sum (mixture of multivariate Gaussians) distributions.

Functional core: :class:`GaussianSum` is an immutable pytree holding the
mixture parameters plus factors precomputed at construction (Cholesky
factors for sampling, inverse covariances and normalization constants for
the pdf — mirroring the precomputation in
/root/reference/gaussian_sum_dist/MultivariateGaussianSum.py:33-37).

All sampling takes an explicit ``jax.random`` key, so determinism-for-tests
falls out for free: the same key yields the same draws on CPU and TPU.
The reference needed a class-level replay cache for that
(/root/reference/gaussian_sum_dist/DeterministicGaussianSum.py:27-65);
here :class:`DeterministicGaussianSum` is a thin shell that replays a
shared lazily-extended stream with identical first-``n``-values semantics.
"""
from __future__ import annotations

import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

ShapeLike = Union[int, Tuple[int, ...]]


FAST_NOISE = True


class fast_noise:
    """Context manager toggling the rbg noise fast path (trace-time).

    ``fast_noise(False)`` pins the threefry stream on every backend —
    used by the CPU-vs-TPU shared-key parity gate
    (scripts/validate_tpu.py --parity), where element-level agreement
    requires identical streams."""

    def __init__(self, on: bool):
        self.on = on

    def __enter__(self):
        global FAST_NOISE
        self._prev = FAST_NOISE
        FAST_NOISE = self.on

    def __exit__(self, *exc):
        global FAST_NOISE
        FAST_NOISE = self._prev


def device_fast_key(key: jax.Array) -> jax.Array:
    """Derive an rbg-impl key from a threefry key ON TPU; identity
    elsewhere.

    XLA's hardware random-bit generator draws the GSUKF sigma noise
    3.3x and the PF predict noise 3.7x faster than threefry at the
    production shapes (scripts/probe_rbg.py, round 5: 1.65 -> 0.50 and
    0.56 -> 0.15 ms by full-sum-consumed k-chain slope). The STREAM
    CHANGES (like ``draw_t``'s layout change, documented there), and
    rbg is not ``jax_threefry_partitionable``-shardable — so this is
    used only by the single-device fast paths (``particle_tiled.step``,
    ``gs_ukf.predict``); the shard_map paths draw with partitionable
    threefry keys outside, and CPU keeps threefry so parity fixtures
    are backend-stable.
    """
    if not FAST_NOISE or jax.default_backend() != "tpu":
        return key
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    else:
        kd = key                       # raw (2,) uint32 PRNGKey
    kd = kd.reshape(-1).astype(jnp.uint32)
    data = jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)])[:4]
    return jax.random.wrap_key_data(data, impl="rbg")


@struct.dataclass
class GaussianSum:
    """Mixture of ``Nd`` multivariate Gaussians over ``R^Nx`` as a pytree.

    Attributes
    ----------
    means : (Nd, Nx) float32
    covariances : (Nd, Nx, Nx) float32
    weights : (Nd,) float32
        Mixture weights (need not be normalized; pdf uses them as given,
        draw normalizes).
    chol : (Nd, Nx, Nx) float32
        Lower Cholesky factors of the covariances (for sampling).
    inv_cov : (Nd, Nx, Nx) float32
        Inverse covariances (for the pdf quadratic form).
    log_const : (Nd,) float32
        ``-Nx/2 log(2 pi) - 1/2 log det(cov)`` per component.
    """

    means: jax.Array
    covariances: jax.Array
    weights: jax.Array
    chol: jax.Array
    inv_cov: jax.Array
    log_const: jax.Array

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, means, covariances, weights, dtype=jnp.float32) -> "GaussianSum":
        """Build a mixture, precomputing factors in float64 on host."""
        means64 = np.atleast_2d(np.asarray(means, dtype=np.float64))
        covs64 = np.asarray(covariances, dtype=np.float64)
        if covs64.ndim == 2:
            covs64 = covs64[None]
        w64 = np.atleast_1d(np.asarray(weights, dtype=np.float64))
        nd, nx = means64.shape
        chol = np.linalg.cholesky(covs64)
        inv_cov = np.linalg.inv(covs64)
        _, logdet = np.linalg.slogdet(covs64)
        log_const = -0.5 * nx * math.log(2.0 * math.pi) - 0.5 * logdet
        return cls(
            means=jnp.asarray(means64, dtype),
            covariances=jnp.asarray(covs64, dtype),
            weights=jnp.asarray(w64, dtype),
            chol=jnp.asarray(chol, dtype),
            inv_cov=jnp.asarray(inv_cov, dtype),
            log_const=jnp.asarray(log_const, dtype),
        )

    # ------------------------------------------------------------------
    @property
    def n_components(self) -> int:
        return self.means.shape[0]

    @property
    def n_dim(self) -> int:
        return self.means.shape[1]

    # ------------------------------------------------------------------
    def pdf(self, x: jax.Array) -> jax.Array:
        """Mixture pdf at a batch of points.

        Matches the batched quadratic-form formulation of
        /root/reference/gaussian_sum_dist/MultivariateGaussianSum.py:39-63:
        ``sum_d w_d c_d exp(-1/2 e_d^T S_d^{-1} e_d)``.

        Parameters
        ----------
        x : (..., Nx) array

        Returns
        -------
        (...,) array of pdf values.
        """
        x = jnp.atleast_2d(x)
        es = x[..., None, :] - self.means  # (..., Nd, Nx)
        # e^T S^-1 e via two einsums (MXU-batched for large leading dims)
        quad = jnp.einsum("...di,dij,...dj->...d", es, self.inv_cov, es)
        comp = jnp.exp(self.log_const - 0.5 * quad)  # (..., Nd)
        return jnp.sum(self.weights * comp, axis=-1)

    def pdf_t(self, x: jax.Array) -> jax.Array:
        """Lanes-last mixture pdf: ``x`` is ``(Nx, ...)`` with the batch
        minor; returns ``(...)``.

        Same mixture as :meth:`pdf` with the quadratic form unrolled
        over the (tiny, static) component and state dims as pure
        elementwise ops — built for bulk lanes-last consumers (the
        round-5 tiled PF step, filters/particle_tiled.py) where the
        ``(..., Nx)`` layout of :meth:`pdf` pays ~15x padded memory
        traffic (cf. :meth:`draw_t`). The contraction order matches
        ``(e @ inv_cov) . e`` row-major, so values can differ from
        :meth:`pdf`'s einsum by association ulps.
        """
        total = None
        for d in range(self.n_components):
            es = [x[i] - self.means[d, i] for i in range(self.n_dim)]
            quad = None
            for i in range(self.n_dim):
                acc = None
                for j in range(self.n_dim):
                    term = self.inv_cov[d, j, i] * es[j]
                    acc = term if acc is None else acc + term
                t = es[i] * acc
                quad = t if quad is None else quad + t
            comp = self.weights[d] * jnp.exp(self.log_const[d] - 0.5 * quad)
            total = comp if total is None else total + comp
        return total

    def logpdf(self, x: jax.Array) -> jax.Array:
        """Numerically-stable log mixture pdf (log-sum-exp over components).

        The reference works in linear probability space and has to rescale
        weights to dodge float32 underflow
        (/root/reference/results/gsf_openloop/gsf_power.py); working in
        log space removes that failure mode.
        """
        x = jnp.atleast_2d(x)
        es = x[..., None, :] - self.means
        quad = jnp.einsum("...di,dij,...dj->...d", es, self.inv_cov, es)
        logs = self.log_const - 0.5 * quad + jnp.log(self.weights)
        return jax.scipy.special.logsumexp(logs, axis=-1)

    # ------------------------------------------------------------------
    def draw(self, key: jax.Array, shape: ShapeLike = (1,)) -> jax.Array:
        """Draw samples: categorical component choice + ``mean + L @ eps``.

        Replaces the reference's multinomial-bincount + per-component
        ``multivariate_normal`` loop
        (/root/reference/gaussian_sum_dist/MultivariateGaussianSum.py:65-97)
        with a fully vectorized, jit-able draw: per-sample categorical
        component indices and a batched triangular matmul.

        Parameters
        ----------
        key : PRNG key
        shape : int or tuple
            Leading output shape.

        Returns
        -------
        (*shape, Nx) float32 array.
        """
        if not isinstance(shape, tuple):
            shape = (shape,)
        size = int(np.prod(shape)) if shape else 1
        kc, kn = jax.random.split(key)
        logits = jnp.log(self.weights)
        comp = jax.random.categorical(kc, logits, shape=(size,))
        eps = jax.random.normal(kn, (size, self.n_dim), dtype=self.means.dtype)
        # Component selection via one-hot matmuls instead of per-sample
        # (Nd, Nx, Nx) gathers: Nd is tiny (2 in the canonical rig), so
        # computing every component's affine and selecting keeps the work
        # on the MXU and off the slow dynamic-gather path.
        onehot = jax.nn.one_hot(comp, self.n_components, dtype=eps.dtype)
        scaled = jnp.einsum("nj,dij->ndi", eps, self.chol)
        # sum-over-components as broadcast-multiply-reduce: the batched
        # einsum ('nd,ndi->ni', per-sample batch with tiny K) lowers on
        # TPU as a base-dilated convolution with window=n (catastrophic;
        # same pathology as the GSUKF einsums, see ops/smallmat.bmm_small)
        out = onehot @ self.means + jnp.sum(onehot[:, :, None] * scaled, axis=1)
        return out.reshape(shape + (self.n_dim,))

    def draw_t(self, key: jax.Array, size: int) -> jax.Array:
        """Lanes-last draw: ``(Nx, size)`` with the big axis minor.

        Same distribution as :meth:`draw` but a DIFFERENT stream mapping
        (eps is generated transposed), built for bulk consumers like the
        GSUKF sigma noise where the ``(M, Nx)`` layout's 5-wide trailing
        dim costs ~15x in padded memory traffic at 2^18x11 draws
        (scripts/probe_gsf2.py). Every op keeps ``size`` in the TPU lane
        dimension: the per-component affines are (Nx, Nx) @ (Nx, size)
        matmuls and the categorical combine is a broadcast-multiply-
        reduce over the tiny component axis.
        """
        kc, kn = jax.random.split(key)
        eps = jax.random.normal(kn, (self.n_dim, size),
                                dtype=self.means.dtype)
        if self.n_components == 2:
            # two-component fast path (the canonical rig): categorical
            # collapses to one uniform compare and the combine to one
            # select — 2.4 -> ~0.9 ms for the 2^18x11 GSUKF draw
            u = jax.random.uniform(kc, (size,), dtype=self.means.dtype)
            p0 = self.weights[0] / (self.weights[0] + self.weights[1])
            a = self.means[0][:, None] + self.chol[0] @ eps
            b = self.means[1][:, None] + self.chol[1] @ eps
            return jnp.where((u < p0)[None, :], a, b)
        logits = jnp.log(self.weights)
        comp = jax.random.categorical(kc, logits, shape=(size,))
        scaled = jnp.stack([
            self.chol[d] @ eps for d in range(self.n_components)
        ])                                            # (Nd, Nx, size)
        onehot = (comp[None, :] ==
                  jnp.arange(self.n_components)[:, None]
                  ).astype(eps.dtype)                 # (Nd, size)
        mean_term = self.means.T @ onehot             # (Nx, size)
        noise = jnp.sum(onehot[:, None, :] * scaled, axis=0)
        return mean_term + noise

    # ------------------------------------------------------------------
    def mean(self) -> jax.Array:
        """Mixture mean (weights normalized)."""
        w = self.weights / jnp.sum(self.weights)
        return w @ self.means

    def covariance(self) -> jax.Array:
        """Mixture covariance (law of total covariance)."""
        w = self.weights / jnp.sum(self.weights)
        mu = w @ self.means
        d = self.means - mu
        return jnp.einsum("d,dij->ij", w, self.covariances) + jnp.einsum(
            "d,di,dj->ij", w, d, d
        )


# ======================================================================
# Stateful shells with the reference ctor/API shape
# ======================================================================
class MultivariateGaussianSum:
    """Stateful shell with the reference's constructor and method surface.

    ``library=`` is accepted and ignored — under JAX one code path serves
    every backend (cf. the numpy/cupy switch at
    /root/reference/gaussian_sum_dist/MultivariateGaussianSum.py:27-37).
    Each ``draw`` call advances an internal PRNG key; pass ``seed`` for
    reproducibility.
    """

    def __init__(self, means, covariances, weights, library=None, seed: int = 0):
        del library
        self.dist = GaussianSum.create(means, covariances, weights)
        self._key = jax.random.PRNGKey(seed)
        # Reference-compatible attribute aliases
        self.means = self.dist.means
        self.covariances = self.dist.covariances
        self.weights = self.dist.weights

    @property
    def _Nd(self) -> int:
        return self.dist.n_components

    @property
    def _Nx(self) -> int:
        return self.dist.n_dim

    def pdf(self, x):
        return self.dist.pdf(x)

    def logpdf(self, x):
        return self.dist.logpdf(x)

    def next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def draw(self, shape: ShapeLike = (1,)):
        return self.dist.draw(self.next_key(), shape)


class DeterministicGaussianSum(MultivariateGaussianSum):
    """Replay-deterministic variant for CPU<->accelerator parity tests.

    Reproduces the reference semantics exactly: all instances share a
    single lazily-extended stream of scalar draws, and ``draw(shape)``
    returns the *first* ``prod(shape) * Nx`` values of the stream
    (cf. /root/reference/gaussian_sum_dist/DeterministicGaussianSum.py:45-65)
    — so two instances (e.g. one driving a CPU filter and one a TPU
    filter) see byte-identical noise.
    """

    _values = np.array([], dtype=np.float32)
    # Lazily created so importing the package never initializes a backend.
    _stream_key = None

    def __init__(self, means, covariances, weights, library=None, seed: int = 0):
        super().__init__(means, covariances, weights, library, seed)

    @classmethod
    def reset(cls):
        cls._values = np.array([], dtype=np.float32)
        cls._stream_key = None

    def draw(self, shape: ShapeLike = (1,)):
        if not isinstance(shape, tuple):
            shape = (shape,)
        size = int(np.prod(shape)) * self._Nx
        cls = DeterministicGaussianSum
        if cls._values.size < size:
            if cls._stream_key is None:
                cls._stream_key = jax.random.PRNGKey(1234)
            need = size - cls._values.size
            n_draw = -(-need // self._Nx)  # ceil
            cls._stream_key, sub = jax.random.split(cls._stream_key)
            drawn = np.asarray(self.dist.draw(sub, (n_draw,))).ravel()[:need]
            cls._values = np.hstack([cls._values, drawn.astype(np.float32)])
        out = cls._values[:size].reshape(shape + (self._Nx,))
        return jnp.asarray(np.squeeze(out))
