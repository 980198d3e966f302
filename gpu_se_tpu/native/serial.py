"""ctypes bindings + build for the C++ serial reference engine.

The shared library is compiled on demand (g++ -O2) into
``gpu_se_tpu/native/_build/`` and cached by source mtime. Import degrades
gracefully: if no compiler is available, ``available()`` returns False
and callers fall back to the numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "serial_pf.cpp")
_BUILD = os.path.join(_DIR, "_build")
_LIB = os.path.join(_BUILD, "libserial_pf.so")

_lib = None
_load_error = None


def _compile():
    os.makedirs(_BUILD, exist_ok=True)
    subprocess.check_call(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    )


def _load():
    global _lib, _load_error
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _compile()
        lib = ctypes.CDLL(_LIB)
    except (OSError, subprocess.SubprocessError) as exc:  # pragma: no cover
        _load_error = exc
        return None

    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    f64 = ctypes.c_double

    lib.homeostatic_des.argtypes = [dp, dp, f64, dp]
    lib.pf_predict.argtypes = [dp, i64, i64, dp, f64, dp]
    lib.pf_update.argtypes = [dp, dp, i64, i64, dp, i64, i64, dp, dp, dp, dp]
    lib.systematic_resample_indices.argtypes = [dp, i64, f64, ip]
    lib.gather.argtypes = [dp, ip, i64, i64, dp]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class SerialParticleFilter:
    """Serial reference PF on the bioreactor model (float64, C++).

    Same algorithmic semantics as the framework's functional core and the
    reference's CPU class (/root/reference/filter/particle.py:9-114); used
    as a ground-truth engine for parity tests and honest CPU baselines.
    Noise is injected by the caller so parity runs can share streams.
    """

    def __init__(self, particles: np.ndarray, meas_means, meas_covs, meas_weights):
        self._lib = _load()
        if self._lib is None:  # pragma: no cover
            raise RuntimeError(f"native engine unavailable: {_load_error}")
        # explicit copy: ascontiguousarray aliases an already-contiguous
        # input, and the engine mutates particles in place
        self.particles = np.array(particles, dtype=np.float64, order="C", copy=True)
        n = self.particles.shape[0]
        self.weights = np.full(n, 1.0 / n)
        self._means = np.ascontiguousarray(meas_means, dtype=np.float64)
        covs = np.asarray(meas_covs, dtype=np.float64)
        self._inv_cov = np.ascontiguousarray(np.linalg.inv(covs))
        ny = covs.shape[-1]
        det = np.linalg.det(covs)
        self._norm_const = np.ascontiguousarray(
            (2 * np.pi) ** (-ny / 2) / np.sqrt(det)
        )
        self._mix_w = np.ascontiguousarray(meas_weights, dtype=np.float64)

    def predict(self, u, dt, noise):
        n, nx = self.particles.shape
        self._lib.pf_predict(
            self.particles, n, nx,
            np.ascontiguousarray(u, dtype=np.float64), float(dt),
            np.ascontiguousarray(noise, dtype=np.float64),
        )

    def update(self, z):
        n, nx = self.particles.shape
        nd, ny = self._means.shape
        self._lib.pf_update(
            self.particles, self.weights, n, nx,
            np.ascontiguousarray(z, dtype=np.float64), ny, nd,
            self._means, self._inv_cov, self._norm_const, self._mix_w,
        )

    def resample(self, r):
        n, nx = self.particles.shape
        idx = np.empty(n, dtype=np.int64)
        self._lib.systematic_resample_indices(self.weights, n, float(r), idx)
        out = np.empty_like(self.particles)
        self._lib.gather(self.particles, idx, n, nx, out)
        self.particles = out
        self.weights = np.full(n, 1.0 / n)
        return idx

    def point_estimate(self):
        w = self.weights / self.weights.sum()
        return w @ self.particles
