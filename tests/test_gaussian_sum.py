"""Tests for the Gaussian-sum distribution layer.

Covers the reference's smoke tests
(/root/reference/tests/MultivariateGaussianSum_test.py,
/root/reference/tests/DeterministicGaussianSum_test.py) plus stronger
statistical and analytic checks the reference lacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from gpu_se_tpu.distributions import (
    DeterministicGaussianSum,
    GaussianSum,
    MultivariateGaussianSum,
)


@pytest.fixture
def mix():
    means = np.array([[10.0, 0.0], [-10.0, 0.0]])
    covs = np.array([[[1.0, 0.2], [0.2, 2.0]], [[0.5, 0.0], [0.0, 0.5]]])
    weights = np.array([0.3, 0.7])
    return GaussianSum.create(means, covs, weights)


def test_pdf_matches_scipy(mix):
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [-10.0, 1.0], [3.0, -2.0]])
    expected = 0.3 * scipy.stats.multivariate_normal.pdf(
        pts, [10.0, 0.0], [[1.0, 0.2], [0.2, 2.0]]
    ) + 0.7 * scipy.stats.multivariate_normal.pdf(
        pts, [-10.0, 0.0], [[0.5, 0.0], [0.0, 0.5]]
    )
    got = np.asarray(mix.pdf(pts))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_logpdf_matches_scipy(mix):
    # Check in log space against a float64 reference: the linear-space pdf
    # underflows float32 in the far tails, which is exactly why logpdf exists.
    pts = np.random.default_rng(0).normal(size=(50, 2)) * 3
    expected = np.log(
        0.3
        * scipy.stats.multivariate_normal.pdf(pts, [10.0, 0.0], [[1.0, 0.2], [0.2, 2.0]])
        + 0.7
        * scipy.stats.multivariate_normal.pdf(pts, [-10.0, 0.0], [[0.5, 0.0], [0.0, 0.5]])
    )
    np.testing.assert_allclose(np.asarray(mix.logpdf(pts)), expected, rtol=1e-4, atol=1e-2)


def test_pdf_single_point(mix):
    # scalar-batch input must work like the reference's atleast_2d path
    v = mix.pdf(jnp.array([10.0, 0.0]))
    assert v.shape == (1,)
    assert float(v[0]) > 0


def test_draw_shapes(mix):
    key = jax.random.PRNGKey(0)
    assert mix.draw(key, 7).shape == (7, 2)
    assert mix.draw(key, (3, 5)).shape == (3, 5, 2)
    assert mix.draw(key).shape == (1, 2)


def test_draw_statistics(mix):
    key = jax.random.PRNGKey(42)
    samples = np.asarray(mix.draw(key, 200_000))
    # component fractions
    frac_pos = np.mean(samples[:, 0] > 0)
    assert frac_pos == pytest.approx(0.3, abs=0.01)
    # overall mean = weighted mixture mean
    np.testing.assert_allclose(
        samples.mean(axis=0), np.asarray(mix.mean()), atol=0.05
    )
    # covariance via law of total covariance
    np.testing.assert_allclose(
        np.cov(samples.T), np.asarray(mix.covariance()), rtol=0.02, atol=0.1
    )


def test_draw_deterministic_by_key(mix):
    key = jax.random.PRNGKey(7)
    a = np.asarray(mix.draw(key, 100))
    b = np.asarray(mix.draw(key, 100))
    np.testing.assert_array_equal(a, b)


def test_mixture_moments_analytic():
    means = np.array([[1.0], [-1.0]])
    covs = np.array([[[1.0]], [[4.0]]])
    w = np.array([0.5, 0.5])
    m = GaussianSum.create(means, covs, w)
    assert float(m.mean()[0]) == pytest.approx(0.0)
    # E[cov] + Var[means] = 2.5 + 1.0
    assert float(m.covariance()[0, 0]) == pytest.approx(3.5)


def test_stateful_shell_draw_advances():
    d = MultivariateGaussianSum(
        means=np.zeros((2, 3)),
        covariances=np.stack([np.eye(3), 2 * np.eye(3)]),
        weights=np.array([0.5, 0.5]),
        seed=1,
    )
    a = np.asarray(d.draw(4))
    b = np.asarray(d.draw(4))
    assert not np.allclose(a, b)
    # fresh instance with same seed replays the stream
    d2 = MultivariateGaussianSum(
        means=np.zeros((2, 3)),
        covariances=np.stack([np.eye(3), 2 * np.eye(3)]),
        weights=np.array([0.5, 0.5]),
        seed=1,
    )
    np.testing.assert_array_equal(np.asarray(d2.draw(4)), a)


def test_deterministic_gaussian_sum_replay():
    # Mirrors /root/reference/tests/DeterministicGaussianSum_test.py:16-19:
    # repeated draws of the same shape return identical values, and draws
    # of a smaller size are a prefix of larger ones.
    DeterministicGaussianSum.reset()
    kw = dict(
        means=np.zeros((2, 2)),
        covariances=np.stack([np.eye(2), np.eye(2) * 3]),
        weights=np.array([0.25, 0.75]),
    )
    d1 = DeterministicGaussianSum(**kw)
    d2 = DeterministicGaussianSum(**kw)
    a = np.asarray(d1.draw(5))
    b = np.asarray(d2.draw(5))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(d1.draw((2, 3)))
    assert c.shape == (2, 3, 2)
    small = np.asarray(d1.draw(2))
    np.testing.assert_array_equal(small, a[:2])
    DeterministicGaussianSum.reset()


def test_pdf_under_jit_and_vmap(mix):
    pts = jnp.asarray(np.random.default_rng(3).normal(size=(16, 2)))
    jitted = jax.jit(mix.pdf)
    np.testing.assert_allclose(
        np.asarray(jitted(pts)), np.asarray(mix.pdf(pts)), rtol=1e-6
    )
    per_point = jax.vmap(lambda p: mix.pdf(p[None])[0])(pts)
    np.testing.assert_allclose(
        np.asarray(per_point), np.asarray(mix.pdf(pts)), rtol=1e-6
    )


def test_draw_t_matches_draw_distribution():
    """draw_t (lanes-last bulk draw) samples the same mixture: moment
    check against the analytic mean/covariance, and determinism by key."""
    import numpy as np
    from gpu_se_tpu.distributions import GaussianSum

    gs = GaussianSum.create(
        means=np.array([[1.0, -2.0], [3.0, 4.0]]),
        covariances=np.stack([np.eye(2) * 0.5, [[2.0, 0.6], [0.6, 1.0]]]),
        weights=np.array([0.3, 0.7]),
    )
    key = jax.random.PRNGKey(0)
    m = 200_000
    out = np.asarray(gs.draw_t(key, m))
    assert out.shape == (2, m)
    mu = np.asarray(gs.mean())
    cov = np.asarray(gs.covariance())
    np.testing.assert_allclose(out.mean(axis=1), mu, atol=4 * np.sqrt(
        np.diag(cov).max() / m) * 10)
    np.testing.assert_allclose(np.cov(out), cov, rtol=0.05, atol=0.05)
    # deterministic by key
    np.testing.assert_array_equal(
        np.asarray(gs.draw_t(key, 64)), np.asarray(gs.draw_t(key, 64)))
