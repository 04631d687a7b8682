"""Statistical and sharding tests for the randomized-smoothing certifier."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import beta, norm

from certifyingfacerecognition_tpu.parallel.mesh import get_mesh
from certifyingfacerecognition_tpu.smoothing.certificate import L2Certificate
from certifyingfacerecognition_tpu.smoothing.smooth import ABSTAIN, Smooth
from certifyingfacerecognition_tpu.utils import stats as S


def _threshold_predictor(tau):
    """Binary classifier: class 0 iff p[:, 0] <= tau."""

    def fn(z, p):
        return (p[:, 0] > tau).astype(jnp.int32)

    return fn


def test_clopper_pearson_matches_beta_quantile():
    # statsmodels proportion_confint(k, n, alpha=2a, method='beta')[0]
    # == beta.ppf(a, k, n-k+1)
    assert S.clopper_pearson_lower(0, 100, 0.001) == 0.0
    got = S.clopper_pearson_lower(990, 1000, 0.001)
    want = beta.ppf(0.001, 990, 1000 - 990 + 1)
    assert abs(got - want) < 1e-12
    assert 0.97 < got < 0.99


def test_certify_statistics_known_p():
    sigma = 0.7
    # class 0 iff noise <= sigma  =>  p_A = Phi(1) ~ 0.8413
    smooth = Smooth(_threshold_predictor(sigma), num_classes=2, sigma=sigma,
                    certificate=L2Certificate(), noise_dim=5, batch_size=250)
    pred, gap = smooth.certify(jnp.zeros(4), np.zeros(5), label=0, n0=100,
                               n=10_000, alpha=0.001, key=jax.random.PRNGKey(0))
    assert pred == 0
    p_a = norm.cdf(1.0)
    # gap must be below Phi^{-1}(p_A) (CP bound is conservative) but close.
    assert gap <= norm.ppf(p_a) + 1e-9
    assert norm.ppf(p_a) - 0.15 < gap


def test_certify_wrong_selection_returns_other_class():
    # p_A(class 0) ~ Phi(-1) ~ 0.159 -> selection picks class 1 != label
    smooth = Smooth(_threshold_predictor(-0.7), num_classes=2, sigma=0.7,
                    certificate=L2Certificate(), noise_dim=5, batch_size=100)
    pred, gap = smooth.certify(jnp.zeros(4), np.zeros(5), label=0, n0=100,
                               n=1000, alpha=0.001, key=jax.random.PRNGKey(1))
    assert pred == 1 and gap == 0.0


def test_certify_abstains_near_half():
    # p_A barely above 0.5 with small n -> CP lower bound < 0.5 -> abstain
    smooth = Smooth(_threshold_predictor(0.02), num_classes=2, sigma=1.0,
                    certificate=L2Certificate(), noise_dim=5, batch_size=100)
    pred, gap = smooth.certify(jnp.zeros(4), np.zeros(5), label=0, n0=100,
                               n=200, alpha=0.001, key=jax.random.PRNGKey(2))
    assert pred in (ABSTAIN, 1)
    assert gap == 0.0


def test_predict_binomial_abstention():
    smooth = Smooth(_threshold_predictor(0.0), num_classes=2, sigma=1.0,
                    certificate=L2Certificate(), noise_dim=3, batch_size=100)
    # p = 0.5 exactly -> should abstain with overwhelming probability
    assert smooth.predict(jnp.zeros(4), np.zeros(3), n=1000, alpha=0.001,
                          key=jax.random.PRNGKey(3)) == ABSTAIN
    # heavily biased -> confident class 0
    smooth2 = Smooth(_threshold_predictor(3.0), num_classes=2, sigma=1.0,
                     certificate=L2Certificate(), noise_dim=3, batch_size=100)
    assert smooth2.predict(jnp.zeros(4), np.zeros(3), n=1000, alpha=0.001,
                           key=jax.random.PRNGKey(4)) == 0


def test_sharded_counts_cover_exact_sample_count():
    mesh = get_mesh("mc")
    assert mesh.shape["mc"] == 8, "tests expect the 8-device CPU mesh"
    smooth = Smooth(_threshold_predictor(0.5), num_classes=2, sigma=1.0,
                    certificate=L2Certificate(), noise_dim=5, batch_size=64,
                    mesh=mesh)
    counts = smooth._sample_noise(jnp.zeros(4), np.zeros(5), 1000,
                                  jax.random.PRNGKey(5))
    assert counts.sum() == 1000  # exact-N semantics incl. ragged tail
    # p(class 0) = Phi(0.5) ~ 0.691
    assert 620 < counts[0] < 760


def test_anisotropic_sigma_scales_each_axis():
    sigma = jnp.asarray([0.1, 2.0, 0.1, 0.1, 0.1])
    cert = L2Certificate()
    noise = cert.sample_noise(jax.random.PRNGKey(0), (20_000, 5), sigma)
    std = np.asarray(noise).std(axis=0)
    np.testing.assert_allclose(std, np.asarray(sigma), rtol=0.05)
