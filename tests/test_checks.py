"""Defense sanity-check tests (attacks/checks.py)."""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from certifyingfacerecognition_tpu.attacks import checks as C

rng = np.random.default_rng(3)
X = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
Y = jnp.asarray(rng.integers(0, 4, 8), jnp.int32)
W = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)


def _logits(x):
    return x @ W


def test_deterministic_model_passes():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert not C.check_randomized(_logits, X, Y)
        assert not C.check_range_output(_logits, X)


def test_randomized_defense_detected():
    state = {"i": 0}

    def noisy(x):
        state["i"] += 1
        k = jax.random.PRNGKey(state["i"])
        return x @ W + 0.1 * jax.random.normal(k, (x.shape[0], 4))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert C.check_randomized(noisy, X, Y)
    assert any("randomized" in str(x.message) for x in w)


def test_probability_output_detected():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert C.check_range_output(lambda x: jax.nn.softmax(_logits(x)), X)
    assert any("probability" in str(x.message) for x in w)


def test_zero_gradients_detected():
    g = np.asarray(rng.standard_normal((6, 5)), np.float32)
    g[2] = 0.0
    g[4] = 0.0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert C.check_zero_gradients(jnp.asarray(g)) == 2
    assert any("zero gradient" in str(x.message) for x in w)


def test_square_sr_anomaly():
    ok = {"apgd-ce": 0.5, "fab-t": 0.48, "square": 0.49}
    bad = {"apgd-ce": 0.5, "fab-t": 0.48, "square": 0.40}
    assert not C.check_square_sr(ok)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert C.check_square_sr(bad)
    assert any("masking" in str(x.message) for x in w)


def test_run_all_checks_clean_model():
    grad_fn = jax.grad(lambda x: jnp.sum(_logits(x)[jnp.arange(8), Y]))
    res = C.run_all_checks(_logits, X, Y, grad_fn=grad_fn)
    assert res == {"randomized": False, "prob_output": False,
                   "zero_grad": False}
