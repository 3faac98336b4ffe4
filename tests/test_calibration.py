"""Temperature scaling + ECE (eval/calibration.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.eval.calibration import (expected_calibration_error,
                                            fit_temperature, nll)


def _overconfident_logits(seed=0, n=2000, c=10, scale=4.0):
    """Well-separated logits scaled up: right class most often, but
    confidence far above accuracy -> miscalibrated, true T > 1."""
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, c, n)
    logits = rs.randn(n, c).astype(np.float32)
    logits[np.arange(n), labels] += 1.5
    return logits * scale, labels


def test_fit_temperature_recovers_inflation():
    base, labels = _overconfident_logits(scale=1.0)
    # inflate calibrated-ish logits by 5x: the fitted T must undo it
    t = fit_temperature(base * 5.0, labels)
    t_base = fit_temperature(base, labels)
    np.testing.assert_allclose(t / t_base, 5.0, rtol=0.05)
    # and T minimizes NLL vs neighbors
    l_fit = float(nll(jnp.asarray(base * 5.0), jnp.asarray(labels),
                      jnp.asarray(t)))
    for other in (t * 0.7, t * 1.4):
        l_other = float(nll(jnp.asarray(base * 5.0), jnp.asarray(labels),
                            jnp.asarray(other)))
        assert l_fit <= l_other + 1e-6


def test_temperature_improves_ece_and_keeps_accuracy():
    logits, labels = _overconfident_logits()
    ece_raw = expected_calibration_error(logits, labels)
    t = fit_temperature(logits, labels)
    assert t > 1.5  # overconfident -> needs softening
    ece_cal = expected_calibration_error(logits, labels, temperature=t)
    assert ece_cal < ece_raw * 0.5, (ece_raw, ece_cal)
    # argmax (accuracy) is temperature-invariant
    np.testing.assert_array_equal(np.argmax(logits, -1),
                                  np.argmax(logits / t, -1))


def test_ece_zero_for_perfectly_calibrated_onehot():
    # near-one-hot correct predictions: confidence ~= accuracy ~= 1
    n, c = 256, 5
    labels = np.arange(n) % c
    logits = np.full((n, c), -20.0, np.float32)
    logits[np.arange(n), labels] = 20.0
    assert expected_calibration_error(logits, labels) < 1e-3
