import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.modules.mlp_fp8 import (quantize_weight, f8_linear,
                                          f8_matmul, quantize_input,
                                          init_input_state,
                                          update_calibration,
                                          CALIBRATION_STEPS)


def test_weight_quant_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 64)) * 0.05
    q = quantize_weight(w)
    deq = q.w8.astype(jnp.float32) * q.scale
    rel = np.abs(np.asarray(deq - w)).mean() / np.abs(np.asarray(w)).mean()
    assert rel < 0.05, rel  # e4m3 has ~2 decimal digits


def test_f8_linear_matches_fp32():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (32, 64)) * 0.5
    w = jax.random.normal(ks[1], (128, 64)) * 0.05
    b = jax.random.normal(ks[2], (128,)) * 0.05
    y_ref = x @ w.T + b
    y8, st = f8_linear(x, quantize_weight(w), init_input_state(), b,
                       out_dtype=jnp.float32)
    rel = (np.abs(np.asarray(y8 - y_ref)).mean()
           / np.abs(np.asarray(y_ref)).mean())
    assert rel < 0.1, rel
    assert int(st.count) == 1


def test_calibration_freezes():
    st = init_input_state()
    x_small = jnp.ones((4, 4)) * 0.5
    x_big = jnp.ones((4, 4)) * 100.0
    for _ in range(CALIBRATION_STEPS):
        st = update_calibration(st, x_small)
    amax_frozen = float(st.amax)
    st = update_calibration(st, x_big)  # after calibration: ignored
    assert float(st.amax) == amax_frozen
    _, scale = quantize_input(x_big, st)
    np.testing.assert_allclose(float(scale), amax_frozen / 448.0, rtol=1e-6)
