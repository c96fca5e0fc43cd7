"""Native host runtime: build, staging buffers, host bitpack parity with
the jnp op."""
import numpy as np

from chipmunk_tpu.utils.native import (get_lib, HostBuffer, bitpack_host,
                                       bitunpack_host)


def test_native_builds():
    assert get_lib() is not None, "g++ build of chipmunk_host.cpp failed"


def test_host_buffer_roundtrip():
    buf = HostBuffer(1 << 16)
    arr = np.random.default_rng(0).standard_normal((64, 64)).astype(
        np.float32)
    buf.write(arr)
    np.testing.assert_array_equal(buf.view(np.float32, (64, 64)), arr)


def test_host_bitpack_roundtrip_and_parity():
    rng = np.random.default_rng(1)
    mask = rng.random((3, 1000)) < 0.3
    packed = bitpack_host(mask)
    assert packed.size == (mask.size + 7) // 8
    out = bitunpack_host(packed, mask.shape)
    np.testing.assert_array_equal(out, mask)
    # parity with numpy little-endian packbits (same order as ops.bitpack)
    np.testing.assert_array_equal(
        packed, np.packbits(mask.reshape(-1), bitorder='little'))


def test_host_bitpack_parity_with_jnp_op():
    import jax.numpy as jnp
    from chipmunk_tpu.ops import bitpack
    rng = np.random.default_rng(2)
    mask = rng.random((16, 257)) < 0.5
    packed_host = bitpack_host(mask)
    packed_jnp, shape = bitpack(jnp.asarray(mask))
    np.testing.assert_array_equal(packed_host, np.asarray(packed_jnp))


def _numpy_quant_ref(wf, kind):
    """The numpy slow path of quantize_host, inlined as the parity
    reference for the native row quantizers."""
    import ml_dtypes
    amax = np.maximum(np.abs(wf).max(axis=1, keepdims=True), 1e-8)
    if kind == 'fp8':
        scale = amax / 448.0
        return (wf / scale).astype(ml_dtypes.float8_e4m3fn), scale
    if kind == 'int8':
        scale = amax / 127.0
        return np.clip(np.round(wf / scale), -127, 127).astype(np.int8), \
            scale
    scale = amax / 7.0
    qi = np.clip(np.round(wf / scale), -8, 7).astype(np.int32) + 8
    half = wf.shape[1] // 2
    return (qi[:, :half] | (qi[:, half:] << 4)).astype(np.uint8), scale


def test_native_quantize_rows_parity():
    """csrc row quantizers must match the numpy path bit-exactly (they
    are the load-time hot path via quantize_host)."""
    from chipmunk_tpu.utils.native import quantize_rows_native, get_lib
    if get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((64, 256)) * 0.05).astype(np.float32)
    w[0, 0] = 0.0
    w[1] = 0.0                      # all-zero row -> amax clamp path
    w[2, 5] = 100.0                 # big outlier
    for kind in ('fp8', 'int8', 'int4'):
        q, scale = quantize_rows_native(w, kind)
        q_ref, scale_ref = _numpy_quant_ref(w, kind)
        np.testing.assert_array_equal(scale, scale_ref[:, 0])
        if kind == 'fp8':
            np.testing.assert_array_equal(q.view(np.uint8),
                                          q_ref.view(np.uint8))
        else:
            np.testing.assert_array_equal(q, q_ref)


def test_quantize_host_uses_native_and_matches_device():
    """quantize_host's 2-D fast path must agree with the device-side
    quantize() for every format."""
    import jax.numpy as jnp
    from chipmunk_tpu.utils.quant import quantize_host, quantize, dequant
    rng = np.random.default_rng(4)
    w = (rng.standard_normal((32, 128)) * 0.05).astype(np.float32)
    for kind in ('fp8', 'int8', 'int4'):
        qt_h = quantize_host(w, kind, keep_axes=(0,),
                             pack_axis=1 if kind == 'int4' else None)
        qt_d = quantize(jnp.asarray(w), kind, keep_axes=(0,),
                        pack_axis=1 if kind == 'int4' else None)
        np.testing.assert_allclose(np.asarray(dequant(qt_h, jnp.float32)),
                                   np.asarray(dequant(qt_d, jnp.float32)),
                                   rtol=0, atol=1e-6)
