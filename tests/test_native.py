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
