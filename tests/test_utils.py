import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import OffloadingConfig
from chipmunk_tpu.utils import (offload_to_host, fetch_to_device,
                                OffloadPolicy, DoubleBufferedLoader,
                                StepTimer)


def test_offload_roundtrip():
    tree = {'a': jnp.arange(32.0), 'b': {'c': jnp.ones((4, 4))}}
    h = offload_to_host(tree)
    d = fetch_to_device(h)
    np.testing.assert_allclose(np.asarray(d['a']), np.arange(32.0))
    np.testing.assert_allclose(np.asarray(d['b']['c']), np.ones((4, 4)))


def test_offload_policy_from_config():
    p = OffloadPolicy.from_config(OffloadingConfig())
    assert p.wants_host('attn_out_cache')
    assert p.wants_host('attn_indices')
    assert not p.wants_host('mlp_out_cache')
    p2 = OffloadPolicy.from_config(
        OffloadingConfig(global_disable_offloading=True))
    assert not p2.wants_host('attn_out_cache')


def test_double_buffered_loader():
    slices = [{'x': jnp.full((4,), float(i))} for i in range(5)]
    loader = DoubleBufferedLoader([offload_to_host(s) for s in slices])
    loader.prefetch(0)
    loader.prefetch(1)
    for i in range(5):
        cur = loader.get(i)
        loader.prefetch(i + 1)
        assert float(cur['x'][0]) == float(i)
        loader.store(i, {'x': cur['x'] + 100.0})
    out = fetch_to_device(loader.host_slices())
    assert float(out[3]['x'][0]) == 103.0


def test_step_timer():
    t = StepTimer()
    with t.span('a'):
        pass
    with t.span('a'):
        pass
    s = t.summary()
    assert s['a']['count'] == 2


def test_checkpoint_roundtrip(tmp_path):
    from chipmunk_tpu.utils.checkpoint import save_pytree, load_pytree
    tree = {'a': jnp.arange(6.0).reshape(2, 3),
            'b': [jnp.ones((4,)), {'c': jnp.zeros((2, 2), jnp.int32)}]}
    p = str(tmp_path / "state.npz")
    save_pytree(p, tree)
    out = load_pytree(p, tree)
    np.testing.assert_array_equal(np.asarray(out['a']),
                                  np.asarray(tree['a']))
    assert out['b'][1]['c'].dtype == jnp.int32
