import numpy as np
import pytest

from chipmunk_tpu.config import (ChipmunkConfig, config_from_dict,
                                 load_config)
from chipmunk_tpu import schedule


def test_defaults_match_reference_schema():
    cfg = ChipmunkConfig()
    assert cfg.steps == 50
    assert cfg.mlp.counts_multiple_of == 256
    assert cfg.mlp.bm == 128 and cfg.mlp.mbm == 128
    assert cfg.attn.counts_multiple_of == 128
    assert cfg.attn.full_step_every == 10
    assert 7 in cfg.step_caching.skip_step_schedule


def test_deep_merge():
    cfg = config_from_dict({
        'steps': 20,
        'attn': {'top_keys': 0.165, 'full_step_schedule': [0, 1, 10]},
        'offloading': {'attn.out_cache': False},
    })
    assert cfg.steps == 20
    assert cfg.attn.top_keys == 0.165
    assert cfg.attn.full_step_schedule == (0, 1, 10)
    assert cfg.attn.recompute_mask is True  # untouched default
    assert cfg.offloading.attn_out_cache is False


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        config_from_dict({'attn': {'nope': 1}})


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("mlp:\n  top_keys: 0.3\nattn:\n  top_keys: 0.165\n")
    cfg = load_config(str(p))
    assert cfg.mlp.top_keys == 0.3
    assert cfg.attn.top_keys == 0.165


def test_full_attn_steps_default():
    # reference layer_counter.py:30-35: step<2 or step % every == 0
    cfg = ChipmunkConfig()
    fa = schedule.full_attn_steps(cfg)
    expect = [(s < 2 or s % 10 == 0) for s in range(50)]
    assert fa.tolist() == expect


def test_full_attn_steps_schedule_override():
    cfg = config_from_dict({'attn': {'full_step_schedule': [0, 1, 10, 40]}})
    fa = schedule.full_attn_steps(cfg)
    assert np.flatnonzero(fa).tolist() == [0, 1, 10, 40]


def test_full_mlp_steps():
    cfg = ChipmunkConfig()
    fm = schedule.full_mlp_steps(cfg)
    assert np.flatnonzero(fm).tolist() == [0, 10, 20, 30, 40]


def test_recompute_mlp_mask_steps():
    # reference modules/mlp.py:62-67: recompute unless
    # (step % block_mask_cache != 0 and cached and step >= 10)
    cfg = ChipmunkConfig()
    rm = schedule.recompute_mlp_mask_steps(cfg)
    fm = schedule.full_mlp_steps(cfg)
    for s in range(50):
        if fm[s]:
            assert not rm[s]
        else:
            assert rm[s] == (s % 2 == 0 or s < 10)


def test_skip_steps_disabled():
    cfg = config_from_dict({'step_caching': {'is_enabled': False}})
    assert not schedule.skip_steps(cfg).any()


def test_colsum_steps():
    cfg = ChipmunkConfig()
    cs = schedule.colsum_steps(cfg)
    fa = schedule.full_attn_steps(cfg)
    assert not cs[0]
    assert cs[1]
    for s in range(2, 50):
        assert cs[s] == fa[s]  # recompute_mask=True default


def test_step_plan_shapes():
    cfg = ChipmunkConfig()
    plan = schedule.step_plan(cfg)
    assert len(plan) == 50
    assert plan[0].is_first and plan[0].full_attn and not plan[0].colsum
