"""Text encoders for FLUX-family prompts: T5-XXL (sequence embeddings)
and CLIP-L (pooled vector), via transformers' Flax implementations.

The reference vendors HFEmbedder wrappers around the same checkpoints
(examples/flux/src/flux/modules/conditioner.py) and JIT-offloads the
hunyuan text encoders to save HBM (hyvideo chipmunk/util.py:4-43).  Here
the encoders run as separate jitted programs OUTSIDE the denoise loop and
their weights can be dropped after embedding (the functional analogue of
the reference's offload-after-use), honoring config
``offloading.text_encoders``.

Weights/tokenizers must be local paths (no egress in this environment);
without them the example CLIs accept precomputed embeddings, exactly like
round 1.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclass
class TextEncoders:
    """Lazy holder for the two prompt encoders.

    t5_path / clip_path: local checkpoint dirs loadable by transformers'
    Flax classes (T5EncoderModel / CLIPTextModel + matching tokenizers).
    """
    t5_path: Optional[str] = None
    clip_path: Optional[str] = None
    max_length: int = 512          # FLUX-dev T5 context (schnell: 256)
    dtype: object = jnp.bfloat16
    backend: str = 'auto'          # 'auto' | 'flax' | 'pure'

    def __post_init__(self):
        self._t5 = self._t5_tok = self._clip = self._clip_tok = None
        self._pure = None          # (t5_params, t5_cfg, clip_params, ccfg)

    def _load_flax(self):
        from transformers import FlaxT5EncoderModel, FlaxCLIPTextModel
        if self._t5 is None and self.t5_path:
            self._t5 = FlaxT5EncoderModel.from_pretrained(
                self.t5_path, dtype=self.dtype)
        if self._clip is None and self.clip_path:
            self._clip = FlaxCLIPTextModel.from_pretrained(
                self.clip_path, dtype=self.dtype)

    def _load_pure(self):
        """Hand-rolled T5-v1.1 / CLIP-L (models/flux_encoders.py) read
        straight from the checkpoint safetensors — no transformers model
        classes (their Flax implementations are deprecated upstream)."""
        from .flux_encoders import (T5Config, ClipTextConfig,
                                    load_t5_safetensors,
                                    load_clip_safetensors)
        if self._pure is None:
            t5_cfg = T5Config(dtype=self.dtype)
            ccfg = ClipTextConfig(dtype=self.dtype)
            self._pure = (load_t5_safetensors(self.t5_path, t5_cfg), t5_cfg,
                          load_clip_safetensors(self.clip_path, ccfg), ccfg)

    def _load(self):
        from transformers import AutoTokenizer
        if self._t5_tok is None and self.t5_path:
            self._t5_tok = AutoTokenizer.from_pretrained(self.t5_path)
        if self._clip_tok is None and self.clip_path:
            self._clip_tok = AutoTokenizer.from_pretrained(self.clip_path)
        if self.backend == 'flax':
            return self._load_flax()
        if self.backend == 'pure':
            return self._load_pure()
        try:
            self._load_flax()
        except Exception:
            self._load_pure()

    def available(self) -> bool:
        return bool(self.t5_path and self.clip_path)

    def embed(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """prompts: list[str] -> (txt [B, max_length, 4096],
        y [B, 768] pooled CLIP) — the (txt, vec) pair flux_forward takes
        (reference sampling.prepare, flux/sampling.py:38-70)."""
        self._load()
        assert (self._t5 is not None and self._clip is not None) \
            or self._pure is not None, \
            "text encoder checkpoints not configured"
        tt = self._t5_tok(prompts, max_length=self.max_length,
                          padding='max_length', truncation=True,
                          return_tensors='np')
        ct = self._clip_tok(prompts, max_length=77, padding='max_length',
                            truncation=True, return_tensors='np')
        if self._t5 is not None:
            txt = self._t5(input_ids=tt['input_ids']).last_hidden_state
            y = self._clip(input_ids=ct['input_ids']).pooler_output
            return jnp.asarray(txt), jnp.asarray(y)
        from .flux_encoders import t5_encode, clip_text_encode
        t5p, t5_cfg, clipp, ccfg = self._pure
        txt = t5_encode(t5p, jnp.asarray(tt['input_ids'], jnp.int32),
                        jnp.asarray(tt['attention_mask'], jnp.int32),
                        t5_cfg)
        _, y = clip_text_encode(
            clipp, jnp.asarray(ct['input_ids'], jnp.int32), ccfg)
        return txt, y

    def release(self) -> None:
        """Drop encoder weights (the functional analogue of the
        reference's JIT offload, hyvideo chipmunk/util.py:4-43)."""
        self._t5 = self._clip = self._pure = None
