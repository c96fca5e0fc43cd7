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

    def __post_init__(self):
        self._t5 = self._t5_tok = self._clip = self._clip_tok = None

    def _load(self):
        from transformers import (FlaxT5EncoderModel, AutoTokenizer,
                                  FlaxCLIPTextModel)
        if self._t5 is None and self.t5_path:
            self._t5 = FlaxT5EncoderModel.from_pretrained(
                self.t5_path, dtype=self.dtype)
            self._t5_tok = AutoTokenizer.from_pretrained(self.t5_path)
        if self._clip is None and self.clip_path:
            self._clip = FlaxCLIPTextModel.from_pretrained(
                self.clip_path, dtype=self.dtype)
            self._clip_tok = AutoTokenizer.from_pretrained(self.clip_path)

    def available(self) -> bool:
        return bool(self.t5_path and self.clip_path)

    def embed(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """prompts: list[str] -> (txt [B, max_length, 4096],
        y [B, 768] pooled CLIP) — the (txt, vec) pair flux_forward takes
        (reference sampling.prepare, flux/sampling.py:38-70)."""
        self._load()
        assert self._t5 is not None and self._clip is not None, \
            "text encoder checkpoints not configured"
        tt = self._t5_tok(prompts, max_length=self.max_length,
                          padding='max_length', truncation=True,
                          return_tensors='np')
        txt = self._t5(input_ids=tt['input_ids']).last_hidden_state
        ct = self._clip_tok(prompts, max_length=77, padding='max_length',
                            truncation=True, return_tensors='np')
        y = self._clip(input_ids=ct['input_ids']).pooler_output
        return jnp.asarray(txt), jnp.asarray(y)

    def release(self) -> None:
        """Drop encoder weights (the functional analogue of the
        reference's JIT offload, hyvideo chipmunk/util.py:4-43)."""
        self._t5 = self._clip = None
