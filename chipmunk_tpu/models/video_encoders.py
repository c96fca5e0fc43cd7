"""Text encoders for the video model families.

* **UMT5-XXL encoder** (Wan2.1): a pure-JAX implementation of the
  reference's custom T5 variant (examples/wan/wan/modules/t5.py:46-313,
  umt5_xxl config t5.py:456-469): RMS T5LayerNorm, unscaled attention,
  PER-LAYER bidirectional relative-position bias (shared_pos=False — the
  UMT5 difference from vanilla T5), gated-tanh-GELU feed-forward
  ``fc2(fc1(x) * gelu(gate(x)))``, residual fp16 clamping.  transformers
  ships no Flax UMT5, so this is hand-rolled; the loader maps the
  reference's torch checkpoint key layout 1:1.

* **HunyuanVideo LLM encoder**: the reference encodes prompts with a
  LLaVA-LLaMA-3-8B decoder under an instruct template, takes
  ``hidden_states[-(skip_layer+1)]`` (skip=2) WITHOUT final norm, and
  crops the instruction prefix (crop_start=95 for video;
  hyvideo/text_encoder/__init__.py:306-333, constants.py:35-60).  Here
  the LLM runs via transformers' FlaxLlamaModel (weights local-only) and
  the template/skip/crop logic is reproduced exactly.

Both run OUTSIDE the denoise loop as separate programs and can be
released after embedding (the functional analogue of the reference's JIT
text-encoder offload, hyvideo chipmunk/util.py:4-43).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------ UMT5


@dataclass(frozen=True)
class UMT5Config:
    # reference umt5_xxl (t5.py:456-469)
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    dtype: object = jnp.float32


def _t5_layer_norm(x, w, eps=1e-6):
    # RMS norm without mean subtraction (t5.py:53-67)
    x = x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True) + eps
    ).astype(x.dtype)
    return w * x


def _gelu_tanh(x):
    # the reference's explicit tanh GELU (t5.py:46-50)
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def _fp16_clamp(x):
    # reference fp16_clamp (t5.py:36-41) only clamps fp16; bf16/f32 pass
    return x


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int,
                             max_dist: int) -> np.ndarray:
    """Bidirectional bucket ids (reference t5.py:246-266).  Static
    host-side: sequence lengths are fixed per program."""
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel_pos, 1).astype(np.float64) / max_exact)
        / math.log(max_dist / max_exact) * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets


def _bucket_ids(seq: int, cfg: UMT5Config) -> np.ndarray:
    rel = np.arange(seq)[None, :] - np.arange(seq)[:, None]
    return relative_position_bucket(rel, cfg.num_buckets, cfg.max_dist)


def init_umt5_params(key: jax.Array, cfg: UMT5Config) -> Dict:
    """Synthesized weights (tests / demo mode), same tree as the loader."""
    ks = iter(jax.random.split(key, 4 + 9 * cfg.num_layers))
    d, da, df, h = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_heads

    def w(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    def layer():
        return {
            'norm1': jnp.ones((d,), cfg.dtype),
            'q': w(next(ks), (d, da), (d * da) ** -0.25),
            'k': w(next(ks), (d, da), d ** -0.5),
            'v': w(next(ks), (d, da), d ** -0.5),
            'o': w(next(ks), (da, d), (d * da) ** -0.25),
            'pos_emb': w(next(ks), (cfg.num_buckets, h), d ** -0.5),
            'norm2': jnp.ones((d,), cfg.dtype),
            'gate': w(next(ks), (d, df), d ** -0.5),
            'fc1': w(next(ks), (d, df), d ** -0.5),
            'fc2': w(next(ks), (df, d), df ** -0.5),
        }

    layers = [layer() for _ in range(cfg.num_layers)]
    return {
        'token_embedding': w(next(ks), (cfg.vocab_size, d), 1.0),
        'blocks': jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        'norm': jnp.ones((d,), cfg.dtype),
    }


@partial(jax.jit, static_argnames=('cfg',))
def umt5_encode(params: Dict, ids: jnp.ndarray, mask: jnp.ndarray,
                cfg: UMT5Config) -> jnp.ndarray:
    """ids int32 [B, L], mask {0,1} [B, L] -> context [B, L, dim]
    (reference T5Encoder.forward, t5.py:303-313; the caller crops each row
    to its valid length like T5EncoderModel.__call__, t5.py:506-513)."""
    B, L = ids.shape
    h, hd = cfg.num_heads, cfg.dim_attn // cfg.num_heads
    x = params['token_embedding'][ids].astype(cfg.dtype)
    buckets = jnp.asarray(_bucket_ids(L, cfg))            # [L, L] int
    neg = jnp.finfo(jnp.float32).min
    mbias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)  # [B,1,1,L]

    def block(x, p):
        e = p['pos_emb'][buckets]                         # [L, L, h]
        bias = jnp.transpose(e, (2, 0, 1))[None]          # [1, h, L, L]
        y = _t5_layer_norm(x, p['norm1'])
        q = (y @ p['q']).reshape(B, L, h, hd)
        k = (y @ p['k']).reshape(B, L, h, hd)
        v = (y @ p['v']).reshape(B, L, h, hd)
        # T5 attention is UNSCALED (t5.py:112-115)
        s = jnp.einsum('binc,bjnc->bnij', q, k).astype(jnp.float32)
        s = s + bias.astype(jnp.float32) + mbias
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        y = jnp.einsum('bnij,bjnc->binc', a, v).reshape(B, L, -1)
        x = _fp16_clamp(x + y @ p['o'])
        y = _t5_layer_norm(x, p['norm2'])
        y = (y @ p['fc1']) * _gelu_tanh(y @ p['gate'])
        x = _fp16_clamp(x + y @ p['fc2'])
        return x, None

    x, _ = jax.lax.scan(block, x, params['blocks'])
    return _t5_layer_norm(x, params['norm'])


def load_umt5_torch(path: str, cfg: UMT5Config = None) -> Dict:
    """Map the reference UMT5-XXL encoder checkpoint (torch .pth state
    dict, key layout t5.py:267-302: token_embedding / blocks.{i}.{norm1,
    attn.{q,k,v,o},pos_embedding.embedding,norm2,ffn.{gate.0,fc1,fc2}} /
    norm) into the umt5_encode param tree.  Also accepts .safetensors."""
    cfg = cfg or UMT5Config()
    if path.endswith('.safetensors'):
        import safetensors.numpy
        sd = dict(safetensors.numpy.load_file(path))
    else:
        import torch
        sd = {k: v.float().numpy()
              for k, v in torch.load(path, map_location='cpu',
                                     weights_only=True).items()}

    def a(name):
        w = sd[name]
        return jnp.asarray(np.asarray(w), cfg.dtype)

    def lin(name):      # torch Linear stores [out, in] -> ours [in, out]
        return jnp.asarray(np.asarray(sd[name]).T, cfg.dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f'blocks.{i}'
        layers.append({
            'norm1': a(f'{p}.norm1.weight'),
            'q': lin(f'{p}.attn.q.weight'),
            'k': lin(f'{p}.attn.k.weight'),
            'v': lin(f'{p}.attn.v.weight'),
            'o': lin(f'{p}.attn.o.weight'),
            'pos_emb': a(f'{p}.pos_embedding.embedding.weight'),
            'norm2': a(f'{p}.norm2.weight'),
            'gate': lin(f'{p}.ffn.gate.0.weight'),
            'fc1': lin(f'{p}.ffn.fc1.weight'),
            'fc2': lin(f'{p}.ffn.fc2.weight'),
        })
    return {
        'token_embedding': a('token_embedding.weight'),
        'blocks': jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        'norm': a('norm.weight'),
    }


@dataclass
class WanTextEncoder:
    """Tokenize + encode prompts for Wan (reference T5EncoderModel,
    t5.py:472-513): google/umt5-xxl tokenizer, whitespace-cleaned,
    padded/cropped to text_len; rows are cropped to their valid lengths
    by the Wan pipeline's zero-pad convention (models/wan.py ctx pad)."""
    checkpoint_path: Optional[str] = None
    tokenizer_path: Optional[str] = None
    text_len: int = 512
    dtype: object = jnp.bfloat16

    def __post_init__(self):
        self._params = self._tok = None
        self._cfg = UMT5Config(dtype=self.dtype)

    def available(self) -> bool:
        return bool(self.checkpoint_path and self.tokenizer_path)

    def _load(self):
        if self._params is None and self.checkpoint_path:
            self._params = load_umt5_torch(self.checkpoint_path, self._cfg)
        if self._tok is None and self.tokenizer_path:
            from transformers import AutoTokenizer
            self._tok = AutoTokenizer.from_pretrained(self.tokenizer_path)

    def embed(self, prompts) -> jnp.ndarray:
        """list[str] -> [B, text_len, 4096] with pad rows zeroed (the
        reference returns variable-length rows, t5.py:512-513; our model
        takes fixed text_len with zero padding, models/wan.py)."""
        self._load()
        assert self._params is not None and self._tok is not None
        tt = self._tok(list(prompts), max_length=self.text_len,
                       padding='max_length', truncation=True,
                       return_tensors='np')
        ids = jnp.asarray(tt['input_ids'], jnp.int32)
        mask = jnp.asarray(tt['attention_mask'], jnp.int32)
        ctx = umt5_encode(self._params, ids, mask, self._cfg)
        return ctx * (mask[..., None] > 0)

    def release(self):
        self._params = None


# ------------------------------------------------ HunyuanVideo LLM encoder

# reference constants.py:40-51 (video template) / 35-39 (image)
PROMPT_TEMPLATE_ENCODE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:"
    "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
VIDEO_CROP_START = 95          # constants.py:58-60


def select_skip_layer_hidden(hidden_states, skip_layer: int,
                             crop_start: int = 0):
    """The reference's output selection (text_encoder/__init__.py:311-333):
    hidden_states[-(skip+1)] (NO final norm is applied in the shipped
    config: apply_final_norm defaults False), then drop the instruction
    prefix."""
    h = hidden_states[-(skip_layer + 1)]
    return h[:, crop_start:] if crop_start > 0 else h


@dataclass
class HunyuanTextEncoders:
    """LLaVA-LLaMA-3-8B prompt encoder (template + skip-layer + crop) +
    CLIP-L pooled vector, via transformers Flax (weights local-only).

    llm_path must be loadable by FlaxLlamaModel; the reference loads the
    same llama trunk with AutoModel (text_encoder/__init__.py:35-39)."""
    llm_path: Optional[str] = None
    clip_path: Optional[str] = None
    max_length: int = 256 + VIDEO_CROP_START   # prompt tokens + template
    hidden_state_skip_layer: int = 2           # config.py hunyuan default
    dtype: object = jnp.bfloat16

    def __post_init__(self):
        self._llm = self._llm_tok = self._clip = self._clip_tok = None

    def available(self) -> bool:
        return bool(self.llm_path and self.clip_path)

    def _load(self):
        from transformers import (FlaxLlamaModel, AutoTokenizer,
                                  FlaxCLIPTextModel)
        if self._llm is None and self.llm_path:
            self._llm = FlaxLlamaModel.from_pretrained(
                self.llm_path, dtype=self.dtype)
            self._llm_tok = AutoTokenizer.from_pretrained(self.llm_path)
        if self._clip is None and self.clip_path:
            self._clip = FlaxCLIPTextModel.from_pretrained(
                self.clip_path, dtype=self.dtype)
            self._clip_tok = AutoTokenizer.from_pretrained(self.clip_path)

    def embed(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
        """list[str] -> (txt [B, L, 4096], txt_mask [B, L], y [B, 768])
        — the (txt, txt_mask, vec) triple HunyuanModel takes."""
        self._load()
        assert self._llm is not None and self._clip is not None
        texts = [PROMPT_TEMPLATE_ENCODE_VIDEO.format(p) for p in prompts]
        tt = self._llm_tok(texts, max_length=self.max_length,
                           padding='max_length', truncation=True,
                           return_tensors='np')
        out = self._llm(input_ids=tt['input_ids'],
                        attention_mask=tt['attention_mask'],
                        output_hidden_states=True)
        txt = select_skip_layer_hidden(out.hidden_states,
                                       self.hidden_state_skip_layer,
                                       VIDEO_CROP_START)
        txt_mask = tt['attention_mask'][:, VIDEO_CROP_START:]
        ct = self._clip_tok(list(prompts), max_length=77,
                            padding='max_length', truncation=True,
                            return_tensors='np')
        y = self._clip(input_ids=ct['input_ids']).pooler_output
        return (jnp.asarray(txt), jnp.asarray(txt_mask, jnp.int32),
                jnp.asarray(y))

    def release(self):
        self._llm = self._clip = None
