"""LVLMRunner — the evaluation-facing model handle.

The functional analog of the reference's ``ModelBase`` (``testbed/models/model_base.py``):
bundles config + frozen params + tokenizer/processor + prompt template, and exposes
``apply_prompt_template`` / ``process_input`` / ``generate``.  Instead of
hook/replace mutation, shift parameters and LoRA adapters are plain attributes
passed into every forward (set once after loading a checkpoint — the analog of
``register_shift_hooks`` staying active for generation, ``src/eval.py:52-61``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.templates import apply_prompt_template as render_template
from .config import ModelConfig
from .generate import beam_generate, greedy_generate
from .lvlm import LVLMBatch
from .processor import LVLMProcessor

_FAMILY_TEMPLATE = {
    "idefics1": "idefics1",
    "idefics2": "idefics2",
    "llava-interleave": "llava-interleave",
    # text-only towers (reference mistral/qwen2 wrappers) use the ChatML template
    "text": "llava-interleave",
}


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class LVLMRunner:
    def __init__(
        self,
        cfg: ModelConfig,
        params: Dict[str, Any],
        tokenizer,
        template: Optional[str] = None,
        shift: Optional[Dict[str, jnp.ndarray]] = None,
        adapters: Optional[Dict[str, jnp.ndarray]] = None,
        lora_scaling: float = 1.0,
        logz2: str = "unmasked",
        pad_multiple: int = 128,
        image_size: Optional[int] = None,
        length_buckets: tuple = (),
        quant: Optional[str] = None,
    ):
        self.cfg = cfg
        self.decode_params = None
        self.params = params
        self.vision_cache = None
        if quant:
            self.set_quant(quant)
        self.tokenizer = tokenizer
        self.template = template or _FAMILY_TEMPLATE[cfg.family]
        self.processor = LVLMProcessor(cfg, tokenizer, image_size=image_size)
        self.shift = shift
        self.adapters = adapters
        self.lora_scaling = lora_scaling
        self.prefix = None
        self.logz2 = logz2
        self.pad_multiple = pad_multiple
        self.length_buckets = tuple(length_buckets)

    @property
    def model_name(self) -> str:
        return self.cfg.name

    def set_shift(
        self, shift, adapters=None, lora_scaling: float = 1.0, prefix=None
    ) -> None:
        """Activate trained shift/LoRA/prefix parameters for all subsequent
        forwards (the analog of register_shift_hooks staying active,
        reference src/eval.py:52-61)."""
        self.shift = shift
        self.adapters = adapters
        self.lora_scaling = lora_scaling
        self.prefix = prefix

    def enable_vision_cache(self, max_bytes: int = 512 * 1024 * 1024):
        """Cache encoded image features across ``generate`` calls, keyed by
        image content (``models/feature_cache.py``).

        The ICL eval protocol resamples demos from ONE fixed support set
        (reference ``src/dataset_utils/interface.py:296-317``) — with the
        cache, each support image's vision encode happens once per eval
        instead of once per occurrence.  Bit-exact: cached features are the
        encode function's own outputs.  Inline-splice families only."""
        from .feature_cache import VisionFeatureCache

        if self.cfg.family == "idefics1":
            raise ValueError("vision cache does not support cross-attention families")
        self.vision_cache = VisionFeatureCache(max_bytes=max_bytes)
        return self.vision_cache

    def set_quant(self, quant: Optional[str]) -> None:
        """(Re)build the weight-only int8 serving copy from the CURRENT params.

        Call after any weight mutation (checkpoint load, LoRA merge).  Modes:

        - ``"int8"`` — dual-copy serving: prefill keeps the full-precision tree
          (compute-bound, runs at matmul roofline) while decode steps stream the
          int8 copy (decode is weight-HBM-bound; measured ~1.3× per decode
          matmul on the v5e microbench).  Extra HBM ≈ 0.5× the text tower.
        - ``"int8-memory"`` — single copy: everything (incl. prefill) reads int8
          weights; halves text-tower HBM at some prefill cost.
        - ``"int8-w8a8"`` — single copy with the self-attention layer stacks
          additionally marked for W8A8 prefill dispatch: compute-bound text
          prefill matmuls run on the int8×int8 MXU with per-token activation
          quantization (measured 1.16-1.42× per matmul at idefics2-8b prefill
          shapes, ``ops/quant.py`` docstring).  Decode is identical to
          ``"int8-memory"``.  Least bit-parity of the modes (activations
          round too).
        - ``None`` — drop the int8 copy (bit-parity default).

        Not bit-identical to bf16; opt-in (reference is pure fp16 torch,
        ``src/config/train.yaml:16`` — quantization is a TPU-native addition).
        """
        if self.vision_cache is not None:
            self.vision_cache.clear()  # params tree changes below
        if quant is None:
            self.decode_params = None
            return
        from ..ops.quant import is_quantized, quantize_lm_params

        already = any(is_quantized(v) for v in jax.tree.leaves(
            self.params, is_leaf=is_quantized))
        if quant == "int8":
            if already:
                raise ValueError("params already int8-quantized (int8-memory mode)")
            self.decode_params = quantize_lm_params(self.params)
        elif quant in ("int8-memory", "int8-w8a8"):
            self.decode_params = None
            if not already:
                self.params = quantize_lm_params(
                    self.params, act_quant=quant == "int8-w8a8"
                )
        else:
            raise ValueError(
                f"unknown quant mode {quant!r} "
                "(supported: 'int8', 'int8-memory', 'int8-w8a8')"
            )

    def apply_prompt_template(self, conversation, add_generation_prompt: bool = False):
        return render_template(conversation, self.template, add_generation_prompt)

    def process_input(self, images, text, pad_to: Optional[int] = None) -> LVLMBatch:
        if text and not isinstance(text, str) and not isinstance(text[0], str):
            text = self.apply_prompt_template(text)
        enc = self.processor(images, text, pad_to=pad_to)
        return LVLMBatch(
            input_ids=jnp.asarray(enc["input_ids"]),
            attention_mask=jnp.asarray(enc["attention_mask"]),
            pixel_values=jnp.asarray(enc["pixel_values"]) if "pixel_values" in enc else None,
            pixel_mask=jnp.asarray(enc["pixel_mask"]) if "pixel_mask" in enc else None,
            image_attention_mask=(
                jnp.asarray(enc["image_attention_mask"])
                if "image_attention_mask" in enc
                else None
            ),
            patch_mask=jnp.asarray(enc["patch_mask"]) if "patch_mask" in enc else None,
        )

    def _image_cache_keys(self, images, enc) -> list:
        """One content key per [B, N] pixel slot (padding slots share a key).

        Source images are hashed raw (pre-processing) when their nesting
        matches the processed layout; otherwise the processed pixel slots
        themselves are digested (slower but always layout-correct)."""
        from .feature_cache import image_key

        B, N = enc["pixel_values"].shape[:2]
        pad = image_key(None)
        nested = images
        if nested is not None and not isinstance(nested, (list, tuple)):
            nested = [[nested]]
        elif nested and not isinstance(nested[0], (list, tuple)):
            nested = [list(nested)]
        if (
            nested is not None
            and len(nested) == B
            and all(len(row) <= N for row in nested)
        ):
            keys = []
            for row in nested:
                keys.extend(image_key(im) for im in row)
                keys.extend([pad] * (N - len(row)))
            return keys
        px, mask = enc["pixel_values"], enc["pixel_mask"]
        return [
            image_key(px[b, i]) if mask[b, i] else pad
            for b in range(B)
            for i in range(N)
        ]

    def generate(
        self,
        images,
        text,
        num_beams: int = 1,
        max_new_tokens: int = 10,
        length_penalty: float = 0.0,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        **_: Any,
    ) -> List[str]:
        """Prompt → decoded continuations (prompt stripped), HF-generate parity.

        Prompt lengths are bucketed to ``pad_multiple`` so repeated calls reuse
        compiled programs (generation requires left padding; the tokenizer's
        padding side is forced to "left" here).
        """
        old_side = self.tokenizer.padding_side
        self.tokenizer.padding_side = "left"
        try:
            rendered = (
                text
                if isinstance(text, str)
                or (isinstance(text, list) and text and isinstance(text[0], str))
                else self.apply_prompt_template(text)
            )
            probe = self.processor(images, rendered)
            T = probe["input_ids"].shape[1]
            pad_to = _round_up(T, self.pad_multiple)
            if self.length_buckets:
                fitting = [b for b in self.length_buckets if b >= T]
                if fitting:
                    pad_to = min(fitting)
            enc = self.processor(images, rendered, pad_to=pad_to)
        finally:
            self.tokenizer.padding_side = old_side

        import jax

        attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
        image_feats = None
        use_cache = (
            self.vision_cache is not None
            and "pixel_values" in enc
            and self.cfg.family != "idefics1"
        )
        if use_cache:
            keys = self._image_cache_keys(images, enc)
            image_feats = self.vision_cache.get_features(
                self.params, self.cfg, enc["pixel_values"],
                enc.get("patch_mask"), keys, attn_impl=attn_impl,
            )
        batch = LVLMBatch(
            input_ids=jnp.asarray(enc["input_ids"]),
            attention_mask=jnp.asarray(enc["attention_mask"]),
            # cache hits never ship pixels to the device — features are already there
            pixel_values=(
                None if use_cache
                else jnp.asarray(enc["pixel_values"]) if "pixel_values" in enc else None
            ),
            pixel_mask=(
                None if use_cache
                else jnp.asarray(enc["pixel_mask"]) if "pixel_mask" in enc else None
            ),
            image_attention_mask=(
                jnp.asarray(enc["image_attention_mask"])
                if "image_attention_mask" in enc
                else None
            ),
            patch_mask=(
                None if use_cache
                else jnp.asarray(enc["patch_mask"]) if "patch_mask" in enc else None
            ),
        )

        common = dict(
            max_new_tokens=max_new_tokens,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            shift=self.shift,
            adapters=self.adapters,
            lora_scaling=self.lora_scaling,
            logz2=self.logz2,
            # prefill runs the Pallas kernel on TPU (block-aligned via pad_multiple)
            attn_impl=attn_impl,
            decode_params=self.decode_params,
            prefix=self.prefix,
            image_feats=image_feats,
        )
        if do_sample:
            from .generate import sample_generate

            result = sample_generate(
                self.params, self.cfg, batch, rng=jax.random.PRNGKey(seed),
                temperature=temperature, top_k=top_k, top_p=top_p, **common,
            )
        elif num_beams > 1:
            result = beam_generate(
                self.params, self.cfg, batch, num_beams=num_beams,
                length_penalty=length_penalty, **common,
            )
        else:
            result = greedy_generate(self.params, self.cfg, batch, **common)
        tokens = np.asarray(result.tokens)
        return [
            self.tokenizer.decode(row, skip_special_tokens=True) for row in tokens
        ]
