"""Compile-only checks of the three REAL model architectures under 8-way model
parallelism (abstract params via eval_shape — no memory or weights needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.lvlm import LVLMBatch, init_lvlm_params, lvlm_forward
from mimic_tpu.parallel import make_mesh, param_shardings

EXPECTED_PARAMS_B = {
    "idefics2-8b-base": (8.0, 8.7),
    "idefics-9b": (8.5, 9.5),
    "llava-interleave-7b": (7.0, 8.6),
}


@pytest.mark.parametrize("name", list(EXPECTED_PARAMS_B))
def test_real_arch_compiles_sharded(name, eight_devices):
    cfg = get_model_config(name)
    params_shape = jax.eval_shape(
        lambda: init_lvlm_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params_shape))
    lo, hi = EXPECTED_PARAMS_B[name]
    assert lo <= n / 1e9 <= hi, f"{name}: {n/1e9:.2f}B params out of expected range"

    mesh = make_mesh(1, 8, eight_devices)
    shardings = param_shardings(params_shape, mesh)
    batch = LVLMBatch(
        input_ids=jax.ShapeDtypeStruct((1, 64), jnp.int32),
        attention_mask=jax.ShapeDtypeStruct((1, 64), jnp.int32),
    )
    kwargs = {}
    if cfg.family == "idefics1":
        # cross-attention states from the perceiver (vision path checked separately;
        # full-image compile at 224px is exercised by the idefics1 tiny tests)
        kwargs["image_feats"] = jax.ShapeDtypeStruct(
            (1, 64, cfg.vision.hidden_size), jnp.bfloat16
        )

    fn = jax.jit(lambda p, b, **kw: lvlm_forward(p, cfg, b, **kw).logits)
    with mesh:
        abstract = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            params_shape, shardings,
        )
        compiled = fn.lower(abstract, batch, **kwargs).compile()
    assert compiled is not None


def test_real_scale_beam_generate_compiles_sharded(eight_devices):
    """Beam search (the eval protocol path, incl. the beam-shared prompt cache)
    lowers and compiles at idefics2-8b scale under 8-way model parallelism —
    de-risks the real-slice accuracy runs without needing weights."""
    from mimic_tpu.models.generate import beam_generate

    cfg = get_model_config("idefics2-8b-base")
    params_shape = jax.eval_shape(
        lambda: init_lvlm_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    mesh = make_mesh(1, 8, eight_devices)
    shardings = param_shardings(params_shape, mesh)
    batch = LVLMBatch(
        input_ids=jax.ShapeDtypeStruct((2, 128), jnp.int32),
        attention_mask=jax.ShapeDtypeStruct((2, 128), jnp.int32),
        pixel_values=jax.ShapeDtypeStruct(
            (2, 1, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.bfloat16
        ),
        pixel_mask=jax.ShapeDtypeStruct((2, 1), jnp.int32),
        patch_mask=jax.ShapeDtypeStruct(
            (2, 1, cfg.vision.image_size // cfg.vision.patch_size,
             cfg.vision.image_size // cfg.vision.patch_size), jnp.int32
        ),
    )
    with mesh:
        abstract = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            params_shape, shardings,
        )
        compiled = beam_generate.lower(
            abstract, cfg, batch, max_new_tokens=10, num_beams=3,
            eos_token_id=2, pad_token_id=0,
        ).compile()
    assert compiled is not None
