"""Flash-attention kernel vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.layers import repeat_kv, sdpa_with_lse, unmasked_lse
from mimic_tpu.ops.flash_attention import flash_attention


def make_qkv(B=2, T=128, S=128, H=4, Hkv=2, D=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    key_mask = np.ones((B, S), np.int32)
    key_mask[0, 100:] = 0          # suffix padding
    key_mask[1, 40:44] = 0         # internal PAD separator
    return q, k, v, jnp.asarray(key_mask)


def reference(q, k, v, key_mask, causal):
    B, T, H, D = q.shape
    S = k.shape[1]
    k_rep = repeat_kv(k, H // k.shape[2])
    v_rep = repeat_kv(v, H // k.shape[2])
    mask = key_mask[:, None, None, :].astype(bool)
    if causal:
        mask = mask & jnp.tril(jnp.ones((T, S), bool))[None, None]
    out, lse = sdpa_with_lse(q, k_rep, v_rep, mask)
    lse_u = unmasked_lse(q, k_rep)
    return out, lse, lse_u


@pytest.mark.parametrize("causal", [True, False])
def test_matches_reference(causal):
    q, k, v, key_mask = make_qkv()
    out, lse, lse_u = flash_attention(
        q, k, v, key_mask, causal=causal, block_q=64, block_k=64, interpret=True
    )
    ref_out, ref_lse, ref_lse_u = reference(q, k, v, key_mask, causal)
    # fully-masked rows (row 0 with causal+pad edge cases) produce garbage in both
    # implementations; compare where the masked lse is finite
    valid = np.asarray(ref_lse) > -1e29
    np.testing.assert_allclose(
        np.asarray(out)[valid.any(-1)], np.asarray(ref_out)[valid.any(-1)],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(lse)[valid], np.asarray(ref_lse)[valid], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse_u), np.asarray(ref_lse_u), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_fully_masked_key_blocks_skipped_exactly(causal):
    # a whole 64-wide key block masked out (variable-aspect vision padding):
    # the kernel skips it and valid rows match the reference bit-for-tolerance
    q, k, v, key_mask = make_qkv(T=128, S=192)
    km = np.asarray(key_mask)
    km = np.pad(km, ((0, 0), (0, 192 - km.shape[1])), constant_values=0)
    km[:, 64:128] = 0  # interior block fully masked
    key_mask = jnp.asarray(km)
    out, lse, _ = flash_attention(
        q, k, v, key_mask, causal=causal, block_q=64, block_k=64, interpret=True
    )
    ref_out, ref_lse, _ = reference(q, k, v, key_mask, causal)
    valid = np.asarray(ref_lse) > -1e29
    np.testing.assert_allclose(
        np.asarray(out)[valid.any(-1)], np.asarray(ref_out)[valid.any(-1)],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(lse)[valid], np.asarray(ref_lse)[valid], rtol=1e-5, atol=1e-5
    )


def test_mask_in_scores_path_matches_reference():
    # need_unmasked=False + non-lane-aligned D: the key-padding mask rides the
    # MXU in the D-padding lanes (vision-tower path) — outputs must match the
    # masked reference exactly (to tolerance), with real padded keys present
    q, k, v, key_mask = make_qkv(T=128, S=192)
    km = np.asarray(key_mask)
    km = np.pad(km, ((0, 0), (0, 192 - km.shape[1])), constant_values=0)
    km[:, 150:] = 0  # padded tail (variable-aspect vision)
    key_mask = jnp.asarray(km)
    out, lse, _ = flash_attention(
        q, k, v, key_mask, causal=False, block_q=64, block_k=64,
        need_unmasked=False, interpret=True,
    )
    ref_out, ref_lse, _ = reference(q, k, v, key_mask, causal=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), rtol=1e-5, atol=1e-5
    )


def test_mask_in_scores_forced_with_lane_aligned_D():
    # forcing mask_in_scores with D already lane-aligned must allocate a REAL
    # extra lane block for the mask column (a clamped .at[..., D] write would
    # silently corrupt the last feature lane)
    q, k, v, key_mask = make_qkv(T=128, S=128, D=128)
    out, lse, _ = flash_attention(
        q, k, v, key_mask, causal=False, block_q=64, block_k=64,
        need_unmasked=False, mask_in_scores=True, interpret=True,
    )
    ref_out, ref_lse, _ = reference(q, k, v, key_mask, causal=False)
    valid = np.asarray(ref_lse) > -1e29
    np.testing.assert_allclose(
        np.asarray(out)[valid.any(-1)], np.asarray(ref_out)[valid.any(-1)],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(lse)[valid], np.asarray(ref_lse)[valid], rtol=1e-5, atol=1e-5
    )


def test_rectangular_blocks():
    q, k, v, key_mask = make_qkv(T=256, S=256)
    out, lse, lse_u = flash_attention(
        q, k, v, key_mask, causal=True, block_q=128, block_k=64, interpret=True
    )
    ref_out, ref_lse, ref_lse_u = reference(q, k, v, key_mask, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_u), np.asarray(ref_lse_u), rtol=1e-5, atol=1e-5)


def test_odd_lengths_fall_back_to_full_blocks():
    # lengths with no hardware-friendly divisor use the full length as one block
    q, k, v, key_mask = make_qkv(T=100, S=100)
    out, lse, lse_u = flash_attention(
        q, k, v, key_mask, block_q=64, block_k=64, interpret=True
    )
    ref_out, ref_lse, ref_lse_u = reference(q, k, v, key_mask, True)
    np.testing.assert_allclose(np.asarray(lse_u), np.asarray(ref_lse_u), rtol=1e-5, atol=1e-5)


def test_vit_flash_path_matches_xla():
    """vit_forward(attn_impl="flash") pads the patch sequence to a 128-multiple,
    masks the pad slots, and matches the XLA path (incl. variable-aspect masks)."""
    import mimic_tpu.models.vision as V
    from mimic_tpu.models.config import VisionConfig

    cfg = VisionConfig(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
                       image_size=28, patch_size=14, use_class_token=False)
    params = V.init_vit_params(cfg, jax.random.PRNGKey(0))
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))

    ref = V.vit_forward(params, cfg, px)
    out = V.vit_forward(params, cfg, px, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # variable-aspect: image 1 has only the top row of patches valid
    pm = jnp.ones((2, 2, 2), jnp.int32).at[1, 1, :].set(0)
    ref = V.vit_forward(params, cfg, px, patch_mask=pm)
    out = V.vit_forward(params, cfg, px, patch_mask=pm, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out[1, :2]), np.asarray(ref[1, :2]), atol=2e-5)


def test_vit_large_patch_count_padding():
    """Patch counts >= 2048 pad to a 1024-multiple for the Pallas path (on CPU
    the attention still runs through the XLA branch, exercising the padded mask
    and the final slice)."""
    import mimic_tpu.models.vision as V
    from mimic_tpu.models.config import VisionConfig

    # 50x50 patch grid -> 2500 patches (>= 2048 threshold), pads to 3072
    cfg = VisionConfig(hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
                       image_size=100, patch_size=2, use_class_token=False)
    params = V.init_vit_params(cfg, jax.random.PRNGKey(0))
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 100, 100, 3))

    ref = V.vit_forward(params, cfg, px)                       # unpadded einsum path
    out = V.vit_forward(params, cfg, px, attn_impl="flash")    # padded path
    assert out.shape == ref.shape == (1, 2500, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # variable-aspect: bottom half of the grid masked out
    pm = jnp.ones((1, 50, 50), jnp.int32).at[0, 25:, :].set(0)
    ref = V.vit_forward(params, cfg, px, patch_mask=pm)
    out = V.vit_forward(params, cfg, px, patch_mask=pm, attn_impl="flash")
    np.testing.assert_allclose(
        np.asarray(out[0, :1250]), np.asarray(ref[0, :1250]), atol=3e-5)


# ---------------------------------------------------------------------------
# one-shot kernel (short sequences) + auto-dispatch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("need_unmasked", [True, False])
def test_onepass_matches_reference(causal, need_unmasked):
    from mimic_tpu.ops.flash_attention import onepass_attention

    q, k, v, key_mask = make_qkv()
    out, lse, lse_u = onepass_attention(
        q, k, v, key_mask, causal=causal, need_unmasked=need_unmasked,
        interpret=True,
    )
    ref_out, ref_lse, ref_lse_u = reference(q, k, v, key_mask, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)
    if need_unmasked:
        np.testing.assert_allclose(
            np.asarray(lse_u), np.asarray(ref_lse_u), atol=2e-5)


def test_onepass_vit_head_size():
    # D=72 (SigLIP): lane-misaligned head size through the select path
    from mimic_tpu.ops.flash_attention import onepass_attention

    q, k, v, key_mask = make_qkv(B=2, T=256, S=256, H=4, Hkv=4, D=72)
    out, lse, _ = onepass_attention(
        q, k, v, key_mask, causal=False, need_unmasked=False, interpret=True
    )
    ref_out, ref_lse, _ = reference(q, k, v, key_mask, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)


def test_onepass_mask_in_scores_column():
    # forced mask-in-scores: the appended q=1/k∈{0,NEG} column must reproduce
    # the key-padding mask exactly (the long-sequence flash regime's layout)
    from mimic_tpu.ops.flash_attention import onepass_attention

    q, k, v, key_mask = make_qkv(B=2, T=128, S=128, H=4, Hkv=2, D=72)
    out, lse, _ = onepass_attention(
        q, k, v, key_mask, causal=True, need_unmasked=False,
        mask_in_scores=True, interpret=True,
    )
    ref_out, ref_lse, _ = reference(q, k, v, key_mask, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)


def test_onepass_multi_query_blocks():
    # T large enough that the fp32 score tile splits into several q blocks:
    # causal offsets must track the block index
    from mimic_tpu.ops.flash_attention import (
        _ONEPASS_SCORE_BYTES, onepass_attention,
    )

    S = 2048
    assert _ONEPASS_SCORE_BYTES // (4 * S) < S  # shapes actually split
    q, k, v, key_mask = make_qkv(B=2, T=S, S=S, H=2, Hkv=1, D=32)
    out, lse, lse_u = onepass_attention(
        q, k, v, key_mask, causal=True, need_unmasked=True, interpret=True
    )
    ref_out, ref_lse, ref_lse_u = reference(q, k, v, key_mask, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_u), np.asarray(ref_lse_u), atol=2e-5)


def test_flash_auto_dispatch_matches_pinned_blocks():
    # default-block flash_attention at S<=ONEPASS_MAX_S dispatches to the
    # one-shot kernel; results must match the pinned-block flash kernel
    q, k, v, key_mask = make_qkv(B=2, T=512, S=512, H=4, Hkv=2, D=64, seed=3)
    auto = flash_attention(q, k, v, key_mask, causal=True, interpret=True)
    pinned = flash_attention(
        q, k, v, key_mask, causal=True, block_q=128, block_k=128, interpret=True
    )
    for a, p in zip(auto, pinned):
        np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=2e-5)


def test_flash_tiny_shape_xla_fallback_runs_on_cpu():
    # below ONEPASS_MIN_ELEMS and not interpret: the pure-jnp fallback serves
    # the kernel contract — runnable on any backend, same numbers
    from mimic_tpu.ops.flash_attention import ONEPASS_MIN_ELEMS

    q, k, v, key_mask = make_qkv(B=2, T=128, S=128, H=4, Hkv=2, D=64, seed=4)
    assert 2 * 4 * 128 * 128 < ONEPASS_MIN_ELEMS
    out, lse, lse_u = flash_attention(q, k, v, key_mask, causal=True)
    ref_out, ref_lse, ref_lse_u = reference(q, k, v, key_mask, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_u), np.asarray(ref_lse_u), atol=2e-5)
