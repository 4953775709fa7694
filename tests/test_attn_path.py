"""Attention-path selection must be observable, not inferred.

The flash kernel silently falls back to XLA when its alignment constraints
fail (e.g. head_size not a multiple of the 128-lane width, VERDICT weak #7);
these tests pin exactly which implementation each configuration runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mimic_tpu.models.config import TextConfig, get_model_config
from mimic_tpu.models.decoder import ATTN_PATH_LOG, make_causal_mask, select_attn_path
from mimic_tpu.models.lm import init_lm_params, lm_forward


def _text(head_dim, sliding_window=None):
    return TextConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, head_dim=head_dim,
        sliding_window=sliding_window,
    )


class TestSelectAttnPath:
    def test_flash_selected_when_aligned(self):
        cfg = _text(head_dim=128)
        assert (
            select_attn_path(cfg, "flash", 256, cacheless=True, has_key_mask=True)
            == "flash"
        )

    def test_dh_not_lane_aligned_falls_back_to_xla(self):
        # Dh-64 (and idefics1's Dh-72 ViT shapes) must NOT silently claim flash
        cfg = _text(head_dim=64)
        assert (
            select_attn_path(cfg, "flash", 256, cacheless=True, has_key_mask=True)
            == "xla"
        )

    def test_unaligned_T_falls_back(self):
        cfg = _text(head_dim=128)
        assert (
            select_attn_path(cfg, "flash", 200, cacheless=True, has_key_mask=True)
            == "xla"
        )

    def test_sliding_window_narrower_than_block_falls_back(self):
        cfg = _text(head_dim=128, sliding_window=64)
        assert (
            select_attn_path(cfg, "flash", 256, cacheless=True, has_key_mask=True)
            == "xla"
        )
        # window >= T: causality already bounds lookback, flash stays eligible
        cfg = _text(head_dim=128, sliding_window=4096)
        assert (
            select_attn_path(cfg, "flash", 256, cacheless=True, has_key_mask=True)
            == "flash"
        )

    def test_cached_path(self):
        cfg = _text(head_dim=128)
        assert (
            select_attn_path(cfg, "flash", 1, cacheless=False, has_key_mask=True)
            == "cached"
        )

    def test_ring_requires_divisible_and_long(self, eight_devices):
        cfg = _text(head_dim=16)
        mesh = Mesh(np.asarray(eight_devices), axis_names=("sp",))
        sel = lambda T, m: select_attn_path(
            cfg, "ring", T, cacheless=True, has_key_mask=True,
            ring_mesh=mesh, ring_axis="sp", ring_min_len=m,
        )
        assert sel(256, 0) == "ring"
        assert sel(250, 0) == "xla"      # not divisible by 8
        assert sel(256, 1024) == "xla"   # below ring_min_len (shift pass)


class TestTraceLog:
    def test_forward_records_selected_path(self):
        import jax

        cfg = _text(head_dim=128)
        params = init_lm_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.asarray(np.arange(3, 3 + 128)[None] % 250)
        mask = jnp.ones((1, 128), jnp.int32)

        # eval_shape traces the forward (populating the log) without running
        # the Pallas kernel, which needs interpret mode on CPU
        ATTN_PATH_LOG.clear()
        jax.eval_shape(
            lambda p: lm_forward(
                p, cfg, ids, attn_mask=make_causal_mask(mask),
                key_mask=mask, attn_impl="flash",
            ),
            params,
        )
        assert ATTN_PATH_LOG and ATTN_PATH_LOG[-1] == "flash"

        cfg64 = _text(head_dim=64)
        params64 = init_lm_params(cfg64, jax.random.PRNGKey(0))
        ATTN_PATH_LOG.clear()
        jax.eval_shape(
            lambda p: lm_forward(
                p, cfg64, ids, attn_mask=make_causal_mask(mask),
                key_mask=mask, attn_impl="flash",
            ),
            params64,
        )
        assert ATTN_PATH_LOG and ATTN_PATH_LOG[-1] == "xla"
