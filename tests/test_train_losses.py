"""Loss/masking parity tests, cross-checked against torch implementations of the
reference formulas (torch used in tests only, as the parity oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mimic_tpu.train import (
    generate_label_mask,
    layer_wise_cos,
    layer_wise_mse,
    lm_cross_entropy,
    logits_kl,
    mask_to_gather,
    paired_gather_width,
)

PAD = 0


class TestLabelMask:
    def test_right_padding(self):
        # [bos, q, q, PAD, a, a, eos, PAD, PAD]  (right padding)
        ids = np.array([[1, 5, 6, PAD, 7, 8, 2, PAD, PAD]])
        m1 = generate_label_mask(ids, PAD, 1, "right")
        np.testing.assert_array_equal(
            m1[0], [False, False, False, False, True, True, True, False, False]
        )

    def test_two_separators(self):
        # [bos, ice, PAD, q, q, PAD, a, eos, PAD]
        ids = np.array([[1, 9, PAD, 5, 6, PAD, 7, 2, PAD]])
        m1 = generate_label_mask(ids, PAD, 1, "right")
        m2 = generate_label_mask(ids, PAD, 2, "right")
        np.testing.assert_array_equal(
            m1[0], [False, False, False, True, True, False, True, True, False]
        )
        np.testing.assert_array_equal(
            m2[0], [False, False, False, False, False, False, True, True, False]
        )

    def test_left_padding_ignores_leading_pads(self):
        # [PAD, PAD, bos, q, PAD, a, eos]
        ids = np.array([[PAD, PAD, 1, 5, PAD, 7, 2]])
        m1 = generate_label_mask(ids, PAD, 1, "left")
        np.testing.assert_array_equal(
            m1[0], [False, False, False, False, False, True, True]
        )

    def test_keep_bos(self):
        ids = np.array([[1, 5, PAD, 7, 2]])
        m = generate_label_mask(ids, PAD, 1, "right", keep_bos=True)
        assert m[0, 0] and m[0, 3] and m[0, 4] and not m[0, 1]

    def test_too_few_separators_raises(self):
        ids = np.array([[1, 5, 6, 7, 2]])
        with pytest.raises(ValueError):
            generate_label_mask(ids, PAD, 1, "right")

    def test_mask_to_gather_roundtrip(self):
        mask = np.array([[False, True, False, True], [True, True, True, False]])
        idx, valid = mask_to_gather(mask)
        np.testing.assert_array_equal(idx, [[1, 3, 0], [0, 1, 2]])
        np.testing.assert_array_equal(valid, [[True, True, False], [True, True, True]])


@pytest.fixture
def loss_data():
    rng = np.random.default_rng(0)
    L, B, T1, T2, D = 3, 2, 12, 8, 5
    prefix_h = rng.normal(size=(L, B, T1, D)).astype(np.float32)
    shift_h = rng.normal(size=(L, B, T2, D)).astype(np.float32)
    # per-sample query masks with equal counts across passes
    prefix_mask = np.zeros((B, T1), bool)
    shift_mask = np.zeros((B, T2), bool)
    prefix_mask[0, 3:8] = True
    shift_mask[0, 1:6] = True
    prefix_mask[1, 5:9] = True
    shift_mask[1, 2:6] = True
    return prefix_h, shift_h, prefix_mask, shift_mask


class TestLayerWise:
    def _reference_mse(self, prefix_h, shift_h, prefix_mask, shift_mask):
        """Reference semantics (src/shift_model.py:121-178) in torch."""
        import torch
        import torch.nn.functional as F

        L, B = prefix_h.shape[:2]
        per_sample = []
        for b in range(B):
            p = torch.tensor(prefix_h[:, b][:, prefix_mask[b]])  # [L, M, D]
            s = torch.tensor(shift_h[:, b][:, shift_mask[b]])
            per_sample.append(F.mse_loss(s, p, reduction="mean"))
        return float(torch.stack(per_sample).mean())

    def _reference_cos(self, prefix_h, shift_h, prefix_mask, shift_mask):
        import torch
        import torch.nn.functional as F

        L, B = prefix_h.shape[:2]
        per_sample = []
        for b in range(B):
            p = torch.tensor(prefix_h[:, b][:, prefix_mask[b]])
            s = torch.tensor(shift_h[:, b][:, shift_mask[b]])
            per_sample.append(1 - torch.mean(F.cosine_similarity(s, p, dim=-1), dim=1))
        return float(torch.stack(per_sample).mean())

    def test_mse_matches_reference(self, loss_data):
        prefix_h, shift_h, prefix_mask, shift_mask = loss_data
        width = paired_gather_width(prefix_mask, shift_mask)
        p_idx, valid = mask_to_gather(prefix_mask, width)
        s_idx, _ = mask_to_gather(shift_mask, width)
        got = float(
            layer_wise_mse(
                jnp.asarray(shift_h), jnp.asarray(prefix_h),
                jnp.asarray(s_idx), jnp.asarray(p_idx), jnp.asarray(valid),
            )
        )
        want = self._reference_mse(prefix_h, shift_h, prefix_mask, shift_mask)
        assert got == pytest.approx(want, rel=1e-5)

    def test_cos_matches_reference(self, loss_data):
        prefix_h, shift_h, prefix_mask, shift_mask = loss_data
        width = paired_gather_width(prefix_mask, shift_mask)
        p_idx, valid = mask_to_gather(prefix_mask, width)
        s_idx, _ = mask_to_gather(shift_mask, width)
        got = float(
            layer_wise_cos(
                jnp.asarray(shift_h), jnp.asarray(prefix_h),
                jnp.asarray(s_idx), jnp.asarray(p_idx), jnp.asarray(valid),
            )
        )
        want = self._reference_cos(prefix_h, shift_h, prefix_mask, shift_mask)
        assert got == pytest.approx(want, rel=1e-5)


class TestCE:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        B, T, V = 2, 6, 11
        logits = rng.normal(size=(B, T, V)).astype(np.float32)
        labels = rng.integers(1, V, size=(B, T))
        mask = np.ones((B, T), np.int32)
        mask[0, 4:] = 0  # padding
        got = float(
            lm_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask))
        )
        # HF semantics: shift, filter by shifted attention mask, mean
        sl = torch.tensor(logits[:, :-1]).reshape(-1, V)
        st = torch.tensor(labels[:, 1:]).reshape(-1)
        sm = torch.tensor(mask[:, 1:]).reshape(-1).bool()
        want = float(F.cross_entropy(sl[sm], st[sm]))
        assert got == pytest.approx(want, rel=1e-5)


class TestKL:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        B, T1, T2, V = 2, 9, 7, 13
        prefix_logits = rng.normal(size=(B, T1, V)).astype(np.float32)
        shift_logits = rng.normal(size=(B, T2, V)).astype(np.float32)
        prefix_mask = np.zeros((B, T1), bool)
        shift_mask = np.zeros((B, T2), bool)
        prefix_mask[0, 6:9] = True
        shift_mask[0, 4:7] = True
        prefix_mask[1, 5:7] = True
        shift_mask[1, 2:4] = True
        width = paired_gather_width(prefix_mask, shift_mask)
        p_idx, valid = mask_to_gather(prefix_mask, width)
        s_idx, _ = mask_to_gather(shift_mask, width)
        got = float(
            logits_kl(
                jnp.asarray(shift_logits), jnp.asarray(prefix_logits),
                jnp.asarray(s_idx), jnp.asarray(p_idx), jnp.asarray(valid),
            )
        )
        # reference: F.kl_div(shift[mask].log_softmax, prefix[mask].softmax, batchmean)
        q = torch.tensor(shift_logits)[torch.tensor(shift_mask)].log_softmax(-1)
        p = torch.tensor(prefix_logits)[torch.tensor(prefix_mask)].softmax(-1)
        want = float(F.kl_div(q, p, reduction="batchmean", log_target=False))
        assert got == pytest.approx(want, rel=1e-5)
