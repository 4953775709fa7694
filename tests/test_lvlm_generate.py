import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic_tpu.models.config import get_model_config
from mimic_tpu.models.decoder import make_causal_mask
from mimic_tpu.models.generate import beam_generate, greedy_generate
from mimic_tpu.models.lvlm import (
    LVLMBatch,
    encode_images,
    init_lvlm_params,
    lvlm_forward,
    splice_image_embeds,
)
from mimic_tpu.models.processor import LVLMProcessor
from mimic_tpu.models.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def setup():
    tk = SimpleTokenizer(padding_side="left")
    cfg = get_model_config("tiny-idefics2").replace(
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
    )
    # vocab must cover tokenizer ids
    cfg = cfg.replace(text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size}))
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
    proc = LVLMProcessor(cfg, tk)
    return cfg, params, proc, tk


def make_batch(proc, texts, images):
    enc = proc(images, texts)
    return LVLMBatch(
        input_ids=jnp.asarray(enc["input_ids"]),
        attention_mask=jnp.asarray(enc["attention_mask"]),
        pixel_values=jnp.asarray(enc["pixel_values"]) if "pixel_values" in enc else None,
        pixel_mask=jnp.asarray(enc["pixel_mask"]) if "pixel_mask" in enc else None,
        image_attention_mask=(
            jnp.asarray(enc["image_attention_mask"]) if "image_attention_mask" in enc else None
        ),
    )


def rand_image(seed):
    return np.random.default_rng(seed).integers(0, 255, size=(28, 28, 3)).astype(np.uint8)


class TestProcessor:
    def test_image_token_expansion(self, setup):
        cfg, params, proc, tk = setup
        enc = proc([[rand_image(0)]], ["Image:<image> Question: hi Answer:"])
        n_img_tokens = int((enc["input_ids"] == tk.image_token_id).sum())
        assert n_img_tokens == cfg.image_seq_len
        assert enc["pixel_values"].shape == (1, 1, 28, 28, 3)

    def test_left_padding(self, setup):
        cfg, params, proc, tk = setup
        enc = proc(None, ["short", "a much longer text here"])
        assert enc["input_ids"][0, 0] == tk.pad_token_id
        assert enc["attention_mask"][0, 0] == 0
        assert enc["attention_mask"][0, -1] == 1


class TestLVLMForward:
    def test_splice(self):
        embeds = jnp.zeros((1, 5, 4))
        feats = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 4)
        ids = jnp.array([[7, 99, 8, 99, 9]])
        out = splice_image_embeds(embeds, feats, ids, 99)
        np.testing.assert_array_equal(out[0, 1], feats[0, 0])
        np.testing.assert_array_equal(out[0, 3], feats[0, 1])
        np.testing.assert_array_equal(out[0, 0], jnp.zeros(4))

    def test_forward_with_images(self, setup):
        cfg, params, proc, tk = setup
        batch = make_batch(proc, ["Image:<image> Question: x Answer:"], [[rand_image(0)]])
        out = lvlm_forward(params, cfg, batch)
        assert out.logits.shape[0] == 1
        assert out.logits.shape[-1] == cfg.text.vocab_size

    def test_image_content_changes_logits(self, setup):
        cfg, params, proc, tk = setup
        b1 = make_batch(proc, ["Image:<image> Q Answer:"], [[rand_image(0)]])
        b2 = make_batch(proc, ["Image:<image> Q Answer:"], [[rand_image(1)]])
        l1 = lvlm_forward(params, cfg, b1).logits
        l2 = lvlm_forward(params, cfg, b2).logits
        assert not np.allclose(l1, l2, atol=1e-6)

    def test_idefics1_forward(self):
        tk = SimpleTokenizer(padding_side="left")
        cfg = get_model_config("tiny-idefics1").replace(
            image_token_id=tk.image_token_id, pad_token_id=tk.pad_token_id,
        )
        cfg = cfg.replace(
            text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size})
        )
        params = init_lvlm_params(cfg, jax.random.PRNGKey(0))
        proc = LVLMProcessor(cfg, tk)
        batch = make_batch(
            proc, ["Image:<image> Q: a Answer: b\nImage:<image> Q: c Answer:"],
            [[rand_image(0), rand_image(1)]],
        )
        assert batch.image_attention_mask is not None
        out = lvlm_forward(params, cfg, batch)
        assert out.logits.shape[-1] == cfg.text.vocab_size
        # image content must influence logits through cross-attention once gates open
        params2 = jax.tree.map(lambda x: x, params)
        params2["lm"]["decoder"]["cross"]["alpha_attn"] = jnp.ones_like(
            params["lm"]["decoder"]["cross"]["alpha_attn"]
        )
        b2 = make_batch(
            proc, ["Image:<image> Q: a Answer: b\nImage:<image> Q: c Answer:"],
            [[rand_image(2), rand_image(3)]],
        )
        l1 = lvlm_forward(params2, cfg, batch).logits
        l2 = lvlm_forward(params2, cfg, b2).logits
        assert not np.allclose(l1, l2, atol=1e-6)


def naive_greedy(params, cfg, batch, steps):
    """Reference greedy decode with full re-forward each step (no cache)."""
    ids = batch.input_ids
    mask = batch.attention_mask
    out_toks = []
    for _ in range(steps):
        logits = lvlm_forward(
            params, cfg,
            LVLMBatch(ids, mask, batch.pixel_values, batch.pixel_mask,
                      _extend_img_mask(batch.image_attention_mask, ids.shape[1])),
        ).logits
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out_toks.append(nxt)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
        mask = jnp.concatenate([mask, jnp.ones((ids.shape[0], 1), mask.dtype)], axis=1)
    return jnp.stack(out_toks, axis=1)


def _extend_img_mask(img_mask, T):
    if img_mask is None:
        return None
    pad = T - img_mask.shape[1]
    if pad <= 0:
        return img_mask
    return jnp.concatenate(
        [img_mask] + [img_mask[:, -1:]] * pad, axis=1
    )


class TestGreedy:
    def test_matches_naive(self, setup):
        cfg, params, proc, tk = setup
        batch = make_batch(
            proc,
            ["Image:<image> Question: what? Answer:", "Image:<image> Question: who is here? Answer:"],
            [[rand_image(0)], [rand_image(1)]],
        )
        res = greedy_generate(
            params, cfg, batch, max_new_tokens=5,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        ref = naive_greedy(params, cfg, batch, 5)
        np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref))

    def test_eos_padding(self, setup):
        cfg, params, proc, tk = setup
        batch = make_batch(proc, ["hello"], None)
        # treat whatever token the model naturally emits first as EOS: the output
        # must then be [that token, pad, pad, ...]
        first = int(
            np.asarray(
                greedy_generate(
                    params, cfg, batch, max_new_tokens=1,
                    eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
                ).tokens
            )[0, 0]
        )
        res = greedy_generate(
            params, cfg, batch, max_new_tokens=4,
            eos_token_id=first, pad_token_id=tk.pad_token_id,
        )
        toks = np.asarray(res.tokens)[0]
        assert toks[0] == first
        assert all(t == tk.pad_token_id for t in toks[1:])


class TestBeam:
    def test_beam1_matches_greedy(self, setup):
        cfg, params, proc, tk = setup
        batch = make_batch(proc, ["Image:<image> Question: y Answer:"], [[rand_image(2)]])
        g = greedy_generate(
            params, cfg, batch, max_new_tokens=4,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        b = beam_generate(
            params, cfg, batch, max_new_tokens=4, num_beams=1,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))

    def test_beam_score_at_least_greedy(self, setup):
        cfg, params, proc, tk = setup
        batch = make_batch(proc, ["Question: z Answer:"], None)
        steps = 4
        g = naive_greedy(params, cfg, batch, steps)
        # score the greedy sequence
        ids, mask = batch.input_ids, batch.attention_mask
        score = 0.0
        for t in range(steps):
            logits = lvlm_forward(params, cfg, LVLMBatch(ids, mask)).logits
            lp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
            score += float(lp[int(g[0, t])])
            ids = jnp.concatenate([ids, g[:, t : t + 1]], axis=1)
            mask = jnp.concatenate([mask, jnp.ones((1, 1), mask.dtype)], axis=1)
        b = beam_generate(
            params, cfg, batch, max_new_tokens=steps, num_beams=3,
            eos_token_id=tk.eos_token_id, pad_token_id=tk.pad_token_id,
        )
        assert float(b.scores[0]) >= score - 1e-4


class TestSampleGenerate:
    @staticmethod
    def _batch(proc):
        return make_batch(
            proc,
            ["Image:<image> Question: color? Answer:",
             "Image:<image> Question: count? Answer:"],
            [[rand_image(0)], [rand_image(1)]],
        )

    def test_low_temperature_matches_greedy(self, setup):
        cfg, params, proc, tk = setup
        batch = self._batch(proc)
        from mimic_tpu.models.generate import greedy_generate, sample_generate

        g = greedy_generate(params, cfg, batch, 5, tk.eos_token_id, tk.pad_token_id)
        s = sample_generate(
            params, cfg, batch, 5, tk.eos_token_id, tk.pad_token_id,
            rng=jax.random.PRNGKey(0), temperature=1e-4,
        )
        np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))

    def test_top_k_1_matches_greedy(self, setup):
        cfg, params, proc, tk = setup
        batch = self._batch(proc)
        from mimic_tpu.models.generate import greedy_generate, sample_generate

        g = greedy_generate(params, cfg, batch, 5, tk.eos_token_id, tk.pad_token_id)
        s = sample_generate(
            params, cfg, batch, 5, tk.eos_token_id, tk.pad_token_id,
            rng=jax.random.PRNGKey(7), top_k=1,
        )
        np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))

    def test_seeded_and_varied(self, setup):
        cfg, params, proc, tk = setup
        batch = self._batch(proc)
        from mimic_tpu.models.generate import sample_generate

        a = sample_generate(params, cfg, batch, 8, tk.eos_token_id, tk.pad_token_id,
                            rng=jax.random.PRNGKey(1), temperature=2.0)
        b = sample_generate(params, cfg, batch, 8, tk.eos_token_id, tk.pad_token_id,
                            rng=jax.random.PRNGKey(1), temperature=2.0)
        c = sample_generate(params, cfg, batch, 8, tk.eos_token_id, tk.pad_token_id,
                            rng=jax.random.PRNGKey(2), temperature=2.0)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
        assert not np.array_equal(np.asarray(a.tokens), np.asarray(c.tokens))
        assert np.all(np.asarray(a.scores) <= 0.0)  # sum of logprobs

    def test_top_p_restricts_support(self, setup):
        """With a near-deterministic distribution, top_p keeps only the head —
        sampling must coincide with greedy at any seed."""
        cfg, params, proc, tk = setup
        batch = self._batch(proc)
        from mimic_tpu.models.generate import greedy_generate, sample_generate

        g = greedy_generate(params, cfg, batch, 5, tk.eos_token_id, tk.pad_token_id)
        for seed in (0, 3):
            s = sample_generate(
                params, cfg, batch, 5, tk.eos_token_id, tk.pad_token_id,
                rng=jax.random.PRNGKey(seed), temperature=0.005, top_p=0.5,
            )
            np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))
