import time
import numpy as np
import jax, jax.numpy as jnp
from bench import build_bench_model
from mimic_tpu.models.lvlm import LVLMBatch, encode_images, lvlm_forward
from mimic_tpu.models.generate import greedy_generate, beam_generate, _prefill
from mimic_tpu.models.decoder import init_kv_cache

cfg, params, tk = build_bench_model()
B, T, N = 16, 512, 1
size = cfg.vision.image_size
rng = np.random.default_rng(0)
ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
ids[:, 4:4+cfg.image_seq_len] = cfg.image_token_id
batch = LVLMBatch(
    input_ids=jnp.asarray(ids),
    attention_mask=jnp.ones((B, T), jnp.int32),
    pixel_values=jnp.asarray(rng.normal(size=(B, N, size, size, 3)).astype(np.float32), jnp.bfloat16),
    pixel_mask=jnp.ones((B, N), jnp.int32),
)

def timeit(f, sync, n=5):
    r = f(); sync(r)
    t0 = time.perf_counter()
    last = None
    for _ in range(n): last = f()
    sync(last)
    return (time.perf_counter() - t0) / n

# vision encode
enc = jax.jit(lambda p, px: encode_images(p, cfg, px))
t_vis = timeit(lambda: enc(params, batch.pixel_values), lambda r: np.asarray(r[0,0,0]))
print(f"vision encode: {t_vis*1e3:.1f} ms")

# prefill (forward with cache over total=522)
total = T + 10
prefill = jax.jit(lambda p, b: _prefill(p, cfg, b, total, None, None, 1.0, "unmasked", jnp.bfloat16)[0])
t_pre = timeit(lambda: prefill(params, batch), lambda r: np.asarray(r[0,0]))
print(f"prefill+vision: {t_pre*1e3:.1f} ms")

# full greedy
t_greedy = timeit(lambda: greedy_generate(params, cfg, batch, 10, tk.eos_token_id, tk.pad_token_id),
                  lambda r: np.asarray(r.tokens[0,0]))
print(f"greedy total: {t_greedy*1e3:.1f} ms")

# full beam3
t_beam = timeit(lambda: beam_generate(params, cfg, batch, 10, 3, tk.eos_token_id, tk.pad_token_id),
                lambda r: np.asarray(r.tokens[0,0]))
print(f"beam3 total:  {t_beam*1e3:.1f} ms  -> {B/t_beam:.1f} q/s")
