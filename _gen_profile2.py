import time
import numpy as np
import jax, jax.numpy as jnp
from bench import build_bench_model
from mimic_tpu.models.lvlm import LVLMBatch
from mimic_tpu.models.generate import greedy_generate

cfg, params, tk = build_bench_model()
rng = np.random.default_rng(0)

def make(B, T):
    ids = rng.integers(300, 32000, size=(B, T)).astype(np.int32)
    return LVLMBatch(input_ids=jnp.asarray(ids), attention_mask=jnp.ones((B, T), jnp.int32))

def timeit(f, sync, n=5):
    r = f(); sync(r)
    t0 = time.perf_counter()
    last = None
    for _ in range(n): last = f()
    sync(last)
    return (time.perf_counter() - t0) / n

sync = lambda r: np.asarray(r.tokens[0,0])
for B, T, new in [(16, 512, 10), (16, 512, 20), (16, 128, 10), (1, 512, 10), (48, 512, 10)]:
    b = make(B, T)
    t = timeit(lambda: greedy_generate(params, cfg, b, new, tk.eos_token_id, tk.pad_token_id), sync)
    print(f"B={B} T={T} new={new}: {t*1e3:.1f} ms")
