"""On-hardware smoke: full train → eval → analyze pipeline on one TPU chip.

Uses a ~300M-parameter idefics2-family model with synthetic VQA data (random
weights — exercises every subsystem on the real device: collation, dual-pass
jitted step with the flash kernels, checkpointing, beam-search eval, record
persistence, analysis).  Run: ``python scripts/tpu_smoke.py``.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mimic_tpu.models.config import ModelConfig, PerceiverConfig, TextConfig, VisionConfig
    from mimic_tpu.models.lvlm import init_lvlm_params
    from mimic_tpu.models.runner import LVLMRunner
    from mimic_tpu.models.tokenizer import SimpleTokenizer
    from mimic_tpu.pipeline.runner import PipelineSpec, run_pipeline

    tk = SimpleTokenizer(padding_side="left")
    cfg = ModelConfig(
        name="smoke-300m",
        family="idefics2",
        text=TextConfig(
            vocab_size=1024, hidden_size=1024, num_layers=12, num_heads=8,
            num_kv_heads=4, intermediate_size=2816, head_dim=128,
        ),
        vision=VisionConfig(
            hidden_size=512, num_layers=6, num_heads=8, intermediate_size=1536,
            image_size=224, patch_size=14, use_class_token=False,
        ),
        perceiver=PerceiverConfig(num_latents=32, num_layers=2, num_heads=8),
        image_token_id=tk.image_token_id,
        pad_token_id=tk.pad_token_id,
        bos_token_id=tk.bos_token_id,
        eos_token_id=tk.eos_token_id,
        image_seq_len=32,
    )
    # vocab must cover the byte tokenizer
    cfg = cfg.replace(
        text=cfg.text.__class__(**{**cfg.text.__dict__, "vocab_size": tk.vocab_size})
    )
    params = init_lvlm_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {n/1e6:.0f}M params on {jax.default_backend()}")
    runner = LVLMRunner(cfg, params, tk)

    rng = np.random.default_rng(0)

    def item(i):
        return {
            "question": f"what color is object number {i} in this picture?",
            "question_id": i,
            "question_type": "what color is",
            "answer_type": "other",
            "answers": [{"answer": "red", "answer_confidence": "yes", "answer_id": j} for j in range(10)],
            "answer": "red",
            "image": rng.integers(0, 255, size=(224, 224, 3)).astype(np.uint8),
            "image_id": i,
        }

    splits = {
        "train": [item(i) for i in range(16)],
        "validation": [item(100 + i) for i in range(8)],
    }

    from mimic_tpu.models.config import MODEL_CONFIGS

    MODEL_CONFIGS["smoke-300m"] = lambda: cfg  # runname/model resolution

    spec = PipelineSpec(
        runname="tpusmoke",
        model_name="smoke-300m",
        preset="mimic",
        datasets=["vqav2"],
        num_query_samples=[8],
        num_shots=[2],
        train_overrides={"epochs": 1, "batch_size": 2, "accumulate_grad_batches": 1},
        eval_overrides={"batch_size": 4, "iterations": 1},
    )
    t0 = time.time()
    summary = run_pipeline(spec, result_dir="results_smoke", runner=runner, splits=splits)
    dt = time.time() - t0
    print(f"pipeline completed in {dt:.1f}s")
    print("trained:", summary["trained"])
    print("evaluated:", summary["evaluated"])
    print("analyzed:", summary["analyzed"])
    assert summary["trained"] and summary["evaluated"] and summary["analyzed"]
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
