"""mimic_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of MimIC.

MimIC ("Mimic In-Context Learning for Multimodal Tasks", CVPR 2025) adapts large
vision-language models by training tiny learnable shift modules that approximate the
effect of in-context demonstrations, so a query-only forward pass behaves like a
few-shot prompted one.  This package re-designs the whole reference harness
(models, data, metrics, training, evaluation, orchestration) TPU-first:

- models are pure functions: ``forward(params, batch, shift=..., capture=...)``
  returns logits *and* per-layer hidden states — no forward hooks, no monkey-patching
  (replaces reference ``src/shift_encoder.py:113-140`` record hooks and
  ``testbed/models/model_base.py:649-739`` method replacement).
- the MimIC shift (reference ``src/shift_encoder.py:682-732``) fuses into the
  attention kernel: the log-Z2 term is the flash-attention softmax log-normalizer,
  which the Pallas kernel already carries.
- the dual record/shift training passes compile into one jitted step.
- parallelism is ``jax.sharding`` over a device mesh (ICI/DCN) instead of
  Lightning/DeepSpeed/NCCL.
"""

__version__ = "0.1.0"
