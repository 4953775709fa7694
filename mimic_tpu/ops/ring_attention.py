"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference has no long-context strategy at all (SURVEY §5 — it *manages
down* 32-shot contexts with batch 2 + ZeRO offload); this goes beyond parity:
shard the sequence over a mesh axis, keep Q local, and rotate K/V blocks around
the ring with ``jax.lax.ppermute`` (XLA ICI collectives), combining partial
attention with flash-style running (max, denominator, accumulator) statistics.

Causal masking works on global positions: each device owns a contiguous Q chunk
``[rank·C, (rank+1)·C)`` and at ring step ``t`` sees the K/V chunk of device
``(rank − t) mod n`` — block-level skips apply when the whole K chunk is in the
future.  The unmasked log-normalizer (MimIC's log Z₂) is accumulated alongside,
so the shift works under sequence parallelism too.

Use via ``shard_map``::

    attn = shard_map(
        partial(ring_attention, axis_name="sp", causal=True),
        mesh, in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
    )
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1.0e30


def ring_attention(
    q: jnp.ndarray,         # [B, C, H, D] local query chunk
    k: jnp.ndarray,         # [B, C, Hkv, D] local key chunk
    v: jnp.ndarray,         # [B, C, Hkv, D]
    key_mask: jnp.ndarray,  # [B, C] local slot validity
    axis_name: str = "sp",
    causal: bool = True,
    scale: Optional[float] = None,
    need_unmasked: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-shard body (run under shard_map).  Returns (out, lse, lse_unmasked)
    for the local Q chunk; semantics match ``flash_attention`` on the gathered
    sequence."""
    B, C, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    n = jax.lax.psum(1, axis_name)
    rank = jax.lax.axis_index(axis_name)
    scale = scale if scale is not None else 1.0 / (D**0.5)

    qg = (q.astype(jnp.float32) * scale).reshape(B, C, Hkv, G, D)
    q_pos = rank * C + jnp.arange(C)  # global positions of local queries

    def partial_attention(carry, kv_rank, k_blk, v_blk, mask_blk):
        m, l, acc, m_u, l_u = carry
        s = jnp.einsum(
            "bckgd,bskd->bkgcs", qg, k_blk, preferred_element_type=jnp.float32
        )  # [B,Hkv,G,C,C]
        k_pos = kv_rank * C + jnp.arange(C)

        if need_unmasked:
            # fully unmasked (no causal, no padding) — bit-matches the flash
            # kernel's lse_u and the XLA ``unmasked_lse`` (reference do_shift
            # applies no mask at all, src/shift_encoder.py:697-703)
            m_u_new = jnp.maximum(m_u, jnp.max(s, axis=-1))
            l_u = l_u * jnp.exp(m_u - m_u_new) + jnp.sum(
                jnp.exp(s - m_u_new[..., None]), axis=-1
            )
            m_u = m_u_new

        allowed = mask_blk[:, None, None, None, :].astype(bool)
        if causal:
            allowed = allowed & (
                q_pos[None, None, None, :, None] >= k_pos[None, None, None, None, :]
            )
        s_m = jnp.where(allowed, s, NEG)
        m_new = jnp.maximum(m, jnp.max(s_m, axis=-1))
        p = jnp.exp(s_m - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bkgcs,bskd->bkgcd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l, acc, m_u, l_u)

    init = (
        jnp.full((B, Hkv, G, C), NEG, jnp.float32),
        jnp.zeros((B, Hkv, G, C), jnp.float32),
        jnp.zeros((B, Hkv, G, C, D), jnp.float32),
        jnp.full((B, Hkv, G, C), NEG, jnp.float32),
        jnp.zeros((B, Hkv, G, C), jnp.float32),
    )

    perm = [(i, (i + 1) % n) for i in range(n)]

    def ring_step(t, state):
        carry, k_blk, v_blk, mask_blk = state
        kv_rank = (rank - t) % n
        carry = partial_attention(carry, kv_rank, k_blk, v_blk, mask_blk)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return carry, k_blk, v_blk, mask_blk

    state = (init, k, v, key_mask)
    state = jax.lax.fori_loop(0, n, ring_step, state)
    (m, l, acc, m_u, l_u) = state[0]

    l_safe = jnp.maximum(l, 1e-30)
    out = (acc / l_safe[..., None]).reshape(B, H, C, D).transpose(0, 2, 1, 3)
    lse = (m + jnp.log(l_safe)).reshape(B, H, C).transpose(0, 2, 1)
    lse_u = (m_u + jnp.log(jnp.maximum(l_u, 1e-30))).reshape(B, H, C).transpose(0, 2, 1)
    return out.astype(q.dtype), lse, lse_u


def ring_attention_sharded(
    mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    axis_name: str = "sp",
    causal: bool = True,
    need_unmasked: bool = True,
    batch_axis: Optional[str] = None,
):
    """Convenience wrapper: shard q/k/v/key_mask over ``axis_name`` on the sequence
    dimension (and optionally the batch dimension over ``batch_axis``) and run
    the ring.  Usable inside jit — the mesh is closed over at trace time."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(batch_axis, axis_name)
    fn = shard_map(
        partial(
            ring_attention, axis_name=axis_name, causal=causal,
            need_unmasked=need_unmasked,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return fn(q, k, v, key_mask)
