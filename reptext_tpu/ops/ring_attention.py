"""Pallas RDMA ring flash-attention: the fused cross-chip sequence-parallel
attention kernel.

This is the kernel-level half of the sequence-parallel design
(reptext_tpu/parallel/sequence.py gives the collective-level `ppermute` ring;
SURVEY.md §2.3 "ring attention in Pallas for >1k^2 resolutions"). One
`pallas_call` per device, launched under `jax.shard_map` over an ``sp`` mesh
axis:

- each device holds its Q shard and one K/V block in a double-buffered
  communication scratch;
- every ring step STARTS an RDMA of the current K/V block to the right
  neighbor (``pltpu.make_async_remote_copy`` over ICI), computes flash
  statistics (online softmax: running max / denominator / accumulator)
  against the block it holds — overlapping compute with the transfer — and
  then waits on the send/recv semaphore pair, at which point the left
  neighbor's block has landed in the other slot;
- slot reuse is protected by a REGULAR-semaphore capacity handshake: a
  device signals its LEFT neighbor when it has finished computing on a comm
  slot, and waits for the RIGHT neighbor's signal before RDMA-ing into that
  slot — the DMA semaphores alone only order the sender's own transfers,
  not the receiver's consumption, so without the handshake a fast sender
  could overwrite a block the receiver is still reading;
- after ``n`` steps every Q shard has attended to the full sequence and the
  output is normalized once (deferred division, same trick as
  ops/flash_attention.py).

Numerics are validated against single-device softmax attention on a virtual
CPU mesh in interpret mode (tests/mesh_scenarios.py); the compiled Mosaic
path needs real multi-chip ICI, which this build host does not have. At real
scale the per-block compute should additionally tile over Sq x Sk inside the
step (the single-chip kernel in ops/flash_attention.py is that tiling); the
communication structure is unchanged.

The reference has no distributed attention of any kind (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_kernel(
    q_ref,            # [G, Sq, D] local Q shard (G = B*H)
    k_ref,            # [G, Sk, D] local K block
    v_ref,            # [G, Sk, D] local V block
    o_ref,            # [G, Sq, D] output
    comm,             # [2, 2, G, Sk, D] double-buffered K/V communication
    acc,              # [G, Sq, D] fp32 accumulator scratch
    m_scr,            # [G, Sq, 1] running max scratch
    l_scr,            # [G, Sq, 1] running denominator scratch
    send_sem,         # [2] DMA semaphores (per slot)
    recv_sem,         # [2]
    capacity_sem,     # [2] REGULAR semaphores: remote slot-free handshake
    *,
    axis_name: str,
    scale: float,
    handshake: bool,
):
    n = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, n)
    left = jax.lax.rem(my_id + n - 1, n)

    comm[0, 0] = k_ref[:]
    comm[0, 1] = v_ref[:]
    q = q_ref[:].astype(jnp.float32) * scale
    acc[:] = jnp.zeros_like(acc)
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)

    def rdma(slot, nxt):
        return pltpu.make_async_remote_copy(
            src_ref=comm.at[slot],
            dst_ref=comm.at[nxt],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[nxt],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def step(s, _):
        slot = jax.lax.rem(s, 2)
        nxt = jax.lax.rem(s + 1, 2)

        # ship the block we hold to the right neighbor while we compute on it
        @pl.when(s < n - 1)
        def _():
            # Buffer-free handshake: the DMA semaphores only order OUR
            # transfers, not the right neighbor's consumption of its
            # comm[nxt] slot. Before overwriting it, wait for the right
            # neighbor's signal that it finished computing on that slot
            # (its step s-1 compute). At s == 0 both slots are untouched.
            # (Interpret mode serializes devices — no race — and does not
            # implement remote semaphore_signal, so the handshake is
            # compiled-path only.)
            if handshake:
                @pl.when(s > 0)
                def _():
                    pltpu.semaphore_wait(capacity_sem.at[nxt], 1)

            rdma(slot, nxt).start()

        k_blk = comm[slot, 0].astype(jnp.float32)
        v_blk = comm[slot, 1].astype(jnp.float32)
        # [G, Sq, Sk] batched over G
        logits = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_prev, l_prev = m_scr[:], l_scr[:]
        m_new = jnp.maximum(m_prev, logits.max(axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_scr[:] = l_prev * corr + p.sum(axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v_blk,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc[:] = acc[:] * corr + pv
        m_scr[:] = m_new

        # compute on comm[slot] is done -> tell the LEFT neighbor it may
        # start its next RDMA into our comm[slot] (its step s+1 writes land
        # there). Only signal when such a write is still coming (s < n-2),
        # so every semaphore drains to zero by kernel end.
        if handshake:
            @pl.when(s < n - 2)
            def _():
                pltpu.semaphore_signal(
                    capacity_sem.at[slot],
                    device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

        # send done + left neighbor's block landed in the other slot
        @pl.when(s < n - 1)
        def _():
            rdma(slot, nxt).wait()

        return 0

    jax.lax.fori_loop(0, n, step, 0)
    o_ref[:] = (acc[:] / l_scr[:]).astype(o_ref.dtype)


def _local_ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    axis_name: str, interpret: bool,
) -> jax.Array:
    """Per-device body under shard_map: q/k/v are [B, H, S/n, D] shards."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    g = b * h
    q3 = q.reshape(g, sq, d)
    k3 = k.reshape(g, sk, d)
    v3 = v.reshape(g, sk, d)
    scale = 1.0 / (d ** 0.5)

    out = pl.pallas_call(
        functools.partial(_ring_kernel, axis_name=axis_name, scale=scale,
                          handshake=not interpret),
        out_shape=jax.ShapeDtypeStruct((g, sq, d), q.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, g, sk, d), q.dtype),       # comm (double-buffered K/V)
            pltpu.VMEM((g, sq, d), jnp.float32),          # acc
            pltpu.VMEM((g, sq, 1), jnp.float32),          # m
            pltpu.VMEM((g, sq, 1), jnp.float32),          # l
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),            # capacity handshake
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0,
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, sq, d)


def ring_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused RDMA ring attention over a sequence-sharded mesh axis.

    q/k/v: [B, H, S, D] global; S divisible by ``mesh.shape[axis_name]``.
    Semantics identical to ``parallel.sequence.ring_attention`` (full
    non-causal attention — MMDiT attention is non-causal); the K/V rotation
    here is kernel-level RDMA instead of an XLA ``ppermute``, so the transfer
    overlaps the flash-statistics compute inside one Pallas program.

    ``interpret`` defaults to True off-TPU (CPU-mesh validation) and False on
    TPU backends (compiled Mosaic + ICI RDMA).

    The compiled multi-chip path has never run on real ICI (this build host
    has one chip); until it is validated on hardware it is gated behind
    ``REPTEXT_EXPERIMENTAL_RING=1``. Interpret mode (the CPU-mesh validation
    path) is always available.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and os.environ.get("REPTEXT_EXPERIMENTAL_RING") != "1":
        raise RuntimeError(
            "ring_flash_attention's compiled Mosaic+ICI path is experimental "
            "(unvalidated on real multi-chip hardware). Set "
            "REPTEXT_EXPERIMENTAL_RING=1 to enable it, or use "
            "parallel.sequence.ring_attention (the shard_map ppermute ring) "
            "which is the production sequence-parallel path."
        )
    spec = P(None, None, axis_name, None)
    fn = functools.partial(
        _local_ring_attention, axis_name=axis_name, interpret=interpret
    )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
