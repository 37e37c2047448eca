"""Parameter/activation sharding rules for the MMDiT stacks (pjit).

Megatron-style tensor parallelism expressed purely as sharding annotations
(the scaling-book recipe: pick a mesh, annotate, let XLA insert collectives):

- attention q/k/v and FF in-projections: output features sharded over ``tp``
  (heads divide across devices; 24 heads supports tp in {1,2,3,4,6,8,12,24});
- attention out- and FF down-projections: input features sharded over ``tp``
  so each device contributes a partial sum and XLA emits one all-reduce per
  block;
- embedders / AdaLN modulation / norms: replicated (small);
- activations: batch over ``dp``.

Params produced by ``nn.scan`` are stacked with a leading layer axis, which
stays unsharded; rules below address the trailing (in, out) axes.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_kernel(path: str, ndim: int) -> P:
    """PartitionSpec for a param at `path` with `ndim` dims (layer axis first
    for scanned params)."""

    def pad(spec_tail: Tuple) -> P:
        # prepend None for any leading (layer/stack) axes
        return P(*((None,) * (ndim - len(spec_tail)) + spec_tail))

    is_kernel = path.endswith("/kernel")
    if not is_kernel:
        return P()  # biases, norm scales, embeddings: replicated

    # Column-parallel (shard output features)
    if re.search(r"/(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj|proj_mlp)/kernel$", path):
        return pad((None, "tp"))
    if re.search(r"/ff(_context)?/in_proj/kernel$", path):
        return pad((None, "tp"))
    # Row-parallel (shard input features; partial-sum all-reduce after)
    if re.search(r"/(to_out|to_add_out)/kernel$", path):
        return pad(("tp", None))
    if re.search(r"/ff(_context)?/out_proj/kernel$", path):
        return pad(("tp", None))
    if re.search(r"single_blocks/block/proj_out/kernel$", path):
        # single-block joint projection input = [attn | mlp], both tp-sharded
        return pad(("tp", None))
    # Everything else (embedders, AdaLN linears, controlnet proj heads,
    # x_embedder, context_embedder, final proj_out): replicated
    return P()


MMDIT_PARAM_RULES = _spec_for_kernel  # exported hook for customization


def param_shardings(params: Any, mesh: Mesh, rules=MMDIT_PARAM_RULES) -> Any:
    """Map a param pytree -> NamedSharding pytree using path-based rules."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
        return "/".join(parts)

    shardings = {path_str(kp): NamedSharding(mesh, rules("/" + path_str(kp), v.ndim))
                 for kp, v in flat}

    def lookup(kp, v):
        return shardings[path_str(kp)]

    return jax.tree_util.tree_map_with_path(lookup, params)


def shard_params(params: Any, mesh: Mesh, rules=MMDIT_PARAM_RULES) -> Any:
    """Device-put a param pytree with the MMDiT sharding rules applied."""
    shardings = param_shardings(params, mesh, rules)
    return jax.device_put(params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard array leading (batch) axes over dp; replicate rank<2 leaves."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return jax.device_put(
                x, NamedSharding(mesh, P(*(("dp",) + (None,) * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)
