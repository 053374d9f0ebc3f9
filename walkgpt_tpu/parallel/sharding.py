"""Mesh construction and SPMD sharding rules.

The TPU-native replacement for the reference's distributed runtime
(DeepSpeed ZeRO-2 + NCCL, SURVEY §2.6): we lay out a 2-D
(data, model) mesh, annotate parameter shardings, and let XLA insert the
collectives over ICI. No process groups, no explicit all-reduces.

  * "dp" — batch (conversation rows / images) is sharded on its leading axis;
    gradients are combined by XLA (psum on ICI) because params are replicated
    across dp.
  * "tp" — megatron-style tensor parallelism inside the big matmuls:
    LLM attention q/k/v and MLP up/gate are column-sharded (output dim on tp),
    o/down row-sharded (input dim on tp); the SAM ViT qkv/mlp likewise; the
    vocab embedding and lm_head are vocab-sharded.
  * ZeRO-1-style optimizer sharding: optimizer-state leaves additionally
    shard their largest replicated axis over "dp" when divisible
    (`zero_spec`), mirroring DeepSpeed's partitioned optimizer states.

Small modules (MSQP, CTP, SAM prompt/mask decoder, norms) stay replicated —
they are noise next to the towers.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int, tp: int, *, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, f"need {dp * tp} devices, have {len(devices)}"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _llm_rule(path: str, ndim: int) -> P:
    # int8-quantized projections ({"w_q", "w_scale"}, ops/quant.py) shard
    # like their dense "w": w_q carries the same [in, out] layout; the
    # per-out-channel w_scale follows the OUTPUT axis (sharded only for
    # column-parallel projections). Packed/fused single-launch formats
    # (qkv8, qkv4, w_p4, w_p4t) stay replicated — they exist for the
    # single-chip Pallas decode kernels, whose concatenated/nibble layouts
    # do not split along tp (mesh inference uses the per-projection paths).
    if "/qkv8/" in path or "/qkv4/" in path or path.endswith(
            ("/w_p4", "/w_p4t")):
        return P()
    if "embed_tokens" in path or "lm_head" in path:
        if path.endswith(("/w", "/w_q")):
            return P("tp", None) if ndim == 2 else P()
        return P()                         # w_scale etc. replicated
    if "lora_a" in path or "lora_b" in path:
        return P()                         # rank-r factors are tiny
    if "/attn/" in path:
        if path.endswith(("/o/w", "/down/w", "/o/w_q", "/down/w_q")):
            return P("tp", None)
        if path.endswith(("/w", "/w_q")):
            return P(None, "tp")           # q, k, v column-parallel
        if path.endswith("/w_scale"):
            return P() if "/o/" in path else P("tp")
        if path.endswith("/b"):
            return P("tp") if not (path.endswith("/o/b")) else P()
    if "/mlp/" in path:
        if path.endswith(("/down/w", "/fc2/w", "/down/w_q", "/fc2/w_q")):
            return P("tp", None)
        if path.endswith(("/w", "/w_q")):
            return P(None, "tp")           # gate/up/fc1 column-parallel
        if path.endswith("/w_scale"):
            return P() if ("/down/" in path or "/fc2/" in path) else P("tp")
        if path.endswith("/b") and not (path.endswith("down/b") or path.endswith("fc2/b")):
            return P("tp")
    return P()


def _sam_rule(path: str, ndim: int) -> P:
    if "image_encoder" in path:
        if path.endswith(("/qkv/w", "fc1/w", "/qkv/w_q", "fc1/w_q")):
            return P(None, "tp")
        if path.endswith(("/qkv/b", "fc1/b")):
            return P("tp")
        if path.endswith(("/qkv/w_scale", "fc1/w_scale")):
            return P("tp")
        if path.endswith(("/proj/w", "fc2/w", "/proj/w_q", "fc2/w_q")):
            return P("tp", None)
    return P()


def _clip_rule(path: str, ndim: int) -> P:
    if path.endswith(("/q/w", "/k/w", "/v/w", "fc1/w")):
        return P(None, "tp")
    if path.endswith(("/q/b", "/k/b", "/v/b", "fc1/b")):
        return P("tp")
    if path.endswith(("/out/w", "fc2/w")):
        return P("tp", None)
    return P()


def _spec_for(path: str, shape: Tuple[int, ...], tp: int) -> P:
    ndim = len(shape)
    if path.startswith("llm/"):
        spec = _llm_rule(path, ndim)
    elif path.startswith("sam/"):
        spec = _sam_rule(path, ndim)
    elif path.startswith("clip/"):
        spec = _clip_rule(path, ndim)
    else:
        spec = P()
    # drop tp-sharding when the axis is not divisible (tiny test configs)
    for axis, name in enumerate(spec):
        if name == "tp" and (axis >= ndim or shape[axis] % tp != 0):
            return P()
    return spec


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_pspecs(params: Any, *, tp: int) -> Any:
    """PartitionSpec pytree mirroring the parameter tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), getattr(leaf, "shape", ()), tp),
        params)


def zero_spec(spec: P, shape: Tuple[int, ...], dp: int) -> P:
    """ZeRO-1 style: shard the largest replicated axis of an optimizer-state
    leaf over dp when divisible."""
    names = list(spec) + [None] * (len(shape) - len(spec))
    best_axis, best_dim = -1, 0
    for i, (n, d) in enumerate(zip(names, shape)):
        if n is None and d % dp == 0 and d > best_dim:
            best_axis, best_dim = i, d
    if best_axis >= 0 and dp > 1 and best_dim >= dp:
        names[best_axis] = "dp"
    return P(*names)


def opt_state_pspecs(opt_state: Any, params_spec: Any, params: Any, *,
                     dp: int) -> Any:
    """Spec tree for an optax state: leaves shaped like a param get that
    param's spec (+ ZeRO dp sharding); scalars/counters are replicated."""
    flat_params = {id(p): (s, p.shape) for s, p in
                   zip(jax.tree_util.tree_leaves(params_spec),
                       jax.tree_util.tree_leaves(params))}
    shapes = {shape: spec for spec, shape in flat_params.values()}

    def leaf_spec(leaf):
        shp = getattr(leaf, "shape", ())
        if shp in shapes:
            return zero_spec(shapes[shp], shp, dp)
        return P()
    return jax.tree_util.tree_map(leaf_spec, opt_state)


def shard_tree(tree: Any, mesh: Mesh, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def kv_cache_pspecs(cache, *, tp: int, dp: int) -> Any:
    """PartitionSpecs for a decode KV cache dict (models/llm.init_kv_cache).

    Heads layout k/v [layers, B, n_kv, T, D] -> (-, dp, tp, -, -): the batch
    splits over dp and the kv heads over tp — each device's attention reads
    only its own head/batch shard, so decode cache traffic scales 1/(dp*tp).
    Flat layout k/v [layers, B, T, n_kv*D] -> (-, dp, -, tp) (the contiguous
    head-major lane axis splits over tp). Scales [layers, B, n_kv, T] ->
    (-, dp, tp, -) in both layouts. Axes that do not divide stay unsharded.
    """
    def spec(name: str, leaf) -> P:
        shape = getattr(leaf, "shape", ())
        if len(shape) == 5:                       # heads-layout k/v
            names = [None, "dp", "tp", None, None]
        elif name.endswith("_scale"):             # [layers, B, n_kv, T]
            names = [None, "dp", "tp", None]
        elif len(shape) == 4:                     # flat [layers, B, T, n_kv*D]
            names = [None, "dp", None, "tp"]
        else:
            names = [None] * len(shape)
        for ax, n in enumerate(names):
            if n == "tp" and shape[ax] % max(tp, 1):
                names[ax] = None
            if n == "dp" and shape[ax] % max(dp, 1):
                names[ax] = None
        return P(*names)
    return {k: spec(k, v) for k, v in cache.items()}


def cache_constrainer(mesh: Mesh, *, tp: Optional[int] = None,
                      dp: Optional[int] = None):
    """fn(cache) -> cache applying kv_cache_pspecs sharding constraints —
    passed to runtime/generate.greedy_generate(cache_constrain=...) so the
    decode cache's mesh layout is pinned rather than left to GSPMD
    propagation (the scan carry inherits it for every step)."""
    tp = tp or mesh.shape.get("tp", 1)
    dp = dp or mesh.shape.get("dp", 1)

    def constrain(cache):
        specs = kv_cache_pspecs(cache, tp=tp, dp=dp)
        return {k: jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, specs[k])) for k, v in cache.items()}
    return constrain


def seq_constrainer(mesh: Mesh, *, batch_axis: str = "dp",
                    seq_axis: str = "tp"):
    """Sequence-parallel activation constraint (Megatron SP, the scaling-book
    recipe): [B, T, H] residual streams are sharded (dp, tp, -) so the
    token axis splits over the SAME devices that hold the tp-sharded
    weights. XLA then materializes the attention/MLP boundary collectives
    as reduce-scatter + all-gather over ICI instead of all-reduce, and the
    per-device activation footprint of the saved residuals scales 1/tp.

    Returns fn(x) -> x for llm.forward(seq_constrain=...). Identity on
    arrays whose rank is not 3 so it composes with scalar/2-D aux values.
    """
    spec = NamedSharding(mesh, P(batch_axis, seq_axis, None))

    def constrain(x):
        if getattr(x, "ndim", 0) != 3:
            return x
        return jax.lax.with_sharding_constraint(x, spec)
    return constrain
