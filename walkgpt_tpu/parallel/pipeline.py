"""Pipeline parallelism for the LLM decoder: GPipe schedule over a "pp" mesh
axis, expressed as shard_map + lax.ppermute (XLA collective-permute rides
ICI between neighbouring chips).

The reference scales by nothing but data parallelism (SURVEY §2.6 checklist:
TP/PP/SP all absent); this module is framework capability beyond parity, for
scales where even tp-sharded layer weights do not fit a slice. Design follows
the standard JAX pipelining recipe (scaling-book / praxis
LayerwiseShardablePipelined):

  * layer params are STACKED on a leading [n_layers] axis and sharded
    P("pp") — each stage device holds n_layers/pp contiguous layers;
  * activations move stage-to-stage with `lax.ppermute` inside a
    `lax.scan` over n_micro + pp - 1 ticks (the pipeline bubble is the
    usual (pp-1)/(n_micro+pp-1) fraction);
  * microbatches shard their batch dim over "dp" as usual — the schedule
    is per-dp-group, so dp x pp composes freely;
  * everything is static-shape and fully differentiable (ppermute
    transposes to the reverse permutation), so the same executor serves
    training.

Scope: the pipelined segment is the decoder block stack — embeddings,
final norm and lm_head stay outside under plain GSPMD (they are the same
ops at every scale and tp-shardable there). tp inside the pipelined
segment is not composed here (shard_map bodies are per-device programs;
composing tp would mean hand-written psums — the dp x pp x tp product this
covers is already beyond every configuration the reference can run).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                      # jax>=0.8 top-level API
    from jax import shard_map
except ImportError:                       # pragma: no cover
    from jax.experimental.shard_map import shard_map


# ---------------------------------------------------------------------------
# param layout
# ---------------------------------------------------------------------------

def stack_layers(layers: list) -> Any:
    """List of per-layer param trees (identical structure) -> one tree whose
    leaves carry a leading [n_layers] axis. The inverse of unstack_layers."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layers(stacked: Any) -> list:
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)]


def stacked_pspecs(stacked: Any, *, axis: str = "pp") -> Any:
    """P(axis) on the stacked leading dim, replicated elsewhere."""
    return jax.tree_util.tree_map(
        lambda x: P(axis, *([None] * (x.ndim - 1))), stacked)


# ---------------------------------------------------------------------------
# the schedule
# ---------------------------------------------------------------------------

def pipeline_blocks(stacked: Any, x: jnp.ndarray, aux: Any, block_fn: Callable,
                    *, mesh: Mesh, n_micro: int, axis: str = "pp",
                    batch_axis: str = "dp", remat: bool = False
                    ) -> jnp.ndarray:
    """Run x through ALL stacked layers with a GPipe schedule over `axis`.

    stacked:  layer params with leading [n_layers] axis, n_layers % pp == 0.
              (Shard P(axis) outside for real memory scaling; the shard_map
              in_spec slices it either way.)
    x:        [B, T, H] activations; B % (n_micro * dp) == 0.
    aux:      pytree of [B, ...] per-row side inputs consumed by every layer
              (attention masks, positions). Microbatched alongside x.
    block_fn: fn(layer_params, x_micro, aux_micro) -> x_micro — ONE layer.
    remat:    rematerialize each layer on the backward pass (gradient
              checkpointing inside the pipeline: per-microbatch residency
              drops to one activation per stage boundary).

    Returns [B, T, H] after the full stack, batch-sharded over `batch_axis`
    and replicated over `axis`.
    """
    pp = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    assert n_layers % pp == 0, (n_layers, pp)
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    bm = b // n_micro
    dp = mesh.shape.get(batch_axis, 1)
    assert bm % dp == 0, (
        f"microbatch rows ({b}/{n_micro}={bm}) must divide over the "
        f"'{batch_axis}' axis ({dp}) — lower n_micro or raise the batch")

    def micro(z):                        # [B, ...] -> [n_micro, Bm, ...]
        return z.reshape((n_micro, bm) + z.shape[1:])

    xm = micro(x)
    aux_m = jax.tree_util.tree_map(micro, aux)

    def per_device(layers_local, xm_loc, aux_loc):
        stage = jax.lax.axis_index(axis)
        one_layer = block_fn
        if remat:
            one_layer = jax.checkpoint(
                block_fn, policy=jax.checkpoint_policies.nothing_saveable)

        def stage_apply(x_, aux_):
            def body(carry, layer):
                return one_layer(layer, carry, aux_), None
            y, _ = jax.lax.scan(body, x_, layers_local)
            return y

        def tick(carry, tt):
            state, outputs = carry
            # at tick t, stage s processes microbatch t - s (GPipe diagonal):
            # per-microbatch aux (masks, positions) must follow that index,
            # while stage 0's fresh input is microbatch t itself.
            midx = jnp.clip(tt - stage, 0, n_micro - 1)
            inp_s = jax.lax.dynamic_index_in_dim(
                xm_loc, jnp.minimum(tt, n_micro - 1), 0, keepdims=False)
            aux_s = jax.tree_util.tree_map(
                lambda z: jax.lax.dynamic_index_in_dim(z, midx, 0,
                                                       keepdims=False),
                aux_loc)
            x_in = jnp.where(stage == 0, inp_s, state)
            y = stage_apply(x_in, aux_s)
            out_idx = jnp.clip(tt - (pp - 1), 0, n_micro - 1)
            is_out = (stage == pp - 1) & (tt >= pp - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, out_idx, 0,
                                               keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(is_out, y, cur), out_idx, 0)
            nxt = jax.lax.ppermute(y, axis,
                                   [(i, i + 1) for i in range(pp - 1)])
            return (nxt, outputs), None

        init = (jnp.zeros_like(xm_loc[0]), jnp.zeros_like(xm_loc))
        (_, outputs), _ = jax.lax.scan(tick, init,
                                       jnp.arange(n_micro + pp - 1))
        # outputs are only written on the last stage — broadcast over pp
        outputs = jax.lax.psum(
            jnp.where(stage == pp - 1, outputs, jnp.zeros_like(outputs)),
            axis)
        return outputs

    aux_specs = jax.tree_util.tree_map(
        lambda z: P(None, batch_axis, *([None] * (z.ndim - 2))), aux_m)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(stacked_pspecs(stacked, axis=axis),
                  P(None, batch_axis, None, None), aux_specs),
        out_specs=P(None, batch_axis, None, None),
        check_vma=False,
    )(stacked, xm, aux_m)
    return out.reshape(x.shape)
