"""Tensor (channel) parallelism: shard wide layer weights over a "model" axis.

The reference has no TP (SURVEY §2.2 — `nn.DataParallel` is its only
parallelism); this is the optional TPU-native extension the survey sketches
("shard conv channels over a model axis for 128^3 BigGAN if it outgrows
HBM"). The design leans entirely on GSPMD: we annotate the OUTPUT-channel
dim of eligible kernels (conv [k,k,k,I,O] and dense [I,O]) with the
"model" mesh axis, replicate everything else, and let XLA's SPMD
partitioner propagate shardings through the step and insert the
collectives. Activations downstream of a sharded conv become C-sharded, so
peak activation memory divides by the model-axis size — the complementary
knob to spatial parallelism (`spatial_devices`, which divides by volume
instead of channels) and to rematerialization (which recomputes instead).

Sharding rule (tp_shardings): a leaf is sharded iff
- its path does NOT belong to a self-attention block (those feed the Pallas
  attention kernel, a custom call XLA cannot partition channel-wise — their
  params stay replicated so GSPMD gathers channels before attention), and
- ndim >= 2 and the last (output-channel) dim splits into shards of >= 8.

The rule is applied with tree_map_with_path over the ENTIRE TrainState, so
optimizer moments, EMA params, and spectral-norm state follow their
parameters automatically (adam mu/nu mirror the param tree; 1-D leaves like
biases, BN stats, and SN u/v vectors replicate — GSPMD reshards the few KiB
where needed).

Validated for numerical parity vs data-parallel-only on the virtual CPU
mesh (tests/test_tp.py) and exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan3d_tpu.parallel.mesh import MODEL_AXIS

# path fragments whose params must stay replicated (lower-cased match)
_REPLICATED_PATHS = ("attn",)


def _eligible(path_str: str, leaf: Any, n_shards: int, min_shard: int) -> bool:
    if any(frag in path_str.lower() for frag in _REPLICATED_PATHS):
        return False
    shape = getattr(leaf, "shape", None)
    if shape is None or len(shape) < 2:
        return False
    out = shape[-1]
    return out % n_shards == 0 and out // n_shards >= min_shard


def tp_shardings(tree: Any, mesh: Mesh, min_shard: int = 8) -> Any:
    """Pytree of NamedSharding mirroring `tree`: wide kernels shard their
    last dim over MODEL_AXIS, everything else replicates."""
    n_shards = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    def assign(path, leaf):
        if leaf is None:
            return rep
        path_str = jax.tree_util.keystr(path)
        if _eligible(path_str, leaf, n_shards, min_shard):
            ndim = len(leaf.shape)
            return NamedSharding(mesh, P(*([None] * (ndim - 1)), MODEL_AXIS))
        return rep

    return jax.tree_util.tree_map_with_path(assign, tree)


def count_sharded(shardings: Any) -> int:
    """Number of leaves actually sharded over MODEL_AXIS (for tests/logs)."""
    return sum(
        1 for s in jax.tree_util.tree_leaves(shardings)
        if isinstance(s, NamedSharding) and MODEL_AXIS in
        [ax for axes in s.spec if axes for ax in
         (axes if isinstance(axes, tuple) else (axes,))]
    )
