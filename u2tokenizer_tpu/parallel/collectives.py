"""In-program collective utilities.

Counterpart of src/utils/dist_utils.py. The reference hand-rolls NCCL/gloo
collectives: pickled-object all_gather with size padding (dist_utils.py:
150-230), metric reduce_dict (:247-276), and a gradient-preserving feature
gather via torch.distributed.nn (:280-306). Under JAX these are one-liners —
lax collectives are traced, fused, and differentiable — so this module is a
thin, documented veneer used inside ``shard_map``/``pjit`` regions:

  * ``all_gather_features`` — gradient-preserving gather along a mesh axis
    (lax.all_gather has a correct VJP: the backward is a psum_scatter).
  * ``reduce_dict`` — mean- or sum-reduce a metrics dict across an axis.
  * host-side *object* gather lives in eval/green_distributed.py
    (multihost_utils), the one case that genuinely needs host exchange.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def all_gather_features(x: jax.Array, axis_name: str,
                        tiled: bool = True) -> jax.Array:
    """Gather per-device feature shards along ``axis_name`` with gradients
    flowing back to every shard (gather_with_grad parity, dist_utils.py:
    280-306 — torch needs a custom autograd Function; lax.all_gather is
    already differentiable)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=tiled)


def reduce_dict(metrics: Dict[str, jax.Array], axis_name: str,
                average: bool = True) -> Dict[str, jax.Array]:
    """Reduce a dict of scalars/arrays across an axis (dist_utils.py:247-276)."""
    op = jax.lax.pmean if average else jax.lax.psum
    return {k: op(v, axis_name) for k, v in metrics.items()}


def global_batch_mean(x: jax.Array, axis_name: str) -> jax.Array:
    """Mean over the local batch and the device axis."""
    return jax.lax.pmean(jnp.mean(x), axis_name)
