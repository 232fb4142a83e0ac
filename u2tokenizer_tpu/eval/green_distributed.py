"""Multi-host GREEN scoring.

Counterpart of the reference's green_score_accelerate package
(green_score_accelerate/green.py:29-425: dist.init_process_group("nccl"),
split_dataset_by_node, gather_object to rank 0). TPU-native: each JAX
process scores a strided shard of the (reference, prediction) pairs on its
local chips; results are exchanged with a host-side all-gather
(jax.experimental.multihost_utils), so every process — and in particular
process 0 — ends with the full score list. No pickle-over-NCCL.
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

import numpy as np

from .green import GreenResult, GreenScorer


def _process_info():
    import jax

    return jax.process_index(), jax.process_count()


def _allgather_objects(local: list) -> List[list]:
    """Gather a list of JSON-serializable objects from every process."""
    import jax

    if jax.process_count() == 1:
        return [local]
    from jax.experimental import multihost_utils

    # serialize to fixed-size uint8 buffers (object gather via bytes)
    payload = json.dumps(local).encode()
    n = np.array([len(payload)], np.int32)
    max_n = int(multihost_utils.process_allgather(n).max())
    buf = np.zeros(max_n, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # (P, max_n)
    lens = multihost_utils.process_allgather(n)[:, 0]
    out = []
    for row, ln in zip(np.asarray(gathered), np.asarray(lens)):
        out.append(json.loads(bytes(row[:ln]).decode()))
    return out


def distributed_green(
    scorer: GreenScorer,
    refs: Sequence[str],
    hyps: Sequence[str],
) -> Optional[GreenResult]:
    """Score pairs sharded across processes; all processes return the merged
    result (rank-0-only consumers can just use process_index()==0)."""
    rank, world = _process_info()
    local_idx = list(range(rank, len(refs), world))
    local_refs = [refs[i] for i in local_idx]
    local_hyps = [hyps[i] for i in local_idx]

    local = scorer(local_refs, local_hyps) if local_refs else GreenResult(
        0.0, 0.0, [], "", [])
    local_rows = [{"index": i, "green": s, "row": r}
                  for i, s, r in zip(local_idx, local.scores, local.rows)]

    all_rows = [row for shard in _allgather_objects(local_rows)
                for row in shard]
    all_rows.sort(key=lambda r: r["index"])
    scores = [r["green"] for r in all_rows]
    valid = [s for s in scores if s is not None]
    mean = float(np.mean(valid)) if valid else 0.0
    std = float(np.std(valid)) if valid else 0.0
    return GreenResult(mean, std, scores, local.summary,
                       [r["row"] for r in all_rows])
