"""Checkpoint / resume for long solves.

The reference has NO checkpointing (SURVEY.md section 5: the only
persisted state is the final solution) — this is a framework extension:
production-scale runs (BASELINE.md config 5) should survive preemption.

State saved: the level-0 iterate, residual history so far, iteration
count, and the config fingerprint (mismatched configs refuse to resume).
Plain .npz — the state is a handful of dense arrays, orbax would be
overkill.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path

import numpy as np


def _fingerprint(cfg) -> str:
    d = dataclasses.asdict(cfg)
    d["cycle"] = cfg.cycle.name
    d["smoother"] = cfg.smoother.value
    blob = json.dumps(d, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _to_host(x) -> np.ndarray:
    """Sharding-aware host materialization: multi-host sharded arrays are
    gathered over DCN with process_allgather (np.asarray on a
    non-fully-addressable array would fail); everything else is a plain
    copy (reference GetSol analogue: src/solver.c:1239-1315)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def save(path: str | Path, cfg, u, rnorm, iters: int) -> None:
    """Write the checkpoint (every process computes the gathered state;
    only process 0 writes in a multi-host run)."""
    import jax

    path = Path(path)
    arrays = {f"u{i}": _to_host(x) for i, x in enumerate(u)}
    if jax.process_index() != 0:  # pragma: no cover (needs multi-host)
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        fingerprint=np.bytes_(_fingerprint(cfg)),
        iters=np.int64(iters),
        rnorm=np.asarray(rnorm),
        n_grids=np.int64(len(u)),
        **arrays,
    )


def load(path: str | Path, cfg):
    """-> (u tuple, rnorm, iters); raises on config mismatch."""
    with np.load(Path(path)) as z:
        fp = z["fingerprint"].item()
        fp = fp.decode() if isinstance(fp, bytes) else str(fp)
        if fp != _fingerprint(cfg):
            raise ValueError(
                "checkpoint config fingerprint mismatch: refusing to resume"
            )
        n = int(z["n_grids"])
        u = tuple(z[f"u{i}"] for i in range(n))
        return u, z["rnorm"], int(z["iters"])
