"""Checkpoint / resume via orbax.

The reference only *saves* (best-on-val ``state_dict`` →
``saved_models/<data>.pth``, renamed with a timestamp after the round,
PathNet_run.py:368-374,398-401) and has no resume path.  Here checkpoints
carry everything needed for exact resume: params, round index, best-val
metric state, and the PRNG seed — plus per-round results so an interrupted
multi-round protocol continues from the next round.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

import jax


def save_round(ckpt_dir: str, name: str, round_i: int, result,
               config: Optional[dict] = None) -> str:
    """Persist a round's best params + metrics; returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name, f"round_{round_i:03d}"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    meta = {"round": round_i, "best_val_acc": result.best_val_acc,
            "metrics": result.metrics, "config": config or {}}
    with ocp.StandardCheckpointer() as ckptr:
        payload = {"meta_json": np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8).copy()}
        if result.best_params is not None:
            payload["params"] = result.best_params
        ckptr.save(path, payload, force=True)
    return path


def load_round(ckpt_dir: str, name: str, round_i: int) -> Optional[Dict[str, Any]]:
    """Load a round checkpoint; None if absent."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name, f"round_{round_i:03d}"))
    if not os.path.exists(path):
        return None
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(path)
    meta = json.loads(bytes(np.asarray(payload["meta_json"]).tobytes()).decode())
    return {"meta": meta, "params": payload.get("params")}


def completed_rounds(ckpt_dir: str, name: str) -> int:
    """Number of consecutive completed rounds starting at 0."""
    i = 0
    while os.path.exists(os.path.join(ckpt_dir, name, f"round_{i:03d}")):
        i += 1
    return i
