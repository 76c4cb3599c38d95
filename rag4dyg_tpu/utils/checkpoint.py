"""Checkpointing: params + optimizer state + config as msgpack files.

Replaces the reference's HF-directory checkpoints
(pytorch_model.bin/config.json/optimizer.pt — reference:
utils/model.py:56-69) with flax msgpack serialization. Layout:

    <dir>/checkpoint-<tag>/
        params.msgpack
        opt_state.msgpack     (optional)
        config.json           (ModelConfig)
        meta.json             (epoch/step/best-score bookkeeping)

Cross-stage transfer (retriever/generator loading backbone weights) goes
through ``load_params`` + key-wise merge, mirroring the reference's
``model.transformer.from_pretrained`` (reference: main_retriever.py:117).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from rag4dyg_tpu.config import ModelConfig


def save_checkpoint(directory: str, params, *, config: Optional[ModelConfig]
                    = None, opt_state: Any = None,
                    meta: Optional[Dict] = None) -> str:
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(lambda x: jax.device_get(x), params)))
    if opt_state is not None:
        with open(os.path.join(directory, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(
                serialization.to_state_dict(jax.device_get(opt_state))))
    if config is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            f.write(config.to_json())
    if meta is not None:
        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    return directory


def load_params(directory: str):
    with open(os.path.join(directory, "params.msgpack"), "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_config(directory: str) -> ModelConfig:
    with open(os.path.join(directory, "config.json")) as f:
        return ModelConfig.from_json(f.read())


def load_opt_state(directory: str, target):
    path = os.path.join(directory, "opt_state.msgpack")
    with open(path, "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(target, state_dict)


def load_meta(directory: str) -> Dict:
    path = os.path.join(directory, "meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def sorted_checkpoints(parent_dir: str, prefix: str = "checkpoint-step"):
    """Step-numbered checkpoint dirs, oldest first
    (reference: utils/model.py:23-38)."""
    import re

    out = []
    if not os.path.isdir(parent_dir):
        return out
    for name in os.listdir(parent_dir):
        m = re.fullmatch(rf"{re.escape(prefix)}(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(parent_dir, name)))
    return [p for _, p in sorted(out)]


def rotate_checkpoints(parent_dir: str, limit: Optional[int],
                       prefix: str = "checkpoint-step") -> None:
    """Delete oldest step checkpoints beyond ``limit``
    (reference: utils/model.py:41-53, --save_total_limit)."""
    import shutil

    if not limit or limit <= 0:
        return
    ckpts = sorted_checkpoints(parent_dir, prefix)
    for path in ckpts[: max(0, len(ckpts) - limit)]:
        shutil.rmtree(path, ignore_errors=True)


def latest_checkpoint(parent_dir: str, prefix: str = "checkpoint-step"
                      ) -> Optional[str]:
    """Most recent step checkpoint for --should_continue-style resume
    (reference: main_SimpleDyG.py:382-387)."""
    ckpts = sorted_checkpoints(parent_dir, prefix)
    return ckpts[-1] if ckpts else None


def rng_state_meta(rng, np_rng: "np.random.RandomState") -> Dict:
    """JSON-able snapshot of a jax PRNG key + numpy RandomState.

    The retriever/generator trainers advance one sequential key chain and
    one global RandomState across epochs (unlike the backbone's per-epoch
    derived streams), so bit-exact mid-run resume must restore the raw
    state rather than re-derive it from the epoch index.
    """
    kind, keys, pos, has_gauss, cached = np_rng.get_state()
    return {"jax_rng": [int(x) for x in
                        np.asarray(jax.device_get(rng)).ravel()],
            "np_rng": [kind, [int(x) for x in keys], int(pos),
                       int(has_gauss), float(cached)]}


def restore_rng_state(meta: Dict):
    """Inverse of :func:`rng_state_meta`."""
    import jax.numpy as jnp

    rng = jnp.asarray(np.asarray(meta["jax_rng"], np.uint32))
    kind, keys, pos, has_gauss, cached = meta["np_rng"]
    np_rng = np.random.RandomState()
    np_rng.set_state((kind, np.asarray(keys, np.uint32), int(pos),
                      int(has_gauss), float(cached)))
    return rng, np_rng


def transfer_backbone(target_params, backbone_params,
                      num_copy_rows: Optional[int] = None):
    """Copy backbone weights into a (possibly differently-shaped) model's
    params. When embedding tables differ in row count (retriever adds
    [MASK]), the overlapping prefix rows are copied and the extra rows keep
    their fresh init (reference resize_token_embeddings semantics)."""
    import numpy as np

    def merge(dst, src):
        if isinstance(dst, dict):
            return {k: merge(dst[k], src[k]) if k in src else dst[k]
                    for k in dst}
        dst_a, src_a = np.asarray(dst), np.asarray(src)
        if dst_a.shape == src_a.shape:
            return src
        n = min(dst_a.shape[0], src_a.shape[0])
        out = np.array(dst_a)
        out[:n] = src_a[:n]
        return out

    return merge(target_params, backbone_params)
