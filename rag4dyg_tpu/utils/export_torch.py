"""Checkpoint interop with the reference's HF-2.5.1 torch format.

The reference persists models as ``pytorch_model.bin`` + ``config.json``
via save_pretrained (reference: models/modeling_utils.py:277-298) and
reloads them with ``GPT2Model.from_pretrained`` when transferring the
frozen backbone into the retriever/generator
(reference: utils/model.py:71-78, main_retriever.py:101-118).

This module converts between that format and this framework's msgpack
checkpoints (utils/checkpoint.py), in both directions, so

- backbones trained here on TPU can be consumed by unmodified reference
  code (used for the round-2 reference-parity generator experiment), and
- reference-trained torch checkpoints can seed models here.

Mapping is 1:1: flax ``nn.Dense`` kernels are [in, out], exactly the
reference's Conv1D weight layout (reference: models/modeling_utils.py:
1255-1266), so no transposes are needed anywhere.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


# (our tree path suffix, torch suffix) within one transformer block
_BLOCK_LEAVES = [
    ("ln_1/scale", "ln_1.weight"),
    ("ln_1/bias", "ln_1.bias"),
    ("attn/c_attn/kernel", "attn.c_attn.weight"),
    ("attn/c_attn/bias", "attn.c_attn.bias"),
    ("attn/c_proj/kernel", "attn.c_proj.weight"),
    ("attn/c_proj/bias", "attn.c_proj.bias"),
    ("ln_2/scale", "ln_2.weight"),
    ("ln_2/bias", "ln_2.bias"),
    ("mlp/c_fc/kernel", "mlp.c_fc.weight"),
    ("mlp/c_fc/bias", "mlp.c_fc.bias"),
    ("mlp/c_proj/kernel", "mlp.c_proj.weight"),
    ("mlp/c_proj/bias", "mlp.c_proj.bias"),
]


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return np.asarray(node)


def params_to_torch_state_dict(params: Dict, n_layer: int,
                               n_ctx: int = 1024) -> Dict:
    """Our flax param tree -> reference GPT2LMHeadModel state dict
    (numpy-backed torch tensors; lm_head tied to wte; causal-mask
    buffers included as the reference's Attention registers them,
    reference: models/modeling_gpt2.py:107)."""
    import torch

    sd = {}
    wte = _get(params, "wte")
    sd["transformer.wte.weight"] = torch.from_numpy(wte.copy())
    sd["transformer.wpe.weight"] = torch.from_numpy(_get(params, "wpe").copy())
    for i in range(n_layer):
        for ours, theirs in _BLOCK_LEAVES:
            arr = _get(params, f"h_{i}/{ours}")
            sd[f"transformer.h.{i}.{theirs}"] = torch.from_numpy(arr.copy())
        sd[f"transformer.h.{i}.attn.bias"] = torch.tril(
            torch.ones(n_ctx, n_ctx)).view(1, 1, n_ctx, n_ctx)
    sd["transformer.ln_f.weight"] = torch.from_numpy(
        _get(params, "ln_f/scale").copy())
    sd["transformer.ln_f.bias"] = torch.from_numpy(
        _get(params, "ln_f/bias").copy())
    if "lm_head" in params:  # untied-head generator quirk (config.py)
        sd["lm_head.weight"] = torch.from_numpy(_get(params,
                                                     "lm_head").copy())
    else:
        sd["lm_head.weight"] = sd["transformer.wte.weight"]
    return sd


def torch_state_dict_to_params(sd: Dict, n_layer: int) -> Dict:
    """Reference GPT2(LMHead)Model state dict -> our flax param tree.
    Accepts both bare GPT2Model keys and ``transformer.``-prefixed ones."""

    def fetch(key):
        for k in (f"transformer.{key}", key):
            if k in sd:
                return np.asarray(sd[k].detach().cpu().numpy()
                                  if hasattr(sd[k], "detach") else sd[k])
        raise KeyError(key)

    tree: Dict = {"wte": fetch("wte.weight"), "wpe": fetch("wpe.weight"),
                  "ln_f": {"scale": fetch("ln_f.weight"),
                           "bias": fetch("ln_f.bias")}}
    for i in range(n_layer):
        blk: Dict = {}
        for ours, theirs in _BLOCK_LEAVES:
            node = blk
            parts = ours.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = fetch(f"h.{i}.{theirs}")
        tree[f"h_{i}"] = blk
    return tree


def export_reference_checkpoint(ckpt_dir: str, out_dir: str,
                                n_ctx: int = 1024) -> str:
    """Write a reference-format checkpoint dir (pytorch_model.bin +
    config.json) from one of our msgpack checkpoint dirs."""
    import torch

    from rag4dyg_tpu.utils.checkpoint import load_config, load_params

    params, cfg = load_params(ckpt_dir), load_config(ckpt_dir)
    sd = params_to_torch_state_dict(params, cfg.n_layer, n_ctx=n_ctx)
    os.makedirs(out_dir, exist_ok=True)
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))
    ref_cfg = {
        "vocab_size": cfg.vocab_size,
        "n_positions": cfg.n_positions,
        "n_ctx": n_ctx,
        "n_embd": cfg.n_embd,
        "n_layer": cfg.n_layer,
        "n_head": cfg.n_head,
        "resid_pdrop": cfg.resid_pdrop,
        "embd_pdrop": cfg.embd_pdrop,
        "attn_pdrop": cfg.attn_pdrop,
        "layer_norm_epsilon": cfg.layer_norm_epsilon,
        "initializer_range": cfg.initializer_range,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(ref_cfg, f, indent=2)
    return out_dir


def import_reference_checkpoint(ref_dir: str):
    """Load a reference-format checkpoint dir into (params, ModelConfig).

    Generator checkpoints saved by the reference's main_generator.py carry
    two extra head groups beyond the GPT-2 tree, both mapped here so a
    reference-trained RAG generator can be evaluated in this framework:

    - ``lm_head.weight`` [V, D]: the untied output head (the reference's
      broken-weight-tying quirk, utils/model.py:71-78 — see
      ModelConfig.untied_lm_head). Imported, and only then, when it is not
      the identical tensor as ``transformer.wte.weight``.
    - ``gnn_fusion.convs.N.{weight,bias}`` / ``mlp_fusion...`` linears
      (models/modeling_rag.py:44-99). Layer order is numeric (convs.10
      after convs.2). Weight orientation is decided per key NAME, which
      determines it unambiguously (shape-chaining alone mis-handles the
      shipped gnn_layers=1 config, whose single GCNConv is square):
      our fusion kernels are x@W with W [in, out]; old-PyG GCNConv
      ``convs.N.weight`` already stores [in, out] (kept as-is), while
      torch.nn.Linear (every ``mlp_fusion`` weight) and PyG>=2
      ``convs.N.lin.weight`` store [out, in] (always transposed). The
      resulting stack is then validated by chaining it from the known
      input dim (n_embd for gnn, 512 for mlp — utils/model.py:133).
      Single layer keeps the flat {kernel, bias} tree.
    """
    import re

    import torch

    from rag4dyg_tpu.config import ModelConfig

    with open(os.path.join(ref_dir, "config.json")) as f:
        rc = json.load(f)
    sd = torch.load(os.path.join(ref_dir, "pytorch_model.bin"),
                    map_location="cpu", weights_only=False)
    tree = torch_state_dict_to_params(sd, rc["n_layer"])

    untied = False
    if "lm_head.weight" in sd and "transformer.wte.weight" in sd:
        head = sd["lm_head.weight"].detach().cpu().numpy()
        if not np.array_equal(head, tree["wte"]):
            tree["lm_head"] = np.asarray(head)
            untied = True

    def _layer_idx(k):
        m = re.search(r"\.(\d+)\.", k)
        return int(m.group(1)) if m else -1

    fusion_keys = sorted(
        (k for k in sd if k.endswith(".weight")
         and ("gnn_fusion" in k or "mlp_fusion" in k)),
        key=lambda k: (_layer_idx(k), k))
    if fusion_keys:
        # [out, in] layouts (torch.nn.Linear / PyG>=2 GCNConv.lin) are
        # transposed to our x@W [in, out]; bare old-PyG GCNConv `.weight`
        # is already [in, out].
        kernels = []
        for k in fusion_keys:
            w = np.asarray(sd[k].detach().cpu().numpy())
            if ".lin.weight" in k or "mlp_fusion" in k:
                w = w.T
            kernels.append(w)
        in_dim = (rc["n_embd"] if "gnn_fusion" in fusion_keys[0]
                  else 512)  # MLP fusion pad length, utils/model.py:133

        def _chains(ws):
            cur = in_dim
            for w in ws:
                if w.ndim != 2 or w.shape[0] != cur:
                    return False
                cur = w.shape[1]
            return True

        if not _chains(kernels):
            raise ValueError(
                f"fusion weights {[w.shape for w in kernels]} "
                f"({fusion_keys}) do not chain from input dim {in_dim} "
                f"after name-based orientation")

        biases = []
        for k, w in zip(fusion_keys, kernels):
            bk = k.replace(".weight", ".bias")
            if bk not in sd:  # PyG>=2: convs.N.lin.weight, bias at convs.N
                bk = bk.replace(".lin.", ".")
            b = (np.asarray(sd[bk].detach().cpu().numpy()) if bk in sd
                 else np.zeros(w.shape[1], w.dtype))
            if b.shape != (w.shape[1],):
                raise ValueError(f"{bk}: bias {b.shape} does not match "
                                 f"kernel out dim {w.shape[1]}")
            biases.append(b)
        if len(kernels) == 1:
            tree["fusion"] = {"kernel": kernels[0], "bias": biases[0]}
        else:
            tree["fusion"] = {}
            for i, (kk, bb) in enumerate(zip(kernels, biases)):
                tree["fusion"][f"kernel_{i}"] = kk
                tree["fusion"][f"bias_{i}"] = bb

    cfg = ModelConfig(
        vocab_size=rc["vocab_size"], n_layer=rc["n_layer"],
        n_head=rc["n_head"], n_embd=rc["n_embd"],
        n_positions=rc.get("n_positions", 1024),
        resid_pdrop=rc.get("resid_pdrop", 0.1),
        embd_pdrop=rc.get("embd_pdrop", 0.1),
        attn_pdrop=rc.get("attn_pdrop", 0.1),
        layer_norm_epsilon=rc.get("layer_norm_epsilon", 1e-5),
        initializer_range=rc.get("initializer_range", 0.02),
        untied_lm_head=untied,
    )
    return tree, cfg
