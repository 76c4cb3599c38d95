#!/usr/bin/env python
"""Run an UNMODIFIED reference main in a writable sandbox.

Usage: python run_reference.py <sandbox_dir> <script.py> [args...]

- Injects stubs (wandb, ipdb, boto3/botocore, torch_geometric) from
  ./stubs so the reference's imports resolve without its GPU-era wheels.
- Shims transformers.AdamW (removed in modern transformers) with
  torch.optim.AdamW — mathematically identical to HF's AdamW with
  correct_bias=True (decoupled weight decay, eps outside sqrt).
- Pins torch to 1 thread (this host has one core; the reference asks
  for 50 — reference: main_SimpleDyG.py:46) and neuters later calls.
- chdir into the sandbox so all relative output paths write there.

No reference file is modified; /root/reference stays read-only.
"""

import os
import runpy
import sys

STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stubs")
REF = "/root/reference"


def main():
    sandbox, script = sys.argv[1], sys.argv[2]
    extra = sys.argv[3:]
    sys.path.insert(0, STUBS)
    sys.path.insert(0, REF)

    import torch

    torch.set_num_threads(1)
    torch.set_num_threads = lambda n: None  # reference pins 50 threads
    # torch is a CPU-only build here; the reference calls .cuda()
    # unconditionally in load_and_freeze_params (utils/model.py:73) and
    # the node-feature init paths — make .cuda() a no-op
    torch.nn.Module.cuda = lambda self, device=None: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    # the eval loops hardcode .to('cuda') (utils/Evaluation_SimpleDyG.py:
    # 87,122,134; utils/Evaluation_generator.py:110-167;
    # train/train_retriever.py:435) — rewrite cuda targets to cpu

    def _decuda(x):
        if isinstance(x, str) and x.startswith("cuda"):
            return "cpu"
        if isinstance(x, torch.device) and x.type == "cuda":
            return torch.device("cpu")
        return x

    _tensor_to = torch.Tensor.to
    _module_to = torch.nn.Module.to

    def _tto(self, *a, **k):
        a = tuple(_decuda(x) for x in a)
        if "device" in k:
            k["device"] = _decuda(k["device"])
        return _tensor_to(self, *a, **k)

    def _mto(self, *a, **k):
        a = tuple(_decuda(x) for x in a)
        if "device" in k:
            k["device"] = _decuda(k["device"])
        return _module_to(self, *a, **k)

    torch.Tensor.to = _tto
    torch.nn.Module.to = _mto

    # main_generator.py:61,66 reads args.retrieval_type / args.task which
    # NO committed parser defines (upstream bug — the committed generator
    # scripts crash as-is); both only feed run-name strings
    import argparse

    argparse.Namespace.retrieval_type = "none"
    argparse.Namespace.task = "linkpred"

    import transformers
    from torch.optim import AdamW

    transformers.AdamW = AdamW
    # the reference (HF 3.x-era caller code) reads the private
    # tokenizer._pad_token attr (dataloader/SimpleDyG.py:39 etc.),
    # removed in modern transformers — alias it to the public property
    transformers.PreTrainedTokenizerFast._pad_token = property(
        lambda self: self.pad_token)

    os.chdir(sandbox)
    sys.argv = [script] + extra
    runpy.run_path(os.path.join(REF, script), run_name="__main__")


if __name__ == "__main__":
    main()
