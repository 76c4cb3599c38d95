#!/usr/bin/env python
"""Evaluate a backbone checkpoint on the VAL split with TEST-mode decode
caps — the protocol the reference's SimpleDyG evaluator actually runs for
mode="test" (it reads args.eval_data_file for every mode,
Evaluation_SimpleDyG.py:57), so this is the apples-to-apples comparator
for refrun's transplant eval number.

Usage: python refrun/our_val_testcaps.py <ckpt> <resources> <dataset_timestep>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ckpt, resources, timestep = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from rag4dyg_tpu.data.serialize import read_corpus_lines
    from rag4dyg_tpu.data.vocab import Tokenizer
    from rag4dyg_tpu.eval.evaluate import generation_eval
    from rag4dyg_tpu.models import GPT2LMModel
    from rag4dyg_tpu.utils.checkpoint import load_config, load_params

    tok = Tokenizer.from_vocab_file(os.path.join(resources, "vocab.json"),
                                    timestep, with_mask_token=False)
    config = load_config(ckpt)
    model = GPT2LMModel(config)
    params = load_params(ckpt)
    val = read_corpus_lines(os.path.join(resources, "val.link_prediction"))
    val_gt = read_corpus_lines(
        os.path.join(resources, "val_gt.link_prediction"))
    # mode "test" applies the reference's n_ctx - n_specials budget
    metrics = generation_eval(model, params, tok, val, val_gt,
                              tok.node_vocab, "test")
    print(json.dumps({"protocol": "val split, test-mode caps", **metrics}))


if __name__ == "__main__":
    main()
