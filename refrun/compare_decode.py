#!/usr/bin/env python
"""Token-level decode parity: the reference's per-token no-KV-cache greedy
loop (run via refrun on the exported checkpoint) vs this framework's
batched KV-cache decoder on the SAME weights and prompts.

Reads the reference's eval JSON dump (Evaluation_SimpleDyG.py:208-209),
selects queries whose reference decode was short (cheap on this 1-core
host), re-decodes them with ops/decode.greedy_decode, and compares the
generated token streams exactly.

Usage: python refrun/compare_decode.py <eval_results.json> <ckpt_dir> \
           <vocab.json> <timestep> [max_ref_len] [n_queries]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from rag4dyg_tpu.data.vocab import Tokenizer
    from rag4dyg_tpu.models import GPT2LMModel
    from rag4dyg_tpu.ops.decode import greedy_decode
    from rag4dyg_tpu.utils.checkpoint import load_config, load_params

    dump_path, ckpt, vocab_path, timestep = sys.argv[1:5]
    max_ref_len = int(sys.argv[5]) if len(sys.argv) > 5 else 30
    n_queries = int(sys.argv[6]) if len(sys.argv) > 6 else 8

    dump = json.load(open(dump_path))
    tok = Tokenizer.from_vocab_file(vocab_path, int(timestep),
                                    with_mask_token=False)
    config = load_config(ckpt)
    params = load_params(ckpt)
    model = GPT2LMModel(config)

    picked = [(k, v) for k, v in dump.items()
              if len(v["predicted_list_ori"]) <= max_ref_len][:n_queries]
    assert picked, "no short reference decodes to compare"

    seqs, refs = [], []
    for _, v in picked:
        seqs.append(tok.encode(v["input"]))
        refs.append([tok.token_to_id(t) for t in v["predicted_list_ori"]])

    n_ctx = config.n_positions
    caps = [n_ctx - len(s) - 1 for s in seqs]  # generous: ref len << cap
    max_steps = max(max_ref_len + 4, 8)
    caps = [min(c, max_steps) for c in caps]
    tokens, lengths = greedy_decode(model, params, seqs,
                                    eos_id=tok.eos_id, pad_id=tok.pad_id,
                                    caps=caps, max_steps=max_steps)

    mismatches = 0
    for row, ((qid, v), ref) in enumerate(zip(picked, refs)):
        ours = tokens[row, : lengths[row]].tolist()
        # the reference stream may exceed our cap window (max_steps AND
        # the per-query context cap); compare prefix, and only require
        # equal lengths when the reference stream fit inside our cap
        m = min(len(ours), len(ref))
        ok = ours[:m] == ref[:m] and (len(ours) == len(ref)
                                      or len(ours) == caps[row])
        status = "OK " if ok else "FAIL"
        if not ok:
            mismatches += 1
        print(f"{status} query {qid}: ref {len(ref)} tok, ours "
              f"{len(ours)} tok, first-diff "
              f"{next((i for i in range(m) if ours[i] != ref[i]), None)}")
    print(json.dumps({"compared": len(picked), "mismatches": mismatches}))
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
