"""Generation evaluation driver.

Replays the reference's decode-and-score protocol
(reference: utils/Evaluation_SimpleDyG.py:53-211,
utils/Evaluation_generator.py:49-217) on top of the batched KV-cache
decoder:

  * target list = gt tokens minus the ego id minus tokens outside the node
    vocab; queries with empty targets are skipped entirely.
  * prompts longer than n_ctx are cut to their last 1000 tokens.
  * generation stops at eos, at 11 new tokens for val, or when the total
    length reaches n_ctx - #special-tokens for test.
  * predictions = generated tokens minus the ego id minus special tokens
    (structural + time + bos/eos + pad — the reference filter set).
  * NDCG@5 (natural-log discount), Jaccard, and (generator) Recall@5,
    averaged over scored queries and rounded to 4 digits.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

from rag4dyg_tpu.eval.metrics import jaccard, ndcg_k, recall_k
from rag4dyg_tpu.ops.decode import greedy_decode


def _filter_set(tokenizer) -> set:
    """The reference's spl_tokens: additional specials + bos/eos + pad
    (mask token excluded — it is registered separately in the reference,
    never in additional_special_tokens)."""
    toks = set(tokenizer.special_tokens)
    toks.discard("[MASK]")
    return toks


def parse_eval_case(line: str, gt_line: str, node_vocab: Dict[str, int]
                    ) -> Tuple[str, List[str]]:
    user_id = line.split()[2]
    target = gt_line.split()[1:-2]
    target = [t for t in target if t != user_id and t in node_vocab]
    return user_id, target


def generation_eval(model, params, tokenizer, data_lines: Sequence[str],
                    gt_lines: Sequence[str], node_vocab: Dict[str, int],
                    mode: str, *, batch_size: int = 64,
                    with_recall: bool = False, topk: int = 5,
                    prefill_embed_fn_factory: Optional[Callable] = None,
                    collect_generations: bool = False) -> Dict:
    """Decode every query and score against ground truth.

    ``prefill_embed_fn_factory(batch_rows)`` (optional) returns the RAG
    prefill hook for a batch of query indices (demonstration fusion).
    """
    assert len(data_lines) == len(gt_lines)
    n_ctx = model.config.n_positions
    spl = _filter_set(tokenizer)
    # the reference's spl_tokens is a LIST that counts <|endoftext|> twice
    # (bos AND eos — Evaluation_SimpleDyG.py:55); the set above collapses
    # them, so add 1 to match the generation budget exactly
    n_spl = len(spl) + 1

    cases = []  # (orig_index, user_id, target, prompt_ids, cap)
    for i, (line, gt) in enumerate(zip(data_lines, gt_lines)):
        user_id, target = parse_eval_case(line, gt, node_vocab)
        if not target:
            continue
        ids = tokenizer.encode(line)
        if len(ids) > n_ctx:
            ids = ids[-1000:]
        cap = 11 if mode == "val" else max(1, n_ctx - n_spl - len(ids))
        cases.append((i, user_id, target, ids, cap))

    sums = {"NDCG": 0.0, "jaccard": 0.0, "R": 0.0}
    generations = {}
    max_steps = 11 if mode == "val" else max(1, n_ctx - n_spl)

    for start in range(0, len(cases), batch_size):
        chunk = cases[start:start + batch_size]
        seqs = [c[3] for c in chunk]
        caps = [c[4] for c in chunk]
        prefill_fn = None
        if prefill_embed_fn_factory is not None:
            prefill_fn = prefill_embed_fn_factory([c[0] for c in chunk])
        tokens, lengths = greedy_decode(
            model, params, seqs, eos_id=tokenizer.eos_id,
            pad_id=tokenizer.pad_id, caps=caps, max_steps=max_steps,
            prefill_embed_fn=prefill_fn)
        for row, (i, user_id, target, ids, cap) in enumerate(chunk):
            gen_ids = [int(t) for t in tokens[row, : lengths[row]]]
            gen_toks = [tokenizer.id_to_token(t) for t in gen_ids]
            predicted = [t for t in gen_toks if t != user_id and t not in spl]
            sums["NDCG"] += ndcg_k(predicted, target, topk)
            sums["jaccard"] += jaccard(predicted, target)
            if with_recall:
                sums["R"] += recall_k(predicted, target, topk)
            if collect_generations:
                generations[i] = {"user_id": user_id, "target": target,
                                  "predicted": predicted,
                                  "predicted_raw": gen_toks}

    n = max(1, len(cases))
    out = {"NDCG": round(sums["NDCG"] / n, 4),
           "jaccard": round(sums["jaccard"] / n, 4),
           "num_scored": len(cases)}
    if with_recall:
        out["R"] = round(sums["R"] / n, 4)
    if collect_generations:
        out["generations"] = generations
    return out
