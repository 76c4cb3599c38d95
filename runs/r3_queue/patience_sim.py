"""Early-stop patience replay: does best-epoch selection move?

VERDICT r2 missing #1: the round-2 dialog generator sweep ran at
patience 15 where the reference launcher sets 10
(scripts/train_generator/train_rag_graphpooling_dialog_seed.sh). Early
stopping only decides WHEN training stops — the per-epoch val trace and
the running-best sequence are identical — so a recorded patience-15
trace suffices to replay what patience-10 would have selected: if every
new best arrives within 10 epochs of the previous best, the selected
best epoch (and therefore the reported best-checkpoint val/test
metrics) is IDENTICAL, and only the checkpoint-last columns differ.

Replays rag4dyg_tpu/train/generator.py's loop (score = val NDCG, epoch
0 gated out by the `epoch > warmup_epochs` check, counter resets on
improvement, stop at counter >= patience).

Usage: python runs/r3_queue/patience_sim.py [sweep_dir] [p_new] [p_old]
"""

import glob
import json
import os
import sys


def simulate(trace, patience, warmup_epochs=0):
    """Return (best_epoch, stop_epoch) for an early-stopped run whose
    per-epoch val scores are `trace` (same selection rule as
    train/generator.py:592-606)."""
    best, best_ep, counter = None, -1, 0
    for ep, v in enumerate(trace):
        if ep <= warmup_epochs:
            continue
        if best is None or v > best:
            best, best_ep, counter = v, ep, 0
        else:
            counter += 1
            if counter >= patience:
                return best_ep, ep
    return best_ep, len(trace) - 1


def main(sweep_dir, p_new=10, p_old=15):
    moved = []
    for path in sorted(glob.glob(
            os.path.join(sweep_dir, "seed*/logs/scalars.jsonl"))):
        trace = [json.loads(line)["val_ndcg5"] for line in open(path)]
        seed = path.split(os.sep)[-3]
        b_new, stop_new = simulate(trace, p_new)
        b_old, stop_old = simulate(trace, p_old)
        # a trace that never hit the OLD patience was cut externally
        # (deadline kill) — flag it, its CSV row (if any) is unreliable.
        # EXCEPTION: a trace that legitimately ran to its epochs horizon
        # (reference trainers stop at num_train_epochs regardless of
        # patience) is a natural stop, not a cut — every committed
        # generator horizon is 100 epochs, so only flag shorter traces.
        HORIZON = 100
        cut = (len(trace) < HORIZON
               and stop_old == len(trace) - 1
               and (len(trace) - 1 - b_old) < p_old)
        status = ("CUT" if cut else
                  "SAME" if b_new == b_old else "MOVES")
        if status != "SAME":
            moved.append(seed)
        print(f"{seed}: epochs={len(trace)} best@p{p_new}={b_new} "
              f"best@p{p_old}={b_old} {status}")
    print("verdict:", "all best epochs identical — recorded metrics are "
          f"valid under patience {p_new}" if not moved else
          f"re-run needed for {moved}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "runs/dialog/sweep_generator_r2",
         *(int(a) for a in sys.argv[2:]))
