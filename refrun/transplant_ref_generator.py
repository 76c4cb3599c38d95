"""Convert a reference-trained RAG generator checkpoint into one of our
msgpack checkpoint dirs, for evaluation under THIS framework's evaluator.

The round-2 RAG-vs-backbone investigation needs a number that isolates
training quality from evaluator-protocol offsets: the reference's
evaluator scores the SAME backbone ~0.010 lower than ours (RESULTS.md,
transplant section), so its generator's val NDCG@5 cannot be compared to
our generator's directly. Importing its trained weights (transformer +
untied lm_head + gnn_fusion — reference main_generator.py save path,
utils/model.py:71-78 quirk) and scoring them with OUR evaluator on OUR
splits makes the comparison apples-to-apples:

    python refrun/transplant_ref_generator.py <ref_ckpt_dir> <out_dir>
    python -m rag4dyg_tpu.cli eval --dataset UCI_13 \
        --resources runs/uci_masked/resources --checkpoint <out_dir> \
        --split val
"""

import sys

from rag4dyg_tpu.utils.checkpoint import save_checkpoint
from rag4dyg_tpu.utils.export_torch import import_reference_checkpoint


def main(ref_dir: str, out_dir: str) -> None:
    tree, cfg = import_reference_checkpoint(ref_dir)
    assert "fusion" in tree, f"no fusion head found in {ref_dir}"
    assert cfg.untied_lm_head, "reference generator should carry the " \
        "untied lm_head (broken-weight-tying quirk); tied head found"
    save_checkpoint(out_dir, tree, config=cfg,
                    meta={"source": ref_dir, "stage": "generator",
                          "transplant": "reference->rag4dyg_tpu"})
    print(f"saved transplanted generator to {out_dir} "
          f"(untied_lm_head={cfg.untied_lm_head}, "
          f"fusion leaves={sorted(tree['fusion'])})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
