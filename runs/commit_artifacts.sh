#!/bin/bash
# Force-add the durable run artifacts future rounds depend on (runs/ is
# gitignored; these adds are deliberate). Safe to run repeatedly — only
# stages what exists. Does NOT commit; callers review `git status` and
# commit with a milestone message.
#
# Durable set (see ROUND3.md "Durability policy"):
#  - checkpoint-best params.msgpack + meta.json for every backbone/
#    retriever the recorded sweeps initialize from
#  - results.csv / sweep_results.csv / logs for every run dir
#  - resources/{retrieval_result,train_retrieval,train_generator} files
cd "$(dirname "$0")/.."
shopt -s nullglob
for f in \
    runs/*/resources/retrieval_result/* \
    runs/*/resources/retrieval_result/.from_* \
    runs/*/resources/train_retrieval/* \
    runs/*/resources/train_generator/* \
    runs/*/backbone*/checkpoint-best/params.msgpack \
    runs/*/backbone*/checkpoint-best/meta.json \
    runs/*/backbone*/checkpoint-best/config.json \
    runs/*/retriever*/checkpoint-best/params.msgpack \
    runs/*/retriever*/checkpoint-best/meta.json \
    runs/*/retriever*/checkpoint-best/config.json \
    runs/*/*/results.csv \
    runs/*/*/sweep_results.csv \
    runs/*/*/logs/* \
    runs/*/sweep_generator*/sweep_results.csv \
    runs/*/sweep_generator*/seed*/results.csv \
    runs/*/sweep_generator*/seed*/logs/* \
    runs/*/sweep_backbone*/seed*/results.csv \
    runs/*/sweep_backbone*/seed*/logs/* \
    runs/scale_pool_1m/*.json \
    runs/annotate_bench/*.json \
    runs/mfu_buckets/*.json \
    runs/remat_dots/*.json \
  ; do
  git add -f "$f"
done
git status --short | head -40
