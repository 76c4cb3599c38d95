"""Command-line interface for the full pipeline.

Replaces the reference's three argparse drivers + per-dataset shell
launchers (reference: main_SimpleDyG.py / main_retriever.py /
main_generator.py, scripts/**/*.sh) with one typed entry point whose
per-dataset hyperparameters come from the registry in ``config.py``::

    python -m rag4dyg_tpu.cli prepare        --dataset UCI_13 --csv ... --out runs/uci
    python -m rag4dyg_tpu.cli annotate       --dataset UCI_13 --resources runs/uci
    python -m rag4dyg_tpu.cli query-time     --dataset UCI_13 --csv ... --resources runs/uci
    python -m rag4dyg_tpu.cli train-backbone --dataset UCI_13 --resources runs/uci --out runs/uci/backbone
    python -m rag4dyg_tpu.cli train-retriever --dataset UCI_13 --resources runs/uci --out runs/uci/retriever
    python -m rag4dyg_tpu.cli train-generator --dataset UCI_13 --resources runs/uci --out runs/uci/generator
    python -m rag4dyg_tpu.cli pipeline       --dataset UCI_13 --csv ... --out runs/uci

``pipeline`` chains every stage end-to-end (prepare → annotate →
query-time → backbone → retriever → generator).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys

import numpy as np

from rag4dyg_tpu.config import DATASETS, DatasetSpec


def _spec(args) -> DatasetSpec:
    import dataclasses
    if args.dataset not in DATASETS:
        sys.exit(f"unknown dataset {args.dataset!r}; known: {sorted(DATASETS)}")
    spec = DATASETS[args.dataset]
    if getattr(args, "pool_mode", None):
        spec = dataclasses.replace(
            spec, retriever=dataclasses.replace(spec.retriever,
                                                pool_mode=args.pool_mode))
    gen_over = {k: v for k, v in (
        ("fusion", getattr(args, "fusion", None)),
        ("gnn_layers", getattr(args, "gnn_layers", None)),
        ("mlp_layers", getattr(args, "mlp_layers", None)),
        ("gnn_dropout", getattr(args, "gnn_dropout", None)),
        ("top_k", getattr(args, "top_k", None))) if v is not None}
    if gen_over:
        spec = dataclasses.replace(
            spec, generator=dataclasses.replace(spec.generator, **gen_over))
    if getattr(args, "smoke", False):
        # tiny-dims end-to-end smoke: same code paths, minutes not hours
        spec = dataclasses.replace(
            spec, n_layer=2, n_head=2, n_embd=64, batch_size=16,
            retriever=dataclasses.replace(spec.retriever, n_layer=2,
                                          n_head=2, n_embd=64,
                                          batch_size=16),
            generator=dataclasses.replace(spec.generator, batch_size=16))
    return spec


def _train_caps(args) -> dict:
    out = {}
    if getattr(args, "smoke", False):
        out = {"max_steps_per_epoch": 4, "max_eval_queries": 24}
    k = getattr(args, "accumulate_steps", None)
    if k and k > 1:
        out["accumulate_steps"] = k
    return out


def _tokenizer(spec: DatasetSpec, resources: str, with_mask: bool = True):
    from rag4dyg_tpu.data.vocab import Tokenizer
    return Tokenizer.from_vocab_file(os.path.join(resources, "vocab.json"),
                                     spec.timestep, with_mask_token=with_mask)


def cmd_prepare(args):
    from rag4dyg_tpu.data.serialize import prepare_dataset
    spec = _spec(args)
    splits = prepare_dataset(args.csv, args.resources, spec.timestep,
                             dialog_split=spec.dialog_split,
                             hepth_style=spec.hepth_style)
    print(json.dumps({"train": len(splits.train_lines),
                      "val": len(splits.val_lines),
                      "test": len(splits.test_lines),
                      "vocab": len(splits.vocab)}))


def cmd_annotate(args):
    from rag4dyg_tpu.pool.annotate import annotate_pool, write_annotation
    spec = _spec(args)
    ann = annotate_pool(args.resources, _tokenizer(spec, args.resources),
                        threshold=spec.jaccard_threshold,
                        neg_num=spec.neg_num, gt_topk=spec.gt_topk,
                        max_positives=spec.max_positives, seed=args.seed or 0,
                        device_mining=getattr(args, "device_mining", False))
    write_annotation(ann,
                     os.path.join(args.resources, "train_retrieval"),
                     os.path.join(args.resources, "train_generator"))
    out = {"pairs": int(len(ann.train_pairs)), "pool": int(ann.n_pool)}
    if ann.mine_stats is not None:
        out["mining"] = "device"
        out["fallback_rows"] = ann.mine_stats.fallback_rows
    print(json.dumps(out))


def cmd_query_time(args):
    from rag4dyg_tpu.data.query_time import compute_query_times_csv
    from rag4dyg_tpu.data.serialize import read_corpus_lines
    spec = _spec(args)
    train_lines = read_corpus_lines(
        os.path.join(args.resources, "train.link_prediction"))
    qt = compute_query_times_csv(args.csv, train_lines, spec.timestep,
                                 spec.time_scale)
    out = os.path.join(args.resources, "train_query_time.npy")
    np.save(out, qt)
    print(json.dumps({"n": int(len(qt)), "out": out}))


def _node_features(spec: DatasetSpec, args):
    if not getattr(args, "node_features", None):
        return None
    feats = np.load(args.node_features)
    if isinstance(feats, np.lib.npyio.NpzFile):
        sys.exit(f"{args.node_features}: --node-features needs a plain "
                 ".npy in node-row order; produce one with "
                 "`cli word2vec --node-ids <order-file>`")
    assert feats.shape[1] == spec.node_feature_dim, (
        f"expected {spec.node_feature_dim}-d features, got {feats.shape}")
    return feats


def cmd_train_backbone(args):
    from rag4dyg_tpu.train.backbone import train_backbone
    spec = _spec(args)
    res = train_backbone(spec, args.resources, args.out, epochs=args.epochs,
                         seed=args.seed, dtype=args.dtype,
                         attention_impl=getattr(args, "attention_impl",
                                                "xla") or "xla",
                         node_features=_node_features(spec, args),
                         save_every=getattr(args, "save_every", 0) or 0,
                         resume=getattr(args, "resume", False),
                         **_train_caps(args))
    print(json.dumps({"best_epoch": res.best_epoch, "val": res.val_metrics,
                      "test": res.test_metrics,
                      "checkpoint": res.checkpoint_dir}))


def cmd_train_retriever(args):
    from rag4dyg_tpu.train.retriever import train_retriever
    spec = _spec(args)
    res = train_retriever(spec, args.resources, args.out,
                          backbone_ckpt=args.backbone, epochs=args.epochs,
                          seed=args.seed, dtype=args.dtype,
                          attention_impl=getattr(args, "attention_impl",
                                                 "xla") or "xla",
                          remat=getattr(args, "remat", "full") or "full",
                          chunk_ladder=getattr(args, "chunk_ladder", None),
                          gen_out_dir=os.path.join(args.resources,
                                                   "retrieval_result"),
                          save_every=getattr(args, "save_every", 0) or 0,
                          resume=getattr(args, "resume", False),
                          **_train_caps(args))
    print(json.dumps({"best_epoch": res.best_epoch, "val": res.val_metrics,
                      "test": res.test_metrics,
                      "checkpoint": res.checkpoint_dir}))


def cmd_train_generator(args):
    from rag4dyg_tpu.train.generator import train_generator
    spec = _spec(args)
    res = train_generator(spec, args.resources, args.out,
                          backbone_ckpt=args.backbone, epochs=args.epochs,
                          seed=args.seed, dtype=args.dtype,
                          attention_impl=getattr(args, "attention_impl",
                                                 "xla") or "xla",
                          save_every=getattr(args, "save_every", 0) or 0,
                          resume=getattr(args, "resume", False),
                          **_train_caps(args))
    print(json.dumps({"best_epoch": res.best_epoch, "val": res.val_metrics,
                      "test": res.test_metrics,
                      "checkpoint": res.checkpoint_dir}))


def cmd_eval(args):
    """Decode-and-score a checkpoint. Generator checkpoints (param tree
    contains 'fusion') evaluate the full RAG path using the retrieval
    index files under <resources>/retrieval_result (or --retrieval-dir).
    With --all-checkpoints, every checkpoint-* dir under --checkpoint is
    evaluated (reference: main_SimpleDyG.py:469-488)."""
    if getattr(args, "all_checkpoints", False):
        import copy
        import glob as _glob
        ckpts = sorted(
            os.path.dirname(p) for p in _glob.glob(
                os.path.join(args.checkpoint, "**", "params.msgpack"),
                recursive=True))
        if not ckpts:
            sys.exit(f"no checkpoints under {args.checkpoint}")
        for c in ckpts:
            sub = copy.copy(args)
            sub.all_checkpoints = False
            sub.checkpoint = c
            print(c)
            cmd_eval(sub)
        return
    from rag4dyg_tpu.data.serialize import read_corpus_lines
    from rag4dyg_tpu.eval.evaluate import generation_eval
    from rag4dyg_tpu.models import GPT2LMModel
    from rag4dyg_tpu.utils.checkpoint import load_config, load_params
    spec = _spec(args)
    config = load_config(args.checkpoint)
    params = load_params(args.checkpoint)
    model = GPT2LMModel(config)
    tok = _tokenizer(spec, args.resources, with_mask=False)
    if config.vocab_size != len(tok):  # checkpoint from a [MASK]-stage model
        tok = _tokenizer(spec, args.resources, with_mask=True)
        assert config.vocab_size == len(tok), (
            f"checkpoint vocab {config.vocab_size} matches neither tokenizer")
    lines = read_corpus_lines(
        os.path.join(args.resources, f"{args.split}.link_prediction"))
    gt = read_corpus_lines(
        os.path.join(args.resources, f"{args.split}_gt.link_prediction"))

    factory = None
    eval_params = params
    if "fusion" in params:  # RAG generator checkpoint
        from rag4dyg_tpu.train.generator import (
            DemoStore,
            load_index_file,
            make_prefill_factory,
        )
        # prefer the fusion hyperparameters the checkpoint was trained
        # with (saved in meta.json) over the registry defaults — a
        # checkpoint trained with e.g. --top-k 3 must not be fed 10 demos
        from rag4dyg_tpu.config import GeneratorConfig
        from rag4dyg_tpu.utils.checkpoint import load_meta
        saved = load_meta(args.checkpoint).get("generator_config")
        if saved:
            # tolerate field drift across versions: drop saved keys the
            # current GeneratorConfig no longer has (warn) instead of
            # failing eval of older checkpoints with a TypeError
            fields = {f.name for f in dataclasses.fields(GeneratorConfig)}
            dropped = sorted(set(saved) - fields)
            if dropped:
                print(f"WARNING: ignoring stale generator_config keys "
                      f"from checkpoint meta: {dropped}")
            gcfg = GeneratorConfig(**{k: v for k, v in saved.items()
                                      if k in fields})
        else:
            gcfg = spec.generator
        train_lines = read_corpus_lines(
            os.path.join(args.resources, "train.link_prediction"))
        store = DemoStore(tok.encode_batch(train_lines,
                                           max_len=spec.block_size),
                          tok.pad_id, top_k=gcfg.top_k)
        rdir = (getattr(args, "retrieval_dir", None)
                or os.path.join(args.resources, "retrieval_result"))
        index_rows = load_index_file(
            os.path.join(rdir, f"{args.split}_index.gen"))
        factory = make_prefill_factory(params, store, index_rows,
                                       gcfg.fusion, gcfg.m,
                                       gcfg.fusion_pad_len)
        eval_params = {k: v for k, v in params.items() if k != "fusion"}

    metrics = generation_eval(model, eval_params, tok, lines, gt,
                              tok.node_vocab, args.split, with_recall=True,
                              prefill_embed_fn_factory=factory)
    print(json.dumps(metrics))


def cmd_word2vec(args):
    """Train CBOW features over a hep-th .abs corpus and save them as an
    .npz of {ids, features} (the reference's document_features.pkl
    payload, train_word2vec.py:40-49; consumed during preprocessing to
    build node_features.npy, all_data/hepth/pre/preprocess.py:215-227)."""
    import dataclasses as _dc

    from rag4dyg_tpu.data.word2vec import Word2VecParams, abs_corpus_features
    params = Word2VecParams(dim=args.dim, window=args.window,
                            epochs=args.w2v_epochs, sample=args.sample,
                            seed=1 if args.seed is None else args.seed)
    if args.smoke:
        params = _dc.replace(params, dim=8, epochs=1)
    feats = abs_corpus_features(args.abs_dir, params)
    if args.node_ids:
        # assemble node_features.npy directly: row r = features of the
        # r-th id in the node-order file (the reference's remap step,
        # all_data/hepth/pre/preprocess.py:215-227); unseen ids -> zeros
        with open(args.node_ids) as f:
            order = [ln.strip() for ln in f if ln.strip()]
        out = np.zeros((len(order), params.dim), np.float32)
        missing = 0
        for r, pid in enumerate(order):
            if pid in feats:
                out[r] = feats[pid]
            else:
                missing += 1
        # np.save appends .npy when the suffix is absent; normalize so the
        # reported path is always the written one
        out_path = args.out if args.out.endswith(".npy") else (
            os.path.splitext(args.out)[0] + ".npy")
        np.save(out_path, out)
        print(json.dumps({"docs": len(feats), "nodes": len(order),
                          "missing": missing, "dim": params.dim,
                          "out": out_path}))
        return
    ids = sorted(feats)
    np.savez(args.out, ids=np.array(ids),
             features=np.stack([feats[i] for i in ids]))
    print(json.dumps({"docs": len(ids), "dim": params.dim,
                      "out": args.out}))


def cmd_sweep(args):
    """Seed sweep of one training stage + mean/std aggregation
    (reference: scripts/train_generator/train_rag_graphpooling_*_seed.sh
    runs 10 seeds and appends to aggregation CSVs)."""
    from rag4dyg_tpu.utils.logging import aggregate_seed_results, append_result_row
    stage_fns = {"backbone": cmd_train_backbone,
                 "retriever": cmd_train_retriever,
                 "generator": cmd_train_generator}
    fn = stage_fns[args.stage]
    seeds = [int(s) for s in args.seeds.split(",")]
    sweep_csv = os.path.join(args.out, "sweep_results.csv")
    for seed in seeds:
        import copy
        a = copy.copy(args)
        a.seed = seed
        a.out = os.path.join(args.out, f"seed{seed}")
        # outage insurance: every sweep seed checkpoints each epoch and
        # auto-resumes from a killed attempt's latest step checkpoint
        # (bit-exact — tests/test_resume.py); fresh dirs start fresh
        a.save_every = getattr(args, "save_every", 0) or 1
        a.resume = True
        fn(a)
        # each stage appended its own results.csv; merge the last row up
        import csv as _csv
        with open(os.path.join(a.out, "results.csv"), newline="") as f:
            rows = list(_csv.DictReader(f))
        append_result_row(sweep_csv, rows[-1])
    with open(sweep_csv, newline="") as f:
        import csv as _csv
        header = _csv.DictReader(f).fieldnames or []
    metric_cols = [c for c in header
                   if c.startswith(("val_", "test_")) and c not in
                   ("val_num_scored", "test_num_scored")]
    print(json.dumps(aggregate_seed_results(sweep_csv, metric_cols)))


def cmd_pipeline(args):
    _spec(args)  # fail fast on unknown dataset
    cmd_prepare(args)
    cmd_annotate(args)
    cmd_query_time(args)

    class A:  # stage-arg views with per-stage out dirs
        pass

    for stage, fn, extra in (
            ("backbone", cmd_train_backbone, {}),
            ("retriever", cmd_train_retriever,
             {"backbone": os.path.join(args.out, "backbone",
                                       "checkpoint-best")}),
            ("generator", cmd_train_generator,
             {"backbone": os.path.join(args.out, "backbone",
                                       "checkpoint-best")})):
        a = A()
        a.dataset = args.dataset
        a.resources = args.resources
        a.out = os.path.join(args.out, stage)
        a.epochs = args.epochs
        a.seed = args.seed
        a.dtype = args.dtype
        a.attention_impl = getattr(args, "attention_impl", "xla")
        a.remat = getattr(args, "remat", "full")
        a.smoke = getattr(args, "smoke", False)
        a.node_features = getattr(args, "node_features", None)
        a.pool_mode = getattr(args, "pool_mode", None)
        # forward every train/spec override the pipeline parser accepts —
        # _spec/_train_caps read these via getattr, so dropping one here
        # silently reverts it to the registry default
        for k in ("accumulate_steps", "fusion", "gnn_layers", "mlp_layers",
                  "gnn_dropout", "top_k"):
            setattr(a, k, getattr(args, k, None))
        for k, v in extra.items():
            setattr(a, k, v)
        fn(a)


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeated runs skip the 15-60 s
    remote compiles (measured 15.4 s -> 1.3 s across processes)."""
    import jax
    cache = os.environ.get(
        "RAG4DYG_JAX_CACHE",
        os.path.join(os.environ.get("XDG_CACHE_HOME",
                                    os.path.expanduser("~/.cache")),
                     "rag4dyg_tpu", "jaxcache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    _enable_compile_cache()
    p = argparse.ArgumentParser(prog="rag4dyg_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, csv=False, out=False, train=False):
        sp.add_argument("--dataset", required=True)
        sp.add_argument("--resources", default=None,
                        help="prepared corpus directory")
        if csv:
            sp.add_argument("--csv", required=True, help="ml_*.csv path")
        if out:
            sp.add_argument("--out", required=True)
        if train:
            sp.add_argument("--epochs", type=int, default=None)
            sp.add_argument("--dtype", default="float32",
                            choices=["float32", "bfloat16"])
            sp.add_argument("--attention-impl", default="xla",
                            choices=["xla", "flash"],
                            help="no-cache attention path: XLA einsum or "
                                 "the fused Pallas flash kernel "
                                 "(ops/flash_attention.py)")
            sp.add_argument("--remat", default="full",
                            choices=["full", "dots", "none"],
                            help="retriever encoder-pass remat: full "
                                 "(min memory, +1 fwd), dots (save MXU "
                                 "outputs, recompute elementwise only), "
                                 "none")
            sp.add_argument("--chunk-ladder", action="store_true",
                            default=None, dest="chunk_ladder",
                            help="retriever: cover each bucket group's "
                                 "step tail with a power-of-two chunk "
                                 "ladder instead of padding to one chunk "
                                 "size — bit-identical numerics; step "
                                 "padding 12.2%%->2.2%% at the wikiv2 "
                                 "shape for a few extra compiles "
                                 "(RESULTS.md MFU accounting). Default "
                                 "AUTO: on when the simulated flat plan "
                                 "wastes >5%% FLOPs on padding")
            sp.add_argument("--no-chunk-ladder", action="store_false",
                            dest="chunk_ladder",
                            help="force the single-chunk-size plan")
            sp.add_argument("--backbone", default=None,
                            help="backbone checkpoint dir for transfer")
            sp.add_argument("--save-every", type=int, default=0,
                            help="rotating step checkpoint every N epochs")
            sp.add_argument("--accumulate-steps", type=int, default=1,
                            help="gradient accumulation micro-batches per "
                                 "optimizer step (reference "
                                 "gradient_accumulation_steps)")
            sp.add_argument("--resume", action="store_true",
                            help="continue from latest step checkpoint")
            sp.add_argument("--pool-mode", default=None,
                            choices=["masked", "padded"],
                            help="retriever sequence pooling: masked mean "
                                 "(default) or the reference's padded mean "
                                 "(train_retriever.py:183-185 quirk)")
            sp.add_argument("--fusion", default=None,
                            choices=["graphpooling", "mlp"],
                            help="generator fusion head (default: dataset "
                                 "registry, graphpooling everywhere)")
            sp.add_argument("--gnn-layers", type=int, default=None,
                            help="stacked GCN layers in graphpooling fusion "
                                 "(reference get_gnn n_layers)")
            sp.add_argument("--mlp-layers", type=int, default=None,
                            help="MLP fusion depth (reference get_mlp)")
            sp.add_argument("--gnn-dropout", type=float, default=None,
                            help="inter-layer GCN dropout (train only)")
            sp.add_argument("--top-k", type=int, default=None,
                            help="retrieved demonstrations fused per query")
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--node-features", default=None,
                        help="node feature .npy for wte init")
        sp.add_argument("--smoke", action="store_true",
                        help="tiny-dims capped-steps end-to-end smoke run")
        sp.add_argument("--platform", default=None,
                        choices=["cpu", "axon"],
                        help="force the JAX backend (sitecustomize pins "
                             "jax_platforms=axon,cpu, which overrides the "
                             "JAX_PLATFORMS env var — this flag re-updates "
                             "jax.config before any backend use; use "
                             "'--platform cpu' to smoke-test while the TPU "
                             "relay is down)")

    common(sub.add_parser("prepare"), csv=True)
    ann_p = sub.add_parser("annotate")
    common(ann_p)
    ann_p.add_argument("--device-mining", action="store_true",
                       help="mine positives/negatives/gt on device "
                            "(pool.mine): no [N,N] matrix download; "
                            "candidate tie order canonicalized "
                            "(PARITY.md) so sampled negatives can differ "
                            "from the host path at identical "
                            "distribution")
    common(sub.add_parser("query-time"), csv=True)
    common(sub.add_parser("train-backbone"), out=True, train=True)
    common(sub.add_parser("train-retriever"), out=True, train=True)
    common(sub.add_parser("train-generator"), out=True, train=True)
    ev = sub.add_parser("eval")
    common(ev)
    ev.add_argument("--checkpoint", required=True)
    ev.add_argument("--split", default="test", choices=["val", "test"])
    ev.add_argument("--retrieval-dir", default=None,
                    help="dir with {split}_index.gen for RAG checkpoints")
    ev.add_argument("--all-checkpoints", action="store_true",
                    help="evaluate every checkpoint-* under --checkpoint "
                         "(reference --eval_all_checkpoints)")
    pipe = sub.add_parser("pipeline")
    common(pipe, csv=True, out=True, train=True)
    w2v = sub.add_parser("word2vec")
    w2v.add_argument("--abs-dir", required=True,
                     help="hep-th .abs corpus root (train_word2vec.py:9)")
    w2v.add_argument("--out", required=True, help="output .npz path")
    w2v.add_argument("--dim", type=int, default=172)
    w2v.add_argument("--window", type=int, default=5)
    w2v.add_argument("--w2v-epochs", type=int, default=5)
    w2v.add_argument("--sample", type=float, default=1e-3,
                     help="subsampling threshold (gensim default; 0 "
                          "disables — use for tiny corpora)")
    w2v.add_argument("--seed", type=int, default=None)
    w2v.add_argument("--node-ids", default=None,
                     help="file of original node ids in node-row order; "
                          "when given, --out becomes a node_features.npy "
                          "usable with --node-features")
    w2v.add_argument("--smoke", action="store_true")
    sw = sub.add_parser("sweep")
    common(sw, out=True, train=True)
    sw.add_argument("--stage", required=True,
                    choices=["backbone", "retriever", "generator"])
    sw.add_argument("--seeds", default="42,0,1,2,3,4,5,6,7,8",
                    help="comma-separated seed list (reference sweep set)")

    args = p.parse_args(argv)
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "resources", "") is None:
        args.resources = (os.path.join(args.out, "resources")
                          if getattr(args, "out", None) else "resources")
    {"prepare": cmd_prepare, "annotate": cmd_annotate,
     "query-time": cmd_query_time, "train-backbone": cmd_train_backbone,
     "train-retriever": cmd_train_retriever,
     "train-generator": cmd_train_generator, "eval": cmd_eval,
     "sweep": cmd_sweep, "pipeline": cmd_pipeline,
     "word2vec": cmd_word2vec}[args.cmd](args)


if __name__ == "__main__":
    main()
