"""Torch-format checkpoint interop: round-trip exactness, and logits
parity between our flax GPT-2 and the reference's vendored torch GPT-2
loaded from an exported checkpoint (reference: models/modeling_gpt2.py,
models/modeling_utils.py:300; export used by utils/model.py:71-78)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rag4dyg_tpu.config import ModelConfig
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.utils.checkpoint import save_checkpoint
from rag4dyg_tpu.utils.export_torch import (
    export_reference_checkpoint,
    import_reference_checkpoint,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

REFRUN_STUBS = "/root/repo/refrun/stubs"
REFERENCE = "/root/reference"


def _small_config():
    return ModelConfig(vocab_size=97, n_layer=2, n_head=2, n_embd=32,
                       n_positions=64)


def _leaves(tree, prefix=""):
    for k, v in sorted(tree.items()):
        if isinstance(v, dict):
            yield from _leaves(v, prefix + k + "/")
        else:
            yield prefix + k, np.asarray(v)


def test_round_trip_bit_equal():
    import jax

    cfg = _small_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    sd = params_to_torch_state_dict(params, cfg.n_layer, n_ctx=64)
    back = torch_state_dict_to_params(sd, cfg.n_layer)
    a = dict(_leaves(params))
    b = dict(_leaves(back))
    assert set(a) == set(b)
    for k in a:
        assert np.array_equal(a[k], b[k]), k


def test_reference_model_logits_parity(tmp_path):
    """Export a randomly-initialized backbone and check the reference's
    GPT2LMHeadModel produces the same logits as our flax forward."""
    import jax
    import jax.numpy as jnp

    cfg = _small_config()
    params = init_params(cfg, jax.random.PRNGKey(1))
    ours_dir = tmp_path / "ours"
    save_checkpoint(str(ours_dir), params, config=cfg)
    ref_dir = export_reference_checkpoint(str(ours_dir), str(tmp_path / "ref"),
                                          n_ctx=64)

    # import-parity too: torch dir -> our params, bit-equal to source
    re_params, re_cfg = import_reference_checkpoint(ref_dir)
    assert re_cfg.n_layer == cfg.n_layer and re_cfg.vocab_size == cfg.vocab_size
    for (k, a), (_, b) in zip(_leaves(params), _leaves(re_params)):
        assert np.array_equal(np.asarray(a), b), k

    for p in (REFRUN_STUBS, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    from models import GPT2LMHeadModel  # the reference's vendored class

    ref_model = GPT2LMHeadModel.from_pretrained(ref_dir)
    ref_model.eval()

    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, (3, 17)).astype(np.int64)
    with torch.no_grad():
        ref_logits = ref_model(input_ids=torch.from_numpy(ids))[0].numpy()

    model = GPT2LMModel(cfg)
    ours_logits, _, _ = model.apply({"params": params},
                                    jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours_logits), ref_logits,
                               atol=2e-4, rtol=1e-4)


def test_import_generator_heads(tmp_path):
    """A reference generator checkpoint (broken-tie untied lm_head +
    gnn_fusion GCNConv — main_generator.py save path) imports with both
    heads mapped into our tree, bit-equal and correctly oriented."""
    import jax
    import json

    cfg = _small_config()
    params = init_params(cfg, jax.random.PRNGKey(2))
    sd = params_to_torch_state_dict(params, cfg.n_layer, n_ctx=64)
    rng = np.random.RandomState(3)
    head = rng.randn(cfg.vocab_size, cfg.n_embd).astype(np.float32)
    kern = rng.randn(cfg.n_embd, cfg.n_embd).astype(np.float32)
    bias = rng.randn(cfg.n_embd).astype(np.float32)
    sd["lm_head.weight"] = torch.from_numpy(head)
    sd["gnn_fusion.convs.0.weight"] = torch.from_numpy(kern)
    sd["gnn_fusion.convs.0.bias"] = torch.from_numpy(bias)

    ref_dir = tmp_path / "refgen"
    ref_dir.mkdir()
    torch.save(sd, str(ref_dir / "pytorch_model.bin"))
    (ref_dir / "config.json").write_text(json.dumps(
        {"vocab_size": cfg.vocab_size, "n_layer": cfg.n_layer,
         "n_head": cfg.n_head, "n_embd": cfg.n_embd, "n_positions": 64}))

    tree, re_cfg = import_reference_checkpoint(str(ref_dir))
    assert re_cfg.untied_lm_head
    assert np.array_equal(tree["lm_head"], head)
    assert np.array_equal(tree["fusion"]["kernel"], kern)
    assert np.array_equal(tree["fusion"]["bias"], bias)

    # tied checkpoint (lm_head is the wte tensor) imports with no lm_head
    sd2 = params_to_torch_state_dict(params, cfg.n_layer, n_ctx=64)
    tied_dir = tmp_path / "reftied"
    tied_dir.mkdir()
    torch.save(sd2, str(tied_dir / "pytorch_model.bin"))
    (tied_dir / "config.json").write_text(
        (ref_dir / "config.json").read_text())
    tree2, cfg2 = import_reference_checkpoint(str(tied_dir))
    assert "lm_head" not in tree2 and not cfg2.untied_lm_head

    # two stacked layers map to kernel_0/kernel_1
    sd["gnn_fusion.convs.1.weight"] = torch.from_numpy(kern.T.copy())
    sd["gnn_fusion.convs.1.bias"] = torch.from_numpy(bias * 2)
    torch.save(sd, str(ref_dir / "pytorch_model.bin"))
    tree3, _ = import_reference_checkpoint(str(ref_dir))
    assert np.array_equal(tree3["fusion"]["kernel_0"], kern)
    assert np.array_equal(tree3["fusion"]["kernel_1"], kern.T)
    assert np.array_equal(tree3["fusion"]["bias_1"], bias * 2)


def test_import_fusion_orientation_and_ordering(tmp_path):
    """Importer handles the REAL reference module layouts, not just the
    refrun stub: torch.nn.Linear / PyG>=2 weights stored [out, in] are
    transposed to our x@W [in, out] kernels (detected by chaining the
    stack from the known input dim), >=10 layers order numerically
    (convs.10 after convs.2), and PyG>=2 ``convs.N.lin.weight`` keys
    find their conv-level bias."""
    import jax
    import json

    def save_ckpt(name, extra):
        cfg = _small_config()
        params = init_params(cfg, jax.random.PRNGKey(4))
        sd = params_to_torch_state_dict(params, cfg.n_layer, n_ctx=64)
        for k, v in extra.items():
            sd[k] = torch.from_numpy(v)
        d = tmp_path / name
        d.mkdir()
        torch.save(sd, str(d / "pytorch_model.bin"))
        (d / "config.json").write_text(json.dumps(
            {"vocab_size": cfg.vocab_size, "n_layer": cfg.n_layer,
             "n_head": cfg.n_head, "n_embd": cfg.n_embd,
             "n_positions": 64}))
        return str(d)

    rng = np.random.RandomState(7)

    # (a) nn.Linear-style MLP fusion: weights [out, in], 512 -> 64 -> 3
    w0 = rng.randn(64, 512).astype(np.float32)   # torch Linear [out, in]
    w1 = rng.randn(3, 64).astype(np.float32)
    b0 = rng.randn(64).astype(np.float32)
    b1 = rng.randn(3).astype(np.float32)
    d = save_ckpt("linear_mlp", {
        "mlp_fusion.linears.0.weight": w0, "mlp_fusion.linears.0.bias": b0,
        "mlp_fusion.linears.1.weight": w1, "mlp_fusion.linears.1.bias": b1})
    tree, _ = import_reference_checkpoint(d)
    assert np.array_equal(tree["fusion"]["kernel_0"], w0.T)
    assert np.array_equal(tree["fusion"]["kernel_1"], w1.T)
    assert np.array_equal(tree["fusion"]["bias_0"], b0)

    # (b) 11-layer stack orders numerically: lexicographic order would
    # put layer 10 between 1 and 2 and break the dim chain. Weights in
    # the real nn.Linear [out, in] layout.
    dims = [512] + [8 + i for i in range(11)]
    extra = {}
    ws = []
    for i in range(11):
        w = rng.randn(dims[i + 1], dims[i]).astype(np.float32)
        ws.append(w)
        extra[f"mlp_fusion.linears.{i}.weight"] = w
        extra[f"mlp_fusion.linears.{i}.bias"] = (
            rng.randn(dims[i + 1]).astype(np.float32))
    d = save_ckpt("deep_mlp", extra)
    tree, _ = import_reference_checkpoint(d)
    for i, w in enumerate(ws):
        assert np.array_equal(tree["fusion"][f"kernel_{i}"], w.T), i

    # (c) PyG>=2 GCNConv: convs.N.lin.weight [out, in], bias at convs.N;
    # first layer n_embd -> n_embd//2 is non-square -> orientation detected
    cfg = _small_config()
    g0 = rng.randn(cfg.n_embd // 2, cfg.n_embd).astype(np.float32)
    g1 = rng.randn(cfg.n_embd, cfg.n_embd // 2).astype(np.float32)
    gb0 = rng.randn(cfg.n_embd // 2).astype(np.float32)
    gb1 = rng.randn(cfg.n_embd).astype(np.float32)
    d = save_ckpt("pyg2_gnn", {
        "gnn_fusion.convs.0.lin.weight": g0, "gnn_fusion.convs.0.bias": gb0,
        "gnn_fusion.convs.1.lin.weight": g1, "gnn_fusion.convs.1.bias": gb1})
    tree, _ = import_reference_checkpoint(d)
    assert np.array_equal(tree["fusion"]["kernel_0"], g0.T)
    assert np.array_equal(tree["fusion"]["kernel_1"], g1.T)
    assert np.array_equal(tree["fusion"]["bias_0"], gb0)
    assert np.array_equal(tree["fusion"]["bias_1"], gb1)

    # (d) ADVICE round-2 regression: the DEFAULT shipped graphpooling
    # config (gnn_layers=1 — main_generator.py:83-84) builds a single
    # SQUARE GCNConv(n_embd, n_embd). A PyG>=2 checkpoint stores it as
    # convs.0.lin.weight [out, in]; shape-chaining alone cannot
    # disambiguate a square kernel, so the importer must transpose it
    # by key name, not take it as-is.
    gsq = rng.randn(cfg.n_embd, cfg.n_embd).astype(np.float32)
    gsqb = rng.randn(cfg.n_embd).astype(np.float32)
    d = save_ckpt("pyg2_square_1layer", {
        "gnn_fusion.convs.0.lin.weight": gsq,
        "gnn_fusion.convs.0.bias": gsqb})
    tree, _ = import_reference_checkpoint(d)
    assert np.array_equal(tree["fusion"]["kernel"], gsq.T)
    assert np.array_equal(tree["fusion"]["bias"], gsqb)
