"""CBOW word2vec for hepth abstract features — replaces the reference's
gensim dependency.

The reference trains node features for hepth with
``gensim.models.Word2Vec(sentences, vector_size=172, window=5,
min_count=1, sg=0)`` over the raw hep-th ``.abs`` corpus
(reference: all_data/hepth/pre/train_word2vec.py:1-49) and mean-pools the
word vectors of each abstract into a per-paper feature
(train_word2vec.py:40-44), which preprocess.py packs into
``node_features.npy`` (all_data/hepth/pre/preprocess.py:215-227).

gensim is not available here, so this module implements the same model —
CBOW (sg=0) with negative sampling, mean-combined context (cbow_mean=1),
frequency subsampling, shrinking effective windows, unigram^0.75 negative
distribution, and a linearly decaying learning rate — as a jit-compiled
JAX training loop. Epoch example streams (subsampling draws, window
shrinks, shuffling) are built host-side with a seeded numpy RNG; the SGD
itself runs on device as one ``lax.scan`` over fixed-shape minibatches.

Deliberate divergences from gensim (documented, no oracle possible since
gensim is absent from the image):
- minibatched SGD (gradient accumulation within a batch) instead of
  gensim's strictly sequential per-example updates;
- a regex word tokenizer approximating ``nltk.word_tokenize`` (nltk's
  punkt data is not downloadable in this environment);
- deterministic seeded RNG instead of gensim's hash-based seeding;
- the lr decay fraction uses examples seen over an epochs x |epoch 0|
  estimate (gensim decays over a corpus-word estimate).

Negative draws equal to the center word contribute nothing (masked),
matching word2vec.c/gensim's skip of ``target == center`` samples.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

_WORD_RE = re.compile(r"\w+|[^\w\s]")


def tokenize(text: str) -> List[str]:
    """Lowercased word/punctuation split (approximates
    ``nltk.word_tokenize(doc.lower())`` at train_word2vec.py:36)."""
    return _WORD_RE.findall(text.lower())


def read_abs_files(directory: str) -> Tuple[List[str], List[str]]:
    """Parse the hep-th ``.abs`` corpus layout exactly as the reference
    does (train_word2vec.py:15-33): abstract = text after the last
    ``\\\\`` separator pair, paper id = tail of the ``Paper:`` line."""
    documents, paper_ids = [], []
    for root, _dirs, files in sorted(os.walk(directory)):
        for file_name in sorted(files):
            if not file_name.endswith(".abs"):
                continue
            with open(os.path.join(root, file_name)) as fh:
                content = fh.read()
            parts = content.split("\\\\")
            if len(parts) < 3:
                continue
            documents.append(parts[-2])
            paper_ids.append(parts[1].split("\n")[1].split("/")[-1])
    return documents, paper_ids


@dataclasses.dataclass(frozen=True)
class Word2VecParams:
    """gensim ``Word2Vec`` defaults for the flags the reference leaves
    unset, plus its explicit vector_size/window/min_count/sg choices."""
    dim: int = 172
    window: int = 5
    min_count: int = 1
    negative: int = 5
    ns_exponent: float = 0.75
    sample: float = 1e-3
    epochs: int = 5
    alpha: float = 0.025
    min_alpha: float = 1e-4
    batch: int = 512
    seed: int = 1


def build_vocab(docs: Sequence[Sequence[str]],
                min_count: int = 1) -> Tuple[List[str], np.ndarray,
                                             Dict[str, int]]:
    """Frequency-sorted vocab (gensim orders ids by descending count)."""
    counts: Dict[str, int] = {}
    for doc in docs:
        for w in doc:
            counts[w] = counts.get(w, 0) + 1
    items = [(w, c) for w, c in counts.items() if c >= min_count]
    items.sort(key=lambda wc: (-wc[1], wc[0]))
    words = [w for w, _ in items]
    freq = np.array([c for _, c in items], dtype=np.int64)
    return words, freq, {w: i for i, w in enumerate(words)}


def _keep_probs(freq: np.ndarray, sample: float) -> np.ndarray:
    """gensim's subsampling keep-probability:
    (sqrt(f/t) + 1) * t/f for word frequency fraction f, threshold t."""
    if sample <= 0:
        return np.ones_like(freq, dtype=np.float64)
    frac = freq / freq.sum()
    p = (np.sqrt(frac / sample) + 1.0) * (sample / frac)
    return np.minimum(p, 1.0)


def build_epoch_examples(doc_ids: Sequence[np.ndarray], freq: np.ndarray,
                         params: Word2VecParams,
                         rng: np.random.Generator
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """One epoch of (context-window, center) examples.

    Mirrors gensim's stream: subsampled words are removed from the
    sentence *before* windowing; each surviving position draws an
    effective window b ~ uniform{1..window}; centers with an empty
    context are skipped. Returns ``ctx`` (N, 2*window) int32 padded with
    -1 and ``centers`` (N,) int32, shuffled.
    """
    keep = _keep_probs(freq, params.sample)
    ctx_rows, centers = [], []
    w = params.window
    for ids in doc_ids:
        if ids.size == 0:
            continue
        kept = ids[rng.random(ids.size) < keep[ids]]
        n = kept.size
        if n < 2:
            continue
        bs = rng.integers(1, w + 1, size=n)
        for i in range(n):
            b = bs[i]
            ctx = np.concatenate([kept[max(0, i - b):i], kept[i + 1:i + b + 1]])
            if ctx.size == 0:
                continue
            row = np.full(2 * w, -1, dtype=np.int32)
            row[:ctx.size] = ctx
            ctx_rows.append(row)
            centers.append(kept[i])
    if not ctx_rows:
        return (np.zeros((0, 2 * w), np.int32), np.zeros((0,), np.int32))
    ctx_arr = np.stack(ctx_rows)
    cen_arr = np.asarray(centers, dtype=np.int32)
    perm = rng.permutation(len(cen_arr))
    return ctx_arr[perm], cen_arr[perm]


def train_cbow(docs: Sequence[Sequence[str]],
               params: Word2VecParams = Word2VecParams()
               ) -> Tuple[np.ndarray, Dict[str, int]]:
    """Train CBOW-negative-sampling embeddings; returns (V, dim) input
    vectors and the word→id map. All SGD runs inside one jitted
    ``lax.scan`` per epoch (device-resident parameters, fixed shapes)."""
    import jax
    import jax.numpy as jnp

    words, freq, word_to_id = build_vocab(docs, params.min_count)
    vocab = len(words)
    if vocab == 0:
        raise ValueError("empty vocabulary")
    doc_ids = [np.array([word_to_id[w] for w in doc if w in word_to_id],
                        dtype=np.int32) for doc in docs]

    rng = np.random.default_rng(params.seed)
    # gensim inits W_in ~ U(-0.5/dim, 0.5/dim), W_out = 0.
    w_in = ((rng.random((vocab, params.dim)) - 0.5) / params.dim
            ).astype(np.float32)
    w_out = np.zeros((vocab, params.dim), dtype=np.float32)

    noise_logits = jnp.asarray(
        params.ns_exponent * np.log(freq.astype(np.float64)),
        dtype=jnp.float32)

    # epoch streams are built lazily (one resident at a time); the lr
    # decay horizon is estimated from epoch 0's size
    first = build_epoch_examples(doc_ids, freq, params, rng)
    if len(first[1]) == 0:
        raise ValueError("no training examples (corpus too small?)")
    total = params.epochs * len(first[1])

    batch = params.batch
    neg = params.negative

    def step(carry, inputs):
        W_in, W_out, key, seen = carry
        ctx, cen, nvalid = inputs  # (B, 2w) int32, (B,) int32, () f32
        key, sub = jax.random.split(key)
        frac = jnp.minimum(seen / total, 1.0)
        lr = params.alpha + (params.min_alpha - params.alpha) * frac

        mask = (ctx >= 0).astype(jnp.float32)            # (B, 2w)
        ctx_safe = jnp.maximum(ctx, 0)
        nctx = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
        h = (W_in[ctx_safe] * mask[..., None]).sum(1) / nctx   # (B, d)

        negs = jax.random.categorical(sub, noise_logits,
                                      shape=(cen.shape[0], neg))
        targets = jnp.concatenate([cen[:, None], negs], axis=1)  # (B, 1+neg)
        labels = jnp.concatenate(
            [jnp.ones_like(cen[:, None], jnp.float32),
             jnp.zeros_like(negs, jnp.float32)], axis=1)

        out_vecs = W_out[targets]                          # (B, 1+neg, d)
        scores = jnp.einsum("bd,bkd->bk", h, out_vecs)
        # valid-row mask: padded tail examples must not update anything;
        # negatives that drew the center word are skipped (word2vec.c)
        row_ok = (jnp.arange(cen.shape[0]) < nvalid)[:, None].astype(
            jnp.float32)
        not_center = jnp.concatenate(
            [jnp.ones_like(cen[:, None], jnp.float32),
             (negs != cen[:, None]).astype(jnp.float32)], axis=1)
        g = (jax.nn.sigmoid(scores) - labels) * lr * row_ok * not_center

        dW_out = g[..., None] * h[:, None, :]              # (B, 1+neg, d)
        W_out = W_out.at[targets.reshape(-1)].add(
            -dW_out.reshape(-1, params.dim))
        dh = jnp.einsum("bk,bkd->bd", g, out_vecs)         # (B, d)
        dctx = (dh / nctx)[:, None, :] * mask[..., None]   # (B, 2w, d)
        W_in = W_in.at[ctx_safe.reshape(-1)].add(
            -dctx.reshape(-1, params.dim))
        seen = seen + nvalid
        return (W_in, W_out, key, seen), ()

    @jax.jit
    def run_epoch(W_in, W_out, key, seen, ctx, cen, nvalid):
        (W_in, W_out, key, seen), _ = jax.lax.scan(
            step, (W_in, W_out, key, seen), (ctx, cen, nvalid))
        return W_in, W_out, key, seen

    W_in = jnp.asarray(w_in)
    W_out = jnp.asarray(w_out)
    key = jax.random.PRNGKey(params.seed)
    seen = jnp.float32(0.0)
    # fixed chunk of nb batches -> ONE compile; epochs stream through it
    # in chunks, padding the tail with masked no-op rows
    nb = -(-len(first[1]) // batch)
    for e in range(params.epochs):
        ctx_arr, cen_arr = (first if e == 0 else
                            build_epoch_examples(doc_ids, freq, params, rng))
        n = len(cen_arr)
        w2 = 2 * params.window
        for c0 in range(0, max(n, 1), nb * batch):
            chunk_n = min(nb * batch, n - c0)
            if chunk_n <= 0:
                break
            pad = nb * batch - chunk_n
            ctx_p = np.concatenate(
                [ctx_arr[c0:c0 + chunk_n],
                 np.full((pad, w2), -1, np.int32)])
            cen_p = np.concatenate([cen_arr[c0:c0 + chunk_n],
                                    np.zeros(pad, np.int32)])
            nvalid = np.minimum(
                np.maximum(chunk_n - np.arange(nb) * batch, 0), batch
            ).astype(np.float32)
            W_in, W_out, key, seen = run_epoch(
                W_in, W_out, key, seen,
                ctx_p.reshape(nb, batch, -1), cen_p.reshape(nb, batch),
                nvalid)
    return np.asarray(W_in), word_to_id


def document_features(docs: Sequence[Sequence[str]], vectors: np.ndarray,
                      word_to_id: Dict[str, int]) -> np.ndarray:
    """Mean word vector per document (train_word2vec.py:40-44); documents
    with no in-vocab words get zeros."""
    dim = vectors.shape[1]
    out = np.zeros((len(docs), dim), dtype=np.float32)
    for i, doc in enumerate(docs):
        ids = [word_to_id[w] for w in doc if w in word_to_id]
        if ids:
            out[i] = vectors[np.asarray(ids)].mean(0)
    return out


def abs_corpus_features(directory: str,
                        params: Word2VecParams = Word2VecParams()
                        ) -> Dict[str, np.ndarray]:
    """End-to-end replacement for train_word2vec.py: .abs corpus →
    {paper_id: feature vector} (the ``document_features.pkl`` payload)."""
    documents, paper_ids = read_abs_files(directory)
    toks = [tokenize(d) for d in documents]
    vectors, word_to_id = train_cbow(toks, params)
    feats = document_features(toks, vectors, word_to_id)
    return {pid: feats[i] for i, pid in enumerate(paper_ids)}
