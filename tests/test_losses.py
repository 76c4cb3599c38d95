"""Loss parity against direct torch transliterations of the reference
formulas (torch is CPU-only in this image and used here as a test oracle
only — the framework itself never imports it)."""

import numpy as np
import pytest

from rag4dyg_tpu.train.losses import cltime_loss, info_nce_loss, shift_ce_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _ref_cltime(anchors, positives, hard_negatives, at, pt, nt, temperature,
                decay_rate):
    """reference: train/train_retriever.py:40-72"""
    anchors, positives, hard_negatives = map(torch.as_tensor,
                                             (anchors, positives, hard_negatives))
    at, pt, nt = map(torch.as_tensor, (at, pt, nt))
    B = anchors.size(0)
    z = torch.cat([anchors, positives, hard_negatives], dim=0)
    sim = F.cosine_similarity(z.unsqueeze(1), z.unsqueeze(0), dim=2)
    d_pos = torch.exp(-decay_rate * torch.abs(at.unsqueeze(1) - pt))
    pos = sim[:B, B:2 * B] * d_pos
    d_neg = torch.exp(-decay_rate * torch.abs(at.unsqueeze(1) - at))
    d_neg.fill_diagonal_(0)
    neg = sim[:B, :B] * d_neg
    d_h = torch.exp(-decay_rate * torch.abs(at.unsqueeze(1) - nt))
    hneg = sim[:B, 2 * B:] * d_h
    logits = torch.cat([pos, neg, hneg], dim=1) / temperature
    return float(F.cross_entropy(logits, torch.arange(B)))


def _ref_info_nce(z_i, z_j, temp):
    """reference: train/train_retriever.py:74-98"""
    z_i, z_j = torch.as_tensor(z_i), torch.as_tensor(z_j)
    B = z_i.size(0)
    N = 2 * B
    mask = torch.ones((N, N), dtype=bool)
    mask.fill_diagonal_(0)
    for i in range(B):
        mask[i, B + i] = 0
        mask[B + i, i] = 0
    z = torch.cat([z_i, z_j], dim=0)
    sim = torch.mm(z, z.T) / temp
    pos = torch.cat([torch.diag(sim, B), torch.diag(sim, -B)]).reshape(N, 1)
    neg = sim[mask].reshape(N, -1)
    logits = torch.cat([pos, neg], dim=1)
    return float(F.cross_entropy(logits, torch.zeros(N).long()))


def test_cltime_parity():
    rng = np.random.RandomState(0)
    B, D = 8, 16
    a, p, n = (rng.randn(B, D).astype(np.float32) for _ in range(3))
    at, pt, nt = (rng.rand(B).astype(np.float32) * 10 for _ in range(3))
    ours = float(cltime_loss(a, p, n, at, pt, nt, temperature=0.1,
                             decay_rate=0.5))
    ref = _ref_cltime(a, p, n, at, pt, nt, 0.1, 0.5)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_info_nce_parity():
    rng = np.random.RandomState(1)
    B, D = 6, 12
    zi = rng.randn(B, D).astype(np.float32)
    zj = rng.randn(B, D).astype(np.float32)
    ours = float(info_nce_loss(zi, zj, temperature=0.1))
    ref = _ref_info_nce(zi, zj, 0.1)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_shift_ce_parity():
    rng = np.random.RandomState(2)
    B, L, V = 3, 7, 11
    logits = rng.randn(B, L, V).astype(np.float32)
    labels = rng.randint(0, V, (B, L))
    ours = float(shift_ce_loss(logits, labels))
    ref = float(F.cross_entropy(
        torch.as_tensor(logits[:, :-1]).reshape(-1, V),
        torch.as_tensor(labels[:, 1:]).reshape(-1)))
    assert abs(ours - ref) < 1e-5

    # ignore_index semantics (generator label splice)
    labels2 = labels.copy()
    labels2[:, 2:4] = -100
    ours2 = float(shift_ce_loss(logits, labels2))
    ref2 = float(F.cross_entropy(
        torch.as_tensor(logits[:, :-1]).reshape(-1, V),
        torch.as_tensor(labels2[:, 1:]).reshape(-1), ignore_index=-100))
    assert abs(ours2 - ref2) < 1e-5


def test_augment_semantics():
    import jax

    from rag4dyg_tpu.models.augment import augment_views

    rng = np.random.RandomState(3)
    B, L = 4, 32
    seqs = rng.randint(1, 50, (B, L)).astype(np.int32)
    mask_token = 99
    crop, mask = augment_views(jax.numpy.asarray(seqs),
                               jax.random.PRNGKey(0), eta=0.5, gamma=0.25,
                               mask_token=mask_token)
    crop, mask = np.asarray(crop), np.asarray(mask)
    lengths = (seqs != 0).sum(1)
    for b in range(B):
        num_left = int(np.floor(lengths[b] * 0.5))
        # crop: zeros outside the kept tail window
        assert (crop[b, : L - num_left] == 0).all()
        kept = crop[b, L - num_left:]
        # kept window is a contiguous slice of the original ending >=4 from the end
        found = any((seqs[b, L - cb - num_left: L - cb] == kept).all()
                    for cb in range(4, int(lengths[b] - num_left) + 1))
        assert found
        # mask: exactly floor(len*gamma) masked, all within last `length` slots
        num_mask = int(np.floor(lengths[b] * 0.25))
        pos = np.where(mask[b] == mask_token)[0]
        assert len(pos) == num_mask
        assert (pos >= L - lengths[b]).all()
        untouched = np.setdiff1d(np.arange(L), pos)
        assert (mask[b, untouched] == seqs[b, untouched]).all()
