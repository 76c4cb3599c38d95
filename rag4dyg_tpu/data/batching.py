"""Host-side batching: shuffled, padded, bucketed id batches.

The reference pads each batch to its own max length
(torch pad_sequence; reference: dataloader/SimpleDyG.py:38-41). On TPU a
fresh shape per batch would mean a fresh XLA compile per batch, so batches
are padded to the bucket (max length rounded up to ``bucket`` — a handful of
distinct compiled programs). The reference computes loss over pad positions
(labels == inputs, no mask); with bucketing the pad tail is slightly longer,
which only adds more of the same PAD->PAD supervision.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np

from rag4dyg_tpu.data.vocab import pad_batch


def iterate_batches(examples: Sequence[Sequence[int]], batch_size: int,
                    pad_id: int, *, shuffle: bool = True,
                    drop_last: bool = True, bucket: int = 64,
                    rng: Optional[np.random.RandomState] = None,
                    extra: Optional[Sequence[np.ndarray]] = None
                    ) -> Iterator:
    """Yield padded [B, L] int32 batches (and aligned rows of ``extra``
    arrays, if given)."""
    n = len(examples)
    order = np.arange(n)
    if shuffle:
        (rng or np.random).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start:start + batch_size]
        batch = pad_batch([examples[i] for i in idx], pad_id,
                          multiple_of=bucket)
        if extra is None:
            yield batch
        else:
            yield (batch, *[np.asarray(e)[idx] for e in extra], idx)


def length_bucketed(seqs: Sequence[Sequence[int]], bucket: int) -> List[int]:
    """Bucketed padded length per sequence."""
    return [-(-max(1, len(s)) // bucket) * bucket for s in seqs]
