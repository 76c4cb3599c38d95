"""Vocabulary and tokenizer for temporal interaction sequences.

The corpus is whitespace-separated node ids plus a small closed set of
special tokens, so a full subword tokenizer stack is unnecessary: this is a
pure-Python/NumPy word-level tokenizer with the exact token-id layout the
reference produces (verified against the committed
tokenizers/UCI_13/12/tokenizer.json of the reference repo):

    ids [0, V)            node-id tokens, sorted numerically
    V                     <|endoftext|>   (bos == eos)
    V+1 .. V+4            <|history|> <|endofhistory|> <|pre|> <|endofpre|>
    V+5 .. V+5+T          <|time0|> .. <|timeT|>
    V+6+T                 [PAD]
    V+7+T                 [MASK]          (retriever/generator stages only)

(reference: main_SimpleDyG.py:70-106, utils/tokenizer.py:28-55).

An optional C++ fast path (rag4dyg_tpu.utils.native) accelerates bulk corpus
encoding; this module is the always-available reference implementation.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

SPECIAL_BOS = "<|endoftext|>"  # bos == eos in this corpus format
SPECIAL_HIS = "<|history|>"
SPECIAL_EHIS = "<|endofhistory|>"
SPECIAL_PRE = "<|pre|>"
SPECIAL_EPRE = "<|endofpre|>"
SPECIAL_PAD = "[PAD]"
SPECIAL_MASK = "[MASK]"


def time_tokens(timestep: int) -> List[str]:
    return [f"<|time{i}|>" for i in range(timestep + 1)]


def build_vocab(node_ids: Iterable[int]) -> Dict[str, int]:
    """Node-id vocabulary: sorted unique ids -> contiguous indices.

    (reference: csv2resources.py:211-231)
    """
    ids = sorted(set(int(i) for i in node_ids))
    return {str(i): idx for idx, i in enumerate(ids)}


class Tokenizer:
    """Word-level tokenizer over node ids + special tokens.

    ``encode`` left-truncates to ``max_len`` when given (the reference uses
    truncation_side='left' with block_size 512 for training batches and a
    manual last-1000 cut at eval time — utils/tokenizer.py:41-43,
    utils/Evaluation_SimpleDyG.py:115-117).
    """

    def __init__(self, node_vocab: Dict[str, int], timestep: int,
                 with_mask_token: bool = True):
        self.node_vocab = dict(node_vocab)
        self.timestep = int(timestep)
        self.num_nodes = len(node_vocab)
        specials = [SPECIAL_BOS, SPECIAL_HIS, SPECIAL_EHIS, SPECIAL_PRE,
                    SPECIAL_EPRE] + time_tokens(timestep) + [SPECIAL_PAD]
        if with_mask_token:
            specials.append(SPECIAL_MASK)
        self.specials = specials
        self._tok2id: Dict[str, int] = dict(self.node_vocab)
        for i, s in enumerate(specials):
            self._tok2id[s] = self.num_nodes + i
        self._id2tok: List[str] = [""] * len(self._tok2id)
        for t, i in self._tok2id.items():
            self._id2tok[i] = t
        self.pad_id = self._tok2id[SPECIAL_PAD]
        self.bos_id = self._tok2id[SPECIAL_BOS]
        self.eos_id = self.bos_id
        self.mask_id = self._tok2id[SPECIAL_MASK] if with_mask_token else None
        self._native = None  # lazily-built C++ bulk encoder (utils/native)
        self.his_id = self._tok2id[SPECIAL_HIS]
        self.ehis_id = self._tok2id[SPECIAL_EHIS]
        self.pre_id = self._tok2id[SPECIAL_PRE]
        self.epre_id = self._tok2id[SPECIAL_EPRE]
        self.time_ids = [self._tok2id[t] for t in time_tokens(timestep)]

    # -- properties matching reference terminology ---------------------------
    @property
    def vocab_size(self) -> int:
        """Node-only vocab size (reference ``tokenizer.vocab_size``)."""
        return self.num_nodes

    def __len__(self) -> int:
        """Total token-table size incl. specials (reference ``len(tokenizer)``)."""
        return len(self._tok2id)

    @property
    def special_tokens(self) -> List[str]:
        """All special-token strings (the eval filter set; reference
        Evaluation_SimpleDyG.py:55)."""
        return list(self.specials)

    # -- encode/decode --------------------------------------------------------
    def token_to_id(self, tok: str) -> int:
        return self._tok2id[tok]

    def id_to_token(self, i: int) -> str:
        return self._id2tok[i]

    def encode(self, text: str, max_len: Optional[int] = None) -> List[int]:
        ids = [self._tok2id[t] for t in text.split()]
        if max_len is not None and len(ids) > max_len:
            ids = ids[-max_len:]  # left truncation
        return ids

    def encode_batch(self, lines: Sequence[str],
                     max_len: Optional[int] = None) -> List[List[int]]:
        if len(lines) >= 512:  # amortize the native-encoder setup
            if self._native is None:
                try:
                    from rag4dyg_tpu.utils.native import NativeEncoder
                    self._native = NativeEncoder(self._id2tok)
                except RuntimeError:
                    self._native = False  # unavailable; Python path
            if self._native:
                try:
                    return self._native.encode_batch(lines, max_len)
                except KeyError:
                    pass  # unknown token: re-raise from the Python path
        return [self.encode(ln, max_len) for ln in lines]

    def decode(self, ids: Iterable[int]) -> str:
        return " ".join(self._id2tok[int(i)] for i in ids)

    # -- persistence ----------------------------------------------------------
    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        meta = {
            "node_vocab": self.node_vocab,
            "timestep": self.timestep,
            "with_mask_token": self.mask_id is not None,
        }
        with open(os.path.join(directory, "tokenizer.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, directory: str) -> "Tokenizer":
        with open(os.path.join(directory, "tokenizer.json")) as f:
            meta = json.load(f)
        return cls(meta["node_vocab"], meta["timestep"], meta["with_mask_token"])

    @classmethod
    def from_vocab_file(cls, vocab_path: str, timestep: int,
                        with_mask_token: bool = True) -> "Tokenizer":
        """Load from a reference-format vocab.json ({node_id_str: index})."""
        with open(vocab_path) as f:
            vocab = json.load(f)
        # sanity: must already be contiguous 0..n-1
        assert sorted(vocab.values()) == list(range(len(vocab)))
        return cls(vocab, timestep, with_mask_token)


def pad_batch(seqs: Sequence[Sequence[int]], pad_id: int,
              length: Optional[int] = None, multiple_of: int = 1) -> np.ndarray:
    """Right-pad a list of id lists into a [B, L] int32 array.

    ``length`` fixes L; otherwise L = max length rounded up to
    ``multiple_of`` (bucketing keeps the number of distinct compiled shapes
    small on TPU).
    """
    max_len = max(len(s) for s in seqs)
    if length is None:
        length = -(-max_len // multiple_of) * multiple_of
    assert max_len <= length, f"sequence length {max_len} exceeds bucket {length}"
    out = np.full((len(seqs), length), pad_id, dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out
