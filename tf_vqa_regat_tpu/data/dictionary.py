"""Question vocabulary with the reference's exact tokenizer string ops.

Accuracy-critical (SURVEY §7 "hard parts"): tokenize lowercases, strips commas
and question marks, splits possessive ``'s`` into a separate token, and maps
OOV words to ``padding_idx - 1`` (the least frequent word, "bebe", used as UNK
— reference dataset.py:63-77). ``padding_idx == ntoken`` (dataset.py:56-60).

The pickle format ([word2idx, idx2word]) is interchangeable with the
reference's ``glove/dictionary.pkl``.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional


class Dictionary:
    def __init__(
        self,
        word2idx: Optional[Dict[str, int]] = None,
        idx2word: Optional[List[str]] = None,
    ):
        self.word2idx = word2idx if word2idx is not None else {}
        self.idx2word = idx2word if idx2word is not None else []

    @property
    def ntoken(self) -> int:
        return len(self.word2idx)

    @property
    def padding_idx(self) -> int:
        return len(self.word2idx)

    def tokenize(self, sentence: str, add_word: bool) -> List[int]:
        sentence = sentence.lower()
        sentence = sentence.replace(",", "").replace("?", "").replace("'s", " 's")
        words = sentence.split()
        if add_word:
            return [self.add_word(w) for w in words]
        # OOV -> padding_idx - 1 ("bebe" UNK, dataset.py:74-77)
        return [self.word2idx.get(w, self.padding_idx - 1) for w in words]

    def add_word(self, word: str) -> int:
        if word not in self.word2idx:
            self.idx2word.append(word)
            self.word2idx[word] = len(self.idx2word) - 1
        return self.word2idx[word]

    def dump_to_file(self, path: str) -> None:
        with open(path, "wb") as fh:
            pickle.dump([self.word2idx, self.idx2word], fh)

    @classmethod
    def load_from_file(cls, path: str) -> "Dictionary":
        with open(path, "rb") as fh:
            word2idx, idx2word = pickle.load(fh)
        return cls(word2idx, idx2word)

    def __len__(self) -> int:
        return len(self.idx2word)


def encode_question(
    dictionary: Dictionary, question: str, max_length: int = 14
) -> List[int]:
    """Tokenize + clip to 14 + pad the *back* with padding_idx
    (reference dataset.py:250-264)."""
    tokens = dictionary.tokenize(question, False)[:max_length]
    if len(tokens) < max_length:
        tokens = tokens + [dictionary.padding_idx] * (max_length - len(tokens))
    return tokens
