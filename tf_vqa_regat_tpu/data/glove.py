"""GloVe + TF-IDF word-embedding initialization (host-side, one-shot).

Replicates reference dataset.py:363-417 + utils.py:93-112, including the
side effect that matters (SURVEY §3.5): tokenizing the VQA (and optionally
Visual Genome) questions with ``add_word=True`` *extends the dictionary* from
19,901 to 28,333 words before the precomputed sparse TF-IDF matrix
(19901 x 28333) is loaded — the GloVe rows for columns ntoken..ext-1 come from
the extended vocab.

The reference computed document frequencies and co-occurrence pairs and then
discarded them (dataset.py:369-401 vs 403); only the dictionary-extension side
effect is reproduced here.

The sparse @ dense product runs once at init through scipy (host), replacing
tf.sparse.sparse_dense_matmul.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

from tf_vqa_regat_tpu.data.dictionary import Dictionary
from tf_vqa_regat_tpu.data.entries import question_path


def extend_dictionary_from_questions(
    names: Sequence[str],
    dictionary: Dictionary,
    dataroot: str = "./data",
    target: Sequence[str] = ("vqa", "vg"),
) -> None:
    """The add_word pass of tfidf_from_questions (dataset.py:369-401)."""
    if "vqa" in target:
        for name in names:
            assert name in ("train", "val", "test-dev2015", "test2015")
            with open(question_path(dataroot, name)) as fh:
                for q in json.load(fh)["questions"]:
                    dictionary.tokenize(q["question"], True)
    if "vg" in target:
        vg_path = os.path.join(dataroot, "visualGenome", "question_answers.json")
        if os.path.exists(vg_path):
            with open(vg_path) as fh:
                for vg in json.load(fh):
                    for q in vg["qas"]:
                        dictionary.tokenize(q["question"], True)
        else:
            # DELIBERATE deviation: the reference crashes on the missing file
            # (dataset.py:396-398 open with no guard); fixtures and
            # VQA-only data folders run without the 700 MB VG JSON, so skip
            # — but loudly, because a real --tfidf run with precomputed
            # 28,333-column indices then fails in load_tfidf (whose bounds
            # check names this warning) rather than here
            import warnings

            warnings.warn(
                f"tfidf: {vg_path} missing — dictionary NOT extended with "
                "Visual Genome questions (the reference requires it; "
                "fixtures don't ship it)"
            )


def load_tfidf(
    dataroot: str, ntoken: int, ext_ntoken: int
) -> sp.csr_matrix:
    """Precomputed sparse TF-IDF weights (dataset.py:403-406);
    the two .npy blobs are part of the reference data download."""
    inds = np.load(os.path.join(dataroot, "tfidf", "indices.npy"))
    vals = np.load(os.path.join(dataroot, "tfidf", "values.npy"))
    if len(inds) and int(inds[:, 1].max()) >= ext_ntoken:
        raise ValueError(
            f"tfidf indices span column {int(inds[:, 1].max())} but the "
            f"extended dictionary has only {ext_ntoken} words — usually "
            "visualGenome/question_answers.json was missing during the "
            "dictionary-extension pass (see the extend_dictionary warning)"
        )
    return sp.csr_matrix(
        (vals, (inds[:, 0], inds[:, 1])), shape=(ntoken, ext_ntoken)
    )


def create_glove_embedding_init(
    idx2word: Sequence[str], glove_file: str
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Parse a GloVe text file into rows for the given words; missing words
    stay zero (reference utils.py:93-112)."""
    word2emb: Dict[str, np.ndarray] = {}
    with open(glove_file, encoding="utf-8") as fh:
        entries = fh.readlines()
    emb_dim = len(entries[0].split(" ")) - 1
    weights = np.zeros((len(idx2word), emb_dim), np.float32)
    for entry in entries:
        vals = entry.split(" ")
        word2emb[vals[0]] = np.asarray(list(map(float, vals[1:])))
    for idx, word in enumerate(idx2word):
        if word in word2emb:
            weights[idx] = word2emb[word]
    return weights, word2emb


def tfidf_from_questions(
    names: Sequence[str],
    dictionary: Dictionary,
    dataroot: str = "./data",
    target: Sequence[str] = ("vqa", "vg"),
) -> Tuple[sp.csr_matrix, np.ndarray]:
    """Full reference pipeline: extend the dictionary, load the precomputed
    sparse matrix, parse GloVe rows for the extension words. Returns
    (tfidf [N x ext], weights [ext - N, 300])."""
    N = len(dictionary)
    extend_dictionary_from_questions(names, dictionary, dataroot, target)
    tfidf = load_tfidf(dataroot, N, len(dictionary))
    glove_file = os.path.join(dataroot, "glove", "glove.6B.300d.txt")
    weights, _ = create_glove_embedding_init(dictionary.idx2word[N:], glove_file)
    return tfidf, weights
