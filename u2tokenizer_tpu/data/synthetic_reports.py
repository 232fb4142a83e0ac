"""Synthetic AMOS-style radiology reports for content-realistic benchmarks.

Random-weight greedy decoding collapses into short token cycles that flatter
n-gram speculative acceptance (r2 VERDICT weak #2). Real CT findings reports
are template-heavy but case-varied: formulaic normal statements shared across
cases, pathological findings varying in organ/laterality/severity. This
module generates reports with that statistical structure (original template
bank written in the register of AMOS-MM findings — not copied from the
reference's data), and a deterministic word-level tokenizer so the benchmark
can script token streams through the real decode path
(models/speculative.make_spec_generate_fn(forced_content=True)).

Word-level ids approximate BPE for this vocabulary: the templates' words are
common English/radiology terms that BPE encodes as single tokens, so n-gram
repetition statistics carry over.
"""

from __future__ import annotations

import random
from typing import List, Optional

import numpy as np

_NORMALS = [
    "The {organ} is normal in size and shape with homogeneous density.",
    "No abnormal density is seen in the {organ}.",
    "The {organ} shows no focal lesion.",
    "No enlarged lymph nodes are seen in the {region}.",
    "The {organ} is unremarkable.",
    "There is no free fluid in the {region}.",
    "No significant abnormality is detected in the {organ}.",
]

_FINDINGS = [
    "A {size} {density} lesion is seen in the {part} of the {organ}.",
    "Scattered {density} foci are seen in the {part} of the {organ}.",
    "The {organ} is {severity} enlarged.",
    "A small amount of fluid is seen in the {region}.",
    "Multiple {severity} enlarged lymph nodes are seen in the {region}.",
    "There is {severity} wall thickening of the {organ}.",
    "A {size} cystic lesion is noted in the {part} of the {organ}.",
    "Calcification is seen in the {part} of the {organ}.",
]

_OPENINGS = [
    "Both sides of the thorax are symmetrical.",
    "The scan covers the {region} without motion artifact.",
    "The examined {region} is adequately visualized.",
]

_CLOSINGS = [
    "No other abnormality is seen.",
    "The remaining structures are unremarkable.",
    "Follow-up is recommended as clinically indicated.",
]

_ORGANS = ["liver", "spleen", "pancreas", "left kidney", "right kidney",
           "gallbladder", "stomach", "bladder", "prostate", "uterus",
           "esophagus", "duodenum", "left adrenal gland",
           "right adrenal gland", "left lung", "right lung", "heart"]
_REGIONS = ["abdomen", "pelvis", "chest", "mediastinum", "retroperitoneum",
            "pelvic cavity", "abdominal cavity"]
_PARTS = ["upper pole", "lower pole", "body", "head", "tail", "left lobe",
          "right lobe", "lower lobe", "upper lobe", "fundus", "antrum"]
_SIZES = ["small", "tiny", "large", "1.2 cm", "2.3 cm", "0.8 cm", "3.1 cm"]
_DENSITIES = ["low-density", "high-density", "mixed-density", "patchy",
              "point-like", "nodular"]
_SEVERITIES = ["mildly", "moderately", "markedly", "slightly"]


def synthesize_report(rng: random.Random, n_sentences: int = 12) -> str:
    """One findings report: opening + mixed normal/abnormal statements +
    closing; ~70% normal sentences (the template-heavy serving content)."""
    def fill(t):
        return t.format(
            organ=rng.choice(_ORGANS), region=rng.choice(_REGIONS),
            part=rng.choice(_PARTS), size=rng.choice(_SIZES),
            density=rng.choice(_DENSITIES), severity=rng.choice(_SEVERITIES))

    sentences = [fill(rng.choice(_OPENINGS))]
    for _ in range(n_sentences - 2):
        bank = _NORMALS if rng.random() < 0.7 else _FINDINGS
        sentences.append(fill(rng.choice(bank)))
    sentences.append(fill(rng.choice(_CLOSINGS)))
    return " ".join(sentences)


def words_to_ids(text: str, vocab_size: int,
                 reserve_low: int = 16) -> np.ndarray:
    """Deterministic word -> id hash into [reserve_low, vocab_size)."""
    import hashlib

    ids = []
    for word in text.split():
        digest = hashlib.md5(word.encode()).digest()
        val = int.from_bytes(digest[:4], "little")
        ids.append(reserve_low + val % (vocab_size - reserve_low))
    return np.asarray(ids, np.int32)


def report_token_scripts(batch: int, length: int, vocab_size: int,
                         seed: int = 0,
                         corpus_size: Optional[int] = None) -> np.ndarray:
    """(B, length) int32 scripts of synthetic-report tokens, one report
    stream per row (reports concatenated until ``length``). Used by the
    bench's content-controlled speculative measurement and by the
    pred_then_green content protocol."""
    rng = random.Random(seed)
    out = np.zeros((batch, length), np.int32)
    for b in range(batch):
        toks: List[int] = []
        while len(toks) < length:
            toks.extend(words_to_ids(synthesize_report(rng),
                                     vocab_size).tolist())
        out[b] = np.asarray(toks[:length], np.int32)
    return out


def ngram_acceptance_estimate(script: np.ndarray, block_len: int = 8,
                              prompt: Optional[np.ndarray] = None) -> float:
    """Drafter-exact simulation of greedy speculative acceptance over a
    scripted token stream: calls the REAL models/speculative.ngram_draft on
    the same history layout the decode loop maintains (prompt, -1 gap,
    generated tokens), so for a greedy decode whose model emits exactly
    ``script`` this returns the exact mean emitted tokens per verify step —
    the cross-check for the measured forced-content bench number."""
    import jax.numpy as jnp

    from ..models.speculative import ngram_draft

    b, max_new = script.shape
    if prompt is None:
        prompt = np.zeros((b, 8), np.int32)
    plen = prompt.shape[1]
    s = plen  # right-packed prompt: no pad gap
    hist = np.full((b, s + max_new), -1, np.int32)
    hist[:, :s] = prompt
    hist[:, s] = script[:, 0]

    n_emit = np.ones(b, np.int64)
    row_steps = np.zeros(b, np.int64)
    while (n_emit < max_new).any():
        idx_last = s + n_emit - 1
        pending = hist[np.arange(b), idx_last]
        prev = np.where(n_emit >= 2, hist[np.arange(b),
                                          np.maximum(idx_last - 1, 0)],
                        hist[:, plen - 1])
        prev2_idx = np.where(n_emit >= 3, idx_last - 2,
                             np.where(n_emit == 2, plen - 1, plen - 2))
        prev2 = hist[np.arange(b), np.clip(prev2_idx, 0, None)]
        drafts = np.asarray(ngram_draft(
            jnp.asarray(hist), jnp.asarray(idx_last, jnp.int32),
            jnp.asarray(prev, jnp.int32), jnp.asarray(pending, jnp.int32),
            block_len - 1, c00=jnp.asarray(prev2, jnp.int32)))
        for row in range(b):
            if n_emit[row] >= max_new:
                continue
            emitted = 1
            for j in range(block_len - 1):
                tgt = int(n_emit[row]) + j
                if tgt < max_new and drafts[row, j] == script[row, tgt]:
                    emitted += 1
                else:
                    break
            emitted = min(emitted, max_new - int(n_emit[row]))
            for j in range(emitted):
                hist[row, s + int(n_emit[row]) + j] = \
                    script[row, int(n_emit[row]) + j]
            n_emit[row] += emitted
            row_steps[row] += 1
    # per-row mean emitted tokens per verify step (a finished row stops
    # consuming steps; the batched loop's global step count is the max)
    return float(np.mean((max_new - 1) / np.maximum(row_steps, 1)))
