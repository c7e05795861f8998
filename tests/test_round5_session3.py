"""Round-5 session-3 additions: scrub kernel memoization equivalence and
the Ukkonen-cutoff banded DP (long strings exercise the every-32-rows
dead-pair compaction that short-pair tests never reach)."""

import random

import numpy as np
import pyarrow as pa

from pdf_watermark_remover_ray.config import ScrubConfig
from pdf_watermark_remover_ray.functions.scrub import (
    make_scrub_batch_fn, oracle_scrub_rows)
from pdf_watermark_remover_ray.pipelines.dedup import (
    _levenshtein, _levenshtein_band)


def test_levenshtein_band_cutoff_long_strings():
    """Long mixed near-dup/unrelated pairs with tight relative caps: the
    row-min cutoff + compaction path must stay exact under the cap and
    strictly above it for rejects, and uncapped mode stays exact."""
    rng = random.Random(7)
    alph = "abcdef"
    A, B, caps, truth = [], [], [], []
    for _ in range(120):
        la = rng.randint(0, 300)
        a = "".join(rng.choice(alph) for _ in range(la))
        if rng.random() < 0.5:  # near-dup: a few random edits
            b = list(a)
            for _ in range(rng.randint(0, 12)):
                if not b:
                    break
                op, p = rng.random(), rng.randrange(len(b))
                if op < 0.33:
                    b[p] = rng.choice(alph)
                elif op < 0.66:
                    del b[p]
                else:
                    b.insert(p, rng.choice(alph))
            b = "".join(b)
        else:
            b = "".join(rng.choice(alph) for _ in range(rng.randint(0, 300)))
        if len(a) > len(b):
            a, b = b, a
        A.append(np.frombuffer(a.encode("utf-32-le"), np.uint32))
        B.append(np.frombuffer(b.encode("utf-32-le"), np.uint32))
        caps.append(rng.choice([5.0, 20.0, 0.2 * max(len(a), len(b), 1),
                                300.0]))
        truth.append(_levenshtein(a, b))
    caps, truth = np.array(caps), np.array(truth)
    d = _levenshtein_band(A, B, caps=caps)
    exact = truth <= caps
    assert (d[exact] == truth[exact]).all()
    assert (d[~exact] > caps[~exact]).all()
    assert (_levenshtein_band(A, B) == truth).all()


def test_scrub_memoized_kernel_matches_oracle():
    """The dictionary-encoded T3-T5 path (one kernel run per DISTINCT
    payload) is exact on a batch engineered for heavy duplication plus
    every per-family edge: T3 spans, T4 hex windows, T5 color blocks,
    T1/T2-only rows, pattern-free rows, nulls and empties."""
    cfg = ScrubConfig()
    rng = random.Random(13)
    base = [
        "(x CONFIDENTIEL J.DUPONT y)",
        "pre (abc Document non tenu 12/2024 Tj) post",
        "(hdr) 44 6f 63 75 6d 65 6e 74 20 6e 6f 6e 20 74 65 6e 75 (tail)",
        "BT 1 0 0 rg payload ET rest",
        "(p DOCUMENT NON APPLICABLE q)",
        "clean row with no patterns at all",
        "",
        None,
        "(combo Document non tenu ET) 44 6f 63 75 6d (x) 1 0 0 RG BT zz ET",
    ]
    texts = [rng.choice(base) for _ in range(2000)]
    batch = pa.table({"text": pa.array(texts, pa.string())})
    out = make_scrub_batch_fn(cfg)(batch)
    want = oracle_scrub_rows(texts, cfg)
    assert out["text"].to_pylist() == [w[0] for w in want]
    assert out["modified"].to_pylist() == [w[1] for w in want]
