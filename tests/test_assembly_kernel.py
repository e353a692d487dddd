"""Property-based tests for the vectorized assembly kernel.

`_make_assembler` (numpy/pandas, plans/kg.py) is compared against a
deliberately naive per-sentence Python reference on hypothesis-generated
token sequences — no Spark session needed, so edge cases (empty sentences,
overlapping mentions, boundary n-grams, ties) get thousands of cheap
examples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from i2o_transform_spark.plans.kg import _make_assembler

# A tiny vocabulary exercising every interaction: overlapping 1/2/3-gram
# surfaces sharing first words, predicate vs entity kinds.
BY_LEN = {
    1: {"acme", "sued", "beta"},
    2: {"acme corp", "beta labs", "spun off"},
    3: {"bank of gotham"},
}
PRED_SET = {"sued", "spun off"}
FIRST2 = {s.split(" ")[0] for s in BY_LEN[2]}
FIRST3 = {s.split(" ")[0] for s in BY_LEN[3]}
CFG = [
    {
        "kind": "year",
        "trigger_token": "in",
        "pattern": "^[0-9]{4}$",
        "target_column": "qualifier_year",
    }
]

WORDS = [
    "acme", "corp", "beta", "labs", "sued", "spun", "off", "bank", "of",
    "gotham", "in", "1999", "2005", "xyzzy", "the",
]


def _reference(tok_lists):
    """Naive per-sentence implementation of the assembly semantics."""
    out = []
    for si, toks in enumerate(tok_lists):
        mentions = []
        for i in range(len(toks)):
            best = None
            for n in (1, 2, 3):
                if i + n <= len(toks):
                    g = " ".join(toks[i : i + n])
                    if g in BY_LEN[n]:
                        best = (i, n, g)
            if best:
                mentions.append(best)
        ents = [m for m in mentions if m[2] not in PRED_SET]
        preds = [m for m in mentions if m[2] in PRED_SET]
        if not ents or not preds:
            continue
        subj, obj, pred = ents[0], ents[-1], preds[0]
        if not (subj[0] + subj[1] <= pred[0] < obj[0]):
            continue
        years = [
            toks[i]
            for i in range(1, len(toks))
            if toks[i - 1] == "in" and toks[i].isdigit() and len(toks[i]) == 4
        ]
        year = int(min(years)) if years else None
        out.append((si, subj[2], pred[2], obj[2], year))
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=300, deadline=None)
def test_kernel_matches_reference(tok_lists):
    kernel = _make_assembler(BY_LEN, PRED_SET, FIRST2, FIRST3, CFG)
    n = len(tok_lists)
    url = np.array([f"u{i}" for i in range(n)], dtype=object)
    ts = np.array([np.datetime64("2024-01-01")] * n)
    sidx = np.arange(n, dtype=np.int64)
    res = kernel(url, ts, sidx, tok_lists)
    got = []
    if res is not None:
        for r in res.itertuples(index=False):
            year = None if pd.isna(r[6]) else int(r[6])
            got.append((int(r.sent_idx), r.subj_surface, r.pred_surface,
                        r.obj_surface, year))
    assert sorted(got) == sorted(_reference(tok_lists))
