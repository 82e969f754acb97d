"""Hypothesis fuzz of the round-5 contract ORACLES against independent
pure-Python references (the established fuzz-net design: the driver gate
certifies Spark ≡ DuckDB; this closes the both-engines-wrong gap).

Covered: cdc_chunk_ledger (rolling-hash boundaries, chunk polynomial,
deterministic top-N), bpe_merge_round (Sennrich pair counts), quality
classifier (bit-exact float chain), source_token_budget (hash-order
running sums incl. NULL sources). Texts draw from a vocab plus raw
whitespace variants INCLUDING vertical tab — safe here because every r5
text op uses the explicit ``[ \\t\\n\\x0B\\f\\r]`` class on both engines.
"""

import importlib.util
import pathlib
import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

duckdb = pytest.importorskip("duckdb")

from forecaster_spark.functions import xhash  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "entry_fuzz_r5", str(pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py")
)
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)
ORACLES = _entry.oracle_sql()

WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")

_WORDS = ["low", "lower", "stow", "a", "part", "merge", "in", "über", "x1", ""]
_SEPS = [" ", "\t", "  ", "\n", "\x0b", "\r"]


def texts_strategy():
    word = st.sampled_from(_WORDS)
    sep = st.sampled_from(_SEPS)
    return st.lists(
        st.tuples(st.lists(word, min_size=0, max_size=12), sep), min_size=1, max_size=10
    )


def _mk_docs(spec_rows):
    rows = []
    for i, (words, sep) in enumerate(spec_rows):
        rows.append((i, sep.join(words)))
    rows.append((len(spec_rows), None))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _run(key, docs):
    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(ORACLES[key]).df()


def _split(text):
    return WS_RE.split(text.lower())


U64 = 1 << 64


def _chunks_ref(words, g=4, mask_bits=3):
    """Pure-python CDC chunk hashes for one doc (signed int64 values)."""
    m = len(words)
    h = xhash.word_hash_flat(words)
    powers = xhash.pow_table(max(g, m, 1))
    cuts = set()
    for s in range(m - g + 1):
        acc = 0
        for j in range(g):
            acc = (acc + int(h[s + j]) * int(powers[j])) % U64
        if int(xhash.splitmix64(np.uint64(acc))) % (1 << mask_bits) == 0:
            cuts.add(s + g - 1)
    out, start = [], 0
    for p in range(m):
        if p + 1 == m or p in cuts:
            acc = 0
            for q in range(start, p + 1):
                acc = (acc + int(h[q]) * int(powers[q - start])) % U64
            v = int(xhash.splitmix64(np.uint64(acc)))
            out.append(v - U64 if v >= 1 << 63 else v)
            start = p + 1
    return out


@settings(max_examples=60, deadline=None)
@given(texts_strategy())
def test_cdc_chunk_ledger_oracle_vs_reference(spec_rows):
    docs = _mk_docs(spec_rows)
    # the contract oracle plants _BOILER on doc_id % 5 == 0 — replay it
    boiler = _entry._BOILER
    got = _run("cdc_chunk_ledger_documents", docs)
    per = {}
    for doc_id, text in docs.itertuples(index=False):
        if text is None:
            continue
        t = boiler + " " + text if doc_id % 5 == 0 else text
        for ch in _chunks_ref(_split(t)):
            per[(doc_id, ch)] = per.get((doc_id, ch), 0) + 1
    agg = {}
    for (doc_id, ch), occ in per.items():
        n_docs, n_occ, docs_set = agg.get(ch, (0, 0, []))
        agg[ch] = (n_docs + 1, n_occ + occ, docs_set + [doc_id])
    items = [
        (ch, nd, no, min(ds), max(ds))
        for ch, (nd, no, ds) in agg.items()
        if nd >= 2
    ]
    items.sort(key=lambda r: (-r[1], -r[2], r[0] & (U64 - 1)))
    items = items[:20]
    expect = [
        (rnk + 1, ch, nd, no, fd, ld)
        for rnk, (ch, nd, no, fd, ld) in enumerate(items)
    ]
    assert [tuple(r) for r in got.sort_values("rnk").itertuples(index=False)] == expect


@settings(max_examples=60, deadline=None)
@given(texts_strategy())
def test_bpe_merge_round_oracle_vs_sennrich(spec_rows):
    docs = _mk_docs(spec_rows)
    got = _run("bpe_merge_round_documents", docs)
    from collections import Counter

    vocab = Counter()
    for _doc, text in docs.itertuples(index=False):
        if text is None:
            continue
        for w in _split(text):
            if w:
                vocab[w] += 1
    stats = Counter()
    for w, f in vocab.items():
        for i in range(len(w) - 1):
            stats[(w[i], w[i + 1])] += f
    items = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = [(r + 1, l, rr, n) for r, ((l, rr), n) in enumerate(items)]
    assert [tuple(x) for x in got.sort_values("rnk").itertuples(index=False)] == expect


@settings(max_examples=60, deadline=None)
@given(texts_strategy())
def test_quality_classifier_oracle_vs_float_chain(spec_rows):
    docs = _mk_docs(spec_rows)
    got = _run("quality_classifier_documents", docs).set_index("doc_id")
    from forecaster_spark.operators.textops import STOPWORDS

    all_sw = {w for sws in STOPWORDS.values() for w in sws}
    punct_re = re.compile(r"[^A-Za-z0-9 \t\n\x0B\f\r]")
    for doc_id, text in docs.itertuples(index=False):
        if text is None:
            assert doc_id not in got.index
            continue
        t = text.strip(" ")  # Spark trim() and DuckDB trim() are space-only
        words = [w for w in _split(t) if w]
        wc = len(words)
        nchars = len(t)
        npunct = len(punct_re.findall(t))
        ndig = sum(c.isdigit() and c.isascii() for c in t)
        swh = sum(w in all_sw for w in words)
        lr = float(min(wc, 64)) / 64.0
        sr = float(swh) / float(max(wc, 1))
        pr = float(npunct) / float(max(nchars, 1))
        dr = float(ndig) / float(max(nchars, 1))
        score = ((0.25 * lr + 0.5 * sr) + -0.5 * pr) + -0.25 * dr
        row = got.loc[doc_id]
        assert (row["n_words"], row["sw_hits"], row["n_punct"], row["n_digits"]) == (
            wc, swh, npunct, ndig,
        ), doc_id
        assert row["score"] == score and bool(row["keep"]) == (score >= 0.25)


ids_strategy = st.lists(
    st.tuples(
        st.integers(0, (1 << 62)), st.sampled_from(["a", "b", None]),
        st.integers(1, 30),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=80, deadline=None)
@given(ids_strategy)
def test_source_token_budget_oracle_vs_replay(rows):
    docs = pd.DataFrame(
        [(i, s, " ".join("w" for _ in range(n))) for i, s, n in rows],
        columns=["doc_id", "source", "text"],
    )
    got = _run("source_token_budget_documents", docs).sort_values("doc_id")
    mult = np.uint64(23)  # 2*seed+1, seed=11
    by_src = {}
    for i, s, n in rows:
        h = int(xhash.splitmix64(np.uint64(i) * mult))
        by_src.setdefault(s, []).append((h, i, n))
    expect = {}
    for s, lst in by_src.items():
        lst.sort()
        run = 0
        for h, i, n in lst:
            kept = run < 800
            run += n
            expect[i] = (n, run, kept)
    for r in got.itertuples(index=False):
        assert (r.n_tok, r.run_tok, r.kept) == expect[r.doc_id], r.doc_id
    assert len(got) == len(rows)
